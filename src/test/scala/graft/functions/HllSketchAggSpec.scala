package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch aggregate must agree bit-for-bit with the query-shaped
  * HLL pipeline, merge correctly across partitions, and work from SQL. */
class HllSketchAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "hllagg-test")

  def data(parts: Int) = {
    import spark.implicits._
    ((1 to 4000).map(i => ("A", (i % 2000).toLong)) ++
      (1 to 600).map(i => ("B", (i % 150).toLong)))
      .toDF("g", "x").repartition(parts)
  }

  test("bit-identical to the query-shaped HyperLogLog pipeline") {
    val viaAgg = data(8).groupBy("g").agg(HllSketchAgg.hll(col("x")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaQuery = HyperLogLog.approxCountDistinct(data(8), Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg == viaQuery)
  }

  test("partition-count invariant (sketch merge is exact)") {
    def run(parts: Int) = data(parts).groupBy("g")
      .agg(HllSketchAgg.hll(col("x")).as("e"))
      .orderBy("g").collect().map(_.getDouble(1)).toSeq
    assert(run(1) == run(7))
    assert(run(7) == run(32))
  }

  test("registered SQL function works in spark.sql") {
    HllSketchAgg.register(spark)
    data(4).createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT g, hll_distinct(CAST(x AS STRING)) AS e FROM hll_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaAgg = data(4).groupBy("g").agg(HllSketchAgg.hll(col("x")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaAgg)
  }
}
