package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Portable HLL: estimates track exact counts within the m=256 error
  * bound and are bit-identical across partitionings. */
class HyperLogLogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "hll-test")

  def data(parts: Int) = {
    import spark.implicits._
    // group A: 2000 distinct of 4000 rows; group B: 150 distinct
    ((1 to 4000).map(i => ("A", (i % 2000).toLong)) ++
      (1 to 600).map(i => ("B", (i % 150).toLong)))
      .toDF("g", "x").repartition(parts)
  }

  test("estimate within 3 sigma (~20%) of exact for both groups") {
    val est = HyperLogLog.approxCountDistinct(data(8), Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("A") - 2000) / 2000.0 < 0.20, s"A: ${est("A")}")
    assert(math.abs(est("B") - 150) / 150.0 < 0.20, s"B: ${est("B")}")
  }

  test("bit-identical across partition counts") {
    def run(parts: Int) = HyperLogLog.approxCountDistinct(data(parts), Seq("g"), "x")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
    assert(run(5) == run(32))
  }

  test("invariant to duplicate multiplicity") {
    import spark.implicits._
    val once = (1 to 500).map(i => ("A", i.toLong)).toDF("g", "x")
    val thrice = (1 to 3).flatMap(_ => (1 to 500).map(i => ("A", i.toLong))).toDF("g", "x")
    val a = HyperLogLog.approxCountDistinct(once, Seq("g"), "x").head.getDouble(1)
    val b = HyperLogLog.approxCountDistinct(thrice, Seq("g"), "x").head.getDouble(1)
    assert(a == b)
  }
}
