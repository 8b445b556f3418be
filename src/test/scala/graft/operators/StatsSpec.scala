package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-moment statistics: agreement with Spark's builtin estimators
  * and bit-stability across partitionings (the property the builtins
  * lack). */
class StatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stats-test")

  def data(parts: Int) = {
    import spark.implicits._
    (1 to 1000).map { i =>
      (if (i % 2 == 0) "A" else "B", (i % 97).toDouble / 4.0, (i % 89).toDouble * 1.5)
    }.toDF("g", "x", "y").repartition(parts)
  }

  test("moments matches Spark builtin corr/stddev/avg (to 1e-9)") {
    val m = Stats.moments(data(4), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val b = data(4).groupBy("g")
      .agg(avg("x"), stddev_samp("x"), covar_samp("x", "y"), corr("x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("A", "B")) {
      assert(math.abs(m(g).getAs[Double]("mean_x") - b(g).getDouble(1)) < 1e-9)
      assert(math.abs(m(g).getAs[Double]("stddev_x") - b(g).getDouble(2)) < 1e-9)
      assert(math.abs(m(g).getAs[Double]("covar_xy") - b(g).getDouble(3)) < 1e-9)
      assert(math.abs(m(g).getAs[Double]("corr_xy") - b(g).getDouble(4)) < 1e-9)
    }
  }

  test("moments is bit-identical across partition counts") {
    def run(parts: Int) = Stats.moments(data(parts), Seq("g"), "x", "y")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
    assert(run(7) == run(32))
  }
}
