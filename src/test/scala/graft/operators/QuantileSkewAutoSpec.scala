package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** percentileContAuto must self-defend against adversarial value skew
  * (round 15, the ScalableRank.withRowNumberAuto discipline applied to
  * quantiles): the probe reads the max bucket share off the EXACT
  * bucket counts the locate computes anyway, and a collapsed profile —
  * nearly all mass within an epsilon of one point, where the candidate
  * bucket would hold ~the whole group — switches the boundaries to
  * equi-depth (buckets rounded up to a power of two). Answers are
  * bit-identical in every branch; a balanced profile threads the
  * probe's materialized frames into the same equi-width locate, no
  * boundary machinery in the plan. */
class QuantileSkewAutoSpec extends AnyFunSuite {
  lazy val spark = graft.core.GraftSession.local("4", "quantile-skew-auto")

  private val Ps = Seq(0.1, 0.5, 0.9, 0.99)

  // collapsed-for-equi-width profile: 1 in 1000 rows is a large
  // outlier; everything else sits on tie-heavy points within [0, 1e-7]
  private def skewed(n: Int): DataFrame =
    spark.range(n).toDF("id")
      .select((col("id") % 2).cast("string").as("g"),
        when(col("id") % 1000 === 0, col("id").cast("double"))
          .otherwise((col("id") % 97).cast("double") * 1e-9).as("v"))

  private def balanced(n: Int): DataFrame =
    spark.range(n).toDF("id")
      .select((col("id") % 2).cast("string").as("g"),
        (col("id") % 9973).cast("double").as("v"))

  private def sortedVals(df: DataFrame): Seq[String] =
    df.select(col("g"), col("p"), col("value"))
      .collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("collapsed profile forces equi-depth — bit-identical to the window truth") {
    val df = skewed(20000)
    val auto = ScalableQuantile.percentileContAuto(df, "g", "v", Ps,
      buckets = 64)
    assert(auto.queryExecution.analyzed.toString.contains("percentile_approx"),
      "skewed profile did not switch to equi-depth boundaries")
    assert(sortedVals(auto) ==
      sortedVals(ScalableQuantile.percentileContWindow(df, "g", "v", Ps)))
  }

  test("balanced profile keeps equi-width: probe frames threaded, no boundary machinery, same answers") {
    val df = balanced(20000)
    val auto = ScalableQuantile.percentileContAuto(df, "g", "v", Ps,
      buckets = 64)
    assert(!auto.queryExecution.analyzed.toString.contains("percentile_approx"),
      "balanced profile needlessly recomputed equi-depth boundaries")
    assert(sortedVals(auto) ==
      sortedVals(ScalableQuantile.percentileContWindow(df, "g", "v", Ps)))
  }

  test("non-power-of-two buckets survive the switch (rounded up, never a data-dependent require)") {
    // 48 buckets was always valid for the equi-width path; the switch
    // must not turn it into a failure that fires only on skewed data
    val df = skewed(20000)
    val auto = ScalableQuantile.percentileContAuto(df, "g", "v", Ps,
      buckets = 48)
    assert(auto.queryExecution.analyzed.toString.contains("percentile_approx"))
    assert(sortedVals(auto) ==
      sortedVals(ScalableQuantile.percentileContWindow(df, "g", "v", Ps)))
  }

  test("single-value groups never trigger the switch (constant short-circuit)") {
    val df = spark.range(4000).toDF("id")
      .select(lit("only").as("g"), lit(7.5).as("v"))
    val auto = ScalableQuantile.percentileContAuto(df, "g", "v", Ps,
      buckets = 64)
    assert(!auto.queryExecution.analyzed.toString.contains("percentile_approx"))
    val got = auto.collect()
    assert(got.length == Ps.size && got.forall(_.getDouble(2) == 7.5))
  }

  test("DistributionValidator's bucket path self-defends: skewed column validates source==target all-pass") {
    val df = skewed(20000).withColumnRenamed("v", "amount")
    val res = graft.validate.DistributionValidator.validate(
      df, df, Seq("amount"), bucketLocate = Some(true))
    val statuses = res.select(col("validation_status")).collect().map(_.getString(0))
    assert(statuses.nonEmpty && statuses.forall(_ == "pass"))
  }
}
