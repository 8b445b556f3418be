package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScalableQuantile must equal the window (sort-based) PERCENTILE_CONT
  * formulation BIT-FOR-BIT on any distribution — it is the same
  * formula computed by a different physical shape.
  */
class ScalableQuantileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "scalable-quantile")

  private val Ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  /** The qt2/DistributionValidator window formulation, inlined as the
    * reference answer. */
  private def windowQuantiles(df: DataFrame, ps: Seq[Double]): Map[(String, Double), Double] = {
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    df.filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))).cast("long"))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", floor(col("idx")) + 1)
      .withColumn("hi", least(col("lo") + 1, col("n")))
      .filter(col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(col("g"), col("p"))
      .agg(
        max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"),
        max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
      .select(col("g"), col("p"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
  }

  private def bucketQuantiles(df: DataFrame, ps: Seq[Double], buckets: Int = 64)
      : Map[(String, Double), Double] =
    ScalableQuantile.percentileCont(df, "g", "v", ps, buckets)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  private def frame(rows: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "v").repartition(7)
  }

  test("bit-identical to the window formulation on seeded random groups (uniform, skewed, tiny)") {
    val rnd = new scala.util.Random(42)
    val rows =
      (1 to 5000).map(_ => "uniform" -> rnd.nextDouble() * 1000) ++
      (1 to 3000).map(_ => "skewed" -> math.pow(rnd.nextDouble(), 8) * 1e6) ++
      (1 to 7).map(_ => "tiny" -> rnd.nextDouble()) ++
      Seq("single" -> 42.0)
    val df = frame(rows)
    val expected = windowQuantiles(df, Ps)
    val got = bucketQuantiles(df, Ps)
    assert(got.keySet == expected.keySet)
    // exact doubles: same formula, same order statistics — no epsilon
    got.foreach { case (k, v) => assert(v == expected(k), s"$k: $v != ${expected(k)}") }
  }

  test("adversarial shapes: constant group, two-value group, 90% heavy tie, integer grid") {
    val rows =
      (1 to 500).map(_ => "const" -> 5.5) ++
      ((1 to 250).map(_ => "twoval" -> 1.0) ++ (1 to 250).map(_ => "twoval" -> 2.0)) ++
      ((1 to 900).map(_ => "heavy" -> 7.0) ++ (1 to 100).map(i => "heavy" -> (100.0 + i))) ++
      (1 to 1000).map(i => "grid" -> (i % 10).toDouble)
    val df = frame(rows)
    val expected = windowQuantiles(df, Ps)
    val got = bucketQuantiles(df, Ps, buckets = 8) // few buckets vs heavy ties
    assert(got == expected)
    // p=0 / p=1 are the exact extremes
    assert(got(("heavy", 0.0)) == 7.0 && got(("heavy", 1.0)) == 200.0)
    assert(got(("const", 0.5)) == 5.5)
  }

  test("null values are excluded per SQL convention; all-null group yields no rows") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val got = bucketQuantiles(df, Seq(0.5))
    assert(got == Map(("a", 0.5) -> 2.0))
  }

  test("a NaN in a spanned group raises instead of mis-ranking") {
    val df = frame(Seq("a" -> 1.0, "a" -> Double.NaN, "a" -> 3.0))
    val ex = intercept[Exception] {
      ScalableQuantile.percentileCont(df, "g", "v", Seq(0.5)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("minimum bucket count (2) stays exact — bucket width never affects correctness, only candidate size") {
    val rnd = new scala.util.Random(7)
    val df = frame((1 to 2000).map(_ => "g" -> rnd.nextGaussian() * 100))
    assert(bucketQuantiles(df, Ps, buckets = 2) == windowQuantiles(df, Ps))
  }

  test("percentileContWindow: the public window shape equals BOTH the inline reference and the bucket-locate shape") {
    val rnd = new scala.util.Random(99)
    val rows =
      (1 to 4000).map(_ => "u" -> rnd.nextDouble() * 100) ++
      (1 to 11).map(_ => "tiny" -> rnd.nextGaussian()) ++
      ((1 to 800).map(_ => "tie" -> 3.0) ++ (1 to 200).map(i => "tie" -> i.toDouble)) ++
      Seq("single" -> -7.5)
    val df = frame(rows)
    val win = ScalableQuantile.percentileContWindow(df, "g", "v", Ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(win == windowQuantiles(df, Ps))
    assert(win == bucketQuantiles(df, Ps))
    // null exclusion matches percentileCont's SQL convention
    import spark.implicits._
    val nulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val got = ScalableQuantile.percentileContWindow(nulls, "g", "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got == Map(("a", 0.5) -> 2.0))
    // same input-validation contract
    intercept[IllegalArgumentException](
      ScalableQuantile.percentileContWindow(df, "g", "v", Seq(0.5, 0.5)))
    intercept[IllegalArgumentException](
      ScalableQuantile.percentileContWindow(df, "g", "v", Seq(1.5)))
  }

  test("equi-depth mode: bit-identical on the equi-width-adversarial profile and the random groups") {
    // the profile where equi-width's candidate bucket holds ~the whole
    // group: 99.9% of the mass on tie-points within 1e-6 of zero, a
    // few large outliers
    val rnd = new scala.util.Random(130314)
    val skewed = frame((0 until 3000).map(i =>
      ("a", if (i % 500 == 0) i.toDouble * 1e6
        else (i % 40).toDouble * 1e-9)) ++
      (0 until 100).map(i => ("b", rnd.nextDouble())))
    val want = windowQuantiles(skewed, Ps)
    val got = ScalableQuantile.percentileCont(skewed, "g", "v", Ps,
        buckets = 16, equiDepth = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got == want)
    // constant group composes with the short-circuit in depth mode too
    val withConst = frame(Seq(("c", 7.0), ("c", 7.0)) ++
      (0 until 50).map(i => ("d", i.toDouble)))
    assert(ScalableQuantile.percentileCont(withConst, "g", "v", Seq(0.5),
        buckets = 8, equiDepth = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap == windowQuantiles(withConst, Seq(0.5)))
    // non-power-of-two bucket count refused in depth mode
    intercept[IllegalArgumentException](
      ScalableQuantile.percentileCont(skewed, "g", "v", Ps, buckets = 12,
        equiDepth = true))
  }
}
