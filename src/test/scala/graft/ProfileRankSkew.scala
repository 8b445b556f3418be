package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The regime probe for ScalableRank's equi-DEPTH mode: a value
  * profile where equi-width bucketing collapses — 99.99% of the mass
  * within 1e-6 of zero plus sparse large outliers, so every non-outlier
  * row lands in equi-width bucket 0 and the "in-bucket sort is
  * 1/buckets of the group" guarantee silently becomes "one task sorts
  * the frame". Equi-depth boundaries (per-group percentile_approx,
  * heap-searched per row) respread the mass across ~|distinct values|
  * buckets regardless of the value geometry.
  *
  * Measures both modes on the same data, proving them equal first via
  * a full-output XOR checksum (rank answers are per-row; a sample
  * can't prove equality). Run:
  * `sbt "Test/runMain graft.ProfileRankSkew [rows] [iters] [buckets]"`.
  */
object ProfileRankSkew {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20L * 1000 * 1000
    val iters = if (args.length > 1) args(1).toInt else 3
    val buckets = if (args.length > 2) args(2).toInt else 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // 1 in 10k rows is a large outlier (up to n); everything else sits
    // on 1000 tie-heavy points within [0, 1e-6] — the pathological
    // profile ScalableRank's scaladoc names
    def base = spark.range(n).toDF("id")
      .select(col("id"),
        when(col("id") % 10000 === 0, col("id").cast("double"))
          .otherwise((col("id") % 1000).cast("double") * 1e-9).as("v"))
      .repartition(32)

    import graft.operators.ScalableRank._
    def shape(equiDepth: Boolean) =
      withRowNumber(base, Nil, "v", Seq("id"), buckets = buckets,
        equiDepth = equiDepth)

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(iters / 2)
    }
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("id"), col("v"), col("rn"), col("n")).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)

    val cw = checksum(shape(equiDepth = false))
    val cd = checksum(shape(equiDepth = true))
    require(cw == cd, s"modes disagree: checksum $cw vs $cd")
    val tw = time(() => shape(equiDepth = false))
    val td = time(() => shape(equiDepth = true))
    println(f"skewed n=$n%d rows, $buckets%d buckets: " +
      f"equi-width(collapsed)=$tw%.2f s, equi-depth=$td%.2f s, " +
      f"speedup=${tw / td}%.2f x (median of $iters)")

    // the quantile twin on the same profile: the candidate bucket for
    // every middle percentile is the collapsed bucket 0 under
    // equi-width, so the locate ranks ~the whole frame in one task
    import graft.operators.ScalableQuantile
    val qPs = Seq(0.25, 0.5, 0.9)
    def qshape(equiDepth: Boolean) =
      ScalableQuantile.percentileCont(
        base.withColumn("g", lit("all")), "g", "v", qPs,
        buckets = buckets, equiDepth = equiDepth)
    val qw = qshape(equiDepth = false).collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val qd = qshape(equiDepth = true).collect().map(_.toSeq).sortBy(_.mkString).toSeq
    require(qw == qd, s"quantile modes disagree: $qw vs $qd")
    def qtime(equiDepth: Boolean): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        qshape(equiDepth).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(iters / 2)
    }
    val qtw = qtime(equiDepth = false)
    val qtd = qtime(equiDepth = true)
    println(f"quantile twin, same profile: equi-width(collapsed)=$qtw%.2f s, " +
      f"equi-depth=$qtd%.2f s, speedup=${qtw / qtd}%.2f x (median of $iters)")

    // the round-15 AUTO face: percentileContAuto must detect this
    // profile off the exact bucket counts it computes anyway and land
    // on the equi-depth plan + number (plus the probe's bounded
    // overhead — one materialized stats+counts pass it would run
    // regardless, never the collapsed single-task sort)
    def qauto() = ScalableQuantile.percentileContAuto(
      base.withColumn("g", lit("all")), "g", "v", qPs, buckets = buckets)
    val qa = qauto().collect().map(_.toSeq).sortBy(_.mkString).toSeq
    require(qa == qd, s"auto mode disagrees: $qa vs $qd")
    val qta = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        qauto().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(iters / 2)
    }
    println(f"quantile AUTO (probe + switch): $qta%.2f s vs forced " +
      f"equi-depth $qtd%.2f s and collapsed equi-width $qtw%.2f s " +
      f"(median of $iters)")
    spark.stop()
  }
}
