package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The regime probe for ScalableRank vs the window functions: ONE
  * partition holding the whole frame (the rfm1 global-band / w6
  * giant-group shape at its limit).
  *
  * The window formulation must sort the entire frame in a single task
  * (31 of 32 cores idle) to answer NTILE/PERCENT_RANK/CUME_DIST; the
  * bucket formulation keys every stage on (group, bucket). This probe
  * measures both on the same data and proves them equal first — a
  * full-output checksum, not a sample (rank answers are per-row).
  * Run: `sbt "Test/runMain graft.ProfileRankOneGroup [blowupDir]
  * [iters] [mult]"` (blowupDir holding an orders.parquet from a prior
  * `graft.Scaling` run; mult explodes rows in memory to reach the
  * tens-of-millions regime without writing another corpus — replica k
  * offsets the tie-break key so the total order stays total).
  */
object ProfileRankOneGroup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf_r12_10x")
    val iters = if (args.length > 1) args(1).toInt else 3
    val mult = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def base = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      val stride = o.agg(max(col("o_orderkey"))).head.getLong(0) + 1
      o.withColumn("k", explode(sequence(lit(0), lit(mult - 1))))
        .select((col("o_orderkey") + col("k") * stride).as("id"),
          col("o_totalprice").as("v"))
        .repartition(32)
    }

    import graft.operators.ScalableRank._
    def windowShape() = {
      val w = Window.orderBy(col("v"), col("id"))
      base
        .withColumn("band", ntile(4).over(w).cast("long"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
    }
    def bucketShape() =
      withRowNumber(base, Nil, "v", Seq("id"))
        .withColumn("band", ntileOf(col("rn"), col("n"), 4))
        .withColumn("pr", percentRankOf(col("rn"), col("n")))
        .withColumn("cd", cumeDistOf(col("rn"), col("n")))
        .drop("rn", "n")

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(iters / 2)
    }
    // full-output checksum: per-row hash XOR-folded — answers are
    // per-row, so a sample can't prove the shapes equal; bit-identical
    // doubles hash identically, and XOR never overflows under ANSI
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("id"), col("v"), col("band"), col("pr"),
        col("cd")).as("h")).agg(expr("bit_xor(h)")).head.getLong(0)

    val n = base.count()
    val cw = checksum(windowShape())
    val cb = checksum(bucketShape())
    require(cw == cb, s"shapes disagree: checksum $cw vs $cb")
    val tw = time(windowShape _)
    val tb = time(bucketShape _)
    println(f"one-group n=$n%d rows: window(single-partition sort)=$tw%.2f s, " +
      f"bucket-rank=$tb%.2f s, speedup=${tw / tb}%.2f x (median of $iters)")
    spark.stop()
  }
}
