package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for d8_incremental_screen (the
  * ProfileD2Stages discipline, per the round-11 verdict: d8 is the
  * heaviest non-inherent key, so its cost gets a committed per-stage
  * baseline that future drift diffs against — stages, not totals).
  *
  * d8's bench time is TWO phases: the eager index build
  * ([[graft.operators.MinHashLSH.buildIndex]] — corpus-sized, runs at
  * DAG-build time and is the price screening amortizes across N
  * batches) and the screen itself (batch-sized by design). The split
  * matters: an index-build drift says the corpus pass grew (d2's
  * shingle/band family — compare against ProfileD2Stages), a screen
  * drift says the batch path grew (candidate join, verify, member
  * expansion) — different fixes, same end-to-end number.
  *
  * Each timing materializes its stage on top of CACHED predecessors,
  * so a stage's number is its own marginal cost. Run:
  * `sbt "Test/runMain graft.ProfileD8Stages [sfDir] [iters]"`. */
object ProfileD8Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.operators.{MinHashLSH, TextOps}
    val K = 32; val Bands = 8; val Threshold = 0.7

    // the d8 fixtures exactly: standing corpus + drifted-copy batch
    def corpus(dir: String) = graft.queries.DedupQueries.corpusDocsPublic(spark, dir)
    def batch(dir: String) = graft.core.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 41 === 5)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(col("text"), lit(" incremental drift probe")).as("text"))

    def stages(dir: String): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ListBuffer[(String, Double)]()
      def timed[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        out += name -> (System.nanoTime() - t0) / 1e9; r
      }
      // ---- phase 1: index build (corpus-sized, amortized per batch) —
      // mirrors buildIndex stage-for-stage
      val g = MinHashLSH.shingleTable(corpus(dir), "doc_id", "text").cache()
      timed("idx:shingle")(g.count())
      val groups = MinHashLSH.contentGroups(g).cache()
      timed("idx:groups")(groups.count())
      val repsG = g.join(groups.filter(col("id") === col("rep")).select(col("id")),
        Seq("id"), "left_semi").cache()
      timed("idx:repFilter")(repsG.count())
      val banded = MinHashLSH.bandKeys(
        MinHashLSH.signaturesFrom(repsG, K), Bands, K / Bands).cache()
      timed("idx:sign+band")(banded.count())
      // ---- phase 2: the screen (batch-sized by design) — mirrors
      // screenAgainst stage-for-stage
      val bg = MinHashLSH.shingleTable(batch(dir), "doc_id", "text").cache()
      timed("scr:batchShingle")(bg.count())
      val bBands = MinHashLSH.bandKeys(
        MinHashLSH.signaturesFrom(bg, K), Bands, K / Bands).cache()
      timed("scr:batchBand")(bBands.count())
      val cands = bBands.select(col("band"), col("bkey"), col("id").as("batch_id"))
        .join(banded.select(col("band"), col("bkey"), col("id").as("rep")),
          Seq("band", "bkey"))
        .select(col("batch_id"), col("rep")).distinct().cache()
      timed("scr:candidates")(cands.count())
      val verified = cands
        .join(bg.select(col("id").as("batch_id"), col("grams").as("grams_b")), "batch_id")
        .join(repsG.select(col("id").as("rep"), col("grams").as("grams_r")), "rep")
        .withColumn("jaccard", TextOps.jaccard(col("grams_b"), col("grams_r")))
        .filter(col("jaccard") >= Threshold)
        .select(col("batch_id"), col("rep"), col("jaccard")).cache()
      timed("scr:verify")(verified.count())
      timed("scr:expand")(verified
        .join(groups.select(col("rep"), col("id").as("corpus_id")), "rep")
        .count())
      spark.catalog.clearCache()
      out.toSeq
    }
    stages("/root/testdata/sf0.001") // warm-up: compile the codegen classes
    spark.catalog.clearCache()
    val all = (1 to iters).map(_ => stages(sfDir))
    val names = all.head.map(_._1)
    println(f"[d8-stages] ${"stage"}%-16s ${"median"}%8s ${"min"}%8s")
    names.zipWithIndex.foreach { case (n, i) =>
      val xs = all.map(_(i)._2).sorted
      val med = if (xs.size % 2 == 1) xs(xs.size / 2)
        else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
      println(f"[d8-stages] $n%-16s $med%8.2f ${xs.min}%8.2f")
    }
    def phaseTotal(prefix: String): Unit = {
      val sums = all.map(_.filter(_._1.startsWith(prefix)).map(_._2).sum).sorted
      println(f"[d8-stages] ${prefix.toUpperCase + "TOTAL"}%-16s ${sums(sums.size / 2)}%8.2f ${sums.min}%8.2f")
    }
    phaseTotal("idx:"); phaseTotal("scr:")
    val totals = all.map(_.map(_._2).sum).sorted
    println(f"[d8-stages] ${"TOTAL"}%-16s ${totals(totals.size / 2)}%8.2f ${totals.min}%8.2f")
    spark.stop()
  }
}
