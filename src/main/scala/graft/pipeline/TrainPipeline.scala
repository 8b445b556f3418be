package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{BloomContamination, ExactDedup, MinHashLSH, QualityRules, Sampling, ShuffleShard, TextOps}

/** The full training-data curation flow, end to end — the LLM-pipeline
  * counterpart of [[E2ePipeline]]'s migration flow, composed entirely
  * from the operator library:
  *
  *   corpus → Gopher quality gate → exact dedup → near-dup drop
  *   (MinHash+LSH clusters, keep lowest id) → Bloom decontamination
  *   against the held-out benchmark set → train/val/test split →
  *   shuffle-sharded train export.
  *
  * Every stage is the library operator a user would call; the report
  * carries per-stage surviving-row counts (the attrition funnel every
  * curation run is judged by) and the total wall time, which
  * [[graft.Bench]] publishes as `e2e_train` next to the migration e2e.
  *
  * Stage discipline: each stage is cached and materialized before the
  * next reads it (count doubles as the materializer), and released as
  * soon as its consumer materializes — so the funnel costs one pass
  * per stage, not a re-execution of the whole prefix per count, and
  * peak cache holds two stages. Determinism: every stage is either
  * exact (hash dedup, integer rules) or seeded-hash based, so two runs
  * over the same corpus produce identical reports and identical shard
  * files.
  */
object TrainPipeline {

  /** Per-source mix fractions for the split stage. */
  val Splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val Stops: Seq[String] = Seq("the", "a")
  val ContamN = 5
  val BloomBits = 65536
  val NearDupThreshold = 0.8

  final case class Report(
      rowsIn: Long,
      afterQuality: Long,
      afterExact: Long,
      afterNearDup: Long,
      afterDecontam: Long,
      splitCounts: Map[String, Long],
      trainRows: Long,
      shards: Int,
      totalSec: Double)

  /** Run the curation flow over `sfDir`'s documents table, writing the
    * sharded train split under `outDir`. The benchmark set (for
    * decontamination) is the reference eval-suite stand-in used by c1:
    * doc_id % 97 == 0; those rows are never training candidates. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      shards: Int = 8, seed: Int = 17, minWords: Int = 10): Report = {
    val t0 = System.nanoTime()
    val docs = Tables(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    var stage = docs.filter(col("doc_id") % 97 =!= 0).cache()

    def advance(next: DataFrame): Long = {
      val cached = next.cache()
      val n = try cached.count()
        catch { case t: Throwable => cached.unpersist(); throw t }
      stage.unpersist()
      stage = cached
      n
    }

    // any stage failure must release the current corpus-scale cache
    // before the throw escapes — Bench catches and keeps running
    try {
    val rowsIn = stage.count()
    val afterQuality = advance(stage.filter(
      QualityRules.gopherPass(TextOps.words(col("text")), Stops, minWords = minWords)))
    val afterExact = advance(ExactDedup.dedup(stage, "doc_id", Seq("text")))
    val clusters = MinHashLSH.nearDupClusters(
      stage, "doc_id", "text", NearDupThreshold)
    val losers = clusters
      .join(clusters.groupBy(col("comp")).agg(min(col("id")).as("keep")), Seq("comp"))
      .filter(col("id") =!= col("keep"))
      .select(col("id").as("doc_id"))
    val afterNearDup = advance(stage.join(losers, Seq("doc_id"), "left_anti"))
    val bits = BloomContamination.buildBits(bench, "text", ContamN, BloomBits)
    val contaminated = BloomContamination
      .flagged(stage, "doc_id", "text", ContamN, bits)
      .select(col("id").as("doc_id"))
    val afterDecontam = advance(stage.join(contaminated, Seq("doc_id"), "left_anti"))
    val split = advance(Sampling.splitAssign(stage, "doc_id", Splits, seed))
    val splitCounts = stage.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // invariant gate BEFORE the expensive shard export: a breach must
    // abort without leaving a full output directory behind
    require(split == afterDecontam, "split stage must preserve rows")
    val train = stage.filter(col("split") === "train")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    ShuffleShard.writeShards(train, "doc_id", shards, seed, outDir)
    val trainRows = splitCounts.getOrElse("train", 0L)
    Report(rowsIn, afterQuality, afterExact, afterNearDup, afterDecontam,
      splitCounts, trainRows, shards,
      (System.nanoTime() - t0) / 1e9)
    } finally stage.unpersist()
  }
}
