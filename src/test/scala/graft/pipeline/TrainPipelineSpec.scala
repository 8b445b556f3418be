package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extended curation funnel (round 9): monotone attrition through
  * every gate, segment dedup shrinking but never dropping, model gates
  * fitted on the train split only, exact split accounting, upsampling
  * ≥ 1, deterministic re-runs bit-for-bit (report AND shard files),
  * ordered shard positions, and batch assignment consistency — all on
  * the sf0.001 corpus. */
@org.scalatest.tags.Slow
class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "train-pipeline")
  val sfDir = "/root/testdata/sf0.001"

  def freshDir() = java.nio.file.Files.createTempDirectory("train-pipe").toString

  /** The MIXED-MODALITY corpus (r16): sf0.001 documents plus a real
    * binary asset column carrying an image signal INDEPENDENT of the
    * text — every 25th document shares one of three covers (the
    * same-cover clusters the image gate exists to collapse), everyone
    * else carries a unique asset. Keying the gate on these bytes
    * (instead of the r15 fabricated text prefix) keeps the two
    * near-dup gates doing DIFFERENT work: the image screen drops
    * same-cover documents, the MinHash pass still catches body-level
    * near-dups whose covers differ. */
  lazy val mixedSfDir: String = {
    import org.apache.spark.sql.functions._
    val dir = freshDir()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("asset_bytes",
        when(col("doc_id") % 25 === 0,
          concat(lit("cover-"), (col("doc_id") % 3).cast("string")))
          .otherwise(concat(lit("uniq-"), col("doc_id").cast("string")))
          .cast("binary"))
      .withColumn("asset_mime", lit("image/fake"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  lazy val shardDir1: String = freshDir()
  lazy val report: TrainPipeline.Report =
    TrainPipeline.run(spark, mixedSfDir, shardDir1, shards = 4, seed = 17)

  test("attrition is monotone and every stage survives rows") {
    val r = report
    assert(r.rowsIn >= r.afterQuality)
    assert(r.afterQuality >= r.afterExact)
    assert(r.afterExact >= r.afterImageDedup)
    assert(r.afterImageDedup >= r.afterNearDup)
    assert(r.afterNearDup >= r.afterDecontam)
    // both near-dup gates do REAL work on this corpus, and on
    // DIFFERENT documents: the thumbnail screen catches same-head
    // pairs first, the text pass still catches body-level near-dups
    // whose heads differ — neither stage is subsumed by the other
    assert(r.afterImageDedup < r.afterExact, r.toString)
    assert(r.afterNearDup < r.afterImageDedup, r.toString)
    assert(r.afterDecontam >= r.afterLmGate)
    assert(r.afterLmGate >= r.afterPtGate)
    assert(r.afterPtGate > 0, r.toString)
    assert(r.totalSec > 0)
  }

  test("text-only corpus under DEFAULTS: no asset column → image gate off, zero image drops, no image_near_dup ledger rows (r16)") {
    // signal honesty: the corpus carries no image signal, so the gate
    // must not invent one — prefix-similar distinct documents survive
    val out = freshDir()
    val ledgerPath = freshDir() + "/ledger"
    val r = TrainPipeline.run(spark, sfDir, out, shards = 4, seed = 17,
      ledgerOut = Some(ledgerPath))
    assert(r.afterImageDedup == r.afterExact, r.toString)
    val stages = spark.read.parquet(ledgerPath)
      .select(org.apache.spark.sql.functions.col("stage"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(!stages.contains("image_near_dup"), stages.toString)
    // the text near-dup pass still does its own work
    assert(r.afterNearDup < r.afterImageDedup, r.toString)
  }

  test("mixed-modality corpus reproduces the image-gated funnel; NULL assets pass the gate untouched (r16)") {
    import org.apache.spark.sql.functions._
    // the same corpus with every THIRD asset withheld (NULL): those
    // documents must never enter the gate — only image-BEARING rows
    // can lose to it — and the funnel still does real image work
    val dir = freshDir()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("asset_bytes",
        when(col("doc_id") % 3 === 0, lit(null).cast("binary"))
          .when(col("doc_id") % 25 === 0,
            concat(lit("cover-"), (col("doc_id") % 3).cast("string"))
              .cast("binary"))
          .otherwise(concat(lit("uniq-"), col("doc_id").cast("string"))
            .cast("binary")))
      .withColumn("asset_mime", lit("image/fake"))
      .write.parquet(s"$dir/documents.parquet")
    val ledgerPath = freshDir() + "/ledger"
    val r = TrainPipeline.run(spark, dir, freshDir(), shards = 4,
      seed = 17, ledgerOut = Some(ledgerPath))
    // the full-asset mixed run (the suite's `report`) drops image
    // documents; withholding assets can only SHRINK the image drops
    val fullDrops = report.afterExact - report.afterImageDedup
    val partialDrops = r.afterExact - r.afterImageDedup
    assert(fullDrops > 0, report.toString)
    assert(partialDrops > 0 && partialDrops <= fullDrops,
      s"partial=$partialDrops full=$fullDrops")
    // and no asset-less (doc_id % 3 == 0) document appears as an
    // image_near_dup loser
    val badLoser = spark.read.parquet(ledgerPath)
      .filter(col("stage") === "image_near_dup" && col("doc_id") % 3 === 0)
    assert(badLoser.count() == 0)
  }

  test("segment dedup shrinks segments but never drops documents") {
    val r = report
    assert(r.segmentsIn >= r.segmentsKept, r.toString)
    assert(r.segmentsKept > 0)
    // cross-document boilerplate exists in the corpus → some segment
    // actually deduplicated (the stage did real work)
    assert(r.segmentsKept < r.segmentsIn, r.toString)
  }

  test("model gates do real, bounded work") {
    val r = report
    // the LM gate drops SOME rows but never most of the corpus
    assert(r.afterLmGate < r.afterDecontam, r.toString)
    assert(r.afterLmGate * 2 > r.afterDecontam, r.toString)
    // the integer perceptron trained to a non-trivial weight vector
    assert(r.ptWeights.length == TrainPipeline.PtDim)
    assert(r.ptWeights.exists(_ != 0L), r.ptWeights.toString)
  }

  test("split accounting is exact and train dominates") {
    val r = report
    assert(r.splitCounts.values.sum == r.afterPtGate, r.splitCounts.toString)
    assert(r.trainRows == r.splitCounts.getOrElse("train", 0L))
    assert(r.trainRows >= r.afterPtGate / 2, r.splitCounts.toString)
  }

  test("upsampling repeats scarce languages (rates >= 1 ⇒ never shrinks)") {
    val r = report
    assert(r.upsampledRows >= r.trainRows, r.toString)
    assert(r.batches > 0 && r.batches <= r.upsampledRows)
  }

  test("deterministic: a re-run reproduces the report and the shard placement") {
    val dir2 = freshDir()
    val again = TrainPipeline.run(spark, mixedSfDir, dir2, shards = 4, seed = 17)
    assert(again.copy(totalSec = 0) == report.copy(totalSec = 0))
    // shard files carry pos 0..n-1 in order
    val rows = spark.read.parquet(s"$dir2/shard=1").select("pos").collect()
      .map(_.getLong(0))
    assert(rows.toSeq == (0L until rows.length))
    // and the shard FILES are bit-for-bit reproducible: same uids at
    // the same (shard, pos) across independent runs
    def placement(dir: String) = spark.read.parquet(dir)
      .select("shard", "pos", "uid", "bucket", "batch_idx", "pos_in_batch")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    assert(placement(dir2).toSeq == placement(shardDir1).toSeq)
  }

  test("batch assignment in the export is internally consistent") {
    val ex = spark.read.parquet(shardDir1)
    import org.apache.spark.sql.functions._
    // every (bucket, batch) holds at most BatchSize rows with dense pos
    val bad = ex.groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n"), max(col("pos_in_batch")).as("mx"))
      .filter(col("n") > TrainPipeline.BatchSize || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
    // uid encodes (doc_id, copy_idx) losslessly
    val broken = ex.filter(
      col("uid") =!= col("doc_id") * TrainPipeline.UidStride + col("copy_idx"))
    assert(broken.count() == 0)
  }

  test("drop ledger: every dropped doc exactly once, stage counts match the funnel, near-dup losers name their kept rep") {
    import org.apache.spark.sql.functions._
    val ledgerDir = freshDir()
    val r = TrainPipeline.run(spark, mixedSfDir, freshDir(), shards = 4,
      seed = 17, ledgerOut = Some(ledgerDir))
    val ledger = spark.read.parquet(ledgerDir)
    // ledgered report == the ledger-free run (the ledger observes,
    // never changes the funnel)
    assert(r.copy(totalSec = 0) == report.copy(totalSec = 0))
    // conserved, and each doc at most once
    assert(ledger.count() == r.rowsIn - r.afterPtGate)
    assert(ledger.select(col("doc_id")).distinct().count() == ledger.count())
    // per-stage counts are exactly the funnel's diffs
    val byStage = ledger.groupBy(col("stage")).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      .withDefaultValue(0L)
    assert(byStage("quality_gate") == r.rowsIn - r.afterQuality)
    assert(byStage("exact_dup") == r.afterQuality - r.afterExact)
    assert(byStage("image_near_dup") == r.afterExact - r.afterImageDedup)
    assert(byStage("near_dup") == r.afterImageDedup - r.afterNearDup)
    assert(byStage("contaminated") == r.afterNearDup - r.afterDecontam)
    assert(byStage("lm_gate") == r.afterDecontam - r.afterLmGate)
    assert(byStage("pt_gate") == r.afterLmGate - r.afterPtGate)
    // near-dup details (text AND image): the kept representative
    // (cluster min — always a smaller id than the loser); other stages
    // carry no detail
    val dupStages = Seq("near_dup", "image_near_dup")
    assert(ledger.filter(col("stage").isin(dupStages: _*) &&
      (col("detail").isNull || col("detail") >= col("doc_id"))).count() == 0)
    assert(ledger.filter(!col("stage").isin(dupStages: _*) &&
      col("detail").isNotNull).count() == 0)
    // deterministic: a re-run reproduces the ledger bit-for-bit
    val ledgerDir2 = freshDir()
    TrainPipeline.run(spark, mixedSfDir, freshDir(), shards = 4, seed = 17,
      ledgerOut = Some(ledgerDir2))
    val a = ledger.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = spark.read.parquet(ledgerDir2).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b)
  }
}
