package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{BloomContamination, ExactDedup, LanguageModel, LinearClassifier, MinHashLSH, QualityRules, Sampling, SegmentDedup, SequencePacker, ShuffleShard, TextOps}

/** The full training-data curation flow, end to end — the LLM-pipeline
  * counterpart of [[E2ePipeline]]'s migration flow, composed entirely
  * from the operator library (round 9 extends the chain to the whole
  * round-8 curation surface):
  *
  *   corpus → Gopher quality gate → corpus-wide segment dedup
  *   (documents shrink, boilerplate survives once) → exact dedup →
  *   IMAGE near-dup drop (perceptual-hash clusters over each doc's
  *   thumbnail asset — the m4/m5 multimodal face, round 14; the cheap
  *   hash screen runs before the expensive shingle pass) → text
  *   near-dup drop (MinHash+LSH clusters, keep lowest id) → Bloom
  *   decontamination against the held-out benchmark set →
  *   deterministic train/val/test split → bigram-LM quality gate
  *   (model frozen on the TRAIN split only — val/test never touch
  *   model fitting) → perceptron gate (distilled from the LM labels,
  *   CCNet-style) → scarce-language upsampling of the train split →
  *   curriculum interleave keys → length-bucketed batch assignment →
  *   shuffle-sharded train export.
  *
  * Every stage is the library operator a user would call; the report
  * carries per-stage surviving-row counts (the attrition funnel every
  * curation run is judged by), the trained perceptron weights (an
  * integer determinism pin), and the total wall time, which
  * [[graft.Bench]] publishes as `e2e_train` next to the migration e2e.
  *
  * Stage discipline: each stage is locally checkpointed and
  * materialized before the next reads it (count doubles as the
  * materializer — one fused job), and its blocks are released as soon
  * as its consumer materializes — so the funnel costs one pass per
  * stage, peak storage holds two corpus-scale stages (plus the
  * vocabulary-sized LM model tables during the gate), and the logical
  * plan is CUT at every stage boundary: a dozen chained stages with
  * self-referencing joins would otherwise grow the un-truncated plan
  * multiplicatively. Determinism: every stage is
  * either exact (hash dedup, integer rules, integer perceptron) or
  * seeded-hash based, so two runs over the same corpus produce
  * identical reports and identical shard files.
  *
  * Model-gate composition notes (the contracts composition exposed):
  *  - the SPLIT is assigned before the model gates, so the LM trains
  *    on exactly the rows that will export as `train` — held-out rows
  *    are scored and gated but never fitted on;
  *  - the LM gate normalizes by vocabulary: a doc passes when its mean
  *    bigram probability is at least [[LmAlpha]]× the out-of-model
  *    floor 1/V, so the threshold survives corpus growth (an absolute
  *    probability cutoff would tighten as V grows);
  *  - docs with fewer than two tokens have no bigrams and pass the LM
  *    gate by convention (nothing to judge — the quality gate already
  *    bounded degenerate docs);
  *  - the perceptron distills the LM verdict (trained on pre-gate rows
  *    labeled by LM pass/fail), then gates the LM survivors — the
  *    classic train-a-cheap-classifier-on-the-expensive-signal shape.
  */
object TrainPipeline {

  /** Per-source mix fractions for the split stage. */
  val Splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val Stops: Seq[String] = Seq("the", "a")
  val ContamN = 5
  val BloomBits = 65536
  val NearDupThreshold = 0.8
  /** CDC divisor for segment dedup (expected segment ≈ 16 tokens). */
  val SegDivisor = 16
  /** LM gate: keep docs whose mean bigram probability ≥ LmAlpha / V
    * (V-normalized so the threshold survives corpus growth). The
    * driver corpus has a deliberately tiny vocabulary (V = 31), which
    * compresses mean_p·V toward 1 (large history counts c1 ≈ V-scale
    * make every smoothed probability hover near the floor): measured
    * doc-level distributions are p05 ≈ 1.01 / median ≈ 1.07 at
    * sf0.001 and p05 ≈ 1.02 / median ≈ 1.04 at sf0.1, so 1.02 gates
    * the genuine low-coherence tail at both scales without starving
    * the funnel. A natural-language corpus (V ≫ 10⁴) spreads the
    * ratio over decades and tolerates a much larger α. */
  val LmAlpha = 1.02
  val PtDim = 3
  val PtEpochs = 2
  /** Scarce-language upsampling rates for the train split (≥ 1 only —
    * upsampling repeats scarce domains; thinning dominant ones is
    * [[Sampling.weightedMixture]]'s job upstream if wanted). */
  val UpRates: Map[String, Double] = Map("zh" -> 2.5, "fr" -> 1.5)
  /** Curriculum interleave weights by source. */
  val MixWeights: Map[String, Int] = Map("src0" -> 3, "src1" -> 2)
  val BatchWidth = 32L
  val BatchSize = 16
  /** uid = doc_id · UidStride + copy_idx — unique because copy counts
    * are bounded by the max rate (≤ 100 < UidStride). */
  val UidStride = 128L

  final case class Report(
      rowsIn: Long,
      afterQuality: Long,
      segmentsIn: Long,
      segmentsKept: Long,
      afterExact: Long,
      afterImageDedup: Long,
      afterNearDup: Long,
      afterDecontam: Long,
      afterLmGate: Long,
      afterPtGate: Long,
      ptWeights: Seq[Long],
      splitCounts: Map[String, Long],
      trainRows: Long,
      upsampledRows: Long,
      batches: Long,
      shards: Int,
      totalSec: Double,
      /** Per-stage wall seconds, in funnel order (r17 — the verdict's
        * attribution item: the funnel carried row counts but no times,
        * so optimization rounds could not see which stage dominates).
        * Stages are eagerly materialized (advance = checkpoint +
        * count), so each wall covers exactly that stage's compute. */
      stageWalls: Seq[(String, Double)] = Nil)

  /** Run the curation flow over `sfDir`'s documents table, writing the
    * sharded train split under `outDir`. The benchmark set (for
    * decontamination) is the reference eval-suite stand-in used by c1:
    * doc_id % 97 == 0; those rows are never training candidates.
    *
    * `ledgerOut` (opt-in) writes the per-document DROP LEDGER as
    * parquet (doc_id, stage, detail): the answer to "why is doc X not
    * in my training set" — stage ∈ {quality_gate, exact_dup, near_dup,
    * image_near_dup, contaminated, lm_gate, pt_gate}, detail = the
    * kept representative for near_dup/image_near_dup losers (null
    * elsewhere). The ledger is CONSERVED
    * against the funnel by a loud in-run check: every dropped row
    * appears exactly once, Σ ledger = rowsIn − afterPtGate. Costs one
    * extra materialization per dropping stage (pieces must pin their
    * rows before the stage checkpoint is released), so it is off by
    * default; determinism of the stages makes re-runs reproduce the
    * ledger bit-for-bit. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      shards: Int = 8, seed: Int = 17, minWords: Int = 10,
      ledgerOut: Option[String] = None,
      /** Image near-dup gate (r16, signal-honest): the gate keys on a
        * REAL binary asset column (+ optional per-row mime column) and
        * engages ONLY when the corpus carries that column — a
        * text-only corpus has no image signal, so the gate is OFF and
        * loses zero documents (the r15 `imageDedup` flag faked the
        * signal from a 64-char text prefix and defaulted ON, which
        * cost prefix-similar distinct documents on text-only
        * corpora). Rows whose asset is NULL never enter the gate;
        * decodable mimes (png/jpeg/bmp) hash real pixels, the rest
        * take the deterministic stub. Point these at a different
        * asset layout per corpus. */
      assetCol: String = "asset_bytes",
      assetMimeCol: String = "asset_mime"): Report = {
    val t0 = System.nanoTime()
    // per-stage wall attribution (r17): stages are synchronous (advance
    // materializes), so bracketing nanoTime is the stage's actual wall
    val walls = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def timed[T](name: String)(body: => T): T = {
      val s0 = System.nanoTime()
      try body finally walls += name -> (System.nanoTime() - s0) / 1e9
    }
    val docs = Tables(spark, sfDir, "documents")
    val hasAssets = docs.columns.contains(assetCol)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    var stage = docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        col("lang"), col("source"))
      .localCheckpoint(false)

    // release a superseded stage's checkpoint blocks eagerly — GC-driven
    // cleanup would let every stage's corpus copy pile up in the block
    // manager for the run's duration (fallback: no-op, the cleaner gets
    // it when the Dataset is unreachable)
    def release(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))

    // stage materialization is localCheckpoint, NOT cache: the funnel
    // chains a dozen stages, several of which reference their input
    // more than once (near-dup losers, LM labels, gate anti-joins), so
    // an un-truncated logical plan grows multiplicatively per stage —
    // round 9's extended chain OOM'd building plan strings before any
    // data moved. Checkpoints cut the plan at each stage while keeping
    // the one-pass-per-stage guarantee (lazy checkpoint + count fuse
    // into a single job, the ConnectedComponents discipline).
    def advance(next: DataFrame): Long = {
      val cp = next.localCheckpoint(false)
      val n = try cp.count()
        catch { case t: Throwable => release(cp); throw t }
      release(stage)
      stage = cp
      n
    }

    // drop-ledger pieces: each is checkpointed + counted BEFORE its
    // stage advances (advance releases the blocks the piece reads —
    // checkpoints have no lineage to recompute from), then written as
    // one frame at the end of the funnel
    val ledger = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def record(ids: DataFrame, stageName: String,
        detail: org.apache.spark.sql.Column = lit(null).cast("long")): Unit =
      if (ledgerOut.isDefined) {
        val piece = ids.select(col("doc_id"), lit(stageName).as("stage"),
          detail.as("detail")).localCheckpoint(false)
        piece.count()
        ledger += piece
      }

    // any stage failure must release the current corpus-scale cache
    // before the throw escapes — Bench catches and keeps running
    try {
    val rowsIn = timed("ingest")(stage.count())
    val qualityPass =
      QualityRules.gopherPass(TextOps.words(col("text")), Stops, minWords = minWords)
    val afterQuality = timed("quality_gate") {
      record(stage.filter(!qualityPass), "quality_gate")
      advance(stage.filter(qualityPass))
    }

    // corpus-wide segment dedup: docs shrink (never drop); the
    // reassembled text is the working text from here on
    val (afterSegment, segmentsIn, segmentsKept) = timed("segment_dedup") {
      val seg = SegmentDedup.dedupSegments(stage, "doc_id", "text", SegDivisor)
        .withColumnRenamed("id", "doc_id")
      val n = advance(stage.select(col("doc_id"), col("lang"), col("source"))
        .join(seg, Seq("doc_id"))
        .select(col("doc_id"), col("new_text").as("text"), col("lang"),
          col("source"), col("n_segments"), col("n_kept")))
      // one cheap agg over the checkpointed stage — the boilerplate-
      // removal story; the two count columns ride into the next stage's
      // input projection instead of paying a whole extra checkpoint pass
      val segRow = stage.agg(sum(col("n_segments")), sum(col("n_kept"))).head()
      (n, segRow.getLong(0), segRow.getLong(1))
    }
    require(afterSegment == afterQuality,
      "segment dedup must shrink documents, never drop them")

    // the dedup's kept-id list is consulted twice when the ledger is
    // on (record's anti-join, advance's kept rows) — pin the ids once
    // (a narrow doc_id column) so the hash-groupBy dedup itself runs
    // ONE pass, the lmFailed.cache() discipline
    val keptIds = ExactDedup.dedup(
        stage.drop("n_segments", "n_kept"), "doc_id", Seq("text"))
      .select(col("doc_id")).cache()
    val afterExact = timed("exact_dedup") {
      try {
        keptIds.count()
        record(stage.join(keptIds, Seq("doc_id"), "left_anti"), "exact_dup")
        advance(stage.drop("n_segments", "n_kept")
          .join(keptIds, Seq("doc_id"), "left_semi"))
      } finally keptIds.unpersist()
    }
    // ---- image near-dup gate (the m4/m5 multimodal face) -----------
    // IMAGE near-dup gate (r16, signal-honest): keys on the corpus's
    // REAL asset column — each image-bearing row's bytes hash through
    // the codec (real dHash for decodable mimes, deterministic stub
    // otherwise) and same-cover documents collapse to one
    // representative. The gate runs BEFORE the text near-dup on
    // purpose: a perceptual-hash screen is the CHEAP pass (one batch
    // decode + banded hash grouping, no shingle/LSH machinery), so it
    // removes same-cover documents first and the expensive MinHash
    // pass only shingles what survives — the screen-cheap-before-
    // expensive ordering every curation stack uses. Clusters keep only
    // the lowest-id representative; the losers get the SAME ledger
    // treatment as the text near-dup, so "why is image X gone" answers
    // from one conserved ledger. A corpus WITHOUT the asset column has
    // no image signal and skips the stage entirely (afterImageDedup
    // then equals afterExact and the ledger carries no image_near_dup
    // rows); rows with a NULL asset pass the gate untouched. The
    // asset bytes live in their OWN frame joined back by doc_id —
    // the funnel's checkpointed stages never carry the payload.
    val afterImageDedup = if (!hasAssets) afterExact else timed("image_dedup") {
      val assetRows = docs.filter(col("doc_id") % 97 =!= 0)
        .filter(col(assetCol).isNotNull)
        .select(col("doc_id"), col(assetCol), (if (docs.columns
            .contains(assetMimeCol)) col(assetMimeCol)
          else lit("application/octet-stream")).as("__mime"))
        .join(stage.select(col("doc_id")), Seq("doc_id"), "left_semi")
      val assets = graft.multimodal.Multimodal.assetsFromCols(
        spark, assetRows, "doc_id", assetCol, "__mime")
      val iclusters = graft.operators.SimHash.nearDupClusters(
        graft.multimodal.Multimodal.perceptualHashes(assets), maxDist = 3)
      val iLoserPairs = iclusters
        .join(iclusters.groupBy(col("comp")).agg(min(col("id")).as("keep")),
          Seq("comp"))
        .filter(col("id") =!= col("keep"))
        .select(col("id").as("doc_id"), col("keep"))
      record(iLoserPairs, "image_near_dup", col("keep"))
      advance(
        stage.join(iLoserPairs.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    }

    val afterNearDup = timed("near_dup") {
      val clusters = MinHashLSH.nearDupClusters(
        stage, "doc_id", "text", NearDupThreshold)
      val loserPairs = clusters
        .join(clusters.groupBy(col("comp")).agg(min(col("id")).as("keep")), Seq("comp"))
        .filter(col("id") =!= col("keep"))
        .select(col("id").as("doc_id"), col("keep"))
      record(loserPairs, "near_dup", col("keep"))
      val losers = loserPairs.select(col("doc_id"))
      advance(stage.join(losers, Seq("doc_id"), "left_anti"))
    }

    val afterDecontam = timed("decontam") {
      val bits = BloomContamination.buildBits(bench, "text", ContamN, BloomBits)
      val contaminated = BloomContamination
        .flagged(stage, "doc_id", "text", ContamN, bits)
        .select(col("id").as("doc_id"))
      record(contaminated, "contaminated")
      advance(stage.join(contaminated, Seq("doc_id"), "left_anti"))
    }

    // split BEFORE the model gates: models fit on train rows only
    val split = timed("split")(
      advance(Sampling.splitAssign(stage, "doc_id", Splits, seed)))
    require(split == afterDecontam, "split stage must preserve rows")

    // ---- bigram-LM gate (frozen model, train split only) ----------
    val lmFailed = timed("lm_score") {
      val model = LanguageModel.trainModel(
        stage.filter(col("split") === "train"), "doc_id", "text")
      val failed =
        try LanguageModel.scoreWith(model, stage, "doc_id", "text")
          .crossJoin(broadcast(model.v))
          .filter(col("mean_p") * col("v") < LmAlpha)
          .select(col("id").as("doc_id"))
          .cache()
        catch { case t: Throwable => model.release(); throw t }
      try failed.count() finally model.release() // batch-sized from here
      failed
    }

    // ---- perceptron distilled from the LM verdict -----------------
    // trained on the PRE-gate corpus (more supervision), gates the
    // survivors; integer trajectory → ptWeights pin determinism
    val ptWeights = timed("pt_train") {
      try {
        val labeled = stage
          .join(lmFailed.withColumn("lm_fail", lit(1)), Seq("doc_id"), "left")
          .withColumn("lm_label",
            when(col("lm_fail").isNotNull, "fail").otherwise("pass"))
        LinearClassifier.trainPerceptron(
          LinearClassifier.featureTable(labeled, "doc_id", "text", "lm_label", "pass"),
          PtDim, PtEpochs).last.after
      } catch { case t: Throwable => lmFailed.unpersist(); throw t }
    }

    val afterLmGate = timed("lm_gate") {
      try {
        record(lmFailed, "lm_gate")
        advance(stage.join(lmFailed, Seq("doc_id"), "left_anti"))
      } finally lmFailed.unpersist()
    }
    // pin the gate's verdict (a narrow doc_id list) before the ledger
    // anti-join and the advance semi-join both consult it — without
    // the cache the featureTable + perceptron scoring pass over the
    // corpus runs TWICE when the ledger is on
    val afterPtGate = timed("pt_gate") {
      val ptPassed = LinearClassifier.scoreWith(
        LinearClassifier.featureTable(stage, "doc_id", "text", "lang", "en"),
        ptWeights)
        .filter(col("score") > 0)
        .select(col("id").as("doc_id"))
        .cache()
      try {
        ptPassed.count()
        record(stage.join(ptPassed, Seq("doc_id"), "left_anti"), "pt_gate")
        advance(stage.join(ptPassed, Seq("doc_id"), "left_semi"))
      } finally ptPassed.unpersist()
    }

    // write the conserved ledger, then drop the pieces' blocks — a
    // loud identity check first: every dropped doc exactly once
    ledgerOut.foreach { path =>
      val all = ledger.reduce(_ unionByName _)
      val n = all.count()
      require(n == rowsIn - afterPtGate,
        s"drop ledger not conserved: $n entries vs ${rowsIn - afterPtGate} dropped rows")
      // no coalesce: the ledger is corpus-proportional in the worst
      // case (every doc dropped) — let it write at full parallelism
      all.write.mode("overwrite").parquet(path)
      ledger.foreach(release)
    }

    val splitCounts = stage.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trainRows = splitCounts.getOrElse("train", 0L)

    // ---- train export: upsample → interleave → batch → shard ------
    val (upsampledRows, batches) = timed("export") {
    val train = stage.filter(col("split") === "train")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val up = Sampling.weightedUpsample(
        train, "lang", "doc_id", UpRates, defaultRate = 1.0, seed = seed)
      .withColumn("uid", col("doc_id") * UidStride + col("copy_idx"))
    val inter = Sampling.proportionalInterleave(
        up, "source", "uid", MixWeights, defaultWeight = 1)
      .withColumn("toks", TextAnalysis.tokenCountWs(col("text")).cast("long"))
    val batched = SequencePacker.lengthBatches(
      inter.select(col("uid"), col("toks")), "uid", "toks", BatchWidth, BatchSize)
      .select(col("id").as("uid"), col("bucket"), col("batch_idx"),
        col("pos_in_batch"))
    // shuffle-hash, not sort-merge: both sides are the same train
    // stream keyed by the unique uid — a merge join would sort both
    // for no benefit (the export re-sorts by (shard, pos) anyway)
    // the interleave's per-stratum position exports as `ipos` — the
    // shard writer adds its own `pos` column, and the curriculum
    // contract (ikey = (ipos+1)/weight) must survive the export
    val export = inter.join(batched.hint("shuffle_hash"), Seq("uid"))
      .select(col("uid"), col("doc_id"), col("copy_idx"), col("text"),
        col("lang"), col("source"), col("pos").as("ipos"), col("ikey"),
        col("toks"), col("bucket"), col("batch_idx"), col("pos_in_batch"))
      .cache()
    try {
      val up = export.count()
      val b = export.select(col("bucket"), col("batch_idx")).distinct().count()
      ShuffleShard.writeShards(export, "uid", shards, seed, outDir)
      (up, b)
    } finally export.unpersist()
    }
    Report(rowsIn, afterQuality, segmentsIn, segmentsKept, afterExact,
      afterImageDedup, afterNearDup, afterDecontam, afterLmGate,
      afterPtGate, ptWeights,
      splitCounts, trainRows, upsampledRows, batches, shards,
      (System.nanoTime() - t0) / 1e9,
      walls.toSeq)
    } finally release(stage)
  }
}
