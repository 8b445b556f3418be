package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmJoin

/** Streaming COMPOSED IVM — the `ivm7` pipeline under a CDC stream
  * that changes ANY of the three bases of `(L ⋈ O) ⋈ C → aggregate`
  * (the canonical warehouse materialized view: a multi-way join
  * feeding a per-group (n, s) rollup — the reference maintains its
  * audit rollups by re-running exactly this query shape;
  * validation_dag.py:178-216 in the reference is counts over
  * dvt_results joined to table sets).
  *
  * The maintenance is COMPOSITION, not a bespoke tri-linear operator:
  * stage 1 emits Δ(L⋈O) through [[IvmJoin.deltaJoin]]'s bilinear
  * expansion; that signed stream is compressed to net multiplicities
  * and (a) applied to the maintained INTERMEDIATE rows store `rows_lo`
  * (the materialized L⋈O — higher-order IVM's classic trick: each
  * additional join consumes the upstream delta as its ΔR, with the
  * maintained intermediate as its R), and (b) re-enters stage 2 as ΔR
  * against `rows_lo` and C, whose output folds into the view through
  * [[IvmJoin.foldAggSigned]].
  *
  * Contract: the stage-1 join must be MANY-TO-ONE (each L row matches
  * at most one O row — the fact→dim snowflake shape), so the
  * intermediate inherits L's primary key and stage-1 deltas net to
  * |multiplicity| ≤ 1 per intermediate row; a violation raises inside
  * the compress step, before anything is written. Input stream: one
  * tagged change frame — `sideCol` ∈ {L, O, C}, `opCol` ∈ {I, D},
  * each side carrying its own payload columns (others null); batches
  * may mix sides freely — the per-stage cross terms make that exact.
  *
  * Storage is FIVE snapshot families per batch under `<dir>`:
  * `rows_l`/`rows_o` (partitioned by a stage-1-join-key hash bucket),
  * `rows_lo`/`rows_c` (partitioned by the stage-2 key bucket) and
  * `agg`; commit = all five `_SUCCESS`, recompute-from-latest-
  * committed on redelivery — the family's exactly-once discipline.
  *
  * Per-batch compute is delta-proportional: every deltaJoin leg
  * broadcasts a (compressed) delta; each stored side is consulted only
  * against the OTHER side's delta keys, so its read prunes to those
  * buckets (batch-bounded driver lists) — an L-only batch reads zero
  * rows_c files beyond its own downstream keys, a C-only batch reads
  * zero rows_l/rows_o files at all. The snapshot rewrite of untouched
  * buckets is the documented test-scale simplification (partitioned
  * upsert in production — the affected/untouched split is already
  * explicit).
  *
  * Contract (StreamingIvmComposeSpec): after batch N commits,
  * [[readView]] equals the full `(L⋈O)⋈C` aggregate recompute over
  * surviving delivered rows — L-only, O-only, C-only and mixed
  * batches, both stage cross terms included — `rows_lo` equals the
  * recomputed join, restart recovers from the snapshot quintuple, and
  * per-side CDC violations fail loudly before anything commits.
  */
object StreamingIvmCompose {

  private val Families = Seq("rows_l", "rows_o", "rows_lo", "rows_c", "agg")

  private def snapRoot(dir: String, family: String) =
    new HPath(new HPath(dir), family)

  private def snapPath(dir: String, family: String, id: Long) =
    new HPath(snapRoot(dir, family), s"batch=$id")

  private def committedIn(
      spark: SparkSession, dir: String, family: String): Set[Long] = {
    val root = snapRoot(dir, family)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).toSet
  }

  private def committed(spark: SparkSession, dir: String): Seq[Long] =
    Families.map(committedIn(spark, dir, _)).reduce(_ & _).toSeq.sorted

  /** Fold ONE static tagged change batch into the maintained stores as
    * micro-batch `batchId`. `lCols`/`oCols`/`cCols` name each side's
    * payload columns (stage keys included); `keyColL`/`keyColO`/
    * `keyColC` are the per-side primary keys for the CDC discipline.
    * `joinKeys1` joins L⋈O, `joinKeys2` joins the intermediate to C;
    * `groupCols` (from C) and `valueCol` (from L) shape the view.
    * Returns the view's group count after the fold (-1 for an empty
    * batch). */
  def applyBatch(
      batch: DataFrame, batchId: Long,
      sideCol: String, opCol: String,
      lCols: Seq[String], oCols: Seq[String], cCols: Seq[String],
      keyColL: String, keyColO: String, keyColC: String,
      joinKeys1: Seq[String], joinKeys2: Seq[String],
      groupCols: Seq[String], valueCol: String,
      dir: String,
      storeBuckets: Int = StreamingIvmMinMax.StoreBuckets): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    Seq("__g_bucket", "__op", "__w", "__net").foreach(c =>
      require(!batch.columns.contains(c),
        s"change batch already contains reserved column '$c'"))
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D") ||
      col(sideCol).isNull ||
      (col(sideCol) =!= "L" && col(sideCol) =!= "O" && col(sideCol) =!= "C"))
      .limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} or side " +
        s"outside {L, O, C} — refusing to fold a malformed delta into the view")

    // the intermediate join's rows: L's pk (so deletes pair exactly)
    // plus everything stage 2 consumes
    val loCols = (Seq(keyColL) ++ joinKeys2 ++ Seq(valueCol)).distinct
    val prior = committed(spark, dir).filter(_ < batchId)
    def bucketize(keys: Seq[String]) =
      pmod(xxhash64(keys.map(col): _*), lit(storeBuckets.toLong)).cast("int")

    def prevRowsOf(family: String, cols: Seq[String]): DataFrame =
      prior.lastOption
        .map(id => spark.read.parquet(snapPath(dir, family, id).toString)
          .select(cols.map(col): _*))
        .getOrElse(batch.filter(lit(false)).select(cols.map(col): _*))
    // previous snapshots re-read WITH the bucket column, pruned to the
    // probing delta's buckets (batch-bounded driver lists) — the fold
    // uses PRE-delta states per the bilinear formula, so prune the
    // PREVIOUS snapshots, not the ones written this batch
    def prevBucketed(family: String, cols: Seq[String], bs: Seq[Int]): DataFrame =
      prior.lastOption.map { id =>
        val full = spark.read.parquet(snapPath(dir, family, id).toString)
        (if (bs.isEmpty) full.filter(lit(false))
         else full.filter(col("__g_bucket").isin(bs: _*)))
          .select(cols.map(col): _*)
      }.getOrElse(batch.filter(lit(false)).select(cols.map(col): _*))
    def bucketsOf(d: DataFrame, keys: Seq[String]): Seq[Int] =
      d.select(bucketize(keys).as("__b")).distinct()
        .collect().map(_.getInt(0)).toSeq

    val dL = batch.filter(col(sideCol) === "L")
      .select(lCols.map(col) :+ col(opCol).as("__op"): _*)
    val dO = batch.filter(col(sideCol) === "O")
      .select(oCols.map(col) :+ col(opCol).as("__op"): _*)
    val dC = batch.filter(col(sideCol) === "C")
      .select(cCols.map(col) :+ col(opCol).as("__op"): _*)

    val prevL = prevRowsOf("rows_l", lCols)
    val prevO = prevRowsOf("rows_o", oCols)
    val prevC = prevRowsOf("rows_c", cCols)
    val prevLO = prevRowsOf("rows_lo", loCols)
    val afterL = StreamingIvmJoin.applySide(dL, prevL, keyColL, batchId, "L")
    val afterO = StreamingIvmJoin.applySide(dO, prevO, keyColO, batchId, "O")
    val afterC = StreamingIvmJoin.applySide(dC, prevC, keyColC, batchId, "C")

    // ---- stage 1: Δ(L⋈O), bilinear, both store legs delta-pruned ----
    val d1 = IvmJoin.deltaJoin(dL, dO,
      prevBucketed("rows_l", lCols, bucketsOf(dO, joinKeys1)),
      prevBucketed("rows_o", oCols, bucketsOf(dL, joinKeys1)),
      joinKeys1, "__op", loCols)
    // compress raw bilinear rows (a reprice whose order dies in the
    // same batch emits 5 rows netting one D) to net multiplicities —
    // |net| > 1 would mean the L⋈O join is not many-to-one and the
    // intermediate store has no primary key: refuse loudly. The
    // compressed delta is consulted several times below (store apply,
    // stage-2 legs, bucket lists) — pin it, batch-sized.
    val dlo = d1
      .withColumn("__w", when(col("__op") === "I", 1L).otherwise(-1L))
      .groupBy(loCols.map(col): _*)
      .agg(sum(col("__w")).as("__net"))
      .filter(col("__net") =!= 0)
      .withColumn("__op",
        when(abs(col("__net")) > 1,
          raise_error(concat(
            lit("stage-1 delta nets |multiplicity| > 1 for one " +
              "intermediate row — the L⋈O join is not many-to-one (net "),
            col("__net").cast("string"), lit(")"))))
          .when(col("__net") === 1, lit("I")).otherwise(lit("D")))
      .drop("__net")
      .cache()
    try {
      val afterLO =
        StreamingIvmJoin.applySide(dlo, prevLO, keyColL, batchId, "LO")

      // ---- stage 2: Δ((L⋈O)⋈C) — upstream delta AS this join's ΔR ----
      val d2 = IvmJoin.deltaJoin(dlo, dC,
        prevBucketed("rows_lo", loCols, bucketsOf(dC, joinKeys2)),
        prevBucketed("rows_c", cCols, bucketsOf(dlo, joinKeys2)),
        joinKeys2, "__op", groupCols :+ valueCol)
      val prevAgg = prior.lastOption
        .map(id => spark.read.parquet(snapPath(dir, "agg", id).toString))
      val agg1 = IvmJoin.foldAggSigned(prevAgg, d2, groupCols, valueCol, "__op")

      def writeRows(family: String, rows: DataFrame, keys: Seq[String]): Unit =
        rows.withColumn("__g_bucket", bucketize(keys))
          .repartition(col("__g_bucket"))
          .write.mode("overwrite").partitionBy("__g_bucket")
          .parquet(snapPath(dir, family, batchId).toString)
      writeRows("rows_l", afterL, joinKeys1)
      writeRows("rows_o", afterO, joinKeys1)
      writeRows("rows_lo", afterLO, joinKeys2)
      writeRows("rows_c", afterC, joinKeys2)
      agg1.write.mode("overwrite")
        .parquet(snapPath(dir, "agg", batchId).toString)
    } finally dlo.unpersist()
    prior.dropRight(1).foreach { id =>
      Families.foreach(f => fs.delete(snapPath(dir, f, id), true))
    }
    spark.read.parquet(snapPath(dir, "agg", batchId).toString).count()
  }

  /** Wire the per-batch fold onto a STREAMING tagged change frame;
    * `onBatch` observes (batchId, groupCount). Call `.start()`. */
  def applyStream(
      changes: DataFrame, sideCol: String, opCol: String,
      lCols: Seq[String], oCols: Seq[String], cCols: Seq[String],
      keyColL: String, keyColO: String, keyColC: String,
      joinKeys1: Seq[String], joinKeys2: Seq[String],
      groupCols: Seq[String], valueCol: String,
      dir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, sideCol, opCol,
        lCols, oCols, cCols, keyColL, keyColO, keyColC,
        joinKeys1, joinKeys2, groupCols, valueCol, dir))
    }
  }

  def hasCommitted(spark: SparkSession, dir: String): Boolean =
    committed(spark, dir).nonEmpty

  /** The maintained view as of the latest committed batch:
    * (groupCols…, n, s). */
  def readView(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed composed view under $dir")
    spark.read.parquet(snapPath(dir, "agg", snaps.last).toString)
  }

  /** Surviving rows of one family ("rows_l" / "rows_o" / "rows_lo" /
    * "rows_c"), bucket column dropped. */
  def readRows(spark: SparkSession, dir: String, family: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed rows store under $dir")
    spark.read.parquet(snapPath(dir, family, snaps.last).toString)
      .drop("__g_bucket")
  }
}
