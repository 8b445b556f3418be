package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmTopK

/** Streaming IVM for per-group TOP-K by count — the `ivm6` fold under
  * a CDC stream: each micro-batch of (groupCols…, op, key) occurrence
  * rows folds through [[IvmTopK.fold]], so "who are the top K keys per
  * group right now" is maintained continuously with deletes honored
  * exactly — the piece [[StreamingHeavyHitters]]'s monotone
  * state-store counts deliberately do not cover (its contract is
  * insert-only corpora; this one is full CDC).
  *
  * Storage is TWO snapshot families per batch under `<dir>` —
  * `counts/batch=<id>` and `topk/batch=<id>`, both partitioned by the
  * [[StreamingIvmMinMax]] `__g_bucket` group-hash layout — written in
  * that order; a batch is committed only when BOTH carry `_SUCCESS`,
  * every fold recomputes from the latest committed pair with id < its
  * own, so redelivery after a crash at any point reads the same input
  * and overwrites identical bytes (the family's exactly-once
  * discipline without a WAL). Steady state holds two snapshot pairs.
  * No rows store exists at all: counts fold invertibly, so the counts
  * snapshot IS the finest truth the view needs — over-deletes are
  * refused by the fold's own count guard, not by a delete-image check.
  *
  * Both store reads are partition-PRUNED to the batch's own group
  * buckets (a batch-bounded driver list — the audited-collect
  * discipline): [[IvmTopK.fold]]'s group-level pruned-store contract
  * makes the pruned slice sufficient, untouched groups ride into the
  * next snapshot unread. The fold's compute is therefore proportional
  * to the delta plus the BROKEN groups' store slices, never the whole
  * store; what stays store-sized is the snapshot rewrite of untouched
  * buckets, the documented test-scale simplification (a production
  * deployment upserts only the affected bucket partitions).
  *
  * Contract (StreamingIvmTopKSpec): after batch N commits, [[readTopK]]
  * equals the full top-K recompute over every surviving delivered
  * occurrence, bit-for-bit, across checkpoint stop/restart; malformed
  * deltas (bad op, over-deletes) fail the batch loudly BEFORE anything
  * commits.
  */
object StreamingIvmTopK {

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
    (committedIn(spark, dir, "counts") & committedIn(spark, dir, "topk"))
      .toSeq.sorted

  /** Fold ONE static change batch (groupCols…, opCol, keyCol
    * [, weightCol]) into the maintained store as micro-batch
    * `batchId`; returns the view's row count after the fold (-1 for an
    * empty batch). `weightCol` switches the maintained measure to the
    * per-key positive-long weight SUM — [[IvmTopK]]'s weighted face
    * (top customers by revenue); delete rows must carry the weight
    * they remove. */
  def applyBatch(
      batch: DataFrame, batchId: Long,
      groupCols: Seq[String], opCol: String, keyCol: String, k: Int,
      dir: String,
      storeBuckets: Int = StreamingIvmMinMax.StoreBuckets,
      weightCol: Option[String] = None): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    require(!batch.columns.contains("__g_bucket"),
      "change batch already contains reserved column '__g_bucket'")
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D")).limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} (or NULL) " +
        s"in '$opCol' — refusing to fold a malformed delta into the view")

    val prior = committed(spark, dir).filter(_ < batchId)
    val bucketize =
      pmod(xxhash64(groupCols.map(col): _*), lit(storeBuckets.toLong)).cast("int")
    // batch-bounded driver list (≤ storeBuckets ints) naming the only
    // store partitions this fold may touch
    val deltaBuckets = batch.select(bucketize.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val prevCountsAll = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "counts", id).toString))
    val prevTopkAll = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "topk", id).toString))
    val prevState = prior.lastOption.map { _ =>
      (prevTopkAll.get.filter(col("__g_bucket").isin(deltaBuckets: _*))
          .drop("__g_bucket"),
        prevCountsAll.get.filter(col("__g_bucket").isin(deltaBuckets: _*))
          .drop("__g_bucket"))
    }

    val (topkAff, countsAff) = IvmTopK.fold(prevState,
      batch.select(((groupCols.map(col) :+ col(opCol)) :+ col(keyCol)) ++
        weightCol.map(col): _*),
      groupCols, opCol, keyCol, k, weightCol)
    def withRemainder(aff: DataFrame, prevAll: Option[DataFrame]): DataFrame =
      prevAll.map(p => aff.unionByName(
          p.filter(!col("__g_bucket").isin(deltaBuckets: _*))
            .drop("__g_bucket")))
        .getOrElse(aff)

    // counts first (the view derives from them), then the view; commit
    // is the pair's intersection either way
    withRemainder(countsAff, prevCountsAll)
      .withColumn("__g_bucket", bucketize)
      .repartition(col("__g_bucket"))
      .write.mode("overwrite").partitionBy("__g_bucket")
      .parquet(snapPath(dir, "counts", batchId).toString)
    withRemainder(topkAff, prevTopkAll)
      .withColumn("__g_bucket", bucketize)
      .repartition(col("__g_bucket"))
      .write.mode("overwrite").partitionBy("__g_bucket")
      .parquet(snapPath(dir, "topk", batchId).toString)
    prior.dropRight(1).foreach { id =>
      fs.delete(snapPath(dir, "counts", id), true)
      fs.delete(snapPath(dir, "topk", id), true)
    }
    spark.read.parquet(snapPath(dir, "topk", batchId).toString).count()
  }

  /** Wire the per-batch fold onto a STREAMING change frame; `onBatch`
    * observes (batchId, viewRowCount). Call `.start()`. */
  def applyStream(
      changes: DataFrame, groupCols: Seq[String], opCol: String,
      keyCol: String, k: Int, dir: String,
      onBatch: (Long, Long) => Unit = (_, _) => (),
      weightCol: Option[String] = None): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, groupCols, opCol, keyCol, k, dir,
        weightCol = weightCol))
    }
  }

  def hasCommitted(spark: SparkSession, dir: String): Boolean =
    committed(spark, dir).nonEmpty

  /** The maintained view as of the latest committed batch:
    * (groupCols…, keyCol, cnt, rnk), the `__g_bucket` partition key
    * kept internal. */
  def readTopK(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed top-k view under $dir")
    spark.read.parquet(snapPath(dir, "topk", snaps.last).toString)
      .drop("__g_bucket")
  }

  /** The maintained counts store as of the latest committed batch. */
  def readCounts(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed counts store under $dir")
    spark.read.parquet(snapPath(dir, "counts", snaps.last).toString)
      .drop("__g_bucket")
  }
}
