package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.Upsert

/** Streaming face of the incremental SCD2 apply — a change stream
  * maintains a Type-2 dimension with per-micro-batch
  * [[Upsert.scd2Apply]] cost (touched keys only), the `foreachBatch`
  * stream-static pattern of [[StreamingShard]].
  *
  * Storage splits the dimension by mutability, so a batch never
  * rewrites history:
  *  - `<dimDir>/closed/batch=<id>/` — versions that closed during
  *    micro-batch `id`. Closed versions are immutable forever, so this
  *    side is append-only, one subdir per batch.
  *  - `<dimDir>/open/batch=<id>/` — the COMPLETE open set (one row per
  *    key) as of batch `id`. Key-set-sized, far smaller than history;
  *    rewritten per batch, with the previous snapshot retained.
  *
  * Exactly-once without a write-ahead log: every batch's output paths
  * are keyed by its `batchId`, and a batch always recomputes from the
  * LATEST COMMITTED open snapshot with id < its own (commit = the
  * snapshot dir's `_SUCCESS` marker). A restarted query that redelivers
  * micro-batch N therefore reads the same N−1 input and overwrites
  * `closed/batch=N` + `open/batch=N` with identical bytes — idempotent
  * at any crash point, including after a torn snapshot write (no
  * `_SUCCESS` → the retry ignores it). Snapshots older than the
  * previous one are garbage-collected after each commit, so steady
  * state holds two open snapshots.
  *
  * [[readDim]] is the query face: all closed versions ∪ the latest
  * open snapshot ≡ `scd2History` of every change delivered so far
  * (row-for-row — StreamingScd2Spec proves it against the batch
  * rebuild). */
object StreamingScd2 {

  private def openRoot(dimDir: String) = new HPath(dimDir, "open")
  private def closedRoot(dimDir: String) = new HPath(dimDir, "closed")

  /** Committed (has `_SUCCESS`) open-snapshot batch ids, ascending. */
  private def committedOpens(spark: SparkSession, dimDir: String): Seq[Long] = {
    val root = openRoot(dimDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).sorted
  }

  /** Apply ONE change batch (static DataFrame) as micro-batch
    * `batchId`; returns the number of currently-open keys after the
    * apply. Exposed for direct use/testing — [[applyStream]] wires it
    * into foreachBatch. */
  def applyBatch(
      batch: DataFrame, batchId: Long, keys: Seq[String], attrs: Seq[String],
      orderCols: Seq[String], dimDir: String): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dimDir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L // no state change; snapshot ids may skip
    val prior = committedOpens(spark, dimDir).filter(_ < batchId)
    val result = prior.lastOption match {
      case None => Upsert.scd2History(batch, keys, attrs, orderCols)
      case Some(prev) =>
        val open = spark.read.parquet(
          new HPath(openRoot(dimDir), s"batch=$prev").toString)
        Upsert.scd2Apply(open, batch, keys, attrs, orderCols)
    }
    val r = result.localCheckpoint(false)
    r.filter(!col("is_current")).write.mode("overwrite")
      .parquet(new HPath(closedRoot(dimDir), s"batch=$batchId").toString)
    val open = r.filter(col("is_current")).localCheckpoint(false)
    val n = open.count()
    open.write.mode("overwrite")
      .parquet(new HPath(openRoot(dimDir), s"batch=$batchId").toString)
    // GC: keep this snapshot and its input; drop everything older
    prior.dropRight(1).foreach(id =>
      fs.delete(new HPath(openRoot(dimDir), s"batch=$id"), true))
    n
  }

  /** Wire the per-batch apply onto a STREAMING change DataFrame;
    * `onBatch` observes (batchId, openKeys). Call `.start()`. */
  def applyStream(
      changes: DataFrame, keys: Seq[String], attrs: Seq[String],
      orderCols: Seq[String], dimDir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use Upsert.scd2History/scd2Apply for static batches)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, keys, attrs, orderCols, dimDir))
    }
  }

  /** Has any open snapshot committed yet? The guard callers need
    * before [[readDim]] on a possibly-empty stream (e.g.
    * [[StreamingRefAudit]] auditing before the first non-empty
    * batch). */
  def hasCommitted(spark: SparkSession, dimDir: String): Boolean =
    committedOpens(spark, dimDir).nonEmpty

  /** The full dimension as of the latest committed batch: every closed
    * version ∪ the latest open snapshot. */
  def readDim(spark: SparkSession, dimDir: String): DataFrame = {
    val opens = committedOpens(spark, dimDir)
    require(opens.nonEmpty, s"no committed dimension under $dimDir")
    val open = spark.read.parquet(
      new HPath(openRoot(dimDir), s"batch=${opens.last}").toString)
    val croot = closedRoot(dimDir)
    val fs = croot.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(croot)) open
    else open.unionByName(
      // closed/batch=N commits before open/batch=N, so committed-open
      // id bounds the committed-closed ids: the partition filter keeps
      // a torn in-flight batch's closed rows out of the read
      spark.read.parquet(croot.toString)
        .filter(col("batch") <= opens.last).drop("batch"))
  }
}
