package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Forget

/** Streaming right-to-be-forgotten: erasure requests arrive as a
  * stream (a GDPR ticket queue, an opt-out topic) and every table view
  * handed out afterwards is scrubbed of everything requested SO FAR —
  * the freshness face of [[graft.operators.Forget]], the way
  * [[StreamingRefAudit]] is the freshness face of RefIntegrity.
  *
  * State is the accumulated key set only, stored batchId-keyed
  * (`keysDir/batch=<id>`, one overwrite-idempotent directory per
  * micro-batch — the [[StreamingScd2]] storage discipline): a
  * redelivered batch lands in the same directory and the union is
  * unchanged, so restarts need no WAL and no dedup state. The set is
  * MONOTONE (erasure is never un-requested), which is what makes
  * per-batch overwrite sufficient where SCD2 needs snapshots.
  *
  * Contract (StreamingForgetSpec): after micro-batch N commits,
  * `scrubbedView(table, …)` equals `Forget.scrub(table, keys of
  * batches 0..N)` row-for-row; before any batch commits it is `table`
  * itself. Scale: the key set stays tiny next to the data (it's an
  * opt-out list), so views scrub by broadcast anti-join — reading a
  * view costs one scan of the table regardless of how many batches
  * accumulated.
  */
object StreamingForget {

  private val KeyCol = "forget_key"

  /** Wire a single-column streaming frame of erasure keys into
    * `keysDir`. `onBatch` observes each committed batch id (audit the
    * views, refresh exports). Call `.start()` with a checkpoint. */
  def accumulate(
      requests: DataFrame,
      keysDir: String,
      onBatch: (Long, SparkSession) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(requests.isStreaming,
      "accumulate expects a streaming frame (static lists go straight to Forget.scrub)")
    require(requests.columns.length == 1,
      s"erasure stream must have exactly one key column, got ${requests.columns.toSeq}")
    requests.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      b.toDF(KeyCol).distinct().coalesce(1)
        .write.mode("overwrite").parquet(s"$keysDir/batch=$id")
      onBatch(id, b.sparkSession)
    }
  }

  /** Committed (`_SUCCESS`-marked) batch ids, ascending — the
    * [[StreamingScd2]] commit convention, through the Hadoop FS so any
    * storage the stream writes to is the storage views read from (a
    * java.nio check would silently report "no keys" on non-local
    * paths — an unscrubbed view with no error, the worst failure mode
    * an erasure API can have). A torn batch directory from a mid-write
    * crash has no `_SUCCESS` and is excluded until its replay. */
  private def committedBatches(spark: SparkSession, keysDir: String): Seq[Long] = {
    val root = new HPath(keysDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).sorted
  }

  /** True once at least one micro-batch of keys has committed. */
  def hasKeys(spark: SparkSession, keysDir: String): Boolean =
    committedBatches(spark, keysDir).nonEmpty

  /** Every erasure key accumulated so far, one column, distinct. Reads
    * only `_SUCCESS`-committed batch directories. */
  def forgetKeys(spark: SparkSession, keysDir: String): DataFrame = {
    val ids = committedBatches(spark, keysDir)
    require(ids.nonEmpty, s"no committed erasure batches under $keysDir")
    // the same key requested in two batches is one erasure
    ids.map(id => spark.read.parquet(s"$keysDir/batch=$id"))
      .reduce(_ unionByName _).select(KeyCol).distinct()
  }

  /** The scrubbed view of `table` as of the last committed batch —
    * `table` itself before any batch commits. */
  def scrubbedView(
      spark: SparkSession, table: DataFrame, keyCol: String, keysDir: String,
      broadcastKeys: Boolean = true): DataFrame =
    if (!hasKeys(spark, keysDir)) table
    else Forget.scrub(table, keyCol, forgetKeys(spark, keysDir), broadcastKeys)

  /** Per-table touch report as of the last committed batch (empty-set
    * audit — all rows retained — before any batch commits). */
  def auditView(
      spark: SparkSession, tables: Seq[(String, DataFrame, String)],
      keysDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val keys =
      if (hasKeys(spark, keysDir)) forgetKeys(spark, keysDir)
      else tables.head._2.select(lit(null).cast(
        tables.head._2.schema(tables.head._3).dataType).as(KeyCol)).limit(0)
    Forget.audit(tables, keys)
  }
}
