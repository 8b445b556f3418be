package graft.streaming

import java.nio.file.{Files, Paths}

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

  /** True once at least one micro-batch of keys has committed. */
  def hasKeys(keysDir: String): Boolean = {
    val p = Paths.get(keysDir)
    Files.isDirectory(p) && Files.list(p).filter(d =>
      d.getFileName.toString.startsWith("batch=")).findFirst().isPresent
  }

  /** Every erasure key accumulated so far, one column, distinct. */
  def forgetKeys(spark: SparkSession, keysDir: String): DataFrame = {
    require(hasKeys(keysDir), s"no committed erasure batches under $keysDir")
    // partition discovery surfaces batch= as a column — drop it; the
    // same key requested in two batches is one erasure
    spark.read.parquet(keysDir).select(KeyCol).distinct()
  }

  /** The scrubbed view of `table` as of the last committed batch —
    * `table` itself before any batch commits. */
  def scrubbedView(
      spark: SparkSession, table: DataFrame, keyCol: String, keysDir: String,
      broadcastKeys: Boolean = true): DataFrame =
    if (!hasKeys(keysDir)) table
    else Forget.scrub(table, keyCol, forgetKeys(spark, keysDir), broadcastKeys)

  /** Per-table touch report as of the last committed batch (empty-set
    * audit — all rows retained — before any batch commits). */
  def auditView(
      spark: SparkSession, tables: Seq[(String, DataFrame, String)],
      keysDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val keys =
      if (hasKeys(keysDir)) forgetKeys(spark, keysDir)
      else tables.head._2.select(lit(null).cast(
        tables.head._2.schema(tables.head._3).dataType).as(KeyCol)).limit(0)
    Forget.audit(tables, keys)
  }
}
