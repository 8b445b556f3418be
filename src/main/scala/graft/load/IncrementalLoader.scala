package graft.load

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.AuditSink

/** Incremental (file-arrival-driven) append loads as Structured
  * Streaming (SURVEY §2.9; reference `hive_bq_load_utils_inc.py:60-115,
  * 193-278,542-666` + the daily window in `constants.py:84-90`).
  *
  * The reference polls a Pub/Sub audit table daily for newly-arrived
  * objects, parses paths, checks already-loaded status, and appends the
  * new files. Spark-first equivalent: a streaming file source over the
  * arrival directory; `Trigger.AvailableNow` turns each run into the
  * daily batch; the checkpoint gives at-most-once file pickup; and an
  * audit anti-join ([[alreadyLoaded]] — the J2 rerun delta) makes
  * appends idempotent under retries and checkpoint loss (the
  * exactly-once story under §2.9's "audit-gated dedup").
  */
final class IncrementalLoader(
    spark: SparkSession,
    audit: AuditSink,
    auditTable: String = "graft_inc_load_audit",
    maxFilesPerBatch: Int = IncrementalLoader.DefaultMaxFilesPerBatch) {

  import spark.implicits._

  /** Files already appended successfully (status PASS) — the rerun
    * delta anti-join side (`constants.py:28-38,92-100`). */
  def alreadyLoaded(targetTable: String): DataFrame =
    if (audit.exists(auditTable))
      audit.read(auditTable)
        .filter(col("target_table") === targetTable && col("status") === "PASS")
        .select("file_path").distinct()
    else Seq.empty[String].toDF("file_path")

  /** One micro-batch: drop rows from files that are already loaded,
    * append the rest, audit the newly loaded files. */
  /** `batch` must already carry a `file_path` column (selected from
    * `_metadata` at the source — `input_file_name()` is empty inside
    * foreachBatch micro-batches of a file stream). */
  private[load] def processBatch(
      batch: DataFrame, targetTable: String): Unit = {
    val withFile = batch
    val fresh = withFile
      .join(broadcast(alreadyLoaded(targetTable)), Seq("file_path"), "left_anti")
      .cache()
    try {
      val distinctFiles = fresh.select("file_path").distinct().cache()
      // the per-file audit rows are collected driver-side; the bound is
      // a day's arrivals (the reference's load unit) — enforce it rather
      // than assume it, and COUNT before collecting so an over-cap batch
      // never materializes on the driver
      val files = try {
        val nFiles = distinctFiles.count()
        require(nFiles <= maxFilesPerBatch,
          s"incremental batch for $targetTable has $nFiles distinct files, over the " +
            s"$maxFilesPerBatch driver-side audit cap — shard the drop directory into " +
            "smaller daily prefixes or raise maxFilesPerBatch")
        distinctFiles.as[String].collect()
      } finally distinctFiles.unpersist()
      if (files.nonEmpty) {
        val rows = fresh.drop("file_path")
        if (spark.catalog.tableExists(targetTable))
          rows.write.mode(SaveMode.Append).insertInto(targetTable)
        else rows.write.saveAsTable(targetTable)
        audit.appendRows(auditTable, files.toSeq.map(f =>
          IncrementalLoader.IncAuditRow(f, targetTable, "PASS",
            new java.sql.Timestamp(System.currentTimeMillis()))))
        // the batch df writes through the streaming clone session; the
        // outer session's cached file listing must be refreshed
        spark.catalog.refreshTable(targetTable)
      }
    } finally fresh.unpersist()
  }

  /** Run one incremental pass over `sourceDir` (AvailableNow — the
    * "daily 22:00 batch"), appending new files into `targetTable`. */
  def runOnce(
      sourceDir: String,
      schema: StructType,
      targetTable: String,
      checkpointDir: String,
      format: String = "parquet"): Unit = {
    val stream = spark.readStream.schema(schema).format(format).load(sourceDir)
      .select(col("*"), col("_metadata.file_path").as("file_path"))
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, _: Long) => processBatch(df, targetTable))
      .start()
    q.awaitTermination()
  }
}

object IncrementalLoader {
  /** Driver-side cap on distinct arrived files audited per micro-batch.
    * 100k paths ≈ a few MB of driver memory — far above any daily
    * arrival volume the reference's per-file load unit implies. */
  val DefaultMaxFilesPerBatch = 100000

  final case class IncAuditRow(
      file_path: String, target_table: String, status: String,
      run_time: java.sql.Timestamp)
}
