package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Audit-row model + sink (SURVEY §2.2 K3/K4, §7.1 module 2).
  *
  * The reference streams JSON rows into ~18 `dmt_logs.*` BigQuery audit
  * tables (`bigquery_client_utils/utils.py:9-27`; schemas under
  * `terraform/translation/bq/bq_schemas`). Here the same row shapes are
  * case classes appended to Parquet-backed catalog tables in a
  * `dmt_logs` database — small, append-only writes; partitioning is
  * unnecessary at audit volumes, and readers filter on unique_id which
  * parquet row-group stats already serve.
  */
object Audit {

  final case class SchemaResult(
      unique_id: String, script_name: String, status: String,
      attempts: Int, error_detail: String, run_time: Timestamp)

  final case class TranslationResult(
      unique_id: String, file_name: String, statement_index: Int,
      category: String, message: String, run_time: Timestamp)

  final case class LoadResult(
      unique_id: String, table_name: String, status: String,
      rows_loaded: Long, message: String, run_time: Timestamp)

  final case class DvtResult(
      unique_id: String, validation_type: String, table_name: String,
      validation_name: String, source_agg_value: Double,
      target_agg_value: Double, pct_difference: Double,
      validation_status: String, run_time: Timestamp)

  final case class ReportRow(
      unique_id: String, phase: String, total: Long, succeeded: Long,
      failed: Long, status: String, run_time: Timestamp)

  /** One failed task, nested into the run-level report row (reference:
    * `dmt_report_table.json` Error RECORD REPEATED; populated like
    * `reporting_operator.py:104-127` scrapes failed task instances).
    * `log_link` points at the audit table holding the detail rows — the
    * engine's analog of the Airflow task-log URL. */
  final case class TaskError(
      task_name: String, error_message: String, log_link: String)

  /** Run-level report row mirroring the reference's report schema
    * (unique_id, source_db, dag_name, execution_time, dag_status,
    * Error array). One row per Controller run, nested errors included —
    * the flat per-phase ReportRow rows remain for counting. */
  final case class DagReportRow(
      unique_id: String, source_db: String, dag_name: String,
      execution_time: Timestamp, dag_status: String, Error: Seq[TaskError])

  /** Success/Partial/Failed per the reference's report classifier
    * (`reporting_operator.py:131-139`). */
  def classify(total: Long, succeeded: Long): String =
    if (total == 0 || succeeded == total) "Success"
    else if (succeeded == 0) "Failed"
    else "Partial"
}

/** Appends audit rows to `<database>.<table>` catalog tables. */
final class AuditSink(spark: SparkSession, database: String = "dmt_logs") {

  def ensureDatabase(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")

  def append(table: String, df: DataFrame): Unit = {
    ensureDatabase()
    df.write.mode(SaveMode.Append).saveAsTable(s"$database.$table")
  }

  def appendRows[T <: Product: scala.reflect.runtime.universe.TypeTag](
      table: String, rows: Seq[T]): Unit =
    if (rows.nonEmpty) append(table, spark.createDataFrame(rows))

  def read(table: String): DataFrame = spark.table(s"$database.$table")

  def exists(table: String): Boolean =
    spark.catalog.tableExists(s"$database.$table")
}
