package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transfer-log parsing + per-table stats fold (SURVEY §2.4 J7 / §2.1
  * S11; reference `teradata_transfer_run_log_dag.py:281-470`).
  *
  * The reference pages DTS transfer logs and folds ordered lines into a
  * per-table dict of job stats with seven regex classes, in a driver
  * loop. Spark-first: logs are a `Dataset[String]`, each regex class is
  * a `regexp_extract` column, and the per-table fold is one groupBy
  * with `max`/`first(ignoreNulls)` aggregates — a single shuffle
  * instead of a stateful loop, at any log volume.
  */
object LogStats {

  /** Regex classes over log lines (shape mirrors the reference's
    * pattern set: start/rows/bytes/status per table). */
  private val TableRe = """table\s+(\w+)"""
  val RowsRe: String = TableRe + """\s+rows\s+(\d+)"""
  val BytesRe: String = TableRe + """\s+bytes\s+(\d+)"""
  val StatusRe: String = TableRe + """\s+status\s+(\w+)"""

  /** Parse a `value` column of raw log lines into (table, rows, bytes,
    * status) typed columns (nulls where a class doesn't match). */
  def parse(logs: DataFrame, lineCol: String = "value"): DataFrame =
    logs.select(
      regexp_extract(col(lineCol), TableRe, 1).as("table_name"),
      nullif(regexp_extract(col(lineCol), RowsRe, 2), lit("")).cast("long").as("rows"),
      nullif(regexp_extract(col(lineCol), BytesRe, 2), lit("")).cast("long").as("bytes"),
      nullif(regexp_extract(col(lineCol), StatusRe, 2), lit("")).as("status"))
      .filter(col("table_name") =!= "")

  /** Fold parsed lines into per-table job stats; finalize like the
    * reference (any FAILED line fails the table; no rows → SKIPPED). */
  def tableStats(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("table_name"))
      .agg(
        max(col("rows")).as("rows"),
        max(col("bytes")).as("bytes"),
        count(when(col("status") === "FAILED", 1)).as("n_failed"),
        count(when(col("status") === "SUCCEEDED", 1)).as("n_ok"))
      .withColumn("final_status",
        when(col("n_failed") > 0, "FAILED")
          .when(col("n_ok") > 0, "SUCCEEDED")
          .otherwise("SKIPPED"))
}
