package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracts `dataset.table` identifiers from CREATE TABLE/VIEW statements
  * and intersects them with mapping lists.
  *
  * Reference semantics: `src/translation/dags/translation_utils/table_filter.py:26-145`
  * (regex at :31) — per-file created-table mapping, success/fail status,
  * and the mapping∩created semi-join (:121-172). Here the extraction is a
  * column expression (`regexp_extract_all`) so it distributes over a
  * DataFrame of statements instead of a driver loop.
  */
object TableFilter {

  /** CREATE [OR REPLACE] TABLE|VIEW [IF NOT EXISTS] [`]db.table[`]
    * — group 4 is the `db.table` identifier. Kept compatible with both
    * Java and RE2-style engines (no backreferences/lookahead); longest
    * alternative first so leftmost-first engines agree. */
  val createTableRegex: String =
    """(CREATE OR REPLACE|CREATE)\s+(TABLE|VIEW)\s+(IF NOT EXISTS\s+)?`?([\w$]+\.[\w$]+)`?"""

  /** All `db.table` ids created in each row's `stmt` column. */
  def extractCreatedTables(df: DataFrame, stmtCol: String = "stmt"): DataFrame =
    df.withColumn("created_tables",
      regexp_extract_all(col(stmtCol), lit(createTableRegex), lit(4)))

  /** One row per (file, created table) from a DataFrame of
    * (file_name, content) script files. */
  def fileTableMapping(scripts: DataFrame): DataFrame =
    scripts
      .withColumn("table_name",
        explode(regexp_extract_all(col("content"), lit(createTableRegex), lit(4))))
      .select(col("file_name"), col("table_name"))

  /** mapping ∩ created tables (left_semi; reference table_filter.py:139-142). */
  def intersectWithCreated(mapping: DataFrame, created: DataFrame,
      key: String = "table_name"): DataFrame =
    mapping.join(created, Seq(key), "left_semi")

  /** Tables that exist in the session catalog (fail-path re-check,
    * reference table_filter.py:96-119). */
  def existingTables(spark: SparkSession, tables: Seq[String]): Seq[String] =
    tables.filter(spark.catalog.tableExists)
}
