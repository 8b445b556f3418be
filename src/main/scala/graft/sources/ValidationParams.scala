package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Validation-params CSV reader (SURVEY §2.1 S6; reference
  * `storage_utils.py:84-121`): a params sheet whose first two rows are
  * headers, keyed by `source-table` (or `source-query-file`), filtered
  * on (translation-type, validation-type), yielding per-table flag
  * maps for the DVT stage.
  *
  * Spark-first: read headerless, drop the two header rows by position
  * (zipWithIndex-free — a monotonically-increasing filter would be
  * nondeterministic across partitions, so the tiny sheet is read
  * single-partition and sliced), then collect to the driver Map the
  * validator stage consumes.
  */
object ValidationParams {

  final case class Entry(
      translationType: String,
      validationType: String,
      sourceTable: String,
      targetTable: String,
      flags: Map[String, String])

  /** Parse the sheet. Expected columns (after the 2 header rows):
    * translation_type, validation_type, source_table, target_table,
    * then flag columns as `key=value` pairs in remaining cells. */
  def read(spark: SparkSession, path: String): Seq[Entry] = {
    // read as raw lines, not spark.read.csv: the csv reader fixes the
    // column count from the first row, silently truncating the ragged
    // flag columns these sheets use (no quoted commas observed)
    import spark.implicits._
    val rows = spark.read.textFile(path).coalesce(1).collect().toSeq
      .filter(_.nonEmpty).drop(2)
    rows.map { line =>
      val cells = line.split(",", -1).toSeq.map(_.trim)
      Entry(
        translationType = cells.lift(0).getOrElse(""),
        validationType = cells.lift(1).getOrElse(""),
        sourceTable = cells.lift(2).getOrElse(""),
        targetTable = cells.lift(3).getOrElse(""),
        flags = cells.drop(4).filter(_.contains("="))
          .map { f => val Array(k, v) = f.split("=", 2); k.trim -> v.trim }.toMap)
    }
  }

  /** Filter + key like the reference: entries for one (translation,
    * validation) pair, keyed by source table. */
  def forRun(
      entries: Seq[Entry],
      translationType: String,
      validationType: String): Map[String, Entry] =
    entries
      .filter(e => e.translationType.equalsIgnoreCase(translationType) &&
        e.validationType.equalsIgnoreCase(validationType))
      .map(e => e.sourceTable -> e).toMap

  /** The mapping ∩ tables semi-join as data (P7/P8 shape). */
  def validComparisons(
      params: Map[String, Entry], created: Set[String]): Seq[(String, String)] =
    params.toSeq.collect {
      case (src, e) if created.contains(e.targetTable) => (src, e.targetTable)
    }.sorted
}
