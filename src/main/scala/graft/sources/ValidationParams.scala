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

  /** Parse the sheet like the reference's pandas read
    * (`storage_utils.py:84-121`): row 1 is a section banner, row 2
    * names every column POSITIONALLY (source-table, target-table,
    * source-query-file, …, per-validation flag columns); data rows put
    * values under those positions. Flags = non-empty cells from column
    * 5 on, keyed by their row-2 header name. Cells may be quoted
    * (`"""emp_no,emp_name"""` — quoted lists with embedded commas), so
    * the split is quote-aware. Query-file entries (custom-query
    * validations) have no source-table; the query file is the key,
    * matching the reference's keying. */
  def read(spark: SparkSession, path: String): Seq[Entry] =
    if (path.toLowerCase.endsWith(".xlsx") || path.toLowerCase.endsWith(".xltx"))
      // xlsx sheets are what the reference actually ships
      // (storage_utils.py:92-96 flattens them to CSV via pandas; the
      // flatten + re-split round-trip is a no-op on the cell grid, so
      // parse the grid directly)
      fromGrid(path, Xlsx.rows(path).filter(_.exists(_.nonEmpty)))
    else
      fromGrid(path, spark.read.textFile(path).coalesce(1).collect().toSeq
        .filter(_.nonEmpty).map(splitCsv))

  /** The reference's FIXED positional field list
    * (`storage_utils.py:12-38`, `validation_csv_header_fields`). Flags
    * are keyed by POSITION against this list — the row-2 header text is
    * cosmetic in the reference (pandas reads by position), so a sheet
    * with a blank or renamed header cell must still resolve
    * threshold/primary-keys/grouped-columns. Row-2 text names only the
    * EXTRA columns beyond the canonical 25. */
  private val CanonicalFields = Seq(
    "translation-type", "validation-type", "source-table", "target-table",
    "source-query-file", "target-query-file", "filter-status",
    "primary-keys", "filters", "exclusion-columns", "allow-list",
    "count", "sum", "min", "max", "avg", "grouped-columns",
    "wildcard-include-string-len", "cast-to-bigint", "threshold",
    "hash", "concat", "comparison-fields", "use-random-row",
    "random-row-batch-size")

  private def fromGrid(path: String, rows: Seq[Seq[String]]): Seq[Entry] = {
    require(rows.size >= 2, s"validation params sheet needs 2 header rows: $path")
    val header = rows(1).map(_.trim)
    // positions rule (the reference's DictReader ignores row-2 text), but
    // a sheet authored against header-keyed semantics would be silently
    // misparsed — surface the misalignment instead
    header.zipWithIndex.foreach { case (h, i) =>
      CanonicalFields.lift(i).foreach { canon =>
        if (h.nonEmpty && h != canon)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"$path: row-2 header '$h' at position $i differs from the " +
              s"canonical field '$canon' — positions rule; the cell text is ignored")
      }
    }
    rows.drop(2).map { raw =>
      val cells = raw.map(_.trim)
      def at(i: Int) = cells.lift(i).getOrElse("")
      val flags = (4 until math.max(CanonicalFields.size, cells.size))
        .flatMap { i =>
          val v = at(i)
          val k = CanonicalFields.lift(i)
            .orElse(header.lift(i).filter(_.nonEmpty))
            .getOrElse(s"col_$i")
          if (v.nonEmpty) Some(k -> stripQuotes(v)) else None
        }.toMap
      Entry(
        translationType = at(0),
        validationType = at(1),
        sourceTable = if (at(2).nonEmpty) at(2) else stripQuotes(at(4)),
        targetTable = if (at(3).nonEmpty) at(3) else stripQuotes(at(5)),
        flags = flags)
    }
  }

  /** Quote-aware single-line CSV split (doubled quotes inside quoted
    * cells, commas inside quotes preserved). */
  private def splitCsv(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case ch  => cur += ch
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  private def stripQuotes(s: String): String =
    s.stripPrefix("\"").stripSuffix("\"")

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
