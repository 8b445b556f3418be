package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Fixed-width (positional) file parsing — the mainframe/warehouse
  * extract format every Teradata-era migration drags along (COBOL
  * copybook layouts, `FastExport` text modes): each field lives at a
  * fixed 1-based column offset with a fixed width, padded with blanks
  * or zeros.
  *
  * Spark-first shape: `spark.read.text` gives line-parallel scans
  * (splittable, no parsing on the driver), and the field extraction is
  * a pure `substring`/`trim`/`cast` projection — whole-stage codegen,
  * no UDF, no regex. A malformed or short line yields empty extracts
  * (SQL `substring` past the end is ''), which trim to '' for strings
  * and `try_cast` to null for numerics — the permissive-load
  * convention, and the ANSI-safe one (a plain cast would abort the
  * whole scan on the first bad byte under Spark's default ANSI mode);
  * pair with an `IsNull` screen when the feed must be strict. */
object FixedWidth {

  /** One field: 1-based `start`, `width` chars; non-string types cast
    * after an optional trim (blank- and zero-padded numerics both cast
    * cleanly — `cast('0042' as bigint)` is 42). */
  final case class Field(
      name: String, start: Int, width: Int,
      dataType: DataType = StringType, trimPad: Boolean = true) {
    require(start >= 1 && width >= 1, s"bad field $name: start=$start width=$width")
  }

  /** Project `fields` out of a line column. */
  def parse(lines: DataFrame, lineCol: String, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate field names in ${fields.map(_.name)}")
    lines.select(fields.map(extract(col(lineCol), _)): _*)
  }

  /** Read a fixed-width text file/directory/glob. */
  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame =
    parse(spark.read.text(path), "value", fields)

  private def extract(line: Column, f: Field): Column = {
    val raw = substring(line, f.start, f.width)
    val v = if (f.trimPad) trim(raw) else raw
    (if (f.dataType == StringType) v else v.try_cast(f.dataType)).as(f.name)
  }
}
