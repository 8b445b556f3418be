package graft.translate

/** Source-dialect column type → Spark SQL type (SURVEY §1.2).
  *
  * Covers the full type matrix exercised by the reference's type-stress
  * fixture (`src/tests/end_to_end/input/ddl/teradata/ppl_data_types.sql`:
  * DECIMAL(13,13)…DECIMAL(38,12), BIGINT/BYTEINT/SMALLINT/INTEGER, FLOAT,
  * CHAR/VARCHAR with charset, DATE FORMAT, TIMESTAMP(0/3/6),
  * TIMESTAMP(6) WITH TIME ZONE, JSON(5000), NUMBER(38,4), VARBYTE(1024)),
  * the Redshift shapes (`samples/ddl/redshift/mig_test_supplier.sql`:
  * character varying, ENCODE), the Oracle shapes
  * (`samples/ddl/oracle` fixtures: VARCHAR2, NUMBER bare), and the Hive
  * rule `datetime → TIMESTAMP`
  * (`src/translation/scripts/hive/global_typeconvert.config.yaml`).
  *
  * Choices (Spark-first, documented):
  *  - CHAR/VARCHAR map to STRING (no pad/truncate semantics wanted in an
  *    analytics store; BigQuery makes the same choice).
  *  - TIMESTAMP without zone → TIMESTAMP_NTZ; WITH TIME ZONE → TIMESTAMP
  *    (session-zoned, pinned UTC).
  *  - JSON → STRING (queried via get_json_object/from_json).
  *  - bare NUMBER → DECIMAL(38,18); NUMBER(p) → DECIMAL(p,0).
  */
object TypeMapper {

  private val DecimalRe = """(?i)(?:DECIMAL|NUMERIC|DEC)\s*\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\)""".r
  private val NumberRe = """(?i)NUMBER\s*\(\s*(\d+|\*)\s*(?:,\s*(\d+))?\s*\)""".r

  /** Map one raw source type string (already isolated from column
    * modifiers) to a Spark SQL type string. Unknown types map to STRING
    * with a translation warning left to the caller (permissive mode) —
    * strict callers should pattern-match [[tryMap]]. */
  def map(rawType: String): String =
    tryMap(rawType).getOrElse(
      throw new IllegalArgumentException(s"unmappable type: $rawType"))

  def tryMap(rawType: String): Option[String] = {
    val t = rawType.trim.replaceAll("\\s+", " ")
    val u = t.toUpperCase
    Some(u match {
      case _ if u.startsWith("BYTEINT") => "TINYINT"
      case _ if u.startsWith("SMALLINT") => "SMALLINT"
      case _ if u.startsWith("BIGINT") => "BIGINT"
      case _ if u.startsWith("INTEGER") || u == "INT" || u.startsWith("INT ") => "INT"
      case _ if u.startsWith("DOUBLE PRECISION") || u.startsWith("FLOAT") ||
        u.startsWith("REAL") || u == "DOUBLE" => "DOUBLE"
      case _ if u.startsWith("BOOLEAN") => "BOOLEAN"
      case _ if DecimalRe.findPrefixOf(u).isDefined =>
        val m = DecimalRe.findFirstMatchIn(u).get
        s"DECIMAL(${m.group(1)},${Option(m.group(2)).getOrElse("0")})"
      case _ if u.startsWith("DECIMAL") || u.startsWith("NUMERIC") || u == "DEC" =>
        "DECIMAL(5,0)" // Teradata default precision
      case _ if NumberRe.findPrefixOf(u).isDefined =>
        val m = NumberRe.findFirstMatchIn(u).get
        if (m.group(1) == "*") "DECIMAL(38,18)"
        else s"DECIMAL(${m.group(1)},${Option(m.group(2)).getOrElse("0")})"
      case _ if u.startsWith("NUMBER") => "DECIMAL(38,18)"
      case _ if u.startsWith("CHARACTER VARYING") || u.startsWith("VARCHAR2") ||
        u.startsWith("NVARCHAR2") || u.startsWith("VARCHAR") ||
        u.startsWith("LONG VARCHAR") || u.startsWith("CHAR VARYING") ||
        u.startsWith("NCHAR") || u.startsWith("CHARACTER") ||
        u.startsWith("CHAR") || u.startsWith("CLOB") || u.startsWith("TEXT") ||
        u.startsWith("STRING") => "STRING"
      case _ if u.startsWith("TIMESTAMP") && u.contains("WITH TIME ZONE") => "TIMESTAMP"
      case _ if u.startsWith("TIMESTAMP") || u.startsWith("DATETIME") => "TIMESTAMP_NTZ"
      case _ if u.startsWith("DATE") => "DATE"
      case _ if u.startsWith("TIME") => "STRING" // no TIME type in Spark
      case _ if u.startsWith("JSON") => "STRING"
      case _ if u.startsWith("VARBYTE") || u.startsWith("BYTEA") ||
        u.startsWith("BLOB") || u.startsWith("RAW") || u.startsWith("BYTE") ||
        u.startsWith("BINARY") => "BINARY"
      case _ => return None
    })
  }
}
