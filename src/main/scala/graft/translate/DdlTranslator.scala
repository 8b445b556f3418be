package graft.translate

/** Source-dialect CREATE TABLE → Spark SQL DDL (SURVEY §7.1 module 3).
  *
  * The reference outsources dialect translation to the BigQuery
  * Migration API (`batch_sql_translation.py:104-127`); this is our
  * in-engine replacement, a rule-based transpiler bounded to the
  * observed corpus: Teradata DDL (`input/ddl/teradata` fixtures — SET
  * TABLE, FALLBACK/JOURNAL/CHECKSUM/MERGEBLOCKRATIO/MAP options,
  * CHARACTER SET/CASESPECIFIC/FORMAT column modifiers, PRIMARY INDEX),
  * Redshift (`samples/ddl/redshift` — ENCODE, DISTSTYLE, SORTKEY) and
  * Oracle (`samples/ddl/oracle` — VARCHAR2/NUMBER) shapes.
  *
  * Physical-layout hints survive translation as metadata: PRIMARY INDEX
  * / DISTKEY → [[TableDef.distributionColumns]] (Spark: bucketing or
  * repartition key), SORTKEY → [[TableDef.sortColumns]] (Spark:
  * sortWithinPartitions / clustered write).
  */
object DdlTranslator {

  final case class ColumnDef(name: String, sparkType: String, notNull: Boolean)

  final case class TableDef(
      database: Option[String],
      table: String,
      columns: Seq[ColumnDef],
      distributionColumns: Seq[String] = Nil,
      sortColumns: Seq[String] = Nil,
      partitionColumns: Seq[String] = Nil) {

    def qualifiedName: String = database.map(d => s"$d.$table").getOrElse(table)

    /** Render as Spark SQL DDL. Teradata RANGE_N/CASE_N partitioning
      * maps to Spark value partitioning on the partition expression's
      * column — the closest catalog-level equivalent; the bucketing
      * semantics of EACH-ranges belong to the write path (TableLoader's
      * range-clustered writes). */
    def render(ifNotExists: Boolean = true, format: String = "parquet"): String = {
      val ine = if (ifNotExists) "IF NOT EXISTS " else ""
      val cols = columns
        .map(c => s"  ${c.name} ${c.sparkType}${if (c.notNull) " NOT NULL" else ""}")
        .mkString(",\n")
      val part = partitionColumns.filter(pc => columns.exists(_.name.equalsIgnoreCase(pc)))
      val partClause =
        if (part.isEmpty) "" else s"\nPARTITIONED BY (${part.mkString(", ")})"
      s"CREATE TABLE $ine$qualifiedName (\n$cols\n) USING $format$partClause"
    }
  }

  final case class TranslationError(statement: String, message: String)

  private val HeaderRe =
    """(?is)^\s*CREATE\s+(?:(?:SET|MULTISET)\s+)?(?:GLOBAL\s+TEMPORARY\s+)?TABLE\s+("?[\w$]+"?(?:\."?[\w$]+"?)?)""".r

  private val PrimaryIndexRe =
    """(?is)(?:UNIQUE\s+)?PRIMARY\s+INDEX\s*(?:\w+\s*)?\(([^)]*)\)""".r
  /** Teradata partition expressions: the first identifier inside
    * RANGE_N(col BETWEEN ... EACH ...) / CASE_N(col < x, ...) is the
    * partitioning column (EXTRACT-style wrappers like
    * RANGE_N(EXTRACT(YEAR FROM col) ...) resolve to col). */
  private val PartitionNRe =
    """(?is)PARTITION\s+BY\s+(?:RANGE_N|CASE_N)\s*\(\s*(?:EXTRACT\s*\(\s*\w+\s+FROM\s+)?"?([\w$]+)"?""".r
  private val SortKeyRe = """(?is)(?:COMPOUND\s+|INTERLEAVED\s+)?SORTKEY\s*\(([^)]*)\)""".r
  private val DistKeyRe = """(?is)DISTKEY\s*\(([^)]*)\)""".r

  /** Column modifiers stripped before type mapping (order matters: the
    * charset/casespecific clauses contain keywords that would otherwise
    * confuse NOT NULL detection). */
  private val ModifierRes = Seq(
    """(?i)CHARACTER\s+SET\s+\w+""",
    """(?i)NOT\s+CASESPECIFIC""",
    """(?i)CASESPECIFIC""",
    """(?i)FORMAT\s+'[^']*'""",
    """(?i)ENCODE\s+\w+""",
    """(?i)DEFAULT\s+NULL""",
    """(?i)DEFAULT\s+[^,\s]+""",
    """(?i)WITH\s+DEFAULT""",
    """(?i)COMPRESS(\s+\([^)]*\)|\s+'[^']*')?""")

  def parse(ddl: String): Either[TranslationError, TableDef] = {
    val header = HeaderRe.findFirstMatchIn(ddl) match {
      case Some(m) => m
      case None => return Left(TranslationError(ddl, "not a CREATE TABLE statement"))
    }
    val name = header.group(1).replace("\"", "")
    val (db, tbl) = name.split('.') match {
      case Array(d, t) => (Some(d), t)
      case Array(t)    => (None, t)
      case _           => return Left(TranslationError(ddl, s"bad table name: $name"))
    }

    val open = ddl.indexOf('(', header.end)
    if (open < 0) return Left(TranslationError(ddl, "no column list"))
    val close = matchParen(ddl, open)
    if (close < 0) return Left(TranslationError(ddl, "unbalanced column list"))
    val body = ddl.substring(open + 1, close)
    val tail = ddl.substring(close + 1)

    val colsE = splitTopLevel(body).filterNot(isConstraint).map(parseColumn)
    colsE.collectFirst { case Left(e) => e } match {
      case Some(err) => Left(err)
      case None =>
        val cols = colsE.collect { case Right(c) => c }
        if (cols.isEmpty) Left(TranslationError(ddl, "no columns"))
        else Right(TableDef(db, tbl, cols,
          distributionColumns = extractCols(PrimaryIndexRe, tail) ++ extractCols(DistKeyRe, tail),
          sortColumns = extractCols(SortKeyRe, tail),
          partitionColumns =
            PartitionNRe.findFirstMatchIn(tail).map(_.group(1)).toSeq))
    }
  }

  /** Parse + render with optional name mapping. */
  def translate(
      ddl: String,
      nameMapping: NameMapping = NameMapping.empty): Either[TranslationError, TableDef] =
    parse(ddl).map(nameMapping.apply)

  private def extractCols(re: scala.util.matching.Regex, s: String): Seq[String] =
    re.findFirstMatchIn(s)
      .map(_.group(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def isConstraint(colDef: String): Boolean = {
    val u = colDef.trim.toUpperCase
    Seq("PRIMARY KEY", "FOREIGN KEY", "UNIQUE ", "CONSTRAINT ", "CHECK ")
      .exists(u.startsWith)
  }

  private def parseColumn(colDef: String): Either[TranslationError, ColumnDef] = {
    val trimmed = colDef.trim.replaceAll("\\s+", " ")
    val sp = trimmed.indexOf(' ')
    if (sp < 0) return Left(TranslationError(colDef, s"no type for column: $trimmed"))
    val name = trimmed.substring(0, sp).replace("\"", "")
    var rest = trimmed.substring(sp + 1)
    // NOT NULL must be detected before modifier stripping could mangle it
    val notNull = """(?i)NOT\s+NULL""".r.findFirstIn(rest).isDefined
    rest = rest.replaceAll("""(?i)NOT\s+NULL""", " ")
    ModifierRes.foreach(re => rest = rest.replaceAll(re, " "))
    val rawType = rest.trim
    TypeMapper.tryMap(rawType) match {
      case Some(t) => Right(ColumnDef(name, t, notNull))
      case None => Left(TranslationError(colDef, s"unmappable type '$rawType' for column $name"))
    }
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      if (inQuote) { cur += c; if (c == '\'') inQuote = false }
      else c match {
        case '\'' => cur += c; inQuote = true
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString(); cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
