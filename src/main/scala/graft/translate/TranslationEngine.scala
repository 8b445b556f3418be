package graft.translate

/** Batch script translation with a first-class error report
  * (SURVEY §3.1 step 4; replaces the BigQuery Migration API surface).
  *
  * Mirrors the reference's report semantics
  * (`batch_sql_translation.py:130-226`): every statement either
  * translates or yields an error record; a file succeeds iff none of
  * its statements errored (the all∖failed set difference P4); error
  * records are data, classified downstream by the rule filter
  * ([[FilterRules]]) into filtered (known-benign) and unfiltered
  * (actionable) errors.
  */
object TranslationEngine {

  final case class TranslatedFile(fileName: String, statements: Seq[String])

  final case class ErrorRecord(
      fileName: String,
      statementIndex: Int,
      category: String,
      message: String)

  final case class Result(
      translated: Seq[TranslatedFile],
      errors: Seq[ErrorRecord]) {
    def successFiles: Seq[String] = translated.map(_.fileName)
    def failedFiles: Seq[String] = errors.map(_.fileName).distinct
  }

  /** Translate DDL scripts: split → per-statement CREATE TABLE
    * translation → render Spark DDL. Files containing any untranslatable
    * statement are excluded from `translated` (reference: failed files
    * are not loaded; `batch_sql_translation.py:204-226` aborts only if
    * ALL files failed — left to the caller via [[Result]]). */
  private val ViewRe = """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\b.*""".r

  def translateDdl(
      files: Seq[(String, String)],
      mode: StatementSplitter.Mode = StatementSplitter.Sql,
      nameMapping: NameMapping = NameMapping.empty): Result = {
    val perFile = files.map { case (name, content) =>
      // a file with no terminating ';' (catalog-extracted DDL, several
      // reference sample fixtures) is one statement, not zero — zero
      // would "translate" the file to nothing and report Success
      val stmts = StatementSplitter.split(content, mode) match {
        case Nil if StatementSplitter.hasUncommented(content) => Seq(content.trim)
        case s => s
      }
      val results = stmts.zipWithIndex.map { case (stmt, i) =>
        // views pass through: the observed corpus (`input/ddl/oracle`
        // emp_details_view) is ANSI SELECT over comma joins, which
        // Spark's parser accepts; table DDL goes through the transpiler
        if (ViewRe.matches(stmt)) Right(stmt)
        else DdlTranslator.translate(stmt, nameMapping) match {
          case Right(t) => Right(t.render())
          case Left(e)  => Left(ErrorRecord(name, i, "parse_error", e.message))
        }
      }
      val errs = results.collect { case Left(e) => e }
      if (errs.isEmpty) (Some(TranslatedFile(name, results.collect { case Right(s) => s })), Nil)
      else (None, errs)
    }
    Result(perFile.flatMap(_._1), perFile.flatMap(_._2))
  }

  /** Translate query/DML scripts. The observed SQL corpus
    * (`samples/sql` and `input/sql`) is ANSI-compatible modulo a
    * few dialect spellings handled here; anything beyond passes through
    * for Spark's parser to accept or reject at dry-run time. */
  def translateSql(sql: String): String = {
    var s = sql.trim
    // Teradata SEL abbreviation
    s = s.replaceAll("""(?i)^SEL\b""", "SELECT")
    // Teradata locking modifier — no-op in Spark
    s = s.replaceAll("""(?i)^LOCKING\s+ROW\s+FOR\s+ACCESS\s+""", "")
    // TOP n → LIMIT n (only the leading SELECT TOP form)
    val top = """(?is)^SELECT\s+TOP\s+(\d+)\s+(.*)""".r
    s = s match {
      case top(n, rest) => s"SELECT $rest LIMIT $n"
      case other        => other
    }
    s
  }

  /** Dry-run a translated statement against Spark's parser AND analyzer
    * — the in-engine equivalent of the reference's BQ dry-run validation
    * (`dml_validation_dag.py:192-214`), which is semantic: its own
    * fixture `samples/dml/teradata/DML_Use_Case_2.sql` ("Error due to
    * invalid_col not exist") parses fine and only fails resolution.
    * Analysis resolves tables/columns against the session catalog and
    * checks insert arity/types, without executing anything; DML on v1
    * tables analyzes cleanly (the v2-writes-only restriction surfaces at
    * execution, not analysis). Returns None on success. */
  def dryRun(spark: org.apache.spark.sql.SparkSession, stmt: String): Option[String] =
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(stmt)
      spark.sessionState.executePlan(plan).assertAnalyzed()
      None
    } catch { case e: Exception => Some(e.getMessage) }
}
