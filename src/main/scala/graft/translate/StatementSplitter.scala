package graft.translate

/** SQL-script statement splitter with comment and BTEQ semantics
  * (SURVEY §2.3 P6).
  *
  * Reference semantics (ported exactly, order-sensitive):
  * `src/translation/dags/dml_validation_dag.py:103-190` and
  * `src/common_utils/table_filter.py:52-66`:
  *  - split the file on `;` and drop the final fragment (trailing
  *    newline after the last `;`);
  *  - a statement is "fully commented" iff it starts with `--` and
  *    every raw line (no re-trim — leading whitespace makes a line
  *    uncommented) starts with `--`;
  *  - SQL mode drops fully-commented statements;
  *  - BTEQ mode additionally handles control statements
  *    (`EXCEPTION WHEN ERROR`, `END`) and strips a leading `BEGIN`.
  *
  * The two reference call sites disagree on BTEQ control statements:
  * table_filter skips them whenever the statement *starts* with one
  * ([[BteqControl.SkipAlways]]); dml_validation only skips when the
  * statement is also fully commented — which can never happen — so it
  * effectively keeps them ([[BteqControl.SkipCommentedOnly]]). Both
  * policies are available; SkipAlways is the default.
  */
object StatementSplitter {

  sealed trait Mode
  case object Sql extends Mode
  case object Bteq extends Mode

  sealed trait BteqControl
  object BteqControl {
    case object SkipAlways extends BteqControl
    case object SkipCommentedOnly extends BteqControl
  }

  private val SkipBteq = Seq("EXCEPTION WHEN ERROR", "END")

  /** True iff some line of the statement is not a `--` comment line. */
  def hasUncommented(stmt: String): Boolean =
    if (!stmt.startsWith("--")) true
    else stmt.linesIterator.exists(l => !l.startsWith("--"))

  private def startsWithIgnoreCase(s: String, prefix: String): Boolean =
    s.regionMatches(true, 0, prefix, 0, prefix.length)

  /** Split a script into executable statements. Blank fragments are
    * dropped (the reference would submit them and record an error; an
    * empty statement carries no semantics). */
  def split(
      content: String,
      mode: Mode = Sql,
      bteqControl: BteqControl = BteqControl.SkipAlways): Seq[String] = {
    val fragments = content.split(";", -1).toSeq.dropRight(1)
    fragments.flatMap { raw =>
      val stmt = raw.trim
      if (stmt.isEmpty) None
      else mode match {
        case Sql =>
          if (hasUncommented(stmt)) Some(stmt) else None
        case Bteq =>
          val isControl = SkipBteq.exists(k => startsWithIgnoreCase(stmt, k))
          val skip = bteqControl match {
            case BteqControl.SkipAlways        => isControl
            case BteqControl.SkipCommentedOnly => isControl && !hasUncommented(stmt)
          }
          if (skip) None
          else if (startsWithIgnoreCase(stmt, "BEGIN"))
            // reference: re.split('BEGIN', stmt, flags=I)[1] — text after
            // the first BEGIN, up to the next BEGIN if any
            Some(stmt.split("(?i)BEGIN", -1).lift(1).getOrElse("").trim)
              .filter(_.nonEmpty)
          else Some(stmt)
      }
    }
  }
}
