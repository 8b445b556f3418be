package graft.core

/** JSON string escaping shared by the artifact writers (`BENCH.json`,
  * `oracle_sql.json`): backslash, quote, and ALL control characters.
  * One table, used everywhere — a multi-line Spark exception message or
  * a tab in builder-authored SQL must never corrupt a one-line
  * artifact, and an escape fix must never have to land twice. */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
