package graft.queries

/** Shared DuckDB oracle snippets. The tokenizer mirror of
  * [[graft.operators.TextOps.words]] must be ONE definition: three
  * query files mirror it, and a drift between copies would silently
  * desynchronize oracle families from each other. */
private[queries] object OracleText {
  /** DuckDB twin of TextOps.words over a `text` column. */
  val words = """string_split_regex(trim(lower(text)), '\s+')"""
}
