package graft.queries

/** Shared DuckDB oracle snippets. The tokenizer mirror of
  * [[graft.operators.TextOps.words]] must be ONE definition: three
  * query files mirror it, and a drift between copies would silently
  * desynchronize oracle families from each other. */
private[queries] object OracleText {
  /** DuckDB twin of TextOps.words over a `text` column. */
  val words = """string_split_regex(trim(lower(text)), '\s+')"""

  /** Null-tolerant variant (null text == empty text == the single
    * empty token) — pair it with `coalesce(col("text"), lit(""))` on
    * the Spark side: a bare size(words(NULL)) is -1 under Spark while
    * len(NULL) is NULL in DuckDB, so any count-of-tokens oracle must
    * use this form or silently diverge on a null-text row. */
  val wordsCoalesced =
    """string_split_regex(trim(lower(coalesce(text, ''))), '\s+')"""
}
