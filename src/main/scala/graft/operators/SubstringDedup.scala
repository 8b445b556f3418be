package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring span detection — the token-level twin of
  * document-level exact dedup (the "dedup long repeated substrings"
  * pass of modern training-data pipelines, after Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"):
  * find every maximal token span that is covered by some `L`-token
  * window whose content occurs MORE THAN ONCE in the corpus (in
  * another document, or again in the same one — boilerplate headers,
  * license blocks, templated paragraphs), so callers can cut those
  * spans before training.
  *
  * A suffix array is the classic single-machine structure for this;
  * it does not distribute. The equivalent distributed formulation used
  * here: every length-`L` window is a corpus-wide group key, a window
  * is "duplicated" iff its content hash occurs ≥ 2 times globally, and
  * a document's duplicated spans are the union of its duplicated
  * windows' [pos, pos+L) intervals, merged when they overlap or touch.
  * Any repeated substring of length ≥ L is fully covered by repeated
  * L-windows, so the merged intervals are exactly the maximal repeated
  * regions detectable at resolution L.
  *
  * Scale shape (100 TB story): windows are hashed with the portable
  * 60-bit [[TextOps.hexHash60]] and counted by hash — one shuffle of
  * (hash) keys with map-side partial counts, never window text; the
  * duplicated-hash set (bounded by actual duplication, typically ≪
  * corpus) joins back via shuffle-hash join; interval merging is one
  * per-document window pass (shuffle on doc id, O(dup windows) state).
  * No all-pairs stage anywhere, no driver-side collection.
  */
object SubstringDedup {

  /** One row per L-token window: (id, pos, h) with pos 0-based and h
    * the portable 60-bit content hash. Documents shorter than L tokens
    * contribute nothing (no window exists at resolution L). The raw
    * (id, text) rows are rebalanced before the tokenize/hash projection
    * for the same reason as [[TextOps.shingleTable]]: corpora often
    * arrive as a handful of large files and the per-row md5 work would
    * otherwise run on that many cores. */
  def windowTable(docs: DataFrame, idCol: String, textCol: String, windowLen: Int): DataFrame = {
    require(windowLen >= 2, s"need windowLen >= 2, got $windowLen")
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(p)
      .select(col("id"), posexplode(TextOps.wordNGrams(col("t"), windowLen)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), TextOps.hexHash60(col("gram")).as("h"))
  }

  /** Maximal duplicated spans: (id, span_start, span_end, n_windows)
    * with token-index bounds [span_start, span_end) and n_windows the
    * count of duplicated L-windows merged into the span. Two windows
    * merge when they overlap or touch (next.pos ≤ prev.pos + L). */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String, windowLen: Int): DataFrame = {
    val wins = windowTable(docs, idCol, textCol, windowLen)
    // duplicated hashes: global count ≥ 2 — partial-aggregated map-side,
    // so the shuffle carries one (h, count) pair per distinct hash per
    // partition, not one row per window
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("h"))
    // the dup set is small relative to wins but unbounded in the worst
    // case (fully templated corpus) — shuffle-hash, never broadcast-guess
    val dupWins = wins.join(dup.hint("shuffle_hash"), Seq("h")).select(col("id"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    dupWins
      // island detection: a window starts a new span iff it neither
      // overlaps nor touches the previous window's [pos, pos+L) span;
      // the sentinel makes the first row always open a span
      .withColumn("new_span",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(byDoc), lit(-windowLen - 1))
          + windowLen, 1).otherwise(0))
      .withColumn("span", sum(col("new_span")).over(byDoc))
      .groupBy(col("id"), col("span"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + windowLen).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_windows"))
  }
}
