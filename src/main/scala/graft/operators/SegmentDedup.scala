package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide segment-level dedup with document reassembly — the C4 /
  * RefinedWeb "remove repeated lines/spans across the corpus, keep the
  * first occurrence" pass: segment every document with content-defined
  * chunking ([[Chunker.contentDefined]], so an edit cannot shift every
  * downstream segment boundary the way fixed windows would), treat
  * each distinct segment CONTENT as a global key, keep exactly its
  * first occurrence in corpus order (min (doc_id, chunk_idx)), and
  * stitch every document back together from its surviving segments.
  * Boilerplate (license headers, navigation chrome, templated
  * paragraphs) survives once, in the first document that carries it,
  * and disappears everywhere else — documents themselves are never
  * dropped, they just shrink ([[ExactDedup]] / [[SubstringDedup]] are
  * the whole-document and maximal-span siblings).
  *
  * Scale shape: segmentation is per-row ([[Chunker]]'s no-shuffle
  * contract). The keep/drop decision is deliberately NOT a window over
  * the content hash — mega-duplicated boilerplate would put millions
  * of rows (with their text) into one window partition. Instead the
  * first occurrence per hash is a `min(struct(id, idx))` aggregate:
  * map-side combinable, so a hash seen 10⁶ times reduces inside each
  * task and the content-keyed exchange carries one (hash, id, idx)
  * triple per task — text never shuffles by content, and skew dies in
  * the partial aggregate. The firsts table (≤ one row per DISTINCT
  * segment) joins back position-keyed (shuffle-hash, pinned in
  * PlanAuditSpec), and reassembly is one per-document aggregate.
  */
object SegmentDedup {

  /** Keep/drop decision over an arbitrary segment table (id,
    * chunk_idx, chunk_text): adds (h, kept) where kept iff this
    * occurrence is the corpus-wide first (by (id, chunk_idx)) of its
    * content hash. Works over any segmentation — CDC
    * ([[segmentTable]]), fixed windows ([[Chunker.chunk]]), or
    * caller-supplied lines/sentences. */
  def keepFirst(segs: DataFrame): DataFrame = {
    val keyed = segs.select(col("id"), col("chunk_idx"), col("chunk_text"),
      TextOps.hexHash60(col("chunk_text")).as("h"))
    val firsts = keyed
      .groupBy(col("h"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("f"))
      .select(col("f.id").as("first_id"), col("f.chunk_idx").as("first_idx"))
    keyed.join(firsts.hint("shuffle_hash"),
        keyed("id") === firsts("first_id") &&
          keyed("chunk_idx") === firsts("first_idx"),
        "left")
      .withColumn("kept", col("first_id").isNotNull)
      .select(col("id"), col("chunk_idx"), col("chunk_text"), col("h"), col("kept"))
  }

  /** CDC-segmented keep/drop table for a document corpus. */
  def segmentTable(docs: DataFrame, idCol: String, textCol: String, divisor: Int): DataFrame =
    keepFirst(Chunker.contentDefined(docs, idCol, textCol, divisor))

  /** Per-document reassembly of a [[keepFirst]] table: (id,
    * n_segments, n_kept, new_text) — one row per input document
    * (shrunk-to-empty documents keep their row with new_text = ''),
    * new_text the space-joined surviving segments in original order. */
  def reassemble(kept: DataFrame): DataFrame =
    kept
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("chunk_idx"), col("chunk_text"))))),
            s => s.getField("chunk_text"))).as("new_text"))

  /** End-to-end corpus pass: CDC segmentation → global first-occurrence
    * keep rule → reassembly. */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String, divisor: Int): DataFrame =
    reassemble(segmentTable(docs, idCol, textCol, divisor))
}
