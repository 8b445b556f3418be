package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window document chunking (LLM-pipeline op): the
  * step between raw documents and context-window assembly — long
  * documents split into `chunkSize`-token windows with `overlap` tokens
  * shared between consecutive chunks (overlap preserves cross-boundary
  * context for training; dedup/embedding stages downstream treat each
  * chunk as a row).
  *
  * Chunk i covers tokens [i·step, i·step + chunkSize) with
  * step = chunkSize − overlap; the last chunk may be shorter; documents
  * shorter than one window yield exactly one chunk. All arithmetic is
  * integral (no float round-trip), so chunk boundaries are
  * deterministic and DuckDB-mirrorable.
  *
  * Scale shape: pure per-row expressions (tokenize once, bind the token
  * array, explode the chunk-index sequence, slice per index) — no
  * shuffle, no UDF; chunk count per row is bounded by document length.
  * Parallelism is deliberately whatever the upstream scan provides
  * (pinned by PlanAuditSpec's no-exchange assertion): unlike the
  * md5-heavy dedup family, per-row chunking cost is a single tokenize
  * plus array slices, so a rebalance shuffle of the raw text would
  * usually cost more than it buys — callers with a pathological
  * few-huge-files layout can `repartition` upstream.
  */
object Chunker {

  /** Content-defined chunking (CDC) over the token stream — the
    * boundary discipline of rsync/LBFS (Muthitacharoen et al. 2001,
    * "A Low-Bandwidth Network File System") applied at token
    * granularity: a chunk boundary is cut BEFORE token p (p ≥ 2)
    * whenever hexHash60(token_p) % divisor == 0, so the expected chunk
    * length is `divisor` tokens and — the property fixed-size chunking
    * lacks — an edit only reshapes the chunks it touches: boundaries
    * derive from content, not offsets, so chunks after an insertion
    * realign and downstream exact-dedup (d1) still collapses them.
    * (Production CDC adds min/max chunk-size clamps; those make each
    * boundary depend on the previous one — an inherently sequential
    * scan per document, fine inside one row but deliberately omitted
    * here to keep the chunk function a pure content map.)
    *
    * Output matches [[chunk]]: (id, chunk_idx, chunk_text, n_tokens),
    * chunk_idx 0-based. Null text == empty text == one empty chunk,
    * the same every-input-row-survives invariant as [[chunk]].
    *
    * Scale shape: boundary positions, chunk slicing, and token counts
    * are all per-row array expressions (filter/slice/transform over the
    * bound token array) — no shuffle, no UDF, document-length-bounded
    * cost, same parallelism contract as [[chunk]]. */
  def contentDefined(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int): DataFrame = {
    require(divisor >= 2, s"need divisor >= 2, got $divisor")
    docs
      .select(col(idCol).as("id"),
        TextOps.words(coalesce(col(textCol), lit(""))).as("w"))
      .withColumn("n", size(col("w")))
      // cut points: token 1 always starts a chunk; token p >= 2 starts
      // one iff its hash divides; sequence(2, n) must be guarded —
      // Spark's sequence(2, 1) counts DOWN, it is not empty
      .withColumn("starts",
        concat(
          array(lit(1)),
          when(col("n") >= 2,
            filter(sequence(lit(2), col("n")),
              p => TextOps.hexHash60(element_at(col("w"), p)) % divisor === 0))
            .otherwise(array().cast("array<int>"))))
      // exclusive end of chunk i = start of chunk i+1, last ends at n+1;
      // built as an aligned array so every element_at below is in-bounds
      // (ANSI mode makes out-of-range element_at an error, not null)
      .withColumn("ends",
        concat(slice(col("starts"), lit(2), size(col("starts")) - 1),
          array(col("n") + 1)))
      .select(col("id"), col("w"),
        posexplode(zip_with(col("starts"), col("ends"), (s, e) => struct(s.as("s"), e.as("e"))))
          .as(Seq("chunk_idx", "se")))
      .select(
        col("id"),
        col("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("se.s"), col("se.e") - col("se.s"))).as("chunk_text"),
        (col("se.e") - col("se.s")).as("n_tokens"))
  }

  /** (id, chunk_idx, chunk_text, n_tokens), one row per window. */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    docs
      // null text == empty text: the one-chunk-per-short-document
      // invariant must hold for EVERY input row — a bare words(null)
      // would null the chunk-index sequence and silently drop the
      // document from the output
      .select(col(idCol).as("id"),
        TextOps.words(coalesce(col(textCol), lit(""))).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      // integral chunk count: 1 window for n <= chunkSize, else
      // 1 + ceil((n - chunkSize) / step) via (x + step - 1) div step
      .withColumn("n_chunks",
        lit(1L) + greatest(lit(0L),
          expr(s"(n - $chunkSize + ${step - 1}) div $step")))
      .select(col("id"), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        col("id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws(" ",
          slice(col("w"), (col("chunk_idx") * step + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_idx") * step)
          .cast("int").as("n_tokens"))
  }
}
