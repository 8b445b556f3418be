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
