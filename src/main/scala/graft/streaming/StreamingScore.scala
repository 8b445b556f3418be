package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.LanguageModel

/** Streaming face of LM quality scoring: a stream of candidate
  * documents is scored per micro-batch against a frozen
  * [[LanguageModel.BigramModel]], emitting (id, n_bigrams, sum_p,
  * mean_p) downstream — the ingestion-gate shape (score, then route
  * or drop) of a streaming curation pipeline (SURVEY §2.9).
  *
  * Spark-first shape: scoring is a batch transform (two model joins +
  * a grouped fold), so it runs inside `foreachBatch` — the same
  * stream-static pattern as [[StreamingScreen]]. The model is trained
  * once (cached, corpus-sized) and every micro-batch costs batch-sized
  * work; the frozen model also makes scores REPRODUCIBLE across the
  * stream's lifetime — a model recomputed per batch would drift as the
  * corpus grows, so the same document could score differently at
  * different arrival times.
  *
  * Per-batch output is identical to [[LanguageModel.scoreWith]] on the
  * same rows as a static batch — pinned by StreamingScoreSpec.
  */
object StreamingScore {

  /** Wire micro-batched scoring onto `docs` (a STREAMING DataFrame
    * with `idCol`/`textCol`). `sink` receives (scores, batchId) per
    * micro-batch. Call `.start()` (optionally after `.trigger(...)`)
    * on the result. The model's cache lifetime belongs to the caller
    * (`model.release()` after the stream stops). */
  def scoreStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LanguageModel.BigramModel,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(docs.isStreaming, "scoreStream expects a streaming DataFrame " +
      "(use LanguageModel.scoreWith for static batches)")
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(LanguageModel.scoreWith(model, batch.toDF(), idCol, textCol), batchId)
      }
  }

  /** Convenience: available-now trigger (drain the current backlog,
    * then stop) — the shape an ingestion cron uses. */
  def drainOnce(w: DataStreamWriter[Row]): DataStreamWriter[Row] =
    w.trigger(Trigger.AvailableNow())
}
