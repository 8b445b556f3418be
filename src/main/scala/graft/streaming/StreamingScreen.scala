package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.MinHashLSH

/** Streaming face of incremental dedup screening: a stream of new
  * documents is screened per micro-batch against the standing
  * [[MinHashLSH.DedupIndex]], emitting (batch_id, corpus_id, jaccard)
  * matches downstream (SURVEY §2.9 + the d8 ingestion story).
  *
  * Spark-first shape: the screen is a batch transform (joins against
  * the index tables), so it runs inside `foreachBatch` — the standard
  * pattern for stream-static joins that need multi-stage batch plans
  * (candidate join → verify → expansion). Each micro-batch costs
  * batch-sized work only (the index is prebuilt and typically cached);
  * exactly-once delivery to the sink follows from foreachBatch's
  * (batchId, DataFrame) contract when the `sink` is idempotent on
  * batchId, same as the incremental loader's audit discipline.
  *
  * The per-batch screen output is identical to calling
  * [[MinHashLSH.screenAgainst]] on the same rows as a static batch —
  * pinned by StreamingScreenSpec against the batch API.
  */
object StreamingScreen {

  /** Wire a micro-batched screen onto `docs` (a STREAMING DataFrame
    * with `idCol`/`textCol`). `sink` receives (matches, batchId) per
    * micro-batch; matches carry (batch_id, corpus_id, jaccard). The
    * signature family (k/bands/shingleN/hashPair) comes from the index
    * itself, so a stream can never silently screen against band keys
    * cut from a different family. Call `.start()` (optionally after
    * `.trigger(...)`) on the result. The screen caches nothing
    * per-batch — a long-running stream holds index-sized cache only. */
  def screenStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      index: MinHashLSH.DedupIndex,
      threshold: Double,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(docs.isStreaming, "screenStream expects a streaming DataFrame " +
      "(use MinHashLSH.screenAgainst for static batches)")
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(MinHashLSH.screenAgainst(
          batch.toDF(), idCol, textCol, index, threshold), batchId)
      }
  }

  /** Convenience: available-now trigger (drain the current backlog,
    * then stop) — the shape an ingestion cron uses. */
  def drainOnce(w: DataStreamWriter[Row]): DataStreamWriter[Row] =
    w.trigger(Trigger.AvailableNow())
}
