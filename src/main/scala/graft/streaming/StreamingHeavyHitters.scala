package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming heavy hitters — the incremental face of the `hh1` batch
  * query (exact per-source top-K words): per-(source, word) counts
  * maintained in the state store, updated counts emitted every
  * micro-batch, so "what are the top K words per source right now" is
  * answerable continuously without re-scanning the corpus.
  *
  * Semantics contract: counts are EXACT and MONOTONE (an insert-only
  * word stream only increments), so the emitted update stream has two
  * properties the sink side leans on: the latest emission per key is
  * also the MAX emission per key (any append sink + `max(cnt)` yields
  * the current counts, redelivered batches included — idempotence by
  * monotonicity, no dedup bookkeeping), and top-K over those maxes ≡
  * the batch query over all rows ever delivered — PROVEN against the
  * real `hh1` result in StreamingHeavyHittersSpec, with checkpoint
  * stop/restart.
  *
  * Scale shape: state is one long per distinct (source, word) — the
  * state store scales with VOCABULARY, not corpus volume (Heaps' law:
  * sublinear), and each micro-batch shuffles once on the composite
  * key. Each batch's emissions are bounded by its own distinct pairs,
  * not the vocabulary — an idle source emits nothing. For bounded
  * state under adversarial vocabularies, the sketch route composes
  * from the parts already shipped: [[graft.operators.CountMinSketch]]
  * maintains mergeable approximate counts and a small exact candidate
  * set rides beside it (the classic CMS + heap construction); the
  * exact form here is the oracle such a deployment would verify
  * against.
  */
object StreamingHeavyHitters {

  final case class SourceWord(source: String, word: String)
  final case class WordCount(source: String, word: String, cnt: Long)

  /** Running exact counts per (source, word), one update per touched
    * key per micro-batch (Update output mode). */
  def counts(
      spark: SparkSession,
      words: Dataset[SourceWord]): Dataset[WordCount] = {
    import spark.implicits._
    words
      .groupByKey(w => (w.source, w.word))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: (String, String), batch: Iterator[SourceWord],
            state: GroupState[Long]) => {
          val c = state.getOption.getOrElse(0L) + batch.size
          state.update(c)
          WordCount(key._1, key._2, c)
        })
  }

  /** Current top-K per source from any APPEND sink of the update
    * stream: monotonicity makes `max(cnt)` per key the current count
    * even under redelivered batches. Output shape = the `hh1` batch
    * query (source, word, cnt, rank), rank ties broken by word. */
  def topK(updates: DataFrame, k: Int): DataFrame = {
    val current = updates.groupBy(col("source"), col("word"))
      .agg(max(col("cnt")).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("word"))
    current.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
