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
  * state under adversarial vocabularies, [[sketchCounts]] below ships
  * the classic CMS + candidate-list construction (constant state per
  * source); the exact form here is the oracle it verifies against —
  * the spec pins their top-K equal on the real corpus.
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

  /** Per-source state of the BOUNDED variant: a Count-Min matrix plus
    * the current candidate list (parallel word/estimate arrays) and a
    * monotone batch sequence number. */
  final case class SketchState(cells: Array[Long], candWords: Array[String],
      candEsts: Array[Long], seq: Long)
  final case class SketchEmit(source: String, word: String, est: Long, seq: Long)

  /** The bounded-state variant the exact form's scaladoc names: per
    * source, a Count-Min sketch (R × `width` longs) plus a
    * ≤ `capacity` candidate list — TOTAL state is a constant
    * ~R·width·8 bytes per source no matter how adversarial the
    * vocabulary, where [[counts]]'s exact state grows with every
    * distinct (source, word). The classic CMS + heap construction,
    * batch-granular: each micro-batch increments the sketch cells for
    * its occurrences (the EXACT addressing batch-built matrices use —
    * [[graft.operators.CountMinSketch.cellsJvm]], so a state snapshot
    * is mergeable with any batch sketch), then re-estimates the
    * touched words plus the stored candidates and keeps the top
    * `capacity` by (estimate DESC, word ASC).
    *
    * Guarantees, stated honestly: estimates are ONE-SIDED (never under
    * the true count — CMS min over rows); candidate recall is the
    * heap construction's — a word can only enter while it is in some
    * batch's touched set, so a heavy hitter is missed only if every
    * batch where it appeared had `capacity` words with higher
    * estimates (for capacity comfortably over K and the usual skewed
    * word distributions it holds; the spec pins exact equality with
    * `hh1` on the real corpus). The exact [[counts]] face IS the
    * oracle such a deployment verifies against.
    *
    * Emissions carry the per-source batch `seq`; the latest seq per
    * source is the current candidate list ([[sketchTopK]]). */
  def sketchCounts(
      spark: SparkSession,
      words: Dataset[SourceWord],
      width: Int,
      capacity: Int): Dataset[SketchEmit] = {
    import spark.implicits._
    import graft.operators.CountMinSketch
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
    words
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (source: String, batch: Iterator[SourceWord],
            state: GroupState[SketchState]) => {
          val st = state.getOption.getOrElse(SketchState(
            new Array[Long](CountMinSketch.Rows * width),
            Array.empty, Array.empty, 0L))
          val cells = st.cells.clone()
          val touched = scala.collection.mutable.LinkedHashSet[String]()
          batch.foreach { w =>
            touched += w.word
            CountMinSketch.cellsJvm(w.word, width).foreach(cells(_) += 1)
          }
          val cand = (st.candWords.toSeq ++ touched).distinct
            .map(w => w -> CountMinSketch.estimateJvm(cells, w, width))
            .sortBy { case (w, e) => (-e, w) }
            .take(capacity)
          val seq = st.seq + 1
          state.update(SketchState(cells,
            cand.map(_._1).toArray, cand.map(_._2).toArray, seq))
          cand.iterator.map { case (w, e) => SketchEmit(source, w, e, seq) }
        })
  }

  /** Current top-K per source from any APPEND sink of [[sketchCounts]]
    * emissions: the row set at the latest seq per source is the
    * current candidate list; rank by (est DESC, word ASC) — the `hh1`
    * output shape with `est` in place of the exact count.
    *
    * Redelivery-safe: foreachBatch + append sinks are at-least-once,
    * so a micro-batch replayed after a crash lands the same candidate
    * list in the sink TWICE at the same (source, seq) — without dedup,
    * row_number would count each duplicated word twice and displace
    * the true k-th entry. Replayed emissions are bit-identical (the
    * state store rolls back to the pre-batch version, so the re-run
    * recomputes the same cells, candidates, and seq), which makes
    * `dropDuplicates` exact, not a heuristic — the same idempotence
    * the exact face gets from max(cnt) monotonicity. */
  def sketchTopK(emissions: DataFrame, k: Int): DataFrame = {
    val latest = emissions.groupBy(col("source")).agg(max(col("seq")).as("seq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("est").desc, col("word"))
    emissions.dropDuplicates("source", "seq", "word")
      .join(broadcast(latest), Seq("source", "seq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("word"), col("est"), col("rank"))
  }
}
