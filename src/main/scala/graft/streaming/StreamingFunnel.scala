package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the incremental face of the fn1 batch
  * cascade (`queries/EventQueries.funnelStages`): per-user funnel
  * progress maintained in the state store and updated per micro-batch,
  * so "how many users have reached step k" is answerable continuously
  * without re-scanning history.
  *
  * Semantics contract: identical to the batch cascade — step k counts
  * only at the first event of its type STRICTLY after the user's
  * step-(k−1) completion time — PROVEN equal row-for-row in
  * StreamingFunnelSpec against `funnelStages` on the union of all
  * batches.
  *
  * Arrival contract: per-user event time must be non-decreasing
  * ACROSS batches (within a batch any order is fine — the group sorts
  * its own slice). A violating event fails loudly rather than silently
  * diverging from the batch answer: a late-arriving earlier event can
  * re-open a step the incremental state already skipped (e.g. an
  * earlier signup making a previously-ignored view count), which a
  * (times, maxTs) state cannot reconstruct. That is the same
  * out-of-order discipline scd2Apply enforces on its batch sequence.
  *
  * Scale shape: state is one fixed-width record per user (|steps|
  * longs) — the state store scales with distinct users, never event
  * volume; each micro-batch shuffles once on user_id. Simultaneous
  * (equal-ts) events are order-independent by construction: an event
  * at exactly the previous step's completion time never advances the
  * funnel (strict >), so tie-processing order cannot change the state.
  */
object StreamingFunnel {

  final case class Ev(user_id: Long, event_type: String, tsMicros: Long)

  /** times(k) = first ordered completion of step k in epoch micros,
    * or -1 if not yet reached. maxTs = latest event time seen. */
  final case class FunnelState(user_id: Long, maxTs: Long, times: Array[Long])

  val DefaultSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Fold a micro-batch slice into one user's funnel state. Exposed
    * for the spec's direct-fold parity check. */
  def fold(
      userId: Long,
      prev: Option[FunnelState],
      batch: Seq[Ev],
      steps: Seq[String]): FunnelState = {
    val times = prev.map(_.times.clone()).getOrElse(Array.fill(steps.size)(-1L))
    var maxTs = prev.map(_.maxTs).getOrElse(Long.MinValue)
    for (e <- batch.sortBy(_.tsMicros)) {
      require(e.tsMicros >= maxTs,
        s"out-of-order event for user $userId: ${e.tsMicros} after $maxTs — " +
          "per-user event time must be non-decreasing across batches")
      maxTs = e.tsMicros
      val k = times.indexOf(-1L)
      if (k >= 0 && e.event_type == steps(k) &&
          (k == 0 || e.tsMicros > times(k - 1)))
        times(k) = e.tsMicros
    }
    FunnelState(userId, maxTs, times)
  }

  /** Per-user funnel progress, one updated state row per user per
    * micro-batch that touched it (Update mode). */
  def progress(
      spark: SparkSession,
      events: Dataset[Ev],
      steps: Seq[String] = DefaultSteps): Dataset[FunnelState] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[Ev], state: GroupState[FunnelState]) => {
          val next = fold(user, state.getOption, batch.toSeq, steps)
          state.update(next)
          Iterator.single(next)
        })
  }
}
