package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the incremental face of the
  * `at1` batch window (`queries/GovernanceQueries`, the IGNORE-NULLS
  * preceding-touch frame): per user, each purchase credits the most
  * recent STRICTLY-PRECEDING non-purchase event (none yet → the
  * `direct` channel), maintained in the state store and emitted per
  * micro-batch, so channel conversion counts are answerable
  * continuously without re-scanning history.
  *
  * Semantics contract: identical to the batch window ordered by
  * (ts, event_id) — PROVEN equal on the real events table in
  * StreamingAttributionSpec (summed stream credits ≡ `at1` channel
  * counts across micro-batches, with checkpoint stop/restart).
  *
  * Arrival contract: per-user (ts, event_id) must be strictly
  * increasing ACROSS batches (within a batch any order is fine — the
  * group sorts its slice; event ids are unique, so equality means a
  * duplicate delivery). A violating event fails loudly rather than
  * silently mis-crediting: a late-arriving earlier touch can change
  * which channel an already-emitted purchase should have credited,
  * which a (touch, maxTs) state cannot reconstruct — the
  * StreamingFunnel out-of-order discipline exactly.
  *
  * Scale shape: state is one fixed-width record per user (the last
  * non-purchase touch + the (ts, id) high-water mark) — the state
  * store scales with distinct users, never event volume; each
  * micro-batch shuffles once on user_id, and credits leave the
  * operator already attributed (the downstream channel count is a
  * channel-sized aggregate).
  */
object StreamingAttribution {

  final case class AttEv(
    user_id: Long, event_id: Long, event_type: String, tsMicros: Long)

  /** touch == null → no preceding non-purchase event yet. */
  final case class AttState(
    user_id: Long, maxTs: Long, maxId: Long, touch: String)

  /** A purchase credited to its channel ('direct' when untouched). */
  final case class Credit(user_id: Long, event_id: Long, channel: String)

  /** Fold a micro-batch slice into one user's state, returning the
    * credits its purchases earn. Exposed for the spec's direct-fold
    * parity check. */
  def fold(
      userId: Long,
      prev: Option[AttState],
      batch: Seq[AttEv]): (AttState, Seq[Credit]) = {
    var touch = prev.map(_.touch).orNull
    var maxTs = prev.map(_.maxTs).getOrElse(Long.MinValue)
    var maxId = prev.map(_.maxId).getOrElse(Long.MinValue)
    val credits = Seq.newBuilder[Credit]
    for (e <- batch.sortBy(e => (e.tsMicros, e.event_id))) {
      require(e.tsMicros > maxTs || (e.tsMicros == maxTs && e.event_id > maxId),
        s"out-of-order event for user $userId: (${e.tsMicros}, ${e.event_id}) " +
          s"after ($maxTs, $maxId) — per-user (ts, event_id) must be " +
          "strictly increasing across batches")
      maxTs = e.tsMicros; maxId = e.event_id
      if (e.event_type == "purchase")
        credits += Credit(userId, e.event_id,
          if (touch == null) "direct" else touch)
      else touch = e.event_type
    }
    (AttState(userId, maxTs, maxId, touch), credits.result())
  }

  /** Per-purchase credits, emitted in the micro-batch that delivered
    * the purchase. Credits are append-only facts (a purchase is
    * attributed exactly once, in its delivery batch), so the operator
    * runs in Append mode and composes with append sinks — files
    * included. */
  def credits(
      spark: SparkSession,
      events: Dataset[AttEv]): Dataset[Credit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[AttEv], state: GroupState[AttState]) => {
          val (next, out) = fold(user, state.getOption, batch.toSeq)
          state.update(next)
          out.iterator
        })
  }
}
