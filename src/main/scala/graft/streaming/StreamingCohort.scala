package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — the incremental face of the co1 batch
  * matrix: per-user state is ONE long (a bitmask of activity-week
  * offsets against the user's cohort week) plus the cohort week
  * itself, so the state store holds two longs per user regardless of
  * event volume, and the full retention matrix is the running count of
  * the emitted increments.
  *
  * Emission contract: each (user, week-offset) pair is emitted EXACTLY
  * ONCE across the whole stream — the first time that user is seen
  * active in that week. Summing increments per (cohort_week,
  * week_offset) therefore equals the batch matrix's COUNT(DISTINCT
  * user_id) cell, proven in StreamingCohortSpec.
  *
  * Arrival contract (weaker than StreamingFunnel's): events may arrive
  * in ANY order as long as no event predates the user's first-seen
  * week — re-activity inside the already-seen range is absorbed by the
  * bitmask. An event EARLIER than the recorded cohort week would shift
  * every offset already emitted, which no per-user constant state can
  * repair; it fails loudly (the scd2Apply discipline). Offsets are
  * capped at 63 weeks (one long); a deeper horizon fails loudly rather
  * than silently wrapping.
  */
object StreamingCohort {

  final case class WeekEvent(user_id: Long, week: Long)

  /** One emitted increment: this user's first activity in
    * cohort_week + week_offset. */
  final case class Increment(user_id: Long, cohort_week: Long, week_offset: Long)

  final case class UserState(cohortWeek: Long, seenMask: Long)

  val MaxOffset = 63

  def increments(
      spark: SparkSession,
      events: Dataset[WeekEvent]): Dataset[Increment] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[WeekEvent], state: GroupState[UserState]) => {
          val evs = batch.toSeq.sortBy(_.week)
          if (evs.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(UserState(evs.head.week, 0L))
            val out = Seq.newBuilder[Increment]
            for (e <- evs) {
              require(e.week >= st.cohortWeek,
                s"event for user $user in week ${e.week} predates the recorded " +
                  s"cohort week ${st.cohortWeek} — offsets already emitted would shift")
              val off = e.week - st.cohortWeek
              require(off <= MaxOffset,
                s"week offset $off for user $user exceeds the $MaxOffset-week " +
                  "state horizon — widen the state or window the stream")
              val bit = 1L << off
              if ((st.seenMask & bit) == 0L) {
                st = st.copy(seenMask = st.seenMask | bit)
                out += Increment(user, st.cohortWeek, off)
              }
            }
            state.update(st)
            out.result().iterator
          }
        })
  }
}
