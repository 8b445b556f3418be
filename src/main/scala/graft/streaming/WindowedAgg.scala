package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Watermarked windowed aggregation (SURVEY §2.9 — the idiomatic
  * replacement for the reference's daily-window + audit-dedup late-data
  * policy: a watermark bounds state and drops data later than the
  * allowed lateness, and append mode emits each window exactly once
  * when it finalizes).
  */
object WindowedAgg {

  final case class Event(ts: Timestamp, event_type: String, value: Double)

  /** Tumbling-window count+sum with watermark; append-mode-ready
    * (emits only finalized windows). */
  def tumbling(
      events: Dataset[Event],
      window: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per key (streaming twin of the batch
    * `st3_sessionize` lag+cumsum formulation): a session closes — and
    * emits exactly once in append mode — when the watermark passes its
    * end + gap. State per key is one open session, merged by Spark's
    * native session_window. */
  def sessionized(
      events: Dataset[Event],
      gap: String = "30 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermark-bounded exactly-once dedup on `(event_type, ts)`:
    * duplicates arriving within the lateness horizon collapse; state
    * ages out with the watermark instead of growing forever (the
    * streaming form of the reference's audit-table rerun delta). */
  def dedupWithinWatermark(
      events: Dataset[Event], lateness: String = "30 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("event_type", "ts"))
}
