package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Custom stateful streaming operators (SURVEY §2.9 "stateful log
  * fold"; reference `teradata_transfer_run_log_dag.py:302-470` folds
  * ordered log events into per-table job state).
  *
  * Spark-first shape: `KeyValueGroupedDataset.flatMapGroupsWithState`
  * holds one small state record per key, updated per micro-batch —
  * the engine shuffles by key once and the state store scales with
  * distinct keys, not event volume.
  */
object StatefulOps {

  final case class LoadEvent(table: String, kind: String, amount: Long)

  final case class TableState(
      table: String, rows: Long, bytes: Long, failed: Boolean, events: Long)

  /** Fold load events into per-table running state; emit the updated
    * state after each batch (Update mode). */
  def foldTableState(
      spark: SparkSession,
      events: Dataset[LoadEvent]): Dataset[TableState] = {
    import spark.implicits._
    events
      .groupByKey(_.table)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (table: String, batch: Iterator[LoadEvent], state: GroupState[TableState]) => {
          val prev = state.getOption.getOrElse(TableState(table, 0L, 0L, failed = false, 0L))
          val next = batch.foldLeft(prev) { (st, e) =>
            e.kind match {
              case "rows"   => st.copy(rows = st.rows + e.amount, events = st.events + 1)
              case "bytes"  => st.copy(bytes = st.bytes + e.amount, events = st.events + 1)
              case "failed" => st.copy(failed = true, events = st.events + 1)
              case _        => st.copy(events = st.events + 1)
            }
          }
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Streaming dedup-by-key with state: emit each key's event only the
    * first time it is seen (the audit-gated exactly-once shape, kept
    * entirely in the state store). */
  def firstSeenOnly[T](
      spark: SparkSession,
      events: Dataset[T],
      key: T => String)(implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import spark.implicits._
    events
      .groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: String, batch: Iterator[T], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else { state.update(true); batch.take(1) }
        })
  }
}
