package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.validate.RefIntegrity

/** Streaming referential-integrity audit — [[graft.validate.RefIntegrity]]
  * composed with the [[StreamingScd2]]-maintained dimension per
  * micro-batch, the stream-static pattern [[StreamingScreen]] uses for
  * d8: each change batch first folds into the Type-2 dimension, then
  * every declared child table's FK column is audited against the
  * dimension's CURRENT key set — so a change stream that breaks an FK
  * (a child referencing a key the stream never delivered, or delivered
  * only later) surfaces its orphan count in the SAME run, batch by
  * batch, instead of in a nightly sweep.
  *
  * Audit-vs-static contract: after micro-batch N commits, the emitted
  * audit frame is row-for-row what `RefIntegrity.check` returns against
  * the batch-rebuilt dimension at that point (StreamingRefAuditSpec) —
  * the streaming face adds freshness, never a different answer.
  *
  * Scale shape: the parent side of each relation is the OPEN key set
  * (one row per dimension key — key-set-sized, not history-sized, read
  * from the latest snapshot only); each child audit is
  * [[RefIntegrity]]'s one keyed exchange + combinable counts, and all
  * relations union into one action per micro-batch. Before any snapshot
  * commits, the truth is "no parents exist": every non-null child key
  * counts as an orphan (an empty parent frame, not a skipped audit). */
object StreamingRefAudit {

  /** One child table to audit: (relation name, child rows, FK column). */
  final case class ChildRef(name: String, child: DataFrame, fkCol: String)

  /** Static audit of `children` against the dimension's current open
    * key set (`is_current` versions of `keyCol`). */
  def audit(
      spark: SparkSession, dimDir: String, keyCol: String,
      children: Seq[ChildRef]): DataFrame = {
    require(children.nonEmpty, "need at least one child table to audit")
    val parent =
      if (StreamingScd2.hasCommitted(spark, dimDir))
        StreamingScd2.readDim(spark, dimDir)
          .filter(col("is_current")).select(col(keyCol))
      else children.head.child
        .select(col(children.head.fkCol).as(keyCol)).limit(0)
    RefIntegrity.check(children.map(c =>
      RefIntegrity.Relation(c.name, c.child, c.fkCol, parent, keyCol)))
  }

  /** Wire the apply-then-audit cycle onto a STREAMING change frame:
    * per micro-batch, [[StreamingScd2.applyBatch]] folds the changes
    * into `dimDir`, then `onAudit` observes (batchId, audit frame) —
    * collect it, sink it, or alert on `orphans > 0`. Call `.start()`.
    * `keys` must be the single FK target column ([[RefIntegrity]]
    * audits single-column keys, the SQL FK shape). */
  def auditStream(
      changes: DataFrame, keys: Seq[String], attrs: Seq[String],
      orderCols: Seq[String], dimDir: String,
      children: Seq[ChildRef],
      onAudit: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    require(changes.isStreaming, "auditStream expects a streaming DataFrame " +
      "(use audit() against a static dimension)")
    require(keys.size == 1,
      s"FK audit needs a single-column dimension key, got $keys")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      val spark = b.sparkSession
      StreamingScd2.applyBatch(b.toDF(), id, keys, attrs, orderCols, dimDir)
      onAudit(id, audit(spark, dimDir, keys.head, children))
    }
  }
}
