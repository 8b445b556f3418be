package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert
import graft.validate.RefIntegrity

/** Streaming FK audit: per micro-batch, RefIntegrity over the
  * stream-maintained dimension equals the static check against the
  * batch-rebuilt dimension row-for-row, and an FK broken by the stream
  * surfaces its orphans in the same run. */
class StreamingRefAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-refaudit")

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .sortBy(_._1).toSeq

  // dimension change log: keys 1, 2 arrive in batch 1; key 3 only in
  // batch 2; key 4 never arrives
  private val batches = Seq(
    Seq((1L, 1, "A"), (2L, 1, "B")),
    Seq((3L, 2, "C"), (1L, 3, "A2")))

  test("stream audit ≡ static RefIntegrity against the batch-rebuilt dimension, per batch") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("refaudit").toString + "/dim"
    // facts referencing keys 1..4 plus a null FK
    val facts = Seq(Some(1L), Some(2L), Some(3L), Some(4L), Some(4L),
      None: Option[Long]).toDF("fk")
    val children = Seq(StreamingRefAudit.ChildRef("facts.fk->dim.k", facts, "fk"))
    val audits = scala.collection.mutable.Map[Long, Seq[(String, Long, Long, Long)]]()
    val input = MemoryStream[(Long, Int, String)](spark)
    val q = StreamingRefAudit.auditStream(
      input.toDF().toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"),
      dimDir, children, (id, df) => audits(id) = rows(df)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // orphan trajectory: after batch 0 keys {1,2} exist → orphans = 3
    // (one 3-ref, two 4-refs); after batch 1 keys {1,2,3} → orphans = 2.
    // The broken FK (key 4) stays visible in the same run.
    assert(audits(0) == Seq(("facts.fk->dim.k", 6L, 1L, 3L)))
    assert(audits(1) == Seq(("facts.fk->dim.k", 6L, 1L, 2L)))
    // row-for-row against the static check on the batch-rebuilt dim
    val want = rows(RefIntegrity.check(Seq(RefIntegrity.Relation(
      "facts.fk->dim.k", facts, "fk",
      Upsert.scd2History((batches.head ++ batches(1)).toDF("k", "seq", "status"),
        Seq("k"), Seq("status"), Seq("seq")).filter(col("is_current")), "k"))))
    assert(audits(1) == want)
  }

  test("before any committed snapshot, every non-null child key is an orphan") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("refaudit-empty").toString + "/dim"
    val facts = Seq(Some(1L), None: Option[Long]).toDF("fk")
    val out = rows(StreamingRefAudit.audit(spark, dimDir, "k",
      Seq(StreamingRefAudit.ChildRef("f", facts, "fk"))))
    assert(out == Seq(("f", 2L, 1L, 1L)))
  }
}
