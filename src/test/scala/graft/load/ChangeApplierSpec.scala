package graft.load

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** CDC apply-changes: latest-per-key wins within a batch, upserts
  * across batches, table state converges. */
class ChangeApplierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "cdc-test")

  final case class Change(k: Long, name: String, seq: Long)

  test("stream of changes folds into latest-state table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tbl = "cdc_target"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val input = MemoryStream[Change]
    val applier = new ChangeApplier(spark)
    val q = applier.start(input.toDF(), tbl, Seq("k"), "seq", ckpt)
    try {
      input.addData(Change(1, "a1", 1), Change(2, "b1", 1))
      q.processAllAvailable()
      // same key twice in one batch: seq=4 must win; plus an update + insert
      input.addData(Change(1, "a2", 3), Change(1, "a3", 4), Change(3, "c1", 2))
      q.processAllAvailable()
      val state = spark.table(tbl).select("k", "name")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(state == Map(1L -> "a3", 2L -> "b1", 3L -> "c1"))
      // the non-CDC fresh table KEEPS the sequence column (the original
      // first-batch contract: persisted seq = each key's last-applied
      // change), and it carries the winning row's seq
      assert(spark.table(tbl).columns.toSeq == Seq("k", "name", "seq"))
      val seqs = spark.table(tbl).select("k", "seq")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(seqs == Map(1L -> 4L, 2L -> 1L, 3L -> 2L))
    } finally q.stop()
  }

  final case class CdcChange(k: Long, name: String, seq: Long, op: String)

  test("delete-aware stream: D markers remove keys across batches, compaction within") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tbl = "cdc_target_del"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt_del").toString
    val input = MemoryStream[CdcChange]
    val q = new ChangeApplier(spark).startCdc(input.toDF(), tbl, Seq("k"), "seq", "op", ckpt)
    try {
      input.addData(CdcChange(1, "a1", 1, "U"), CdcChange(2, "b1", 1, "U"),
        CdcChange(3, "c1", 1, "U"))
      q.processAllAvailable()
      // in-batch compaction: 3's update-then-delete lands as the
      // delete; 2 updates; 4 inserts; 9's delete of an absent key no-ops
      input.addData(CdcChange(3, "c2", 2, "U"), CdcChange(3, "c2", 3, "D"),
        CdcChange(2, "b2", 2, "U"), CdcChange(4, "d1", 2, "U"),
        CdcChange(9, "zz", 2, "D"))
      q.processAllAvailable()
      val state = spark.table(tbl).select("k", "name")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(state == Map(1L -> "a1", 2L -> "b2", 4L -> "d1"))
      // the CDC table must NOT carry feed metadata: applyCdc requires
      // the target's columns to exclude seq/op
      assert(spark.table(tbl).columns.toSeq == Seq("k", "name"))
    } finally q.stop()
  }
}
