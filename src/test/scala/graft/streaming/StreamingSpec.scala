package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps.{LoadEvent, TableState}

/** Stateful streaming semantics over MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-test")

  test("foldTableState accumulates per-table state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LoadEvent]
    val q = StatefulOps.foldTableState(spark, input.toDS())
      .writeStream.format("memory").queryName("fold_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(LoadEvent("t1", "rows", 10), LoadEvent("t1", "bytes", 100),
        LoadEvent("t2", "rows", 5))
      q.processAllAvailable()
      input.addData(LoadEvent("t1", "rows", 7), LoadEvent("t2", "failed", 0))
      q.processAllAvailable()
      val last = spark.table("fold_out").as[TableState].collect()
        .groupBy(_.table).map { case (k, v) => k -> v.maxBy(_.events) }
      assert(last("t1") == TableState("t1", 17, 100, failed = false, 3))
      assert(last("t2") == TableState("t2", 5, 0, failed = true, 2))
    } finally q.stop()
  }

  test("watermarked tumbling window finalizes in append mode and drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val input = MemoryStream[WindowedAgg.Event]
    val q = WindowedAgg.tumbling(input.toDS(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(WindowedAgg.Event(ts(5), "a", 1.0),
        WindowedAgg.Event(ts(30), "a", 2.0))
      q.processAllAvailable()
      // nothing finalized yet (watermark at 10:00)
      assert(spark.table("win_out").count() == 0)
      // event at 12:00 pushes watermark to 11:30 -> 10:00 window closes
      input.addData(WindowedAgg.Event(
        java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), "a", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect()
      assert(rows.toSet == Set(("a", 2L, 3.0)))
      // a late event inside the closed 10:00 window is dropped
      input.addData(WindowedAgg.Event(ts(45), "a", 100.0))
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 1)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val imps = MemoryStream[StreamJoin.Impression]
    val clks = MemoryStream[StreamJoin.Click]
    val q = StreamJoin.attribute(imps.toDS(), clks.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(StreamJoin.Impression(1, ts(10, 0), "camp_a"),
        StreamJoin.Impression(2, ts(10, 5), "camp_b"))
      q.processAllAvailable()
      // click inside the 1h window joins; click 2h later must not
      clks.addData(StreamJoin.Click(1, ts(10, 30)), StreamJoin.Click(2, ts(12, 30)))
      q.processAllAvailable()
      val rows = spark.table("attr_out").select("imp_id", "campaign")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "camp_a")))
    } finally q.stop()
  }

  test("streaming session window closes after the gap and merges bursts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[WindowedAgg.Event]
    val q = WindowedAgg.sessionized(input.toDS(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // burst of 3 events ≤30min apart = one session
      input.addData(WindowedAgg.Event(ts(10, 0), "a", 1.0),
        WindowedAgg.Event(ts(10, 20), "a", 2.0),
        WindowedAgg.Event(ts(10, 40), "a", 3.0))
      q.processAllAvailable()
      // far-future event closes the session
      input.addData(WindowedAgg.Event(ts(15, 0), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect()
      assert(rows.toSet == Set(("a", 3L, 6.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val input = MemoryStream[WindowedAgg.Event]
    val q = WindowedAgg.dedupWithinWatermark(input.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("wdedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(WindowedAgg.Event(ts(0), "a", 1.0),
        WindowedAgg.Event(ts(0), "a", 1.0))
      q.processAllAvailable()
      input.addData(WindowedAgg.Event(ts(0), "a", 1.0), // dup, within horizon
        WindowedAgg.Event(ts(5), "b", 2.0))
      q.processAllAvailable()
      val rows = spark.table("wdedup_out").select("event_type")
        .as[String].collect().toSeq.sorted
      assert(rows == Seq("a", "b"))
    } finally q.stop()
  }

  test("firstSeenOnly emits each key once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StatefulOps.firstSeenOnly[String](spark, input.toDS(), identity)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData("a", "b", "a")
      q.processAllAvailable()
      input.addData("b", "c")
      q.processAllAvailable()
      val seen = spark.table("dedup_out").as[String].collect().toSeq.sorted
      assert(seen == Seq("a", "b", "c"))
    } finally q.stop()
  }
}
