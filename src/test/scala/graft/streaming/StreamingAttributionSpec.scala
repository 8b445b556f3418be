package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAttribution.{AttEv, Credit}

/** Stream ≡ batch for last-touch attribution: feeding the real events
  * table through the stateful stream in event-time-ordered
  * micro-batches must credit exactly the channel counts the `at1`
  * batch window computes on the full table — across micro-batch
  * boundaries (a purchase in batch 3 crediting a touch from batch 1)
  * and across checkpoint stop/restart. */
class StreamingAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-attr")
  val dir = "/root/testdata/sf0.001"

  private def eventsDs = {
    import spark.implicits._
    graft.core.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[AttEv]
  }

  /** at1's channel counts on the full table — the batch truth. */
  private def batchCounts: Map[String, Long] =
    graft.queries.GovernanceQueries.queries("at1_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("streamed credits equal the at1 channel counts on the real events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three event-time-ordered micro-batches: the global (ts, id) sort
    // preserves every user's order across the batch cuts
    val all = eventsDs.collect().sortBy(e => (e.tsMicros, e.event_id))
    val cuts = Seq(all.length / 3, 2 * all.length / 3)
    val batches = Seq(all.slice(0, cuts(0)), all.slice(cuts(0), cuts(1)),
      all.slice(cuts(1), all.length))

    val input = MemoryStream[AttEv]
    val q = StreamingAttribution.credits(spark, input.toDS())
      .writeStream.format("memory").queryName("attr_credits")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("attr_credits").as[Credit].collect()
        .groupBy(_.channel).map { case (c, v) => c -> v.length.toLong }
      assert(streamed == batchCounts)
      // each purchase credited exactly once across all batches
      val ids = spark.table("attr_credits").as[Credit].collect().map(_.event_id)
      assert(ids.distinct.length == ids.length)
    } finally q.stop()
  }

  test("credits survive stop + restart from checkpoint (AvailableNow file source)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.SaveMode
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("attr-src"); val ck = tmp("attr-ck"); val out = tmp("attr-out")

    val all = eventsDs.collect().sortBy(e => (e.tsMicros, e.event_id))
    val (first, second) = all.splitAt(all.length / 2)
    def writeBatch(evs: Seq[AttEv]): Unit =
      evs.toDS().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("user_id BIGINT, event_id BIGINT, event_type STRING, tsMicros BIGINT")
        .parquet(src).as[AttEv]
      val q = StreamingAttribution.credits(spark, in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(first); run()
    writeBatch(second); run()
    val streamed = spark.read.parquet(out)
      .groupBy(col("channel")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batchCounts)
  }

  test("direct fold: equal-ts ordering by event_id, cross-batch touch memory, out-of-order is loud") {
    import StreamingAttribution._
    // equal-ts pair: the view (id 2) precedes the purchase (id 3) at
    // the same timestamp, so it IS the last touch — the (ts, id) order
    val (s1, c1) = fold(7L, None, Seq(
      AttEv(7, 1, "signup", 100), AttEv(7, 3, "purchase", 200),
      AttEv(7, 2, "view", 200)))
    assert(c1.map(_.channel) == Seq("view"))
    assert(s1.touch == "view" && s1.maxTs == 200 && s1.maxId == 3)
    // next batch: purchase with no new touch credits the REMEMBERED one
    val (s2, c2) = fold(7L, Some(s1), Seq(AttEv(7, 9, "purchase", 300)))
    assert(c2.map(_.channel) == Seq("view"))
    assert(s2.touch == "view")
    // a user whose first event is a purchase goes to 'direct'
    val (_, c3) = fold(8L, None, Seq(AttEv(8, 1, "purchase", 50)))
    assert(c3.map(_.channel) == Seq("direct"))
    // out-of-order across batches fails loudly
    val e = intercept[IllegalArgumentException] {
      fold(7L, Some(s2), Seq(AttEv(7, 4, "view", 250)))
    }
    assert(e.getMessage.contains("strictly increasing"))
    // duplicate delivery (same ts AND id as the high-water mark) too
    intercept[IllegalArgumentException] {
      fold(7L, Some(s2), Seq(AttEv(7, 9, "purchase", 300)))
    }
  }
}
