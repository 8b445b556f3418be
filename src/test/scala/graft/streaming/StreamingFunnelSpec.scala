package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFunnel.{Ev, FunnelState}

/** Stream ≡ batch for the ordered funnel: feeding the real events
  * table through the stateful stream in event-time-ordered
  * micro-batches must land on exactly the per-user step times the
  * batch cascade (fn1's `funnelStages`) computes on the full table.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-funnel")
  val dir = "/root/testdata/sf0.001"

  private def eventsDs = {
    import spark.implicits._
    graft.core.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[Ev]
  }

  test("streamed funnel state equals the batch cascade row-for-row on the real events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = eventsDs.collect().sortBy(_.tsMicros)
    // three event-time-ordered micro-batches (split at day boundaries)
    val cuts = Seq(all.length / 3, 2 * all.length / 3)
    val batches = Seq(all.slice(0, cuts(0)), all.slice(cuts(0), cuts(1)),
      all.slice(cuts(1), all.length))

    val input = MemoryStream[Ev]
    val q = StreamingFunnel.progress(spark, input.toDS())
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      // latest state per user = the one with the largest maxTs
      val streamed = spark.table("funnel_state").as[FunnelState].collect()
        .groupBy(_.user_id).map { case (u, v) => u -> v.maxBy(_.maxTs).times }

      val ev = eventsDs.toDF()
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("tsMicros")).as("ts"))
      val stages = graft.queries.EventQueries.funnelStages(ev).map(
        _.select(col("user_id"), unix_micros(col("t")).as("t"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

      stages.zipWithIndex.foreach { case (stage, k) =>
        val fromStream = streamed.collect {
          case (u, times) if times(k) != -1L => u -> times(k)
        }.toMap
        assert(fromStream == stage, s"step $k diverged")
      }
      // and users the batch never reaches must be -1 in the stream too
      assert(streamed.count(_._2(3) != -1L) == stages(3).size)
    } finally q.stop()
  }

  test("funnel state survives stop + restart from checkpoint (AvailableNow file source)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.SaveMode
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("fnl-src"); val ck = tmp("fnl-ck")
    spark.sql("CREATE DATABASE IF NOT EXISTS sfnl")
    spark.sql("DROP TABLE IF EXISTS sfnl.state")

    val all = eventsDs.collect().sortBy(_.tsMicros)
    val (first, second) = all.splitAt(all.length / 2)
    def writeBatch(evs: Seq[Ev]): Unit =
      evs.toDS().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("user_id BIGINT, event_type STRING, tsMicros BIGINT")
        .parquet(src).as[Ev]
      val q = StreamingFunnel.progress(spark, in)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Update)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelState], batchId: Long) =>
          df.toDF().withColumn("batch", lit(batchId))
            .write.mode(SaveMode.Append).saveAsTable("sfnl.state")
          ()
        }.start()
      q.awaitTermination()
    }
    writeBatch(first); run()
    // restart: the second half arrives; recovered state must continue
    // each user's funnel, not restart it
    writeBatch(second); run()

    val streamed = spark.table("sfnl.state")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("batch").desc, col("maxTs").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("times"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val ev = eventsDs.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("tsMicros")).as("ts"))
    val stages = graft.queries.EventQueries.funnelStages(ev).map(
      _.select(col("user_id"), unix_micros(col("t")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    stages.zipWithIndex.foreach { case (stage, k) =>
      val fromStream = streamed.collect {
        case (u, times) if times(k) != -1L => u -> times(k)
      }.toMap
      assert(fromStream == stage, s"step $k diverged after restart")
    }
  }

  test("an out-of-order event across batches fails loudly instead of silently diverging") {
    val s0 = StreamingFunnel.fold(7L, None,
      Seq(Ev(7L, "signup", 100L), Ev(7L, "view", 200L)), StreamingFunnel.DefaultSteps)
    assert(s0.times.toSeq == Seq(100L, 200L, -1L, -1L))
    val ex = intercept[IllegalArgumentException] {
      StreamingFunnel.fold(7L, Some(s0), Seq(Ev(7L, "click", 150L)),
        StreamingFunnel.DefaultSteps)
    }
    assert(ex.getMessage.contains("out-of-order"))
  }

  test("the fold ignores out-of-sequence steps exactly like the batch cascade") {
    // purchase before click must not count; a pre-signup view must not
    // start the chain — the constructed cases of EventQueriesSpec
    val u2 = StreamingFunnel.fold(2L, None,
      Seq(Ev(2L, "signup", 10L), Ev(2L, "view", 20L),
        Ev(2L, "purchase", 25L), Ev(2L, "click", 30L)),
      StreamingFunnel.DefaultSteps)
    assert(u2.times.toSeq == Seq(10L, 20L, 30L, -1L))
    val u3 = StreamingFunnel.fold(3L, None,
      Seq(Ev(3L, "view", 5L), Ev(3L, "signup", 10L)), StreamingFunnel.DefaultSteps)
    assert(u3.times.toSeq == Seq(10L, -1L, -1L, -1L))
    // equal-ts tie never advances two steps (strict >)
    val tie = StreamingFunnel.fold(4L, None,
      Seq(Ev(4L, "signup", 10L), Ev(4L, "view", 10L)), StreamingFunnel.DefaultSteps)
    assert(tie.times.toSeq == Seq(10L, -1L, -1L, -1L))
  }
}
