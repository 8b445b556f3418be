package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCohort.{Increment, WeekEvent}

/** Stream ≡ batch for cohort retention: summing the stream's
  * exactly-once (user, offset) increments per cell must equal the co1
  * batch matrix's COUNT(DISTINCT user_id) on the same events.
  */
class StreamingCohortSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-cohort")
  val dir = "/root/testdata/sf0.001"

  private def weekEvents = {
    import spark.implicits._
    graft.core.Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 604800").as("week"))
      .as[WeekEvent]
  }

  test("summed increments equal the batch co1 matrix cell-for-cell on the real events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = weekEvents.collect().sortBy(_.week)
    val thirds = Seq(all.slice(0, all.length / 3),
      all.slice(all.length / 3, 2 * all.length / 3),
      all.slice(2 * all.length / 3, all.length))

    val input = MemoryStream[WeekEvent]
    val q = StreamingCohort.increments(spark, input.toDS())
      .writeStream.format("memory").queryName("cohort_inc")
      .outputMode(OutputMode.Append).start()
    try {
      thirds.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("cohort_inc").as[Increment].collect()
      // exactly-once: no (user, offset) pair twice
      assert(streamed.map(i => (i.user_id, i.week_offset)).distinct.length
        == streamed.length)
      val matrix = streamed.groupBy(i => (i.cohort_week, i.week_offset))
        .map { case (k, v) => k -> v.length.toLong }

      val batch = graft.queries.EventQueries
        .queries("co1_cohort_retention")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(matrix == batch)
    } finally q.stop()
  }

  test("re-activity in an already-seen week emits nothing; new week emits once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WeekEvent]
    val q = StreamingCohort.increments(spark, input.toDS())
      .writeStream.format("memory").queryName("cohort_inc2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(WeekEvent(1, 100), WeekEvent(1, 100), WeekEvent(1, 102))
      q.processAllAvailable()
      input.addData(WeekEvent(1, 102), WeekEvent(1, 101))
      q.processAllAvailable()
      val out = spark.table("cohort_inc2").as[Increment].collect().toSet
      assert(out == Set(Increment(1, 100, 0), Increment(1, 100, 2), Increment(1, 100, 1)))
    } finally q.stop()
  }

  test("an event predating the cohort week fails loudly; so does exceeding the 63-week horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def feed(batches: Seq[Seq[WeekEvent]], name: String): Throwable = {
      val input = MemoryStream[WeekEvent]
      val q = StreamingCohort.increments(spark, input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try intercept[Exception] {
        batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      } finally q.stop()
    }
    val e1 = feed(Seq(Seq(WeekEvent(5, 100)), Seq(WeekEvent(5, 99))), "cohort_err1")
    assert(e1.toString.contains("predates") || e1.getCause != null)
    val e2 = feed(Seq(Seq(WeekEvent(6, 100), WeekEvent(6, 170))), "cohort_err2")
    assert(e2.toString.contains("horizon") || e2.getCause != null)
  }
}
