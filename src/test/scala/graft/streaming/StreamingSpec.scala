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
