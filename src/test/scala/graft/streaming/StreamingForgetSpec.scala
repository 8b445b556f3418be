package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Forget

/** Streaming erasure: the scrubbed view after batch N equals the batch
  * scrub with all keys so far, accumulation is idempotent under
  * redelivery, and the pre-first-batch view is the table itself. */
class StreamingForgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-forget")

  private def table = {
    import spark.implicits._
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
  }

  private def kept(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("view after batch N ≡ batch scrub of keys 0..N; duplicate re-requests are one erasure") {
    import spark.implicits._
    val keysDir = java.nio.file.Files.createTempDirectory("forget-keys").toString + "/keys"
    // key 2 is re-requested in batch 2 — must not change the view
    val batches = Seq(Seq(2L, 4L), Seq(6L, 2L), Seq(8L))
    val views = scala.collection.mutable.Map[Long, Seq[Long]]()
    val input = MemoryStream[Long](spark)
    val q = StreamingForget.accumulate(input.toDF(), keysDir,
        (id, s) => views(id) =
          kept(StreamingForget.scrubbedView(s, table, "k", keysDir)))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val all = batches.flatten
    def want(n: Int): Seq[Long] = kept(Forget.scrub(
      table, "k", batches.take(n).flatten.toDF("id")))
    assert(views(0) == want(1) && views(1) == want(2) && views(2) == want(3))
    assert(views(2) == (1L to 20L).filterNot(Set(2L, 4L, 6L, 8L)))
    // the audit face agrees with the view
    val audit = StreamingForget.auditView(
      spark, Seq(("t", table, "k")), keysDir).collect().head
    assert((audit.getLong(1), audit.getLong(2), audit.getLong(3)) == ((20L, 4L, 16L)))
    assert(all.size == 5 && all.distinct.size == 4 && audit.getLong(2) == 4L,
      "5 requests, 4 distinct erasures")
  }

  test("redelivered batch directory leaves the key set unchanged") {
    import spark.implicits._
    val keysDir = java.nio.file.Files.createTempDirectory("forget-redeliver").toString + "/keys"
    val input = MemoryStream[Long](spark)
    val q = StreamingForget.accumulate(input.toDF(), keysDir).start()
    try { input.addData(3L, 5L); q.processAllAvailable() }
    finally q.stop()
    val before = kept(StreamingForget.forgetKeys(spark, keysDir).toDF("k"))
    // simulate the crash-replay: the same batch content lands in the
    // same batch directory again (overwrite mode = idempotent)
    Seq(3L, 5L).toDF("forget_key").distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"$keysDir/batch=0")
    assert(kept(StreamingForget.forgetKeys(spark, keysDir).toDF("k")) == before)
  }

  test("erasure set survives stop + restart from checkpoint (AvailableNow file source)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("forget-src"); val ck = tmp("forget-ck")
    val keysDir = tmp("forget-durable") + "/keys"
    def writeReqs(ks: Seq[Long]): Unit =
      ks.toDF("id").coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val in = spark.readStream.schema("id BIGINT").parquet(src)
      val q = StreamingForget.accumulate(in, keysDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    writeReqs(Seq(2L, 4L)); run()
    assert(kept(StreamingForget.scrubbedView(spark, table, "k", keysDir)) ==
      (1L to 20L).filterNot(Set(2L, 4L)))
    // restart from the checkpoint: only the NEW requests replay; the
    // recovered view carries both halves
    writeReqs(Seq(6L)); run()
    assert(kept(StreamingForget.scrubbedView(spark, table, "k", keysDir)) ==
      (1L to 20L).filterNot(Set(2L, 4L, 6L)))
    // a third restart with NOTHING new is a no-op (no empty snapshot,
    // no forgotten keys lost)
    run()
    assert(kept(StreamingForget.scrubbedView(spark, table, "k", keysDir)) ==
      (1L to 20L).filterNot(Set(2L, 4L, 6L)))
  }

  test("before any batch commits, the view IS the table and the audit is all-retained") {
    val keysDir = java.nio.file.Files.createTempDirectory("forget-empty").toString + "/keys"
    assert(!StreamingForget.hasKeys(spark, keysDir))
    assert(kept(StreamingForget.scrubbedView(spark, table, "k", keysDir)) ==
      (1L to 20L))
    val audit = StreamingForget.auditView(
      spark, Seq(("t", table, "k")), keysDir).collect().head
    assert((audit.getLong(1), audit.getLong(2), audit.getLong(3)) == ((20L, 0L, 20L)))
    val e = intercept[IllegalArgumentException](
      StreamingForget.forgetKeys(spark, keysDir))
    assert(e.getMessage.contains("no committed erasure batches"))
  }
}
