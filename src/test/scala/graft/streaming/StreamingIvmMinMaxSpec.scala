package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Exact.dec

/** Streaming non-invertible IVM: the maintained (count, sum, min, max)
  * equals the full recompute over surviving rows after every
  * micro-batch — INCLUDING batches that delete a group's max (the
  * re-agg path) — fully-deleted groups disappear, redelivery is
  * idempotent, restart recovers from the snapshot pair, and malformed
  * deltas fail loudly before anything commits. */
@org.scalatest.tags.Slow
class StreamingIvmMinMaxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-ivm2")
  import spark.implicits._

  // (key, group, op, value): batch 0 seeds; batch 1 DELETES a's max
  // (20.0 — the re-agg trigger), re-prices via a fresh insert, opens c;
  // batch 2 deletes ALL of b (its min AND max in one batch)
  private val batches = Seq(
    Seq((1L, "a", "I", 10.0), (2L, "a", "I", 20.0),
      (3L, "b", "I", 5.0), (4L, "b", "I", 7.0)),
    Seq((2L, "a", "D", 20.0), (5L, "a", "I", 12.5), (6L, "c", "I", 100.0)),
    Seq((3L, "b", "D", 5.0), (4L, "b", "D", 7.0)))

  private def surviving(n: Int): Seq[(Long, String, Double)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    batches.take(n + 1).flatten.foreach {
      case (k, g, "I", v) => rows += ((k, g, v))
      case (k, g, "D", v) =>
        val i = rows.indexOf((k, g, v)); require(i >= 0); rows.remove(i)
    }
    rows.toSeq
  }

  private type AggRow = (String, Long, java.math.BigDecimal, Double, Double)

  private def recompute(n: Int): Seq[AggRow] =
    collect(surviving(n).toDF("k", "g", "v").groupBy("g")
      .agg(count(lit(1)).as("n"), sum(dec(col("v"))).cast("decimal(28,4)").as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx")))

  private def collect(df: DataFrame): Seq[AggRow] =
    df.select(col("g"), col("n"), col("s"), col("mn"), col("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  private def apply(b: Seq[(Long, String, String, Double)], id: Long,
      dir: String): Long =
    StreamingIvmMinMax.applyBatch(b.toDF("k", "g", "op", "v"), id,
      "k", Seq("g"), "op", "v", dir)

  test("maintained ≡ full min/max recompute after every batch — delete-the-max included") {
    val dir = java.nio.file.Files.createTempDirectory("ivm2").toString
    val got = scala.collection.mutable.Map[Long, Seq[AggRow]]()
    val input = MemoryStream[(Long, String, String, Double)](spark)
    val q = StreamingIvmMinMax.applyStream(
        input.toDF().toDF("k", "g", "op", "v"), "k", Seq("g"), "op", "v",
        dir, (id, _) => got(id) = collect(StreamingIvmMinMax.readAgg(spark, dir)))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    (0 to 2).foreach(i => assert(got(i) == recompute(i), s"batch $i"))
    // batch 1 removed a's stored max: the new max must be the
    // runner-up (12.5 > 10.0), which only the re-agg path can know
    assert(got(1).find(_._1 == "a").get._5 == 12.5)
    assert(!got(2).exists(_._1 == "b"))
    // the rows store tracks survivors exactly
    val rows = StreamingIvmMinMax.readRows(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(rows == surviving(2).sortBy(_._1))
  }

  test("redelivered batch folds to identical state (same prior snapshot pair, same bytes)") {
    val dir = java.nio.file.Files.createTempDirectory("ivm2-redeliver").toString
    apply(batches(0), 0L, dir)
    apply(batches(1), 1L, dir)
    val before = collect(StreamingIvmMinMax.readAgg(spark, dir))
    // crash-replay of batch 1: recomputes from pair 0, overwrites
    apply(batches(1), 1L, dir)
    assert(collect(StreamingIvmMinMax.readAgg(spark, dir)) == before)
    assert(before == recompute(1))
  }

  test("maintained store survives stop + restart from checkpoint (AvailableNow file source)") {
    import org.apache.spark.sql.streaming.Trigger
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("ivm2-src"); val ck = tmp("ivm2-ck"); val dir = tmp("ivm2-durable")
    def writeDelta(rows: Seq[(Long, String, String, Double)]): Unit =
      rows.toDF("k", "g", "op", "v").coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("k BIGINT, g STRING, op STRING, v DOUBLE").parquet(src)
      val q = StreamingIvmMinMax.applyStream(in, "k", Seq("g"), "op", "v", dir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    writeDelta(batches(0)); run()
    assert(collect(StreamingIvmMinMax.readAgg(spark, dir)) == recompute(0))
    writeDelta(batches(1)); writeDelta(batches(2)); run()
    assert(collect(StreamingIvmMinMax.readAgg(spark, dir)) == recompute(2))
    run() // restart with nothing new: store unchanged
    assert(collect(StreamingIvmMinMax.readAgg(spark, dir)) == recompute(2))
  }

  test("malformed deltas fail loudly BEFORE anything commits") {
    val dir = java.nio.file.Files.createTempDirectory("ivm2-bad").toString
    // op outside {I, D}
    val e1 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "U", 1.0)), 0L, dir))
    assert(e1.getMessage.contains("outside {I, D}"))
    assert(!StreamingIvmMinMax.hasCommitted(spark, dir))
    apply(batches(0), 0L, dir)
    // delete of a row the store never held (unknown key)
    val e2 = intercept[IllegalArgumentException](apply(
      Seq((99L, "a", "D", 10.0)), 1L, dir))
    assert(e2.getMessage.contains("never held"))
    // delete image disagreeing with the stored value for its key
    val e3 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "D", 11.0)), 1L, dir))
    assert(e3.getMessage.contains("never held"))
    // insert colliding with a live key
    val e4 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "I", 3.0)), 1L, dir))
    assert(e4.getMessage.contains("still holds"))
    // same key inserted twice in one batch
    val e5 = intercept[IllegalArgumentException](apply(
      Seq((7L, "a", "I", 3.0), (7L, "a", "I", 4.0)), 1L, dir))
    assert(e5.getMessage.contains("twice"))
    // none of the failures advanced the store
    assert(collect(StreamingIvmMinMax.readAgg(spark, dir)) == recompute(0))
  }
}
