package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming COUNT(DISTINCT) IVM: the maintained per-group distinct
  * count equals the full recompute over surviving rows after every
  * micro-batch — duplicates collapsing, pairs erased only when their
  * last row goes, fully-deleted groups disappearing — redelivery is
  * idempotent, restart recovers from the snapshot triple, and
  * malformed deltas fail loudly before anything commits. */
@org.scalatest.tags.Slow
class StreamingIvmDistinctSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-ivm3")
  import spark.implicits._

  // (key, group, op, value): batch 0 seeds with a duplicated value in
  // a (two rows carry 10) and two pairs in b; batch 1 deletes ONE of
  // a's 10-rows (pair survives), deletes b's only 5 (pair gone), opens
  // c with a value already used by a (distinct per group, not global);
  // batch 2 deletes the REST of a's 10 (now the pair goes) and all of b
  private val batches = Seq(
    Seq((1L, "a", "I", 10L), (2L, "a", "I", 10L), (3L, "a", "I", 20L),
      (4L, "b", "I", 5L), (5L, "b", "I", 7L)),
    Seq((1L, "a", "D", 10L), (4L, "b", "D", 5L), (6L, "c", "I", 10L)),
    Seq((2L, "a", "D", 10L), (5L, "b", "D", 7L)))

  private def surviving(n: Int): Seq[(Long, String, Long)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    batches.take(n + 1).flatten.foreach {
      case (k, g, "I", v) => rows += ((k, g, v))
      case (k, g, "D", v) =>
        val i = rows.indexOf((k, g, v)); require(i >= 0); rows.remove(i)
    }
    rows.toSeq
  }

  private def recompute(n: Int): Seq[(String, Long)] = {
    val s = surviving(n)
    s.groupBy(_._2).view
      .mapValues(_.map(_._3).distinct.size.toLong).toSeq.sortBy(_._1)
  }

  private def collect(df: DataFrame): Seq[(String, Long)] =
    df.select(col("g"), col("n_distinct")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  private def apply(b: Seq[(Long, String, String, Long)], id: Long,
      dir: String): Long =
    StreamingIvmDistinct.applyBatch(b.toDF("k", "g", "op", "v"), id,
      "k", Seq("g"), "op", "v", dir)

  test("maintained ≡ full COUNT(DISTINCT) recompute after every batch — duplicate collapse and last-row erasure included") {
    val dir = java.nio.file.Files.createTempDirectory("ivm3").toString
    val got = scala.collection.mutable.Map[Long, Seq[(String, Long)]]()
    val input = MemoryStream[(Long, String, String, Long)](spark)
    val q = StreamingIvmDistinct.applyStream(
        input.toDF().toDF("k", "g", "op", "v"), "k", Seq("g"), "op", "v",
        dir, (id, _) =>
          got(id) = collect(StreamingIvmDistinct.readCounts(spark, dir)))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    (0 to 2).foreach(i => assert(got(i) == recompute(i), s"batch $i"))
    // batch 1's delete of a duplicated value must NOT decrement a
    assert(got(1).find(_._1 == "a").get._2 == 2L)
    // ...and c counts 10 even though a also held 10 (per-group scope)
    assert(got(1).find(_._1 == "c").get._2 == 1L)
    // batch 2 erased a's 10-pair and emptied b
    assert(got(2).find(_._1 == "a").get._2 == 1L)
    assert(!got(2).exists(_._1 == "b"))
    // the dictionary tracks surviving pairs exactly
    val dict = StreamingIvmDistinct.readDict(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(x => x).toSeq
    val wantDict = surviving(2).map(t => (t._2, t._3)).distinct.sortBy(x => x)
    assert(dict == wantDict)
  }

  test("redelivered batch folds to identical state (same prior snapshot triple, same bytes)") {
    val dir = java.nio.file.Files.createTempDirectory("ivm3-redeliver").toString
    apply(batches(0), 0L, dir)
    apply(batches(1), 1L, dir)
    val before = collect(StreamingIvmDistinct.readCounts(spark, dir))
    apply(batches(1), 1L, dir) // crash-replay: recomputes from triple 0
    assert(collect(StreamingIvmDistinct.readCounts(spark, dir)) == before)
    assert(before == recompute(1))
  }

  test("maintained store survives stop + restart from checkpoint (AvailableNow file source)") {
    import org.apache.spark.sql.streaming.Trigger
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("ivm3-src"); val ck = tmp("ivm3-ck"); val dir = tmp("ivm3-durable")
    def writeDelta(rows: Seq[(Long, String, String, Long)]): Unit =
      rows.toDF("k", "g", "op", "v").coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("k BIGINT, g STRING, op STRING, v BIGINT").parquet(src)
      val q = StreamingIvmDistinct.applyStream(in, "k", Seq("g"), "op", "v", dir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    writeDelta(batches(0)); run()
    assert(collect(StreamingIvmDistinct.readCounts(spark, dir)) == recompute(0))
    writeDelta(batches(1)); writeDelta(batches(2)); run()
    assert(collect(StreamingIvmDistinct.readCounts(spark, dir)) == recompute(2))
    run() // restart with nothing new: store unchanged
    assert(collect(StreamingIvmDistinct.readCounts(spark, dir)) == recompute(2))
  }

  test("malformed deltas fail loudly BEFORE anything commits") {
    val dir = java.nio.file.Files.createTempDirectory("ivm3-bad").toString
    val e1 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "U", 1L)), 0L, dir))
    assert(e1.getMessage.contains("outside {I, D}"))
    assert(!StreamingIvmDistinct.hasCommitted(spark, dir))
    apply(batches(0), 0L, dir)
    val e2 = intercept[IllegalArgumentException](apply(
      Seq((99L, "a", "D", 10L)), 1L, dir))
    assert(e2.getMessage.contains("never held"))
    val e3 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "D", 11L)), 1L, dir)) // image disagrees with stored row
    assert(e3.getMessage.contains("never held"))
    val e4 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "I", 3L)), 1L, dir)) // live-key insert
    assert(e4.getMessage.contains("still holds"))
    assert(collect(StreamingIvmDistinct.readCounts(spark, dir)) == recompute(0))
  }
}
