package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming top-k IVM: readTopK over the maintained counts equals the
  * full top-K recompute over surviving delivered occurrences after
  * every micro-batch, deletes honored exactly (the contract
  * StreamingHeavyHitters' insert-only counts deliberately exclude),
  * across checkpoint stop/restart; untouched group buckets are carried
  * over unread, and malformed deltas fail loudly before anything
  * commits. */
@org.scalatest.tags.Slow
class StreamingIvmTopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-ivm6")
  import spark.implicits._

  private val K = 2

  // (group, op, key) occurrence rows; batch 1 breaks group a (key 1
  // loses an occurrence — untouched key 3 must rise in), batch 2
  // empties group b and opens c
  private val batches = Seq(
    Seq(("a", "I", 1L), ("a", "I", 1L), ("a", "I", 2L), ("a", "I", 2L),
      ("a", "I", 2L), ("a", "I", 3L), ("b", "I", 7L), ("b", "I", 8L)),
    Seq(("a", "D", 1L), ("a", "D", 1L), ("a", "I", 4L)),
    Seq(("b", "D", 7L), ("b", "D", 8L), ("c", "I", 9L)))

  private def surviving(n: Int): Seq[(String, Long)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    batches.take(n + 1).flatten.foreach {
      case (g, "I", k) => rows += ((g, k))
      case (g, "D", k) =>
        val i = rows.indexOf((g, k)); require(i >= 0); rows.remove(i)
    }
    rows.toSeq
  }

  private def recompute(n: Int): Seq[(String, Long, Long, Int)] = {
    val w = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("ck"))
    collect(surviving(n).toDF("g", "ck")
      .groupBy(col("g"), col("ck")).agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K))
  }

  private def collect(df: DataFrame): Seq[(String, Long, Long, Int)] =
    df.select(col("g"), col("ck"), col("cnt"), col("rnk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  private def read(dir: String): Seq[(String, Long, Long, Int)] =
    collect(StreamingIvmTopK.readTopK(spark, dir))

  private def apply(b: Seq[(String, String, Long)], id: Long,
      dir: String): Long =
    StreamingIvmTopK.applyBatch(b.toDF("g", "op", "ck"), id,
      Seq("g"), "op", "ck", K, dir)

  test("maintained ≡ full top-k recompute after every batch — deletes honored, outsider rises in") {
    val dir = java.nio.file.Files.createTempDirectory("ivm6").toString
    val got = scala.collection.mutable.Map[Long, Seq[(String, Long, Long, Int)]]()
    val input = MemoryStream[(String, String, Long)](spark)
    val q = StreamingIvmTopK.applyStream(
        input.toDF().toDF("g", "op", "ck"), Seq("g"), "op", "ck", K,
        dir, (id, _) => got(id) = read(dir))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    (0 to 2).foreach(i => assert(got(i) == recompute(i), s"batch $i"))
    // batch 1: key 3 — untouched by the delta and outside the old
    // top-2 — must have risen in when key 1 fell (the broken path)
    assert(got(1).exists(t => t._1 == "a" && t._2 == 3L))
    // batch 2: group b vanished, c arrived
    assert(!got(2).exists(_._1 == "b"))
    assert(got(2).exists(_._1 == "c"))
  }

  test("redelivered batch folds to identical state") {
    val dir = java.nio.file.Files.createTempDirectory("ivm6-redeliver").toString
    apply(batches(0), 0L, dir)
    apply(batches(1), 1L, dir)
    val before = read(dir)
    apply(batches(1), 1L, dir)
    assert(read(dir) == before)
    assert(before == recompute(1))
  }

  test("maintained store survives stop + restart from checkpoint (AvailableNow file source)") {
    import org.apache.spark.sql.streaming.Trigger
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("ivm6-src"); val ck = tmp("ivm6-ck"); val dir = tmp("ivm6-durable")
    def writeDelta(rows: Seq[(String, String, Long)]): Unit =
      rows.toDF("g", "op", "ck").coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("g STRING, op STRING, ck BIGINT").parquet(src)
      val q = StreamingIvmTopK.applyStream(in, Seq("g"), "op", "ck", K, dir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    writeDelta(batches(0)); run()
    assert(read(dir) == recompute(0))
    writeDelta(batches(1)); writeDelta(batches(2)); run()
    assert(read(dir) == recompute(2))
    run()
    assert(read(dir) == recompute(2))
  }

  test("weighted face: maintained revenue top-k ≡ recompute after every batch") {
    val dir = java.nio.file.Files.createTempDirectory("ivm6w").toString
    // (group, op, key, weight): batch 0 seeds, batch 1 deletes part of
    // key 1's weight so untouched key 3 rises in (broken path)
    val wbatches = Seq(
      Seq(("a", "I", 1L, 30L), ("a", "I", 2L, 20L), ("a", "I", 3L, 15L)),
      Seq(("a", "D", 1L, 20L), ("a", "I", 4L, 5L)))
    def applyW(b: Seq[(String, String, Long, Long)], id: Long): Long =
      StreamingIvmTopK.applyBatch(b.toDF("g", "op", "ck", "w"), id,
        Seq("g"), "op", "ck", K, dir, weightCol = Some("w"))
    applyW(wbatches(0), 0L)
    assert(read(dir).map(t => (t._1, t._2, t._4)) ==
      Seq(("a", 1L, 1), ("a", 2L, 2))) // 1→30, 2→20 lead
    applyW(wbatches(1), 1L)
    // after: 1→10, 2→20, 3→15, 4→5 — top-2 = {2, 3}, key 3 untouched
    assert(read(dir).map(t => (t._1, t._2, t._3, t._4)) ==
      Seq(("a", 2L, 20L, 1), ("a", 3L, 15L, 2)))
  }

  test("malformed deltas fail loudly BEFORE anything commits") {
    val dir = java.nio.file.Files.createTempDirectory("ivm6-bad").toString
    val e1 = intercept[IllegalArgumentException](apply(
      Seq(("a", "U", 1L)), 0L, dir))
    assert(e1.getMessage.contains("outside {I, D}"))
    assert(!StreamingIvmTopK.hasCommitted(spark, dir))
    apply(batches(0), 0L, dir)
    // over-delete: the fold's count guard fires inside the counts
    // write, before either snapshot could commit
    val e2 = intercept[Exception](apply(Seq(("a", "D", 99L)), 1L, dir))
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain(e2).contains("never absorbed"), chain(e2))
    assert(read(dir) == recompute(0))
  }
}
