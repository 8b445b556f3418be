package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for heavy hitters: the state-store counts, folded
  * over the REAL documents table delivered in micro-batches — with a
  * checkpoint stop/restart in the middle — must reproduce the `hh1`
  * batch query's top-K exactly (rows, counts, ranks), and redelivered
  * updates must be harmless by monotonicity. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-hh")
  val dir = "/root/testdata/sf0.001"
  private val K = 10 // hh1's HhK

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("stream ≡ hh1 batch top-K across micro-batches with checkpoint stop/restart") {
    import spark.implicits._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("hh-src"); val ck = tmp("hh-ck"); val out = tmp("hh-out")

    // the hh1 word stream off the real table, split into three
    // deliveries by doc_id — same rows, just incremental
    val words = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(graft.operators.TextOps.words(col("text"))).as("word"))
    def writeSlice(m: Int): Unit =
      words.filter(pmod(col("doc_id"), lit(3)) === m)
        .select(col("source"), col("word"))
        .coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val in = spark.readStream.schema("source STRING, word STRING")
        .parquet(src).as[StreamingHeavyHitters.SourceWord]
      val q = StreamingHeavyHitters.counts(spark, in)
        .writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingHeavyHitters.WordCount], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }

    writeSlice(0); run() // first delivery
    writeSlice(1); writeSlice(2); run() // stop + restart from checkpoint
    run() // restart with nothing new: no updates, same answer

    val got = StreamingHeavyHitters
      .topK(spark.read.parquet(out), K)
      .select(col("source"), col("word"), col("cnt"),
        col("rank").cast("int").as("rank"))
    val want = graft.SparkEntry.queries("hh1_heavy_hitters")(spark, dir)
      .select(col("source"), col("word"), col("cnt"),
        col("rank").cast("int").as("rank"))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0)
  }

  test("bounded-state sketch face ≡ hh1 batch top-K on the real corpus, across checkpoint stop/restart") {
    import spark.implicits._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("hhs-src"); val ck = tmp("hhs-ck"); val out = tmp("hhs-out")
    val width = 16384 // ample: min-over-4-rows resolves this vocabulary exactly
    val capacity = 64

    val words = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(graft.operators.TextOps.words(col("text"))).as("word"))
    def writeSlice(m: Int): Unit =
      words.filter(pmod(col("doc_id"), lit(3)) === m)
        .select(col("source"), col("word"))
        .coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val in = spark.readStream.schema("source STRING, word STRING")
        .parquet(src).as[StreamingHeavyHitters.SourceWord]
      val q = StreamingHeavyHitters.sketchCounts(spark, in, width, capacity)
        .writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingHeavyHitters.SketchEmit], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }

    writeSlice(0); run()
    writeSlice(1); writeSlice(2); run() // stop + restart from checkpoint

    val got = StreamingHeavyHitters
      .sketchTopK(spark.read.parquet(out), K)
      .select(col("source"), col("word"), col("est").as("cnt"),
        col("rank").cast("int").as("rank"))
    val want = graft.SparkEntry.queries("hh1_heavy_hitters")(spark, dir)
      .select(col("source"), col("word"), col("cnt"),
        col("rank").cast("int").as("rank"))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0)
  }

  test("starved sketch width: estimates stay one-sided (never under the true count)") {
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingHeavyHitters.SourceWord](spark)
    val occurrences = (1 to 30).flatMap(i =>
      Seq.fill(90 / i)(StreamingHeavyHitters.SourceWord("s", s"w$i")))
    val exact = occurrences.groupBy(_.word).view.mapValues(_.size.toLong).toMap
    val out = java.nio.file.Files.createTempDirectory("hhs-tiny").toString
    val q = StreamingHeavyHitters.sketchCounts(spark, input.toDS(), 16, 8)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingHeavyHitters.SketchEmit], _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .start()
    try {
      occurrences.grouped(120).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val finalEsts = StreamingHeavyHitters
      .sketchTopK(spark.read.parquet(out), 8)
      .collect().map(r => r.getString(1) -> r.getLong(2))
    assert(finalEsts.nonEmpty)
    finalEsts.foreach { case (w, est) =>
      assert(est >= exact(w), s"$w under-counted: $est < ${exact(w)}")
    }
  }

  test("redelivered SKETCH emissions are harmless: a replayed batch's duplicate candidate list cannot displace the true k-th entry") {
    import spark.implicits._
    // an append sink after a crash-replayed micro-batch holds the same
    // candidate list TWICE at the same (source, seq) — bit-identical,
    // because the state store rolls back to the pre-batch version.
    // Without dedup, row_number counts each duplicated word twice:
    // top-2 of (a:9, b:7, c:5) would read (a, a) and drop b.
    val emissions = Seq(
      ("s", "a", 9L, 3L), ("s", "b", 7L, 3L), ("s", "c", 5L, 3L),
      // the replay: identical rows, same seq
      ("s", "a", 9L, 3L), ("s", "b", 7L, 3L), ("s", "c", 5L, 3L),
      // an older seq that must not leak into the current view
      ("s", "a", 4L, 2L)).toDF("source", "word", "est", "seq")
    val top = StreamingHeavyHitters.sketchTopK(emissions, 2)
      .select(col("source"), col("word"), col("est"),
        col("rank").cast("int").as("rank"))
      .collect().map(_.toSeq).sortBy(_.mkString)
    assert(top.toSeq == Seq(
      Seq("s", "a", 9L, 1), Seq("s", "b", 7L, 2)))
  }

  test("redelivered updates are harmless: max(cnt) per key is the current count by monotonicity") {
    import spark.implicits._
    val updates = Seq(
      ("s", "a", 3L), ("s", "a", 7L), ("s", "a", 7L), // redelivery of the 7 update
      ("s", "b", 5L), ("t", "a", 1L)).toDF("source", "word", "cnt")
    val top = StreamingHeavyHitters.topK(updates, 1)
      .select(col("source"), col("word"), col("cnt")).collect()
      .map(_.toSeq).sortBy(_.mkString)
    assert(top.toSeq == Seq(Seq("s", "a", 7L), Seq("t", "a", 1L)))
  }
}
