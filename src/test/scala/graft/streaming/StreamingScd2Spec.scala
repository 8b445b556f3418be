package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** Streaming SCD2: a change stream maintained via per-micro-batch
  * scd2Apply equals the batch rebuild of the full log row-for-row, and
  * batch redelivery (restart semantics) is idempotent. */
@org.scalatest.tags.Slow
class StreamingScd2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-scd2")

  private def snap(df: org.apache.spark.sql.DataFrame) = df
    .select("k", "seq", "status", "valid_from", "valid_to", "is_current")
    .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
      r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5)))
    .sortBy(t => (t._1, t._2)).toSeq

  // ordered change log: per key, seq strictly increases across batches
  private val log = Seq(
    // batch 1
    (7L, 1, "A"), (7L, 2, "A"), (9L, 1, "X"),
    // batch 2: no-op for 9, change + new key
    (7L, 3, "B"), (9L, 4, "X"), (5L, 3, "N"),
    // batch 3: close 5's version, key 9 finally changes
    (5L, 6, "M"), (9L, 7, "Y"))
  private val batches = Seq(log.take(3), log.slice(3, 6), log.drop(6))

  test("two+ batch stream ≡ batch rebuild row-for-row") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("scd2-stream").toString + "/dim"
    val input = MemoryStream[(Long, Int, String)](spark)
    val q = StreamingScd2.applyStream(
      input.toDF().toDF("k", "seq", "status"),
      Seq("k"), Seq("status"), Seq("seq"), dimDir).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val want = Upsert.scd2History(
      log.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
    assert(snap(StreamingScd2.readDim(spark, dimDir)) == snap(want))
  }

  test("redelivered micro-batch (restart) leaves the dimension unchanged") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("scd2-replay").toString + "/dim"
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingScd2.applyBatch(b.toDF("k", "seq", "status"), i.toLong,
        Seq("k"), Seq("status"), Seq("seq"), dimDir)
    }
    val before = snap(StreamingScd2.readDim(spark, dimDir))
    // restart redelivers the LAST batch with the same id — recompute
    // must read the same prior snapshot and overwrite identical bytes
    StreamingScd2.applyBatch(batches.last.toDF("k", "seq", "status"),
      (batches.size - 1).toLong, Seq("k"), Seq("status"), Seq("seq"), dimDir)
    assert(snap(StreamingScd2.readDim(spark, dimDir)) == before)
    assert(before == snap(Upsert.scd2History(
      log.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))))
  }

  test("randomized differential: random logs, random cuts, random redeliveries ≡ batch rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    for (trial <- 1 to 2) {
      val dimDir = java.nio.file.Files
        .createTempDirectory(s"scd2-rand$trial").toString + "/dim"
      val n = 50 + rnd.nextInt(40)
      // seq globally increasing → any range cut respects per-key order
      val rows = (1 to n).map { i =>
        val k = 1L + rnd.nextInt(6)
        val st = if (rnd.nextInt(7) == 0) None
          else Some(Seq("A", "B", "C")(rnd.nextInt(3)))
        (k, i, st)
      }
      val nCuts = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, n) ++ (1 to nCuts).map(_ => rnd.nextInt(n))).distinct.sorted
      val bs = cuts.sliding(2).toSeq
        .map { case Seq(a, b) => rows.filter(r => r._2 > a && r._2 <= b) }
      bs.zipWithIndex.foreach { case (b, i) =>
        StreamingScd2.applyBatch(b.toDF("k", "seq", "status"), i.toLong,
          Seq("k"), Seq("status"), Seq("seq"), dimDir)
        // at-least-once upstream: sometimes redeliver the same batch id
        if (rnd.nextBoolean())
          StreamingScd2.applyBatch(b.toDF("k", "seq", "status"), i.toLong,
            Seq("k"), Seq("status"), Seq("seq"), dimDir)
      }
      val want = Upsert.scd2History(
        rows.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
      assert(snap(StreamingScd2.readDim(spark, dimDir)) == snap(want),
        s"trial $trial (n=$n, cuts=$cuts)")
    }
  }

  test("stream-maintained dimension serves point-in-time lookups ≡ the batch-built dimension") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dimDir = java.nio.file.Files.createTempDirectory("scd2-look").toString + "/dim"
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingScd2.applyBatch(b.toDF("k", "seq", "status"), i.toLong,
        Seq("k"), Seq("status"), Seq("seq"), dimDir)
    }
    val facts = Seq((7L, 1L, 2), (7L, 2L, 6), (9L, 3L, 8), (5L, 4L, 4))
      .toDF("k", "fact_id", "ts")
    def looked(dim: org.apache.spark.sql.DataFrame) =
      Upsert.scd2Lookup(dim, facts, Seq("k"), "ts")
        .select(col("fact_id"), col("v_status"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1))))
        .sortBy(_._1).toSeq
    val streamDim = StreamingScd2.readDim(spark, dimDir)
    val batchDim = Upsert.scd2History(
      log.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
    assert(looked(streamDim) == looked(batchDim))
  }

  test("empty micro-batch is a no-op and later batches still chain") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("scd2-empty").toString + "/dim"
    StreamingScd2.applyBatch(batches.head.toDF("k", "seq", "status"), 0L,
      Seq("k"), Seq("status"), Seq("seq"), dimDir)
    assert(StreamingScd2.applyBatch(
      batches.head.toDF("k", "seq", "status").limit(0), 1L,
      Seq("k"), Seq("status"), Seq("seq"), dimDir) == -1L)
    StreamingScd2.applyBatch(batches(1).toDF("k", "seq", "status"), 2L,
      Seq("k"), Seq("status"), Seq("seq"), dimDir)
    val want = Upsert.scd2History(
      (batches.head ++ batches(1)).toDF("k", "seq", "status"),
      Seq("k"), Seq("status"), Seq("seq"))
    assert(snap(StreamingScd2.readDim(spark, dimDir)) == snap(want))
  }
}
