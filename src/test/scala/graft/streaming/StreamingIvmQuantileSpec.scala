package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quantile IVM: readPercentiles over the maintained counts
  * + bucket-keyed rows equals the sort-based PERCENTILE_CONT recompute
  * over surviving delivered rows after every micro-batch, bit-for-bit,
  * across checkpoint stop/restart; the fold is a pure counts merge
  * (no store read), and malformed deltas fail loudly before anything
  * commits. */
@org.scalatest.tags.Slow
class StreamingIvmQuantileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-ivm5")
  import spark.implicits._

  private val Lo = 0.0; private val Hi = 100.0; private val B = 16
  private val Ps = Seq(0.25, 0.5, 0.9)

  // (key, group, op, value)
  private val batches = Seq(
    Seq((1L, "a", "I", 10.0), (2L, "a", "I", 40.0), (3L, "a", "I", 70.0),
      (4L, "b", "I", 5.0), (5L, "b", "I", 95.0)),
    Seq((2L, "a", "D", 40.0), (6L, "a", "I", 41.5), (7L, "a", "I", 12.5)),
    Seq((4L, "b", "D", 5.0), (5L, "b", "D", 95.0), (8L, "c", "I", 33.0)))

  private def surviving(n: Int): Seq[(Long, String, Double)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    batches.take(n + 1).flatten.foreach {
      case (k, g, "I", v) => rows += ((k, g, v))
      case (k, g, "D", v) =>
        val i = rows.indexOf((k, g, v)); require(i >= 0); rows.remove(i)
    }
    rows.toSeq
  }

  private def recompute(n: Int): Seq[(String, Double, Double)] = {
    val after = surviving(n).toDF("k", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    collect(after
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .withColumn("p", explode(array(Ps.map(lit): _*)))
      .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", floor(col("idx")).cast("long") + 1)
      .withColumn("hi", least(col("lo") + 1, col("n")))
      .filter(col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(col("g"), col("p"))
      .agg(max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"),
        max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
      .select(col("g"), col("p"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("value")))
  }

  private def collect(df: DataFrame): Seq[(String, Double, Double)] =
    df.select(col("g"), col("p"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def read(dir: String): Seq[(String, Double, Double)] =
    collect(StreamingIvmQuantile.readPercentiles(spark, dir,
      Seq("g"), "v", Ps, Lo, Hi, B))

  private def apply(b: Seq[(Long, String, String, Double)], id: Long,
      dir: String): Long =
    StreamingIvmQuantile.applyBatch(b.toDF("k", "g", "op", "v"), id,
      "k", Seq("g"), "op", "v", dir, Lo, Hi, B)

  test("maintained ≡ sort-based PERCENTILE_CONT after every batch — deletes included, no store read in the fold") {
    val dir = java.nio.file.Files.createTempDirectory("ivm5").toString
    val got = scala.collection.mutable.Map[Long, Seq[(String, Double, Double)]]()
    val input = MemoryStream[(Long, String, String, Double)](spark)
    val q = StreamingIvmQuantile.applyStream(
        input.toDF().toDF("k", "g", "op", "v"), "k", Seq("g"), "op", "v",
        dir, Lo, Hi, B, (id, _) => got(id) = read(dir))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    (0 to 2).foreach(i => assert(got(i) == recompute(i), s"batch $i"))
    // group b vanished in batch 2; c arrived
    assert(!got(2).exists(_._1 == "b"))
    assert(got(2).exists(_._1 == "c"))
  }

  test("redelivered batch folds to identical state") {
    val dir = java.nio.file.Files.createTempDirectory("ivm5-redeliver").toString
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
    val src = tmp("ivm5-src"); val ck = tmp("ivm5-ck"); val dir = tmp("ivm5-durable")
    def writeDelta(rows: Seq[(Long, String, String, Double)]): Unit =
      rows.toDF("k", "g", "op", "v").coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val in = spark.readStream
        .schema("k BIGINT, g STRING, op STRING, v DOUBLE").parquet(src)
      val q = StreamingIvmQuantile.applyStream(in, "k", Seq("g"), "op", "v",
          dir, Lo, Hi, B)
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

  test("malformed deltas fail loudly BEFORE anything commits") {
    val dir = java.nio.file.Files.createTempDirectory("ivm5-bad").toString
    val e1 = intercept[IllegalArgumentException](apply(
      Seq((1L, "a", "U", 1.0)), 0L, dir))
    assert(e1.getMessage.contains("outside {I, D}"))
    assert(!StreamingIvmQuantile.hasCommitted(spark, dir))
    apply(batches(0), 0L, dir)
    val e2 = intercept[IllegalArgumentException](apply(
      Seq((99L, "a", "D", 10.0)), 1L, dir))
    assert(e2.getMessage.contains("never held"))
    // out-of-domain value: the fold's bucket raise fires inside the
    // counts write, before the snapshot could commit
    val e3 = intercept[Exception](apply(
      Seq((9L, "a", "I", 250.0)), 1L, dir))
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain(e3).contains("declared domain"), chain(e3))
    assert(read(dir) == recompute(0))
  }
}
