package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: Morton-code correctness and the layout property
  * that buys data skipping — per-file min/max tight on EVERY clustered
  * column, not just the first sort key. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "zorder-test")

  test("zValue interleaves bits (known Morton codes)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit i of x -> position 2i; bit i of y -> position 2i+1
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)
    assert(rows((0L, 1L)) == 2L)
    assert(rows((1L, 1L)) == 3L)
    assert(rows((3L, 3L)) == 15L)
    // x=5 has bits 0,2 -> positions 0,4 = 17; y=2 has bit 1 -> position 3 = 8
    assert(rows((5L, 2L)) == 25L)
  }

  test("clustered write: per-file spread is small on BOTH dimensions") {
    import spark.implicits._
    val n = 4096
    // two independent uniform dimensions
    val df = (0 until n).map { i =>
      val x = (i * 2654435761L) % 1024
      val y = (i * 40503L) % 1024
      (x, y)
    }.toDF("x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.clusteredWrite(df, Seq("x", "y"), s"$dir/z", nFiles = 16)
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/rand")

    def avgSpread(path: String, c: String): Double = {
      val d = spark.read.parquet(path)
        .select(col(c), input_file_name().as("f"))
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("spread"))
      d.agg(avg("spread")).head().getDouble(0)
    }
    val zx = avgSpread(s"$dir/z", "x"); val zy = avgSpread(s"$dir/z", "y")
    val rx = avgSpread(s"$dir/rand", "x"); val ry = avgSpread(s"$dir/rand", "y")
    // random layout: each file spans ~the full 0..1023 range on both
    // dims; z-order: each of 16 files covers ~a quarter of each dim
    assert(zx < rx * 0.55, s"x spread $zx vs random $rx")
    assert(zy < ry * 0.55, s"y spread $zy vs random $ry")
  }

  test("z-ordered layout actually SKIPS row groups: scan emits far fewer rows") {
    import spark.implicits._
    val n = 4096
    val df = (0 until n).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024)
    }.toDF("x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("zskip").toString
    ZOrder.clusteredWrite(df, Seq("x", "y"), s"$dir/z", nFiles = 16)
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/rand")

    // rows the parquet reader actually surfaces (post row-group pruning,
    // pre Spark Filter); AQE off so the scan node is directly reachable
    def scanRows(path: String): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path)
          .filter(col("x").between(100, 160) && col("y").between(600, 660))
        q.collect()
        q.queryExecution.executedPlan.collectLeaves().map {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
          case _ => 0L
        }.sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val zRows = scanRows(s"$dir/z")
    val rRows = scanRows(s"$dir/rand")
    // random layout: every file's min/max spans the predicate -> no
    // row group skips, the scan surfaces ~all 4096 rows; z-order: only
    // the files whose hyper-rectangle intersects the 61x61 box read
    assert(rRows > (n * 9) / 10, s"random layout unexpectedly skipped: $rRows")
    assert(zRows < rRows / 2, s"z-order skipped too little: $zRows vs $rRows")
  }

  test("zValue fails loudly on negative inputs; zValueScaled on empty/all-null input") {
    import spark.implicits._
    val neg = Seq((-1L, 2L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
    val e = intercept[Exception] { neg.collect() }
    assert(e.getMessage != null)
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    intercept[IllegalArgumentException] { ZOrder.zValueScaled(empty, Seq("x", "y")) }
    val allNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] { ZOrder.zValueScaled(allNull, Seq("x", "y")) }
    assert(e2.getMessage.contains("y"))
  }
}
