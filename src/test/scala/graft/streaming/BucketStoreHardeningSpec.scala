package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening of the manifest-linked upsert store:
  *
  *  - a REDELIVERED batch's first write drops the stale `_SUCCESS`
  *    marker before rewriting anything, so a crash mid-rewrite reads
  *    as uncommitted and recovery falls back to the previous committed
  *    id (the r15 layout rewrote under a live marker);
  *  - [[BucketStore.gc]] retains every committed id at or above
  *    max(keepIds) — an out-of-band compaction committed above the
  *    stream's current id survives the next fold's keep-two window;
  *  - IN-FOLD AUTO-COMPACTION: when a write would leave more than
  *    `maxLinks` distinct pointed batch directories, the fold absorbs
  *    the untouched live buckets into its own batch dir — the link
  *    fan-out (and with it a full read's scan-union width) stays
  *    bounded across arbitrarily many folds, with identical reads;
  *  - a family whose every row has been legitimately deleted reads as
  *    an EMPTY frame (schema spoken by the first write's stub), not a
  *    refusal — only never-written families raise.
  */
@org.scalatest.tags.Slow
class BucketStoreHardeningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "bucket-hardening")
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def rowsDf(rows: Seq[(Long, Long)], storeBuckets: Int) =
    rows.toDF("k", "v").withColumn("__g_bucket",
      BucketStore.bucketize(Seq("k"), storeBuckets))

  private def ls(p: String): Seq[String] = {
    val f = new java.io.File(p)
    if (!f.exists) Nil else f.listFiles().map(_.getName).toSeq.sorted
  }

  test("redelivered batch's first write drops the stale marker; recovery falls back until re-commit") {
    val dir = tmp("bs-redeliver")
    val sb = 16
    def touched(rows: Seq[(Long, Long)]) =
      BucketStore.bucketsOf(rows.toDF("k", "v"), Seq("k"), sb)
    val b0 = Seq((1L, 10L), (2L, 20L))
    BucketStore.upsert(spark, dir, "f", 0L, None, rowsDf(b0, sb), touched(b0))
    BucketStore.commit(spark, dir, "f", 0L)
    val b1 = Seq((1L, 11L))
    BucketStore.upsert(spark, dir, "f", 1L, Some(0L), rowsDf(b1, sb), touched(b1))
    BucketStore.commit(spark, dir, "f", 1L)
    assert(BucketStore.committedIn(spark, dir, "f") == Set(0L, 1L))
    // crash AFTER commit, foreachBatch redelivers id 1: its first
    // write must de-commit the id before rewriting — a crash between
    // here and the re-commit now reads batch 0 as latest committed
    BucketStore.upsert(spark, dir, "f", 1L, Some(0L), rowsDf(b1, sb), touched(b1))
    assert(BucketStore.committedIn(spark, dir, "f") == Set(0L),
      "stale marker must be gone until the redelivered batch re-commits")
    val atPrev = BucketStore.readAllNonEmpty(spark, dir, "f", 0L)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(atPrev == b0.toSet)
    // the redelivery completes: identical state, marker restored
    BucketStore.commit(spark, dir, "f", 1L)
    val after = BucketStore.readAllNonEmpty(spark, dir, "f", 1L)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(after == Set((1L, 11L), (2L, 20L)))
  }

  test("gc keeps committed ids above keepIds.max (out-of-band compaction survives a lower fold's keep-two window)") {
    val dir = tmp("bs-gc-high")
    val sb = 16
    def fold(id: Long, prev: Option[Long], rows: Seq[(Long, Long)]): Unit = {
      BucketStore.upsert(spark, dir, "f", id, prev, rowsDf(rows, sb),
        BucketStore.bucketsOf(rows.toDF("k", "v"), Seq("k"), sb))
      BucketStore.commit(spark, dir, "f", id)
    }
    fold(0L, None, Seq((1L, 10L)))
    fold(1L, Some(0L), Seq((2L, 20L)))
    BucketStore.compactAll(spark, dir, Seq("f"), 5L)
    assert(ls(s"$dir/f").contains("batch=5"))
    // a fold at a LOWER id (the stream's checkpoint counter) now GCs
    // with its own keep-two window — the committed compaction at 5
    // must survive it
    BucketStore.gc(spark, dir, "f", Seq(0L, 1L))
    assert(ls(s"$dir/f").contains("batch=5"),
      "gc deleted a committed id above keepIds.max")
    val at5 = BucketStore.readAllNonEmpty(spark, dir, "f", 5L)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(at5 == Set((1L, 10L), (2L, 20L)))
    // ...and compacting BELOW an existing committed id refuses loudly
    val e = intercept[IllegalArgumentException](
      BucketStore.compactAll(spark, dir, Seq("f"), 3L))
    assert(e.getMessage.contains("below an already-committed"))
  }

  test("in-fold auto-compaction bounds the manifest link fan-out across 40 folds; reads identical throughout") {
    val dir = tmp("bs-autocompact")
    val sb = 64
    val maxLinks = 8
    var prev: Option[Long] = None
    // model the store per BUCKET: an upsert's rows are the POST-state
    // of the touched buckets, so a hash-collision fold REPLACES that
    // bucket's prior content
    val byBucket = scala.collection.mutable.Map[Int, Set[(Long, Long)]]()
    var maxFan = 0
    var maxDirs = 0
    (0 until 40).foreach { i =>
      // each fold touches one (hash-assigned) bucket — without
      // absorption the fan-out (and a full read's scan-union width)
      // would grow with the fold count
      val rows = Seq((i.toLong, i.toLong))
      val id = i.toLong
      val touched =
        BucketStore.bucketsOf(rows.toDF("k", "v"), Seq("k"), sb)
      BucketStore.upsert(spark, dir, "f", id, prev, rowsDf(rows, sb),
        touched, maxLinks = maxLinks)
      BucketStore.commit(spark, dir, "f", id)
      BucketStore.gc(spark, dir, "f", prev.toSeq :+ id)
      byBucket(touched.head) = rows.toSet
      val expected = byBucket.values.flatten.toSet
      val fan = BucketStore.readManifest(spark, dir, "f", Some(id))
        .values.toSet.size
      maxFan = math.max(maxFan, fan)
      maxDirs = math.max(maxDirs,
        ls(s"$dir/f").count(_.startsWith("batch=")))
      val got = BucketStore.readAllNonEmpty(spark, dir, "f", id)
        .select("k", "v").as[(Long, Long)].collect().toSet
      assert(got == expected, s"fold $i")
      prev = Some(id)
    }
    assert(maxFan <= maxLinks, s"fan-out reached $maxFan > $maxLinks")
    assert(maxFan >= 2, "absorption fired so early the bound was never exercised")
    // GC keeps only what the last two manifests reach — bounded dirs
    assert(maxDirs <= 2 * maxLinks + 2, s"live batch dirs reached $maxDirs")
  }

  test("a committed family whose every row was deleted reads as an empty frame; never-written still raises") {
    val dir = tmp("ivm-all-deleted") + "/agg"
    import org.apache.spark.sql.DataFrame
    def fold(id: Long, rows: Seq[(String, String, Double)]): Long =
      StreamingIvm.applyBatch(rows.toDF("g", "op", "v"), id,
        Seq("g"), "op", "v", dir)
    fold(0L, Seq(("a", "I", 1.0), ("a", "I", 2.0)))
    fold(1L, Seq(("a", "D", 1.0), ("a", "D", 2.0)))
    val agg: DataFrame = StreamingIvm.readAgg(spark, dir)
    assert(agg.count() == 0L)
    assert(Seq("g", "n", "s").forall(agg.columns.contains), agg.columns.toSeq)
    // a later insert folds normally against the empty state
    fold(2L, Seq(("b", "I", 5.0)))
    val back = StreamingIvm.readAgg(spark, dir)
      .select(col("g"), col("n")).as[(String, Long)].collect().toSeq
    assert(back == Seq(("b", 1L)))
    // never-written: still a loud refusal
    intercept[IllegalArgumentException](
      StreamingIvm.readAgg(spark, tmp("ivm-never") + "/agg"))
  }
}
