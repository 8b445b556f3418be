package graft.validate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingIvm, StreamingIvmQuantile}

/** Round 16 — INCREMENTAL validation ≡ full-scan validation on a CDC
  * sequence: the reference's audit-gate shape re-aggregates the whole
  * table per run (validation_dag.py:178-216); the engine instead
  * maintains the aggregate as an IVM view (delta-proportional folds,
  * BucketStore storage) and the validators read the VIEW —
  * [[Uniqueness.checkCounts]] against the maintained per-key counts,
  * [[DistributionValidator.validateProfiled]] against the maintained
  * quantile profile. Every batch: maintained answer ≡ the full-scan
  * answer, bit-for-bit. */
class IncrementalValidationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "inc-validate")
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("Uniqueness.checkCounts ≡ check on a static table (dup, null, composite keys)") {
    val duped = Seq(Some(1L), Some(2L), Some(2L), Some(2L), None, None)
      .toDF("k")
    val counts = duped.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val full = Uniqueness.check(Seq(Uniqueness.Key("pk", duped, Seq("k"))))
    val inc = Uniqueness.checkCounts(Seq(
      Uniqueness.KeyCounts("pk", counts, Seq("k"), "n")))
    assert(sorted(inc) == sorted(full))
    // and the numbers are the intended ones
    val r = inc.head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == (6L, 2L, 1L, 2L, 3L))
  }

  test("uniqueness audit over a MAINTAINED counts view ≡ full-table check after every CDC batch") {
    val dir = tmp("inc-uniq") + "/agg"
    // (k, op, v): batch 1 double-loads k=5 (the changelog-without-dedup
    // bug this audit exists to catch); batch 2 repairs one copy and
    // deletes k=2 outright
    val batches: Seq[Seq[(Long, String, Double)]] = Seq(
      Seq((1L, "I", 1.0), (2L, "I", 2.0), (3L, "I", 3.0)),
      Seq((5L, "I", 5.0), (5L, "I", 5.5), (4L, "I", 4.0)),
      Seq((5L, "D", 5.5), (2L, "D", 2.0)))
    val live = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    batches.zipWithIndex.foreach { case (rows, i) =>
      StreamingIvm.applyBatch(rows.toDF("k", "op", "v"), i.toLong,
        Seq("k"), "op", "v", dir)
      rows.foreach {
        case (k, "I", v) => live += ((k, v))
        case (k, _, v) => val j = live.indexOf((k, v)); require(j >= 0)
          live.remove(j)
      }
      val table = live.toSeq.toDF("k", "v")
      val full = Uniqueness.check(Seq(
        Uniqueness.Key("pk", table, Seq("k"))))
      // the maintained view: one row per surviving key, multiplicity n
      // — aggregate-sized read, delta-proportional maintenance
      val view = StreamingIvm.readAgg(spark, dir)
      val inc = Uniqueness.checkCounts(Seq(
        Uniqueness.KeyCounts("pk", view, Seq("k"), "n")))
      assert(sorted(inc) == sorted(full), s"batch $i")
    }
    // the audit actually SAW the double-load: batch 1's state had a
    // duplicate key (checked via the final repaired state being clean)
    val finalRow = Uniqueness.checkCounts(Seq(Uniqueness.KeyCounts("pk",
      StreamingIvm.readAgg(spark, dir), Seq("k"), "n"))).head()
    assert(finalRow.getLong(3) == 0L && finalRow.getLong(5) == 1L)
  }

  test("distribution audit over a MAINTAINED quantile view ≡ full-scan validate after every CDC batch — and drift still fails identically") {
    val dir = tmp("inc-dist")
    val (lo, hi, buckets) = (0.0, 1000.0, 32)
    val ps = Seq(0.1, 0.5, 0.9)
    // wide target rows (id, price, qty); the maintained view folds the
    // STACKED (column_name, v) CDC form, each occurrence pk-keyed
    def stacked(rows: Seq[(Long, String, Double, Double)]): DataFrame =
      rows.flatMap { case (id, op, price, qty) =>
        Seq((id * 2, "price", op, price), (id * 2 + 1, "qty", op, qty))
      }.toDF("rid", "column_name", "op", "v")
    val batches: Seq[Seq[(Long, String, Double, Double)]] = Seq(
      (0L until 40L).map(i => (i, "I", 10.0 + i * 7.0, 1.0 + (i % 9))),
      // reprice a slice (D+I) and delete a few rows outright
      (10L until 15L).map(i => (i, "D", 10.0 + i * 7.0, 1.0 + (i % 9))) ++
        (10L until 15L).map(i =>
          (i + 100, "I", 500.0 + i, 1.0 + (i % 9))) ++
        (30L until 33L).map(i => (i, "D", 10.0 + i * 7.0, 1.0 + (i % 9))))
    val live = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    batches.zipWithIndex.foreach { case (rows, i) =>
      StreamingIvmQuantile.applyBatch(stacked(rows), i.toLong, "rid",
        Seq("column_name"), "op", "v", dir, lo, hi, buckets)
      rows.foreach {
        case (id, "I", p, q) => live += ((id, p, q))
        case (id, _, p, q) => val j = live.indexOf((id, p, q)); require(j >= 0)
          live.remove(j)
      }
      val target = live.toSeq.toDF("id", "price", "qty")
      // migration shape: source is the system of record being compared
      val source = target
      val full = DistributionValidator.validate(source, target,
        Seq("price", "qty"), ps, bucketLocate = Some(false))
      val profile = StreamingIvmQuantile.readPercentiles(spark, dir,
        Seq("column_name"), "v", ps, lo, hi, buckets)
      val inc = DistributionValidator.validateProfiled(source, profile,
        Seq("price", "qty"), ps)
      assert(sorted(inc) == sorted(full), s"batch $i")
      assert(inc.filter(col("validation_status") =!= "pass").count() == 0,
        s"batch $i")
    }
    // drift: a clipped-tail source must fail IDENTICALLY through both
    // paths (same rows, same statuses — the maintained profile is the
    // target side, so the comparison semantics are shared code)
    val target = live.toSeq.toDF("id", "price", "qty")
    val clipped = target.filter(col("price") < 400.0)
    val fullDrift = DistributionValidator.validate(clipped, target,
      Seq("price", "qty"), ps, bucketLocate = Some(false))
    val incDrift = DistributionValidator.validateProfiled(clipped,
      StreamingIvmQuantile.readPercentiles(spark, dir,
        Seq("column_name"), "v", ps, lo, hi, buckets),
      Seq("price", "qty"), ps)
    assert(sorted(incDrift) == sorted(fullDrift))
    assert(incDrift.filter(col("column_name") === "price" &&
      col("validation_status") === "fail").count() > 0)
  }
}
