package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The null-bucket-split decomposition must equal the `<=>` join
  * row-for-row WITH multiplicities — on null-heavy sides, duplicate
  * keys on both sides (pair-count blow-ups), one-side-empty null
  * buckets, and all-null frames — while the physical plan keeps the
  * null leg a broadcast product over the left rows instead of one
  * hash task holding every null-key row of both sides.
  */
class NullSafeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "null-safe-join")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def assertEqualsNullSafeJoin(l: DataFrame, r: DataFrame): Unit = {
    val got = NullSafeJoin.join(l, r, "k", "k2")
    val want = l.join(r, col("k") <=> col("k2"))
    assert(sortedRows(got) == sortedRows(want))
  }

  /** ~30% nulls, duplicate keys on both sides: every 3rd left key and
    * every 4th right key is null; values collide mod 5 so value keys
    * carry multiplicities too. */
  private def heavy: (DataFrame, DataFrame) = {
    import spark.implicits._
    val l = (0 until 90).map(i =>
      (if (i % 3 == 0) None else Some((i % 5).toLong), s"l$i"))
      .toDF("k", "lv")
    val r = (0 until 60).map(i =>
      (if (i % 4 == 0) None else Some((i % 5).toLong), s"r$i"))
      .toDF("k2", "rv")
    (l, r)
  }

  test("null-heavy duplicate-key frames: decomposition equals <=> with multiplicities") {
    val (l, r) = heavy
    assertEqualsNullSafeJoin(l, r)
    // sanity that the shape is adversarial: the null bucket really
    // cross-products (30 left nulls × 15 right nulls = 450 pairs)
    val nullPairs = NullSafeJoin.join(l, r, "k", "k2")
      .filter(col("k").isNull).count()
    assert(nullPairs == 30L * 15L)
  }

  test("empty null bucket on one side: null leg contributes nothing, value leg intact") {
    import spark.implicits._
    val l = Seq((Some(1L), "a"), (None, "b"), (None, "c")).toDF("k", "lv")
    val rNoNulls = Seq((Some(1L), "x"), (Some(2L), "y")).toDF("k2", "rv")
    assertEqualsNullSafeJoin(l, rNoNulls)
    assert(NullSafeJoin.join(l, rNoNulls, "k", "k2").count() == 1)
    // and the mirror: left has no nulls
    assertEqualsNullSafeJoin(rNoNulls.toDF("k", "lv"), l.toDF("k2", "rv"))
  }

  test("all-null × all-null is the pure cross product (the semantics, loudly)") {
    import spark.implicits._
    val l = Seq.fill(7)(Option.empty[Long]).zipWithIndex
      .map { case (k, i) => (k, s"l$i") }.toDF("k", "lv")
    val r = Seq.fill(5)(Option.empty[Long]).zipWithIndex
      .map { case (k, i) => (k, s"r$i") }.toDF("k2", "rv")
    assertEqualsNullSafeJoin(l, r)
    assert(NullSafeJoin.join(l, r, "k", "k2").count() == 35)
  }

  test("plan: value leg is a keyed equi-join, null leg a broadcast product — never one null hash task") {
    // parquet-backed so the leg filters survive into the plan (a
    // LocalTableScan evaluates them at optimize time and hides them)
    val (l0, r0) = heavy
    val tmp = java.nio.file.Files.createTempDirectory("nsj").toString
    l0.write.mode("overwrite").parquet(s"$tmp/l")
    r0.write.mode("overwrite").parquet(s"$tmp/r")
    val (l, r) = (spark.read.parquet(s"$tmp/l"), spark.read.parquet(s"$tmp/r"))
    val p = NullSafeJoin.join(l, r, "k", "k2")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // null leg: broadcast nested loop (right null bucket broadcast)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // value leg: a real equi-join on the not-null keys
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
    // both legs filter nulls out before joining — the <=> single-key
    // form would show neither filter
    assert(p.contains("isnotnull(k"), p)
    assert(p.contains("isnull(k"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("identical key names are refused up front") {
    import spark.implicits._
    val d = Seq((Some(1L), "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      NullSafeJoin.join(d, d.toDF("k", "w"), "k", "k")
    }
  }

  test("oversized right null bucket fails LOUDLY with the flip named — never a broadcast OOM (r13 enforced contract)") {
    val (l, r) = heavy // 15 right nulls
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception] {
      NullSafeJoin.join(l, r, "k", "k2", maxBroadcastNulls = 10).collect()
    }
    assert(msgChain(e).contains("null bucket"), msgChain(e))
    assert(msgChain(e).contains("broadcastNulls"), msgChain(e))
    // a bound the bucket fits passes untouched
    assert(NullSafeJoin.join(l, r, "k", "k2", maxBroadcastNulls = 15)
      .count() == NullSafeJoin.join(l, r, "k", "k2").count())
  }

  test("broadcastNulls = false: partition-pairwise cartesian null leg, same rows with multiplicities") {
    val (l, r) = heavy
    val got = NullSafeJoin.join(l, r, "k", "k2", broadcastNulls = false)
    val want = l.join(r, col("k") <=> col("k2"))
    assert(sortedRows(got) == sortedRows(want))
    // and the guard is genuinely out of the path: a 1-row bound that
    // would refuse the broadcast leg doesn't trip here
    assert(NullSafeJoin.join(l, r, "k", "k2", broadcastNulls = false,
      maxBroadcastNulls = 1).count() == want.count())
  }
}
