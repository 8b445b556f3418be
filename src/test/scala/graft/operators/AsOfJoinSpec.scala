package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "asof-test")

  test("latest right at-or-before each left ts, per key; unmatched stays null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 4L, "l4"),
      (2L, 15L, "l15")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 99L, "r99")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "rv").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(out == Set(
      (1L, 10L, Some("r5")),   // latest before 10 is 5
      (1L, 20L, Some("r20")),  // equality matches
      (1L, 4L, None),          // nothing at or before 4
      (2L, 15L, None)))        // 99 is in the future
  }

  test("duplicate left timestamps each get the same match") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x"), (1L, 10L, "y")).toDF("k", "t", "lv")
    val right = Seq((1L, 9L, "r")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("lv", "rv").as[(String, String)].collect().toSet
    assert(out == Set(("x", "r"), ("y", "r")))
  }

  test("RangeJoin: exact-delta boundary pairs included, beyond excluded") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val l = Seq((1L, ts(10000), "L")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, ts(10000 - 1800), "at_delta"),   // exactly delta away -> in
      (1L, ts(10000 + 1800), "at_delta2"),  // exactly delta ahead -> in
      (1L, ts(10000 - 1801), "beyond"),     // 1s past -> out
      (2L, ts(10000), "wrong_key")).toDF("k", "rt", "rv")
    val out = RangeJoin.banded(l, r, Seq("k"), "t", "rt", 1800L)
      .select("rv").as[String].collect().toSet
    assert(out == Set("at_delta", "at_delta2"))
  }

  test("carries multiple right columns and preserves left payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, "keep")).toDF("k", "t", "payload")
    val right = Seq((1L, 3L, "a", 30), (1L, 7L, "b", 70)).toDF("k", "rt", "rv", "rn")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv", "rn")).head()
    assert(row.getAs[String]("payload") == "keep")
    assert(row.getAs[String]("rv") == "b" && row.getAs[Int]("rn") == 70)
  }

  test("intervalOverlap vs brute force on random intervals (multi-bucket spans dedup to one row)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val mk = (n: Int, tag: String) => (1 to n).map { i =>
        val s = rnd.nextInt(60).toLong
        (s"$tag$i", 1L + rnd.nextInt(3), s, s + rnd.nextInt(25)) // spans many 7-wide buckets
      }
      val ls = mk(25, "L"); val rs = mk(25, "R")
      val got = RangeJoin.intervalOverlap(
          ls.toDF("lid", "k", "ls", "le"), rs.toDF("rid", "k", "rs", "re"),
          Seq("k"), "ls", "le", "rs", "re", bucketWidth = 7L)
        .select("lid", "rid").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val want = for {
        (lid, lk, s1, e1) <- ls; (rid, rk, s2, e2) <- rs
        if lk == rk && s1 <= e2 && s2 <= e1
      } yield (lid, rid)
      // exact set AND exact multiplicity (no duplicate pair rows)
      assert(got.length == got.toSet.size, s"trial $trial: duplicate pair rows")
      assert(got.toSet == want.toSet, s"trial $trial")
    }
  }

  test("intervalOverlap: inverted (empty) intervals overlap nothing") {
    import spark.implicits._
    val l = Seq(("a", 1L, 10L, 3L)).toDF("lid", "k", "ls", "le") // [10,3] = ∅
    val r = Seq(("b", 1L, 2L, 12L)).toDF("rid", "k", "rs", "re")
    assert(RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", 7L)
      .count() == 0)
    assert(RangeJoin.intervalOverlap(r, l, Seq("k"), "rs", "re", "ls", "le", 7L)
      .count() == 0)
  }

  test("intervalOverlap: coordinates past 2^53 bin exactly (nanosecond-epoch regime)") {
    import spark.implicits._
    // consecutive longs above 2^53 are indistinguishable as doubles —
    // the old `Column./` binning put a pair's explode bin and its
    // first-shared-bin dedup filter on different sides of the rounding,
    // silently dropping or duplicating pairs. Exact integer floor-div
    // must keep brute-force parity up here.
    val base = (1L << 60) + 12345L // ~1.15e18, epoch-nanos territory
    val ls = Seq(("L1", 1L, base, base + 10L), ("L2", 1L, base + 100L, base + 120L),
      ("L3", 1L, base - 50L, base + 5L))
    val rs = Seq(("R1", 1L, base + 3L, base + 7L), ("R2", 1L, base + 119L, base + 200L),
      ("R3", 1L, base + 30L, base + 40L))
    val got = RangeJoin.intervalOverlap(
        ls.toDF("lid", "k", "ls", "le"), rs.toDF("rid", "k", "rs", "re"),
        Seq("k"), "ls", "le", "rs", "re", bucketWidth = 7L)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    val want = for {
      (lid, lk, s1, e1) <- ls; (rid, rk, s2, e2) <- rs
      if lk == rk && s1 <= e2 && s2 <= e1
    } yield (lid, rid)
    assert(got.length == got.toSet.size, "duplicate pair rows past 2^53")
    assert(got.toSet == want.toSet)
  }

  test("intervalOverlap: derived bucketWidth matches explicit-width results and bounds the explosion both ways") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // adversarial mix: 90% short intervals (len ≤ 4), 10% hundredfold
    // outliers — a caller guessing W from the outliers cross-products
    // the shorts; guessing from the shorts explodes the outliers
    val mk = (n: Int, tag: String) => (1 to n).map { i =>
      val s = rnd.nextInt(2000).toLong
      val len = if (i % 10 == 0) 300L + rnd.nextInt(200) else rnd.nextInt(4).toLong
      (s"$tag$i", 1L + rnd.nextInt(2), s, s + len)
    }
    val ls = mk(60, "L"); val rs = mk(60, "R")
    val lDf = ls.toDF("lid", "k", "ls", "le"); val rDf = rs.toDF("rid", "k", "rs", "re")
    val auto = RangeJoin.intervalOverlap(lDf, rDf, Seq("k"), "ls", "le", "rs", "re")
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    val want = (for {
      (lid, lk, s1, e1) <- ls; (rid, rk, s2, e2) <- rs
      if lk == rk && s1 <= e2 && s2 <= e1
    } yield (lid, rid)).toSet
    assert(auto.length == auto.toSet.size && auto.toSet == want)
    // bounded expansion BOTH ways. Too-wide guard: the derived width
    // tracks the TYPICAL interval (p75 ≤ the short lengths), not the
    // outliers — the mean here is ~40, which would pack every short
    // interval into shared bins and cross-product them per bin.
    val lens = (ls ++ rs).map(t => t._4 - t._3 + 1).sorted
    val p75 = lens((lens.size * 3) / 4 - 1)
    assert(p75 <= 4, s"derived width $p75 got dragged up by the length outliers")
    // too-narrow guard: total bins obey the coverage model — ≤ 2 bins
    // per row plus each interval's true length/W coverage (an outlier
    // legitimately pays bins proportional to the time it spans; what
    // must NEVER happen is bins beyond that, i.e. a sub-W bin width)
    val bins = (ls ++ rs).map(t => (t._4 - t._3) / p75 + 1).sum
    val coverageBound = 2L * (ls.size + rs.size) + lens.sum / p75
    assert(bins <= coverageBound,
      s"explode past the coverage model: $bins bins vs bound $coverageBound")
  }
}
