package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IvmTopK.fold must equal the full top-k recompute over the
  * post-delta rows — and keep its counts store ≡ countsOf(after) — on
  * every shape that distinguishes the two refresh paths: pure inserts
  * (clean candidate path, including a fresh key overtaking the old
  * k-th and a brand-new group), net decreases (broken path: an
  * untouched outsider must rise in when a top-k member falls — the
  * case the candidate path alone would get WRONG, so it proves the
  * broken detection), whole groups to zero, same-key delete+insert
  * netting zero, and contract violations (loud). */
class IvmTopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-topk")

  private def rows(t: (String, Long)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "ck")
  }

  private def delta(t: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "op", "ck")
  }

  private def state(before: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val c = IvmTopK.countsOf(before, Seq("g"), "ck")
    (IvmTopK.viewOf(c, Seq("g"), "ck", k), c)
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** fold(state(before), delta) must equal the recompute over `after`:
    * topk ≡ viewOf(countsOf(after)) and counts ≡ countsOf(after). */
  private def check(before: DataFrame, d: DataFrame, after: DataFrame,
      k: Int = 2): Unit = {
    val (topk, counts) = IvmTopK.fold(Some(state(before, k)), d,
      Seq("g"), "op", "ck", k)
    val wantCounts = IvmTopK.countsOf(after, Seq("g"), "ck")
    assert(sorted(counts) == sorted(wantCounts))
    assert(sorted(topk) == sorted(IvmTopK.viewOf(wantCounts, Seq("g"), "ck", k)))
  }

  test("pure inserts: an existing key overtakes the k-th; candidates stay old-topk ∪ delta keys") {
    // before: g has 1→3, 2→2, 3→1 rows; top-2 = {1, 2}
    val before = rows(("g", 1L), ("g", 1L), ("g", 1L),
      ("g", 2L), ("g", 2L), ("g", 3L))
    // two inserts lift key 3 to 3 — it must displace key 2
    check(before, delta(("g", "I", 3L), ("g", "I", 3L)),
      rows(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L), ("g", 2L),
        ("g", 3L), ("g", 3L), ("g", 3L)))
  }

  test("pure inserts: a brand-new key and a brand-new group") {
    val before = rows(("g", 1L), ("g", 2L))
    check(before,
      delta(("g", "I", 9L), ("g", "I", 9L), ("h", "I", 7L)),
      rows(("g", 1L), ("g", 2L), ("g", 9L), ("g", 9L), ("h", 7L)))
  }

  test("net decrease: an UNTOUCHED outsider rises into the top-k (broken-path proof)") {
    // before: 1→3, 2→2, 3→1; top-2 = {1, 2}. Delete both rows of key 2:
    // key 3 — absent from old top-2 AND from the delta — must appear.
    val before = rows(("g", 1L), ("g", 1L), ("g", 1L),
      ("g", 2L), ("g", 2L), ("g", 3L))
    check(before, delta(("g", "D", 2L), ("g", "D", 2L)),
      rows(("g", 1L), ("g", 1L), ("g", 1L), ("g", 3L)))
  }

  test("untouched groups keep their view rows (and ranks) intact under a delta on another group") {
    // untouched groups' candidates are exactly their own topk0 rows,
    // which re-rank to themselves — a delta on one group must leave
    // every other group's view identical
    val before = rows(
      ("a", 1L), ("a", 1L), ("a", 2L), // touched
      ("b", 7L), ("b", 7L), ("b", 8L), // untouched, with a rank-2 key
      ("c", 9L)) // untouched singleton
    check(before, delta(("a", "I", 3L), ("a", "I", 3L), ("a", "I", 3L)),
      rows(("a", 1L), ("a", 1L), ("a", 2L),
        ("a", 3L), ("a", 3L), ("a", 3L),
        ("b", 7L), ("b", 7L), ("b", 8L), ("c", 9L)))
    // and a broken delta in one group must still not disturb the others
    check(before, delta(("a", "D", 1L)),
      rows(("a", 1L), ("a", 2L),
        ("b", 7L), ("b", 7L), ("b", 8L), ("c", 9L)))
  }

  test("the candidate broadcast is cell-guarded: an oversized frame refuses loudly, naming the pruned-store remedy") {
    // round-14 ADVICE bound: a caller passing an unpruned store with
    // millions of groups must not build a K × |groups| broadcast —
    // the guard rides the candidate frame itself (plan-embedded, a
    // single-task window over the aggregate-sized frame)
    val before = rows(("a", 1L), ("a", 2L), ("b", 7L), ("c", 9L))
    val (topk, _) = IvmTopK.fold(Some(state(before, 2)),
      delta(("a", "I", 3L)), Seq("g"), "op", "ck", 2,
      maxBroadcastCells = 3L) // 4 stored view rows + 1 delta pair > 3
    val e = intercept[Exception](topk.collect())
    def chain(t: Throwable): String =
      Iterator.iterate(t.asInstanceOf[Throwable])(_.getCause)
        .takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("PRE-PRUNED"), chain(e))
    // and the same fold under the default bound folds fine
    val (ok, _) = IvmTopK.fold(Some(state(before, 2)),
      delta(("a", "I", 3L)), Seq("g"), "op", "ck", 2)
    assert(ok.count() > 0)
  }

  test("tie-break on equal counts is key ASC, matching the recompute") {
    val before = rows(("g", 5L), ("g", 4L), ("g", 3L))
    // all counts equal 1: top-2 = keys {3, 4}; delete key 3 → {4, 5}
    check(before, delta(("g", "D", 3L)), rows(("g", 5L), ("g", 4L)))
  }

  test("whole group to zero disappears; other groups untouched") {
    val before = rows(("g", 1L), ("g", 2L), ("h", 7L))
    check(before, delta(("g", "D", 1L), ("g", "D", 2L)), rows(("h", 7L)))
  }

  test("same-key delete+insert netting zero leaves the view unchanged (clean group)") {
    val before = rows(("g", 1L), ("g", 1L), ("g", 2L))
    check(before, delta(("g", "D", 1L), ("g", "I", 1L)),
      rows(("g", 1L), ("g", 1L), ("g", 2L)))
  }

  test("first fold (stored = None) builds the view from scratch") {
    val (topk, counts) = IvmTopK.fold(None,
      delta(("g", "I", 1L), ("g", "I", 1L), ("g", "I", 2L)),
      Seq("g"), "op", "ck", 1)
    val want = rows(("g", 1L), ("g", 1L), ("g", 2L))
    assert(sorted(counts) == sorted(IvmTopK.countsOf(want, Seq("g"), "ck")))
    assert(sorted(topk) ==
      sorted(IvmTopK.viewOf(IvmTopK.countsOf(want, Seq("g"), "ck"),
        Seq("g"), "ck", 1)))
  }

  test("over-delete fails loudly even when the same batch re-inserts the pair") {
    val before = rows(("g", 1L))
    val (topk, _) = IvmTopK.fold(Some(state(before, 1)),
      delta(("g", "D", 1L), ("g", "D", 1L), ("g", "I", 1L)),
      Seq("g"), "op", "ck", 1)
    val e = intercept[Exception](topk.collect())
    assert(e.getMessage.contains("never absorbed"), e.getMessage)
  }

  test("delete against a key the store never held fails loudly") {
    val before = rows(("g", 1L))
    val (topk, _) = IvmTopK.fold(Some(state(before, 1)),
      delta(("g", "D", 2L)), Seq("g"), "op", "ck", 1)
    val e = intercept[Exception](topk.collect())
    assert(e.getMessage.contains("never absorbed"), e.getMessage)
  }

  test("op outside {I, D} fails loudly") {
    val before = rows(("g", 1L))
    val (topk, _) = IvmTopK.fold(Some(state(before, 1)),
      delta(("g", "U", 1L)), Seq("g"), "op", "ck", 1)
    val e = intercept[Exception](topk.collect())
    assert(e.getMessage.contains("outside {I, D}"), e.getMessage)
  }

  test("weighted face: maintained revenue top-k equals the recompute on both refresh paths") {
    import spark.implicits._
    def wrows(t: (String, Long, Long)*): DataFrame =
      t.toSeq.toDF("g", "ck", "w")
    def wdelta(t: (String, String, Long, Long)*): DataFrame =
      t.toSeq.toDF("g", "op", "ck", "w")
    def wstate(before: DataFrame, k: Int): (DataFrame, DataFrame) = {
      val c = IvmTopK.countsOf(before, Seq("g"), "ck", Some("w"))
      (IvmTopK.viewOf(c, Seq("g"), "ck", k), c)
    }
    // before: key 1 → 30, key 2 → 20, key 3 → 15; top-2 = {1, 2}
    val before = wrows(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 15L))
    // clean path: insert lifts key 3 past key 2
    val (t1, c1) = IvmTopK.fold(Some(wstate(before, 2)),
      wdelta(("g", "I", 3L, 10L)), Seq("g"), "op", "ck", 2, Some("w"))
    val after1 = wrows(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 25L))
    assert(sorted(c1) == sorted(IvmTopK.countsOf(after1, Seq("g"), "ck", Some("w"))))
    assert(sorted(t1) == sorted(IvmTopK.viewOf(
      IvmTopK.countsOf(after1, Seq("g"), "ck", Some("w")), Seq("g"), "ck", 2)))
    // broken path: delete part of key 1's weight — untouched key 3
    // must rise in over the fallen key 1
    val (t2, c2) = IvmTopK.fold(Some(wstate(before, 2)),
      wdelta(("g", "D", 1L, 20L)), Seq("g"), "op", "ck", 2, Some("w"))
    val after2 = wrows(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 15L))
    assert(sorted(c2) == sorted(IvmTopK.countsOf(after2, Seq("g"), "ck", Some("w"))))
    assert(sorted(t2) == sorted(IvmTopK.viewOf(
      IvmTopK.countsOf(after2, Seq("g"), "ck", Some("w")), Seq("g"), "ck", 2)))
  }

  test("weighted face: over-delete of weight and non-positive weights fail loudly") {
    import spark.implicits._
    val before = Seq(("g", 1L, 10L)).toDF("g", "ck", "w")
    val c0 = IvmTopK.countsOf(before, Seq("g"), "ck", Some("w"))
    val st = (IvmTopK.viewOf(c0, Seq("g"), "ck", 1), c0)
    val (t1, _) = IvmTopK.fold(Some(st),
      Seq(("g", "D", 1L, 11L)).toDF("g", "op", "ck", "w"),
      Seq("g"), "op", "ck", 1, Some("w"))
    val e1 = intercept[Exception](t1.collect())
    assert(e1.getMessage.contains("never absorbed"), e1.getMessage)
    val (t2, _) = IvmTopK.fold(Some(st),
      Seq(("g", "I", 2L, 0L)).toDF("g", "op", "ck", "w"),
      Seq("g"), "op", "ck", 1, Some("w"))
    val e2 = intercept[Exception](t2.collect())
    assert(e2.getMessage.contains("positive long"), e2.getMessage)
    // non-long weight column refused before any plan is built
    val e3 = intercept[IllegalArgumentException](IvmTopK.countsOf(
      Seq(("g", 1L, 1.5)).toDF("g", "ck", "w"), Seq("g"), "ck", Some("w")))
    assert(e3.getMessage.contains("must be LONG"), e3.getMessage)
  }

  test("chained folds: state threads through three batches exactly") {
    val b0 = rows(("g", 1L), ("g", 1L), ("g", 2L), ("g", 3L))
    var st = state(b0, 2)
    // batch 1: insert key 3 twice (clean) → counts 1→2, 2→1, 3→3
    st = IvmTopK.fold(Some(st), delta(("g", "I", 3L), ("g", "I", 3L)),
      Seq("g"), "op", "ck", 2)
    // batch 2: delete key 3 twice (broken) → 1→2, 2→1, 3→1
    st = IvmTopK.fold(Some(st), delta(("g", "D", 3L), ("g", "D", 3L)),
      Seq("g"), "op", "ck", 2)
    // batch 3: insert key 2 (clean) → 1→2, 2→2, 3→1
    st = IvmTopK.fold(Some(st), delta(("g", "I", 2L)),
      Seq("g"), "op", "ck", 2)
    val after = rows(("g", 1L), ("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L))
    val wantCounts = IvmTopK.countsOf(after, Seq("g"), "ck")
    assert(sorted(st._2) == sorted(wantCounts))
    assert(sorted(st._1) ==
      sorted(IvmTopK.viewOf(wantCounts, Seq("g"), "ck", 2)))
  }

  // ---- foldWeighted: the composed-chain net-weighted contract -------

  private def wdelta(t: (String, Long, Long)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "ck", "w")
  }

  test("foldWeighted ≡ fold on an expanded ±1 stream (count measure, both refresh paths)") {
    // net weights expand to |w| unit ops of the matching sign — the two
    // faces must land on identical state. Delta: +3 on a fresh key
    // (clean), −2 on the current leader of another group (broken).
    val before = rows(("a", 1L), ("a", 1L), ("a", 2L), ("b", 9L),
      ("b", 9L), ("b", 9L), ("b", 8L), ("b", 7L))
    val st0 = state(before, 2)
    val dW = wdelta(("a", 5L, 3L), ("b", 9L, -2L))
    val dOps = delta(("a", "I", 5L), ("a", "I", 5L), ("a", "I", 5L),
      ("b", "D", 9L), ("b", "D", 9L))
    val (tW, cW) = IvmTopK.foldWeighted(Some(st0), dW, Seq("g"), "w", "ck", 2)
    val (tO, cO) = IvmTopK.fold(Some(st0), dOps, Seq("g"), "op", "ck", 2)
    assert(sorted(cW) == sorted(cO))
    assert(sorted(tW) == sorted(tO))
    // and the broken path genuinely fired: b's old outsider 8 rose in
    assert(sorted(tW).exists(r => r.head == "b" && r(1) == 8L))
  }

  test("foldWeighted with valueCol: maintained Σ w·value measure equals the recompute") {
    import spark.implicits._
    // occurrences (g, ck, cents); measure per (g, ck) = Σ cents
    val before = Seq(("g", 1L, 100L), ("g", 1L, 50L), ("g", 2L, 120L),
      ("g", 3L, 110L)).toDF("g", "ck", "cents")
    val counts0 = IvmTopK.countsOf(before, Seq("g"), "ck", Some("cents"))
    val topk0 = IvmTopK.viewOf(counts0, Seq("g"), "ck", 2)
    // net delta: ck=3 gains an occurrence worth 80 twice (w=2),
    // ck=1 loses the 100-cent occurrence (w=−1)
    val d = Seq(("g", 3L, 2L, 80L), ("g", 1L, -1L, 100L))
      .toDF("g", "ck", "w", "cents")
    val (topk1, counts1) = IvmTopK.foldWeighted(Some((topk0, counts0)), d,
      Seq("g"), "w", "ck", 2, Some("cents"))
    val after = Seq(("g", 1L, 50L), ("g", 2L, 120L), ("g", 3L, 110L),
      ("g", 3L, 80L), ("g", 3L, 80L)).toDF("g", "ck", "cents")
    val wantCounts = IvmTopK.countsOf(after, Seq("g"), "ck", Some("cents"))
    assert(sorted(counts1) == sorted(wantCounts))
    assert(sorted(topk1) ==
      sorted(IvmTopK.viewOf(wantCounts, Seq("g"), "ck", 2)))
  }

  test("foldWeighted refusals: zero/NULL weight, over-delete, bad value type") {
    val before = rows(("g", 1L))
    val st = state(before, 2)
    val eZero = intercept[Exception](
      IvmTopK.foldWeighted(Some(st), wdelta(("g", 1L, 0L)),
        Seq("g"), "w", "ck", 2)._2.collect())
    assert(eZero.getMessage.contains("zero/NULL multiplicity"))
    val eOver = intercept[Exception](
      IvmTopK.foldWeighted(Some(st), wdelta(("g", 1L, -2L)),
        Seq("g"), "w", "ck", 2)._2.collect())
    assert(eOver.getMessage.contains("went negative"))
    import spark.implicits._
    val eType = intercept[IllegalArgumentException](
      IvmTopK.foldWeighted(Some(st),
        Seq(("g", 1L, 1L, 1.5)).toDF("g", "ck", "w", "cents"),
        Seq("g"), "w", "ck", 2, Some("cents")))
    assert(eType.getMessage.contains("must be LONG"))
  }
}
