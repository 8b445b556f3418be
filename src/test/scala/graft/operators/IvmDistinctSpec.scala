package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IvmDistinct.fold must equal the full COUNT(DISTINCT) recompute over
  * the post-delta rows — and keep its dict ≡ dictOf(after) — on every
  * shape that distinguishes the paths: inserts of already-held pairs
  * (no-op), genuinely new pairs (+1), deletes with surviving
  * duplicates (no-op), deletes that erase a pair (−1), groups to zero
  * (gone), same-batch insert+delete of a fresh pair (net nothing),
  * null values (ignored per SQL), and contract violations (loud). */
class IvmDistinctSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-distinct")

  private def rows(t: (String, Long)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "v")
  }

  private def delta(t: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "op", "v")
  }

  private def state(before: DataFrame): (DataFrame, DataFrame) = {
    val d = IvmDistinct.dictOf(before, Seq("g"), "v")
    (IvmDistinct.viewOf(d, Seq("g")), d)
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** fold(state(before), delta, after) must equal the recompute:
    * counts ≡ viewOf(dictOf(after)) and dict ≡ dictOf(after). */
  private def check(before: DataFrame, d: DataFrame, after: DataFrame): Unit = {
    val (counts, dict) = IvmDistinct.fold(Some(state(before)), d,
      after, Seq("g"), "op", "v")
    val wantDict = IvmDistinct.dictOf(after, Seq("g"), "v")
    assert(sorted(dict) == sorted(wantDict))
    assert(sorted(counts) == sorted(IvmDistinct.viewOf(wantDict, Seq("g"))))
  }

  test("insert of an already-held pair is a no-op; a new pair counts once despite duplicate rows") {
    val before = rows(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
    // insert another (a,1) — held; insert (a,9) twice — new, counts once
    check(before,
      delta(("a", "I", 1L), ("a", "I", 9L), ("a", "I", 9L)),
      rows(("a", 1L), ("a", 1L), ("a", 1L), ("a", 2L), ("a", 9L),
        ("a", 9L), ("b", 5L)))
  }

  test("delete with a surviving duplicate keeps the pair; deleting the last occurrence removes it") {
    val before = rows(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
    // delete ONE (a,1) — duplicate survives; delete the only (a,2)
    check(before,
      delta(("a", "D", 1L), ("a", "D", 2L)),
      rows(("a", 1L), ("b", 5L)))
  }

  test("a group deleted to zero disappears; a brand-new group arrives through the delta") {
    val before = rows(("a", 1L), ("b", 5L), ("b", 6L))
    check(before,
      delta(("a", "D", 1L), ("c", "I", 7L), ("c", "I", 8L)),
      rows(("b", 5L), ("b", 6L), ("c", 7L), ("c", 8L)))
  }

  test("same-batch insert+delete of a fresh pair nets to nothing — rowsAfter is the arbiter") {
    val before = rows(("a", 1L))
    check(before,
      delta(("a", "I", 9L), ("a", "D", 9L)),
      rows(("a", 1L)))
    // ...and the mirror: delete all old rows of a HELD pair while
    // re-inserting it — the pair must survive exactly once
    check(before,
      delta(("a", "D", 1L), ("a", "I", 1L)),
      rows(("a", 1L)))
  }

  test("empty stored state (first fold) takes inserts as the full answer") {
    val (counts, dict) = IvmDistinct.fold(None,
      delta(("a", "I", 1L), ("a", "I", 1L), ("a", "I", 2L), ("b", "I", 5L)),
      rows(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L)),
      Seq("g"), "op", "v")
    assert(sorted(counts) == Seq(Seq("a", 2L), Seq("b", 1L)))
    assert(dict.count() == 3)
  }

  test("null values are ignored per SQL COUNT(DISTINCT) — in the delta and the rows store") {
    import spark.implicits._
    val before = Seq(("a", Some(1L)), ("a", None)).toDF("g", "v")
    val d = Seq(("a", "I", Option.empty[Long]), ("a", "I", Some(2L)))
      .toDF("g", "op", "v")
    val after = Seq(("a", Some(1L)), ("a", None), ("a", None), ("a", Some(2L)))
      .toDF("g", "v")
    val (counts, dict) = IvmDistinct.fold(Some(state(before)), d, after,
      Seq("g"), "op", "v")
    assert(sorted(counts) == Seq(Seq("a", 2L)))
    assert(sorted(dict) == Seq(Seq("a", 1L), Seq("a", 2L)))
  }

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("malformed op and phantom deletes fail loudly") {
    val before = rows(("a", 1L))
    val e1 = intercept[Exception] {
      IvmDistinct.fold(Some(state(before)), delta(("a", "U", 1L)),
        rows(("a", 1L)), Seq("g"), "op", "v")._1.collect()
    }
    assert(msgChain(e1).contains("outside {I, D}"), msgChain(e1))
    // a delete of a pair the view never held, with no surviving row:
    // the phantom path must refuse rather than decrement thin air
    val e2 = intercept[Exception] {
      IvmDistinct.fold(Some(state(before)), delta(("a", "D", 42L)),
        rows(("a", 1L)), Seq("g"), "op", "v")._1.collect()
    }
    assert(msgChain(e2).contains("never held"), msgChain(e2))
  }

  test("multi-batch chain: counts stay ≡ full recompute as the dict evolves") {
    // three folds in sequence, state threaded through — the streaming
    // contract in miniature
    var cur = rows(("a", 1L), ("a", 2L), ("b", 5L))
    var st = state(cur)
    val steps = Seq(
      (delta(("a", "I", 3L), ("b", "D", 5L), ("b", "I", 6L)),
        rows(("a", 1L), ("a", 2L), ("a", 3L), ("b", 6L))),
      (delta(("a", "D", 1L), ("a", "D", 2L), ("c", "I", 1L)),
        rows(("a", 3L), ("b", 6L), ("c", 1L))),
      (delta(("a", "D", 3L), ("c", "I", 2L)),
        rows(("b", 6L), ("c", 1L), ("c", 2L))))
    steps.foreach { case (d, after) =>
      val (c2, d2) = IvmDistinct.fold(Some(st), d, after, Seq("g"), "op", "v")
      val want = IvmDistinct.dictOf(after, Seq("g"), "v")
      assert(sorted(d2) == sorted(want))
      assert(sorted(c2) == sorted(IvmDistinct.viewOf(want, Seq("g"))))
      // materialize so the next fold reads settled state, as a real
      // store would
      st = (c2.localCheckpoint(true), d2.localCheckpoint(true))
      cur = after
    }
  }

  test("pruned-store contract: a dict/rowsAfter pruned to the delta's pairs yields the same counts, and the returned dict covers the pruned slice") {
    import spark.implicits._
    val before = rows(("a", 1L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 9L))
    val d = delta(("a", "D", 2L), ("b", "I", 7L))
    val after = rows(("a", 1L), ("b", 5L), ("b", 6L), ("b", 7L), ("c", 9L))
    val full = IvmDistinct.fold(Some(state(before)), d, after,
      Seq("g"), "op", "v")
    // prune both stores to ONLY rows touching the delta's pairs — the
    // contract's minimal superset (a bucket layout prunes coarser)
    val touchedPairs = Set(("a", 2L), ("b", 7L))
    val dictPruned = IvmDistinct.dictOf(before, Seq("g"), "v")
      .filter(r => touchedPairs.contains((r.getString(0), r.getLong(1))))
    val afterPruned = after
      .filter(r => touchedPairs.contains((r.getString(0), r.getLong(1))))
    val pruned = IvmDistinct.fold(
      Some((state(before)._1, dictPruned)), d, afterPruned,
      Seq("g"), "op", "v")
    assert(sorted(pruned._1) == sorted(full._1)) // counts exact either way
    // pruned dict output = the affected slice: (a,2) removed, (b,7) new
    assert(sorted(pruned._2) == Seq(Seq("b", 7L)))
  }

  test("sketch path: maintained HLL buffers ≡ the one-shot aggregate bit-for-bit across insert batches") {
    import graft.functions.HllSketchAgg
    import spark.implicits._
    val batches = Seq(
      (0 until 300).map(i => ("a", s"v${i % 97}")) ++
        (0 until 100).map(i => ("b", s"w$i")),
      (0 until 300).map(i => ("a", s"v${i % 211}")),
      (0 until 50).map(i => ("c", s"x$i")) ++
        (0 until 80).map(i => ("b", s"w${i + 60}")))
      .map(_.toDF("g", "v"))
    val folded = batches.foldLeft(Option.empty[DataFrame]) { (st, b) =>
      Some(HllSketchAgg.foldBuffers(st, b, Seq("g"), "v")
        .localCheckpoint(true))
    }.get
    val got = folded.select(col("g"),
      HllSketchAgg.estimateOf(col("hll")).as("est"))
    val want = batches.reduce(_ unionByName _)
      .groupBy(col("g")).agg(HllSketchAgg.hll(col("v")).as("est"))
    assert(sorted(got) == sorted(want)) // doubles bitwise-equal
  }

  // ---- foldWeighted: the composed-chain multiset contract -----------
  // the weighted dict is invertible on its own: multiplicity is the
  // survival arbiter, so no rows store is ever consulted

  private def wstate(ms: Seq[(String, Long, Long)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val dict = ms.toDF("g", "v", "__mult")
    (IvmDistinct.viewOf(dict, Seq("g")), dict)
  }

  private def wcheck(before: Seq[(String, Long, Long)],
      d: Seq[(String, Long, Long)],
      after: Seq[(String, Long, Long)]): Unit = {
    import spark.implicits._
    val (counts, dict) = IvmDistinct.foldWeighted(Some(wstate(before)),
      d.toDF("g", "v", "w"), Seq("g"), "w", "v")
    val wantDict = after.toDF("g", "v", "__mult")
    assert(sorted(dict) == sorted(wantDict))
    assert(sorted(counts) == sorted(IvmDistinct.viewOf(wantDict, Seq("g"))))
  }

  test("weighted: multiplicity changes that keep a pair alive are view no-ops; pairs entering/leaving fold ±1") {
    wcheck(
      before = Seq(("a", 1L, 3L), ("a", 2L, 1L), ("b", 5L, 2L)),
      // (a,1) drops to 1 (alive — no view change), (a,2) leaves (−1),
      // (a,9) enters at weight 4 (+1), (b,7) enters (+1)
      d = Seq(("a", 1L, -2L), ("a", 2L, -1L), ("a", 9L, 4L), ("b", 7L, 1L)),
      after = Seq(("a", 1L, 1L), ("a", 9L, 4L), ("b", 5L, 2L), ("b", 7L, 1L)))
  }

  test("weighted: group to zero disappears; same-batch rows netting zero change nothing") {
    wcheck(
      before = Seq(("a", 1L, 2L), ("b", 5L, 1L)),
      // b's only pair leaves; (a,3) carries +1 and −1 rows netting 0
      d = Seq(("b", 5L, -1L), ("a", 3L, 1L), ("a", 3L, -1L)),
      after = Seq(("a", 1L, 2L)))
  }

  test("weighted: first fold (stored = None) and NULL values ignored") {
    import spark.implicits._
    val d = Seq(("a", Some(1L), 2L), ("a", Some(2L), 1L),
      ("a", None, 5L), ("b", None, 3L))
      .toDF("g", "v", "w")
    val (counts, dict) = IvmDistinct.foldWeighted(None, d, Seq("g"), "w", "v")
    assert(sorted(dict) == Seq(Seq("a", 1L, 2L), Seq("a", 2L, 1L)))
    assert(sorted(counts) == Seq(Seq("a", 2L)))
  }

  test("weighted refusals: zero weight and over-delete fail loudly") {
    import spark.implicits._
    val st = wstate(Seq(("a", 1L, 1L)))
    val eZero = intercept[Exception](
      IvmDistinct.foldWeighted(Some(st),
        Seq(("a", 1L, 0L)).toDF("g", "v", "w"),
        Seq("g"), "w", "v")._2.collect())
    assert(eZero.getMessage.contains("zero/NULL multiplicity"))
    val eOver = intercept[Exception](
      IvmDistinct.foldWeighted(Some(st),
        Seq(("a", 1L, -2L)).toDF("g", "v", "w"),
        Seq("g"), "w", "v")._2.collect())
    assert(eOver.getMessage.contains("multiplicity negative"))
  }
}
