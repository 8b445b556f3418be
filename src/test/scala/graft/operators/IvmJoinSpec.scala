package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Exact.dec

/** IvmJoin.foldSumView must equal the full recompute over the
  * post-delta join on every shape that distinguishes the bilinear
  * terms: R-only deltas, S-only deltas, both sides with an overlapping
  * key (the ΔR⋈ΔS cross term), duplicate join keys on both sides
  * (multiset multiplicities), join-key re-pointing (D+I pairs), groups
  * to zero, first fold, and loud contract violations. */
class IvmJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-join")

  // R = facts (k, rv), S = dims (k, g); view = per-g (n, sum(rv))
  private def rRows(t: (Long, Double)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("k", "rv")
  }
  private def sRows(t: (Long, String)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("k", "g")
  }
  private def rDelta(t: (Long, Double, String)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("k", "rv", "op")
  }
  private def sDelta(t: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("k", "g", "op")
  }
  private def noRDelta = rDelta().select(col("k"), col("rv"), col("op"))
  private def noSDelta = sDelta().select(col("k"), col("g"), col("op"))

  private def view(r: DataFrame, s: DataFrame): DataFrame =
    r.join(s, Seq("k"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("rv"))).cast("decimal(28,4)").as("s"))

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.select(col("g"), col("n"), col("s").cast("double"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def check(
      rBefore: DataFrame, sBefore: DataFrame,
      dR: DataFrame, dS: DataFrame,
      rAfter: DataFrame, sAfter: DataFrame): Unit = {
    val got = IvmJoin.foldSumView(Some(view(rBefore, sBefore)),
      dR, dS, rBefore, sBefore, Seq("k"), Seq("g"), "rv", "op")
    assert(sorted(got) == sorted(view(rAfter, sAfter)))
  }

  private val r0 = rRows((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0))
  private val s0 = sRows((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c"))

  test("R-only delta: inserts and deletes against duplicate-key dims fold exactly") {
    // delete one of k=1's facts (hits BOTH dim rows of k=1), insert a
    // new k=2 fact
    check(r0, s0,
      rDelta((1L, 20.0, "D"), (2L, 9.0, "I")), noSDelta,
      rRows((1L, 10.0), (2L, 5.0), (2L, 9.0), (3L, 7.0)), s0)
  }

  test("S-only delta: re-pointing a dim (D+I) moves its facts between groups") {
    // k=3 moves from group c to group a
    check(r0, s0,
      noRDelta, sDelta((3L, "c", "D"), (3L, "a", "I")),
      r0, sRows((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a")))
  }

  test("both sides with an overlapping key: the ΔR⋈ΔS cross term is load-bearing") {
    // k=2: fact repriced (D+I) AND dim re-pointed (D+I) in the same
    // batch — without the cross term the new fact × new dim pair (and
    // the old × old cancellation) would be missed
    check(r0, s0,
      rDelta((2L, 5.0, "D"), (2L, 50.0, "I")),
      sDelta((2L, "a", "D"), (2L, "b", "I")),
      rRows((1L, 10.0), (1L, 20.0), (2L, 50.0), (3L, 7.0)),
      sRows((1L, "a"), (1L, "b"), (2L, "b"), (3L, "c")))
  }

  test("a group deleted to zero disappears; a brand-new group arrives") {
    // delete k=3's only fact (group c empties); insert k=9 on both
    // sides (group d appears purely from the cross term)
    check(r0, s0,
      rDelta((3L, 7.0, "D"), (9L, 1.5, "I")),
      sDelta((9L, "d", "I")),
      rRows((1L, 10.0), (1L, 20.0), (2L, 5.0), (9L, 1.5)),
      sRows((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c"), (9L, "d")))
  }

  test("empty stored view (first fold) takes insert-only deltas as the full answer") {
    val got = IvmJoin.foldSumView(None,
      rDelta((1L, 10.0, "I"), (2L, 5.0, "I")),
      sDelta((1L, "a", "I"), (2L, "b", "I")),
      rRows(), sRows(), Seq("k"), Seq("g"), "rv", "op")
    assert(sorted(got) ==
      sorted(view(rRows((1L, 10.0), (2L, 5.0)),
        sRows((1L, "a"), (2L, "b")))))
  }

  test("a delta key matching nothing on the other side is a correct no-op, not an error") {
    check(r0, s0, rDelta((42L, 3.0, "I")), noSDelta,
      rRows((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0), (42L, 3.0)), s0)
  }

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("malformed op, never-absorbed deletes, and decimal overflow fail loudly") {
    val e1 = intercept[Exception] {
      IvmJoin.foldSumView(Some(view(r0, s0)),
        rDelta((1L, 10.0, "U")), noSDelta, r0, s0,
        Seq("k"), Seq("g"), "rv", "op").collect()
    }
    assert(msgChain(e1).contains("outside {I, D}"), msgChain(e1))
    // delete MORE facts than the view absorbed for group c
    val e2 = intercept[Exception] {
      IvmJoin.foldSumView(Some(view(r0, s0)),
        rDelta((3L, 7.0, "D"), (3L, 7.0, "D")), noSDelta, r0, s0,
        Seq("k"), Seq("g"), "rv", "op").collect()
    }
    assert(msgChain(e2).contains("never absorbed"), msgChain(e2))
    val e3 = intercept[Exception] {
      IvmJoin.foldSumView(Some(view(r0, s0)),
        rDelta((1L, 1e15, "I")), noSDelta, r0, s0,
        Seq("k"), Seq("g"), "rv", "op").collect()
    }
    assert(msgChain(e3).contains("decimal(18,4)") ||
      msgChain(e3).contains("Decimal(18, 4)"), msgChain(e3))
  }

  test("null values count toward n and contribute 0 to the sum (SUM/COUNT(*) view semantics)") {
    import spark.implicits._
    val r = Seq((1L, Some(10.0)), (1L, Option.empty[Double])).toDF("k", "rv")
    val dR = Seq((1L, Option.empty[Double], "I")).toDF("k", "rv", "op")
    val got = IvmJoin.foldSumView(
      Some(view(r, sRows((1L, "a")))),
      dR, noSDelta, r, sRows((1L, "a")), Seq("k"), Seq("g"), "rv", "op")
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n") == 3L)
    assert(got.head.getAs[java.math.BigDecimal]("s").doubleValue() == 10.0)
  }
}
