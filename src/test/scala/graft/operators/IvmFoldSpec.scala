package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Exact.dec

/** IvmFold.foldMinMax must equal the full recompute over the
  * post-delta rows on every shape that distinguishes the merge path
  * from the re-agg path: deletes that break an extremum (incl. a
  * duplicated one — conservative trigger, still exact), inserts that
  * extend extremes without re-agg, brand-new groups, groups deleted to
  * zero, and malformed deltas (loud). */
class IvmFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-fold")

  private def rows(t: (String, Long, Double)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "id", "v")
  }

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(dec(col("v"))).as("s"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

  private def delta(t: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "op", "v")
  }

  /** fold(stored(before), delta, rows(after)) must equal agg(after). */
  private def check(before: DataFrame, d: DataFrame, after: DataFrame): Unit = {
    val got = IvmFold.foldMinMax(Some(agg(before)), d,
        after.select(col("g"), col("v")), Seq("g"), "op", "v")
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
    val want = agg(after)
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
    val gs = got.collect().map(_.toSeq).sortBy(_.toString)
    val ws = want.collect().map(_.toSeq).sortBy(_.toString)
    assert(gs.toSeq == ws.toSeq)
  }

  test("delete-the-max: broken group re-aggregates, untouched groups merge") {
    val before = rows(("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 7.0),
      ("b", 4, 1.0), ("b", 5, 2.0))
    val d = delta(("a", "D", 9.0), ("b", "I", 3.0))
    val after = rows(("a", 1, 5.0), ("a", 3, 7.0),
      ("b", 4, 1.0), ("b", 5, 2.0), ("b", 6, 3.0))
    check(before, d, after)
  }

  test("delete-the-min with a DUPLICATED extremum: conservative re-agg still exact") {
    // two rows attain min 2.0; deleting one leaves min unchanged —
    // the trigger fires anyway and the re-agg answers from truth
    val before = rows(("a", 1, 2.0), ("a", 2, 2.0), ("a", 3, 8.0))
    val d = delta(("a", "D", 2.0))
    val after = rows(("a", 2, 2.0), ("a", 3, 8.0))
    check(before, d, after)
  }

  test("inserts extending both extremes never re-aggregate — and stay exact") {
    val before = rows(("a", 1, 5.0), ("a", 2, 6.0))
    val d = delta(("a", "I", 1.0), ("a", "I", 9.0), ("a", "I", 5.5))
    val after = rows(("a", 1, 5.0), ("a", 2, 6.0), ("a", 3, 1.0),
      ("a", 4, 9.0), ("a", 5, 5.5))
    check(before, d, after)
    // plan proof that this shape stays on the merge path: with no
    // delete touching an extremum the affected list is empty, so the
    // re-agg leg contributes no rows — rowsAfter would not even need
    // to exist; here we hand it an empty frame and the fold still
    // answers correctly
    val got = IvmFold.foldMinMax(Some(agg(before)), d,
        rows().select(col("g"), col("v")), Seq("g"), "op", "v")
      .select(col("g"), col("n"), col("mn"), col("mx")).collect()
    assert(got.map(_.toSeq).toSeq == Seq(Seq("a", 5L, 1.0, 9.0)))
  }

  test("brand-new group arrives through the delta alone") {
    val before = rows(("a", 1, 5.0))
    val d = delta(("z", "I", 4.0), ("z", "I", 6.0))
    val after = rows(("a", 1, 5.0), ("z", 2, 4.0), ("z", 3, 6.0))
    check(before, d, after)
  }

  test("a group deleted to zero disappears") {
    val before = rows(("a", 1, 5.0), ("b", 2, 3.0))
    val d = delta(("b", "D", 3.0))
    val after = rows(("a", 1, 5.0))
    check(before, d, after)
    val got = IvmFold.foldMinMax(Some(agg(before)), d,
      after.select(col("g"), col("v")), Seq("g"), "op", "v")
    assert(got.select(col("g")).collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("empty stored view (first fold) takes inserts as the full answer") {
    val d = delta(("a", "I", 2.0), ("a", "I", 8.0))
    val after = rows(("a", 1, 2.0), ("a", 2, 8.0))
    val got = IvmFold.foldMinMax(None, d,
        after.select(col("g"), col("v")), Seq("g"), "op", "v")
      .select(col("g"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
      .collect()
    assert(got.map(_.toSeq).toSeq == Seq(Seq("a", 2L, 10.0, 2.0, 8.0)))
  }

  test("malformed delta op and never-absorbed deletes fail loudly") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val before = rows(("a", 1, 5.0))
    val bad = delta(("a", "U", 6.0))
    val e1 = intercept[Exception] {
      IvmFold.foldMinMax(Some(agg(before)), bad,
        before.select(col("g"), col("v")), Seq("g"), "op", "v").collect()
    }
    assert(msgChain(e1).contains("malformed delta"), msgChain(e1))
    // deleting from a group the view never absorbed → negative count.
    // the value must dodge the extremum trigger (a 'D 99' on a fresh
    // group has no stored min/max, so it rides the merge path) — that
    // is exactly the corruption the count guard exists to catch
    val phantom = delta(("zz", "D", 99.0))
    val e2 = intercept[Exception] {
      IvmFold.foldMinMax(Some(agg(before)), phantom,
        before.select(col("g"), col("v")), Seq("g"), "op", "v").collect()
    }
    assert(msgChain(e2).contains("never absorbed"), msgChain(e2))
    // the sneaky variant: the phantom delete hides behind inserts into
    // the same NEW group, so the count stays positive — without its own
    // guard the merge path would keep the deleted 5.0 as the group min
    // (silently corrupt extremes). Must be as loud as the bare phantom.
    val hidden = delta(("zz", "I", 5.0), ("zz", "I", 10.0), ("zz", "D", 5.0))
    val e3 = intercept[Exception] {
      IvmFold.foldMinMax(Some(agg(before)), hidden,
        before.select(col("g"), col("v")), Seq("g"), "op", "v").collect()
    }
    assert(msgChain(e3).contains("never absorbed"), msgChain(e3))
  }

  test("a value outside decimal(18,4) fails loudly — never a silent 0 in the exact sum (r13)") {
    // under ANSI (the session default) the cast itself throws; under
    // non-ANSI it yields NULL, which the old coalesce folded into the
    // sum as 0 — indistinguishable from the documented
    // null-contributes-0 convention. The operator's own raise covers
    // the non-ANSI mode, so BOTH modes refuse — this test pins both,
    // on both the delta leg and the re-agg leg.
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    def overflowRaised(m: String): Boolean =
      m.contains("decimal(18,4)") || // the operator's raise (non-ANSI)
        m.contains("Decimal(18, 4)") // Spark's ANSI cast error
    val before = rows(("a", 1L, 5.0), ("a", 2L, 7.0))
    val before2 = rows(("b", 1L, 1e15), ("b", 2L, 9.0))
    for (ansi <- Seq("true", "false")) {
      val was = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        // delta leg: the inserted value overflows
        val e1 = intercept[Exception] {
          IvmFold.foldMinMax(Some(agg(before)), delta(("a", "I", 1e15)),
            rows(("a", 1L, 5.0), ("a", 2L, 7.0), ("a", 3L, 1e15))
              .select(col("g"), col("v")), Seq("g"), "op", "v").collect()
        }
        assert(overflowRaised(msgChain(e1)), s"ansi=$ansi: ${msgChain(e1)}")
        // re-agg leg: delete the max of a group that holds an
        // overflowing survivor — the re-aggregate must refuse, not
        // skip it
        val e2 = intercept[Exception] {
          IvmFold.foldMinMax(
            Some(before2.groupBy(col("g")).agg(count(lit(1)).as("n"),
              lit(null).cast("decimal(18,4)").as("s"),
              min(col("v")).as("mn"), max(col("v")).as("mx"))),
            delta(("b", "D", 9.0)),
            rows(("b", 1L, 1e15)).select(col("g"), col("v")),
            Seq("g"), "op", "v").collect()
        }
        assert(overflowRaised(msgChain(e2)), s"ansi=$ansi: ${msgChain(e2)}")
      } finally spark.conf.set("spark.sql.ansi.enabled", was)
    }
    // ...while genuine NULL values still ride the documented
    // convention: counted, 0 to the sum, invisible to min/max
    import spark.implicits._
    val beforeN = Seq(("c", Some(5.0)), ("c", None)).toDF("g", "v")
    val storedN = beforeN.groupBy(col("g")).agg(count(lit(1)).as("n"),
      coalesce(sum(dec(col("v"))), lit(0).cast("decimal(18,4)")).as("s"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))
    val got = IvmFold.foldMinMax(Some(storedN),
      Seq(("c", "I", Option.empty[Double])).toDF("g", "op", "v"),
      Seq(("c", Some(5.0)), ("c", None), ("c", None)).toDF("g", "v"),
      Seq("g"), "op", "v").collect()
    assert(got.length == 1)
    val r0 = got.head
    assert(r0.getAs[Long]("n") == 3L)
    assert(r0.getAs[java.math.BigDecimal]("s").doubleValue() == 5.0)
  }

  test("wideDecimal store folds exactly AT the default boundary, keeps the raise at its own (r14)") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // 1e14 is exactly the value the default decimal(18,4) store refuses
    val before = rows(("a", 1L, 1e14), ("a", 2L, 7.0),
      ("b", 3L, 1e14), ("b", 4L, 2.0))
    // group a: merge path (insert above the old max); group b: re-agg
    // path (delete the max — an overflowing-by-default survivor stays)
    val d = delta(("a", "I", 2e14), ("b", "D", 1e14))
    val after = rows(("a", 1L, 1e14), ("a", 2L, 7.0), ("a", 5L, 2e14),
      ("b", 4L, 2.0))
    def wideAgg(df: DataFrame): DataFrame =
      df.groupBy(col("g")).agg(count(lit(1)).as("n"),
        sum(dec(col("v"), 38, 6)).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val got = IvmFold.foldMinMax(Some(wideAgg(before)), d,
        after.select(col("g"), col("v")), Seq("g"), "op", "v",
        wideDecimal = true)
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
    val want = wideAgg(after)
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
    assert(got.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      want.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // the same fold under the DEFAULT store refuses — the r13 raise
    val e1 = intercept[Exception] {
      IvmFold.foldMinMax(Some(agg(before)), d,
        after.select(col("g"), col("v")), Seq("g"), "op", "v").collect()
    }
    assert(msgChain(e1).contains("decimal(18,4)") ||
      msgChain(e1).contains("Decimal(18, 4)"), msgChain(e1))
    // and the wide store keeps the discipline at ITS value boundary
    // (1e23 > 10^22, the decimal(28,6) integral cap — values stay ten
    // digits below the decimal(38,6) sum so the running sum has the
    // same headroom the default mode keeps) — never a silent 0
    val e2 = intercept[Exception] {
      IvmFold.foldMinMax(Some(wideAgg(before)),
        delta(("a", "I", 1e23)),
        after.select(col("g"), col("v")), Seq("g"), "op", "v",
        wideDecimal = true).collect()
    }
    assert(msgChain(e2).contains("decimal(28,6)") ||
      msgChain(e2).contains("Decimal(28, 6)"), msgChain(e2))
  }

  test("accumulated sum crossing the SUM type raises, never NULL/0 drift (r15)") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // a stored view whose running sum sits AT the decimal(38,6) cap —
    // built by accumulation over many folds in real life, literal here;
    // each incoming value is individually valid (well under 1e22) but
    // the merge-path add overflows the sum type to NULL under non-ANSI
    // arithmetic. Pre-r15 that NULL rode into the view (merge) or
    // coalesced to 0 (re-agg); now both paths raise.
    val atCap = "99999999999999999999999999999999.000000"
    val stored = spark.range(1).select(
      lit("a").as("g"), lit(2L).as("n"),
      lit(atCap).cast("decimal(38,6)").as("s"),
      lit(1.0).as("mn"), lit(2.0).as("mx"))
    assert(stored.collect().head.getAs[java.math.BigDecimal]("s") != null,
      "test setup: the at-cap literal itself must fit decimal(38,6)")
    // merge path: an insert-only delta never touches an extremum.
    // Under ANSI (the session default) the decimal add raises natively;
    // the fold's OWN guard exists for non-ANSI mode, where the add
    // yields NULL instead — exercise that mode explicitly, like the
    // value-raise test above does.
    val was = spark.conf.get("spark.sql.ansi.enabled")
    val e1 = try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      intercept[Exception] {
        IvmFold.foldMinMax(Some(stored), delta(("a", "I", 1e21)),
          rows(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 1e21))
            .select(col("g"), col("v")),
          Seq("g"), "op", "v", wideDecimal = true).collect()
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", was)
    assert(msgChain(e1).contains("overflowed decimal(38,6)"), msgChain(e1))
    // and under ANSI the same fold still fails loudly (natively) —
    // never a silent NULL/0 in either mode
    val e1a = intercept[Exception] {
      IvmFold.foldMinMax(Some(stored), delta(("a", "I", 1e21)),
        rows(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 1e21))
          .select(col("g"), col("v")),
        Seq("g"), "op", "v", wideDecimal = true).collect()
    }
    assert(msgChain(e1a).contains("overflowed decimal(38,6)") ||
      msgChain(e1a).contains("NUMERIC_VALUE_OUT_OF_RANGE"), msgChain(e1a))
    // and a fold that stays under the cap against the same at-cap-ish
    // store still succeeds exactly (the guard fires only on overflow)
    val nearCap = "9999999999999999999999999999999.000000" // one digit down
    val storedOk = spark.range(1).select(
      lit("a").as("g"), lit(2L).as("n"),
      lit(nearCap).cast("decimal(38,6)").as("s"),
      lit(1.0).as("mn"), lit(2.0).as("mx"))
    val ok = IvmFold.foldMinMax(Some(storedOk), delta(("a", "I", 1e21)),
      rows(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 1e21))
        .select(col("g"), col("v")),
      Seq("g"), "op", "v", wideDecimal = true).collect()
    assert(ok.length == 1 && ok.head.getAs[Long]("n") == 3L &&
      ok.head.getAs[java.math.BigDecimal]("s") != null)
  }

  // ---- foldMinMaxWeighted: the composed-chain multiset contract ----

  /** A weighted multiset: (g, v, mult). Its aggregate truth scales n
    * and s by multiplicity; mn/mx range over the distinct values. */
  private def maggOf(ms: Seq[(String, Double, Long)]): DataFrame = {
    import spark.implicits._
    ms.toDF("g", "v", "__mult").groupBy(col("g"))
      .agg(sum(col("__mult")).as("n"),
        sum(col("__mult") * dec(col("v"))).cast("decimal(28,4)").as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
  }

  private def wcheck(before: Seq[(String, Double, Long)],
      d: Seq[(String, Double, Long)],
      after: Seq[(String, Double, Long)]): Unit = {
    import spark.implicits._
    val got = IvmFold.foldMinMaxWeighted(Some(maggOf(before)),
        d.toDF("g", "v", "w"),
        after.toDF("g", "v", "__mult"), Seq("g"), "w", "v")
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = maggOf(after)
      .select(col("g"), col("n"), col("s").cast("double").as("s"),
        col("mn"), col("mx"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want)
  }

  test("weighted: extremum deleted through its multiplicity — re-agg reads the maintained multiset, not a base") {
    // group a: value 9.0 (the max) at multiplicity 2 net-deleted to
    // zero → broken, re-agg from the post-delta multiset; group b:
    // a weight-3 insert merges without re-agg
    wcheck(
      before = Seq(("a", 5.0, 1L), ("a", 9.0, 2L), ("b", 1.0, 4L)),
      d = Seq(("a", 9.0, -2L), ("b", 2.0, 3L)),
      after = Seq(("a", 5.0, 1L), ("b", 1.0, 4L), ("b", 2.0, 3L)))
  }

  test("weighted: partial multiplicity decrease of the extremum — conservative re-agg still exact") {
    wcheck(
      before = Seq(("a", 2.0, 3L), ("a", 8.0, 1L)),
      d = Seq(("a", 2.0, -1L)),
      after = Seq(("a", 2.0, 2L), ("a", 8.0, 1L)))
  }

  test("weighted: brand-new group, group to zero, and mixed-sign batch") {
    wcheck(
      before = Seq(("a", 1.0, 1L), ("b", 4.0, 2L)),
      d = Seq(("c", 7.0, 2L), ("b", 4.0, -2L), ("a", 3.0, 1L)),
      after = Seq(("a", 1.0, 1L), ("a", 3.0, 1L), ("c", 7.0, 2L)))
  }

  test("weighted refusals: zero weight, deletes against a missing group") {
    import spark.implicits._
    val st = maggOf(Seq(("a", 1.0, 1L)))
    val eZero = intercept[Exception](
      IvmFold.foldMinMaxWeighted(Some(st),
        Seq(("a", 1.0, 0L)).toDF("g", "v", "w"),
        Seq.empty[(String, Double, Long)].toDF("g", "v", "__mult"),
        Seq("g"), "w", "v").collect())
    assert(eZero.getMessage.contains("zero/NULL multiplicity"))
    val ePhantom = intercept[Exception](
      IvmFold.foldMinMaxWeighted(Some(st),
        Seq(("z", 5.0, -1L)).toDF("g", "v", "w"),
        Seq.empty[(String, Double, Long)].toDF("g", "v", "__mult"),
        Seq("g"), "w", "v").collect())
    assert(ePhantom.getMessage.contains("never absorbed"))
  }
}
