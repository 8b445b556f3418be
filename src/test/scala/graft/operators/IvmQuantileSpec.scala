package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IvmQuantile: the maintained counts ⊕ delta plus the candidate-
  * bucket locate must equal the sort-based PERCENTILE_CONT over the
  * post-delta rows BIT-FOR-BIT — across CDC shapes (inserts, deletes,
  * mixed, groups emptied), bucket-boundary and duplicated values,
  * lo/hi order statistics landing in different buckets, and loud
  * contract violations (op domain, out-of-domain values, never-
  * absorbed deletes). */
class IvmQuantileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-quantile")
  import IvmQuantile._

  private val Lo = 0.0; private val Hi = 100.0; private val B = 8
  private val Ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  private def rows(t: (String, Double)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "v")
  }
  private def delta(t: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    t.toSeq.toDF("g", "op", "v")
  }

  /** The sort-based truth — qt2's explicit interpolation over a window
    * rank, computed per group. */
  private def recompute(after: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    after.filter(col("v").isNotNull)
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
        (col("vlo").cast("double") +
          col("frac") * (col("vhi") - col("vlo")).cast("double")).as("value"))
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** counts(before) ⊕ delta, located over `after`, must equal the
    * sort-based recompute over `after` bitwise. */
  private def check(before: DataFrame, d: DataFrame, after: DataFrame): Unit = {
    val c0 = countsOf(before, Seq("g"), "v", Lo, Hi, B)
    val c1 = foldCounts(Some(c0), d, Seq("g"), "op", "v", Lo, Hi, B)
    val got = percentileCont(c1, after, Seq("g"), "v", Ps, Lo, Hi, B)
    assert(sorted(got) == sorted(recompute(after)))
    // the counts invariant: folded counts ≡ counts of the after-rows
    assert(sorted(c1) == sorted(countsOf(after, Seq("g"), "v", Lo, Hi, B)))
  }

  test("mixed CDC: inserts and deletes across buckets stay bit-identical to the sort form") {
    val before = rows(("a", 1.0), ("a", 13.0), ("a", 47.5), ("a", 99.0),
      ("a", 50.0), ("b", 25.0), ("b", 75.0))
    check(before,
      delta(("a", "D", 13.0), ("a", "I", 62.25), ("a", "I", 3.0),
        ("b", "D", 75.0), ("b", "I", 10.0), ("b", "I", 90.0)),
      rows(("a", 1.0), ("a", 47.5), ("a", 99.0), ("a", 50.0),
        ("a", 62.25), ("a", 3.0), ("b", 25.0), ("b", 10.0), ("b", 90.0)))
  }

  test("boundary and duplicated values: domain edges, bucket edges, heavy ties") {
    val before = rows(("a", 0.0), ("a", 100.0), ("a", 12.5), ("a", 12.5),
      ("a", 12.5), ("a", 25.0), ("a", 87.5))
    check(before,
      delta(("a", "D", 12.5), ("a", "I", 12.5), ("a", "I", 0.0),
        ("a", "D", 100.0)),
      rows(("a", 0.0), ("a", 12.5), ("a", 12.5), ("a", 12.5),
        ("a", 25.0), ("a", 87.5), ("a", 0.0)))
  }

  test("a group deleted to zero vanishes from the counts; single-row groups interpolate to themselves") {
    val before = rows(("a", 42.0), ("b", 7.0), ("b", 9.0))
    val d = delta(("a", "D", 42.0), ("c", "I", 55.0))
    val after = rows(("b", 7.0), ("b", 9.0), ("c", 55.0))
    check(before, d, after)
    val c1 = foldCounts(Some(countsOf(before, Seq("g"), "v", Lo, Hi, B)),
      d, Seq("g"), "op", "v", Lo, Hi, B)
    assert(c1.filter(col("g") === "a").count() == 0)
  }

  test("multi-fold chain stays exact as counts thread through") {
    var cur = rows(("a", 10.0), ("a", 20.0), ("a", 30.0))
    var counts = countsOf(cur, Seq("g"), "v", Lo, Hi, B)
    val steps = Seq(
      (delta(("a", "I", 40.0), ("a", "D", 10.0)),
        rows(("a", 20.0), ("a", 30.0), ("a", 40.0))),
      (delta(("a", "I", 5.0), ("a", "I", 95.0), ("a", "D", 30.0)),
        rows(("a", 20.0), ("a", 40.0), ("a", 5.0), ("a", 95.0))))
    steps.foreach { case (d, after) =>
      counts = foldCounts(Some(counts), d, Seq("g"), "op", "v", Lo, Hi, B)
        .localCheckpoint(true)
      val got = percentileCont(counts, after, Seq("g"), "v", Ps, Lo, Hi, B)
      assert(sorted(got) == sorted(recompute(after)))
      cur = after
    }
  }

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("contract violations are loud: op domain, out-of-domain value, never-absorbed delete") {
    val before = rows(("a", 10.0))
    val c0 = countsOf(before, Seq("g"), "v", Lo, Hi, B)
    val e1 = intercept[Exception] {
      foldCounts(Some(c0), delta(("a", "U", 10.0)),
        Seq("g"), "op", "v", Lo, Hi, B).collect()
    }
    assert(msgChain(e1).contains("outside {I, D}"), msgChain(e1))
    val e2 = intercept[Exception] {
      foldCounts(Some(c0), delta(("a", "I", 101.0)),
        Seq("g"), "op", "v", Lo, Hi, B).collect()
    }
    assert(msgChain(e2).contains("declared domain"), msgChain(e2))
    val e3 = intercept[Exception] {
      foldCounts(Some(c0), delta(("a", "D", 90.0)),
        Seq("g"), "op", "v", Lo, Hi, B).collect()
    }
    assert(msgChain(e3).contains("never absorbed"), msgChain(e3))
  }

  test("oversized candidate frame fails loudly — never an anonymous broadcast OOM") {
    val before = rows(("a", 10.0), ("b", 20.0), ("c", 30.0))
    val c0 = countsOf(before, Seq("g"), "v", Lo, Hi, B)
    val e = intercept[Exception] {
      percentileCont(c0, before, Seq("g"), "v", Seq(0.5), Lo, Hi, B,
        maxCandidates = 2).collect()
    }
    assert(msgChain(e).contains("broadcast bound"), msgChain(e))
    // within the bound: clean answers, guard column gone
    val out = percentileCont(c0, before, Seq("g"), "v", Seq(0.5), Lo, Hi, B,
      maxCandidates = 3)
    assert(!out.columns.contains("__qcand_n"))
    assert(out.count() == 3)
  }

  test("null values are ignored per SQL percentile convention") {
    import spark.implicits._
    val before = Seq(("a", Some(10.0)), ("a", None)).toDF("g", "v")
    val d = Seq(("a", "I", Option.empty[Double]), ("a", "I", Some(30.0)))
      .toDF("g", "op", "v")
    val after = Seq(("a", Some(10.0)), ("a", None), ("a", None),
      ("a", Some(30.0))).toDF("g", "v")
    val c1 = foldCounts(Some(countsOf(before, Seq("g"), "v", Lo, Hi, B)),
      d, Seq("g"), "op", "v", Lo, Hi, B)
    val got = percentileCont(c1, after, Seq("g"), "v", Seq(0.5), Lo, Hi, B)
      .collect()
    assert(got.length == 1 && got.head.getDouble(2) == 20.0)
  }
}
