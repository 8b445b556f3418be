package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScalableRank must equal the window functions row-for-row — same
  * rn under a total order, same NTILE bands, same percent_rank /
  * cume_dist doubles — on tied, constant, single-row, skewed, and
  * global (no-partition) shapes. The operator exists so these answers
  * survive giant partitions; parity with the partition-sized-sort form
  * is the correctness bar.
  */
class ScalableRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "rank-parity")
  import ScalableRank._

  /** Deterministic adversarial frame: 3 uneven groups, heavy value
    * ties (v = i² mod 13 — collisions galore), unique tie-breaker. */
  private def frame(rows: Int): DataFrame = {
    import spark.implicits._
    (0 until rows).map { i =>
      (if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c",
        (i * i) % 13, i.toLong)
    }.toDF("g", "v", "id")
  }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val w = want.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(g.length == w.length, s"row counts differ: ${g.length} vs ${w.length}")
    g.zip(w).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("rn equals row_number over (v, id) per group — heavy ties, uneven groups, small buckets") {
    val df = frame(500)
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 4)
      .select(col("g"), col("id"), col("rn"), col("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("id"), col("rn"), col("n"))
    assertSameRows(got, want)
  }

  test("global frame (empty partCols) equals the no-partition window") {
    val df = frame(301)
    val got = withRowNumber(df, Nil, "v", Seq("id"), buckets = 8)
      .select(col("id"), col("rn"))
    val want = df
      .withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    assertSameRows(got, want)
  }

  test("ntileOf matches window NTILE for k in 1..9 including k > n") {
    val df = frame(47) // n per group: 29/14/4 — k > n hits the 'c' group
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val base = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 4)
    for (k <- 1 to 9) {
      val got = base.select(col("g"), col("id"),
        ntileOf(col("rn"), col("n"), k).as("t"))
      val want = df.select(col("g"), col("id"),
        ntile(k).over(w).cast("long").as("t"))
      assertSameRows(got, want)
    }
  }

  test("percentRankOf / cumeDistOf equal the window doubles under a total order (bit-identical)") {
    val df = frame(200)
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 4)
      .select(col("g"), col("id"),
        percentRankOf(col("rn"), col("n")).as("pr"),
        cumeDistOf(col("rn"), col("n")).as("cd"))
    val want = df.select(col("g"), col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    assertSameRows(got, want) // Seq equality on doubles = bitwise-equal values
  }

  test("withTiedRanks: rank and cume_dist match the value-only window with peers") {
    val df = frame(300)
    val wVal = Window.partitionBy(col("g")).orderBy(col("v"))
    val got = withTiedRanks(df, Seq("g"), "v", Seq("id"), buckets = 4)
      .select(col("g"), col("id"), col("rank"),
        percentRankOf(col("rank"), col("n")).as("pr"),
        cumeDistOf(col("peer_max"), col("n")).as("cd"))
    val want = df.select(col("g"), col("id"),
      rank().over(wVal).cast("long").as("rank"),
      percent_rank().over(wVal).as("pr"), cume_dist().over(wVal).as("cd"))
    assertSameRows(got, want)
  }

  test("degenerate shapes: single-row group, constant-value group, two rows") {
    import spark.implicits._
    val df = Seq(("solo", 5, 1L), ("const", 7, 2L), ("const", 7, 3L),
      ("const", 7, 4L), ("two", 1, 5L), ("two", 9, 6L))
      .toDF("g", "v", "id")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 2)
      .select(col("g"), col("id"), col("rn"),
        ntileOf(col("rn"), col("n"), 4).as("t"),
        percentRankOf(col("rn"), col("n")).as("pr"))
    val want = df.select(col("g"), col("id"),
      row_number().over(w).cast("long").as("rn"),
      ntile(4).over(w).cast("long").as("t"),
      percent_rank().over(w).as("pr"))
    assertSameRows(got, want)
  }

  test("ntileOf satisfies the SQL NTILE definition for seeded-random (n, k) up to k=1000") {
    // independent of Spark's window ntile (covered for k ≤ 9 above):
    // check the closed form against the DEFINITION — tiles are
    // monotone non-decreasing in rn, range over [1, min(k, n)], and
    // the first (n mod k) tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋.
    // One Spark job for all cases: rows are (case, n, k, rn).
    import spark.implicits._
    val rnd = new scala.util.Random(12021)
    val cases = Seq((1L, 1), (1L, 5), (2L, 1000), (1000L, 1000)) ++
      Seq.fill(60)((rnd.nextInt(2000).toLong + 1, rnd.nextInt(1000) + 1))
    val rows = cases.zipWithIndex.flatMap { case ((n, k), c) =>
      (1L to n).map(rn => (c, n, k, rn))
    }.toDF("c", "n", "k", "rn")
    // ntileOf takes a literal k — group the single pass by distinct k
    val got = cases.map(_._2).distinct.map { k =>
      rows.filter(col("k") === k)
        .withColumn("t", ntileOf(col("rn"), col("n"), k))
    }.reduce(_ unionByName _)
      .collect().map(r => (r.getInt(0), (r.getLong(3), r.getLong(4))))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sortBy(_._1) }
    cases.zipWithIndex.foreach { case ((n, k), c) =>
      val tiles = got(c).map(_._2)
      val (q, r) = (n / k, n % k)
      assert(tiles.head == 1L && tiles.last == math.min(k.toLong, n),
        s"case ($n, $k): tile range ${tiles.head}..${tiles.last}")
      assert(tiles.zip(tiles.tail).forall { case (a, b) => b == a || b == a + 1 },
        s"case ($n, $k): tiles skip or decrease")
      val sizes = tiles.groupBy(identity).view.mapValues(_.length.toLong).toMap
      sizes.foreach { case (t, sz) =>
        val want = if (t <= r) q + 1 else q
        assert(sz == want, s"case ($n, $k): tile $t has $sz rows, want $want")
      }
    }
  }

  test("null or NaN in the value column fails loudly — a total order cannot place them") {
    import spark.implicits._
    val withNull = Seq(("a", Some(1.0), 1L), ("a", None, 2L))
      .toDF("g", "v", "id")
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception] {
      withRowNumber(withNull, Seq("g"), "v", Seq("id")).collect()
    }
    assert(msgChain(e1).contains("total order"), msgChain(e1))
    val withNaN = Seq(("a", 1.0, 1L), ("a", Double.NaN, 2L)).toDF("g", "v", "id")
    val e2 = intercept[Exception] {
      withRowNumber(withNaN, Seq("g"), "v", Seq("id")).collect()
    }
    assert(msgChain(e2).contains("total order"), msgChain(e2))
  }

  test("reserved/output column collisions are refused up front") {
    import spark.implicits._
    val df = Seq((1, 2L)).toDF("v", "rn")
    intercept[IllegalArgumentException] {
      withRowNumber(df, Nil, "v", Nil)
    }
  }
}
