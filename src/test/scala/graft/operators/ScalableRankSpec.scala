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
@org.scalatest.tags.Slow
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

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("high-cardinality partition keys fail LOUDLY inside the plan — never a broadcast OOM (r13 enforced contract)") {
    import spark.implicits._
    // 3000 distinct keys × 4096 default buckets = 12.3M cells > the 8M
    // bound: the guard must name the remedy, off the STATS frame (3000
    // rows), before any offsets broadcast exists
    val df = (0 until 3000).map(i => (s"g$i", i % 7, i.toLong))
      .toDF("g", "v", "id")
    val e = intercept[Exception] {
      withRowNumber(df, Seq("g"), "v", Seq("id")).collect()
    }
    assert(msgChain(e).contains("high-cardinality"), msgChain(e))
    assert(msgChain(e).contains("window"), msgChain(e))
    // the same frame ranks fine when buckets shrink the cell product,
    // and through the window form — the named remedies both work
    val viaBuckets = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 2)
      .select(col("g"), col("id"), col("rn"))
    val viaWindow = windowRowNumber(df, Seq("g"), "v", Seq("id"))
      .select(col("g"), col("id"), col("rn"))
    assertSameRows(viaBuckets, viaWindow)
  }

  test("windowRowNumber equals withRowNumber on the adversarial frame — same contract, two shapes") {
    val df = frame(500)
    val got = windowRowNumber(df, Seq("g"), "v", Seq("id"))
      .select(col("g"), col("id"), col("rn"), col("n"))
    val want = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 4)
      .select(col("g"), col("id"), col("rn"), col("n"))
    assertSameRows(got, want)
    // and the window form refuses null/NaN like the bucket form
    import spark.implicits._
    val withNaN = Seq(("a", 1.0, 1L), ("a", Double.NaN, 2L)).toDF("g", "v", "id")
    val e = intercept[Exception] {
      windowRowNumber(withNaN, Seq("g"), "v", Seq("id")).collect()
    }
    assert(msgChain(e).contains("total order"), msgChain(e))
  }

  test("double-range span (vmax − vmin would overflow to Infinity) still buckets and ranks exactly") {
    import spark.implicits._
    // the un-halved formula computes span = Inf ⇒ every bucket = 0 —
    // silent degradation to a single-task sort; the halved formula
    // keeps the span finite and the buckets spread while ranking the
    // same
    val vals = Seq(-1.7e308, -8.5e307, -42.0, 0.0, 1.0, 99.5, 8.5e307, 1.7e308)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "id")
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 4)
      .select(col("id"), col("rn"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .select(col("id"), col("rn"))
    assertSameRows(got, want)
  }

  test("string order keys: bucket form equals the window form, incl. common-prefix-heavy and multi-byte data") {
    import spark.implicits._
    val strs = Seq("", "a", "ab", "abc", "b", "prefix_common_000",
      "prefix_common_001", "prefix_common_0010", "prefix_common_999",
      "z", "éclair", "ﬀ", "中文", "中", "  leading", "a nul") ++
      (0 until 200).map(i => f"prefix_common_$i%03d")
    val df = strs.zipWithIndex.map { case (s, i) => ("g", s, i.toLong) }
      .toDF("g", "v", "id")
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 8)
      .select(col("id"), col("rn"), col("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("id"), col("rn"), col("n"))
    assertSameRows(got, want)
    // global band over strings too (the rfm1-like composition)
    val gotG = withRowNumber(df, Nil, "v", Seq("id"), buckets = 8)
      .select(col("id"), col("rn"))
    val wantG = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    assertSameRows(gotG, wantG)
  }

  test("withRowNumberAuto picks the shape from Catalyst's estimate — both shapes reachable, answers identical") {
    import spark.implicits._
    val df = frame(400)
    // forced decisions answer identically (the auto is a plan choice)
    val viaBucket = withRowNumberAuto(df, Seq("g"), "v", Seq("id"),
      bucketRank = Some(true)).select(col("g"), col("id"), col("rn"))
    val viaWindow = withRowNumberAuto(df, Seq("g"), "v", Seq("id"),
      bucketRank = Some(false)).select(col("g"), col("id"), col("rn"))
    assertSameRows(viaBucket, viaWindow)
    // estimate-driven: a small frame stays on the window form (no
    // bucket key anywhere in the plan); a frame whose estimate tops
    // AutoBucketRankBytes flips to the bucket lattice
    assert(!autoBucketRank(df))
    val small = withRowNumberAuto(df, Seq("g"), "v", Seq("id"))
    assert(!small.queryExecution.optimizedPlan.toString.contains("__rank_b"))
    val big = spark.range(0, 10L * 1000 * 1000).toDF("id")
      .select((col("id") % 3).cast("string").as("g"),
        (col("id") % 9973).as("v"), col("id"))
    assert(autoBucketRank(big))
    val bigPlan = withRowNumberAuto(big, Seq("g"), "v", Seq("id"))
    assert(bigPlan.queryExecution.optimizedPlan.toString.contains("__rank_b"))
  }

  test("heapify is the breadth-first reorder; heapSearch counts boundaries <= v exactly") {
    import spark.implicits._
    assert(heapify(Seq(1d, 2d, 3d, 4d, 5d, 6d, 7d)) ==
      Seq(4d, 2d, 6d, 1d, 3d, 5d, 7d))
    assert(heapify(Seq(10d)) == Seq(10d))
    intercept[IllegalArgumentException](heapify(Seq(1d, 2d)))
    // descent result == |{boundaries ≤ v}| for every probe, ties and
    // duplicate boundaries included
    val rnd = new scala.util.Random(130313)
    for (d <- Seq(2, 8, 16)) {
      val sorted = Seq.fill(d - 1)(rnd.nextInt(20).toDouble).sorted
      val probes = (-1 to 20).map(_.toDouble)
      val got = probes.toDF("v")
        .withColumn("b", heapSearch(typedlit(heapify(sorted)), col("v"), d))
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      probes.foreach(v =>
        assert(got(v) == sorted.count(_ <= v).toLong, s"d=$d v=$v"))
    }
  }

  test("equi-depth mode: identical answers on adversarial skew, balanced buckets where equi-width collapses") {
    import spark.implicits._
    // pathological profile: 99% of the mass within 1e-9 of zero plus a
    // lone huge outlier — equi-width puts everything in bucket 0
    val df = ((0 until 2000).map(i => ("a", i.toDouble * 1e-12, i.toLong)) :+
      (("a", 1e9, 9999L))).toDF("g", "v", "id")
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 16,
        equiDepth = true)
      .select(col("g"), col("id"), col("rn"), col("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("id"), col("rn"), col("n"))
    assertSameRows(got, want)
    // balance, measured with each mode's own bucket function: the
    // equi-width histogram concentrates ~everything in one bucket,
    // the quantile-boundary histogram caps every bucket far below it
    val stats = df.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      percentile_approx(col("v"),
        lit((1 until 16).map(_.toDouble / 16).toArray), lit(10000)).as("bnd"))
    val withStats = df.crossJoin(broadcast(stats))
    def maxShare(bucket: org.apache.spark.sql.Column): Double = {
      val counts = withStats.groupBy(bucket.as("b")).count()
        .agg(max(col("count"))).head.getLong(0)
      counts.toDouble / df.count()
    }
    val widthBucket = least(floor((col("v") / 2 - col("mn") / 2) /
      (col("mx") / 2 - col("mn") / 2) * 16).cast("long"), lit(15L))
    val depthBucket = heapSearch(
      udf((b: Seq[Double]) => heapify(b)).apply(col("bnd")), col("v"), 16)
    assert(maxShare(widthBucket) > 0.99, "equi-width should collapse here")
    assert(maxShare(depthBucket) < 0.25, "equi-depth should spread the mass")
  }

  test("equi-depth mode: parity on the tied multi-group frame and the string/global shapes") {
    val df = frame(500)
    val got = withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 8,
        equiDepth = true)
      .select(col("g"), col("id"), col("rn"), col("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("id"), col("rn"), col("n"))
    assertSameRows(got, want)
    // global (no partition) + equi-depth
    val gotG = withRowNumber(df, Nil, "v", Seq("id"), buckets = 4,
        equiDepth = true).select(col("id"), col("rn"))
    val wantG = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    assertSameRows(gotG, wantG)
    // non-power-of-two bucket count is refused up front
    intercept[IllegalArgumentException](
      withRowNumber(df, Seq("g"), "v", Seq("id"), buckets = 12,
        equiDepth = true))
  }

  test("equi-depth plumbs through the composed faces (withTiedRanks, ntileBand, auto)") {
    val df = frame(400)
    // tied ranks: depth-bucketed base must agree with the window peers
    val got = withTiedRanks(df, Seq("g"), "v", Seq("id"), buckets = 8,
        equiDepth = true)
      .select(col("g"), col("id"), col("rank"), col("peer_max"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("rank",
        min(col("rn")).over(Window.partitionBy(col("g"), col("v"))))
      .withColumn("peer_max",
        max(col("rn")).over(Window.partitionBy(col("g"), col("v"))))
      .select(col("g"), col("id"), col("rank"), col("peer_max"))
    assertSameRows(got, want)
    // ntile band: forced bucket shape + equi-depth equals the window NTILE
    val gotBand = ntileBand(df, "v", Seq("id"), 4, "band", buckets = 8,
        bucketRank = Some(true), equiDepth = true)
      .select(col("id"), col("band"))
    val wantBand = df
      .withColumn("band",
        ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("band"))
    assertSameRows(gotBand, wantBand)
  }
}
