package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact PERCENTILE_CONT at scale — without the per-group total sort.
  *
  * The window formulation (qt2 / DistributionValidator) ranks every
  * row of a group inside ONE partition: exact, but a group that
  * outgrows an executor partition (one column of a 100-TB table) makes
  * that shape unusable — the caveat DistributionValidator documents.
  * This operator computes the SAME exact interpolated quantiles
  * (`vlo + frac·(vhi − vlo)`, `frac = idx − floor(idx)`,
  * `idx = (n−1)·p` over non-null values — the shared IEEE formula, so
  * results are bit-identical to the window shape and the DuckDB
  * mirror) with no group-sized sort anywhere:
  *
  *  1. stats pass — count/min/max per group (combinable aggregate);
  *  2. bucket pass — equi-width bucket counts per group (aggregate,
  *     keyed exchange), then per-group cumulative counts over the
  *     ≤`buckets` bucket rows (a window over BUCKET-count-sized
  *     partitions, never row-sized) locate which bucket holds each
  *     needed order statistic (ranks lo/hi per percentile);
  *  3. candidate pass — only rows falling in a needed (group, bucket)
  *     survive a broadcast semi-join; each candidate bucket is ranked
  *     internally (window partitioned by (group, bucket) — partitions
  *     are bucket-sized, 1/`buckets` of the group) and the order
  *     statistic is picked at its global rank minus the bucket's
  *     cumulative offset.
  *
  * Adversarial shapes: a single-value group (span 0) needs no bucket
  * math — min==max short-circuits to the constant; a heavy-tie bucket
  * (all rows one value) is still ranked only within itself, and ties
  * spanning buckets are safe because equi-width bucketing is
  * order-consistent (v ≤ w ⇒ bucket(v) ≤ bucket(w)). A NaN reaching
  * the bucket pass raises per-row (raise_error inside bucketOf —
  * codegen'd, free on clean data); the one quiet corner is a group
  * that is ENTIRELY NaN, which Spark's NaN==NaN semantics route to
  * the constant short-circuit and faithfully report as NaN.
  *
  * Cost at 100 TB: three scans of the fact and keyed exchanges of
  * per-group/per-bucket aggregates — vs one scan feeding a sort that
  * cannot finish. The candidate pass reads only ~2·|ps| buckets per
  * group ≈ 2·|ps|/`buckets` of the data — PROVIDED the buckets are
  * roughly even. Under a value profile adversarial for equi-width
  * (nearly all mass within an epsilon of one point), the candidate
  * bucket holds ~the whole group and the candidate rank re-becomes a
  * group-sized single-task sort; `equiDepth = true` draws the bucket
  * boundaries from per-group `percentile_approx` in the same stats
  * aggregate instead ([[ScalableRank]]'s shared heapify/heapSearch
  * machinery), making candidate size distribution-independent up to
  * ties. Answers are bit-identical in both modes — the locate uses
  * EXACT bucket counts, so boundary quality never touches correctness.
  *
  * Round 15: [[percentileContAuto]] makes that defense AUTOMATIC, the
  * same discipline as [[ScalableRank.withRowNumberAuto]] — it reads
  * the max bucket share off the EXACT bucket counts the locate
  * computes anyway, and only a collapsed profile (share >
  * [[ScalableRank.SkewShareThreshold]]) pays the equi-depth rebuild.
  */
object ScalableQuantile {

  /** (g, n, vmin, vmax [, __q_bh]) per group — one combinable pass.
    * equi-depth adds heap-ordered per-group percentile_approx
    * boundaries to the SAME aggregate. */
  private def statsOf(rows: DataFrame, buckets: Int,
      equiDepth: Boolean): DataFrame = {
    val heapifyUdf = udf((b: Seq[Double]) => ScalableRank.heapify(b))
    val baseAggs = Seq(count(lit(1)).as("n"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val aggs = if (!equiDepth) baseAggs else baseAggs :+
      heapifyUdf(percentile_approx(col("v"),
        lit((1 until buckets).map(_.toDouble / buckets).toArray),
        lit(10000))).as("__q_bh")
    rows.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
  }

  /** Order-consistent bucket id; vmax clamps into the top bucket so
    * the id stays in [0, buckets). NaN raises per-row. */
  private def bucketOf(value: Column, vmin: Column, vmax: Column,
      buckets: Int, equiDepth: Boolean): Column = {
    val safe = when(isnan(value),
      raise_error(lit("NaN value cannot be ranked — filter NaNs first")))
      .otherwise(value)
    if (equiDepth) ScalableRank.heapSearch(col("__q_bh"), safe, buckets)
    else least(
      floor((safe - vmin) / (vmax - vmin) * buckets).cast("long"),
      lit(buckets - 1L))
  }

  /** The broadcast side of the bucket pass: span>0 groups' (g, vmin,
    * vmax [, boundaries]), with the cell-bound guard in equi-depth
    * mode.
    *
    * equi-depth carries a (buckets-1)-double boundary array per group
    * in the broadcast frame (~32 KB/group at 4096 buckets) — the same
    * driver-OOM vector ScalableRank.MaxBroadcastCells guards on its
    * stats/offsets frames. Enforce the |groups| × buckets cell bound
    * HERE, plan-embedded (a single-task window over the aggregate-
    * sized spanStats, riding a filter so pruning cannot elide it),
    * before the broadcast build could grow unbounded. Without
    * equiDepth the frame is 3 doubles/group — the plain broadcast
    * regime, no guard needed. */
  private def spanStatsOf(stats: DataFrame, buckets: Int,
      equiDepth: Boolean): DataFrame = {
    val spanCols = Seq(col("g"), col("vmin"), col("vmax")) ++
      (if (equiDepth) Seq(col("__q_bh")) else Nil)
    val spanStats0 = stats.filter(col("vmin") =!= col("vmax"))
      .select(spanCols: _*)
    if (!equiDepth) spanStats0
    else spanStats0
      .withColumn("__q_np", count(lit(1)).over(Window.partitionBy()))
      .filter(when(
        col("__q_np") * buckets > ScalableRank.MaxBroadcastCells,
        raise_error(concat(
          lit("high-cardinality groups for equi-depth quantiles: "),
          col("__q_np"),
          lit(s" groups x $buckets boundary cells exceeds the " +
            s"${ScalableRank.MaxBroadcastCells}-cell broadcast bound " +
            "for the stats frame - many small groups are the window " +
            "form's regime (percentileContWindow), or lower `buckets`"))))
        .otherwise(lit(true)))
      .drop("__q_np")
  }

  /** Rows of span>0 groups with their bucket id. */
  private def bucketedOf(rows: DataFrame, spanStats: DataFrame,
      buckets: Int, equiDepth: Boolean): DataFrame =
    rows.join(broadcast(spanStats), Seq("g"))
      .withColumn("b",
        bucketOf(col("v"), col("vmin"), col("vmax"), buckets, equiDepth))

  /** EXACT per-(group, bucket) counts plus the cumulative count BELOW
    * each bucket: a window over ≤`buckets` rows per group, never
    * row-sized. */
  private def bucketCountsOf(bucketed: DataFrame): DataFrame =
    bucketed.groupBy(col("g"), col("b"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("cum_before",
        coalesce(sum(col("bn")).over(Window.partitionBy(col("g"))
          .orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))

  /** Locate + candidate passes given the (possibly pre-materialized)
    * stats and bucket counts; returns the (g, p, value) frame. */
  private def finish(rows: DataFrame, stats: DataFrame,
      spanStats: DataFrame, bucketCounts: DataFrame, groupCol: String,
      ps: Seq[Double], buckets: Int, equiDepth: Boolean): DataFrame = {
    // needed order-statistic ranks per (group, percentile)
    val targets = stats
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", (floor(col("idx")) + 1).cast("long"))
      .withColumn("hi", least(col("lo") + 1, col("n")))

    // single-value groups (span 0, incl. n == 1) need no bucket math
    val constant = targets.filter(col("vmin") === col("vmax"))
      .select(col("g"), col("p"), col("vmin").as("value"))
    val spanned = targets.filter(col("vmin") =!= col("vmax"))

    // which bucket holds each needed rank (both lo and hi) — the
    // targets frame is 2·|ps| rows per group: always broadcastable
    val needed = bucketCounts
      .join(broadcast(spanned
        .select(col("g"), col("p"), col("idx"),
          explode(array(col("lo"), col("hi"))).as("rank"))), Seq("g"))
      .filter(col("rank") > col("cum_before") &&
        col("rank") <= col("cum_before") + col("bn"))
      .select(col("g"), col("p"), col("idx"), col("rank"),
        col("b"), col("cum_before"))

    // rank only within candidate buckets: the semi-join keeps
    // ~2·|ps| buckets per group; window partitions are bucket-sized
    val candBuckets = needed.select(col("g"), col("b")).distinct()
    val ranked = bucketedOf(rows, spanStats, buckets, equiDepth)
      .join(broadcast(candBuckets), Seq("g", "b"), "left_semi")
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("g"), col("b")).orderBy(col("v")))
          .cast("long"))

    val picked = ranked
      .join(broadcast(needed), Seq("g", "b"))
      .filter(col("rk") === col("rank") - col("cum_before"))
      .groupBy(col("g"), col("p"))
      .agg(
        max(when(col("rank") === floor(col("idx")).cast("long") + 1,
          col("v"))).as("vlo"),
        max(col("v")).as("vany"),
        max(col("idx") - floor(col("idx")).cast("double")).as("frac"),
        max(col("rank")).as("rmax"),
        min(col("rank")).as("rmin"))
      // lo == hi (idx integral or at the tail): vlo is the value;
      // otherwise interpolate between the two picked statistics
      .withColumn("vhi",
        when(col("rmax") === col("rmin"), col("vlo")).otherwise(col("vany")))
      .select(col("g"), col("p"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("value"))

    picked.unionByName(constant)
      .withColumnRenamed("g", groupCol)
  }

  private def checkArgs(groupCol: String, ps: Seq[Double], buckets: Int,
      equiDepth: Boolean): Unit = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0, 1], got $ps")
    require(ps.distinct.size == ps.size,
      s"duplicate percentiles would duplicate output rows: $ps")
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    if (equiDepth) require((buckets & (buckets - 1)) == 0,
      s"equi-depth bucketing needs a power-of-two bucket count, got $buckets")
    require(groupCol != "p" && groupCol != "value",
      s"group column '$groupCol' collides with an output column name")
  }

  private def rowsOf(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

  /** Exact interpolated quantiles of `valueCol` per `groupCol` at
    * percentiles `ps`: (group, p, value) — bit-identical to the qt2
    * window formulation. Null values are excluded per SQL convention;
    * a group with no non-null values yields no rows. */
  def percentileCont(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      buckets: Int = 4096,
      equiDepth: Boolean = false): DataFrame = {
    checkArgs(groupCol, ps, buckets, equiDepth)
    val rows = rowsOf(df, groupCol, valueCol)
    val stats = statsOf(rows, buckets, equiDepth)
    val spanStats = spanStatsOf(stats, buckets, equiDepth)
    val bucketCounts =
      bucketCountsOf(bucketedOf(rows, spanStats, buckets, equiDepth))
    finish(rows, stats, spanStats, bucketCounts, groupCol, ps, buckets,
      equiDepth)
  }

  /** [[percentileCont]] with the SKEW SELF-DEFENSE of
    * [[ScalableRank.withRowNumberAuto]] (round 15): materialize the
    * equi-width stats and exact bucket counts the locate needs ANYWAY
    * (two eager localCheckpoints — the same two data scans the lazy
    * plan performs), read the max bucket share among span>0 groups off
    * them, and only a collapsed profile (share >
    * [[ScalableRank.SkewShareThreshold]] — the candidate pass would
    * re-become a group-sized single-task sort) pays the equi-depth
    * rebuild, with `buckets` rounded UP to a power of two for the heap
    * descent. A clean profile threads the already-computed frames into
    * the locate: SAME total scan count as percentileCont. Answers are
    * bit-identical in all paths; only the candidate-size balance
    * guarantee differs.
    *
    * EAGER contract: builds run Spark jobs at DAG-build time (the
    * checkpoints + the aggregate-sized share read) — NaN refusal fires
    * then, and the switch branch releases its probe blocks eagerly
    * while the clean branch's live until the returned plan's RDDs go
    * unreachable. Not for hot per-batch callers. */
  def percentileContAuto(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      buckets: Int = 4096): DataFrame = {
    checkArgs(groupCol, ps, buckets, equiDepth = false)
    val rows = rowsOf(df, groupCol, valueCol)
    val stats = statsOf(rows, buckets, equiDepth = false).localCheckpoint()
    val spanStats = spanStatsOf(stats, buckets, equiDepth = false)
    val bucketCounts = bucketCountsOf(
      bucketedOf(rows, spanStats, buckets, equiDepth = false))
      .localCheckpoint()
    // max bucket share among span>0 groups — aggregate-sized
    // arithmetic over the two materialized frames, no data touched
    // (span-0 groups hold all rows in the constant short-circuit by
    // design; equi-depth could not spread pure ties anyway)
    val shareRow = bucketCounts
      .join(broadcast(stats.select(col("g"), col("n"))), Seq("g"))
      .agg(max(col("bn").cast("double") / col("n")))
      .head()
    val maxShare = if (shareRow.isNullAt(0)) 0.0 else shareRow.getDouble(0)
    if (maxShare > ScalableRank.SkewShareThreshold) {
      // the equi-depth rebuild reads neither probe frame — release
      // their checkpoint blocks now instead of waiting out the GC
      ScalableRank.release(stats); ScalableRank.release(bucketCounts)
      percentileCont(df, groupCol, valueCol, ps,
        ScalableRank.nextPow2(buckets), equiDepth = true)
    } else
      finish(rows, stats, spanStats, bucketCounts, groupCol, ps, buckets,
        equiDepth = false)
  }

  /** The WINDOW formulation of the same interpolation — one keyed
    * exchange + per-group sort, same (group, p, value) output,
    * bit-identical values (ScalableQuantileSpec proves it on every
    * tested shape). This is the faster shape while groups fit a
    * partition (measured crossover ≈ 20M rows/group on the bench host,
    * SCALING.md); [[percentileCont]] is the giant-group path. Unlike
    * percentileCont, a NaN does not fail loudly here (it sorts last
    * and poisons the tail percentiles) — keep NaN-free inputs. */
  def percentileContWindow(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0, 1], got $ps")
    require(ps.distinct.size == ps.size,
      s"duplicate percentiles would duplicate output rows: $ps")
    require(groupCol != "p" && groupCol != "value",
      s"group column '$groupCol' collides with an output column name")
    val rows = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("g"))
    rows
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", (floor(col("idx")) + 1).cast("long"))
      .withColumn("hi", least(col("lo") + 1, col("n")))
      .filter(col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(col("g"), col("p"))
      .agg(
        max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"),
        max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
      .select(col("g"), col("p"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("value"))
      .withColumnRenamed("g", groupCol)
  }
}
