package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking — row_number / NTILE / PERCENT_RANK / CUME_DIST
  * without a partition-sized sort.
  *
  * The window formulation (`row_number().over(Window.partitionBy(g)
  * .orderBy(v))`) sorts each partition's ENTIRE row set inside one
  * task. That is exact and fast while groups fit an executor
  * partition, but a global band (`Window.orderBy` with no key — the
  * shipped rfm1 shape through round 11) or a giant group (w6's
  * 3-status partitions = a third of the fact table each) cannot
  * survive a 100× scale-up: one task sorts data-sized input.
  *
  * This operator generalizes [[ScalableQuantile]]'s bucket-locate pass
  * from "find 2·|ps| order statistics" to "rank every row":
  *
  *  1. stats pass — count/min/max per partition key (combinable
  *     aggregate);
  *  2. bucket pass — equi-width bucket counts per (part, bucket), then
  *     cumulative counts BELOW each bucket (a window over ≤`buckets`
  *     rows per part, never row-sized);
  *  3. rank pass — row_number within each (part, bucket) — partitions
  *     are 1/`buckets` of the group — plus the bucket's cumulative
  *     offset: global rn = cum_before + in-bucket row_number. One
  *     exchange of the data, keyed on (part, bucket).
  *
  * NTILE / PERCENT_RANK / CUME_DIST are then closed-form from
  * (rn, n) — no further shuffle. Equi-width bucketing is
  * order-consistent (v ≤ w ⇒ bucket(v) ≤ bucket(w)) and ties in the
  * bucketing value land in one bucket, so the within-bucket order by
  * (value, tieCols) completes exactly the total order the window
  * formulation would use. RankParitySpec proves rn/ntile/percent_rank/
  * cume_dist parity with the window functions on tied, constant,
  * single-row, and adversarial shapes; PlanAuditSpec pins the absence
  * of any data-sized single-partition sort in the rewired keys.
  *
  * Numeric bounds: closed-form tile arithmetic runs exact-in-double
  * (longs < 2^53); partitions beyond ~10^15 rows would need the
  * integer `div` form. Bucket and offset frames are |parts|·≤`buckets`
  * rows — they broadcast by design, so keep `parts × buckets` in
  * broadcast range (the operator targets FEW GIANT partitions, the
  * regime where the window form dies; high-cardinality small groups
  * should stay on the window form, same guidance as the quantile
  * pair).
  *
  * Cost at 100 TB: two scans of the fact (stats+buckets, then rank)
  * and ONE keyed exchange on (part, bucket) — vs one exchange feeding
  * a sort that cannot finish.
  */
object ScalableRank {

  private val Reserved = Seq("__rank_b", "__rank_vmin",
    "__rank_vmax", "__rank_cum", "__rank_bn")

  /** Adds `rnCol` — the 1-based row number per `partCols` group under
    * ORDER BY (`valueCol`, `tieCols`…) — and `nCol`, the group row
    * count, with no group-sized sort anywhere. `valueCol` must be
    * numeric (castable to double order-consistently) and non-null
    * (null or NaN fails loudly — they have no place in a total
    * order); `tieCols` must complete a total order within equal
    * values for `rnCol` to be deterministic. Empty `partCols` ranks
    * the whole frame (the global-band case). */
  def withRowNumber(
      df: DataFrame,
      partCols: Seq[String],
      valueCol: String,
      tieCols: Seq[String],
      buckets: Int = 4096,
      rnCol: String = "rn",
      nCol: String = "n"): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(rnCol != nCol, s"rnCol and nCol collide: '$rnCol'")
    (Reserved :+ rnCol :+ nCol).foreach(c =>
      require(!df.columns.contains(c),
        s"input already contains reserved/output column '$c'"))
    val v0 = col(valueCol).cast("double")
    val v = when(v0.isNull || isnan(v0),
      raise_error(lit(s"null/NaN in rank value column '$valueCol' — " +
        "a total order cannot place it; filter first"))).otherwise(v0)

    // the global (no-partition) band takes its own branch: a constant
    // grouping key would be constant-folded into no-key joins
    // (BroadcastNestedLoop over the DATA) and unpartitioned windows —
    // the exact shapes this operator exists to avoid. Here only the
    // 1-row stats cross-join and the ≤`buckets`-row offsets window are
    // global; the data-sized window stays keyed on the bucket.
    val stats =
      if (partCols.isEmpty)
        df.agg(count(lit(1)).as(nCol),
          min(v).as("__rank_vmin"), max(v).as("__rank_vmax"))
      else df.groupBy(partCols.map(col): _*)
        .agg(count(lit(1)).as(nCol),
          min(v).as("__rank_vmin"), max(v).as("__rank_vmax"))

    // order-consistent equi-width bucket id; single-value groups
    // (span 0) take bucket 0 directly — no 0/0 in sight
    val bucketed =
      (if (partCols.isEmpty) df.crossJoin(broadcast(stats))
       else df.join(broadcast(stats), partCols))
        .withColumn("__rank_b",
          when(col("__rank_vmin") === col("__rank_vmax"), lit(0L))
            .otherwise(least(
              floor((v - col("__rank_vmin")) /
                (col("__rank_vmax") - col("__rank_vmin")) * buckets).cast("long"),
              lit(buckets - 1L))))

    // cumulative count BELOW each bucket: windows over ≤`buckets` rows
    // per group — aggregate-sized, never data-sized (the global case's
    // single partition holds at most `buckets` rows by construction)
    val cumW = (if (partCols.isEmpty) Window.partitionBy()
                else Window.partitionBy(partCols.map(col): _*))
      .orderBy(col("__rank_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy((partCols :+ "__rank_b").map(col): _*)
      .agg(count(lit(1)).as("__rank_bn"))
      .withColumn("__rank_cum",
        coalesce(sum(col("__rank_bn")).over(cumW), lit(0L)))
      .select((partCols :+ "__rank_b" :+ "__rank_cum").map(col): _*)

    // the ONE data exchange: hash on (part, bucket); each task sorts
    // only its bucket slice — 1/`buckets` of the group
    val localW = Window.partitionBy((partCols :+ "__rank_b").map(col): _*)
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
    bucketed
      .join(broadcast(offsets), partCols :+ "__rank_b")
      .withColumn(rnCol,
        col("__rank_cum") + row_number().over(localW).cast("long"))
      .drop("__rank_b", "__rank_vmin", "__rank_vmax", "__rank_cum")
  }

  /** Tie-aware SQL ranks for ORDER BY `valueCol` alone (peers = equal
    * values): adds `rank` (= min rn over peers — the window `rank()`)
    * and `peer_max` (= max rn over peers — the numerator of
    * `cume_dist`) via a keyed aggregate + join on (part, value), never
    * a peer-group-sized window. `rnCol`'s tie order stays whatever
    * `tieCols` said; rank/peer_max are tie-order-independent. */
  def withTiedRanks(
      df: DataFrame,
      partCols: Seq[String],
      valueCol: String,
      tieCols: Seq[String],
      buckets: Int = 4096): DataFrame = {
    Seq("rank", "peer_max").foreach(c =>
      require(!df.columns.contains(c),
        s"input already contains output column '$c'"))
    val base = withRowNumber(df, partCols, valueCol, tieCols, buckets)
    val keys = partCols :+ valueCol
    val peers = base.groupBy(keys.map(col): _*)
      .agg(min(col("rn")).as("rank"), max(col("rn")).as("peer_max"))
    base.join(peers, keys)
  }

  /** SQL NTILE(k) closed-form from (rn, n): the first `n mod k` tiles
    * carry `n div k + 1` rows, the rest `n div k`. Exact-in-double
    * long arithmetic (see class note on the 2^53 bound). */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    require(k >= 1, s"NTILE needs k >= 1, got $k")
    val q = floor(n.cast("double") / k).cast("long")
    val r = n - q * k
    when(rn <= (q + 1) * r,
      floor((rn - 1).cast("double") / (q + 1)).cast("long") + 1)
      .otherwise(
        floor((rn - r - 1).cast("double") / greatest(q, lit(1L))).cast("long") + 1)
  }

  /** SQL PERCENT_RANK from (rank, n): (rank − 1)/(n − 1); a single-row
    * partition reads 0.0 per the standard. Integer-ratio IEEE double —
    * bit-identical to any engine's window form. */
  def percentRankOf(rank: Column, n: Column): Column =
    when(n === 1, lit(0.0))
      .otherwise((rank - 1).cast("double") / (n - 1).cast("double"))

  /** SQL CUME_DIST from (peerMax, n) where peerMax is the highest rn
    * among the row's peers (= rn itself under a total order). */
  def cumeDistOf(peerMax: Column, n: Column): Column =
    peerMax.cast("double") / n.cast("double")

  /** One NTILE(k) band over the whole frame ordered by (`valueCol`,
    * `tieCols`) — the rfm1 composition: rank distributed, band
    * closed-form, helper columns dropped. */
  def ntileBand(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      k: Int,
      outCol: String,
      buckets: Int = 4096): DataFrame =
    withRowNumber(df, Nil, valueCol, tieCols, buckets,
      rnCol = "__rank_rn", nCol = "__rank_n")
      .withColumn(outCol, ntileOf(col("__rank_rn"), col("__rank_n"), k))
      .drop("__rank_rn", "__rank_n")
}
