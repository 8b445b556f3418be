package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: all (left, right) pairs with the same key whose
  * timestamps lie within `delta` of each other — the bounded-interval
  * join Spark plans as a full cross product per key if written as a
  * plain inequality condition.
  *
  * Implementation is bucket-and-probe: both sides bucket time into
  * `delta`-wide bins; a pair within `delta` must land in the same or an
  * adjacent bin, so the left side explodes to its 3 candidate bins and
  * equi-joins on (key, bin) — a hash join the optimizer can shuffle or
  * broadcast normally — then the exact |lt − rt| ≤ delta filter prunes
  * the bin edges. Cost scales with true pair density, never |L|×|R|.
  */
object RangeJoin {

  /** Interval OVERLAP join: all same-key (left, right) pairs whose
    * closed numeric intervals intersect (`ls <= re && rs <= le`) — the
    * second interval shape the warehouse carries (validity windows,
    * promotion periods, session spans) that a plain inequality join
    * turns into a per-key cross product.
    *
    * Bucket-and-probe like [[banded]]: both sides explode each
    * interval across the `bucketWidth`-wide bins it covers and
    * equi-join on (keys, bin). A pair sharing several bins would
    * duplicate, so the exact filter keeps only the row in the FIRST
    * shared bin (`floor(max(ls, rs) / W)`) — exact dedup with no
    * distinct pass. Explode factor is interval-length / W: size
    * `bucketWidth` near the typical interval length so each interval
    * covers O(1) bins; cost then scales with true overlap density,
    * never |L|×|R|. Inverted rows (start > end) denote the EMPTY
    * interval and are excluded up front — the set-semantics answer
    * (empty overlaps nothing), and it also keeps Spark's `sequence`
    * from silently generating descending bins for them. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"need bucketWidth >= 1, got $bucketWidth")
    // EXACT integer floor-division for binning: `Column./` is double
    // division, so coordinates past 2^53 (nanosecond epochs) would bin
    // inconsistently with the first-shared-bin dedup filter and silently
    // drop or duplicate pairs. (a - pmod(a, W)) is exactly divisible by
    // W, so integral `div` (truncating) equals floor for any sign.
    def binOf(c: org.apache.spark.sql.Column) =
      call_function("div", c.cast("long") - pmod(c.cast("long"), lit(bucketWidth)),
        lit(bucketWidth))
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(s) <= col(e))
      .withColumn("__bin", explode(sequence(binOf(col(s)), binOf(col(e)))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, keys :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === binOf(greatest(col(lStart), col(rStart))))
      .drop("__bin")
  }

  /** [[intervalOverlap]] with a DERIVED `bucketWidth` — the caller-set
    * width is the family's one footgun (too narrow explodes each
    * interval across many bins; too wide packs unrelated intervals into
    * per-bin cross products). The default is the approximate 75th
    * percentile of interval length over BOTH sides (one combinable
    * `approx_percentile` aggregate — constant-size sketch state, a tiny
    * pre-pass at any scale): at W = p75 at least three quarters of
    * intervals cover ≤ 2 bins (explode factor O(1)), and the long tail
    * pays bins proportional to its true time coverage — which is the
    * honest cost model, a long interval genuinely meets more
    * candidates. Empty inputs (or all-empty intervals) fall back to
    * width 1 — there is nothing to explode. Pass the explicit overload
    * when the caller knows the domain's natural granularity. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String): DataFrame = {
    val lens = left
      .select((col(lEnd).cast("long") - col(lStart).cast("long") + 1L).as("__len"))
      .unionByName(right.select(
        (col(rEnd).cast("long") - col(rStart).cast("long") + 1L).as("__len")))
      .filter(col("__len") >= 1L)
    val p75 = lens.agg(expr("approx_percentile(__len, 0.75)")).collect()(0)
    val width = if (p75.isNullAt(0)) 1L else math.max(1L, p75.getLong(0))
    intervalOverlap(left, right, keys, lStart, lEnd, rStart, rEnd, width)
  }

  /** Pairs with `abs(leftTs - rightTs) <= delta` (seconds), equi on
    * `keys`. Timestamps compare at second precision (unix_timestamp). */
  def banded(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      deltaSeconds: Long): DataFrame = {
    val l = left
      .withColumn("__lsec", unix_timestamp(col(leftTs)))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bin", col("__off") + floor(col("__lsec") / deltaSeconds))
      .drop("__off")
    val r = right
      .withColumn("__rsec", unix_timestamp(col(rightTs)))
      .withColumn("__bin", floor(col("__rsec") / deltaSeconds))
    l.join(r, keys :+ "__bin")
      .filter(abs(col("__lsec") - col("__rsec")) <= deltaSeconds)
      .drop("__bin", "__lsec", "__rsec")
  }
}
