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
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(s) <= col(e))
      .withColumn("__bin",
        explode(sequence(floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, keys :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("__bin")
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
