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
