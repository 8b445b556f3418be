package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Null-safe equi-join (`<=>` / `IS NOT DISTINCT FROM`) without the
  * null hot key — the scale-safe form of the Teradata/Oracle
  * `NULL = NULL` migration semantics (j11's documented hazard, shipped
  * as an operator).
  *
  * A plain `<=>` join hashes NULL as ONE key: every null-key row of
  * both sides lands in a single task and cross-products there — the
  * join finishes at test scale and dies at volume. The decomposition:
  *
  *  - **value leg** — both sides filtered `IS NOT NULL`, plain
  *    equi-join: hash-partitioned across the value keys, no null
  *    bucket anywhere (AQE/salting apply normally if a VALUE key is
  *    hot);
  *  - **null leg** — the two null buckets cross-product (that IS the
  *    semantics: every left null matches every right null). The RIGHT
  *    null bucket broadcasts, so the product parallelizes over the
  *    left null rows' partitions instead of serializing in one task.
  *
  * Union of the legs ≡ the `<=>` join row-for-row, multiplicities
  * included (NullSafeJoinSpec proves it on null-heavy and duplicate-key
  * shapes; the j11 oracle pins it against DuckDB's
  * `IS NOT DISTINCT FROM`).
  *
  * Caller contract at scale: the RIGHT side's null bucket must fit a
  * broadcast (null keys are typically a small dirty fraction). Round
  * 13: that contract is ENFORCED — a plan-embedded count over the null
  * bucket (a single-task window over the bucket alone, spill-safe)
  * refuses past `maxBroadcastNulls` with the remedies named, instead
  * of surfacing as a broadcast OOM deep in an anonymous build. If the
  * LEFT bucket is the small one, flip the call; if neither fits, pass
  * `broadcastNulls = false` for a partition-pairwise cartesian null
  * leg (both sides stay distributed; the quadratic OUTPUT is the `<=>`
  * semantics itself — a data question no plan shape can save).
  */
object NullSafeJoin {

  /** Row ceiling for the broadcast null bucket. 4M rows ≈ tens-to-
    * hundreds of MB at typical widths — inside the broadcast range
    * while catching a null-heavy right side long before the driver
    * feels it. */
  val MaxBroadcastNulls: Long = 4L * 1000 * 1000

  /** Inner null-safe equi-join of `left` and `right` on
    * `leftKey <=> rightKey`. Output columns: left's then right's, like
    * the plain join. Key names must differ so the output is
    * unambiguous (rename before joining, as any self-join would). */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      broadcastNulls: Boolean = true,
      maxBroadcastNulls: Long = MaxBroadcastNulls): DataFrame = {
    require(leftKey != rightKey,
      s"leftKey and rightKey share the name '$leftKey' — the output " +
        "would carry an ambiguous duplicate column; rename one side first")
    require(!right.columns.contains("__nsj_cnt"),
      "right side already contains reserved column '__nsj_cnt'")
    val valueLeg = left.filter(col(leftKey).isNotNull)
      .join(right.filter(col(rightKey).isNotNull),
        col(leftKey) === col(rightKey))
    val leftNulls = left.filter(col(leftKey).isNull)
    val rightNulls = right.filter(col(rightKey).isNull)
    val nullLeg =
      if (!broadcastNulls) leftNulls.crossJoin(rightNulls)
      else {
        // the enforced contract: count rides a filter over the null
        // bucket (column pruning cannot elide a filter input), so an
        // oversized bucket fails HERE, loudly, before the broadcast
        // build — not as a driver OOM with this operator nowhere in
        // the stack
        val guarded = rightNulls
          .withColumn("__nsj_cnt",
            count(lit(1)).over(Window.partitionBy()))
          .filter(when(col("__nsj_cnt") > maxBroadcastNulls,
            raise_error(concat(
              lit("right null bucket holds "), col("__nsj_cnt"),
              lit(s" rows - over the $maxBroadcastNulls-row broadcast " +
                s"bound on '$rightKey' IS NULL; flip the call if the " +
                "LEFT bucket is the small one, or pass broadcastNulls " +
                "= false for a partition-pairwise cartesian null leg"))))
            .otherwise(lit(true)))
          .drop("__nsj_cnt")
        leftNulls.crossJoin(broadcast(guarded))
      }
    valueLeg.unionByName(nullLeg)
  }
}
