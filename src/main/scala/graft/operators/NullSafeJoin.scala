package graft.operators

import org.apache.spark.sql.DataFrame
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
  * broadcast (null keys are typically a small dirty fraction). If the
  * left bucket is the small one, flip the call — the operator cannot
  * know sizes without an action and refuses to guess. A genuinely
  * null-heavy × null-heavy pair produces a quadratic output no plan
  * shape can save; that is a data question, not a join question.
  */
object NullSafeJoin {

  /** Inner null-safe equi-join of `left` and `right` on
    * `leftKey <=> rightKey`. Output columns: left's then right's, like
    * the plain join. Key names must differ so the output is
    * unambiguous (rename before joining, as any self-join would). */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    require(leftKey != rightKey,
      s"leftKey and rightKey share the name '$leftKey' — the output " +
        "would carry an ambiguous duplicate column; rename one side first")
    val valueLeg = left.filter(col(leftKey).isNotNull)
      .join(right.filter(col(rightKey).isNotNull),
        col(leftKey) === col(rightKey))
    val nullLeg = left.filter(col(leftKey).isNull)
      .crossJoin(broadcast(right.filter(col(rightKey).isNull)))
    valueLeg.unionByName(nullLeg)
  }
}
