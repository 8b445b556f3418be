package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-shaped upsert: the computational core of `MERGE INTO` /
  * incremental "apply changes" (the reference's incremental loads
  * append + audit-dedup; true upsert needs this dataflow plus a
  * transactional table format for the commit).
  *
  * Semantics: rows from `source` REPLACE matching `target` rows on
  * `keys` (the whole row, including columns the source sets to null);
  * unmatched source rows insert; unmatched target rows persist.
  *
  * Shape: one full-outer shuffle join on the keys — both sides
  * partition by the same key, no broadcast assumption (source can be
  * as large as target). The matched/unmatched routing is a per-row
  * flag, not a second pass. At scale, write the result partitioned the
  * same way the target is bucketed so repeated upserts reuse the
  * partitioning.
  */
object Upsert {

  /** Slowly-Changing-Dimension Type-2 history from a keyed change log
    * (Kimball's SCD2 — the warehouse twin of [[upsert]]'s
    * replace-in-place Type 1): each key's changes, totally ordered by
    * `orderCols`, collapse into VERSIONS — a new version opens only
    * where the tracked attributes actually differ from the previous
    * version (no-op updates collapse, the standard SCD2 rule) — and
    * each version carries `valid_from` (its first order value),
    * `valid_to` (the NEXT version's `valid_from`; null on the open
    * version), and `is_current`. Attribute comparison is null-SAFE
    * (`<=>` on the attr struct): a change TO null from non-null (or
    * back) is a real version boundary, not a dropped row.
    *
    * Scale shape: one exchange on the keys; both windows (the
    * version-boundary lag and the valid_to lead) share that
    * partitioning and sort, so Catalyst plans a single shuffle + sort
    * for the whole operator. Per-key change lists are date-bounded —
    * no corpus-wide window anywhere. */
  def scd2History(
      changes: DataFrame, keys: Seq[String], attrs: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty && orderCols.nonEmpty,
      "scd2History needs keys, tracked attrs, and a total order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val a = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(a, 1).over(w))
      .filter(col("__prev").isNull || !(a <=> col("__prev")))
      .drop("__prev")
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Target's columns; `source` must provide the same names. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains), s"keys $keys must be target columns")
    // the synthetic match flag must not collide with the prefixed form
    // of a real column (a target column literally named "hit" would
    // prefix to "s_hit" and make the reference ambiguous)
    val hit = "__graft_s_hit"
    val t = target.select(cols.map(c => col(c).as(s"t_$c")): _*)
    val s = source.select(cols.map(c => col(c).as(s"s_$c")) :+ lit(true).as(hit): _*)
    val cond = keys.map(k => t(s"t_$k") <=> s(s"s_$k")).reduce(_ && _)
    t.join(s, cond, "full_outer")
      .select(cols.map(c =>
        when(col(hit), col(s"s_$c")).otherwise(col(s"t_$c")).as(c)): _*)
  }
}
