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
