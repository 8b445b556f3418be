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

  /** INCREMENTAL SCD2 apply — the daily-warehouse face of
    * [[scd2History]]: merge a NEW batch of change rows into an
    * EXISTING Type-2 dimension instead of rebuilding from the full
    * change log (which is O(history) per refresh). Per batch key: the
    * key's open (`is_current`) version seeds the no-op collapse, so a
    * batch change equal to the open version's attrs is dropped, the
    * open version closes at the first genuinely-new version's
    * `valid_from`, and new versions tile exactly as a full rebuild
    * would; keys absent from the batch pass through untouched, and
    * batch-only keys build their history from scratch.
    *
    * Equivalence contract: `scd2Apply(scd2History(log), batch) ==
    * scd2History(log ∪ batch)` PROVIDED each batch row's order comes
    * after every previously-applied change row for its key — the
    * natural append-only change-stream contract. The checkable part
    * (batch order at-or-before the OPEN version's order) fails loudly;
    * orders between the open version and its later dropped no-ops are
    * unobservable from the dimension alone and stay the caller's
    * responsibility (documented, not silently wrong: such a batch
    * still applies deterministically, it just differs from a full
    * rebuild that interleaved the late row).
    *
    * Scale shape (touched-keys-only): closed versions pass through
    * with NO join at all (they are immutable by construction); the
    * open set — one row per dimension key, far smaller than history —
    * splits touched/untouched via a broadcast semi/anti join on the
    * batch's distinct keys; the only exchange is [[scd2History]]'s
    * single key-partitioned window over (touched opens ∪ batch) —
    * batch-sized, not history-sized. At extreme batch widths where the
    * key set outgrows a broadcast, store the dimension bucketed by
    * `keys` so the semi/anti joins co-locate instead.
    *
    * `dim` must carry the batch's columns plus `valid_from`,
    * `valid_to`, `is_current` (the [[scd2History]] output shape). */
  def scd2Apply(
      dim: DataFrame, batch: DataFrame, keys: Seq[String], attrs: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty && orderCols.nonEmpty,
      "scd2Apply needs keys, tracked attrs, and a total order")
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    require(scdCols.forall(dim.columns.contains),
      s"dim must be an scd2History output (missing one of $scdCols)")
    // null-SAFE touched/untouched split: scd2History's window groups a
    // null key into one real partition, so a null-key open version must
    // match a null-key batch like any other key — a plain using-column
    // semi/anti (null never equals null) would route it to `untouched`
    // while the batch rebuilt a SECOND history for the same key,
    // silently breaking incremental == rebuild. Rename the key frame so
    // the <=> condition is unambiguous (shared-lineage lesson below).
    val batchKeys = broadcast(
      batch.select(keys.map(k => col(k).as(s"__bk_$k")): _*).distinct())
    val touchCond = keys.map(k => col(k) <=> col(s"__bk_$k")).reduce(_ && _)
    val open = dim.filter(col("is_current"))
    val closed = dim.filter(!col("is_current"))
    val seed = open.join(batchKeys, touchCond, "left_semi")
      .drop(scdCols: _*)
    val untouched = open.join(batchKeys, touchCond, "left_anti")
    val log = seed.withColumn("__seed", lit(true))
      .unionByName(batch.withColumn("__seed", lit(false)))
    // the open version must sort strictly first in its key's batch-
    // extended log; ties order the seed LAST so an at-or-before batch
    // row is always caught, not masked by row_number tie-breaking
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col) :+ col("__seed").asc: _*)
    val lateRows = log.withColumn("__rn", row_number().over(wv))
      .filter(col("__seed") && col("__rn") > 1).limit(1).count()
    require(lateRows == 0,
      "scd2Apply: batch carries order values at or before a key's open " +
        "version — apply change batches in order")
    closed
      .unionByName(untouched)
      .unionByName(scd2History(log.drop("__seed"), keys, attrs, orderCols))
  }

  /** Point-in-time SCD2 lookup — the CONSUMPTION face of the Type-2
    * family (build [[scd2History]] → refresh [[scd2Apply]] → query
    * this): each fact row joins to the dimension VERSION that was
    * valid at the fact's timestamp, i.e. the version with
    * `valid_from <= ts < valid_to` (open version: `valid_to` null).
    * Facts before the key's first version — or with no dimension key
    * at all — keep a null version (left join), the warehouse
    * convention for late-registered dimensions.
    *
    * Spark-first shape: because versions TILE per key (scd2History's
    * invariant), the temporal match needs NO range-join machinery —
    * one keyed equi-join (dimension versions per key are few) followed
    * by the interval filter, so the plan is an ordinary shuffle/
    * broadcast hash join that AQE can size, never an
    * O(facts × versions) interval product. Dimension columns arrive
    * prefixed `dim_`-less but minus the key columns (already on the
    * fact side); `valid_from`/`valid_to`/`is_current` ride along for
    * auditability. */
  def scd2Lookup(
      dim: DataFrame, facts: DataFrame, keys: Seq[String],
      tsCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2Lookup needs join keys")
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    require(scdCols.forall(dim.columns.contains),
      s"dim must be an scd2History output (missing one of $scdCols)")
    require(facts.columns.contains(tsCol), s"facts lack ts column '$tsCol'")
    // rename EVERY dim column (keys included): dim and facts routinely
    // share lineage (both derive from the change log), and dataframe-
    // indexed references across a self-join mis-resolve to trivially
    // true predicates — name-disjoint sides make every ref unambiguous
    val d = dim.columns.foldLeft(dim)((df, c) =>
      df.withColumnRenamed(c, s"v_$c"))
    val cond = keys.map(k => col(k) <=> col(s"v_$k")).reduce(_ && _) &&
      col("v_valid_from") <= col(tsCol) &&
      (col("v_valid_to").isNull || col(tsCol) < col("v_valid_to"))
    facts.join(d, cond, "left").drop(keys.map(k => s"v_$k"): _*)
  }

  /** Full `MERGE` semantics from a CDC change set — the
    * WHEN-MATCHED-DELETE face [[upsert]] lacks, fed by the standard
    * change-stream shape (op + sequence columns): per key, the LATEST
    * change wins (row_number over `seqCol` descending — CDC
    * compaction, so an in-batch delete-then-reinsert lands as the
    * reinsert and an update-then-delete lands as the delete); a final
    * op `"D"` removes the key from the target, any other op upserts
    * the change row (replace on match, insert on miss). `changes` must
    * carry the target's columns plus `seqCol` and `opCol`; `seqCol`
    * must totally order each key's changes.
    *
    * Scale shape: the compaction window is CHANGE-sized, deletes
    * screen the target through one keyed anti-join, and the
    * replace/insert half is [[upsert]]'s single full-outer key
    * exchange — the same cost as MERGE on any engine. On a
    * transactional table format the final write becomes the format's
    * MERGE commit; this dataflow is the computation underneath. */
  def applyCdc(
      target: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains), s"keys $keys must be target columns")
    require((cols :+ seqCol :+ opCol).forall(changes.columns.contains),
      s"changes must carry the target's columns plus '$seqCol' and '$opCol'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // a NULL op would satisfy NEITHER filter below (=== and =!= both
    // yield null) and the row would vanish from dels AND ups — a
    // malformed feed silently losing data. Fail loudly instead (the
    // scd2Apply lateRows discipline: one limit(1) probe, change-sized).
    val nullOps = latest.filter(col(opCol).isNull).limit(1).count()
    require(nullOps == 0,
      s"applyCdc: change rows with a NULL '$opCol' after compaction — " +
        "a null op is neither delete nor upsert; fix the feed")
    val dels = latest.filter(col(opCol) === "D").select(keys.map(col): _*)
    val ups = latest.filter(col(opCol) =!= "D").select(cols.map(col): _*)
    upsert(target.join(dels, keys, "left_anti"), ups, keys)
  }

  /** Snapshot DIFF — the inverse of [[applyCdc]]: derive the minimal
    * I/U/D change set that turns snapshot `oldDf` into snapshot
    * `newDf` (both keyed by `keys`, same columns). Keys only in the
    * new snapshot emit `I`, keys only in the old emit `D` (carrying
    * the old row's values — the "before image"), keys in both emit `U`
    * only when any non-key column differs NULL-SAFELY; identical rows
    * emit nothing. Round trip: `applyCdc(oldDf, snapshotDiff(oldDf,
    * newDf) + any seq, …) == newDf` (UpsertSpec proves it on random
    * snapshots) — which makes this the migration-drift detector AND
    * the changelog generator for systems that only publish snapshots.
    *
    * Shape: one full-outer key exchange, the [[upsert]] cost; the
    * comparison is a per-row struct equality, no second pass. */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSeq == cols,
      s"snapshots must share columns: ${cols} vs ${newDf.columns.toSeq}")
    require(keys.forall(cols.contains), s"keys $keys must be snapshot columns")
    val nonKey = cols.filterNot(keys.contains)
    // name-disjoint sides (the scd2Lookup lesson: shared lineage makes
    // dataframe-indexed refs mis-resolve) plus presence flags, since a
    // legitimately-null key column can't signal side absence
    val o = cols.foldLeft(oldDf)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
      .withColumn("__o_present", lit(true))
    val n = cols.foldLeft(newDf)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__n_present", lit(true))
    val cond = keys.map(k => col(s"__o_$k") <=> col(s"__n_$k")).reduce(_ && _)
    val changed =
      if (nonKey.isEmpty) lit(false)
      else !(struct(nonKey.map(c => col(s"__o_$c")): _*) <=>
        struct(nonKey.map(c => col(s"__n_$c")): _*))
    o.join(n, cond, "full_outer")
      .withColumn("op",
        when(col("__o_present").isNull, "I")
          .when(col("__n_present").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(cols.map(c =>
        when(col("op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) :+ col("op"): _*)
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
