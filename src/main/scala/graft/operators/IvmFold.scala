package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Exact.dec

/** Incremental view maintenance for NON-invertible aggregates (round
  * 12): count and exact-decimal sum fold as `stored ⊕ delta` (deletes
  * subtract exactly what inserts added — ivm1/StreamingIvm), but MIN
  * and MAX cannot be un-deleted: removing the row that attains a
  * group's extremum leaves no algebra to recover the runner-up. The
  * standard remedy is partial re-aggregation: detect exactly the
  * groups whose delta deletes a current extremum and re-aggregate ONLY
  * those from the maintained rows, keeping every other group on the
  * O(|delta|) merge path.
  *
  * Affected-group trigger: a delete with value ≤ stored min (or
  * ≥ stored max). A delete can only carry values the view already
  * holds, so "≤ min" means "= min, the extremum row (or a duplicate
  * of it)" — duplicates make the re-agg conservative (the extremum may
  * survive), never wrong: the re-agg leg computes the group's truth
  * from the post-delta rows regardless. Inserts never need re-agg —
  * `least/greatest(stored, inserted)` is exact.
  *
  * Scale shape: the delta aggregate is delta-sized; the merge joins
  * two aggregate frames; the re-agg leg reads `rowsAfter` through a
  * broadcast semi-join on the affected group list (delta-bounded, so
  * tiny) — the base data is scanned once and only the affected groups
  * survive the semi-join into the re-aggregate. Unaffected groups
  * never touch the base.
  *
  * Null values follow the aggregate convention: counted by n,
  * contribute 0 to the sum, ignored by min/max (they can neither
  * attain nor break an extremum).
  */
object IvmFold {

  /** Fold a change `delta` (`opCol` ∈ {I, D}, loud otherwise) into the
    * maintained aggregate `stored` (groupCols…, n, s, mn, mx — s the
    * exact decimal sum). `rowsAfter` holds the POST-delta surviving
    * rows (groupCols…, valueCol) — read only for affected groups via
    * a broadcast semi-join. Returns the maintained aggregate after the
    * fold; groups whose count reaches zero disappear. `stored = None`
    * is the empty view (first fold).
    *
    * `wideDecimal` (round 14, headroom fixed round 15) widens the
    * store: the default decimal(18,4) values raise loudly past
    * |v| ≥ 1e14 — correct but a real cap for money-at-scale views (a
    * cents-scaled 10-figure ledger approaches it); the wide mode
    * admits values to 1e22 (decimal(28,6)) accumulating into a
    * decimal(38,6) sum — the SAME ten digits of headroom the default
    * mode keeps (18,4 values into a 28,4 sum), so a single fold can
    * absorb ~1e10 max-magnitude values before the sum type is at
    * risk. Values keep the overflow raise at their own boundary, and
    * the SUM now has one too: an accumulated sum crossing the sum
    * type's cap used to overflow to NULL under non-ANSI arithmetic
    * (the re-agg path then silently folded it as 0 — exactly the
    * drift the value raise was built to prevent); both paths now
    * raise loudly when a group with rows produces a NULL sum. The
    * stored `s` column must carry the matching type — seed the view
    * with the same flag. */
  def foldMinMax(
      stored: Option[DataFrame],
      delta: DataFrame,
      rowsAfter: DataFrame,
      groupCols: Seq[String],
      opCol: String,
      valueCol: String,
      wideDecimal: Boolean = false): DataFrame = {
    val spark = delta.sparkSession
    val g = groupCols.map(col)
    val isI = col(opCol) === "I"
    val v = col(valueCol)
    // (precision, scale) of the value cast and of the running sum: the
    // sum gets ten digits of headroom over the value type in BOTH
    // modes — widening the values all the way to the sum's precision
    // would leave an accumulated sum zero room before the type
    // system's decimal-38 cap
    val (vp, vs) = if (wideDecimal) (28, 6) else (18, 4)
    val sumType = if (wideDecimal) "decimal(38,6)" else "decimal(28,4)"
    def decl(c: org.apache.spark.sql.Column) = dec(c, vp, vs)
    // a value outside the store decimal casts to NULL (non-ANSI) —
    // without this raise the coalesce below would fold it into the
    // maintained sum as 0, indistinguishable from the documented
    // null-contributes-0 convention: silent drift in an operator billed
    // as exact (and the n==0-with-remainder guard can't see it — an
    // overflowed s is itself NULL). Same raise-loudly discipline as the
    // op-column check.
    def decChecked(c: org.apache.spark.sql.Column) =
      when(c.isNotNull && decl(c).isNull,
        raise_error(concat(lit(s"value in '$valueCol' outside " +
          s"decimal($vp,$vs) ("), c.cast("string"),
          lit(") — the exact sum would silently drift; widen the " +
            "view's decimal or scale the value"))))
        .otherwise(coalesce(decl(c), lit(0)))
    val deltaAgg = delta
      .select((g :+ col(opCol)) :+ v.as("__v"): _*)
      .withColumn("__chk",
        when(col(opCol).isNull || (col(opCol) =!= "I" && col(opCol) =!= "D"),
          raise_error(lit(s"delta op outside {I, D} (or NULL) in '$opCol' — " +
            "refusing to fold a malformed delta into the view")))
          .otherwise(lit(0)))
      .groupBy(g: _*)
      .agg(
        sum(when(isI, 1L).otherwise(-1L) + col("__chk")).as("__dn"),
        sum(when(isI, 0L).otherwise(1L)).as("__delc"),
        sum(when(isI, decChecked(col("__v")))
          .otherwise(-decChecked(col("__v")))).as("__ds"),
        min(when(isI, col("__v"))).as("__ins_min"),
        max(when(isI, col("__v"))).as("__ins_max"),
        min(when(!isI, col("__v"))).as("__del_min"),
        max(when(!isI, col("__v"))).as("__del_max"))

    val storedDf = stored.getOrElse(
      // empty view with the contract schema, derived from the delta so
      // group/value types line up without a hand-built schema
      delta.filter(lit(false)).select(
        (g :+ lit(0L).as("n")) :+ decl(v).as("s") :+
          v.as("mn") :+ v.as("mx"): _*))

    val joined = storedDf.join(deltaAgg, groupCols, "full_outer")
    // a delete touching a stored extremum (≤ min is necessarily = min:
    // deletes only carry values the view holds); null-safe — no
    // deletes, or no stored row, means not affected
    val touchesExtremum =
      coalesce(col("__del_min") <= col("mn"), lit(false)) ||
        coalesce(col("__del_max") >= col("mx"), lit(false))

    // deletes against a group with NO stored row are always a contract
    // violation (deltas are diffs vs the stored view). The count guard
    // below only catches them when the count goes negative; a batch
    // that also inserts into the same new group would slip through
    // with the deleted value still in __ins_min/__ins_max — corrupt
    // extremes at a positive count. Refuse here, where stored-row
    // absence is still visible.
    val merged = joined.filter(!touchesExtremum)
      .select((g :+
        when(col("n").isNull && coalesce(col("__delc"), lit(0L)) > 0,
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(deletes against a group with no stored row)")))
          .otherwise(coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n")) :+
        (coalesce(col("s"), lit(0)) + coalesce(col("__ds"), lit(0))).as("s") :+
        least(col("mn"), col("__ins_min")).as("mn") :+
        greatest(col("mx"), col("__ins_max")).as("mx"): _*)

    val affected = joined.filter(touchesExtremum).select(g: _*)
    val reagg = rowsAfter
      .join(broadcast(affected), groupCols, "left_semi")
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        // decChecked never yields NULL (genuine NULLs coalesce to 0),
        // and every re-agg group has rows — a NULL sum here can ONLY
        // be an accumulated overflow, caught by the shared guard below
        // instead of the old silent coalesce-to-0
        sum(decChecked(v)).as("s"),
        min(v).as("mn"), max(v).as("mx"))

    // a negative count (or zero with a remainder sum) means the delta
    // deleted rows the view never absorbed — fail loudly before the
    // bad fold propagates (nothing downstream ever recomputes it);
    // only merge-path groups can get here (re-agg is truth by
    // construction), so the guard rides the fold for free. The sum
    // type is pinned so repeated folds don't creep toward the
    // decimal-38 precision cap one add-widening at a time.
    merged.unionByName(reagg)
      .withColumn("n",
        when(col("n") < 0 ||
          (col("n") === 0 && coalesce(col("s") =!= 0, lit(false))),
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(negative count or zero count with a remainder sum)")))
          .otherwise(col("n")))
      // every leg coalesces genuine NULLs to 0, so a NULL sum for a
      // surviving group is necessarily decimal overflow of the RUNNING
      // sum (merge-path add or re-agg accumulation) — raise instead of
      // letting non-ANSI arithmetic carry the NULL (merge) or a silent
      // 0 (the old re-agg coalesce) into the maintained view
      .withColumn("s",
        when(col("n") > 0 && col("s").isNull,
          raise_error(lit(s"maintained sum overflowed $sumType — the " +
            "exact sum would silently drift; widen the view's decimal " +
            "or scale the value")))
          .otherwise(col("s").cast(sumType)))
      .filter(col("n") > 0)
  }

  /** [[foldMinMax]] for a NET-WEIGHTED delta stream — the composed-
    * chain contract (round 16): delta rows carry `wCol` (signed
    * NONZERO net multiplicities, the
    * [[IvmJoin.deltaJoinWeighted]] output shape) instead of per-row
    * I/D ops, and the re-agg truth is `multisetAfter` — the POST-delta
    * (groupCols…, valueCol, `multCol`) MULTISET of the maintained
    * joined relation (the [[graft.streaming.BucketStore]] final-family
    * slice in the deployment shape), because over a join chain there
    * is no base table to re-read: the maintained multiset IS the
    * finest truth. The algebra is foldMinMax's verbatim with counts
    * scaled by multiplicity: n += Σw, s += Σ w·value, inserts
    * (w > 0) merge through least/greatest, a delete (w < 0) touching
    * a stored extremum re-aggregates ONLY that group from the
    * multiset (n = Σ mult, s = Σ mult·value, mn/mx over distinct
    * values — multiplicity cannot change an extremum, only its
    * survival). Pruned contract: `multisetAfter` may be pre-pruned to
    * any superset of the delta's groups. Same loud refusals, plus
    * zero/NULL weights. */
  def foldMinMaxWeighted(
      stored: Option[DataFrame],
      netDelta: DataFrame,
      multisetAfter: DataFrame,
      groupCols: Seq[String],
      wCol: String,
      valueCol: String,
      multCol: String = "__mult",
      wideDecimal: Boolean = false): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valueCol)
    val (vp, vs) = if (wideDecimal) (28, 6) else (18, 4)
    val sumType = if (wideDecimal) "decimal(38,6)" else "decimal(28,4)"
    def decl(c: org.apache.spark.sql.Column) = dec(c, vp, vs)
    def decChecked(c: org.apache.spark.sql.Column) =
      when(c.isNotNull && decl(c).isNull,
        raise_error(concat(lit(s"value in '$valueCol' outside " +
          s"decimal($vp,$vs) ("), c.cast("string"),
          lit(") — the exact sum would silently drift; widen the " +
            "view's decimal or scale the value"))))
        .otherwise(coalesce(decl(c), lit(0)))
    // zero/NULL net weights refused INSIDE the plan (the IvmDistinct
    // optimizer-hazard note) — a compressed stream never carries them
    val w = when(col(wCol).isNull || col(wCol) === 0,
      raise_error(lit(s"zero/NULL multiplicity in '$wCol' — refusing " +
        "to fold a malformed weighted delta into the view")))
      .otherwise(col(wCol))
    val deltaAgg = netDelta
      .select((g :+ w.as("__w")) :+ v.as("__v"): _*)
      .groupBy(g: _*)
      .agg(
        sum(col("__w")).as("__dn"),
        sum(when(col("__w") < 0, -col("__w")).otherwise(0L)).as("__delc"),
        sum(col("__w") * decChecked(col("__v"))).as("__ds"),
        min(when(col("__w") > 0, col("__v"))).as("__ins_min"),
        max(when(col("__w") > 0, col("__v"))).as("__ins_max"),
        min(when(col("__w") < 0, col("__v"))).as("__del_min"),
        max(when(col("__w") < 0, col("__v"))).as("__del_max"))

    val storedDf = stored.getOrElse(
      netDelta.filter(lit(false)).select(
        (g :+ lit(0L).as("n")) :+ decl(v).as("s") :+
          v.as("mn") :+ v.as("mx"): _*))

    val joined = storedDf.join(deltaAgg, groupCols, "full_outer")
    val touchesExtremum =
      coalesce(col("__del_min") <= col("mn"), lit(false)) ||
        coalesce(col("__del_max") >= col("mx"), lit(false))

    val merged = joined.filter(!touchesExtremum)
      .select((g :+
        when(col("n").isNull && coalesce(col("__delc"), lit(0L)) > 0,
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(deletes against a group with no stored row)")))
          .otherwise(coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n")) :+
        (coalesce(col("s"), lit(0)) + coalesce(col("__ds"), lit(0))).as("s") :+
        least(col("mn"), col("__ins_min")).as("mn") :+
        greatest(col("mx"), col("__ins_max")).as("mx"): _*)

    val affected = joined.filter(touchesExtremum).select(g: _*)
    val reagg = multisetAfter
      .join(broadcast(affected), groupCols, "left_semi")
      .groupBy(g: _*)
      .agg(sum(col(multCol)).as("n"),
        sum(col(multCol) * decChecked(v)).as("s"),
        min(v).as("mn"), max(v).as("mx"))

    merged.unionByName(reagg)
      .withColumn("n",
        when(col("n") < 0 ||
          (col("n") === 0 && coalesce(col("s") =!= 0, lit(false))),
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(negative count or zero count with a remainder sum)")))
          .otherwise(col("n")))
      .withColumn("s",
        when(col("n") > 0 && col("s").isNull,
          raise_error(lit(s"maintained sum overflowed $sumType — the " +
            "exact sum would silently drift; widen the view's decimal " +
            "or scale the value")))
          .otherwise(col("s").cast(sumType)))
      .filter(col("n") > 0)
  }
}
