package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for per-group TOP-K (round 13) — the
  * sixth member of the IVM family: count/sum fold invertibly (ivm1),
  * min/max re-aggregate broken groups from base rows (ivm2), distinct
  * counts consult a pair dictionary (ivm3), join views expand
  * bilinearly (ivm4), quantiles locate in invertible bucket counts
  * (ivm5) — and "top K keys by count" (the maintained face of the
  * `hh1` heavy-hitters query) splits cleanly in two:
  *
  *  - the COUNTS store (groupCols…, keyCol, cnt) folds INVERTIBLY —
  *    deletes subtract exactly what inserts added, so unlike ivm2/ivm3
  *    this fold NEVER consults base rows: the store is the finest
  *    truth the view needs;
  *  - the K-row VIEW is non-invertible only in which keys it shows,
  *    and the refresh prunes by a monotonicity argument: in a group
  *    whose delta is NET-NONNEGATIVE for every key, no unchanged
  *    key can enter the top K (every old top-K member kept or grew
  *    its count, so all K of them still order at-or-above any
  *    unchanged outsider under (cnt DESC, key ASC)), hence the new
  *    top K ⊆ old top K ∪ the delta's own keys — a candidate set of
  *    ≤ K + |delta keys in group| rows. Only groups where some key
  *    NET-DECREASED ("broken": the K-th threshold may fall, letting
  *    an untouched outsider rise in) re-rank their slice of the
  *    counts store — the ivm2 affected-group discipline, but against
  *    the aggregate-sized store, never the fact table.
  *
  * Contract (the IvmFold discipline): delta ops are diffs vs the
  * STORED view — a batch may not delete more occurrences of a
  * (group, key) pair than the store holds, even if the same batch
  * re-inserts them (a row inserted and deleted inside one batch never
  * existed in any view; compress it away upstream). Violations fail
  * loudly inside the plan, before the bad fold propagates.
  *
  * Weighted face: pass `weightCol` (positive LONG — scale money to a
  * fixed point like cents) and the maintained measure becomes the
  * per-key SUM of weights — "top customers by revenue, maintained".
  * Every theorem above survives verbatim: the algebra only needs
  * per-key net deltas to order the measure, and a count is a weight
  * of 1.
  *
  * Scale shape per batch: one delta-sized aggregate, one full-outer
  * merge of two aggregate frames (pruned-store contract: `stored._2`
  * may be pre-sliced to any superset of the delta's pairs plus the
  * broken groups — a partitioned upsert rewrites only those files),
  * ONE pass over the merged store picking candidates through ONE
  * group-keyed broadcast marker join (broken flag + candidate key set
  * per group, fused r17 from the former two marker joins — the
  * broadcast is CELL-GUARDED in-plan: an unpruned million-group store
  * refuses loudly with the pruned-store remedy named instead of
  * OOMing the driver inside the broadcast build),
  * and a rank over the candidates that rides
  * [[ScalableRank.withRowNumberAuto]] — window-shaped while
  * candidates are small, bucket-shaped if a broken group's slice is
  * giant. The view itself is ≤ K rows per group.
  */
object IvmTopK {

  private val Reserved = Seq("__tk_ord", "__tk_dw", "__tk_delc",
    "__tk_broken", "__tk_cand", "__tk_intop", "__tk_rn", "__tk_n")

  /** The K-row view of a counts store under (cnt DESC, keyCol ASC) —
    * used to seed [[fold]] and by specs as the invariant check:
    * topk ≡ viewOf(counts) at every step. `rnk` is the 1-based rank.
    * Rides the auto rank shape, so a giant store picks the bucket
    * form by estimate. */
  def viewOf(
      counts: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int,
      cntCol: String = "cnt"): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    (Reserved :+ "rnk").foreach(c => require(!counts.columns.contains(c),
      s"input already contains reserved/output column '$c'"))
    // skewProbe off: this runs once per maintained-view fold (a hot
    // per-batch path) — the probe's build-time checkpoints would
    // accumulate block-manager memory across batches, and the fold's
    // candidate frames are delta/K-bounded anyway (r15, the documented
    // eager-contract opt-out)
    ScalableRank.withRowNumberAuto(
        counts.withColumn("__tk_ord", -col(cntCol)),
        groupCols, "__tk_ord", Seq(keyCol),
        rnCol = "__tk_rn", nCol = "__tk_n", skewProbe = false)
      .filter(col("__tk_rn") <= k)
      .withColumn("rnk", col("__tk_rn").cast("int"))
      .drop("__tk_ord", "__tk_rn", "__tk_n")
  }

  /** The counts store of a base table — the initial state of a
    * maintained view. With `weightCol` the maintained measure is the
    * per-pair SUM of that column instead of the row count ("top
    * customers by revenue"); same fold algebra, since a count is a
    * weight of 1. */
  def countsOf(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      weightCol: Option[String] = None): DataFrame =
    df.groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(weightCol.fold(count(lit(1)))(c => sum(guardedWeight(df, c)))
        .as("cnt"))

  /** Weight discipline for the weighted variant: a LONG column (exact
    * sums — route money through a fixed-point scale like cents),
    * strictly positive (zero/negative weights would break both the
    * clean-path monotonicity proof and the over-delete guard), checked
    * loudly inside the plan. */
  private def guardedWeight(df: DataFrame, c: String): Column = {
    require(df.schema(c).dataType == org.apache.spark.sql.types.LongType,
      s"weight column '$c' must be LONG (exact sums; scale money to " +
        s"cents first), got ${df.schema(c).dataType.simpleString}")
    when(col(c).isNull || col(c) <= 0,
      raise_error(concat(lit(s"weight in '$c' must be a positive long, got "),
        col(c).cast("string"))))
      .otherwise(col(c))
  }

  /** Fold a change `delta` (`opCol` ∈ {I, D}, loud otherwise) into the
    * maintained (topk, counts) state; returns the state after the
    * fold, both frames lazy plans over the inputs. `stored = None` is
    * the empty view (first fold). Keys at count zero leave the store;
    * negative counts (deletes the view never absorbed) fail loudly.
    *
    * Pruned-store contract (GROUP-level, coarser than IvmDistinct's
    * pair-level one because the broken path reads whole group slices):
    * both stored frames may be PRE-PRUNED to any superset of the
    * delta's GROUPS — e.g. their group-hash bucket partitions, the
    * StreamingIvmTopK layout. Untouched groups can neither change
    * their counts nor their view rows, so the returned frames then
    * cover only the pruned groups and the caller re-attaches the
    * untouched remainder unread. */
  def fold(
      stored: Option[(DataFrame, DataFrame)],
      delta: DataFrame,
      groupCols: Seq[String],
      opCol: String,
      keyCol: String,
      k: Int,
      weightCol: Option[String] = None,
      maxBroadcastCells: Long = ScalableRank.MaxBroadcastCells): (DataFrame, DataFrame) = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val pairCols = groupCols :+ keyCol
    (Reserved :+ "cnt").foreach(c => require(!pairCols.contains(c),
      s"group/key columns collide with reserved column '$c'"))

    // op domain enforced INSIDE the weight expression (the IvmDistinct
    // note: a standalone guard filter could be simplified against
    // sibling predicates; a CASE else-branch raise cannot). The
    // weighted variant folds ±weight instead of ±1 — every theorem
    // below only uses that per-key net deltas order the measure, so
    // positive-long weights inherit the whole discipline unchanged.
    val unit = weightCol.fold(lit(1L))(c => guardedWeight(delta, c))
    val w = when(col(opCol) === "I", unit)
      .when(col(opCol) === "D", -unit)
      .otherwise(raise_error(
        lit(s"delta op outside {I, D} (or NULL) in '$opCol' — " +
          "refusing to fold a malformed delta into the view")))
    val deltaAgg = delta
      .groupBy(pairCols.map(col): _*)
      .agg(sum(w).as("__tk_dw"),
        sum(when(col(opCol) === "D", unit).otherwise(lit(0L)))
          .as("__tk_delc"))

    val (topk0, counts0) = stored.getOrElse {
      val emptyCounts = delta.filter(lit(false))
        .select(pairCols.map(col) :+ lit(0L).as("cnt"): _*)
      (viewOf(emptyCounts, groupCols, keyCol, k), emptyCounts)
    }

    // invertible store merge — ivm1's shape, with the over-delete
    // guard STRICTER than a negative-count check: stored cnt must
    // cover the batch's delete count on its own (re-inserts cannot
    // launder an over-delete into a plausible total)
    val merged = counts0.join(deltaAgg, pairCols, "full_outer")
      .select(pairCols.map(col) :+
        when(coalesce(col("cnt"), lit(0L)) -
            coalesce(col("__tk_delc"), lit(0L)) < 0,
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(batch deleted measure exceeds the stored measure)")))
          .otherwise(coalesce(col("cnt"), lit(0L)) +
            coalesce(col("__tk_dw"), lit(0L)))
          .as("cnt"): _*)
    val counts1 = merged.filter(col("cnt") > 0)

    refresh(topk0, counts1, deltaAgg, groupCols, keyCol, k,
      maxBroadcastCells)
  }

  /** Fold a NET-WEIGHTED delta stream into the maintained (topk,
    * counts) state — the composed-chain contract (round 16): rows
    * carry `wCol`, a signed NONZERO net multiplicity (the
    * [[IvmJoin.deltaJoinWeighted]] output shape), instead of per-row
    * I/D ops. The maintained measure per (group, key) is Σ w (count
    * view — each joined derivation counts its multiplicity) or, with
    * `valueCol` (positive LONG — the fixed-point money discipline),
    * Σ w·value ("top customers by maintained revenue over a join
    * chain"). Everything else is [[fold]] verbatim: the counts store
    * merges invertibly, broken groups (net-decreased keys) re-rank
    * their store slice, clean groups ride the old-top-K ∪ delta-keys
    * candidate proof — the monotonicity theorem only needs per-key
    * NET deltas to order the measure, and a net-weighted stream IS
    * the per-key net delta. Over-deletes guard at the merge (a
    * negative merged measure); the ±1 face's stricter delete-count
    * guard has no analogue here because a net stream is already
    * compressed — there is no same-batch re-insert left to launder an
    * over-delete. Same pruned-store (group-level) contract. */
  def foldWeighted(
      stored: Option[(DataFrame, DataFrame)],
      netDelta: DataFrame,
      groupCols: Seq[String],
      wCol: String,
      keyCol: String,
      k: Int,
      valueCol: Option[String] = None,
      maxBroadcastCells: Long = ScalableRank.MaxBroadcastCells): (DataFrame, DataFrame) = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val pairCols = groupCols :+ keyCol
    (Reserved :+ "cnt").foreach(c => require(!pairCols.contains(c),
      s"group/key columns collide with reserved column '$c'"))
    // zero/NULL net weights refused INSIDE the plan (the IvmDistinct
    // optimizer-hazard note) — a compressed stream never carries them
    val w = when(col(wCol).isNull || col(wCol) === 0,
      raise_error(lit(s"zero/NULL multiplicity in '$wCol' — refusing " +
        "to fold a malformed weighted delta into the view")))
      .otherwise(col(wCol))
    val unit = valueCol.fold(lit(1L))(c => guardedWeight(netDelta, c))
    val deltaAgg = netDelta
      .groupBy(pairCols.map(col): _*)
      .agg(sum(w * unit).as("__tk_dw"))

    val (topk0, counts0) = stored.getOrElse {
      val emptyCounts = netDelta.filter(lit(false))
        .select(pairCols.map(col) :+ lit(0L).as("cnt"): _*)
      (viewOf(emptyCounts, groupCols, keyCol, k), emptyCounts)
    }

    val mergedMeasure =
      coalesce(col("cnt"), lit(0L)) + coalesce(col("__tk_dw"), lit(0L))
    val merged = counts0.join(deltaAgg, pairCols, "full_outer")
      .select(pairCols.map(col) :+
        when(mergedMeasure < 0,
          raise_error(lit("delta deletes rows the view never absorbed " +
            "(the merged measure went negative)")))
          .otherwise(mergedMeasure)
          .as("cnt"): _*)
    val counts1 = merged.filter(col("cnt") > 0)

    refresh(topk0, counts1, deltaAgg, groupCols, keyCol, k,
      maxBroadcastCells)
  }

  /** The shared view-refresh tail of [[fold]] and [[foldWeighted]]:
    * broken-group re-rank + clean-group candidate pass over the merged
    * counts, one store scan, guarded broadcasts. `deltaAgg` carries
    * (pairCols…, __tk_dw net measure delta). */
  private def refresh(
      topk0: DataFrame, counts1: DataFrame, deltaAgg: DataFrame,
      groupCols: Seq[String], keyCol: String, k: Int,
      maxBroadcastCells: Long): (DataFrame, DataFrame) = {
    val pairCols = groupCols :+ keyCol
    // ONE group-keyed marker table (r17 — fused from the old pair of
    // broadcasts: a group-level broken list and a pair-level candidate
    // list, each with its own distinct, broadcast build, and join
    // against the store). Per group: whether some key net-decreased
    // ("broken" — the K-th threshold may fall, so the whole store
    // slice re-ranks) and the clean path's distinct candidate keys
    // (old top-K keys ∪ the delta's own keys; null keys drop from the
    // set exactly as they never matched the old null-unsafe pair
    // join). Every group holding store rows appears: topk0 covers
    // every stored group (k ≥ 1), deltaAgg the newly created ones.
    val markers = deltaAgg
      .select(pairCols.map(col) :+ (col("__tk_dw") < 0).as("__tk_broken"): _*)
      .unionByName(topk0
        .select(pairCols.map(col) :+ lit(false).as("__tk_broken"): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__tk_broken")).as("__tk_broken"),
        collect_set(col(keyCol)).as("__tk_cand"))
    // The old-view side makes this frame |stored groups|-wide in the
    // worst case, so the broadcast build is GUARDED in-plan (round 14,
    // the ScalableRank.MaxBroadcastCells discipline): a single-task
    // window sums the candidate cells off the frame itself —
    // aggregate-sized, evaluated once inside the same plan — and
    // refuses loudly, naming the pruned-store remedy, before an
    // unpruned million-group store could OOM the driver inside an
    // anonymous broadcast. (Bounding by REFORMULATION was tried and
    // measured: splitting topk0 into touched/untouched re-ran the
    // stored-view rank twice, 1.4×; testing view membership by a plain
    // join serialized behind the merge, 5×. The guard keeps the plan —
    // one broadcast, one store pass — and converts the silent OOM into
    // a named contract.)
    val guarded = markers
      .withColumn("__tk_n", sum(size(col("__tk_cand")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(when(col("__tk_n") > maxBroadcastCells,
        raise_error(concat(
          lit("top-k candidate frame too large to broadcast: "),
          col("__tk_n"),
          lit(s" pairs exceeds the $maxBroadcastCells-cell bound - " +
            "pass stores PRE-PRUNED to the delta's groups plus the " +
            "broken groups (the pruned-store contract; the " +
            "StreamingIvmTopK bucket layout does this by construction)"))))
        .otherwise(lit(true)))
      .drop("__tk_n")

    // ONE pass over the merged store through ONE broadcast join: keep
    // a row if its group is broken or it is a clean-path candidate.
    // Inner join is exact — a store row whose group had no marker
    // could never pass the old two-null filter either.
    val candidates = counts1
      .join(broadcast(guarded), groupCols)
      .filter(col("__tk_broken") ||
        array_contains(col("__tk_cand"), col(keyCol)))
      .drop("__tk_broken", "__tk_cand")

    (viewOf(candidates, groupCols, keyCol, k), counts1)
  }
}
