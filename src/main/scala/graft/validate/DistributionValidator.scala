package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DVT-style DISTRIBUTION validation — the check a migration reaches
  * for when [[ColumnValidator]]'s aggregates all pass but the data is
  * subtly shifted: count/sum/min/max/avg are blind to reshuffled mass
  * between the extremes (a clipped tail, a re-binned bucket, a unit
  * mix-up on a symmetric column), while per-column quantiles at fixed
  * percentiles pin the SHAPE of each distribution on both sides.
  *
  * Reference semantics: the Data Validation Tool's column comparison
  * (`validation_dag.py:87-99`) generalized from single aggregates to a
  * quantile profile, reported in the same result shape
  * (source/target value, difference, pct_difference, pct_threshold,
  * validation_status) with [[ColumnValidator]]'s exact threshold
  * expression order, so the two validators' pass/fail semantics can
  * never drift apart.
  *
  * Quantiles are exact PERCENTILE_CONT — the shared explicit
  * interpolation formula of the qt2 oracle key (`vlo + frac·(vhi −
  * vlo)`, `frac = idx − floor(idx)`, `idx = (n−1)·p` over non-null
  * values): both engines compute the same IEEE expression, so results
  * are bit-identical cross-engine, never two library interpolations
  * racing each other.
  *
  * Scale shape: all requested columns unpivot into ONE pass over each
  * table (`stack` — no per-column re-scan), then a single exchange
  * partitioned by column name ranks each column's values; the lo/hi
  * filter collapses the sorted stream to 2·|ps| rows per column before
  * the tiny full-outer compare. Exact quantiles inherently sort each
  * column's values within one partition — the audited qt1/qt2 shape;
  * where a column outgrows a partition, the SAME exact quantiles
  * compute through [[graft.operators.ScalableQuantile]] (bucket
  * counts + candidate-bucket-only ranking — no group-sized sort;
  * bit-identical by ScalableQuantileSpec and the equivalence test in
  * ValidatorsSpec). By default the validator picks the shape ITSELF,
  * per side, from Catalyst's size estimate (see
  * [[AutoBucketLocateBytes]]); pass `bucketLocate = Some(...)` to
  * force one shape (the SCALING.md contrast measurements do).
  */
object DistributionValidator {

  /** Estimated-input-bytes threshold above which [[validate]] picks
    * the bucket-locate shape when `bucketLocate` is not forced.
    * Measured crossover on the 32-core reference host (SCALING.md v12
    * contrast pair): the window shape wins on an 11 MB-on-disk
    * lineitem (2.06 s vs 4.11 s) and loses from 109 MB up (22.6 s vs
    * 12.9 s at 10×; 233 s vs 77.5 s at 100×, where its single sorting
    * task starts failing 1 GiB page allocations). 32 MB sits inside
    * the bracket, deliberately low: picking buckets early costs a
    * bounded ~2× constant, picking the window late costs an unbounded
    * single-task sort that eventually cannot hold the column at all. */
  val AutoBucketLocateBytes: Long = 32L << 20

  /** The per-side auto decision [[validate]] makes when `bucketLocate`
    * is None: Catalyst's plan-size estimate, never a counting job — a
    * count would re-scan a filtered side and double the validation's
    * cost before it starts. The estimate overstates a pruned scan
    * (it sizes all columns, the stack reads only the profiled ones),
    * which only errs toward the bounded-penalty shape. */
  def autoBucketLocate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(AutoBucketLocateBytes)

  /** Exact PERCENTILE_CONT profile of `columns` at percentiles `ps`:
    * (column_name, p, `valueName`). Null values are excluded per SQL
    * convention; a column with no non-null values yields no rows (its
    * quantiles are undefined — the compare surfaces it as a fail on
    * the side that HAS values). */
  private def quantiles(
      df: DataFrame, columns: Seq[String], ps: Seq[Double],
      valueName: String, bucketLocate: Option[Boolean],
      equiDepth: Boolean): DataFrame = {
    val stackExpr = columns.map(c => s"'$c', CAST(`$c` AS DOUBLE)")
      .mkString(s"stack(${columns.size}, ", ", ", ") as (column_name, v)")
    val unpivoted = df.selectExpr(stackExpr)
    if (bucketLocate.getOrElse(autoBucketLocate(df)))
      // equi-depth on caller demand; otherwise the bucket path
      // SELF-DEFENDS (r15): percentileContAuto reads the max bucket
      // share off the exact bucket counts the locate computes anyway
      // and only a collapsed profile pays the equi-depth rebuild —
      // answers bit-identical in every path
      return (if (equiDepth)
        graft.operators.ScalableQuantile
          .percentileCont(unpivoted, "column_name", "v", ps,
            equiDepth = true)
      else
        graft.operators.ScalableQuantile
          .percentileContAuto(unpivoted, "column_name", "v", ps))
        .withColumnRenamed("value", valueName)
    val w = Window.partitionBy(col("column_name")).orderBy(col("v"))
    unpivoted
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("column_name"))).cast("long"))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", floor(col("idx")) + 1)
      .withColumn("hi", least(col("lo") + 1, col("n")))
      .filter(col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(col("column_name"), col("p"))
      .agg(
        max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"),
        max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
      .select(col("column_name"), col("p"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as(valueName))
  }

  /** Compare the quantile profiles of `source` vs `target` on
    * `columns`. One row per (column, percentile): `column_name`, `p`,
    * `source_value`, `target_value`, `difference`, `pct_difference`,
    * `pct_threshold`, `validation_status` — [[ColumnValidator]]'s
    * result shape and its exact zero-source conventions (0 = 0 passes
    * with pct 0; 0 → nonzero fails with null pct; a profile row
    * missing on either side fails). */
  def validate(
      source: DataFrame,
      target: DataFrame,
      columns: Seq[String],
      ps: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9),
      pctThreshold: Double = 0.0,
      bucketLocate: Option[Boolean] = None,
      /** Equi-depth boundaries for the bucket-locate shape — the
        * [[graft.operators.ScalableQuantile]] remedy when a profiled
        * column's values are adversarially skewed for equi-width
        * buckets (answers identical either way). */
      equiDepth: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0, 1], got $ps")
    val s = quantiles(source, columns, ps, "source_value", bucketLocate, equiDepth)
    val t = quantiles(target, columns, ps, "target_value", bucketLocate, equiDepth)
    compare(s, t, pctThreshold)
  }

  /** [[validate]] with the TARGET side's quantile profile read from a
    * MAINTAINED view instead of scanning the target table (round 16 —
    * the incremental-validation wiring): `targetProfile` is
    * (column_name, p, value), the
    * [[graft.streaming.StreamingIvmQuantile.readPercentiles]] output
    * over a stacked (column_name, value) CDC stream — the same
    * explicit PERCENTILE_CONT interpolation this validator computes,
    * bit-for-bit, so pass/fail semantics cannot drift between the
    * scanning and maintained paths. The audit's per-run cost becomes
    * candidate-bucket-bounded reads of the maintained store, and the
    * store itself folds delta-proportionally per CDC batch — the
    * re-aggregate-everything-per-run shape of the reference's audit
    * gate (validation_dag.py:178-216) replaced by view maintenance.
    * IncrementalValidationSpec pins maintained ≡ full-scan on a CDC
    * sequence. */
  def validateProfiled(
      source: DataFrame,
      targetProfile: DataFrame,
      columns: Seq[String],
      ps: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9),
      pctThreshold: Double = 0.0,
      bucketLocate: Option[Boolean] = None,
      equiDepth: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0, 1], got $ps")
    val s = quantiles(source, columns, ps, "source_value", bucketLocate, equiDepth)
    val t = targetProfile
      .filter(col("column_name").isin(columns: _*) && col("p").isin(ps: _*))
      .select(col("column_name"), col("p"),
        col("value").cast("double").as("target_value"))
    compare(s, t, pctThreshold)
  }

  /** The shared result tail: [[ColumnValidator]]'s exact threshold
    * expression order and zero-source conventions. */
  private def compare(s: DataFrame, t: DataFrame,
      pctThreshold: Double): DataFrame = {
    val sv = col("source_value")
    val tv = col("target_value")
    val pct = when(sv === 0.0 && tv === 0.0, lit(0.0))
      .when(sv === 0.0, lit(null).cast("double"))
      .otherwise((tv - sv) / sv * 100.0)
    s.join(t, Seq("column_name", "p"), "full_outer")
      .withColumn("difference", tv - sv)
      .withColumn("pct_difference", pct)
      .withColumn("pct_threshold", lit(pctThreshold))
      .withColumn("validation_status",
        when(sv.isNull || tv.isNull, "fail")
          .when(col("pct_difference").isNull, "fail")
          .when(abs(col("pct_difference")) <= pctThreshold, "pass")
          .otherwise("fail"))
  }
}
