package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact._

/** Single-pass column profiling (the table-stats pass every large-scale
  * ingest runs before training: completeness, cardinality, ranges,
  * quantiles).
  *
  * One aggregation job computes every metric for every profiled column
  * (map-side partial aggregation; no per-column scans). Cardinality
  * defaults to `approx_count_distinct` (HLL++, constant memory — the
  * only sane choice at 100 TB); `exact = true` switches to exact
  * distinct counts for oracle-grade comparisons at test scale.
  * Quantiles use Spark's exact `percentile` here for cross-engine
  * determinism; swap to `percentile_approx` at scale.
  */
object Profiler {

  final case class Spec(column: String, quantiles: Seq[Double] = Seq(0.5, 0.9))

  /** Wide one-row profile: metrics named `<col>__<metric>`.
    *
    * Exact mode computes each column's distinct count in its own
    * two-stage aggregation and cross-joins the single-row results:
    * multiple `countDistinct`s in ONE agg make Catalyst Expand every
    * input row once per distinct column (N× the scan through the hash
    * aggregate), which dominates profile cost on wide specs. */
  def profileRow(df: DataFrame, specs: Seq[Spec], exact: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = specs.flatMap { s =>
      val c = col(s.column)
      Seq(
        count(c).as(s"${s.column}__count"),
        count(when(c.isNull, 1)).as(s"${s.column}__nulls")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(c).as(s"${s.column}__distinct"))) ++
        Seq(
          min(c).cast("double").as(s"${s.column}__min"),
          max(c).cast("double").as(s"${s.column}__max"),
          avgd(c).as(s"${s.column}__mean")) ++
        s.quantiles.map(q =>
          percentile(c, lit(q)).as(s"${s.column}__p${(q * 100).toInt}"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    if (!exact) base
    else specs.foldLeft(base) { (acc, s) =>
      acc.crossJoin(df.agg(
        countDistinct(col(s.column)).as(s"${s.column}__distinct")))
    }
  }

  /** Long-format profile: (column_name, metric, value) — the shape the
    * audit sink stores. */
  def profile(df: DataFrame, specs: Seq[Spec], exact: Boolean = false): DataFrame = {
    val row = profileRow(df, specs, exact)
    val cols = row.columns
    val stack = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)")
      .mkString(s"stack(${cols.length}, ", ", ", ") as (key, value)")
    row.selectExpr(stack)
      .withColumn("column_name", split(col("key"), "__").getItem(0))
      .withColumn("metric", split(col("key"), "__").getItem(1))
      .select(col("column_name"), col("metric"), col("value"))
  }
}
