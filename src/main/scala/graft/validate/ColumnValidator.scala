package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact._

/** DVT-style column-aggregate validation (SURVEY §2.5 A7).
  *
  * Reference semantics: the Data Validation Tool's `--type Column`
  * comparison driven by `validation_dag.py:87-99` and the result shape of
  * `terraform/translation/bq/bq_schemas/dvt_results_schema.json`
  * (aggregation_type, source_agg_value, target_agg_value, difference,
  * pct_difference, pct_threshold, validation_status). The reference runs
  * one containerized CLI per table; here both sides aggregate in one Spark
  * job each — a single shuffle per side over the group keys, partial
  * (map-side) aggregation for free — then a tiny full-outer join on the
  * group key compares them. Scales to arbitrary table sizes: the join
  * input is |groups| rows, not |rows|.
  *
  * Determinism: sums go through DECIMAL(18,4) ([[graft.core.Exact]]) so
  * the surfaced doubles are partition-order independent; pct_difference is
  * computed in one fixed expression order `(t - s) / s * 100`.
  */
object ColumnValidator {

  /** One aggregation to validate: `agg` ∈ count|sum|min|max|avg over `column`. */
  final case class AggSpec(agg: String, column: String) {
    def name: String = s"${agg}__$column"
    def toExpr: Column = (agg match {
      case "count" => count(col(column)).cast("double")
      case "sum"   => sumd(col(column))
      case "min"   => min(col(column)).cast("double")
      case "max"   => max(col(column)).cast("double")
      case "avg"   => avgd(col(column))
      case other   => throw new IllegalArgumentException(s"unknown agg: $other")
    }).as(name)
  }

  /** Aggregate one side: groupBy(groupCols) + all specs in a single pass. */
  private def aggregate(df: DataFrame, groupBy: Seq[String],
      specs: Seq[AggSpec]): DataFrame = {
    val exprs = specs.map(_.toExpr)
    if (groupBy.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Unpivot the wide aggregate row(s) into
    * (groupCols..., validation_name, agg_value). */
  private def melt(df: DataFrame, groupBy: Seq[String], specs: Seq[AggSpec],
      valueName: String): DataFrame = {
    val stackExpr = specs.map(sp => s"'${sp.name}', `${sp.name}`")
      .mkString(s"stack(${specs.size}, ", ", ", s") as (validation_name, $valueName)")
    df.selectExpr(groupBy ++ Seq(stackExpr): _*)
  }

  /** Compare `source` vs `target` on the given aggregates.
    *
    * Returns one row per (group, aggregation): group cols,
    * `validation_name`, `source_agg_value`, `target_agg_value`,
    * `difference`, `pct_difference`, `pct_threshold`,
    * `validation_status` ('pass'/'fail').
    *
    * DVT convention for a zero source value: 0 = 0 is a pass
    * (pct_difference 0); 0 → nonzero is a fail (pct_difference null).
    * A group missing on either side fails (null agg on that side).
    */
  def validate(
      source: DataFrame,
      target: DataFrame,
      specs: Seq[AggSpec],
      groupBy: Seq[String] = Nil,
      pctThreshold: Double = 0.0): DataFrame = {
    require(specs.nonEmpty,
      "no aggregations to validate — the params sheet row has no " +
        "count/sum/min/max/avg cells (canonical positions 11-15)")
    val s = melt(aggregate(source, groupBy, specs), groupBy, specs, "source_agg_value")
    val t = melt(aggregate(target, groupBy, specs), groupBy, specs, "target_agg_value")
    val keys = groupBy :+ "validation_name"
    val sv = col("source_agg_value")
    val tv = col("target_agg_value")
    val pct = when(sv === 0.0 && tv === 0.0, lit(0.0))
      .when(sv === 0.0, lit(null).cast("double"))
      .otherwise((tv - sv) / sv * 100.0)
    s.join(t, keys, "full_outer")
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
