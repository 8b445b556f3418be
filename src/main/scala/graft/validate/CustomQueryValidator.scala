package graft.validate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DVT-style custom-query validation (SURVEY §6 `validate` module).
  *
  * Reference semantics: DVT `--type Custom-query` — run one query per
  * side (`source-query-file` / `target-query-file`, selected from the
  * validation-params CSV by `storage_utils.py:84-121`) and compare the
  * single-row aggregate results column-by-column with the same
  * pct-threshold convention as column validation.
  *
  * Both queries run as ordinary Spark SQL (the source dialect is expected
  * to have been translated by `graft.translate` first). The comparison
  * unpivots each single-row result to (validation_name, value) and
  * reuses the §A7 difference/threshold logic shape.
  */
object CustomQueryValidator {

  private def melt(df: DataFrame, valueName: String): DataFrame = {
    val cols = df.columns
    val stackExpr = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)")
      .mkString(s"stack(${cols.length}, ", ", ", s") as (validation_name, $valueName)")
    df.selectExpr(stackExpr)
  }

  /** Run both queries and compare their (single-row, numeric) results.
    * Returns (validation_name, source_value, target_value, difference,
    * pct_difference, pct_threshold, validation_status). */
  def validate(
      spark: SparkSession,
      sourceQuery: String,
      targetQuery: String,
      pctThreshold: Double = 0.0): DataFrame = {
    val s = melt(spark.sql(sourceQuery), "source_value")
    val t = melt(spark.sql(targetQuery), "target_value")
    val sv = col("source_value")
    val tv = col("target_value")
    val pct = when(sv === 0.0 && tv === 0.0, lit(0.0))
      .when(sv === 0.0, lit(null).cast("double"))
      .otherwise((tv - sv) / sv * 100.0)
    s.join(t, Seq("validation_name"), "full_outer")
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
