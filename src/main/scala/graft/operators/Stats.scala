package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact.dec

/** Exact second-moment statistics (mean / stddev / covariance /
  * correlation) computed from decimal power sums.
  *
  * Spark's builtin `stddev`/`corr` fold doubles in partition order, so
  * two runs (or two engines) can differ in the last bits. Here every
  * power sum (Σx, Σy, Σx², Σy², Σxy) is an exact decimal aggregate —
  * associative, partition-order independent, map-side combinable — and
  * the closed-form moment formulas are then evaluated in one fixed
  * double-precision expression order. Result: bit-identical values on
  * any engine that uses the same formula, at full shuffle parallelism.
  *
  * The trade-off vs Welford-style streaming moments is the classic
  * catastrophic-cancellation risk of the textbook formula — which the
  * decimal sums eliminate: Σx² and (Σx)²/n are exact until the final
  * double conversion.
  */
object Stats {

  /** Per-group moments of x and y: n, mean/stddev of each, sample
    * covariance and Pearson correlation. p/s sized for testdata ranges
    * (|x| < 1e6, 2-decimal inputs → squares exact at (38,8)). */
  def moments(
      df: DataFrame, groupCols: Seq[String], x: String, y: String): DataFrame = {
    val xc = dec(col(x)); val yc = dec(col(y))
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xc).cast("double").as("sx"),
      sum(yc).cast("double").as("sy"),
      sum(xc * xc).cast("double").as("sxx"),
      sum(yc * yc).cast("double").as("syy"),
      sum(xc * yc).cast("double").as("sxy"))
    val n = col("n")
    val varX = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
    val varY = (col("syy") - col("sy") * col("sy") / n) / (n - 1)
    val covXY = (col("sxy") - col("sx") * col("sy") / n) / (n - 1)
    agg.select(
      groupCols.map(col) ++ Seq(
        n,
        (col("sx") / n).as("mean_x"),
        sqrt(varX).as("stddev_x"),
        (col("sy") / n).as("mean_y"),
        sqrt(varY).as("stddev_y"),
        covXY.as("covar_xy"),
        ((col("sxy") - col("sx") * col("sy") / n) /
          sqrt((col("sxx") - col("sx") * col("sx") / n) *
            (col("syy") - col("sy") * col("sy") / n))).as("corr_xy")): _*)
  }

  /** DuckDB mirror of [[moments]] for oracle SQL: same power sums
    * (decimal, surfaced through VARCHAR to avoid DuckDB's double-rounded
    * direct DECIMAL→DOUBLE cast) and the same formula text. */
  def momentsOracleSql(table: String, groupCols: Seq[String], x: String, y: String): String = {
    def s(e: String) = s"CAST(CAST(SUM($e) AS VARCHAR) AS DOUBLE)"
    val xd = s"CAST($x AS DECIMAL(18,4))"; val yd = s"CAST($y AS DECIMAL(18,4))"
    // DuckDB stores DECIMAL(18) in int64 and overflows multiplying two of
    // them; width 19 forces int128 arithmetic. The products stay exact,
    // so parity with Spark's DECIMAL(18,4)² is unaffected.
    val xw = s"CAST($x AS DECIMAL(19,4))"; val yw = s"CAST($y AS DECIMAL(19,4))"
    val g = groupCols.mkString(", ")
    s"""WITH sums AS (
       | SELECT $g, COUNT(*) AS n,
       |  ${s(xd)} AS sx, ${s(yd)} AS sy,
       |  ${s(s"$xw * $xw")} AS sxx, ${s(s"$yw * $yw")} AS syy,
       |  ${s(s"$xw * $yw")} AS sxy
       | FROM $table GROUP BY $g)
       |SELECT $g, n,
       | sx / n AS mean_x,
       | sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_x,
       | sy / n AS mean_y,
       | sqrt((syy - sy * sy / n) / (n - 1)) AS stddev_y,
       | (sxy - sx * sy / n) / (n - 1) AS covar_xy,
       | (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_xy
       |FROM sums""".stripMargin
  }
}
