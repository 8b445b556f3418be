package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Portable HyperLogLog approximate distinct count (Flajolet et al.,
  * AofA'07) — the scale path for COUNT(DISTINCT) when the exact
  * two-phase distinct's shuffle of every distinct value is too much.
  *
  * Differences from `approx_count_distinct` (Spark's HLL++): this one
  * is CROSS-ENGINE DETERMINISTIC, so the result is oracle-checkable
  * bit-for-bit:
  *  - the element hash is the portable md5-derived
  *    [[TextOps.hexHash60]] (same value in any engine), not an
  *    engine-private xxhash;
  *  - rho (leading-zero rank) is derived from the DECIMAL→BINARY
  *    string length of the 52 low bits — pure integer/string ops,
  *    no floor(log2(w)) whose last-ulp rounding could differ;
  *  - the harmonic denominator Σ 2^−M_j is accumulated as the exact
  *    integer Σ 2^(53−M_j) (≤ 256·2^53 < 2^63), so bucket order —
  *    which no distributed engine guarantees — cannot perturb a
  *    floating sum; one double division happens at the very end in a
  *    fixed expression order.
  *
  * Shape: groupBy(group, bucket).max(rho) → groupBy(group).sum —
  * two map-side-combinable aggregations; state per group is ≤ m rows
  * regardless of input size. No small-range/large-range corrections
  * (they need ln(), which is libm-dependent); with m=256 the raw
  * estimate's ~6.5% σ applies across the full range.
  */
object HyperLogLog {

  val P = 8
  val M: Int = 1 << P // 256 buckets
  val WBits = 52      // low bits of the 60-bit hash used for rho

  /** A double constant as engine-neutral SQL. Bare decimal-point
    * literals parse as DECIMAL — with engine-specific division and
    * rounding rules — in both Spark SQL and DuckDB; a quoted
    * CAST(... AS DOUBLE) of the shortest round-trip representation
    * parses to the identical IEEE double everywhere. */
  private def dlit(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** α_m·m²·2^53 — the raw-estimate numerator, folded once here and
    * shared by the SQL text and [[HllSketchAgg]]. */
  private[functions] val AlphaNum: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * math.pow(2.0, WBits + 1)

  /** m·ln(m/Z) linear-counting table keyed by occupied count v
    * (LcTable(0) unused — an empty group never aggregates). */
  private[functions] val LcTable: Array[Double] =
    Array.tabulate(M)(v => if (v == 0) 0.0 else M * math.log(M.toDouble / (M - v)))

  /** The estimator over (occupied buckets v, Σ 2^(53−M_j) over occupied
    * buckets) — SAME operation order as the generated SQL, so the
    * sketch aggregate and the query-shaped pipeline agree bitwise. */
  private[functions] def estimate(v: Int, numPresent: Long): Double = {
    val raw = AlphaNum /
      (numPresent + (M - v).toLong * (1L << (WBits + 1))).toDouble
    if (v < M && raw <= 2.5 * M) LcTable(v) else raw
  }

  /** Shared estimator SQL over columns (v, num_present) — one text,
    * parsed by both Spark's `expr` and DuckDB, so every runtime
    * arithmetic step runs in the same order on both engines. All
    * constants (alpha_m·m²·2^53, the linear-counting table) are folded
    * to doubles HERE, in Scala, and emitted via [[dlit]] — the engines
    * only ever divide by the exact integer denominator.
    *
    * Small-range correction (raw HLL overestimates badly for n ≲ 2.5m)
    * uses linear counting m·ln(m/Z) over the empty-bucket count Z.
    * ln() itself is libm-dependent, but Z has only m−1 possible values,
    * so the table is emitted as literals. */
  private val EstimateSql: String = {
    val raw = s"${dlit(AlphaNum)} / CAST(num_present + ($M - v) * ${1L << (WBits + 1)} AS DOUBLE)"
    val lc = (1 until M)
      .map(v => s"WHEN $v THEN ${dlit(LcTable(v))}")
      .mkString(s"CASE v ", " ", " END")
    s"CASE WHEN v < $M AND $raw <= ${dlit(2.5 * M)} THEN $lc ELSE $raw END"
  }

  /** Per-group approximate distinct count of `valueCol` as column
    * `approx_distinct` (double). */
  def approxCountDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = TextOps.hexHash60(col(valueCol).cast("string"))
    val bucket = shiftright(h, WBits)
    val w = h.bitwiseAND(lit((1L << WBits) - 1))
    val rho = when(w === 0, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(conv(w.cast("string"), 10, 2)))
    val g = groupCols.map(col)
    // nulls must not form a bucket: they would inflate v by one while
    // num_present ignores them, shifting the estimate — and HllSketchAgg
    // skips nulls, so the documented bit-for-bit agreement would break
    df.filter(col(valueCol).isNotNull)
      .select(g :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("mj"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("v"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast(${WBits + 1} - mj as int))"))
          .as("num_present"))
      .select(g :+ expr(EstimateSql).as("approx_distinct"): _*)
  }

  /** DuckDB mirror of [[approxCountDistinct]]: same hash, same integer
    * rho, same exact numerator, same final expression order. */
  def oracleSql(table: String, groupCols: Seq[String], valueCol: String): String = {
    val g = groupCols.mkString(", ")
    val hex = s"CAST(concat('0x', substr(md5(CAST($valueCol AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""WITH hh AS (SELECT $g, $hex AS h FROM $table WHERE $valueCol IS NOT NULL),
       |bw AS (SELECT $g, h >> $WBits AS bucket,
       |  h & ${(1L << WBits) - 1} AS w FROM hh),
       |mr AS (SELECT $g, bucket,
       |  MAX(CASE WHEN w = 0 THEN ${WBits + 1}
       |      ELSE ${WBits + 1} - length(bin(w)) END) AS mj
       | FROM bw GROUP BY $g, bucket),
       |sv AS (SELECT $g, COUNT(*) AS v,
       |  SUM(CAST(1 AS BIGINT) << (${WBits + 1} - mj)) AS num_present
       | FROM mr GROUP BY $g)
       |SELECT $g, $EstimateSql AS approx_distinct
       |FROM sv""".stripMargin
  }
}
