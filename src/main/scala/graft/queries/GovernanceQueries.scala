package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Exact.{dec, sumd}
import graft.core.Tables

/** Governance + profiling additions (round 11): erasure-list cascade
  * audit, time-range rolling windows, equal-frequency binning without a
  * global sort, and an exact-arithmetic correlation matrix.
  *
  * Scale notes (100 TB):
  *  - del1: the subject list broadcasts (opt-out registries are tiny
  *    next to the data), so customer/orders audit in one scan each with
  *    NO fact-side shuffle; the cascaded order-key set grows with the
  *    data so the lineitem leg deliberately takes the keyed-join path —
  *    both regimes of [[graft.operators.Forget]] exercised in one key.
  *  - w7: a time-RANGE frame is one hash exchange on the partition key;
  *    day arithmetic is integer epoch division (never double division).
  *  - hg2: edges come from the qt3 bucket-locate operator (no
  *    single-partition sort anywhere — the NTILE alternative's global
  *    total order is the thing this key exists to avoid), then binning
  *    is one broadcast-edge scan + a 4-group aggregate.
  *  - a13: every pairwise Pearson term is an exact decimal sum in ONE
  *    combinable aggregate pass (map-side partials); the final formula
  *    runs in doubles from identical exact inputs, so both engines
  *    produce the same IEEE bits. Decimal(38,8) sums overflow only
  *    past ~10^22, i.e. ~10^12 rows of price-squared — far beyond the
  *    target scale; widen the cast if you ever near it.
  */
object GovernanceQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "del1_forget_audit" -> ((s, dir) => {
      // erasure cascade: forget-list of customers (every 97th key) →
      // their rows in customer and orders directly, their lineitems
      // through the forgotten order keys. Per-table touch report.
      val customer = T(s, dir, "customer")
      val orders = T(s, dir, "orders")
      val lineitem = T(s, dir, "lineitem")
      val fk = customer.filter(pmod(col("c_custkey"), lit(97)) === 0)
        .select(col("c_custkey"))
      val forgottenOrders = orders
        .join(broadcast(fk.toDF("k")), col("o_custkey") === col("k"), "left_semi")
        .select(col("o_orderkey"))
      graft.operators.Forget.audit(
        Seq(("customer", customer, "c_custkey"), ("orders", orders, "o_custkey")),
        fk)
        .unionByName(graft.operators.Forget.audit(
          Seq(("lineitem", lineitem, "l_orderkey")), forgottenOrders,
          broadcastKeys = false))
        .orderBy(col("table_name"))
    }),
    "w7_rolling_range" -> ((s, dir) => {
      // rolling 30-day per-customer order stats via a RANGE frame over
      // integer epoch days — the time-windowed running-total face §2.6
      // row frames can't express (peers at the same day must all count).
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
        .rangeBetween(-30, 0)
      T(s, dir, "orders")
        .withColumn("d", expr("unix_timestamp(o_orderdate) div 86400"))
        .withColumn("n_30d", count(lit(1)).over(w))
        .withColumn("sum_30d", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("d"),
          col("n_30d"), col("sum_30d"))
        .orderBy(col("o_orderkey"))
    }),
    "hg2_quantile_bins" -> ((s, dir) => {
      // equal-frequency binning: quartile edges from the bucket-locate
      // quantile operator (exact PERCENTILE_CONT, no global sort), then
      // one broadcast-edge scan assigns bins. Edges are the shared
      // interpolation formula, so both engines bin identically.
      val orders = T(s, dir, "orders")
      val edges = graft.operators.ScalableQuantile.percentileCont(
          orders.select(lit(0).as("g"), col("o_totalprice")),
          "g", "o_totalprice", Seq(0.25, 0.5, 0.75))
        .agg(max(when(col("p") === 0.25, col("value"))).as("e1"),
          max(when(col("p") === 0.5, col("value"))).as("e2"),
          max(when(col("p") === 0.75, col("value"))).as("e3"))
      orders.crossJoin(broadcast(edges))
        .withColumn("bin",
          (col("o_totalprice") > col("e1")).cast("long") +
            (col("o_totalprice") > col("e2")).cast("long") +
            (col("o_totalprice") > col("e3")).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("bin"))
    }),
    "a13_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson over lineitem numerics in ONE pass: all nine
      // moment sums are exact decimals in a single combinable
      // aggregate; the closed-form corr then runs in doubles from
      // identical inputs with an identical expression tree — same IEEE
      // bits in both engines (never the engines' own corr(), whose
      // accumulation order is unspecified).
      val q = dec(col("l_quantity"))
      val p = dec(col("l_extendedprice"))
      val d = dec(col("l_discount"))
      def corrOf(sx: String, sy: String, sxy: String, sxx: String, syy: String) =
        (col("nn") * col(sxy) - col(sx) * col(sy)) /
          (sqrt(col("nn") * col(sxx) - col(sx) * col(sx)) *
            sqrt(col("nn") * col(syy) - col(sy) * col(sy)))
      T(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("sq"), sum(p).cast("double").as("sp"),
          sum(d).cast("double").as("sd"),
          sum(q * p).cast("double").as("sqp"), sum(q * d).cast("double").as("sqd"),
          sum(p * d).cast("double").as("spd"),
          sum(q * q).cast("double").as("sqq"), sum(p * p).cast("double").as("spp"),
          sum(d * d).cast("double").as("sdd"))
        .withColumn("nn", col("n").cast("double"))
        .withColumn("c_qp", corrOf("sq", "sp", "sqp", "sqq", "spp"))
        .withColumn("c_qd", corrOf("sq", "sd", "sqd", "sqq", "sdd"))
        .withColumn("c_pd", corrOf("sp", "sd", "spd", "spp", "sdd"))
        .selectExpr("""stack(3,
            'l_quantity', 'l_extendedprice', n, c_qp,
            'l_quantity', 'l_discount', n, c_qd,
            'l_extendedprice', 'l_discount', n, c_pd)
          AS (x_col, y_col, n, corr_val)""")
        .orderBy(col("x_col"), col("y_col"))
    }))

  val oracle: Map[String, String] = Map(
    "del1_forget_audit" ->
      """WITH fk AS (
        | SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
        |fo AS (
        | SELECT DISTINCT o_orderkey AS k FROM orders
        | JOIN fk ON o_custkey = fk.k),
        |rep AS (
        | SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
        |  COUNT(fk.k) AS n_forgotten
        | FROM customer LEFT JOIN fk ON c_custkey = fk.k
        | UNION ALL
        | SELECT 'orders', COUNT(*), COUNT(fk.k)
        | FROM orders LEFT JOIN fk ON o_custkey = fk.k
        | UNION ALL
        | SELECT 'lineitem', COUNT(*), COUNT(fo.k)
        | FROM lineitem LEFT JOIN fo ON l_orderkey = fo.k)
        |SELECT table_name, n_rows, n_forgotten,
        | n_rows - n_forgotten AS n_retained
        |FROM rep ORDER BY table_name""".stripMargin,
    "w7_rolling_range" ->
      """SELECT o_orderkey, o_custkey, d,
        | COUNT(*) OVER w AS n_30d,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_30d
        |FROM (SELECT *, CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "hg2_quantile_bins" ->
      """WITH r AS (
        | SELECT o_totalprice AS v,
        |  row_number() OVER (ORDER BY o_totalprice) AS rn,
        |  COUNT(*) OVER () AS n
        | FROM orders),
        |p AS (SELECT unnest([0.25, 0.5, 0.75]) AS p),
        |x AS (SELECT p.p AS p, v, rn, n,
        |  CAST(n - 1 AS DOUBLE) * p.p AS idx,
        |  CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 1 AS lo,
        |  least(CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 2, n) AS hi
        | FROM r, p),
        |g AS (SELECT p,
        |  MAX(CASE WHEN rn = lo THEN v END) AS vlo,
        |  MAX(CASE WHEN rn = hi THEN v END) AS vhi,
        |  MAX(idx - floor(idx)) AS frac
        | FROM x WHERE rn = lo OR rn = hi GROUP BY 1),
        |e AS (SELECT
        |  MAX(CASE WHEN p = 0.25 THEN vlo + frac * (vhi - vlo) END) AS e1,
        |  MAX(CASE WHEN p = 0.5  THEN vlo + frac * (vhi - vlo) END) AS e2,
        |  MAX(CASE WHEN p = 0.75 THEN vlo + frac * (vhi - vlo) END) AS e3
        | FROM g)
        |SELECT CAST(CAST(o_totalprice > e1 AS INT) +
        |            CAST(o_totalprice > e2 AS INT) +
        |            CAST(o_totalprice > e3 AS INT) AS BIGINT) AS bin,
        | COUNT(*) AS n,
        | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders, e GROUP BY 1 ORDER BY bin""".stripMargin,
    "a13_corr_matrix" ->
      """WITH a AS (
        | SELECT COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS nn,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sp,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS sd,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sqp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS sqd,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS spd,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sqq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS spp,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE) AS sdd
        | FROM lineitem)
        |SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, n,
        | (nn * sqp - sq * sp) /
        |  (sqrt(nn * sqq - sq * sq) * sqrt(nn * spp - sp * sp)) AS corr_val
        |FROM a
        |UNION ALL SELECT 'l_quantity', 'l_discount', n,
        | (nn * sqd - sq * sd) /
        |  (sqrt(nn * sqq - sq * sq) * sqrt(nn * sdd - sd * sd))
        |FROM a
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        | (nn * spd - sp * sd) /
        |  (sqrt(nn * spp - sp * sp) * sqrt(nn * sdd - sd * sd))
        |FROM a
        |ORDER BY x_col, y_col""".stripMargin
  )
}
