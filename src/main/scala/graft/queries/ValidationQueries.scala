package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.validate.ColumnValidator.AggSpec
import graft.validate.{ColumnValidator, CustomQueryValidator, RowValidator, SchemaValidator}

/** DVT validator demo corpus (SURVEY §2.5 A7-A9 + custom-query): each
  * validator exercised against a derived "target" of a testdata table so
  * every status branch (pass / fail / mismatch / *_only) appears in the
  * output, with a DuckDB oracle mirroring the exact expression order.
  */
object ValidationQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v7_column_validation" -> ((s, dir) => {
      val src = T(s, dir, "lineitem")
      val tgt = src.filter(col("l_shipdate") <= lit("1997-06-30").cast("timestamp"))
      ColumnValidator.validate(src, tgt,
        Seq(AggSpec("count", "l_quantity"), AggSpec("sum", "l_quantity"),
          AggSpec("avg", "l_quantity")),
        groupBy = Seq("l_linestatus"))
        .orderBy(col("l_linestatus"), col("validation_name"))
    }),
    "v8_row_validation" -> ((s, dir) => {
      val base = T(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_custkey").cast("string").as("ck"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      val tgt = base.withColumn("o_orderpriority",
        when(col("o_orderkey") % 97 === 0, "9-FAKE").otherwise(col("o_orderpriority")))
      RowValidator.validate(base, tgt, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority", "ck", "od"))
        .orderBy(col("o_orderkey"))
    }),
    "v9_schema_validation" -> ((s, dir) => {
      val src = T(s, dir, "lineitem")
      val tgt = src.drop("l_tax")
        .withColumn("l_linenumber", col("l_linenumber").cast("bigint"))
        .withColumn("extra_col", lit(1))
      SchemaValidator.validate(s, src, tgt)
        .orderBy(col("column_name"))
    }),
    "v10_custom_query" -> ((s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      CustomQueryValidator.validate(s,
        """SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
          |FROM lineitem_v WHERE l_discount > 0.05""".stripMargin,
        """SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
          |FROM lineitem_v WHERE l_discount > 0.05 AND l_quantity < 45""".stripMargin,
        pctThreshold = 1.0)
        .orderBy(col("validation_name"))
    }),
    "v12_distribution" -> ((s, dir) => {
      // the check for "aggregates pass but the data is shifted": exact
      // PERCENTILE_CONT profile compare (shared qt2 interpolation
      // formula) with v7's threshold semantics. Target clips the
      // l_quantity tail — low percentiles pass inside the 2% band,
      // upper ones fail, and l_discount (untouched scale) mostly passes.
      // The validator picks its quantile shape per side from the size
      // estimate (autoBucketLocate): window sort at oracle scale,
      // bucket-locate past the measured 32 MB crossover — both shapes
      // bit-identical by spec, so the key's answer never depends on it
      val src = T(s, dir, "lineitem")
      val tgt = src.filter(col("l_quantity") <= 45.0)
      graft.validate.DistributionValidator.validate(src, tgt,
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9), pctThreshold = 2.0)
        .orderBy(col("column_name"), col("p"))
    }),
    "v13_uniqueness" -> ((s, dir) => {
      // PK/uniqueness audit: an intact single PK, an intact composite
      // key, a double-loaded slice (every 100th order re-inserted),
      // and a key with injected NULLs — the four outcomes a post-load
      // audit must keep apart
      import graft.validate.Uniqueness
      val orders = T(s, dir, "orders")
      val reloaded = orders.unionByName(orders.filter(col("o_orderkey") % 100 === 0))
      val nullable = orders.withColumn("k",
        when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_orderkey")))
      Uniqueness.check(Seq(
          Uniqueness.Key("orders.pk", orders, Seq("o_orderkey")),
          Uniqueness.Key("lineitem.composite", T(s, dir, "lineitem"),
            Seq("l_orderkey", "l_linenumber")),
          Uniqueness.Key("orders.reloaded_slice", reloaded, Seq("o_orderkey")),
          Uniqueness.Key("orders.nullable_key", nullable, Seq("k"))))
        .orderBy(col("key_name"))
    }),
    "v11_ref_integrity" -> ((s, dir) => {
      // FK orphan audit: one intact relation (lineitem→orders) and one
      // deliberately broken parent (customers with key%10==0 dropped)
      // prove both the clean and the detecting path; null FKs counted
      // apart (SQL FKs ignore NULLs)
      import graft.validate.RefIntegrity
      RefIntegrity.check(Seq(
          RefIntegrity.Relation("lineitem.l_orderkey->orders.o_orderkey",
            T(s, dir, "lineitem"), "l_orderkey",
            T(s, dir, "orders"), "o_orderkey"),
          RefIntegrity.Relation("orders.o_custkey->customer(sampled).c_custkey",
            T(s, dir, "orders"), "o_custkey",
            T(s, dir, "customer").filter(col("c_custkey") % 10 =!= 0),
            "c_custkey")))
        .orderBy(col("relation"))
    }))

  val oracle: Map[String, String] = Map(
    "v12_distribution" ->
      """WITH sv AS (
        | SELECT 'l_quantity' AS column_name, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        | UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        | UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem),
        |tv AS (
        | SELECT 'l_quantity' AS column_name, CAST(l_quantity AS DOUBLE) AS v FROM lineitem WHERE l_quantity <= 45
        | UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_quantity <= 45
        | UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_quantity <= 45),
        |ps AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS p),
        |sq AS (
        | SELECT column_name, p,
        |  MAX(CASE WHEN rn = lo THEN v END)
        |   + MAX(idx - floor(idx)) * (MAX(CASE WHEN rn = hi THEN v END)
        |     - MAX(CASE WHEN rn = lo THEN v END)) AS source_value
        | FROM (SELECT column_name, v, rn, n, p.p AS p,
        |    CAST(n - 1 AS DOUBLE) * p.p AS idx,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 1 AS lo,
        |    least(CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 2, n) AS hi
        |   FROM (SELECT column_name, v,
        |      row_number() OVER (PARTITION BY column_name ORDER BY v) AS rn,
        |      COUNT(*) OVER (PARTITION BY column_name) AS n
        |     FROM sv WHERE v IS NOT NULL) r, ps p)
        | WHERE rn = lo OR rn = hi GROUP BY column_name, p),
        |tq AS (
        | SELECT column_name, p,
        |  MAX(CASE WHEN rn = lo THEN v END)
        |   + MAX(idx - floor(idx)) * (MAX(CASE WHEN rn = hi THEN v END)
        |     - MAX(CASE WHEN rn = lo THEN v END)) AS target_value
        | FROM (SELECT column_name, v, rn, n, p.p AS p,
        |    CAST(n - 1 AS DOUBLE) * p.p AS idx,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 1 AS lo,
        |    least(CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 2, n) AS hi
        |   FROM (SELECT column_name, v,
        |      row_number() OVER (PARTITION BY column_name ORDER BY v) AS rn,
        |      COUNT(*) OVER (PARTITION BY column_name) AS n
        |     FROM tv WHERE v IS NOT NULL) r, ps p)
        | WHERE rn = lo OR rn = hi GROUP BY column_name, p)
        |SELECT column_name, CAST(p AS DOUBLE) AS p, source_value, target_value,
        | target_value - source_value AS difference,
        | CASE WHEN source_value=0 AND target_value=0 THEN 0
        |      WHEN source_value=0 THEN NULL
        |      ELSE (target_value - source_value)/source_value*100 END AS pct_difference,
        | CAST(2.0 AS DOUBLE) AS pct_threshold,
        | CASE WHEN source_value IS NULL OR target_value IS NULL THEN 'fail'
        |      WHEN (CASE WHEN source_value=0 AND target_value=0 THEN 0
        |            WHEN source_value=0 THEN NULL
        |            ELSE (target_value - source_value)/source_value*100 END) IS NULL THEN 'fail'
        |      WHEN abs(CASE WHEN source_value=0 AND target_value=0 THEN 0
        |            WHEN source_value=0 THEN NULL
        |            ELSE (target_value - source_value)/source_value*100 END) <= 2.0 THEN 'pass'
        |      ELSE 'fail' END AS validation_status
        |FROM sq FULL JOIN tq USING (column_name, p)
        |ORDER BY column_name, p""".stripMargin,
    "v13_uniqueness" ->
      """WITH audits AS (
        | SELECT 'orders.pk' AS key_name, (o_orderkey IS NULL) AS nk,
        |  COUNT(*) AS n FROM orders GROUP BY 1, 2, o_orderkey
        | UNION ALL
        | SELECT 'lineitem.composite',
        |  (l_orderkey IS NULL OR l_linenumber IS NULL), COUNT(*)
        | FROM lineitem GROUP BY 1, 2, l_orderkey, l_linenumber
        | UNION ALL
        | SELECT 'orders.reloaded_slice', (o_orderkey IS NULL), COUNT(*)
        | FROM (SELECT o_orderkey FROM orders
        |       UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 0)
        | GROUP BY 1, 2, o_orderkey
        | UNION ALL
        | SELECT 'orders.nullable_key', (k IS NULL), COUNT(*)
        | FROM (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |              ELSE o_orderkey END AS k FROM orders)
        | GROUP BY 1, 2, k)
        |SELECT key_name,
        | CAST(SUM(n) AS BIGINT) AS total_rows,
        | CAST(SUM(CASE WHEN nk THEN n ELSE 0 END) AS BIGINT) AS null_key_rows,
        | CAST(SUM(CASE WHEN NOT nk AND n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS duplicate_keys,
        | CAST(SUM(CASE WHEN NOT nk AND n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS excess_rows,
        | CAST(MAX(CASE WHEN NOT nk THEN n ELSE 0 END) AS BIGINT) AS max_multiplicity
        |FROM audits GROUP BY key_name ORDER BY key_name""".stripMargin,
    "v11_ref_integrity" ->
      """SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
        | CAST(COUNT(*) AS BIGINT) AS total_rows,
        | CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
        | CAST(SUM(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
        |   THEN 1 ELSE 0 END) AS BIGINT) AS orphans
        |FROM lineitem l LEFT JOIN
        | (SELECT DISTINCT o_orderkey AS k FROM orders) p ON l.l_orderkey = p.k
        |UNION ALL
        |SELECT 'orders.o_custkey->customer(sampled).c_custkey',
        | CAST(COUNT(*) AS BIGINT),
        | CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
        |   THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders o LEFT JOIN
        | (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 10 <> 0) p
        | ON o.o_custkey = p.k
        |ORDER BY relation""".stripMargin,
    "v7_column_validation" ->
      """WITH s AS (
        | SELECT l_linestatus, CAST(COUNT(l_quantity) AS DOUBLE) AS c,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sm,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)/COUNT(l_quantity) AS av
        | FROM lineitem GROUP BY l_linestatus),
        |t AS (
        | SELECT l_linestatus, CAST(COUNT(l_quantity) AS DOUBLE) AS c,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sm,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)/COUNT(l_quantity) AS av
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-06-30' GROUP BY l_linestatus),
        |u AS (
        | SELECT COALESCE(s.l_linestatus, t.l_linestatus) AS l_linestatus, v.validation_name,
        |  CASE v.validation_name WHEN 'count__l_quantity' THEN s.c WHEN 'sum__l_quantity' THEN s.sm ELSE s.av END AS source_agg_value,
        |  CASE v.validation_name WHEN 'count__l_quantity' THEN t.c WHEN 'sum__l_quantity' THEN t.sm ELSE t.av END AS target_agg_value
        | FROM s FULL JOIN t ON s.l_linestatus = t.l_linestatus
        | CROSS JOIN (VALUES ('count__l_quantity'),('sum__l_quantity'),('avg__l_quantity')) v(validation_name))
        |SELECT l_linestatus, validation_name, source_agg_value, target_agg_value,
        | target_agg_value - source_agg_value AS difference,
        | CASE WHEN source_agg_value=0 AND target_agg_value=0 THEN 0
        |      WHEN source_agg_value=0 THEN NULL
        |      ELSE (target_agg_value - source_agg_value)/source_agg_value*100 END AS pct_difference,
        | CAST(0.0 AS DOUBLE) AS pct_threshold,
        | CASE WHEN source_agg_value IS NULL OR target_agg_value IS NULL THEN 'fail'
        |      WHEN (CASE WHEN source_agg_value=0 AND target_agg_value=0 THEN 0
        |            WHEN source_agg_value=0 THEN NULL
        |            ELSE (target_agg_value - source_agg_value)/source_agg_value*100 END) IS NULL THEN 'fail'
        |      WHEN abs(CASE WHEN source_agg_value=0 AND target_agg_value=0 THEN 0
        |            WHEN source_agg_value=0 THEN NULL
        |            ELSE (target_agg_value - source_agg_value)/source_agg_value*100 END) <= 0.0 THEN 'pass'
        |      ELSE 'fail' END AS validation_status
        |FROM u ORDER BY l_linestatus, validation_name""".stripMargin,
    "v8_row_validation" ->
      """WITH src AS (
        | SELECT o_orderkey, sha256(concat_ws('||', o_orderstatus, o_orderpriority,
        |   CAST(o_custkey AS VARCHAR), strftime(o_orderdate, '%Y-%m-%d'))) AS source_hash
        | FROM orders),
        |tgt AS (
        | SELECT o_orderkey, sha256(concat_ws('||', o_orderstatus,
        |   CASE WHEN o_orderkey % 97 = 0 THEN '9-FAKE' ELSE o_orderpriority END,
        |   CAST(o_custkey AS VARCHAR), strftime(o_orderdate, '%Y-%m-%d'))) AS target_hash
        | FROM orders)
        |SELECT o_orderkey, source_hash, target_hash,
        | CASE WHEN source_hash IS NULL THEN 'target_only'
        |      WHEN target_hash IS NULL THEN 'source_only'
        |      WHEN source_hash = target_hash THEN 'match'
        |      ELSE 'mismatch' END AS validation_status
        |FROM src FULL JOIN tgt USING (o_orderkey) ORDER BY o_orderkey""".stripMargin,
    "v9_schema_validation" ->
      """WITH s AS (
        | SELECT lower(column_name) AS column_name,
        |  CASE column_type WHEN 'VARCHAR' THEN 'string' WHEN 'BIGINT' THEN 'bigint'
        |   WHEN 'INTEGER' THEN 'int' WHEN 'DOUBLE' THEN 'double'
        |   WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'FLOAT' THEN 'float'
        |   ELSE lower(column_type) END AS source_type
        | FROM (DESCRIBE lineitem)),
        |t AS (
        | SELECT lower(column_name) AS column_name,
        |  CASE column_type WHEN 'VARCHAR' THEN 'string' WHEN 'BIGINT' THEN 'bigint'
        |   WHEN 'INTEGER' THEN 'int' WHEN 'DOUBLE' THEN 'double'
        |   WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'FLOAT' THEN 'float'
        |   ELSE lower(column_type) END AS target_type
        | FROM (DESCRIBE (SELECT l_orderkey, l_partkey, l_suppkey,
        |   CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice,
        |   l_discount, l_returnflag, l_linestatus, l_shipdate, 1 AS extra_col
        |   FROM lineitem)))
        |SELECT COALESCE(s.column_name, t.column_name) AS column_name,
        | source_type, target_type,
        | CASE WHEN target_type IS NULL THEN 'source_only'
        |      WHEN source_type IS NULL THEN 'target_only'
        |      WHEN source_type = target_type THEN 'pass'
        |      ELSE 'type_mismatch' END AS validation_status
        |FROM s FULL JOIN t ON s.column_name = t.column_name
        |ORDER BY column_name""".stripMargin,
    "v10_custom_query" ->
      """WITH s AS (
        | SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_qty
        | FROM lineitem WHERE l_discount > 0.05),
        |t AS (
        | SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_qty
        | FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 45),
        |su AS (SELECT 'n' AS validation_name, n AS source_value FROM s
        |  UNION ALL SELECT 'total_qty', total_qty FROM s),
        |tu AS (SELECT 'n' AS validation_name, n AS target_value FROM t
        |  UNION ALL SELECT 'total_qty', total_qty FROM t)
        |SELECT validation_name, source_value, target_value,
        | target_value - source_value AS difference,
        | CASE WHEN source_value=0 AND target_value=0 THEN 0
        |      WHEN source_value=0 THEN NULL
        |      ELSE (target_value - source_value)/source_value*100 END AS pct_difference,
        | CAST(1.0 AS DOUBLE) AS pct_threshold,
        | CASE WHEN source_value IS NULL OR target_value IS NULL THEN 'fail'
        |      WHEN (CASE WHEN source_value=0 AND target_value=0 THEN 0
        |            WHEN source_value=0 THEN NULL
        |            ELSE (target_value - source_value)/source_value*100 END) IS NULL THEN 'fail'
        |      WHEN abs(CASE WHEN source_value=0 AND target_value=0 THEN 0
        |            WHEN source_value=0 THEN NULL
        |            ELSE (target_value - source_value)/source_value*100 END) <= 1.0 THEN 'pass'
        |      ELSE 'fail' END AS validation_status
        |FROM su FULL JOIN tu USING (validation_name) ORDER BY validation_name""".stripMargin
  )
}
