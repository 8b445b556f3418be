package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Exact._
import graft.core.Tables

/** Core relational operator corpus — one named query per SURVEY.md §2 row
  * (aggregations A1-A6, joins J1-J6, set ops §2.7, scalar functions §2.8,
  * window/sort §2.6, predicate/filter P2/P3/P5/P10, streaming-window S13/
  * §2.9 batch shape). Every query is expressed over the driver testdata
  * tables, fully declarative (Catalyst-optimizable), and paired with a
  * DuckDB oracle in [[oracle]].
  *
  * Determinism rules (driver hash compare):
  *  - double aggregates go through decimal (see [[graft.core.Exact]]);
  *  - no raw TIMESTAMP outputs (cast to DATE or format as string);
  *  - every result has a total ORDER BY;
  *  - integer-sum oracles cast to BIGINT (DuckDB SUM(int) is HUGEINT).
  */
object CoreQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** DECIMAL(8,4)-exact (1 - l_discount) factor. */
  private def oneMinus(c: Column): Column =
    lit(1).cast(DecimalType(8, 4)) - c.cast(DecimalType(8, 4))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship + aggregation family (SURVEY §2.5) ------------------
    "q1_pricing_summary" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("sum_disc_price"),
          avgd(col("l_quantity")).as("avg_qty"),
          avgd(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "a1_status_counts" -> ((s, dir) => {
      // single-pass pass/fail/total conditional counts (validation_dag A1)
      T(s, dir, "orders").agg(
        count(lit(1)).as("total"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        sumd(col("o_totalprice")).as("sum_price"))
    }),
    "a2_schema_gate" -> ((s, dir) => {
      // HAVING SUM(IF(fail))=0 → distinct passing keys (schema gate A2)
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(when(col("l_returnflag") === "R", 1)).as("n_fail"))
        .filter(col("n_fail") === 0)
        .select(col("l_orderkey"))
        .orderBy(col("l_orderkey"))
    }),
    "a3_latest_per_key" -> ((s, dir) => {
      // latest-run-per-entity dedup: window row_number (A3 / §2.6)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"))
        .orderBy(col("o_custkey"))
    }),
    "a4_ordered_string_agg" -> ((s, dir) => {
      // STRING_AGG(x ORDER BY y) via sorted-struct composition (A4)
      T(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("c_custkey"), col("c_name")))),
            x => x.getField("c_name")),
          ",").as("names"))
        .orderBy(col("c_nationkey"))
    }),
    "a6_distinct_projection" -> ((s, dir) => {
      T(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    }),

    // ---- joins (SURVEY §2.4) ------------------------------------------
    "j1_inner_merge" -> ((s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_name"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("o_orderkey"))
    }),
    "j2_anti_delta" -> ((s, dir) => {
      // rerun delta: all ∖ already-done via left_anti (J2)
      T(s, dir, "customer")
        .join(T(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "j3_pass_minus_fail" -> ((s, dir) => {
      // keys with ≥1 pass and 0 fails (J3)
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(when(col("l_linestatus") === "O", 1)).as("n_pass"),
          count(when(col("l_linestatus") === "F", 1)).as("n_fail"))
        .filter(col("n_pass") > 0 && col("n_fail") === 0)
        .select(col("l_orderkey"))
        .orderBy(col("l_orderkey"))
    }),
    "j4_unnest_explode" -> ((s, dir) => {
      // CROSS JOIN UNNEST(array) + positional filter (J4 labels unnest)
      T(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .filter(col("vec_id") < 8 && col("pos") < 8)
        .select(col("vec_id"), col("pos"), col("v").cast("double").as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }),
    "j5_semi_join" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "j6_union_regroup" -> ((s, dir) => {
      // union-shaped self-join then re-group (J6 partition∪cluster cols)
      val a = T(s, dir, "orders")
        .select(col("o_custkey").as("key"), lit("orders").as("src"))
      val b = T(s, dir, "customer")
        .select(col("c_custkey").as("key"), lit("customer").as("src"))
      a.unionByName(b)
        .groupBy(col("key"))
        .agg(countDistinct(col("src")).as("n_src"), count(lit(1)).as("n_rows"))
        .orderBy(col("key"))
    }),

    // ---- set operations (SURVEY §2.7) ----------------------------------
    "set1_union_all" -> ((s, dir) => {
      T(s, dir, "supplier")
        .select(col("s_nationkey").as("k"), lit("s").as("src"))
        .unionByName(T(s, dir, "customer")
          .select(col("c_nationkey").as("k"), lit("c").as("src")))
        .groupBy(col("k"), col("src")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"), col("src"))
    }),
    "set2_except" -> ((s, dir) => {
      T(s, dir, "part").select(col("p_partkey").as("pk"))
        .except(T(s, dir, "lineitem").select(col("l_partkey").as("pk")))
        .orderBy(col("pk"))
    }),
    "set3_intersect" -> ((s, dir) => {
      T(s, dir, "part").select(col("p_partkey").as("pk"))
        .intersect(T(s, dir, "lineitem").select(col("l_partkey").as("pk")))
        .orderBy(col("pk"))
    }),
    "set4_except_all" -> ((s, dir) => {
      // MULTISET difference: each l_partkey occurrence cancels one
      // part-side occurrence — the bag semantics EXCEPT collapses away
      T(s, dir, "lineitem").select(col("l_partkey").as("pk"))
        .exceptAll(T(s, dir, "orders")
          .select((col("o_orderkey") % 200).as("pk")))
        .orderBy(col("pk"))
    }),
    "set5_intersect_all" -> ((s, dir) => {
      // MULTISET intersection: min of the two occurrence counts
      T(s, dir, "lineitem").select((col("l_partkey") % 500).as("pk"))
        .intersectAll(T(s, dir, "orders")
          .select((col("o_orderkey") % 500).as("pk")))
        .orderBy(col("pk"))
    }),

    // ---- scalar function surface (SURVEY §2.8) --------------------------
    "f1_string_functions" -> ((s, dir) => {
      T(s, dir, "customer").select(
        col("c_custkey"),
        expr("split_part(c_name, '#', 2)").as("id_part"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).as("name_len"),
        lpad(col("c_custkey").cast("string"), 6, "0").as("padded"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        regexp_replace(col("c_name"), "[0-9]", "").as("digitless"))
        .orderBy(col("c_custkey"))
    }),
    "f2_date_functions" -> ((s, dir) => {
      T(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate") + expr("INTERVAL 1 DAY"), "yyyy-MM-dd").as("next_day"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
        .orderBy(col("o_orderkey"))
    }),
    "f3_json_extract" -> ((s, dir) => {
      // JSON_EXTRACT_SCALAR analog (constants.py:85 / S13)
      T(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    // ---- predicate / filter engines (SURVEY §2.3) -----------------------
    "p2_rule_filter" -> ((s, dir) => {
      // rule list {field, matchType, caseSensitive, value} OR-folded (P2)
      val rules = graft.translate.FilterRules(Seq(
        graft.translate.FilterRule("p_type", "contains", "brass", caseSensitive = false),
        graft.translate.FilterRule("p_brand", "equals", "Brand#13", caseSensitive = true)))
      T(s, dir, "part").filter(rules.toColumn)
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),
    "p3_pattern_filter" -> ((s, dir) => {
      // FIELD=KEYWORD,... any-match filter (P3)
      val pat = graft.translate.PatternFilter(Seq(
        "o_orderstatus" -> "F", "o_orderpriority" -> "1-URGENT"))
      T(s, dir, "orders").filter(pat.toColumn)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),
    "p5_create_regex" -> ((s, dir) => {
      // CREATE-statement table extractor (P5) over synthesized DDL text
      val ddl = T(s, dir, "part").select(
        col("p_partkey"),
        concat(lit("CREATE TABLE IF NOT EXISTS ds"),
          (col("p_partkey") % 5).cast("string"), lit(".tbl_"),
          col("p_partkey").cast("string"), lit(" (x INT)")).as("stmt"))
      ddl.select(
        col("p_partkey"),
        regexp_extract(col("stmt"),
          graft.schema.TableFilter.createTableRegex, 4).as("table_name"))
        .orderBy(col("p_partkey"))
    }),
    "p10_path_parse" -> ((s, dir) => {
      // GCS-path → (db, table) parser (P10) over synthesized paths
      val paths = T(s, dir, "documents").select(
        col("doc_id"),
        concat(lit("staging/"), col("source"), lit("/doc_"),
          col("doc_id").cast("string"), lit("/part-0.parquet")).as("path"))
      paths.select(
        col("doc_id"),
        expr("split_part(path, '/', 2)").as("db"),
        expr("split_part(path, '/', 3)").as("tbl"))
        .orderBy(col("doc_id"))
    }),

    // ---- window / running aggregates (SURVEY §2.6) ----------------------
    "w2_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(dec(col("value"))).over(w).cast("double").as("running_value"))
        .orderBy(col("event_id"))
    }),

    // ---- streaming-shaped windows (SURVEY §2.9, batch semantics) --------
    "st1_tumbling_window" -> ((s, dir) => {
      // daily tumbling window aggregate (hive_inc daily window)
      T(s, dir, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }),
    "s13_recent_window_scan" -> ((s, dir) => {
      // 1-day lookback window over max event time + JSON attr (S13)
      val ev = T(s, dir, "events")
      val mx = ev.agg(max(col("ts")).as("mx"))
      // 1-row aggregate: broadcast explicitly (AQE would pick it anyway,
      // but the hint removes the planner dependence — q11/q22 pattern)
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") > col("mx") - expr("INTERVAL 1 DAY"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy(col("event_type"))
    }))

  /** DuckDB-dialect oracle, same column names + ORDER BY per query. */
  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_status_counts" ->
      """SELECT COUNT(*) AS total,
        | COUNT(CASE WHEN o_orderstatus='F' THEN 1 END) AS n_f,
        | COUNT(CASE WHEN o_orderstatus='O' THEN 1 END) AS n_o,
        | COUNT(CASE WHEN o_orderstatus='P' THEN 1 END) AS n_p,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders""".stripMargin,
    "a2_schema_gate" ->
      """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |HAVING COUNT(CASE WHEN l_returnflag='R' THEN 1 END)=0
        |ORDER BY l_orderkey""".stripMargin,
    "a3_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS last_order_date
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC)=1
        |ORDER BY o_custkey""".stripMargin,
    "a4_ordered_string_agg" ->
      """SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_custkey) AS names
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a6_distinct_projection" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "j1_inner_merge" ->
      """SELECT o_orderkey, c_name, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders JOIN customer ON o_custkey=c_custkey ORDER BY o_orderkey""".stripMargin,
    "j2_anti_delta" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j3_pass_minus_fail" ->
      """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |HAVING COUNT(CASE WHEN l_linestatus='O' THEN 1 END)>0
        |   AND COUNT(CASE WHEN l_linestatus='F' THEN 1 END)=0
        |ORDER BY l_orderkey""".stripMargin,
    "j4_unnest_explode" ->
      """SELECT vec_id, CAST(i-1 AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS val
        |FROM embeddings, generate_series(1,8) t(i)
        |WHERE vec_id < 8 ORDER BY vec_id, pos""".stripMargin,
    "j5_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j6_union_regroup" ->
      """SELECT key, COUNT(DISTINCT src) AS n_src, COUNT(*) AS n_rows FROM (
        | SELECT o_custkey AS key, 'orders' AS src FROM orders
        | UNION ALL
        | SELECT c_custkey AS key, 'customer' AS src FROM customer
        |) GROUP BY key ORDER BY key""".stripMargin,
    "set1_union_all" ->
      """SELECT k, src, COUNT(*) AS n FROM (
        | SELECT s_nationkey AS k, 's' AS src FROM supplier
        | UNION ALL
        | SELECT c_nationkey AS k, 'c' AS src FROM customer
        |) GROUP BY k, src ORDER BY k, src""".stripMargin,
    "set2_except" ->
      """SELECT p_partkey AS pk FROM part
        |EXCEPT SELECT l_partkey AS pk FROM lineitem ORDER BY pk""".stripMargin,
    "set3_intersect" ->
      """SELECT p_partkey AS pk FROM part
        |INTERSECT SELECT l_partkey AS pk FROM lineitem ORDER BY pk""".stripMargin,
    "set4_except_all" ->
      """SELECT l_partkey AS pk FROM lineitem
        |EXCEPT ALL SELECT o_orderkey % 200 AS pk FROM orders
        |ORDER BY pk""".stripMargin,
    "set5_intersect_all" ->
      """SELECT l_partkey % 500 AS pk FROM lineitem
        |INTERSECT ALL SELECT o_orderkey % 500 AS pk FROM orders
        |ORDER BY pk""".stripMargin,
    "f1_string_functions" ->
      """SELECT c_custkey,
        | split_part(c_name, '#', 2) AS id_part,
        | upper(c_mktsegment) AS seg_upper,
        | lower(c_name) AS name_lower,
        | concat_ws('|', c_name, c_mktsegment) AS joined,
        | substring(c_name, 1, 8) AS prefix,
        | CAST(length(c_name) AS INTEGER) AS name_len,
        | lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
        | CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
        | regexp_replace(c_name, '[0-9]', '', 'g') AS digitless
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f2_date_functions" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS d,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d') AS next_day,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        | strftime(o_orderdate, '%Y-%m-%d') AS iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f3_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "p2_rule_filter" ->
      """SELECT p_partkey, p_brand, p_type FROM part
        |WHERE contains(lower(p_type), 'brass') OR p_brand = 'Brand#13'
        |ORDER BY p_partkey""".stripMargin,
    "p3_pattern_filter" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "p5_create_regex" ->
      """SELECT p_partkey,
        | regexp_extract(
        |   'CREATE TABLE IF NOT EXISTS ds' || CAST(p_partkey % 5 AS VARCHAR) || '.tbl_' || CAST(p_partkey AS VARCHAR) || ' (x INT)',
        |   '(CREATE OR REPLACE|CREATE)\s+(TABLE|VIEW)\s+(IF NOT EXISTS\s+)?`?([\w$]+\.[\w$]+)`?', 4) AS table_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p10_path_parse" ->
      """SELECT doc_id,
        | split_part('staging/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '/part-0.parquet', '/', 2) AS db,
        | split_part('staging/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '/part-0.parquet', '/', 3) AS tbl
        |FROM documents ORDER BY doc_id""".stripMargin,
    "w2_running_sum" ->
      """SELECT event_id, user_id,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "st1_tumbling_window" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "s13_recent_window_scan" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
