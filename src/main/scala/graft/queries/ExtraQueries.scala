package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Exact._
import graft.core.Tables
import graft.operators.{LogStats, TextOps}

/** Coverage extensions: the DTS log fold (J7/S11), ranking and
  * lag/lead windows (§2.6), conditional scalar surface (§2.8), and the
  * sliding-window streaming shape (§2.9, batch semantics).
  */
object ExtraQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Deterministic synthetic transfer-log lines from orders — same
    * construction mirrored in the oracle, then parsed back by regex. */
  private def logLines(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").select(
      concat(lit("job table t"), (col("o_orderkey") % 20).cast("string"),
        when(col("o_orderkey") % 3 === 0,
          concat(lit(" rows "), col("o_orderkey").cast("string")))
          .when(col("o_orderkey") % 3 === 1,
            concat(lit(" bytes "), (col("o_orderkey") * 100).cast("string")))
          .otherwise(concat(lit(" status "),
            when(col("o_orderkey") % 7 === 0, "FAILED").otherwise("SUCCEEDED"))))
        .as("value"))

  private val QtPs = Seq(0.5, 0.9, 0.99)
  private val PrScale = 1000000L
  private val PrIters = 2
  private val PrSuppOffset = 1000000L
  private val HhK = 10
  private val DdK = 20
  private val RkK = 50
  private val MixWeights = Map("src0" -> 3, "src1" -> 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qt1_rank_quantiles" -> ((s, dir) => {
      // exact rank-defined quantiles (value at ceil(p·n), 1-based) of
      // per-doc token counts, per language — the percentile view a
      // curation dashboard needs, with no interpolation ambiguity
      val t = T(s, dir, "documents").select(col("lang"), col("doc_id"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).cast("long").as("toks"))
      val w = Window.partitionBy(col("lang")).orderBy(col("toks"), col("doc_id"))
      t.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("lang"))).cast("long"))
        .withColumn("p", explode(array(QtPs.map(lit): _*)))
        .filter(col("rn") === ceil(col("p") * col("n")))
        .select(col("lang"), col("p"), col("toks").as("value"))
        .orderBy(col("lang"), col("p"))
    }),
    "a11_filtered_agg" -> ((s, dir) => {
      // FILTER (WHERE …) aggregates — per-branch conditional
      // aggregation in ONE pass over the fact table, the idiom
      // migrations rewrite CASE-inside-SUM into
      T(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("o_totalprice") > 150000, 1)).as("n_big"),
          sumd(when(col("o_orderpriority").startsWith("1"), col("o_totalprice")))
            .as("urgent_value"),
          max(when(col("o_orderkey") % 2 === 0, col("o_orderdate"))).as("last_even"))
        .orderBy(col("o_orderstatus"))
    }),
    "a12_multi_distinct" -> ((s, dir) => {
      // several COUNT(DISTINCT …) over different columns in one
      // aggregate — Catalyst plans this through Expand (one pass,
      // row-multiplied by the distinct-group count), not N self-joins
      T(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("d_cust"),
          countDistinct(col("o_orderpriority")).as("d_prio"),
          countDistinct(col("o_orderdate")).as("d_dates"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),
    "w5_ignore_nulls" -> ((s, dir) => {
      // IGNORE NULLS window navigation — the Teradata/Oracle surface
      // migrations lean on: LOCF gap-fill (last non-null carried
      // forward) and first-non-null per partition
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("v", when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_orderpriority")))
        .withColumn("locf", last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("first_nn", first(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("o_orderkey"), col("o_custkey"), col("v"),
          col("locf"), col("first_nn"))
        .orderBy(col("o_orderkey"))
    }),
    "qt2_percentile_cont" -> ((s, dir) => {
      // PERCENTILE_CONT: linear interpolation at index (n-1)·p — the
      // other SQL quantile face (qt1 is the rank-exact PERCENTILE_DISC
      // view). Both engines compute the SAME explicit formula
      // (vlo + frac·(vhi − vlo), frac = idx − floor(idx)) so the IEEE
      // result is bit-identical — never two different library
      // interpolations racing each other
      val t = T(s, dir, "documents").select(col("lang"), col("doc_id"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).cast("long").as("toks"))
      val w = Window.partitionBy(col("lang")).orderBy(col("toks"), col("doc_id"))
      t.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("lang"))).cast("long"))
        .withColumn("p", explode(array(QtPs.map(lit): _*)))
        .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
        .withColumn("lo", floor(col("idx")) + 1)
        .withColumn("hi", least(col("lo") + 1, col("n")))
        .filter(col("rn") === col("lo") || col("rn") === col("hi"))
        .groupBy(col("lang"), col("p"))
        .agg(
          max(when(col("rn") === col("lo"), col("toks"))).as("vlo"),
          max(when(col("rn") === col("hi"), col("toks"))).as("vhi"),
          max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
        .select(col("lang"), col("p"),
          (col("vlo").cast("double") +
            col("frac") * (col("vhi") - col("vlo")).cast("double")).as("value"))
        .orderBy(col("lang"), col("p"))
    }),
    "qt3_scalable_quantiles" -> ((s, dir) => {
      // the SAME exact PERCENTILE_CONT answer as qt2, computed by the
      // bucket-locate shape (operators/ScalableQuantile) — no
      // group-sized sort anywhere, the 100-TB path for exact quantiles
      val t = T(s, dir, "documents").select(col("lang"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).cast("long").as("toks"))
      graft.operators.ScalableQuantile
        .percentileCont(t, "lang", "toks", QtPs)
        .orderBy(col("lang"), col("p"))
    }),
    "hh1_heavy_hitters" -> ((s, dir) => {
      // exact per-source heavy hitters (top-K words by count) — the
      // WindowGroupLimit top-k shape, map-side pruned
      val counts = T(s, dir, "documents")
        .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("word"))
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= HhK)
        .orderBy(col("source"), col("rank"))
    }),
    "mix3_interleave" -> ((s, dir) => {
      // proportional round-robin schedule keys for curriculum mixing
      graft.operators.Sampling.proportionalInterleave(
          T(s, dir, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id", MixWeights, defaultWeight = 1)
        .select(col("doc_id"), col("source"), col("pos"), col("ikey"))
        .orderBy(col("source"), col("pos"))
    }),
    "dd1_token_drift" -> ((s, dir) => {
      // corpus-drift monitor: the most divergent tokens between two
      // corpus halves by the integer cross statistic |cntA·Nb − cntB·Na|
      // (exact — no ratios, no logs)
      val wx = T(s, dir, "documents")
        .select((col("doc_id") % 2 === 0).as("isa"),
          explode(TextOps.words(col("text"))).as("word"))
      val c = wx.groupBy(col("word")).agg(
        sum(when(col("isa"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("isa"), 0L).otherwise(1L)).as("cnt_b"))
      val tot = c.agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"))
      c.crossJoin(broadcast(tot))
        .withColumn("drift",
          abs(col("cnt_a") * col("nb") - col("cnt_b") * col("na")))
        .orderBy(col("drift").desc, col("word")).limit(DdK)
        .select(col("word"), col("cnt_a"), col("cnt_b"), col("drift"))
        .orderBy(col("drift").desc, col("word"))
    }),
    "pr1_purchase_rank" -> ((s, dir) => {
      // fixed-point PageRank over the customer→supplier purchase graph
      // (supplier ids offset out of the customer id space); integer
      // rounds, so the whole trajectory hash-matches the oracle replay
      val edges = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + PrSuppOffset).as("dst"))
      // the returned plan reads the operator's cached rank table —
      // deliberately NOT unpersisted here: releasing it would force
      // the consumer's first action to recompute the whole iterative
      // chain (measured ~2× the build). Ownership follows the
      // operator contract ("the RETURNED table is cached —
      // unpersist() when consumed"); Verify/Bench clear per query.
      graft.operators.RankPropagation
        .fixedPointPageRank(edges, PrIters, PrScale)
        .orderBy(col("node"))
    }),
    "rk1_quality_topk" -> ((s, dir) => {
      // exact global top-K — orderBy+limit, which Spark plans as
      // TakeOrderedAndProject (per-partition heaps, no global sort)
      T(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextAnalysis
            .tokenCountWs(coalesce(col("text"), lit("")))
            .cast("long").as("toks"))
        .orderBy(col("toks").desc, col("doc_id")).limit(RkK)
    }),
    "j7_log_fold" -> ((s, dir) => {
      LogStats.tableStats(LogStats.parse(logLines(s, dir)))
        .orderBy(col("table_name"))
    }),
    "w1_rank_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      T(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
        .filter(col("rn") <= 5)
        .orderBy(col("c_mktsegment"), col("rn"))
    }),
    "w3_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"),
        datediff(lead(col("o_orderdate"), 1).over(w).cast("date"),
          col("o_orderdate").cast("date")).as("days_to_next"))
        .orderBy(col("o_orderkey"))
    }),
    "f4_conditionals" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        nullif(col("p_size"), lit(10)).as("size_or_null"),
        coalesce(nullif(col("p_brand"), lit("Brand#13")), lit("OTHER")).as("brand_or_other"),
        least(col("p_size"), (col("p_partkey") % 30).cast("int")).as("lo"),
        greatest(col("p_size"), (col("p_partkey") % 30).cast("int")).as("hi"),
        when(col("p_retailprice") < 1000, "cheap")
          .when(col("p_retailprice") < 1500, "mid")
          .otherwise("premium").as("price_band"))
        .orderBy(col("p_partkey"))
    }),
    "a7_profile" -> ((s, dir) => {
      // exact quantiles only on the low-cardinality column: exact
      // percentile over a near-unique double column materializes a
      // per-partition value map (use percentile_approx for that at scale)
      graft.operators.Profiler.profile(
        T(s, dir, "lineitem"),
        Seq(graft.operators.Profiler.Spec("l_quantity"),
          graft.operators.Profiler.Spec("l_extendedprice", quantiles = Nil)),
        exact = true)
        .orderBy(col("column_name"), col("metric"))
    }),
    "a5_rollup" -> ((s, dir) => {
      // subtotal hierarchy: (flag, status) -> (flag) -> grand total.
      // r16 opt: pre-aggregate to the finest grouping set FIRST, then
      // roll up the aggregate-sized frame — COUNT and the exact
      // decimal SUM are reaggregatable, so the Expand multiplication
      // (one copy of every fact row per grouping set) runs over a
      // handful of group rows instead of the whole fact table (guide
      // §2.3 "aggregate before you shuffle"; a10's interleaved A/B
      // measured 1.41 s → 0.92 s). Decimal addition is associative —
      // the re-summed decimal casts to the identical double, and the
      // oracle hash-match proves it.
      val base = T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("__n"), sum(dec(col("l_quantity"))).as("__s"))
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_qty"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),
    "a10_grouping_sets" -> ((s, dir) => {
      // full cube: every subtotal combination + grouping_id.
      // r16 opt: same finest-set pre-aggregation as a5 — the cube's
      // 4-way Expand runs over the 6-row (flag, status) aggregate,
      // not the fact table.
      val base = T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("__n"), sum(dec(col("l_extendedprice"))).as("__s"))
      base.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_price"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),
    "um1_unpivot" -> ((s, dir) => {
      // wide -> long melt of the lineitem measures (inverse of a9_pivot)
      T(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),
    "f5_higher_order" -> ((s, dir) => {
      // lambda surface: transform / filter / aggregate / sort over the
      // token array, reduced to scalars
      val w = TextOps.words(col("text"))
      T(s, dir, "documents").select(
        col("doc_id"),
        size(filter(w, t => length(t) > 4)).as("long_tokens"),
        aggregate(transform(w, t => length(t)), lit(0L), (a, x) => a + x)
          .as("char_sum"),
        element_at(array_sort(w), 1).as("first_token"),
        size(array_distinct(transform(w, t => substring(t, 1, 1))))
          .as("distinct_initials"))
        .orderBy(col("doc_id"))
    }),
    "r1_resample" -> ((s, dir) => {
      // dense hourly series per event_type: generate the full hour range
      // once, cross with the type list, left-join the sparse aggregates
      // (zero-filled) — the gap-filling shape of time-series resampling
      val ev = T(s, dir, "events")
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val hours = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
      val types = ev.select(col("event_type")).distinct()
      hours.crossJoin(types)
        .join(hourly, Seq("h", "event_type"), "left")
        .select(date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),
    "a9_pivot" -> ((s, dir) => {
      // order counts pivoted by priority (explicit value list keeps the
      // output schema static — required for a distributed pivot anyway)
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        .orderBy(col("o_orderstatus"))
    }),
    "j8_asof_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      // right side unique per (user, ts): keep max event_id
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_event_id"))
        .select(col("user_id"), col("ts").as("p_ts"), col("purchase_event_id"))
      graft.operators.AsOfJoin.asOf(
          clicks, purchases, Seq("user_id"), "ts", "p_ts",
          Seq("purchase_event_id", "p_ts"))
        .select(col("event_id"), col("user_id"), col("purchase_event_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("p_ts"))).as("gap_sec"))
        .orderBy(col("event_id"))
    }),
    "j9_range_join" -> ((s, dir) => {
      // every (click, purchase) pair by the same user within 30 minutes
      val ev = T(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      graft.operators.RangeJoin.banded(
          clicks, purchases, Seq("user_id"), "ts", "p_ts", 1800L)
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("p_ts"))).as("gap_sec"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),
    "j10_interval_join" -> ((s, dir) => {
      // overlap join: per customer, every (even-order, odd-order) pair
      // whose synthesized activity windows [day, day + key%7] intersect
      // — bucket-and-probe with first-shared-bin dedup, never a per-key
      // cross product
      val iv = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("s"))
        .withColumn("e", col("s") + col("o_orderkey") % 7)
      val l = iv.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("l_key"), col("o_custkey").as("custkey"),
          col("s").as("ls"), col("e").as("le"))
      val r = iv.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("r_key"), col("o_custkey").as("custkey"),
          col("s").as("rs"), col("e").as("re"))
      graft.operators.RangeJoin.intervalOverlap(
          l, r, Seq("custkey"), "ls", "le", "rs", "re", bucketWidth = 7L)
        .select(col("l_key"), col("r_key"), col("custkey"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs")) + 1)
            .as("overlap_days"))
        .orderBy(col("l_key"), col("r_key"))
    }),
    "st3_sessionize" -> ((s, dir) => {
      // 30-min-gap sessionization via lag + running sum of boundaries —
      // the batch formulation (streaming uses session_window); exactly
      // mirrorable cross-engine, unlike session_window internals
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val newSession = when(
        unix_timestamp(col("ts")) -
          unix_timestamp(lag(col("ts"), 1).over(byUser)) > 1800, 1)
        .otherwise(0)
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "events")
        .withColumn("is_new", newSession)
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          unix_timestamp(max(col("ts"))).minus(unix_timestamp(min(col("ts"))))
            .as("duration_sec"))
        .orderBy(col("user_id"), col("session_seq"))
    }),
    "w4_window_frames" -> ((s, dir) => {
      // distribution + frame functions: ntile/percent_rank/cume_dist,
      // first_value over a growing frame, 3-row moving average (exact
      // decimal sum over the frame so the doubles are portable)
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val frame = w.rowsBetween(-2, 0)
      T(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).cast("int").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_key"),
        (sum(dec(col("o_totalprice"))).over(frame).cast("double") /
          count(lit(1)).over(frame)).as("moving_avg3"))
        .orderBy(col("o_orderkey"))
    }),
    "a8_stats_moments" -> ((s, dir) => {
      graft.operators.Stats.moments(T(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }),
    "mix4_temperature" -> ((s, dir) => {
      // XLM-R-style temperature rebalancing at α = 0.5: dominant
      // languages thin toward the scarcest (rate (cmin/c)^0.5, sqrt —
      // correctly-rounded IEEE, so DuckDB derives identical integer
      // thresholds from its own counts); one tiny count aggregate to
      // the driver, then a pure per-row hash filter
      graft.operators.Sampling.temperatureSample(
          T(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", alpha = 0.5, seed = 7)
        .orderBy(col("doc_id"))
    }),
    "mix1_weighted_mixture" -> ((s, dir) => {
      // corpus mixing by domain weight: rate-based deterministic keep,
      // pure per-row filter (no shuffle; sm1 is the fixed-count twin)
      graft.operators.Sampling.weightedMixture(
          T(s, dir, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.75),
          defaultRate = 0.4, seed = 7)
        .orderBy(col("doc_id"))
    }),
    "sm1_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling
        .stratified(T(s, dir, "orders").select(col("o_orderstatus"), col("o_orderkey")),
          Seq("o_orderstatus"), "o_orderkey", 15)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("sample_rank").cast("int").as("sample_rank"))
        .orderBy(col("o_orderstatus"), col("sample_rank"))
    }),
    "h2_hierarchy_flatten" -> ((s, dir) => {
      // CONNECT-BY surface: the customer/supplier → nation → region
      // forest flattened to the full ancestor closure via iterative
      // one-hop joins (the recursive-CTE unroll; prefix-typed node ids
      // keep the integer key spaces disjoint)
      def node(p: String, c: org.apache.spark.sql.Column) =
        concat(lit(p), c.cast("string"))
      val cust = T(s, dir, "customer").select(
        node("c", col("c_custkey")).as("child"),
        node("n", col("c_nationkey")).as("parent"))
      val supp = T(s, dir, "supplier").select(
        node("s", col("s_suppkey")).as("child"),
        node("n", col("s_nationkey")).as("parent"))
      val nat = T(s, dir, "nation").select(
        node("n", col("n_nationkey")).as("child"),
        node("r", col("n_regionkey")).as("parent"))
      graft.operators.Hierarchy.ancestors(
          cust.unionByName(supp).unionByName(nat), "child", "parent")
        .select(col("node"), col("ancestor"), col("depth").cast("int").as("depth"))
        .orderBy(col("node"), col("depth"), col("ancestor"))
    }),
    "g1_bfs_distance" -> ((s, dir) => {
      // multi-source BFS over the implicit binary tree on customer
      // keys (parent k⟶children 2k, 2k+1): distances from roots 1..10,
      // cycle-safe visited-set expansion, min-dist per node — the
      // general-graph traversal Hierarchy's DAG closure refuses
      // custkey 0 would make 0 // 2 = 0 a self-loop: harmless to the
      // engine's visited-set BFS, but the oracle's (node, d) recursion
      // would chase it forever — keep the graph on keys >= 1 with
      // child keys >= 2, mirrored exactly in the SQL
      val cust = T(s, dir, "customer").select(col("c_custkey"))
      val edges = cust.filter(col("c_custkey") >= 2)
        .select(shiftright(col("c_custkey"), 1).as("src"),
          col("c_custkey").as("dst"))
      graft.operators.Bfs.distances(
          edges, "src", "dst",
          cust.filter(col("c_custkey").between(1, 10)), "c_custkey", maxDepth = 40)
        .select(col("node"), col("dist"))
        .orderBy(col("node"))
    }),
    "h3_subtree_rollup" -> ((s, dir) => {
      // the other half of CONNECT BY: descendant closure feeding a
      // hierarchical aggregate — order value rolled up through
      // customer → nation → region, every node reporting its subtree
      def node(p: String, c: org.apache.spark.sql.Column) =
        concat(lit(p), c.cast("string"))
      val cust = T(s, dir, "customer").select(
        node("c", col("c_custkey")).as("child"),
        node("n", col("c_nationkey")).as("parent"))
      val supp = T(s, dir, "supplier").select(
        node("s", col("s_suppkey")).as("child"),
        node("n", col("s_nationkey")).as("parent"))
      val nat = T(s, dir, "nation").select(
        node("n", col("n_nationkey")).as("child"),
        node("r", col("n_regionkey")).as("parent"))
      val facts = T(s, dir, "orders").select(
        node("c", col("o_custkey")).as("fnode"), col("o_totalprice"))
      graft.operators.Hierarchy.subtreeRollup(
          cust.unionByName(supp).unionByName(nat), "child", "parent",
          facts, "fnode", "o_totalprice")
        .orderBy(col("node"))
    }),
    "h4_hierarchy_paths" -> ((s, dir) => {
      // SYS_CONNECT_BY_PATH over the same forest as h2: every upward
      // route materialized as a path string (UNION ALL multiplicity)
      def node(p: String, c: org.apache.spark.sql.Column) =
        concat(lit(p), c.cast("string"))
      val cust = T(s, dir, "customer").select(
        node("c", col("c_custkey")).as("child"),
        node("n", col("c_nationkey")).as("parent"))
      val supp = T(s, dir, "supplier").select(
        node("s", col("s_suppkey")).as("child"),
        node("n", col("s_nationkey")).as("parent"))
      val nat = T(s, dir, "nation").select(
        node("n", col("n_nationkey")).as("child"),
        node("r", col("n_regionkey")).as("parent"))
      graft.operators.Hierarchy.paths(
          cust.unionByName(supp).unionByName(nat), "child", "parent")
        .select(col("node"), col("ancestor"), col("depth").cast("int").as("depth"),
          col("path"))
        .orderBy(col("node"), col("depth"), col("ancestor"), col("path"))
    }),
    "u2_scd2_history" -> ((s, dir) => {
      // Kimball SCD2 over the order-status change log: per customer,
      // status runs collapse into versions with validity intervals
      graft.operators.Upsert.scd2History(
          T(s, dir, "orders").select(col("o_custkey"), col("o_orderstatus"),
            col("o_orderdate"), col("o_orderkey")),
          keys = Seq("o_custkey"), attrs = Seq("o_orderstatus"),
          orderCols = Seq("o_orderdate", "o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderkey"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),
    "u3_scd2_apply" -> ((s, dir) => {
      // incremental SCD2: the pre-1996 change log builds the existing
      // dimension, the 1996+ changes arrive as the daily batch and
      // merge in touched-keys-only — the oracle rebuilds from the FULL
      // log, so the key proves incremental ≡ rebuild hash-for-hash
      val log = T(s, dir, "orders").select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey"))
      val cut = lit("1996-01-01").cast("date")
      val dim = graft.operators.Upsert.scd2History(
        log.filter(col("o_orderdate") < cut),
        keys = Seq("o_custkey"), attrs = Seq("o_orderstatus"),
        orderCols = Seq("o_orderdate", "o_orderkey"))
      graft.operators.Upsert.scd2Apply(
          dim, log.filter(col("o_orderdate") >= cut),
          keys = Seq("o_custkey"), attrs = Seq("o_orderstatus"),
          orderCols = Seq("o_orderdate", "o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderkey"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),
    "u4_scd2_lookup" -> ((s, dir) => {
      // the consumption face of SCD2: every order (fact) joins to the
      // status version valid AT its order date — keyed equi-join +
      // tiling-interval filter, no range-join machinery; facts before
      // a customer's first version keep a null version (left join)
      val log = T(s, dir, "orders").select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey"))
      val cut = lit("1996-01-01").cast("date")
      val dim = graft.operators.Upsert.scd2History(
        log.filter(col("o_orderdate") < cut),
        keys = Seq("o_custkey"), attrs = Seq("o_orderstatus"),
        orderCols = Seq("o_orderdate", "o_orderkey"))
      graft.operators.Upsert.scd2Lookup(
          dim, log.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
          keys = Seq("o_custkey"), tsCol = "o_orderdate")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("v_o_orderstatus").as("status_then"),
          col("v_valid_from").as("version_from"))
        .orderBy(col("o_orderkey"))
    }),
    "fw1_fixed_width" -> ((s, dir) => {
      // fixed-width round trip: orders formatted into positional lines
      // (zero-padded keys, blank-padded status — the mainframe extract
      // shape) then parsed back by offset; the oracle is the straight
      // projection, so the key proves parse(format(x)) == x
      import graft.sources.FixedWidth
      val lines = T(s, dir, "orders").select(concat(
        lpad(col("o_orderkey").cast("string"), 12, "0"),
        rpad(col("o_orderstatus"), 4, " "),
        lpad(col("o_custkey").cast("string"), 12, "0"),
        rpad(col("o_orderpriority"), 16, " ")).as("line"))
      FixedWidth.parse(lines, "line", Seq(
          FixedWidth.Field("o_orderkey", 1, 12, org.apache.spark.sql.types.LongType),
          FixedWidth.Field("o_orderstatus", 13, 4),
          FixedWidth.Field("o_custkey", 17, 12, org.apache.spark.sql.types.LongType),
          FixedWidth.Field("o_orderpriority", 29, 16)))
        .orderBy(col("o_orderkey"))
    }),
    "u6_snapshot_diff" -> ((s, dir) => {
      // changelog FROM snapshots: old = every key not %4, new = every
      // key not %7 with %5 statuses rewritten — inserts, deletes (with
      // before-images), and null-safe updates in one diff
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val ord = T(s, dir, "orders").select(cols.map(col): _*)
      val oldSnap = ord.filter(col("o_orderkey") % 4 =!= 0)
      val newSnap = ord.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 5 === 0, "X").otherwise(col("o_orderstatus")))
      graft.operators.Upsert.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),
    "u5_cdc_apply" -> ((s, dir) => {
      // full MERGE from a CDC change set: two change generations per
      // even order key (compaction picks seq 2), with every 12th key's
      // final change a DELETE — update/insert/delete in one apply
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val ord = T(s, dir, "orders").select(cols.map(col): _*)
      val target = ord.filter(col("o_orderkey") % 4 =!= 0)
      val c1 = ord.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U1"))
        .withColumn("seq", lit(1)).withColumn("op", lit("U"))
      val c2 = ord.filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_orderstatus", lit("U2"))
        .withColumn("seq", lit(2))
        .withColumn("op", when(col("o_orderkey") % 12 === 0, "D").otherwise("U"))
      graft.operators.Upsert.applyCdc(
          target, c1.unionByName(c2), Seq("o_orderkey"), "seq", "op")
        .orderBy(col("o_orderkey"))
    }),
    "u1_merge_upsert" -> ((s, dir) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val ord = T(s, dir, "orders").select(cols.map(col): _*)
      val target = ord.filter(col("o_orderkey") % 4 =!= 0)
      val source = ord.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
      graft.operators.Upsert.upsert(target, source, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),
    "h1_hll_distinct" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      graft.functions.HyperLogLog
        .approxCountDistinct(li, Seq("l_returnflag"), "l_partkey")
        .join(li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_distinct")), "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),
    "st2_sliding_window" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type"))
    }))

  private val lineSql =
    """'job table t' || CAST(o_orderkey % 20 AS VARCHAR) ||
      | CASE CAST(o_orderkey % 3 AS INTEGER)
      |  WHEN 0 THEN ' rows ' || CAST(o_orderkey AS VARCHAR)
      |  WHEN 1 THEN ' bytes ' || CAST(o_orderkey * 100 AS VARCHAR)
      |  ELSE ' status ' || (CASE WHEN o_orderkey % 7 = 0 THEN 'FAILED' ELSE 'SUCCEEDED' END)
      | END""".stripMargin

  private val docWordsExpr = OracleText.words
  private val docWordsCoalescedExpr = OracleText.wordsCoalesced

  /** pr1 mirror: the fixed-point rounds as chained CTEs — floor
    * division at the same two points (all values non-negative, so
    * DuckDB's floor `//` equals Spark's truncating `div`). */
  private val pr1Oracle: String = {
    val rounds = (1 to PrIters).map { k =>
      s"""c$k AS (SELECT e.dst AS node,
         |  CAST(SUM(r.rank // d.deg) AS BIGINT) AS inr
         | FROM e JOIN r${k - 1} r ON e.src = r.node JOIN d ON e.src = d.src
         | GROUP BY e.dst),
         |r$k AS (SELECT n.node,
         |  CAST(${PrScale * 3 / 20} + (17 * coalesce(c$k.inr, 0)) // 20 AS BIGINT) AS rank
         | FROM n LEFT JOIN c$k ON n.node = c$k.node)"""
    }.mkString(",\n|")
    s"""WITH e AS (SELECT DISTINCT o.o_custkey AS src,
       |  l.l_suppkey + $PrSuppOffset AS dst
       | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |d AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
       |r0 AS (SELECT node, CAST($PrScale AS BIGINT) AS rank FROM n),
       |$rounds
       |SELECT node, rank FROM r$PrIters ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "pr1_purchase_rank" -> pr1Oracle,
    "qt1_rank_quantiles" ->
      s"""WITH t AS (SELECT lang, doc_id,
         |  CAST(len($docWordsCoalescedExpr) AS BIGINT) AS toks FROM documents),
         |r AS (SELECT lang, toks,
         |  row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS n FROM t),
         |p AS (SELECT unnest([${QtPs.mkString(", ")}]) AS p)
         |SELECT lang, p.p AS p, toks AS value
         |FROM r, p WHERE rn = CAST(ceil(p.p * n) AS BIGINT)
         |ORDER BY lang, p""".stripMargin,
    "a11_filtered_agg" ->
      """SELECT o_orderstatus,
        | CAST(COUNT(*) AS BIGINT) AS n_all,
        | CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |   FILTER (WHERE o_orderpriority LIKE '1%') AS DOUBLE) AS urgent_value,
        | MAX(o_orderdate) FILTER (WHERE o_orderkey % 2 = 0) AS last_even
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a12_multi_distinct" ->
      """SELECT o_orderstatus,
        | CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_cust,
        | CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_prio,
        | CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d_dates,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w5_ignore_nulls" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS v
        | FROM orders)
        |SELECT o_orderkey, o_custkey, v,
        | last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        | first_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nn
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "qt2_percentile_cont" ->
      s"""WITH t AS (SELECT lang, doc_id,
         |  CAST(len($docWordsCoalescedExpr) AS BIGINT) AS toks FROM documents),
         |r AS (SELECT lang, toks,
         |  row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS n FROM t),
         |p AS (SELECT unnest([${QtPs.mkString(", ")}]) AS p),
         |x AS (SELECT lang, p.p AS p, toks, rn, n,
         |  CAST(n - 1 AS DOUBLE) * p.p AS idx,
         |  CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 1 AS lo,
         |  least(CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 2, n) AS hi
         | FROM r, p),
         |g AS (SELECT lang, p,
         |  MAX(CASE WHEN rn = lo THEN toks END) AS vlo,
         |  MAX(CASE WHEN rn = hi THEN toks END) AS vhi,
         |  MAX(idx - floor(idx)) AS frac
         | FROM x WHERE rn = lo OR rn = hi GROUP BY lang, p)
         |SELECT lang, p, CAST(vlo AS DOUBLE) + frac * CAST(vhi - vlo AS DOUBLE) AS value
         |FROM g ORDER BY lang, p""".stripMargin,
    // the oracle for the bucket-locate shape IS the sort-based formula:
    // same order statistics, same interpolation — semantic truth is
    // engine-shape-independent
    "qt3_scalable_quantiles" ->
      s"""WITH t AS (SELECT lang, doc_id,
         |  CAST(len($docWordsCoalescedExpr) AS BIGINT) AS toks FROM documents),
         |r AS (SELECT lang, toks,
         |  row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS n FROM t),
         |p AS (SELECT unnest([${QtPs.mkString(", ")}]) AS p),
         |x AS (SELECT lang, p.p AS p, toks, rn, n,
         |  CAST(n - 1 AS DOUBLE) * p.p AS idx,
         |  CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 1 AS lo,
         |  least(CAST(floor(CAST(n - 1 AS DOUBLE) * p.p) AS BIGINT) + 2, n) AS hi
         | FROM r, p),
         |g AS (SELECT lang, p,
         |  MAX(CASE WHEN rn = lo THEN toks END) AS vlo,
         |  MAX(CASE WHEN rn = hi THEN toks END) AS vhi,
         |  MAX(idx - floor(idx)) AS frac
         | FROM x WHERE rn = lo OR rn = hi GROUP BY lang, p)
         |SELECT lang, p, CAST(vlo AS DOUBLE) + frac * CAST(vhi - vlo AS DOUBLE) AS value
         |FROM g ORDER BY lang, p""".stripMargin,
    "hh1_heavy_hitters" ->
      s"""WITH wx AS (SELECT source, unnest($docWordsExpr) AS word FROM documents),
         |c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM wx GROUP BY source, word),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY cnt DESC, word) AS INTEGER) AS rank FROM c)
         |SELECT source, word, cnt, rank FROM r WHERE rank <= $HhK
         |ORDER BY source, rank""".stripMargin,
    "mix3_interleave" -> {
      val cases = MixWeights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
      s"""WITH r AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
         |    AS BIGINT) AS pos
         | FROM documents)
         |SELECT doc_id, source, pos,
         | CAST(pos + 1 AS DOUBLE)
         |  / CAST(CASE source $cases ELSE 1 END AS DOUBLE) AS ikey
         |FROM r ORDER BY source, pos""".stripMargin
    },
    "dd1_token_drift" ->
      s"""WITH wx AS (SELECT doc_id % 2 = 0 AS isa,
         |  unnest($docWordsExpr) AS word FROM documents),
         |c AS (SELECT word,
         |  CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         |  CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
         | FROM wx GROUP BY word),
         |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS na,
         |  CAST(SUM(cnt_b) AS BIGINT) AS nb FROM c)
         |SELECT word, cnt_a, cnt_b,
         | abs(cnt_a * t.nb - cnt_b * t.na) AS drift
         |FROM c, t ORDER BY drift DESC, word LIMIT $DdK""".stripMargin,
    "rk1_quality_topk" ->
      s"""SELECT doc_id, CAST(len($docWordsCoalescedExpr) AS BIGINT) AS toks
         |FROM documents ORDER BY toks DESC, doc_id LIMIT $RkK""".stripMargin,
    "w4_window_frames" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | first_value(o_orderkey) OVER g AS first_key,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER f AS VARCHAR) AS DOUBLE)
        |   / COUNT(*) OVER f AS moving_avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
        | g AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | f AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "a8_stats_moments" ->
      (graft.operators.Stats.momentsOracleSql("lineitem",
        Seq("l_returnflag"), "l_quantity", "l_extendedprice") +
        "\nORDER BY l_returnflag"),
    "mix4_temperature" ->
      // rates derived IN SQL from DuckDB's own counts: sqrt and the
      // 2⁶⁰ multiply are correctly-rounded IEEE ops, so the truncated
      // integer thresholds match the engine's bit-for-bit
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
        | FROM documents GROUP BY lang),
        |m AS (SELECT MIN(c) AS cmin FROM c),
        |t AS (SELECT lang,
        |  CAST(trunc(sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE))
        |    * 1152921504606846976.0) AS BIGINT) AS thr
        | FROM c, m),
        |h AS (SELECT doc_id, lang,
        |  CAST(concat('0x', substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        | FROM documents)
        |SELECT h.doc_id, h.lang FROM h JOIN t USING (lang)
        |WHERE h.h < t.thr ORDER BY doc_id""".stripMargin,
    "mix1_weighted_mixture" -> {
      // thresholds are exact longs (r · 2⁶⁰) computed once here so both
      // engines compare the same integers
      def t(r: Double) = (r * (1L << 60).toDouble).toLong
      s"""SELECT doc_id, source FROM documents
         |WHERE CAST(concat('0x', substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |  < CASE source WHEN 'src0' THEN ${t(1.0)} WHEN 'src1' THEN ${t(0.0)}
         |    WHEN 'src2' THEN ${t(0.75)} ELSE ${t(0.4)} END
         |ORDER BY doc_id""".stripMargin
    },
    "sm1_stratified_sample" ->
      """WITH h AS (
        | SELECT o_orderstatus, o_orderkey,
        |  CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS sh
        | FROM orders),
        |r AS (
        | SELECT o_orderstatus, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY sh, o_orderkey) AS INTEGER) AS sample_rank
        | FROM h)
        |SELECT o_orderstatus, o_orderkey, sample_rank
        |FROM r WHERE sample_rank <= 15
        |ORDER BY o_orderstatus, sample_rank""".stripMargin,
    "h2_hierarchy_flatten" ->
      // the genuine recursive CTE — UNION (not ALL) matches the
      // operator's distinct-per-depth closure semantics
      """WITH RECURSIVE e AS (
        | SELECT 'c' || CAST(c_custkey AS VARCHAR) AS child,
        |        'n' || CAST(c_nationkey AS VARCHAR) AS parent FROM customer
        | UNION ALL
        | SELECT 's' || CAST(s_suppkey AS VARCHAR),
        |        'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
        | UNION ALL
        | SELECT DISTINCT 'n' || CAST(n_nationkey AS VARCHAR),
        |        'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
        |cl(node, ancestor, depth) AS (
        | SELECT child, parent, 1 FROM e
        | UNION
        | SELECT cl.node, e.parent, cl.depth + 1
        | FROM cl JOIN e ON cl.ancestor = e.child)
        |SELECT node, ancestor, CAST(depth AS INTEGER) AS depth
        |FROM cl ORDER BY node, depth, ancestor""".stripMargin,
    "g1_bfs_distance" ->
      // bounded recursion enumerates (node, d) pairs, MIN collapses to
      // the BFS distance — the engine's first-visit discipline and the
      // oracle's MIN agree by the level-order invariant
      """WITH RECURSIVE cl(node, d) AS (
        | SELECT c_custkey, 0 FROM customer WHERE c_custkey BETWEEN 1 AND 10
        | UNION
        | SELECT c.c_custkey, cl.d + 1
        | FROM cl JOIN customer c
        |  ON c.c_custkey // 2 = cl.node AND c.c_custkey >= 2)
        |SELECT node, CAST(MIN(d) AS INTEGER) AS dist
        |FROM cl GROUP BY node ORDER BY node""".stripMargin,
    "h3_subtree_rollup" ->
      // genuine recursive CTE over the transposed closure; DISTINCT
      // (node, descendant) pairs so a DAG could never double-count a
      // descendant's facts; LEFT JOIN keeps empty-subtree nodes at 0
      """WITH RECURSIVE e AS (
        | SELECT 'c' || CAST(c_custkey AS VARCHAR) AS child,
        |        'n' || CAST(c_nationkey AS VARCHAR) AS parent FROM customer
        | UNION ALL
        | SELECT 's' || CAST(s_suppkey AS VARCHAR),
        |        'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
        | UNION ALL
        | SELECT DISTINCT 'n' || CAST(n_nationkey AS VARCHAR),
        |        'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
        |cl(node, descendant) AS (
        | SELECT parent, child FROM e
        | UNION
        | SELECT cl.node, e.child FROM cl JOIN e ON e.parent = cl.descendant),
        |nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e),
        |pairs AS (SELECT DISTINCT node, descendant FROM cl
        | UNION SELECT node, node FROM nodes),
        |f AS (SELECT 'c' || CAST(o_custkey AS VARCHAR) AS descendant,
        | o_totalprice FROM orders)
        |SELECT p.node AS node,
        | COUNT(f.o_totalprice) AS subtree_count,
        | COALESCE(CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0)
        |   AS subtree_value
        |FROM pairs p LEFT JOIN f ON f.descendant = p.descendant
        |GROUP BY p.node ORDER BY node""".stripMargin,
    "h4_hierarchy_paths" ->
      """WITH RECURSIVE e AS (
        | SELECT 'c' || CAST(c_custkey AS VARCHAR) AS child,
        |        'n' || CAST(c_nationkey AS VARCHAR) AS parent FROM customer
        | UNION ALL
        | SELECT 's' || CAST(s_suppkey AS VARCHAR),
        |        'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
        | UNION ALL
        | SELECT DISTINCT 'n' || CAST(n_nationkey AS VARCHAR),
        |        'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
        |cl(node, ancestor, depth, path) AS (
        | SELECT child, parent, 1, child || '/' || parent FROM e
        | UNION ALL
        | SELECT cl.node, e.parent, cl.depth + 1, cl.path || '/' || e.parent
        | FROM cl JOIN e ON cl.ancestor = e.child)
        |SELECT node, ancestor, CAST(depth AS INTEGER) AS depth, path
        |FROM cl ORDER BY node, depth, ancestor, path""".stripMargin,
    "u2_scd2_history" ->
      """WITH b AS (
        | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |  lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev
        | FROM orders),
        |v AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        | FROM b WHERE prev IS NULL OR o_orderstatus <> prev),
        |h AS (SELECT *, lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to
        | FROM v)
        |SELECT o_custkey, o_orderstatus, o_orderkey,
        | o_orderdate AS valid_from, valid_to, valid_to IS NULL AS is_current
        |FROM h ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "u3_scd2_apply" ->
      // deliberately the FULL-log rebuild (u2's construction): the
      // engine side applies only the 1996+ batch incrementally, so a
      // hash match IS the incremental ≡ rebuild equivalence proof
      """WITH b AS (
        | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |  lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev
        | FROM orders),
        |v AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        | FROM b WHERE prev IS NULL OR o_orderstatus <> prev),
        |h AS (SELECT *, lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to
        | FROM v)
        |SELECT o_custkey, o_orderstatus, o_orderkey,
        | o_orderdate AS valid_from, valid_to, valid_to IS NULL AS is_current
        |FROM h ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "u4_scd2_lookup" ->
      """WITH b AS (
        | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |  lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev
        | FROM orders WHERE o_orderdate < DATE '1996-01-01'),
        |v AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        | FROM b WHERE prev IS NULL OR o_orderstatus <> prev),
        |d AS (SELECT o_custkey, o_orderstatus,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to
        | FROM v)
        |SELECT f.o_custkey, f.o_orderkey, f.o_orderdate,
        | d.o_orderstatus AS status_then, d.valid_from AS version_from
        |FROM orders f LEFT JOIN d ON f.o_custkey = d.o_custkey
        | AND d.valid_from <= f.o_orderdate
        | AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)
        |ORDER BY f.o_orderkey""".stripMargin,
    "fw1_fixed_width" ->
      """SELECT o_orderkey, o_orderstatus, o_custkey, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "j10_interval_join" ->
      """WITH iv AS (SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS s,
        |  CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
        |    + o_orderkey % 7 AS e
        | FROM orders)
        |SELECT l.o_orderkey AS l_key, r.o_orderkey AS r_key,
        | l.o_custkey AS custkey,
        | least(l.e, r.e) - greatest(l.s, r.s) + 1 AS overlap_days
        |FROM iv l JOIN iv r ON l.o_custkey = r.o_custkey
        | AND l.o_orderkey % 2 = 0 AND r.o_orderkey % 2 = 1
        | AND l.s <= r.e AND r.s <= l.e
        |ORDER BY l_key, r_key""".stripMargin,
    "u6_snapshot_diff" ->
      """WITH o AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        | FROM orders WHERE o_orderkey % 4 <> 0),
        |n AS (
        | SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        | FROM orders WHERE o_orderkey % 7 <> 0),
        |j AS (
        | SELECT
        |  CASE WHEN o.o_orderkey IS NULL THEN 'I'
        |       WHEN n.o_orderkey IS NULL THEN 'D'
        |       WHEN n.o_custkey IS DISTINCT FROM o.o_custkey
        |         OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
        |         OR n.o_totalprice IS DISTINCT FROM o.o_totalprice THEN 'U'
        |  END AS op,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderkey ELSE n.o_orderkey END AS o_orderkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END AS o_totalprice
        | FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, op
        |FROM j WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "u5_cdc_apply" ->
      """WITH t AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        | FROM orders WHERE o_orderkey % 4 <> 0),
        |c AS (
        | SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus, o_totalprice,
        |  1 AS seq, 'U' AS op FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT o_orderkey, o_custkey, 'U2', o_totalprice, 2,
        |  CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END
        | FROM orders WHERE o_orderkey % 6 = 0),
        |l AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM c) WHERE rn = 1)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM t
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM l)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM l
        |WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "u1_merge_upsert" ->
      """WITH t AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        | FROM orders WHERE o_orderkey % 4 <> 0),
        |s AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
        | FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT
        | coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
        |FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "h1_hll_distinct" ->
      s"""WITH hll AS (
         |${graft.functions.HyperLogLog.oracleSql("lineitem", Seq("l_returnflag"), "l_partkey")}
         |),
         |ex AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
         | FROM lineitem GROUP BY l_returnflag)
         |SELECT hll.l_returnflag, hll.approx_distinct, ex.exact_distinct
         |FROM hll JOIN ex USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,
    "j7_log_fold" ->
      s"""WITH logs AS (SELECT $lineSql AS value FROM orders),
         |parsed AS (
         | SELECT regexp_extract(value, 'table\\s+(\\w+)', 1) AS table_name,
         |  CAST(nullif(regexp_extract(value, 'table\\s+(\\w+)\\s+rows\\s+(\\d+)', 2), '') AS BIGINT) AS rows,
         |  CAST(nullif(regexp_extract(value, 'table\\s+(\\w+)\\s+bytes\\s+(\\d+)', 2), '') AS BIGINT) AS bytes,
         |  nullif(regexp_extract(value, 'table\\s+(\\w+)\\s+status\\s+(\\w+)', 2), '') AS status
         | FROM logs WHERE regexp_extract(value, 'table\\s+(\\w+)', 1) != '')
         |SELECT table_name, max(rows) AS rows, max(bytes) AS bytes,
         | COUNT(CASE WHEN status = 'FAILED' THEN 1 END) AS n_failed,
         | COUNT(CASE WHEN status = 'SUCCEEDED' THEN 1 END) AS n_ok,
         | CASE WHEN COUNT(CASE WHEN status = 'FAILED' THEN 1 END) > 0 THEN 'FAILED'
         |      WHEN COUNT(CASE WHEN status = 'SUCCEEDED' THEN 1 END) > 0 THEN 'SUCCEEDED'
         |      ELSE 'SKIPPED' END AS final_status
         |FROM parsed GROUP BY table_name ORDER BY table_name""".stripMargin,
    "w1_rank_window" ->
      """SELECT c_custkey, c_mktsegment,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | CAST(row_number() OVER w AS INTEGER) AS rn
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "w3_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(date_diff('day',
        |   CAST(lag(o_orderdate, 1) OVER w AS DATE),
        |   CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |   CAST(lead(o_orderdate, 1) OVER w AS DATE)) AS INTEGER) AS days_to_next
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "f4_conditionals" ->
      """SELECT p_partkey,
        | nullif(p_size, 10) AS size_or_null,
        | coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
        | CAST(least(p_size, p_partkey % 30) AS INTEGER) AS lo,
        | CAST(greatest(p_size, p_partkey % 30) AS INTEGER) AS hi,
        | CASE WHEN p_retailprice < 1000 THEN 'cheap'
        |      WHEN p_retailprice < 1500 THEN 'mid'
        |      ELSE 'premium' END AS price_band
        |FROM part ORDER BY p_partkey""".stripMargin,
    "a7_profile" -> {
      def side(c: String, quantiles: Boolean) = {
        val qCols = if (quantiles)
          ", quantile_cont(" + c + ", 0.5) AS p50, quantile_cont(" + c + ", 0.9) AS p90" else ""
        val qM = if (quantiles) ",'p50','p90'" else ""
        val qV = if (quantiles) ", s.p50, s.p90" else ""
        s"""SELECT '$c' AS column_name, m.metric, m.value FROM (
           | SELECT CAST(COUNT($c) AS DOUBLE) AS cnt,
           |  CAST(COUNT(CASE WHEN $c IS NULL THEN 1 END) AS DOUBLE) AS nulls,
           |  CAST(COUNT(DISTINCT $c) AS DOUBLE) AS dstnct,
           |  CAST(MIN($c) AS DOUBLE) AS mn, CAST(MAX($c) AS DOUBLE) AS mx,
           |  CAST(CAST(SUM(CAST($c AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT($c) AS mean$qCols
           | FROM lineitem) s,
           | LATERAL (SELECT unnest(['count','distinct','max','mean','min','nulls'$qM]) AS metric,
           |   unnest([s.cnt, s.dstnct, s.mx, s.mean, s.mn, s.nulls$qV]) AS value) m""".stripMargin
      }
      s"""SELECT * FROM (${side("l_quantity", true)} UNION ALL ${side("l_extendedprice", false)})
         |ORDER BY column_name, metric""".stripMargin
    },
    "a5_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "a10_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        | CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "um1_unpivot" ->
      """WITH src AS (
        | SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        | FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "f5_higher_order" ->
      s"""WITH w AS (
        | SELECT doc_id, ${OracleText.words} AS w FROM documents)
        |SELECT doc_id,
        | CAST(len(list_filter(w, t -> length(t) > 4)) AS INTEGER) AS long_tokens,
        | CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS char_sum,
        | list_sort(w)[1] AS first_token,
        | CAST(len(list_distinct(list_transform(w, t -> substr(t, 1, 1)))) AS INTEGER) AS distinct_initials
        |FROM w ORDER BY doc_id""".stripMargin,
    "r1_resample" ->
      """WITH b AS (
        | SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        | FROM events),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |agg AS (
        | SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        | FROM events GROUP BY 1, 2)
        |SELECT strftime(hours.h, '%Y-%m-%d %H:%M') AS hour,
        | types.event_type AS event_type,
        | COALESCE(agg.n, 0) AS n, COALESCE(agg.sum_value, 0.0) AS sum_value
        |FROM hours CROSS JOIN types
        |LEFT JOIN agg ON agg.h = hours.h AND agg.event_type = types.event_type
        |ORDER BY hour, types.event_type""".stripMargin,
    "a9_pivot" ->
      """SELECT o_orderstatus,
        | COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1,
        | COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2,
        | COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3,
        | COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4,
        | COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j8_asof_join" ->
      """WITH p AS (
        | SELECT user_id, ts AS p_ts, max(event_id) AS purchase_event_id
        | FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, p.purchase_event_id,
        | CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.p_ts)) AS BIGINT) AS gap_sec
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts
        |ORDER BY event_id""".stripMargin,
    "j9_range_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, p.purchase_id, c.user_id,
        | CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.p_ts)) AS BIGINT) AS gap_sec
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND abs(CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.p_ts)) AS BIGINT)) <= 1800
        |ORDER BY click_id, purchase_id""".stripMargin,
    "st3_sessionize" ->
      """WITH marked AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) > 1800 THEN 1 ELSE 0 END AS is_new
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        | SELECT user_id, ts,
        |  SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM marked)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | COUNT(*) AS n_events,
        | CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "st2_sliding_window" ->
      """WITH e AS (
        | SELECT CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT) AS wstart,
        |  event_type, value
        | FROM events, (SELECT unnest([0, 1800]) AS off) o)
        |SELECT wstart, event_type, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM e GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin
  )
}
