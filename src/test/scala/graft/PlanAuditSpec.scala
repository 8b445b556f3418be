package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants for the perf-critical query shapes: these
  * lock in the scale properties (§4 / README notes) so a regression in
  * pushdown, pruning, or join strategy fails CI rather than silently
  * costing a full scan or shuffle at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "plan-audit")
  val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution
      .explainString(FormattedMode)

  test("q1: filter pushed to parquet scan, schema pruned") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // 6 of 11 lineitem columns read
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q5: small dimensions broadcast, fact not shuffled for them") {
    val p = planOf("q5_local_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.split("BroadcastHashJoin").length >= 4, "3 dims should broadcast")
  }

  test("q6: aggregation-only plan — no join, no wide shuffle") {
    val p = planOf("q6_forecast_revenue")
    assert(!p.contains("Join"), p)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("v8 row validation: shuffle carries hashes, not payload columns") {
    val p = planOf("v8_row_validation")
    // the exchanges must not carry the wide string columns — only key + hash
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("o_orderpriority")), exchanges.mkString("\n"))
  }

  test("whole-stage codegen covers the flagship aggregation") {
    // simple mode marks codegen'd operators with a *(stageId) prefix;
    // AQE only finalizes (and shows codegen stages) after execution
    val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    df.collect() // count() spawns its own execution; collect finalizes THIS one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
  }

  test("q9: all three dimensions broadcast against the fact table") {
    val p = planOf("q9_profit_by_nation")
    assert(p.split("BroadcastHashJoin").length >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("h1: two map-side-combinable aggregations, no expand, no join") {
    val p = planOf("h1_hll_distinct")
    // the HLL side itself must be partial->final HashAggregates; the
    // countDistinct comparison join is the only join in the query
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
    assert(!p.contains("Expand") || p.split("Expand").length <= 2, p)
  }

  test("u1: single full-outer shuffle join, both sides key-partitioned") {
    val p = planOf("u1_merge_upsert")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("minhash signatures: no vocabulary join — per-occurrence hash straight into the signature aggregate") {
    val g = graft.operators.TextOps.shingleTable(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text")
    val p = graft.operators.MinHashLSH.signaturesFrom(g, 8)
      .queryExecution.explainString(FormattedMode)
    // r16: one digest + k derivations per gram occurrence, zero joins
    // and only the per-doc aggregate's own exchange — the old
    // vocab-dedup shape paid three corpus-scale exchanges to save md5
    // calls that the single-digest KM family made cheap
    assert(!p.contains("Join"), p)
    // exactly two: the shingle table's rebalance + the aggregate's own
    // (the details section numbers each physical node exactly once)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2, p)
  }

  test("tf1: corpus-wide df join is shuffle-hash; scalar N broadcast") {
    val p = planOf("tf1_tfidf_topk")
    // the (word, df) vocabulary must never be broadcast-built from the
    // exploded corpus side; the 1-row N aggregate must broadcast
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("pk1: prefix sum is block-partitioned, offsets broadcast — no global window over the corpus") {
    val p = planOf("pk1_sequence_pack")
    // the corpus-sized window must carry the blk partition key; only the
    // tiny block-offset list (<= n/blockSize rows) sorts globally
    assert(p.contains("windowspecdefinition(blk"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("c1: benchmark gram set broadcasts; corpus side never shuffles on gram") {
    val p = planOf("c1_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("minhash content-group join is shuffle-hash (rep table ~corpus-sized when dup-free)") {
    val g = graft.operators.TextOps.shingleTable(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text")
    val p = graft.operators.MinHashLSH.contentGroups(g)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("d6 clusters via the rep-pair graph: no all-pairs expansion, no star-edge iteration") {
    // d6 = nearDupClusters: the CC labels come from the verified
    // representative-pair graph — either the size-gated driver
    // union-find (a LocalTableScan/LocalRelation, broadcastable) or the
    // distributed loop (checkpoint-truncated to a Scan ExistingRDD);
    // the final plan is groups ⋈ has-copies ⋈ repComps. The all-pairs
    // path (PairExpansion.expand) is recognizable by its least/greatest
    // member-pair canonicalization and must NOT appear — a 10⁶-copy
    // group would expand to 5·10¹¹ pairs. Neither may the star-edge
    // Union feed a plan-visible iteration: rep components enter as a
    // leaf table, and the member labeling is a coalesce over the left
    // joins.
    val p = graft.queries.DedupQueries.d6Clusters(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("least(") && !p.contains("greatest("), p)
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan")
      || p.contains("LocalRelation"), p)      // rep components as a leaf
    assert(p.contains("coalesce(comp"), p)    // member labels from rep labels
  }

  test("bf1 bloom probe: zero joins — the filter rides as a plan literal") {
    // the whole point of the bloom path over c1's broadcast-semi join:
    // after the (eager, filter-sized) build, the corpus probe is pure
    // narrow expressions + one count aggregate. Any Join operator here
    // means the benchmark gram set re-entered the corpus plan.
    val p = planOf("bf1_bloom_decontam")
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p) // the per-doc count
  }

  test("ch1 chunker: narrow per-row plan — no exchange before the final sort") {
    // tokenize/explode/slice are per-row; the only exchange allowed is
    // the query's own ORDER BY (a range partitioning for the sort)
    val p = graft.operators.Chunker
      .chunk(graft.core.Tables(spark, dir, "documents"), "doc_id", "text", 64, 16)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("d2 near-dup pipeline: hash joins only — no sort-merge, no nested-loop, no cartesian") {
    val p = planOf("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d4 prefix-filter join: hash joins only, no window sort over the exploded corpus") {
    val p = planOf("d4_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // prefix selection is a hash aggregate with an in-row sort — a
    // Window over the exploded (doc, gram, df) rows would partition-sort
    // the whole corpus and spill at scale
    assert(!p.contains("Window"), p)
  }

  test("j8 as-of join: one shuffle over the union, no join operator at all") {
    // the as-of semantics compile to union + partitioned running
    // last_value — a join-based formulation would shuffle both sides
    // and replay matches per row
    val p = planOf("j8_asof_join")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("windowspecdefinition"), p)
  }

  test("dedup exact: single hash-aggregate pipeline, no join before grouping") {
    val df = graft.operators.ExactDedup.groups(
      graft.core.Tables(spark, dir, "documents"), "doc_id", Seq("text"))
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("d7 semantic dedup: centroids broadcast, pairs join keyed on list_id — never corpus-wide all-pairs") {
    val p = planOf("d7_semantic_dedup")
    // the only cartesian-shaped operator allowed is the n×C assignment
    // against the BROADCAST centroid table (BroadcastNestedLoopJoin is
    // broadcast-build by construction; the assigned table is cached so
    // the self-join reads it once at runtime). An unkeyed
    // shuffle-shuffle corpus×corpus would surface as CartesianProduct,
    // asserted absent below.
    assert(!p.contains("CartesianProduct"), p)
    // the within-list pair join is keyed (hash) on list_id
    assert(p.contains("list_id"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d8 incremental screen: hash joins only, candidate-bounded — no cartesian, no sort-merge") {
    val p = planOf("d8_incremental_screen")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the band-bucket candidate join is keyed on (band, bkey)
    assert(p.contains("bkey"), p)
  }

  test("d9 substring spans: dup-hash back-join is shuffle-hash on h, counts partial-aggregated") {
    val p = planOf("d9_substring_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the dup set is unbounded in a fully-templated corpus — a
    // broadcast guess here dies at scale, shuffle-hash is pinned
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    // window-hash counting must partial-aggregate map-side (two
    // HashAggregates around the h exchange), not ship raw windows
    assert(p.contains("partial_count"), p)
  }

  test("d10 winnowing pairs: bucketed by fingerprint value — keyed hash join, no all-pairs") {
    val p = planOf("d10_winnowing_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    // fingerprint selection is per-row: no exchange may appear between
    // the scan and the explode of the fingerprint set
    assert(p.contains("fp"), p)
  }

  test("top-k windows carry WindowGroupLimit — rank filter prunes map-side, not post-sort") {
    // Spark's InferWindowGroupLimit turns `row_number() <= k` into a
    // partial per-partition top-k BEFORE the window shuffle; losing the
    // pattern (e.g. a filter rewrite the rule can't match) silently
    // re-sorts whole partitions at scale. Pin it on every top-k shape.
    for (q <- Seq("tf1_tfidf_topk", "sm1_stratified_sample", "w1_rank_window",
        "hh1_heavy_hitters")) {
      val p = planOf(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost WindowGroupLimit:\n$p")
    }
  }

  test("pr1 rank rounds: shuffle-hash joins keyed on node ids — no sort-merge, no cartesian, no window") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val edges = (1L to 100L).map(i => (i, 1000L + i % 7)).toDF("src", "dst")
    val r = graft.operators.RankPropagation.fixedPointPageRank(edges, 2, 1000000L)
    val p = r.queryExecution.explainString(FormattedMode)
    r.unpersist()
    assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian")
      && !p.contains("Window"), p)
    assert(p.contains("InMemoryTableScan"), p) // one round deep, not full lineage
  }

  test("rk1 global top-k: TakeOrderedAndProject — per-partition heaps, never a global sort") {
    val p = planOf("rk1_quality_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("lm1 bigram LM: model joins are shuffle-hash, V broadcast — no sort-merge, no corpus window") {
    val p = planOf("lm1_bigram_score")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    // the vocabulary-size scalar rides as a broadcast, nothing else does
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // per-doc prob fold is an in-row sort after a grouped collect —
    // a partition-wide Window sort over the exploded bigrams must not appear
    assert(!p.contains("Window"), p)
  }

  test("cd1 content-defined chunking: narrow per-row plan — no exchange before the final sort") {
    val df = graft.operators.Chunker.contentDefined(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text", 16)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("sd1 segment dedup: firsts via combinable min-agg (no content window), back-join shuffle-hash") {
    val p = graft.operators.SegmentDedup.dedupSegments(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text", 16)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"), p)          // skew-prone rank shape banned
    assert(!p.contains("SortMergeJoin"), p)   // no sort of text payload rows
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.split("HashAggregate").length >= 3, p) // partial+final min-agg
  }

  test("bpe3 deployment: one vocabulary-sized shuffle-hash join + per-doc agg — no re-fold, no sort-merge") {
    import graft.operators.BpeTrainer
    val docs = graft.core.Tables(spark, dir, "documents")
    val state = BpeTrainer.charTable(BpeTrainer.wordTable(docs, "text"))
    val p = BpeTrainer.compressionStats(docs, "doc_id", "text", state)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3, p) // per-doc partial+final
  }

  test("bpe pair counting: keyed combinable aggregates only — no join, no window, no text-keyed sort") {
    import graft.operators.BpeTrainer
    val p = BpeTrainer.pairCounts(BpeTrainer.charTable(BpeTrainer.wordTable(
      graft.core.Tables(spark, dir, "documents"), "text")))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Sort"), p)
    assert(p.split("HashAggregate").length >= 5, p) // word-count + pair-count, each partial+final
  }

  test("pc1 moments pass: one combinable aggregate over d² partial sums — no join, no vector shuffle") {
    val p = graft.operators.Pca.momentsTable(
      graft.core.Tables(spark, dir, "embeddings"), "embedding", 64)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3, p) // partial + final
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("vec_id") && !readSchema.contains("label"), readSchema)
  }

  test("he1 feature hashing: no vocabulary join — keyed aggregate plus a per-doc window") {
    val p = graft.operators.FeatureHashing.hashedTable(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text", 16)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), p)
    assert(p.split("HashAggregate").length >= 3, p) // partial + final counts
  }

  test("pt1 perceptron epoch pass: one map-side-combinable global aggregate, pruned scan") {
    import graft.operators.LinearClassifier
    val feat = LinearClassifier.featureTable(
      graft.core.Tables(spark, dir, "documents"), "doc_id", "text", "lang", "en")
    val p = LinearClassifier.epochUpdate(feat, Seq(1L, 2L, 3L))
      .queryExecution.explainString(FormattedMode)
    // partial + final HashAggregate, the only exchange the 1-row gather
    assert(p.split("HashAggregate").length >= 3, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // epoch pass never reads the id column — pruning reaches the scan
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("doc_id"), readSchema)
  }

  test("m4 image near-dup: Hamming buckets keyed on (chunk, key) — no cartesian, no sort-merge") {
    val p = planOf("m4_image_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // candidate join is the keyed chunk-bucket join (hash-partitioned)
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("u2 SCD2: one key exchange serves both windows — no second shuffle, no join") {
    val p = planOf("u2_scd2_history")
    assert(!p.contains("Join"), p)
    // boundary-lag and valid_to-lead share partitioning AND sort: one
    // hashpartitioning exchange total (plus the output order's range —
    // formatted mode puts the partitioning on the Arguments line)
    assert(p.split("hashpartitioning\\(").length == 2, p)
    assert(p.split("Window").length >= 3, p) // both windows present
  }

  test("c2 fraction decontamination: bench grams broadcast — no gram-keyed corpus shuffle") {
    val p = planOf("c2_contamination_frac")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mix4 temperature sampling: the corpus pass is a pure per-row filter — no exchange") {
    val spark2 = spark
    val df = graft.core.Tables(spark2, dir, "documents").select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("lang"))
    val p = graft.operators.Sampling
      .temperatureSample(df, "lang", "doc_id", alpha = 0.5, seed = 7)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange") && !p.contains("Join") && !p.contains("Window"), p)
  }

  test("h2 hierarchy closure: keyed hash joins only — no cartesian, no sort-merge, no broadcast-guessing the frontier") {
    val p = planOf("h2_hierarchy_flatten")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("h3 subtree rollup: facts pre-aggregate BEFORE the closure fan-out join; keyed joins only") {
    val p = planOf("h3_subtree_rollup")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // the fan-out join's build side is the per-node partial aggregate,
    // so a HashAggregate must sit below the join that feeds the final
    // node re-aggregate — raw facts never multiply by depth
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.split("HashAggregate").length >= 5, p) // partials + final, each split partial/merge
  }

  test("u3 incremental SCD2 apply: touched keys split by broadcast semi/anti — no SMJ, no cartesian") {
    val p = planOf("u3_scd2_apply")
    // batch keys broadcast against the open set: no history-sized shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("u3 apply over a STORED dimension: batch-sized exchanges only — the dimension parquet never shuffles") {
    // the deployment shape: dim lives in storage; only the apply's
    // (seed ∪ batch) window and the batch-keys distinct may exchange
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("u3-plan").toString
    val log = graft.core.Tables(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"))
    val cut = lit("1996-01-01").cast("date")
    graft.operators.Upsert.scd2History(log.filter(col("o_orderdate") < cut),
      Seq("o_custkey"), Seq("o_orderstatus"), Seq("o_orderdate", "o_orderkey"))
      .write.mode("overwrite").parquet(tmp)
    val p = graft.operators.Upsert.scd2Apply(
        spark.read.parquet(tmp), log.filter(col("o_orderdate") >= cut),
        Seq("o_custkey"), Seq("o_orderstatus"), Seq("o_orderdate", "o_orderkey"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // every hashpartitioning exchange is batch-sized: the batch-keys
    // distinct (statically printed twice — semi and anti branch — and
    // runtime-reused under AQE) and the apply window over
    // (touched ∪ batch); the dimension parquet itself never shuffles
    assert(p.split("hashpartitioning\\(").length == 4, p)
    assert(p.split("Window").length >= 3, p) // lag + lead share the one window exchange
  }

  test("j10 interval overlap: bucketed equi-join — never a per-key cross product") {
    val p = planOf("j10_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("__bin"), p) // the bin really is a join key
  }

  test("sk2 salted join: the physical join key really carries the salt (key splits across tasks)") {
    val p = planOf("sk2_salted_join")
    assert(p.contains("__salt"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a12 multi-distinct: Catalyst plans Expand (one multiplied pass), never distinct self-joins") {
    val p = planOf("a12_multi_distinct")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
  }

  test("cms1 sketch estimates: plan-literal min-over-rows — no join anywhere, keyed aggregates only") {
    val p = planOf("cms1_sketch_counts")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.split("HashAggregate").length >= 3, p) // exact counts partial+final
  }

  test("u5 CDC apply: change-sized compaction window, keyed anti + one full-outer key exchange — no cartesian") {
    val p = planOf("u5_cdc_apply")
    assert(p.contains("LeftAnti") && p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("u4 SCD2 point-in-time lookup: equi keys extracted into a hash join, interval as join filter — never an interval product") {
    val p = planOf("u4_scd2_lookup")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("bpe4 exact OOV: merge-chain fold per DISTINCT unseen word (anti-join + union), deploy join shuffle-hash") {
    val p = planOf("bpe4_exact_oov")
    // unseen vocabulary isolated by anti-join, folded once, unioned
    // with the precompiled state — never a per-occurrence re-fold
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("Union"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("fn1 funnel: each cascade stage's event scan is filter-pushed to its step type; all joins keyed on user_id") {
    val p = planOf("fn1_funnel")
    assert(p.contains("EqualTo(event_type,signup)"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("co1 cohort retention: keyed join against the |users|-sized first-week frame — no cartesian, no window") {
    val p = planOf("co1_cohort_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Window"), p) // two keyed aggregates + one keyed join only
  }

  test("v13 uniqueness audit: keyed aggregates only per declared key — no joins, no windows, no cartesian") {
    val p = planOf("v13_uniqueness")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("sk3 skew profile: broadcast 1-row total, WindowGroupLimit prunes the global top-k map-side") {
    val p = planOf("sk3_skew_profile")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qt3 scalable quantiles: broadcast semi-join prunes to candidate buckets; stats broadcast; no cartesian, no SMJ") {
    val p = planOf("qt3_scalable_quantiles")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // every Window in the plan is keyed — the whole point is that no
    // group-sized single-partition sort exists anywhere
    assert(!p.contains("No Partition Defined"), p)
  }

  test("v12 distribution validation: one stacked scan per side (no per-column re-scan), keyed full-outer compare, no cartesian") {
    val p = planOf("v12_distribution")
    // stack() unpivots all profiled columns in ONE pass over each
    // table — 3 columns must NOT mean 3 scans per side (count the
    // formatted detail headers; tree lines would double-count)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 2, p)
    // the compare joins two 2·|ps|-rows-per-column profiles on
    // (column_name, p) — keyed, never a nested loop
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // exact quantiles rank within each column's partition: exactly one
    // window exchange per side feeds both row_number and the count
    assert(p.contains("Window"), p)
  }

  test("del1 forget audit: erasure list broadcasts against every direct table — no fact-side shuffle, no cartesian") {
    val p = planOf("del1_forget_audit")
    // customer + orders audits and the cascade semi-join are all
    // broadcast hash joins (the erasure list is tiny by contract);
    // only the lineitem leg may key-exchange (its key set grows with
    // the data)
    assert(p.split("BroadcastHashJoin").length >= 4, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // every audit leg is one combinable aggregate: partial counts
    // exist below the final one-row aggregates
    assert(p.contains("partial_count"), p)
  }

  test("w7 rolling range frame: one keyed window exchange, no join, pruned scan") {
    val p = planOf("w7_rolling_range")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // partitioned by o_custkey — never a single-partition global sort
    assert(p.contains("hashpartitioning(o_custkey"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("o_orderpriority") && !readSchema.contains("o_orderstatus"), readSchema)
  }

  test("hg2 quantile bins: edges broadcast into the binning scan; no single-partition sort over the DATA") {
    val p = planOf("hg2_quantile_bins")
    // the 1-row edge frame joins by broadcast; binning is scan +
    // 4-group hash aggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // the fact column never meets a global order: an NTILE-style
    // formulation would range-partition / sort on o_totalprice itself,
    // while qt3's internal sorts run on its bucket-keyed aliases
    assert(!p.contains("rangepartitioning(o_totalprice")
      && !p.contains("Sort [o_totalprice"), p)
  }

  test("a13 correlation matrix: ONE combinable aggregate pass — no join, no window, all nine moments together") {
    val p = planOf("a13_corr_matrix")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // partial aggregates prove map-side combine; exactly one scan of
    // lineitem feeds all nine moment sums (never a per-pair re-scan)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"), readSchema)
  }

  test("a14 mode: keyed count + partitioned top-1 — WindowGroupLimit prunes map-side, no join") {
    val p = planOf("a14_mode")
    assert(!p.contains("Join"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("partial_count"), p)
  }

  test("ts1 date spine: ONE fact scan feeds counts, bounds, and statuses (exchange reused); spine joins are broadcast") {
    val p = planOf("ts1_date_spine")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // bounds, statuses, and the gap-fill join all read the persisted
    // aggregate-sized counts frame, so orders is scanned exactly once
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, p)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
  }

  test("an1 robust outliers: group-sized med/mad frames broadcast back — no SMJ, no cartesian") {
    val p = planOf("an1_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("pp1 period-over-period: calendar self-joins over the persisted months-sized aggregate — one fact scan, no cartesian") {
    val p = planOf("pp1_period_over_period")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, p)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("rr1 ratio-to-report: dims broadcast, share window over the nation-sized aggregate") {
    val p = planOf("rr1_ratio_to_report")
    assert(p.split("BroadcastHashJoin").length >= 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("w8 count-distinct window: both windows share ONE l_orderkey exchange — no join, no second shuffle") {
    val p = planOf("w8_count_distinct_window")
    assert(!p.contains("Join"), p)
    // dense_rank and the partition max run over the same
    // hashpartitioning(l_orderkey) — exactly one keyed shuffle before
    // the final presentation sort (whose exchange is range, not hash)
    val keyed = p.linesIterator.count(l =>
      l.contains("Arguments: hashpartitioning"))
    assert(keyed == 1, s"expected one keyed exchange, plan:\n$p")
    assert(p.contains("hashpartitioning(l_orderkey"), p)
  }

  test("ivm1 incremental aggregate: the merge joins two AGGREGATE frames — partial aggregates below, no window, no fact-sized join") {
    val p = planOf("ivm1_incremental_agg")
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // exactly one join node in the plan: the aggregate-frame full-outer
    // merge (delete/insert legs union BEFORE their one delta aggregate)
    assert("""\(\d+\) [A-Za-z]*Join""".r.findAllIn(p).length == 1, p)
    assert(p.contains("FullOuter"), p)
  }

  test("ivm2 min/max view: aggregate-frame full-outer merge, re-agg leg a broadcast SEMI join on the affected list — no cartesian") {
    val p = planOf("ivm2_minmax_view")
    assert(p.contains("FullOuter"), p)
    // the only base-data join is the left-semi against the
    // delta-bounded affected-group list — broadcast by construction
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ivm3 distinct view: store consults are broadcast semi/anti on the delta's pairs; counts merge full-outer; no cartesian, no window") {
    val p = planOf("ivm3_distinct_view")
    // the rows-store and dict consults ride broadcast semi-joins keyed
    // on the delta's own (group, value) pairs; dict removal is a
    // broadcast anti; the counts view merges two AGGREGATE frames
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("FullOuter"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // rank-free: the maintained count is an aggregate fold, never a
    // data-sized window
    assert(!p.contains("Window"), p)
  }

  test("at1 attribution: one keyed window on user_id feeding a channel-sized aggregate — no join") {
    val p = planOf("at1_attribution")
    assert(!p.contains("Join"), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(p.contains("Window"), p)
  }

  test("ab1 A/B readout: two combinable aggregates to one row — no join, no window") {
    val p = planOf("ab1_ab_test")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial_max"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, p)
  }

  test("gi1 islands: one keyed window exchange on user_id, no join, pruned scan") {
    val p = planOf("gi1_islands")
    assert(!p.contains("Join"), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"), readSchema)
  }

  test("j11 null-safe join: value leg keyed with nulls filtered, null leg a broadcast product — no single null hash task, no cartesian") {
    val p = planOf("j11_null_safe_join")
    // the r11 shape joined on <=> — one NULL hash key holding every
    // null row of both sides; the NullSafeJoin rewrite filters nulls
    // out of the equi leg and broadcasts the right null bucket
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
    // the leg filters push THROUGH the when() key derivation onto the
    // base columns: value leg keeps only not-null-capable keys, null
    // leg only null ones
    assert(p.contains("isnotnull(o_custkey"), p)
    assert(p.contains("isnull(o_custkey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ivm5 quantile view: invertible counts merge + candidate-bucket locate — candidates broadcast, every window keyed, no cartesian") {
    val p = planOf("ivm5_quantile_view")
    // the fold is a counts-frame full-outer merge; the locate joins
    // the rows against a BROADCAST candidate list and ranks within
    // (group, bucket, p) — no unpartitioned data window anywhere
    assert(p.contains("FullOuter"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("No Partition Defined"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("__qb"), p)
  }

  test("ivm4 join view: every bilinear leg broadcasts its delta side — no cartesian, view merge full-outer") {
    val p = planOf("ivm4_join_view")
    // ΔR⋈S, R⋈ΔS, ΔR⋈ΔS: three broadcast joins whose build sides are
    // the delta frames (the stored sides stream); the only other join
    // is the stored-view stand-in this key computes inline
    assert(p.split("BroadcastHashJoin").length >= 4, p)
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("w6 ntile bands: AUTO shape — window form keyed by status at test scale, bucket lattice past the estimate (r13)") {
    val p = planOf("w6_ntile_bands")
    // round 12 pinned the bucket shape unconditionally; round 13's
    // withRowNumberAuto picks per frame: at sf0.001 the estimate is
    // far under AutoBucketRankBytes, so the plan must be the WINDOW
    // form — one hashpartitioning(o_orderstatus) exchange, none of the
    // bucket lattice's fixed stages — with no global (unpartitioned)
    // sort anywhere. ScalableRankSpec pins the estimate-driven flip to
    // the bucket shape (a >32MB frame plans __rank_b), so both shapes
    // stay reachable and CI-checked.
    assert(!p.contains("__rank_b"), p)
    assert(p.contains("hashpartitioning(o_orderstatus"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the presentation orderBy is the only range exchange; no window
    // runs unpartitioned
    assert(!p.contains("No Partition Defined"), p)
  }

  test("rfm1 segments: AUTO banding — direct ntile windows over the bounded customer AGGREGATE at test scale, stacked bucket-rank past the estimate (r13)") {
    val p = planOf("rfm1_segments")
    // below the size estimate the r11 shape is simply best: three
    // ntile(4) windows directly over the customer aggregate — global
    // sorts, but of an AGGREGATE frame the estimate gate just bounded
    // (the r11 hazard was outgrowing that bound silently; the branch +
    // ScalableRank's enforced broadcast guard now make both regimes
    // explicit). Past the estimate the stacked ScalableRank bucket
    // pass takes over — the flip is estimate-driven, pinned at the
    // operator level by ScalableRankSpec's auto test.
    assert(p.contains("ntile("), p)
    assert(!p.contains("__rank_b"), p)
    // one pass over the aggregate: no join-back, no unpivot
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the windows ride the persisted customer aggregate, not the fact
    // table: exactly one parquet scan feeds the whole plan
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1, p)
  }

  test("ivm6w weighted topk: the ±weight fold keeps ivm6's exact plan shape") {
    val p = planOf("ivm6w_weighted_topk")
    assert(p.contains("FullOuter"), p)
    assert(p.split("BroadcastHashJoin").length >= 3, p)
    assert(!p.contains("__rank_b"), p)
    assert(p.contains("hashpartitioning(o_orderpriority"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("No Partition Defined"), p)
  }

  test("ivm6 topk view: invertible counts merge, candidate pick via broadcast markers in ONE store pass, rank on the keyed window at test scale") {
    val p = planOf("ivm6_topk_view")
    // the counts store folds as an aggregate-frame full-outer merge
    assert(p.contains("FullOuter"), p)
    // broken-group and candidate-pair markers are BROADCAST outer
    // joins against the merged store — never a shuffle of the store
    // keyed on anything but its own aggregate
    assert(p.split("BroadcastHashJoin").length >= 3, p)
    // the view rank rides withRowNumberAuto: at test scale the
    // estimate picks the WINDOW form keyed by the group — none of the
    // bucket lattice, no unpartitioned window, no cartesian
    assert(!p.contains("__rank_b"), p)
    assert(p.contains("hashpartitioning(o_orderpriority"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("No Partition Defined"), p)
  }
}
