package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{BloomContamination, Chunker, Contamination, LinearClassifier, QualityRules, Salt, Sampling, SequencePacker, TextOps, TfIdf}

/** Training-data curation corpus (LLM-pipeline ops, round 3): TF-IDF
  * term weighting, Gopher-style rule filters, intra-document repetition,
  * benchmark contamination, and context-window sequence packing. Every
  * score that reaches a comparison or an output column is either integer
  * arithmetic or a single IEEE double division, so results are
  * bit-checkable against DuckDB (no ln(), no decimal-literal division).
  */
object TrainQueries {

  private val PackBudget = 512L
  private val PackBlock = 64L
  private val ContamN = 5
  private val Stops = Seq("the", "a")
  private val ChunkSize = 64
  private val ChunkOverlap = 16
  private val ChunkStep = ChunkSize - ChunkOverlap
  private val BloomM = 65536
  private val CdcDivisor = 16
  private val UpRates = Map("en" -> 0.5, "zh" -> 2.5, "fr" -> 1.25)
  private val UpSeed = 7
  private val PtEpochs = 2
  private val PtDim = 3
  private val ShShards = 8
  private val ShSeed = 11
  private val BpeRounds = 3
  private val SpSplits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val SpSeed = 13
  private val BbWidth = 32L
  private val BbBatch = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tf1_tfidf_topk" -> ((s, dir) => {
      TfIdf.topTerms(Tables(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("word"), col("tf"), col("df"),
          col("score"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }),
    "g1_gopher_rules" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"),
          size(col("w")).as("n_words"),
          QualityRules.meanWordLen(col("w")).as("mean_word_len"),
          QualityRules.distinctRatio(col("w")).as("distinct_ratio"),
          QualityRules.gopherPass(col("w"), Stops).as("pass"))
        .orderBy(col("doc_id"))
    }),
    "rep1_repetition" -> ((s, dir) => {
      // per-gram counts via explode: the scalable shape (the per-row
      // O(g²) alternative dies on 10⁵-word documents)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.wordNGrams(col("text"), 2)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n2"),
          count(lit(1)).as("n2_distinct"),
          max(col("cnt")).as("max_cnt"))
        .withColumn("dup_frac",
          (col("n2") - col("n2_distinct")).cast("double") / col("n2"))
        .orderBy(col("doc_id"))
    }),
    "c1_contamination" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      Contamination.overlap(
          d.filter(col("doc_id") % 97 =!= 0),
          d.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", ContamN)
        .select(col("id").as("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    }),
    "c2_contamination_frac" -> ((s, dir) => {
      // the GPT-3/PaLM fraction rule: flag docs whose DISTINCT-gram
      // benchmark-overlap share reaches 10% (c1 is the raw-count twin)
      val d = Tables(s, dir, "documents")
      Contamination.flaggedByFraction(
          d.filter(col("doc_id") % 97 =!= 0),
          d.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", ContamN, minFrac = 0.1)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_overlap"),
          col("frac"))
        .orderBy(col("doc_id"))
    }),
    "sk2_salted_join" -> ((s, dir) => {
      // skew-salted join: the hot (fact) side splits each key across 8
      // deterministic salts, the dim side replicates across them — the
      // oracle is the PLAIN join, proving the rewrite row-for-row
      val facts = Tables(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("custkey"), col("o_totalprice"))
      val dim = Tables(s, dir, "customer").select(
        col("c_custkey").as("custkey"), col("c_mktsegment"))
      Salt.saltedJoin(facts, dim, "custkey", factor = 8)
        .select(col("o_orderkey"), col("custkey"), col("c_mktsegment"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    "sk1_salted_agg" -> ((s, dir) => {
      // skew-safe two-phase aggregation; decimal accumulation makes the
      // result independent of how the salt splits the partial groups,
      // so the oracle is the PLAIN group-by — the query proves the
      // salted rewrite is semantics-preserving
      val ev = Tables(s, dir, "events")
        .withColumn("v", col("value").cast("decimal(38,6)"))
      Salt.saltedSumCount(ev, Seq("event_type"), "v", Seq("ts"), saltFactor = 16)
        .select(col("event_type"), col("sum_v").cast("double").as("sum_value"),
          col("cnt"))
        .orderBy(col("event_type"))
    }),
    "pk1_sequence_pack" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).as("toks"))
      SequencePacker.pack(toks, "doc_id", "toks", PackBudget, PackBlock)
        .select(col("id").as("doc_id"), col("weight").as("toks"),
          col("cum"), col("bin"))
        .orderBy(col("doc_id"))
    }),
    "pk2_pack_split" -> ((s, dir) => {
      // packing WITH overflow splitting: every bin holds exactly
      // PackBudget tokens (except the last), boundary-crossing docs
      // split into per-bin slices
      val toks = Tables(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).as("toks"))
      SequencePacker.packSplit(toks, "doc_id", "toks", PackBudget, PackBlock)
        .select(col("id").as("doc_id"), col("weight").as("toks"),
          col("bin"), col("slice_idx"), col("start_tok"), col("n_tokens"))
        .orderBy(col("doc_id"), col("bin"))
    }),
    "ch1_chunking" -> ((s, dir) => {
      Chunker.chunk(Tables(s, dir, "documents"), "doc_id", "text",
          ChunkSize, ChunkOverlap)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk_text"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    "mix2_upsample" -> ((s, dir) => {
      // domain upsampling (the rate > 1 half of corpus mixing): scarce
      // languages repeat deterministically, the dominant one thins
      Sampling.weightedUpsample(
          Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", UpRates, defaultRate = 1.0, seed = UpSeed)
        .select(col("doc_id"), col("lang"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),
    "lm1_bigram_score" -> ((s, dir) => {
      // CCNet/KenLM-style LM quality filter, self-scored: train the
      // add-one-smoothed bigram model on the corpus and score each doc
      // by mean in-model bigram probability (fixed-fold double sum)
      val d = Tables(s, dir, "documents")
      graft.operators.LanguageModel.bigramScore(d, d, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("sum_p"),
          col("mean_p"))
        .orderBy(col("doc_id"))
    }),
    "cd1_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking: boundaries from token-hash divisibility
      // (expected chunk = CdcDivisor tokens), so edits only reshape the
      // chunks they touch — ch1's fixed windows are the offset-based twin
      Chunker.contentDefined(Tables(s, dir, "documents"), "doc_id", "text",
          divisor = CdcDivisor)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk_text"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    "sp1_train_split" -> ((s, dir) => {
      // deterministic train/val/test assignment with per-source
      // accounting: membership is a pure (seed, id) function, so a
      // held-out set stays held out as the corpus grows
      Sampling.splitAssign(
          Tables(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", SpSplits, SpSeed)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("split"))
    }),
    "bb1_length_batches" -> ((s, dir) => {
      // dynamic batching: similar-length docs bucket together and fill
      // fixed-size batches, so padding goes to the bucket max, not the
      // corpus max
      val toks = Tables(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).as("toks"))
      SequencePacker.lengthBatches(toks, "doc_id", "toks", BbWidth, BbBatch)
        .select(col("id").as("doc_id"), col("weight").as("toks"),
          col("bucket"), col("batch_idx"), col("pos_in_batch"))
        .orderBy(col("doc_id"))
    }),
    "bpe3_compression" -> ((s, dir) => {
      // the trained tokenizer deployed corpus-wide: per-document
      // char/symbol accounting via a vocabulary-sized join against
      // the compiled (word, syms) state — tokenize once, at training
      val docs = Tables(s, dir, "documents")
      val (_, st) = graft.operators.BpeTrainer.train(
        graft.operators.BpeTrainer.wordTable(docs, "text"), BpeRounds)
      val out = graft.operators.BpeTrainer
        .compressionStats(docs, "doc_id", "text", st)
        .select(col("id").as("doc_id"), col("n_words"), col("n_base"),
          col("n_syms"))
        .orderBy(col("doc_id"))
      st.unpersist() // see bpe2_tokenized — lineage recomputes if evicted
      out
    }),
    "bpe1_merges" -> ((s, dir) => {
      // tokenizer training: the merge table learned by three corpus-
      // weighted BPE rounds (count desc / lexicographic tie-break)
      import s.implicits._
      val (ms, st) = graft.operators.BpeTrainer.train(
        graft.operators.BpeTrainer.wordTable(Tables(s, dir, "documents"), "text"),
        BpeRounds)
      st.unpersist()
      ms.map(m => (m.round, m.a, m.b, m.cnt))
        .toDF("round", "sym_a", "sym_b", "cnt").orderBy(col("round"))
    }),
    "bpe2_tokenized" -> ((s, dir) => {
      // the vocabulary after those merges: every distinct word's
      // symbol sequence (space-joined), the deployed tokenizer state
      val (_, st) = graft.operators.BpeTrainer.train(
        graft.operators.BpeTrainer.wordTable(Tables(s, dir, "documents"), "text"),
        BpeRounds)
      val out = st.select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("syms"))
        .orderBy(col("word"))
      // release the training cache now: the returned plan recomputes
      // through the InMemoryRelation's lineage if evicted, so a
      // non-harness consumer doesn't accumulate pinned state per call
      st.unpersist()
      out
    }),
    "bpe4_exact_oov" -> ((s, dir) => {
      // the round-9 opt-in: train on 2/3 of the corpus, deploy on the
      // other third carrying deterministic NOVEL words — out-of-vocab
      // words re-fold through the learned merge chain (once per
      // distinct unseen word) instead of the frozen-model 0
      val docs = Tables(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val deploy = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(coalesce(col("text"), lit("")), lit(" zqnovel"),
            (col("doc_id") % 7).cast("string"), lit(" zqzq")).as("text"))
      val (ms, st) = graft.operators.BpeTrainer.train(
        graft.operators.BpeTrainer.wordTable(train, "text"), BpeRounds)
      graft.operators.BpeTrainer
        .compressionStatsExact(deploy, "doc_id", "text", st, ms)
        .select(col("id").as("doc_id"), col("n_words"), col("n_base"),
          col("n_syms"))
        .orderBy(col("doc_id"))
    }),
    "sh1_shuffle_shards" -> ((s, dir) => {
      // deterministic training-export shuffle: seeded-hash order,
      // dense 0-based positions within each shard
      graft.operators.ShuffleShard.assign(
          Tables(s, dir, "documents"), "doc_id", ShShards, ShSeed)
        .select(col("id").as("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),
    "sd1_segment_dedup" -> ((s, dir) => {
      // corpus-wide first-occurrence segment dedup over the cd1
      // segments, documents reassembled from their surviving segments
      graft.operators.SegmentDedup.dedupSegments(
          Tables(s, dir, "documents"), "doc_id", "text", CdcDivisor)
        .select(col("id").as("doc_id"), col("n_segments"), col("n_kept"),
          col("new_text"))
        .orderBy(col("doc_id"))
    }),
    "pt1_perceptron" -> ((s, dir) => {
      // integer-exact batch perceptron (lang='en' vs rest on
      // [1, n_words, n_distinct]): the whole training trajectory is
      // integer arithmetic, so DuckDB replays it epoch by epoch
      val feat = LinearClassifier.featureTable(
        Tables(s, dir, "documents"), "doc_id", "text", "lang", "en")
      LinearClassifier.trace(s,
          LinearClassifier.trainPerceptron(feat, PtDim, PtEpochs))
        .select(col("epoch"), col("n_miss"),
          col("w").getItem(0).as("w_bias"),
          col("w").getItem(1).as("w_words"),
          col("w").getItem(2).as("w_distinct"))
        .orderBy(col("epoch"))
    }),
    "bf1_bloom_decontam" -> ((s, dir) => {
      // same benchmark/corpus split as c1; the filter build is an eager
      // filter-sized aggregate, then the probe plan carries the bits as
      // a literal — no corpus-side join (c1 is the exact-join twin)
      val d = Tables(s, dir, "documents")
      val bits = BloomContamination.buildBits(
        d.filter(col("doc_id") % 97 === 0), "text", ContamN, BloomM)
      BloomContamination.flagged(
          d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", ContamN, bits)
        .select(col("id").as("doc_id"), col("n_maybe"))
        .orderBy(col("doc_id"))
    }))

  /** DuckDB twin of one [[BloomContamination]] probe: bit i of the
    * mirrored filter list `l` for the gram hashed to (h1, h2). */
  private def bloomProbe(i: Int): String = {
    val pos = s"((h1 + $i * h2) % $BloomM)"
    s"(l[CAST($pos // 32 AS INTEGER) + 1] & " +
      s"(1::BIGINT << CAST($pos % 32 AS INTEGER))) <> 0"
  }

  // ---- DuckDB mirrors -------------------------------------------------

  private val wordsExpr = OracleText.words
  private val wordsCoalescedExpr = OracleText.wordsCoalesced

  private def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len(w) - ${n - 2}), i -> $parts))"
  }

  /** mix2 mirror: base copies + fractional top-up from the same seeded
    * 60-bit hash and the same integer thresholds (generated from
    * [[UpRates]], so a rate edit cannot desynchronize the engines). */
  private val mix2Oracle: String = {
    def thr(r: Double): Long = ((r - math.floor(r)) * (1L << 60).toDouble).toLong
    def baseOf(r: Double): Long = math.floor(r).toLong
    val baseCase = UpRates.map { case (l, r) => s"WHEN '$l' THEN ${baseOf(r)}" }
      .mkString(" ")
    val thrCase = UpRates.map { case (l, r) => s"WHEN '$l' THEN ${thr(r)}" }
      .mkString(" ")
    s"""WITH r AS (SELECT doc_id, lang,
       |  CASE lang $baseCase ELSE ${baseOf(1.0)} END AS base,
       |  CASE lang $thrCase ELSE ${thr(1.0)} END AS thr,
       |  CAST(concat('0x', substr(md5('$UpSeed:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |    AS BIGINT) AS h
       | FROM documents),
       |c AS (SELECT doc_id, lang,
       |  base + CASE WHEN h < thr THEN 1 ELSE 0 END AS n FROM r)
       |SELECT doc_id, lang, unnest(range(0, n)) AS copy_idx
       |FROM c WHERE n > 0 ORDER BY doc_id, copy_idx""".stripMargin
  }

  /** Shared CDC segmentation CTE chain, ending at
    * `seg(doc_id, chunk_idx, chunk_text, n_tokens)` — the DuckDB twin
    * of [[Chunker.contentDefined]] used by cd1 and sd1. coalesce
    * mirrors contentDefined's null-text == empty-text contract; B
    * holds 1-based chunk-start token positions, chunk i ends before
    * the next start (or after the last token). */
  private val CdcSegCtes: String =
    s"""ww AS (SELECT doc_id,
       |  string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS w
       | FROM documents),
       |c AS (SELECT doc_id, w, len(w) AS n FROM ww),
       |b AS (SELECT doc_id, w, n,
       |  list_concat([CAST(1 AS BIGINT)],
       |    list_filter(range(2, n + 1),
       |      p -> CAST(concat('0x', substr(md5(w[p]), 1, 15)) AS BIGINT)
       |        % $CdcDivisor = 0)) AS starts
       | FROM c),
       |e AS (SELECT doc_id, w, n, starts,
       |  unnest(range(1, len(starts) + 1)) AS ci
       | FROM b),
       |seg AS (SELECT doc_id, CAST(ci - 1 AS INTEGER) AS chunk_idx,
       | array_to_string(w[starts[ci] : coalesce(starts[ci + 1], n + 1) - 1], ' ')
       |  AS chunk_text,
       | CAST(coalesce(starts[ci + 1], n + 1) - starts[ci] AS INTEGER) AS n_tokens
       | FROM e)""".stripMargin

  /** One BPE round as chained CTEs, from state s{k-1}(word, freq,
    * syms): p = corpus-weighted pair counts, t = the selected pair
    * (count desc, lexicographic tie-break), then the leftmost-greedy
    * merge as the equivalent chain-parity window rule — candidates
    * (sym=a, next=b) in consecutive runs merge at EVEN offsets from
    * the run start (for a≠b runs are singletons and every candidate
    * merges; for a=b this is exactly floor(run/2) leftmost merges —
    * the same result as BpeTrainer.applyMerge's fold, pinned by
    * BpeTrainerSpec). Rows whose previous position merged are
    * absorbed; surviving rows re-list in position order. */
  /** `sel` restricts MERGE SELECTION to a word subset (bpe4's
    * train-only vocabulary) while the rewrite still applies to every
    * state word — exactly how a frozen tokenizer meets unseen text. */
  private def bpeRoundCtes(k: Int, sel: String = ""): String = {
    val p = k - 1
    s"""p$k AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
       | FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
       |        FROM s$p WHERE len(syms) >= 2$sel)
       | GROUP BY a, b),
       |t$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
       |tok$k AS (SELECT word, freq, i AS pos, syms[i] AS sym
       | FROM (SELECT word, freq, syms, unnest(range(1, len(syms) + 1)) AS i
       |        FROM s$p)),
       |cn$k AS (SELECT word, freq, pos, sym,
       |  CASE WHEN sym = t.a
       |        AND lead(sym) OVER (PARTITION BY word ORDER BY pos) = t.b
       |       THEN 1 ELSE 0 END AS cand
       | FROM tok$k, t$k t),
       |gr$k AS (SELECT *, CASE WHEN cand = 1 THEN
       |    pos - row_number() OVER (PARTITION BY word, cand ORDER BY pos) END AS grp
       | FROM cn$k),
       |sl$k AS (SELECT *, CASE WHEN cand = 1
       |    AND (pos - min(pos) OVER (PARTITION BY word, cand, grp)) % 2 = 0
       |   THEN 1 ELSE 0 END AS sel
       | FROM gr$k),
       |mg$k AS (SELECT word, freq, pos, sym, sel,
       |  lag(sel, 1, 0) OVER (PARTITION BY word ORDER BY pos) AS prev_sel,
       |  lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       | FROM sl$k),
       |s$k AS (SELECT word, freq,
       |  list(CASE WHEN sel = 1 THEN sym || nxt ELSE sym END ORDER BY pos) AS syms
       | FROM mg$k WHERE prev_sel = 0 GROUP BY word, freq)"""
  }

  /** The shared WITH-chain for both BPE oracles: word counts, char
    * split, then [[BpeRounds]] rounds. */
  private val bpeCtes: String = {
    val rounds = (1 to BpeRounds).map(k => bpeRoundCtes(k)).mkString(",\n|")
    s"""w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
       | FROM (SELECT unnest($wordsExpr) AS word FROM documents)
       | GROUP BY word),
       |s0 AS (SELECT word, freq,
       |  list_transform(range(1, length(word) + 1),
       |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
       | FROM w0),
       |$rounds"""
  }

  private val bpe1Oracle: String = {
    val rows = (1 to BpeRounds).map(k =>
      s"SELECT CAST($k AS INTEGER) AS round, a AS sym_a, b AS sym_b, cnt FROM t$k")
      .mkString("\n|UNION ALL ")
    s"""WITH $bpeCtes
       |$rows
       |ORDER BY round""".stripMargin
  }

  private val bpe2Oracle: String =
    s"""WITH $bpeCtes
       |SELECT w0.word, w0.freq,
       | coalesce(array_to_string(s$BpeRounds.syms, ' '), '') AS syms
       |FROM w0 LEFT JOIN s$BpeRounds USING (word) ORDER BY word""".stripMargin

  /** pt1 mirror: the integer perceptron trajectory replayed as chained
    * CTEs — e0 holds w = 0, each epoch CTE recomputes misses against
    * the previous epoch's weights and folds the summed update in.
    * Generated from [[PtEpochs]] so an epoch-count edit cannot
    * desynchronize the engines. */
  private val pt1Oracle: String = {
    val dims = 0 until PtDim
    def margin(p: String) =
      s"y * (${dims.map(j => s"$p.w$j * x$j").mkString(" + ")}) <= 0"
    val epochs = (1 to PtEpochs).map { e =>
      val upd = dims.map(j =>
        s"p.w$j + CAST(COALESCE(SUM(y * x$j) FILTER (WHERE ${margin("p")}), 0) AS BIGINT) AS w$j")
        .mkString(",\n |  ")
      s"""e$e AS (SELECT
         |  CAST(COUNT(*) FILTER (WHERE ${margin("p")}) AS BIGINT) AS n_miss,
         |  $upd
         | FROM f CROSS JOIN e${e - 1} p
         | GROUP BY ${dims.map(j => s"p.w$j").mkString(", ")})"""
    }.mkString(",\n|")
    val rows = (1 to PtEpochs).map(e =>
      s"SELECT CAST($e AS INTEGER) AS epoch, n_miss, w0 AS w_bias, " +
        s"w1 AS w_words, w2 AS w_distinct FROM e$e").mkString("\n|UNION ALL ")
    s"""WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |  CAST(1 AS BIGINT) AS x0, CAST(len(w) AS BIGINT) AS x1,
       |  CAST(len(list_distinct(w)) AS BIGINT) AS x2
       | FROM (SELECT $wordsExpr AS w, lang FROM documents)),
       |e0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
       |$epochs
       |$rows
       |ORDER BY epoch""".stripMargin
  }

  /** bpe4 mirror: one state over train ∪ deploy words, merge SELECTION
    * restricted to the train vocabulary (frequencies from train docs
    * only), the rewrite applied to every word — so unseen deploy words
    * replay the learned merge chain exactly as
    * `BpeTrainer.compressionStatsExact` folds it. */
  private val bpe4Oracle: String = {
    val rounds = (1 to BpeRounds)
      .map(k => bpeRoundCtes(k, " AND word IN (SELECT word FROM tw)"))
      .mkString(",\n|")
    s"""WITH tdoc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
       |ddoc AS (SELECT doc_id,
       |  coalesce(text, '') || ' zqnovel' || CAST(doc_id % 7 AS VARCHAR) || ' zqzq' AS text
       | FROM documents WHERE doc_id % 3 = 0),
       |tw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
       | FROM (SELECT unnest($wordsExpr) AS word FROM tdoc) GROUP BY word),
       |dw AS (SELECT DISTINCT word
       | FROM (SELECT unnest($wordsExpr) AS word FROM ddoc)),
       |w0 AS (SELECT COALESCE(tw.word, dw.word) AS word,
       |  COALESCE(tw.freq, CAST(0 AS BIGINT)) AS freq
       | FROM tw FULL OUTER JOIN dw ON tw.word = dw.word),
       |s0 AS (SELECT word, freq,
       |  list_transform(range(1, length(word) + 1),
       |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
       | FROM w0),
       |$rounds,
       |wx AS (SELECT doc_id, unnest($wordsExpr) AS word FROM ddoc)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       | CAST(SUM(length(wx.word)) AS BIGINT) AS n_base,
       | CAST(SUM(len(sb.syms)) AS BIGINT) AS n_syms
       |FROM wx JOIN s$BpeRounds sb ON wx.word = sb.word
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "bpe4_exact_oov" -> bpe4Oracle,
    "mix2_upsample" -> mix2Oracle,
    "pt1_perceptron" -> pt1Oracle,
    "bpe1_merges" -> bpe1Oracle,
    "bpe2_tokenized" -> bpe2Oracle,
    "bpe3_compression" ->
      s"""WITH $bpeCtes,
         |wx AS (SELECT doc_id, unnest($wordsExpr) AS word FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         | CAST(SUM(length(wx.word)) AS BIGINT) AS n_base,
         | CAST(SUM(coalesce(len(sb.syms), 0)) AS BIGINT) AS n_syms
         |FROM wx LEFT JOIN s$BpeRounds sb ON wx.word = sb.word
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sp1_train_split" -> {
      val thrs = Sampling.splitThresholds(SpSplits)
      val cases = SpSplits.init.zip(thrs)
        .map { case ((n, _), t) => s"WHEN h < $t THEN '$n'" }.mkString(" ")
      s"""WITH h AS (SELECT doc_id, source,
         |  CAST(concat('0x', substr(md5('$SpSeed:' || CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) AS h
         | FROM documents)
         |SELECT source, CASE $cases ELSE '${SpSplits.last._1}' END AS split,
         | CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM h GROUP BY source, split ORDER BY source, split""".stripMargin
    },
    "bb1_length_batches" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($wordsCoalescedExpr) AS BIGINT) AS toks
         | FROM documents),
         |r AS (SELECT doc_id, toks, toks // $BbWidth AS bucket,
         |  row_number() OVER (PARTITION BY toks // $BbWidth ORDER BY doc_id) - 1 AS rn
         | FROM t)
         |SELECT doc_id, toks, CAST(bucket AS BIGINT) AS bucket,
         | CAST(rn // $BbBatch AS BIGINT) AS batch_idx,
         | CAST(rn % $BbBatch AS BIGINT) AS pos_in_batch
         |FROM r ORDER BY doc_id""".stripMargin,
    "sh1_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(concat('0x', substr(md5('$ShSeed:' || CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) AS h
         | FROM documents)
         |SELECT doc_id, CAST(h % $ShShards AS INTEGER) AS shard,
         | CAST(row_number() OVER (PARTITION BY h % $ShShards ORDER BY h, doc_id) - 1
         |   AS BIGINT) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin,
    "tf1_tfidf_topk" ->
      s"""WITH wx AS (SELECT doc_id, unnest($wordsExpr) AS word FROM documents),
         |wv AS (SELECT doc_id, word FROM wx WHERE word <> ''),
         |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM wv GROUP BY doc_id, word),
         |df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
         |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
         |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
         |  CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
         | FROM tf JOIN df ON tf.word = df.word, n)
         |SELECT doc_id, word, tf, df, score, CAST(rank AS INTEGER) AS rank FROM (
         | SELECT s.*, row_number() OVER (PARTITION BY doc_id
         |   ORDER BY score DESC, word) AS rank FROM s)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "g1_gopher_rules" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS INTEGER) AS n_words,
         |  CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
         |    (a, x) -> a + x) AS DOUBLE) / len(w) AS mean_word_len,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
         |  list_has_any(w, ['the', 'a']) AS has_stop
         | FROM ww)
         |SELECT doc_id, n_words, mean_word_len, distinct_ratio,
         | (n_words >= 50 AND n_words <= 100000
         |  AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
         |  AND distinct_ratio > 0.2 AND has_stop) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    "rep1_repetition" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |g2 AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
         | FROM ww WHERE len(w) >= 2),
         |pc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM g2 GROUP BY doc_id, g)
         |SELECT doc_id,
         | CAST(SUM(cnt) AS BIGINT) AS n2,
         | CAST(COUNT(*) AS BIGINT) AS n2_distinct,
         | MAX(cnt) AS max_cnt,
         | CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_frac
         |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c1_contamination" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |g5 AS (SELECT doc_id, unnest(${shingleExpr(ContamN)}) AS gram
         | FROM ww WHERE len(w) >= $ContamN),
         |bench AS (SELECT DISTINCT gram FROM g5 WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, gram FROM g5 WHERE doc_id % 97 <> 0)
         |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         |FROM corpus c JOIN bench b ON c.gram = b.gram
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "c2_contamination_frac" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |g5 AS (SELECT DISTINCT doc_id, gram FROM (
         |  SELECT doc_id, unnest(${shingleExpr(ContamN)}) AS gram
         |  FROM ww WHERE len(w) >= $ContamN)),
         |bench AS (SELECT DISTINCT gram FROM g5 WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, gram FROM g5 WHERE doc_id % 97 <> 0),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
         | FROM corpus GROUP BY doc_id),
         |ov AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         | FROM corpus c JOIN bench b ON c.gram = b.gram GROUP BY c.doc_id)
         |SELECT tot.doc_id, tot.n_grams, ov.n_overlap,
         | CAST(ov.n_overlap AS DOUBLE) / tot.n_grams AS frac
         |FROM tot JOIN ov ON tot.doc_id = ov.doc_id
         |WHERE CAST(ov.n_overlap AS DOUBLE) / tot.n_grams >= 0.1
         |ORDER BY tot.doc_id""".stripMargin,
    "sk2_salted_join" ->
      """SELECT o.o_orderkey, o.o_custkey AS custkey, c.c_mktsegment, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    "sk1_salted_agg" ->
      """SELECT event_type,
        | CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        | CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "pk1_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($wordsCoalescedExpr) AS BIGINT) AS toks
         | FROM documents),
         |c AS (SELECT doc_id, toks,
         |  CAST(SUM(toks) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         | FROM t)
         |SELECT doc_id, toks, cum, (cum - toks) // $PackBudget AS bin
         |FROM c ORDER BY doc_id""".stripMargin,
    "pk2_pack_split" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($wordsCoalescedExpr) AS BIGINT) AS toks
         | FROM documents),
         |c AS (SELECT doc_id, toks,
         |  CAST(SUM(toks) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         | FROM t),
         |e AS (SELECT doc_id, toks, cum,
         |  (cum - toks) // $PackBudget AS p, (cum - 1) // $PackBudget AS q
         | FROM c WHERE toks > 0),
         |s AS (SELECT doc_id, toks, cum, p,
         |  unnest(generate_series(p, q)) AS bin FROM e)
         |SELECT doc_id, toks, CAST(bin AS BIGINT) AS bin,
         | CAST(bin - p AS BIGINT) AS slice_idx,
         | CAST(greatest(cum - toks, bin * $PackBudget) - (cum - toks) AS BIGINT) AS start_tok,
         | CAST(least(cum, (bin + 1) * $PackBudget)
         |   - greatest(cum - toks, bin * $PackBudget) AS BIGINT) AS n_tokens
         |FROM s ORDER BY doc_id, bin""".stripMargin,
    "ch1_chunking" ->
      // coalesce mirrors Chunker's null-text == empty-text contract
      s"""WITH ww AS (SELECT doc_id,
         |  string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS w
         | FROM documents),
         |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM ww),
         |ch AS (SELECT doc_id, w, n,
         |  unnest(range(0, 1 + greatest(0,
         |    (n - $ChunkSize + ${ChunkStep - 1}) // $ChunkStep))) AS chunk_idx
         | FROM c)
         |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         | array_to_string(
         |   w[chunk_idx * $ChunkStep + 1 : chunk_idx * $ChunkStep + $ChunkSize],
         |   ' ') AS chunk_text,
         | CAST(least($ChunkSize, n - chunk_idx * $ChunkStep) AS INTEGER) AS n_tokens
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "lm1_bigram_score" ->
      // bigram LM mirror: history counts from the bigram table (GROUP BY
      // w1), vocabulary from ALL corpus words; probabilities fold in
      // position order — list_reduce's first-element seed matches
      // Spark's 0.0 seed bit-exactly because 0.0 + p == p for p > 0
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |bg AS (SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
         | FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |        FROM ww WHERE len(w) >= 2)),
         |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
         | FROM bg GROUP BY w1, w2),
         |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
         | FROM bg GROUP BY w1),
         |v AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v
         | FROM (SELECT unnest(w) AS word FROM ww)),
         |pr AS (SELECT bg.doc_id, bg.pos,
         |  CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
         |    / (coalesce(c1.c1, 0) + v.v) AS p
         | FROM bg LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
         |  LEFT JOIN c1 ON bg.w1 = c1.w1, v),
         |s AS (SELECT doc_id, list(p ORDER BY pos) AS ps FROM pr GROUP BY doc_id)
         |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
         | list_reduce(ps, (a, x) -> a + x) AS sum_p,
         | list_reduce(ps, (a, x) -> a + x) / len(ps) AS mean_p
         |FROM s ORDER BY doc_id""".stripMargin,
    "cd1_cdc_chunks" ->
      s"""WITH $CdcSegCtes
         |SELECT doc_id, chunk_idx, chunk_text, n_tokens
         |FROM seg ORDER BY doc_id, chunk_idx""".stripMargin,
    "sd1_segment_dedup" ->
      // first-occurrence-per-content keep rule over the same CDC
      // segments, then per-doc reassembly in original segment order
      s"""WITH $CdcSegCtes,
         |sh AS (SELECT doc_id, chunk_idx, chunk_text,
         |  CAST(concat('0x', substr(md5(chunk_text), 1, 15)) AS BIGINT) AS h
         | FROM seg),
         |r AS (SELECT doc_id, chunk_idx, chunk_text,
         |  row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
         | FROM sh)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
         | CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
         | coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
         |   FILTER (WHERE rn = 1), '') AS new_text
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bf1_bloom_decontam" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |g5 AS (SELECT doc_id, unnest(${shingleExpr(ContamN)}) AS gram
         | FROM ww WHERE len(w) >= $ContamN),
         |bh AS (SELECT
         |  CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS h1,
         |  CAST(concat('0x', substr(md5(gram), 17, 15)) AS BIGINT) // 32 AS h2
         | FROM (SELECT DISTINCT gram FROM g5 WHERE doc_id % 97 = 0)),
         |bw AS (SELECT pos // 32 AS wi,
         |  bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
         | FROM (SELECT (h1 + t.i * h2) % $BloomM AS pos
         |        FROM bh, range(0, ${BloomContamination.HashK}) t(i))
         | GROUP BY 1),
         |bits AS (SELECT list(coalesce(word, 0) ORDER BY r.i) AS l
         | FROM range(0, ${BloomM / 32}) r(i) LEFT JOIN bw ON r.i = bw.wi),
         |ph AS (SELECT doc_id,
         |  CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS h1,
         |  CAST(concat('0x', substr(md5(gram), 17, 15)) AS BIGINT) // 32 AS h2
         | FROM g5 WHERE doc_id % 97 <> 0)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_maybe
         |FROM ph CROSS JOIN bits
         |WHERE ${(0 until BloomContamination.HashK).map(bloomProbe).mkString(" AND ")}
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
