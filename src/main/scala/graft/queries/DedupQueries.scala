package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{ConnectedComponents, ExactDedup, MinHashLSH, SimHash, Similarity, TextOps}

/** Deduplication operator corpus (LLM-pipeline ops): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding cosine.
  *
  * The raw `documents` table has no duplicates, so each query runs over
  * an augmented corpus built identically on both engines: exact copies
  * of every doc_id % 50 == 0 (new id + 100000) and near-copies (three
  * words appended, id + 200000) of every doc_id % 25 == 0. All hashing
  * uses the portable md5-derived 60-bit hash ([[TextOps.hexHash60]]) so
  * even the LSH pipelines are bit-checkable against DuckDB.
  */
object DedupQueries {

  private[graft] def corpusDocsPublic(s: SparkSession, dir: String): DataFrame = corpusDocs(s, dir)

  private def corpusDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(
        d.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" graft extra pad")).as("text")))
  }

  private val corpusSql =
    """corpus AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
      | UNION ALL SELECT doc_id + 200000, text || ' graft extra pad' FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  /** DuckDB mirrors of TextOps: words / distinct 3-gram shingles. */
  private val wordsSql =
    s"""w AS (SELECT doc_id, ${OracleText.words} AS w FROM corpus)"""
  private val gramsSql =
    """g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      | FROM w WHERE len(w) >= 3)""".stripMargin

  /** DuckDB mirror of TextOps.hexHash60. */
  private def hex60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  // ---- d2 minhash constants (must match the Spark call) --------------
  private val K = 32
  private val Bands = 8
  private val R = K / Bands
  private val MinhashThreshold = 0.8

  // ---- d9/d10/d11 constants (must match the Spark calls) -------------
  private val SpanL = 8
  private val WinK = 3
  private val WinW = 4
  private val WinShared = 10
  private val EditMaxDist = 20

  /** The d6 clustering DataFrame — [[MinHashLSH.nearDupClusters]] runs
    * the iterative connected-components pass on the verified
    * representative-PAIR graph only (orders of magnitude below corpus
    * size) and labels members with one corpus-sized join; identical
    * components to clustering the full nearDuplicates pair list. Named
    * (rather than inlined in the d6 lambda) so PlanAuditSpec can pin
    * the shape the query consumes. */
  private[graft] def d6Clusters(s: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDupClusters(corpusDocs(s, dir), "doc_id", "text",
      MinhashThreshold, k = K, bands = Bands)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> ((s, dir) => {
      ExactDedup.groups(corpusDocs(s, dir), "doc_id", Seq("text"))
        .select(col("keep_id"), col("dup_cnt"))
        .orderBy(col("keep_id"))
    }),
    "d2_minhash_lsh" -> ((s, dir) => {
      MinHashLSH.nearDuplicates(corpusDocs(s, dir), "doc_id", "text",
        MinhashThreshold, k = K, bands = Bands)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d3_simhash_values" -> ((s, dir) => {
      SimHash.simhashes(corpusDocs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    }),
    "d3_simhash_pairs" -> ((s, dir) => {
      SimHash.nearPairs(SimHash.simhashes(corpusDocs(s, dir), "doc_id", "text"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d4_ngram_jaccard" -> ((s, dir) => {
      graft.operators.SetSimilarityJoin
        .jaccardSelfJoin(corpusDocs(s, dir), "doc_id", "text", 3, 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d6_dedup_clusters" -> ((s, dir) => {
      d6Clusters(s, dir)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .orderBy(col("doc_id"))
    }),
    "d5_cosine_neardup" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.bruteForcePairs(corpus, "vec_id", "embedding", 0.99)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d8_incremental_screen" -> ((s, dir) => {
      // incremental ingestion: screen a NEW batch (drifted copies of
      // every doc_id % 41 == 5) against the standing corpus via a
      // prebuilt rep-collapsed index — corpus text is never re-shingled
      val corpus = corpusDocs(s, dir)
      val batch = Tables(s, dir, "documents")
        .filter(col("doc_id") % 41 === 5)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" incremental drift probe")).as("text"))
      val idx = MinHashLSH.buildIndex(corpus, "doc_id", "text", k = K, bands = Bands)
      MinHashLSH.screenAgainst(batch, "doc_id", "text", idx, MinhashThreshold)
        .orderBy(col("batch_id"), col("corpus_id"))
    }),
    "d9_substring_spans" -> ((s, dir) => {
      // exact repeated-substring pass (Lee et al. 2022 shape): maximal
      // token spans covered by 8-token windows occurring ≥ 2× anywhere
      // in the corpus — the exact copies contribute full-doc spans,
      // the near-copies their shared prefixes
      graft.operators.SubstringDedup
        .duplicateSpans(corpusDocs(s, dir), "doc_id", "text", windowLen = SpanL)
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("n_windows"))
        .orderBy(col("doc_id"), col("span_start"))
    }),
    "d10_winnowing_pairs" -> ((s, dir) => {
      // MOSS-style candidate pairing through winnowing fingerprints:
      // bucketed by fingerprint value, never all-pairs
      graft.operators.Winnowing
        .sharedPairs(corpusDocs(s, dir), "doc_id", "text",
          k = WinK, w = WinW, minShared = WinShared)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d11_edit_verify" -> ((s, dir) => {
      // candidate-generate → exact-verify: winnowing candidates
      // confirmed by Levenshtein ≤ EditMaxDist — edit distance runs on
      // candidates only, never corpus-wide
      graft.operators.Winnowing
        .editVerifiedPairs(corpusDocs(s, dir), "doc_id", "text",
          k = WinK, w = WinW, minShared = WinShared, maxDist = EditMaxDist)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "d7_semantic_dedup" -> ((s, dir) => {
      // SemDeDup: same injected near-dups as d5, but candidates come
      // from within-IVF-list pairs (bounded lists), never all-pairs
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(corpus, "vec_id", "embedding",
        centroidMod = 23, centroidRem = 7, threshold = 0.99)
        .orderBy(col("doc_id"))
    }))

  // ---- generated DuckDB oracles --------------------------------------

  /** CTE chain shared by d2 (pairs) and d6 (clusters): corpus → shingles
    * → minhash signatures → band buckets → candidates → verified pairs.
    *
    * Signature mirror of [[MinHashLSH.signaturesFrom]]'s
    * Kirsch-Mitzenmacher family: h_i = (h1 + i·(h2 // 32)) mod 2⁶⁰ over
    * the two 60-bit md5 halves (hex chars 1-15 / 17-31) — pure BIGINT
    * arithmetic, overflow-free (i·(h2//32) < 2⁶⁰, sum < 2⁶¹). */
  private val d2Ctes: String = lshCtes(corpusSql)

  /** The d2 CTE chain over an arbitrary corpus CTE — d8 reuses it with
    * the corpus extended by the incremental batch. */
  private def lshCtes(corpusCte: String): String = {
    val h2 = "CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT)"
    val sigList = (0 until K)
      .map(i => "list_min(list_transform(grams, s -> " +
        s"(${hex60("s")} + $i * ($h2 // 32)) % 1152921504606846976))")
      .mkString("[\n   ", ",\n   ", "]")
    val bandKey = (1 to R).map(j => s"sig[b.band * $R + $j]").mkString(", ")
    s"""$corpusCte,
       |$wordsSql,
       |$gramsSql,
       |sig AS (SELECT doc_id, grams, $sigList AS sig FROM g),
       |bands AS (
       | SELECT doc_id, b.band, md5(concat_ws(',', $bandKey)) AS bkey
       | FROM sig, (SELECT unnest(range(0, $Bands)) AS band) b),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       | FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
       |  AND a.doc_id < b.doc_id),
       |j AS (
       | SELECT c.id_a, c.id_b,
       |  CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
       |   / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) AS jaccard
       | FROM cand c JOIN g ga ON ga.doc_id = c.id_a JOIN g gb ON gb.doc_id = c.id_b)""".stripMargin
  }

  private val d2Oracle: String =
    s"""WITH $d2Ctes
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $MinhashThreshold
       |ORDER BY id_a, id_b""".stripMargin

  /** d8 ground truth: the full-recompute answer over corpus ∪ batch,
    * restricted to cross (batch, corpus) pairs. The incremental
    * operator's contract is to equal this without re-processing corpus
    * text — the oracle deliberately does NOT mirror incrementality,
    * only the answer. Batch ids live at +300000, above every corpus
    * id, so `cand`'s id_a < id_b puts the batch doc on the b side. */
  private val d8Oracle: String = {
    val extendedCorpus = corpusSql.stripSuffix(")") +
      "\n UNION ALL SELECT doc_id + 300000, text || ' incremental drift probe' " +
      "FROM documents WHERE doc_id % 41 = 5)"
    s"""WITH ${lshCtes(extendedCorpus)}
       |SELECT id_b AS batch_id, id_a AS corpus_id, jaccard FROM j
       |WHERE jaccard >= $MinhashThreshold AND id_b >= 300000 AND id_a < 300000
       |ORDER BY batch_id, corpus_id""".stripMargin
  }

  /** Clusters via recursive closure over the verified near-dup pairs:
    * cluster_id = smallest doc_id reachable in the undirected pair
    * graph (mirrors ConnectedComponents' hash-to-min fixpoint). */
  private val d6Oracle: String =
    s"""WITH RECURSIVE $d2Ctes,
       |edges AS (SELECT id_a, id_b FROM j WHERE jaccard >= $MinhashThreshold),
       |sym AS (
       | SELECT id_a AS a, id_b AS b FROM edges
       | UNION SELECT id_b AS a, id_a AS b FROM edges),
       |reach(id, r) AS (
       | SELECT DISTINCT a, a FROM sym
       | UNION
       | SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id)
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  private val simhashCte: String = {
    val sums = (0 until SimHash.Bits)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n  ")
    // bit 63's two's-complement contribution is Long.MinValue; emitted
    // ascending so the positive bits (≤ 2^63-1) accumulate before the
    // negative summand — DuckDB BIGINT arithmetic raises on overflow.
    val bits = (0 until SimHash.Bits)
      .map { b =>
        val v = if (b == 63) "(-9223372036854775807 - 1)" else SimHash.bitValue(b).toString
        s"(CASE WHEN s$b > 0 THEN CAST($v AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }
      .mkString(" + ")
    // hexHash64 mirror: signed 64-bit from two 32-bit md5 halves, pure
    // BIGINT arithmetic (DuckDB `<<` raises on 64-bit shift overflow).
    s"""$wordsSql,
       |$gramsSql,
       |ge AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |hx AS (SELECT doc_id,
       |  CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) AS hi,
       |  CAST(concat('0x', substr(md5(gram), 9, 8)) AS BIGINT) AS lo
       | FROM ge),
       |h AS (SELECT doc_id,
       |  (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + lo AS h
       | FROM hx),
       |ssum AS (SELECT doc_id,
       |  $sums
       | FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $bits AS simhash FROM ssum)""".stripMargin
  }

  private val d3ValuesOracle: String =
    s"""WITH $corpusSql,
       |$simhashCte
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  private val d3PairsOracle: String =
    s"""WITH $corpusSql,
       |$simhashCte,
       |chunks AS (
       | SELECT doc_id, simhash, c.c, (simhash >> (c.c * ${SimHash.ChunkBits})) & ${(1 << SimHash.ChunkBits) - 1} AS ck
       | FROM sh, (SELECT unnest(range(0, ${SimHash.Chunks})) AS c) c),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.simhash AS sh_a, b.simhash AS sh_b
       | FROM chunks a JOIN chunks b ON a.c = b.c AND a.ck = b.ck
       |  AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  private val d4Oracle: String =
    s"""WITH $corpusSql,
       |$wordsSql,
       |$gramsSql,
       |ge AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |pc AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
       | FROM ge a JOIN ge b ON a.gram = b.gram AND a.doc_id < b.doc_id
       | GROUP BY a.doc_id, b.doc_id),
       |sz AS (SELECT doc_id, len(grams) AS sz FROM g),
       |j AS (
       | SELECT pc.id_a, pc.id_b,
       |  CAST(pc.inter AS DOUBLE) / (sa.sz + sb.sz - pc.inter) AS jaccard
       | FROM pc JOIN sz sa ON sa.doc_id = pc.id_a JOIN sz sb ON sb.doc_id = pc.id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  private val dotSql = (a: String, b: String) =>
    s"list_reduce(list_transform(range(1, 65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)), (x, y) -> x + y)"

  private val d5Oracle: String =
    s"""WITH corpus AS (
       | SELECT vec_id, embedding FROM embeddings
       | UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0),
       |n AS (SELECT vec_id, embedding,
       |  sqrt(${dotSql("corpus", "corpus")}) AS nrm FROM corpus)
       |SELECT * FROM (
       | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${dotSql("a", "b")} / (a.nrm * b.nrm) AS cos_sim
       | FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |WHERE cos_sim >= 0.99 ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of Similarity.semanticDedup on the d5 corpus: the
    * id-mod centroid family, the (cos DESC, cent_id ASC) assignment
    * argmax, within-list pairs only (zero-norm vectors excluded, the
    * NaN-capture guard), then per-doc lowest keeper / best cosine. */
  private val d7Oracle: String = {
    val nc = s"${dotSql("n", "c")} / (n.nrm * c.cnrm)"
    val ab = s"${dotSql("a", "b")} / (a.nrm * b.nrm)"
    s"""WITH corpus AS (
       | SELECT vec_id, embedding FROM embeddings
       | UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0),
       |n AS (SELECT vec_id, embedding,
       |  sqrt(${dotSql("corpus", "corpus")}) AS nrm FROM corpus),
       |cents AS (SELECT vec_id AS cent_id, embedding, nrm AS cnrm
       | FROM n WHERE vec_id % 23 = 7),
       |asgn AS (
       | SELECT vec_id, embedding, nrm, cent_id AS list_id FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |   row_number() OVER (PARTITION BY n.vec_id
       |     ORDER BY $nc DESC, c.cent_id) AS rn
       |  FROM n, cents c) WHERE rn = 1 AND nrm > 0)
       |SELECT doc_id, keep_id, max_cos FROM (
       | SELECT b.vec_id AS doc_id, MIN(a.vec_id) AS keep_id,
       |  MAX($ab) AS max_cos
       | FROM asgn a JOIN asgn b
       |  ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       | WHERE $ab >= 0.99
       | GROUP BY b.vec_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** d9 mirror: zipped unnests give (pos, window-hash) per L-window;
    * duplicated hashes (global count ≥ 2) back-join; island merge via
    * lag + running sum, exactly [[graft.operators.SubstringDedup]]'s
    * overlap-or-touch rule. */
  private val d9Oracle: String = {
    val win = (0 until SpanL).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH $corpusSql,
       |$wordsSql,
       |gw AS (SELECT doc_id,
       |  unnest(range(1, len(w) - ${SpanL - 2})) - 1 AS pos,
       |  unnest(list_transform(range(1, len(w) - ${SpanL - 2}),
       |    i -> ${hex60(s"$win")})) AS h
       | FROM w WHERE len(w) >= $SpanL),
       |dh AS (SELECT h FROM gw GROUP BY h HAVING COUNT(*) > 1),
       |dw AS (SELECT gw.doc_id, gw.pos FROM gw JOIN dh USING (h)),
       |m AS (SELECT doc_id, pos,
       |  CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
       |    ${-SpanL - 1}) + $SpanL THEN 1 ELSE 0 END AS ns
       | FROM dw),
       |sp AS (SELECT doc_id, pos,
       |  SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM m)
       |SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS span_start,
       | CAST(MAX(pos) + $SpanL AS INTEGER) AS span_end,
       | CAST(COUNT(*) AS BIGINT) AS n_windows
       |FROM sp GROUP BY doc_id, span ORDER BY doc_id, span_start""".stripMargin
  }

  /** Winnowing CTE chain over the dup corpus (k=3, w=4): corpus →
    * gram hashes → fingerprints → exploded → candidate pairs with
    * shared counts. Shared by d10 (pairs) and d11 (edit-verified). */
  private val winnowCtes: String = {
    val gram = (0 until WinK).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""$corpusSql,
       |$wordsSql,
       |hs AS (SELECT doc_id, list_transform(range(1, len(w) - ${WinK - 2}),
       |   i -> ${hex60(gram)}) AS hs
       | FROM w WHERE len(w) >= $WinK),
       |fps AS (SELECT doc_id,
       |  CASE WHEN len(hs) >= $WinW THEN
       |    list_distinct(list_transform(range(1, len(hs) - ${WinW - 2}),
       |      i -> list_min(hs[i : i + ${WinW - 1}])))
       |   ELSE [list_min(hs)] END AS fps
       | FROM hs),
       |fpe AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       |wpr AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       | FROM fpe a JOIN fpe b ON a.fp = b.fp AND a.doc_id < b.doc_id
       | GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $WinShared)""".stripMargin
  }

  /** d10 mirror: the t7 winnowing chain over the dup corpus, then
    * pairs through shared fingerprint values. */
  private val d10Oracle: String =
    s"""WITH $winnowCtes
       |SELECT id_a, id_b, n_shared FROM wpr ORDER BY id_a, id_b""".stripMargin

  /** d11 mirror: d10's candidates verified by exact edit distance. */
  private val d11Oracle: String =
    s"""WITH $winnowCtes
       |SELECT wpr.id_a, wpr.id_b, wpr.n_shared,
       | CAST(levenshtein(ca.text, cb.text) AS INTEGER) AS dist
       |FROM wpr JOIN corpus ca ON ca.doc_id = wpr.id_a
       | JOIN corpus cb ON cb.doc_id = wpr.id_b
       |WHERE levenshtein(ca.text, cb.text) <= $EditMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  val oracle: Map[String, String] = Map(
    "d9_substring_spans" -> d9Oracle,
    "d10_winnowing_pairs" -> d10Oracle,
    "d11_edit_verify" -> d11Oracle,
    "d7_semantic_dedup" -> d7Oracle,
    "d8_incremental_screen" -> d8Oracle,
    "d1_exact_dedup" ->
      s"""WITH $corpusSql
         |SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_cnt
         |FROM corpus GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d2_minhash_lsh" -> d2Oracle,
    "d6_dedup_clusters" -> d6Oracle,
    "d3_simhash_values" -> d3ValuesOracle,
    "d3_simhash_pairs" -> d3PairsOracle,
    "d4_ngram_jaccard" -> d4Oracle,
    "d5_cosine_neardup" -> d5Oracle
  )
}
