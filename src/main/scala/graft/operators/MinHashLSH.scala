package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (LLM-pipeline op).
  *
  * Pipeline: shingle → content-dedup → K minhashes over distinct-content
  * representatives → b bands of r rows → band-bucket join → exact-Jaccard
  * verification → expansion back to all document ids.
  *
  * Scale design — the candidate space is bounded by DISTINCT content, not
  * corpus size. A web-scale corpus carries boilerplate duplicated 10⁶-10⁷
  * times; every copy shares every band bucket, so a naive within-bucket
  * self-join materializes ~10¹²-10¹⁴ candidate pairs from one bucket.
  * Here identical shingle-sets are collapsed to one representative
  * ([[contentGroups]]) BEFORE signatures, so a 10⁶-copy cluster
  * contributes exactly one row per band to the bucket join. Verified
  * representative pairs are then expanded to member pairs with
  * output-bounded joins ([[nearDuplicates]]) — quadratic work appears
  * only where the requested OUTPUT is itself quadratic. Pipelines that
  * want clusters, not pair lists (the only sane contract at 100 TB),
  * use [[nearDupEdges]]: member→representative star edges plus verified
  * representative pairs — linear in the corpus — which yield exactly the
  * same connected components as the full pair list.
  *
  * Residual quadratic risk: a bucket can still be wide with many
  * *distinct* near-identical documents (templated text differing by one
  * token). [[candidatePairs]] takes an optional `maxBucketWidth`; buckets
  * wider than the cap are skipped and surfaced by [[oversizedBuckets]]
  * for auditing, so the skip is a visible data-quality signal rather
  * than silent truncation.
  *
  * The default base hash is the portable md5-based
  * [[TextOps.hexHash60Pair]] (one digest → two 60-bit halves → all k
  * minhash functions by Kirsch-Mitzenmacher derivation) so results are
  * oracle-checkable cross-engine; production can pass
  * [[TextOps.fastHashPair]] (xxhash64) to drop the md5 cost entirely.
  */
object MinHashLSH {

  /** (id, grams) shingle table — see [[TextOps.shingleTable]]. */
  def shingleTable(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame =
    TextOps.shingleTable(docs, idCol, textCol, shingleN)

  /** Content-identity groups over a shingle table: (id, rep) where
    * rep = min(id) among documents with the identical shingle SET
    * (sorted-set fingerprint — signature, band keys, and Jaccard all
    * depend only on the set). One hash-partitioned groupBy plus one
    * keyed join; the shuffle-hash hint keeps AQE from broadcast-building
    * a representative table that is ~corpus-sized when duplication is
    * rare.
    *
    * The fingerprint joins sorted grams with '\n', which cannot occur
    * inside a gram — grams are space-joined tokens from a `\s+` split
    * ([[TextOps.wordNGrams]]) — so the encoding is injective on gram
    * sets. An unseparated (or non-whitespace-separated) concat is
    * ambiguous: with shingleN=1, "ab c" and "a bc" would both
    * fingerprint as md5("abc") and distinct documents would be merged
    * as exact duplicates. */
  def contentGroups(g: DataFrame): DataFrame = {
    val fp = g.select(col("id"),
      md5(concat_ws("\n", array_sort(col("grams")))).as("gfp"))
    val reps = fp.groupBy(col("gfp")).agg(min(col("id")).as("rep"))
    fp.join(reps.hint("shuffle_hash"), "gfp").select(col("id"), col("rep"))
  }

  /** (id, sig) from a shingle table.
    *
    * Hash family: Kirsch-Mitzenmacher derivation over ONE base digest —
    * h_i(s) = (h1(s) + i·(h2(s) div 32)) mod 2⁶⁰, where (h1, h2) are the
    * two independent 60-bit halves of a single md5
    * ([[TextOps.hexHash60Pair]]). One md5 per distinct gram replaces the
    * k-md5s-per-gram seeded family of rounds ≤5 — md5 was the dominant
    * CPU of the whole signature stage at k=32. Overflow bound: h1 < 2⁶⁰
    * and (h2 div 32) < 2⁵⁵, so the pre-mod sum is < 2⁶⁰ + (k−1)·2⁵⁵ —
    * inside signed 64-bit iff k ≤ 224, enforced by the require below
    * (portable to DuckDB BIGINT, which raises on overflow: mirror is
    * `(h1 + i * (h2 // 32)) % 1152921504606846976`).
    *
    * Plan shape (r16 optimization pass): ONE digest + k derivations
    * per gram OCCURRENCE, straight into the map-side-combinable
    * signature aggregate — zero joins, zero exchanges before the
    * per-doc groupBy. Rounds ≤15 deduplicated grams into a hashed
    * vocabulary first (distinct → repartition → shuffle-hash join
    * back), which paid THREE corpus-scale exchanges to save
    * (occurrences − distinct) md5 calls; that trade dates from the
    * k-md5s-per-gram era. With the single-digest KM family a repeated
    * gram costs one extra md5 + k multiply-adds — pure ALU inside
    * whole-stage codegen — while the exchanges it saved are the
    * expensive part at every scale (guide §2.4: remove shuffles
    * outright). Interleaved A/B at sf0.1 (shingle→sign→band, k=32):
    * median 2.62 s → 1.30 s, and the old shape's contended samples
    * were 2× worse again — three fewer shuffle barriers is also why
    * the new shape degrades more gracefully. At 100 TB the argument
    * only strengthens: the per-occurrence form is embarrassingly
    * parallel with NO vocabulary-sized state anywhere, where the old
    * form shuffled the exploded corpus once more than necessary and
    * needed the SHJ hint to stop AQE broadcast-building the exploded
    * corpus side. */
  def signaturesFrom(
      g: DataFrame, k: Int = 32,
      hashPair: Column => Column = TextOps.hexHash60Pair): DataFrame = {
    require(k >= 1 && k <= 224,
      s"minhash k must be in [1, 224] (KM derivation stays inside signed 64-bit), got $k")
    val mod = 1L << 60
    g.select(col("id"), explode(col("grams")).as("gram"))
      .withColumn("hp", hashPair(col("gram")))
      // hp inlines into every h_i after projection collapse; codegen
      // subexpression elimination evaluates the digest once per row
      .select(col("id") +: (0 until k).map(i =>
        ((element_at(col("hp"), 1) +
          lit(i.toLong) * shiftright(element_at(col("hp"), 2), 5)) % mod).as(s"h$i")): _*)
      .groupBy(col("id"))
      .agg(min(col("h0")).as("h0"), (1 until k).map(i => min(col(s"h$i")).as(s"h$i")): _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      shingleN: Int = 3,
      hashPair: Column => Column = TextOps.hexHash60Pair): DataFrame = {
    val g = shingleTable(docs, idCol, textCol, shingleN)
    g.join(signaturesFrom(g, k, hashPair), "id")
  }

  /** (band, bkey, id) — one row per band per doc; bkey is the md5 of the
    * band's r signature values (1-based element_at, matching SQL). */
  def bandKeys(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .withColumn("bkey", md5(concat_ws(",",
        (1 to rows).map(j => element_at(col("sig"), col("band") * rows + j)): _*)))
      .select(col("band"), col("bkey"), col("id"))

  /** Distinct candidate pairs (id_a < id_b) sharing any band bucket.
    * Buckets wider than `maxBucketWidth` are skipped (see
    * [[oversizedBuckets]] for the audit view). Intended input is the
    * REPRESENTATIVE band table (post-[[contentGroups]]) — bucket width
    * then measures genuine near-dup diversity, not copy count. */
  def candidatePairs(banded: DataFrame, maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    val in =
      if (maxBucketWidth == Int.MaxValue) banded
      else {
        val ok = banded.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("w")).filter(col("w") <= maxBucketWidth)
          .select(col("band"), col("bkey"))
        banded.join(ok.hint("shuffle_hash"), Seq("band", "bkey"), "left_semi")
      }
    val a = in.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = in.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Audit view of buckets a `maxBucketWidth` cap would skip:
    * (band, bkey, width). Log or persist alongside the pair output so a
    * capped run is never a silent under-count. */
  def oversizedBuckets(banded: DataFrame, maxBucketWidth: Int): DataFrame =
    banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("width"))
      .filter(col("width") > maxBucketWidth)

  /** Shared pipeline: shingles, content groups, and verified
    * representative pairs (id_a < id_b, jaccard ≥ threshold; both ids
    * are representatives). The caches are deliberate: shingles feed the
    * signature pass AND both verify sides; groups feed the rep filter
    * and the expansion; band keys feed both self-join sides — exchange
    * reuse does not kick in across aliased branches, so without the
    * caches each branch recomputes the whole text-shredding pipeline. */
  private def repPipeline(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int,
      bands: Int,
      shingleN: Int,
      hashPair: Column => Column,
      maxBucketWidth: Int): (DataFrame, DataFrame) = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val g = shingleTable(docs, idCol, textCol, shingleN).cache()
    val groups = contentGroups(g).cache()
    val repsG = g.join(
      groups.filter(col("id") === col("rep")).select(col("id")),
      Seq("id"), "left_semi").cache()
    val sigs = signaturesFrom(repsG, k, hashPair)
    val banded = bandKeys(sigs, bands, k / bands).cache()
    val cands = candidatePairs(banded, maxBucketWidth)
    val ga = repsG.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val gb = repsG.select(col("id").as("id_b"), col("grams").as("grams_b"))
    val repPairs = cands.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (groups, repPairs)
  }

  /** End-to-end: ALL verified near-duplicate pairs with exact Jaccard ≥
    * threshold, (id_a < id_b, jaccard). Identical output to the naive
    * all-pairs form, but candidates are generated over distinct-content
    * representatives only; the expansion joins below are bounded by the
    * OUTPUT size. Note the pair-list contract is itself quadratic in
    * copy count (10⁶ copies of one document = 5·10¹¹ output rows) — at
    * that scale use [[nearDupEdges]] + [[ConnectedComponents]]. */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      hashPair: Column => Column = TextOps.hexHash60Pair,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    val (groups, repPairs) = repPipeline(
      docs, idCol, textCol, threshold, k, bands, shingleN, hashPair, maxBucketWidth)
    // members share their representative's shingle set exactly, so
    // cross-group pairs inherit the rep jaccard and within-group pairs
    // are exactly 1.0
    PairExpansion.expand(groups, repPairs, "jaccard", lit(1.0))
  }

  /** Scale-safe edge list for CLUSTERING: member→representative star
    * edges (linear in corpus size — a 10⁶-copy group contributes 10⁶-1
    * edges, not 5·10¹¹ pairs) plus verified representative pairs.
    * Connected components over these edges equal the components over the
    * full [[nearDuplicates]] pair list: within a group every member is
    * connected through its representative, and a cross-group member pair
    * (a, b) exists iff the corresponding representative pair does
    * (identical shingle sets ⇒ identical jaccard). Returns (src, dst). */
  def nearDupEdges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      hashPair: Column => Column = TextOps.hexHash60Pair,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    val (groups, repPairs) = repPipeline(
      docs, idCol, textCol, threshold, k, bands, shingleN, hashPair, maxBucketWidth)
    PairExpansion.edges(groups, repPairs)
  }

  /** Precomputed screening index over an EXISTING corpus, for
    * incremental batch-vs-corpus dedup ([[screenAgainst]]). Holds the
    * content groups (id → rep), the representatives' shingle sets, and
    * the representatives' band keys — everything a new batch needs to
    * be screened WITHOUT re-shingling, re-hashing, or re-banding the
    * corpus — plus the build parameters, so the batch side derives its
    * signatures with EXACTLY the family the band keys were cut from
    * (band keys are positional over the signature: a k or hash-family
    * mismatch would not error, it would silently never collide).
    * All three tables are rep-collapsed, so a boilerplate-heavy corpus
    * stores far below corpus size; persist them as tables and reload
    * per ingestion batch.
    *
    * [[buildIndex]] returns the three tables CACHED and materialized
    * (the corpus-sized intermediates are already released); callers own
    * the returned tables' lifetime — `unpersist()` them when the index
    * is retired, same contract as [[graft.operators.Similarity.kmeansCentroids]]. */
  final case class DedupIndex(
      groups: DataFrame, repGrams: DataFrame, repBands: DataFrame,
      k: Int, bands: Int, shingleN: Int, hashPair: Column => Column)

  /** Build the [[DedupIndex]] — the one-time (or per-compaction)
    * corpus-sized pass; every subsequent [[screenAgainst]] touches
    * only index tables and batch-sized work. Eager: the three index
    * tables are computed, cached, and materialized here, and the
    * corpus-sized shingle cache is released before returning — a
    * rebuild loop holds index-sized cache, never corpus-sized. */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      hashPair: Column => Column = TextOps.hexHash60Pair): DedupIndex = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val g = shingleTable(docs, idCol, textCol, shingleN).cache()
    try {
      val groups = contentGroups(g).cache()
      val repsG = g.join(
        groups.filter(col("id") === col("rep")).select(col("id")),
        Seq("id"), "left_semi").cache()
      val banded = bandKeys(signaturesFrom(repsG, k, hashPair), bands, k / bands)
        .cache()
      try {
        groups.count(); repsG.count(); banded.count()
      } catch { case e: Throwable =>
        groups.unpersist(); repsG.unpersist(); banded.unpersist()
        throw e
      }
      DedupIndex(groups, repsG, banded, k, bands, shingleN, hashPair)
    } finally g.unpersist()
  }

  /** Incremental near-duplicate screening: (batch_id, corpus_id,
    * jaccard) for every batch document whose exact Jaccard against a
    * band-colliding corpus document is ≥ threshold — the same answer a
    * full [[nearDuplicates]] recompute over corpus ∪ batch gives for
    * the cross pairs, without touching corpus text. Correctness of the
    * restriction-to-reps: a corpus member's shingle set IS its rep's,
    * so it collides with a batch doc iff the rep does and carries the
    * identical jaccard — the member expansion at the end is exact, not
    * approximate.
    *
    * Scale shape: batch-side shingle/sign/band work is ∝ batch; the
    * candidate join shuffles on (band, bkey) where a small batch side
    * lets AQE broadcast it against the rep band table; the two verify
    * joins are candidate-bounded; the member expansion is
    * output-bounded. The corpus-sized pass happened once in
    * [[buildIndex]] — screening N daily batches costs N·batch, not
    * N·corpus, which is the entire point at 100 TB. The batch derives
    * its signatures with the INDEX's recorded k/bands/shingleN/
    * hashPair — band keys are positional over the signature, so a
    * mismatched family would not error, it would silently never
    * collide; recording the parameters in the index removes the
    * footgun entirely.
    *
    * The batch shingle table is deliberately NOT cached: it feeds two
    * join branches (band keys + verify), so uncached it is shingled
    * twice per action — batch-sized work — while a cache inside a
    * function that returns a lazy DataFrame has no owner and would
    * leak one CacheManager entry per micro-batch on a stream. */
  def screenAgainst(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DedupIndex,
      threshold: Double): DataFrame = {
    import index.{k, bands, shingleN, hashPair}
    val bg = shingleTable(batch, idCol, textCol, shingleN)
    val bBands = bandKeys(signaturesFrom(bg, k, hashPair), bands, k / bands)
    val cands = bBands.select(col("band"), col("bkey"), col("id").as("batch_id"))
      .join(index.repBands.select(col("band"), col("bkey"), col("id").as("rep")),
        Seq("band", "bkey"))
      .select(col("batch_id"), col("rep"))
      .distinct()
    val verified = cands
      .join(bg.select(col("id").as("batch_id"), col("grams").as("grams_b")), "batch_id")
      .join(index.repGrams.select(col("id").as("rep"), col("grams").as("grams_r")), "rep")
      .withColumn("jaccard", TextOps.jaccard(col("grams_b"), col("grams_r")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("rep"), col("jaccard"))
    verified
      .join(index.groups.select(col("rep"), col("id").as("corpus_id")), "rep")
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** (id, comp) dedup clusters, end-to-end — the sharpest clustering
    * shape: the iterative connected-components pass runs ONLY on the
    * verified representative-pair graph (|pairs| edges — orders of
    * magnitude below corpus size), never on the member star edges. A
    * member's label is fully determined by its representative's label
    * (identical content ⇒ identical connectivity), so after the tiny
    * iteration one corpus-sized join labels every member:
    * comp(doc) = comp(rep(doc)), defaulting to rep(doc) for
    * representatives untouched by any cross-group pair. Output covers
    * exactly the docs with at least one near-duplicate (members of
    * multi-member groups — their exact copies — and docs in verified
    * pairs), matching the components of the full [[nearDuplicates]]
    * pair list. Compared to components-over-[[nearDupEdges]], every
    * per-round shuffle drops from corpus-sized to pair-graph-sized;
    * the corpus is touched by exactly one extra join. */
  def nearDupClusters(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      hashPair: Column => Column = TextOps.hexHash60Pair,
      maxBucketWidth: Int = Int.MaxValue,
      maxIter: Int = 30): DataFrame = {
    val (groups, repPairs) = repPipeline(
      docs, idCol, textCol, threshold, k, bands, shingleN, hashPair, maxBucketWidth)
    val repComps = ConnectedComponents.components(
      repPairs.select(col("id_a").as("src"), col("id_b").as("dst")), maxIter)
    // reps with ≥2 members: every member has an exact-copy partner.
    // Hint-free (r16 optimization pass): multi and repComps are both
    // aggregate/pair-graph-sized, so AQE broadcasts them and the
    // corpus-sized groups table streams through the two labeling
    // joins with ZERO exchanges of its own (the forced shuffle-hash
    // moved all of groups through an exchange to meet a list orders
    // of magnitude smaller; interleaved A/B at sf0.1: d6 min
    // 5.11 s → 3.95 s). A blown-up rep set falls back to shuffled
    // joins by AQE's size check — the 100 TB-safe behavior.
    val multi = groups.filter(col("id") =!= col("rep"))
      .select(col("rep")).distinct().withColumn("has_copies", lit(1))
    groups
      .join(multi, Seq("rep"), "left")
      .join(repComps.select(col("id").as("rep"), col("comp")), Seq("rep"), "left")
      .filter(col("has_copies").isNotNull || col("comp").isNotNull)
      .select(col("id"), coalesce(col("comp"), col("rep")).as("comp"))
  }
}
