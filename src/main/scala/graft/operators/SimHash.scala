package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (LLM-pipeline op).
  *
  * A 64-bit simhash per document: each distinct shingle contributes
  * +1/−1 to every bit position of its 64-bit hash; the sign of each
  * positional sum is the output bit. Documents within Hamming distance d
  * are near-duplicates.
  *
  * Scale design:
  *  - Fingerprints: one explode to (doc, shingle) → one hash → one
  *    groupBy with 64 conditional sums (single shuffle, map-side partial
  *    agg). SimHash needs ONE hash per gram, so the vocabulary-dedup
  *    join that pays for MinHash's k=32 hashes costs more than it saves
  *    here (an extra shuffle + join to avoid ~8× less md5 work) —
  *    hashing per occurrence keeps the plan at a single exchange.
  *  - 64 bits / 4×16-bit chunks: 16-bit chunk keys give 65 536 buckets
  *    per chunk; the previous 60-bit/15-bit layout saturated by
  *    pigeonhole at ~10⁵ documents.
  *  - Pair search groups documents by simhash VALUE first — Hamming
  *    distance depends only on the value, so a boilerplate corpus with
  *    10⁶ identical copies contributes ONE row per chunk bucket instead
  *    of 10⁶ (the within-bucket self-join would otherwise materialize
  *    ~10¹² pairs from a single bucket). Verified value pairs are
  *    expanded back to member pairs with output-bounded joins, exactly
  *    as [[MinHashLSH.nearDuplicates]] does for shingle-set groups.
  *
  * The hash is the portable md5-derived [[TextOps.hexHash64]], so values
  * and pairs stay bit-checkable against DuckDB (signed two's-complement
  * arithmetic mirrors documented at [[graft.plans.HexHash60.hash64]];
  * bit 63's contribution is the Long.MinValue summand, avoiding 64-bit
  * shifts that DuckDB rejects).
  */
object SimHash {

  val Bits = 64
  val Chunks = 4
  val ChunkBits: Int = Bits / Chunks // 16

  /** Two's-complement contribution of bit `b` (bit 63 ⇒ Long.MinValue):
    * simhash = Σ_b set(b) · bitValue(b) stays in signed-64 range with no
    * 64-bit shift on either engine. */
  def bitValue(b: Int): Long = 1L << b // 1L << 63 == Long.MinValue

  /** (id, simhash) per document. */
  def simhashes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sums = (0 until Bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val simhash = (0 until Bits)
      .map(b => when(col(s"s$b") > 0, lit(bitValue(b))).otherwise(0L))
      .reduce[Column](_ + _)
    TextOps.shingleTable(docs, idCol, textCol, shingleN)
      .select(col("id"), explode(col("grams")).as("gram"))
      .withColumn("h", TextOps.hexHash64(col("gram")))
      .groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"), simhash.as("simhash"))
  }

  /** (simhash, rep) — one representative (min id) per distinct simhash
    * value, plus the (id, rep) membership map. */
  private def valueGroups(sims: DataFrame): (DataFrame, DataFrame) = {
    val reps = sims.groupBy(col("simhash")).agg(min(col("id")).as("rep"))
    val members = sims.join(reps.hint("shuffle_hash"), "simhash")
      .select(col("id"), col("rep"))
    (reps, members)
  }

  /** (id, simhash, c, ck) chunk table over representatives. */
  private def chunkTable(reps: DataFrame): DataFrame =
    reps.select(
      col("rep").as("id"), col("simhash"),
      explode(sequence(lit(0), lit(Chunks - 1))).as("c"))
      .withColumn("ck",
        expr(s"shiftright(simhash, c * $ChunkBits) & ${(1 << ChunkBits) - 1}"))

  /** Verified pairs among distinct simhash VALUES: (id_a, id_b, hamming)
    * with both ids representatives and 1 ≤ hamming ≤ maxDist. Pigeonhole:
    * within distance maxDist < Chunks, two hashes must agree on at least
    * one 16-bit chunk, so candidates come from a join on (chunk index,
    * chunk value) — never the O(n²) pair space.
    *
    * Residual quadratic risk (same as [[MinHashLSH.candidatePairs]]):
    * there are only 2¹⁶ buckets per chunk, so a corpus with ≫2¹⁶
    * DISTINCT values necessarily has wide buckets. `maxBucketWidth`
    * skips buckets wider than the cap; [[oversizedChunkBuckets]] is the
    * audit view — a capped run is never a silent under-count. */
  private def repPairs(
      reps: DataFrame, maxDist: Int,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    val chunks0 = chunkTable(reps)
    val chunks =
      if (maxBucketWidth == Int.MaxValue) chunks0
      else {
        val ok = chunks0.groupBy(col("c"), col("ck"))
          .agg(count(lit(1)).as("w")).filter(col("w") <= maxBucketWidth)
          .select(col("c"), col("ck"))
        chunks0.join(ok.hint("shuffle_hash"), Seq("c", "ck"), "left_semi")
      }
    val a = chunks.select(col("c"), col("ck"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunks.select(col("c"), col("ck"), col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("c", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Audit view of chunk buckets a `maxBucketWidth` cap would skip:
    * (c, ck, width) over the distinct-value representatives. */
  def oversizedChunkBuckets(sims: DataFrame, maxBucketWidth: Int): DataFrame =
    chunkTable(sims.groupBy(col("simhash")).agg(min(col("id")).as("rep")))
      .groupBy(col("c"), col("ck"))
      .agg(count(lit(1)).as("width"))
      .filter(col("width") > maxBucketWidth)

  /** ALL pairs within Hamming distance `maxDist` (≤ 3 for exactness with
    * 4 chunks). Returns (id_a, id_b, hamming). Output-identical to the
    * naive within-bucket self-join, but the candidate space is bounded
    * by distinct VALUES: equal-value members expand as hamming-0 pairs,
    * cross-value pairs inherit their representatives' hamming. The pair
    * list is itself quadratic in copy count — clustering pipelines
    * should use [[nearEdges]] instead. */
  def nearPairs(
      sims0: DataFrame, maxDist: Int = 3,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    require(maxDist < Chunks, s"pigeonhole needs maxDist < $Chunks chunks")
    val sims = sims0.cache()
    val (reps, members0) = valueGroups(sims)
    val members = members0.cache()
    // equal-value members expand as hamming-0 pairs; cross-value pairs
    // inherit their representatives' hamming
    PairExpansion.expand(members, repPairs(reps, maxDist, maxBucketWidth),
      "hamming", lit(0))
  }

  /** Scale-safe edge list for CLUSTERING: member→representative star
    * edges plus verified representative pairs — linear in corpus size;
    * connected components equal those of the full [[nearPairs]] list.
    * Returns (src, dst). */
  def nearEdges(
      sims0: DataFrame, maxDist: Int = 3,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    require(maxDist < Chunks, s"pigeonhole needs maxDist < $Chunks chunks")
    val sims = sims0.cache()
    val (reps, members) = valueGroups(sims)
    PairExpansion.edges(members, repPairs(reps, maxDist, maxBucketWidth))
  }

  /** (id, comp) dedup clusters — the [[MinHashLSH.nearDupClusters]]
    * shape for simhash: the iterative connected-components pass runs
    * only on the verified representative-pair graph (distinct simhash
    * values within maxDist — orders of magnitude below corpus size);
    * members take their representative's label through one corpus-sized
    * join. Output covers exactly the docs with at least one near-dup
    * (equal-value copies or a within-distance value pair); components
    * equal those of the full [[nearPairs]] list. */
  def nearDupClusters(
      sims0: DataFrame, maxDist: Int = 3, maxIter: Int = 30,
      maxBucketWidth: Int = Int.MaxValue): DataFrame = {
    require(maxDist < Chunks, s"pigeonhole needs maxDist < $Chunks chunks")
    val sims = sims0.cache()
    val (reps, members) = valueGroups(sims)
    val repComps = ConnectedComponents.components(
      repPairs(reps, maxDist, maxBucketWidth)
        .select(col("id_a").as("src"), col("id_b").as("dst")),
      maxIter)
    // hint-free labeling joins (r16): see MinHashLSH.nearDupClusters —
    // AQE broadcasts the small sides, members never shuffles
    val multi = members.filter(col("id") =!= col("rep"))
      .select(col("rep")).distinct().withColumn("has_copies", lit(1))
    members
      .join(multi, Seq("rep"), "left")
      .join(repComps.select(col("id").as("rep"), col("comp")), Seq("rep"), "left")
      .filter(col("has_copies").isNotNull || col("comp").isNotNull)
      .select(col("id"), coalesce(col("comp"), col("rep")).as("comp"))
  }
}
