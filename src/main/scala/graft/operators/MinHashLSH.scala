package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (LLM-pipeline op).
  *
  * Pipeline: shingle → K minhashes → b bands of r rows → band-bucket
  * join → exact-Jaccard verification of candidates.
  *
  * Scale design: signatures are pure per-row expressions (shingle set and
  * K array_min(transform(...)) in one projection — NO shuffle, NO
  * explode); the only shuffles are (a) the band-bucket self-join, whose
  * input is b rows × docs of (band, key, id) — tiny relative to the
  * corpus — and (b) two joins to fetch shingle sets for the candidate
  * pairs, which are broadcast-able when candidates are rare (the normal
  * case). Nothing ever materializes the O(n²) pair space.
  *
  * The default hasher is the portable md5-based [[TextOps.hexHash60]] so
  * results are oracle-checkable cross-engine; production can pass
  * [[TextOps.fastHash64]] for ~5× cheaper signatures.
  */
object MinHashLSH {

  /** (id, grams, sig) per document; sig is array<long> of length k.
    *
    * Signatures hash the *distinct-gram vocabulary* once (k hashes per
    * distinct shingle, then a join back and k min-aggregates), rather
    * than k hashes per (doc, gram) occurrence: corpora repeat shingles
    * heavily, so this cuts hash work by the repetition factor (~8× on
    * the testdata) and scales with vocabulary, not corpus size. Values
    * are identical to the naive per-row form. */
  /** (id, grams) shingle table — the expensive text-shredding pass;
    * callers that consume it repeatedly should cache it. */
  /** (id, grams) shingle table — see [[TextOps.shingleTable]]. */
  def shingleTable(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame =
    TextOps.shingleTable(docs, idCol, textCol, shingleN)

  /** (id, sig) from a shingle table.
    *
    * Join shape matters here. The hashed vocabulary is (a) explicitly
    * repartitioned to the session shuffle parallelism BEFORE the k hash
    * expressions — the distinct gram list is tiny in bytes, so AQE
    * would otherwise coalesce its shuffle to one partition and the k-
    * md5s-per-gram projection would run on one core — and (b) joined
    * back with a shuffle-hash hint: left to its own devices AQE
    * broadcast-joins by building the EXPLODED CORPUS side (it looks
    * small by bytes), a driver-side serial build that dwarfs the real
    * work (measured 5×). The SHJ keeps both sides shuffled on gram,
    * which is also the only shape that survives a vocabulary too large
    * to broadcast — the 100 TB case. */
  def signaturesFrom(
      g: DataFrame, k: Int = 32,
      hashFn: (Int, Column) => Column = TextOps.hexHash60): DataFrame = {
    val p = g.sparkSession.sessionState.conf.numShufflePartitions
    val ex = g.select(col("id"), explode(col("grams")).as("gram"))
    val vocab = ex.select(col("gram")).distinct()
      .repartition(p, col("gram"))
      .select(col("gram") +: (0 until k).map(i => hashFn(i, col("gram")).as(s"h$i")): _*)
    ex.join(vocab.hint("shuffle_hash"), "gram")
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
      hashFn: (Int, Column) => Column = TextOps.hexHash60): DataFrame = {
    val g = shingleTable(docs, idCol, textCol, shingleN)
    g.join(signaturesFrom(g, k, hashFn), "id")
  }

  /** (band, bkey, id) — one row per band per doc; bkey is the md5 of the
    * band's r signature values (1-based element_at, matching SQL). */
  def bandKeys(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .withColumn("bkey", md5(concat_ws(",",
        (1 to rows).map(j => element_at(col("sig"), col("band") * rows + j)): _*)))
      .select(col("band"), col("bkey"), col("id"))

  /** Distinct candidate pairs (id_a < id_b) sharing any band bucket. */
  def candidatePairs(banded: DataFrame): DataFrame = {
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** End-to-end: verified near-duplicate pairs with exact Jaccard ≥
    * threshold. Returns (id_a, id_b, jaccard). */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      hashFn: (Int, Column) => Column = TextOps.hexHash60): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    // cache the two small, multiply-traversed tables (shingles feed the
    // signature pass AND both verify sides; band keys feed both self-
    // join sides — exchange reuse does not kick in across the aliased
    // branches, so without these caches each branch recomputes the
    // whole upstream text-shredding pipeline)
    val g = shingleTable(docs, idCol, textCol, shingleN).cache()
    val sigs = signaturesFrom(g, k, hashFn)
    val banded = bandKeys(sigs, bands, k / bands).cache()
    val cands = candidatePairs(banded)
    val ga = g.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val gb = g.select(col("id").as("id_b"), col("grams").as("grams_b"))
    cands.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
