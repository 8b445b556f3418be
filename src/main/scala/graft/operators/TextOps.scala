package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-shredding expressions for the dedup/text-analysis family.
  *
  * Everything here is a pure Catalyst expression (no UDF, no shuffle):
  * tokenization, word n-grams, and a portable 60-bit hash. Per-row cost
  * scales linearly and runs inside whole-stage codegen, so these ops are
  * embarrassingly parallel at any data size.
  */
object TextOps {

  /** Lowercased whitespace tokens. */
  def words(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Word n-grams as space-joined strings; empty array if < n words.
    *
    * The tokenized array is bound ONCE as a lambda variable (via a
    * single-element transform) before the n-gram lambda indexes it:
    * Catalyst's subexpression elimination does not descend into lambda
    * functions, so referencing `words(text)` directly inside the n-gram
    * lambda would re-run the regex split for every element access
    * (O(words × n) splits per row — measured ~20× slower at sf0.1). */
  def wordNGrams(text: Column, n: Int): Column =
    element_at(
      transform(array(words(text)), w =>
        when(size(w) >= n,
          transform(sequence(lit(0), size(w) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Distinct word n-grams (shingle set) — the native one-pass
    * [[graft.plans.WordShingles]], value-identical to
    * `array_distinct(wordNGrams(text, n))` (equivalence property-tested
    * in WordShinglesSpec) without the five per-row array
    * materializations of the builtin chain. The hottest path of the
    * dedup family: d2/d3/d4/d6 all shingle the corpus first. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.plans.WordShingles(text, n)

  /** (id, grams) shingle table, rebalanced to the session shuffle
    * parallelism BEFORE the CPU-heavy tokenize/shingle projection: a
    * document corpus often arrives as few large (or few small) files,
    * and a scan-partitioned plan would shred text on only that many
    * cores. The shuffle moves raw (id, text) rows — cheap relative to
    * the per-row regex/n-gram work it parallelizes. */
  def shingleTable(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs
      .select(col(idCol).as("id"), col(textCol))
      .repartition(p)
      .select(col("id"), shingles(col(textCol), shingleN).as("grams"))
      .filter(size(col("grams")) > 0)
  }

  /** Portable 60-bit hash: first 15 hex chars of md5 as a non-negative
    * long. md5 is identical across engines (and in DuckDB:
    * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`), which makes
    * every hash-derived operator oracle-checkable. Backed by the native
    * [[graft.plans.HexHash60]] expression (thread-local digest, no hex
    * round-trip — same value, ~3× less per-call overhead). Production
    * callers that don't need cross-engine parity can swap in
    * [[fastHash64]]. */
  def hexHash60(c: Column): Column = graft.plans.HexHash60(c)

  /** Seeded variant: h_i(s) = hexHash60(i || ':' || s). */
  def hexHash60(seed: Int, c: Column): Column =
    hexHash60(concat(lit(s"$seed:"), c))

  /** Two independent 60-bit hashes from ONE md5 digest (hex chars 1-15
    * and 17-31) as `array<bigint>[2]` — the base pair for the
    * Kirsch-Mitzenmacher derived hash family in minhash signatures.
    * DuckDB mirror of the halves: `substr(md5(x),1,15)` /
    * `substr(md5(x),17,15)` via the usual '0x' BIGINT cast. */
  def hexHash60Pair(c: Column): Column = graft.plans.HexHash60Pair(c)

  /** Fast non-portable base pair (xxhash64, codegen'd, no md5 cost);
    * masked to 60 bits so the same overflow-safe derivation applies. */
  def fastHashPair(c: Column): Column = {
    val mask = (1L << 60) - 1
    array(xxhash64(lit(1), c).bitwiseAND(mask), xxhash64(lit(2), c).bitwiseAND(mask))
  }

  /** Portable SIGNED 64-bit hash: first 8 md5 bytes big-endian (= first
    * 16 hex chars wrapped to two's complement). DuckDB mirror documented
    * at [[graft.plans.HexHash60.hash64]]. */
  def hexHash64(c: Column): Column = graft.plans.HexHash64(c)

  /** Fast non-portable alternative (xxhash64, codegen'd, no md5 cost). */
  def fastHash64(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** Jaccard similarity of two (distinct-element) arrays, computed as
    * |A∩B| / (|A|+|B|-|A∩B|) in a fixed expression order. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }
}
