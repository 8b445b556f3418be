package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination — the 100 TB scale path for
  * [[Contamination]].
  *
  * [[Contamination.overlap]] broadcasts the benchmark's distinct gram
  * STRINGS and semi-joins the exploded corpus against them. That is the
  * right plan while the eval set is thousands of documents, but a
  * production decontamination pass screens against MANY benchmarks at
  * once, and tens of millions of distinct 13-grams no longer broadcast
  * as strings. A Bloom filter over the gram set is KB-to-MB (hard cap
  * 32 MB stored — beyond that, shard the benchmark set; an embedded
  * literal ships with every probe-stage task binary): the corpus side
  * then needs NO join at all — each gram is
  * one md5 plus k bit-probes against a plan-literal bit array, fully
  * inside whole-stage codegen, and the only shuffle left is the final
  * per-document count. One-sided error: a set gram always probes true
  * (no false negatives — nothing contaminated is missed); a clean gram
  * probes true with probability ≈ (1-e^(-kn/m))^k, so flagged documents
  * are a small superset to re-check exactly (or drop outright).
  *
  * Everything is deterministic and engine-portable: positions come from
  * the same Kirsch-Mitzenmacher family as the minhash signatures
  * (h_i = h1 + i·(h2 div 32) mod m over one md5 digest,
  * [[TextOps.hexHash60Pair]]), and words hold 32 bits each so no mirror
  * ever shifts into a BIGINT sign bit (DuckDB raises on `1::BIGINT <<
  * 63`-style overflow). The DuckDB oracle rebuilds the identical filter
  * in SQL, so even the false positives match bit-for-bit.
  */
object BloomContamination {

  /** Probes per gram. i·(h2 div 32) ≤ 3·2⁵⁵ keeps h1 + i·h2d < 2⁶¹ —
    * overflow-free in both engines' signed 64-bit arithmetic. */
  val HashK = 4

  /** Bits per filter word: 32-in-64 so `1L << bit` never reaches the
    * sign bit and the mirror's `1::BIGINT << CAST(pos % 32 AS INT)`
    * stays in range. */
  private val WordBits = 32

  /** Smallest power-of-two bit count giving ≤ `fpp` false-positive
    * probability for `n` distinct grams at [[HashK]] probes:
    * fpp ≈ (1 − e^(−k·n/m))^k, solved for m and rounded up. Sizing is a
    * driver-side scalar — callers typically know n only approximately
    * (an HLL count of the benchmark grams is plenty; overshooting m
    * costs bytes, undershooting costs re-check work, never recall). */
  def bitsFor(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n > 0, 0 < fpp < 1; got n=$n fpp=$fpp")
    val perProbe = math.pow(fpp, 1.0 / HashK) // target per-probe load
    val m = -HashK * n / math.log1p(-perProbe)
    // cap where plan-literal embedding stays sane: 2^27 bits = 32 MB
    // stored (32-in-64) — the literal ships inside every probe stage's
    // task binary, so a quarter-GB filter belongs in shards (or a
    // broadcast-variable design), not one literal
    require(m <= (1L << 27).toDouble,
      s"filter for n=$n at fpp=$fpp needs ${m.toLong} bits (> 32 MB " +
        "stored at 32 bits per long word — too large to embed as a " +
        "plan literal) — raise fpp or shard the benchmark set")
    math.max(WordBits, Integer.highestOneBit(math.ceil(m).toInt - 1) << 1)
  }

  /** Dense filter words (`mBits/32` longs, each holding 32 bits) over
    * the benchmark's distinct `n`-grams. Distributed build: grams are
    * hashed and OR-folded per word index executor-side; the driver
    * collects only the ≤ mBits/32 aggregated words (filter-sized, not
    * data-sized — same contract as Spark's own stat.bloomFilter).
    * `mBits` must be a power of two. */
  def buildBits(bench: DataFrame, textCol: String, n: Int, mBits: Int): Array[Long] = {
    require(mBits >= WordBits && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= $WordBits, got $mBits")
    val withHashes = bench
      .select(explode(TextOps.shingles(col(textCol), n)).as("gram"))
      .distinct()
      .select(TextOps.hexHash60Pair(col("gram")).as("hp"))
      .select(col("hp")(0).as("h1"), expr("hp[1] div 32").as("h2d"))
    val words = withHashes
      .select(explode(array((0 until HashK).map(i =>
        (col("h1") + lit(i.toLong) * col("h2d")) % lit(mBits.toLong)): _*)).as("pos"))
      .select(shiftright(col("pos"), 5).as("wi"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(31L)).cast("int")).as("mask"))
      .groupBy(col("wi")).agg(expr("bit_or(mask)").as("word"))
      .collect()
    val bits = new Array[Long](mBits / WordBits)
    words.foreach(r => bits(r.getLong(0).toInt) = r.getLong(1))
    bits
  }

  /** (id, n_maybe): corpus documents with ≥ 1 distinct `n`-gram probing
    * positive, with the count of such grams. No false negatives; false
    * positives are deterministic (and oracle-mirrored). The filter rides
    * into the plan as a literal array — zero joins corpus-side. The
    * corpus goes through [[TextOps.shingleTable]], which rebalances raw
    * (id, text) rows before the CPU-heavy shingle+md5 projection — a
    * few-files corpus would otherwise probe on only as many cores as
    * the scan has partitions. */
  def flagged(
      corpus: DataFrame, idCol: String, textCol: String,
      n: Int, bits: Array[Long]): DataFrame = {
    val mBits = bits.length.toLong * WordBits
    val bitsLit = typedlit(bits.toSeq)
    def probe(h1: Column, h2d: Column, i: Int): Column = {
      val pos = (h1 + lit(i.toLong) * h2d) % lit(mBits)
      val word = element_at(bitsLit, (shiftright(pos, 5) + 1).cast("int"))
      val mask = call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(31L)).cast("int"))
      word.bitwiseAND(mask) =!= 0
    }
    TextOps.shingleTable(corpus, idCol, textCol, n)
      .select(col("id"), explode(col("grams")).as("gram"))
      .select(col("id"), TextOps.hexHash60Pair(col("gram")).as("hp"))
      .select(col("id"), col("hp")(0).as("h1"), expr("hp[1] div 32").as("h2d"))
      .filter((0 until HashK).map(probe(col("h1"), col("h2d"), _)).reduce(_ && _))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_maybe"))
  }
}
