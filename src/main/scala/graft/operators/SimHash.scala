package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (LLM-pipeline op).
  *
  * A 60-bit simhash per document: each distinct shingle contributes
  * +1/−1 to every bit position of its 60-bit hash; the sign of each
  * positional sum is the output bit. Documents within Hamming distance d
  * are near-duplicates.
  *
  * Scale design: one explode to (doc, shingle) → one hash → one groupBy
  * with 60 conditional sums (single shuffle, map-side partial agg).
  * Pair search uses the pigeonhole property: for d ≤ 3, two simhashes
  * within distance 3 must agree on at least one of 4 15-bit chunks, so
  * candidates come from a join on (chunk_index, chunk_value) — never the
  * O(n²) pair space — and are then verified with bit_count(a^b).
  */
object SimHash {

  val Bits = 60
  val Chunks = 4
  val ChunkBits: Int = Bits / Chunks // 15

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
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce[Column](_ + _)
    val ex = TextOps.shingleTable(docs, idCol, textCol, shingleN)
      .select(col("id"), explode(col("grams")).as("gram"))
    // hash the distinct-gram vocabulary once, join back (same values as
    // hashing every occurrence, ~repetition-factor less md5 work).
    // Same join shape as MinHashLSH.signaturesFrom: explicit
    // repartition pins the hash projection's parallelism against AQE
    // small-shuffle coalescing, and the shuffle-hash hint stops AQE
    // from broadcast-building the exploded-corpus side.
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val vocab = ex.select(col("gram")).distinct()
      .repartition(p, col("gram"))
      .withColumn("h", TextOps.hexHash60(col("gram")))
    ex.join(vocab.hint("shuffle_hash"), "gram")
      .groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"), simhash.as("simhash"))
  }

  /** Pairs within Hamming distance `maxDist` (≤ 3 for exactness with 4
    * chunks). Returns (id_a, id_b, hamming). */
  def nearPairs(sims0: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < Chunks, s"pigeonhole needs maxDist < $Chunks chunks")
    val sims = sims0.cache() // read three times (chunks + both join sides)
    val chunks = sims.select(
      col("id"), col("simhash"),
      explode(sequence(lit(0), lit(Chunks - 1))).as("c"))
      .withColumn("ck",
        expr(s"shiftright(simhash, c * $ChunkBits) & ${(1 << ChunkBits) - 1}"))
    val a = chunks.select(col("c"), col("ck"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunks.select(col("c"), col("ck"), col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("c", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
