package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature hashing ("the hashing trick", Weinberger et al. 2009):
  * embed text into a fixed `dim`-dimensional vector with NO vocabulary
  * — each token is routed to bucket `h1(token) % dim` carrying sign
  * `±1` from an independent hash bit, buckets accumulate signed
  * counts, and the vector is l2-normalized. The signed sum makes the
  * estimator unbiased (collisions cancel in expectation), and the
  * absence of a vocabulary is the point at 100 TB: unlike TF-IDF
  * ([[TfIdf]]) there is no corpus-wide dictionary to build, broadcast,
  * or keep consistent between batches — a new document embeds
  * identically whether the corpus holds ten rows or ten trillion,
  * which also makes the output stable under incremental loads (same
  * property as [[Sampling.weightedMixture]]).
  *
  * Both hashes come from ONE md5 digest per token
  * ([[TextOps.hexHash60Pair]]): bucket from the first 60-bit half,
  * sign from the second, so the engine-portable hash budget stays one
  * digest per token and DuckDB can mirror every value.
  *
  * All arithmetic until the final normalize is integer (signed counts,
  * exact Σc² over at most `dim` values); the divide-by-sqrt is two
  * correctly-rounded IEEE ops — bit-reproducible across engines and
  * partitionings.
  *
  * Scale shape: tokenize/hash is per-row (rebalanced first, same
  * rationale as [[TextOps.shingleTable]]); counts are one map-side-
  * combinable (id, bucket) aggregate; the norm is a per-id window over
  * ≤ dim rows. Nothing global, no vocabulary join, no driver state.
  */
object FeatureHashing {

  /** Signed bucket counts: (id, bucket, c) with c = Σ ±1 over the
    * document's tokens landing in the bucket; exact-zero buckets
    * (fully cancelled) are dropped — they are true zero components.
    * Empty text tokenizes to the single empty token (one bucket);
    * NULL text explodes to no tokens at all, so a null-text document
    * has no rows here — callers needing the null == empty convention
    * coalesce upstream. */
  def signedCounts(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2, s"need dim >= 2, got $dim")
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs
      .select(col(idCol).as("id"), col(textCol))
      .repartition(p)
      .select(col("id"), explode(TextOps.words(col(textCol))).as("word"))
      .select(col("id"), TextOps.hexHash60Pair(col("word")).as("hp"))
      .select(col("id"),
        (element_at(col("hp"), 1) % dim).as("bucket"),
        when(element_at(col("hp"), 2) % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("s")).as("c"))
      .filter(col("c") =!= 0)
  }

  /** l2-normalized sparse form: (id, bucket, c, weight) with weight =
    * c / ‖c‖₂ over the document's non-zero buckets. Documents whose
    * every bucket cancelled have no rows (a zero vector has no
    * direction — same convention as [[Similarity]]'s zero-norm
    * exclusion). */
  def hashedTable(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val c = signedCounts(docs, idCol, textCol, dim)
    val norm = sqrt(sum(col("c") * col("c")).over(Window.partitionBy(col("id")))
      .cast("double"))
    c.withColumn("weight", col("c") / norm)
  }

  /** Dense vector face for the ANN/dedup family: (id, vec) with vec a
    * `dim`-length array<double> (zeros filled in), ready for
    * [[Similarity.knnBruteForce]] / [[Similarity.ivfTopKWith]] /
    * [[Embeddings]]. Per-row pivot of ≤ dim entries — one extra
    * map-side-combinable aggregate, no join. */
  def hashedVectors(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    hashedTable(docs, idCol, textCol, dim)
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("weight")))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0.0d))).as("vec"))
}
