package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing for training-data pipelines:
  * L2 normalization and deterministic int8 quantization.
  *
  * Everything is a per-row Catalyst expression (no UDF, no shuffle),
  * so these run inside whole-stage codegen and scale linearly. The
  * quantizer uses floor(x·127 + 0.5) — explicit round-half-up — instead
  * of engine-native round(), whose half-way tie rule differs across
  * engines; with the explicit form the quantized vectors are
  * bit-identical everywhere.
  */
object Embeddings {

  /** L2 norm of a float/double array column (fold-ordered, portable). */
  def l2Norm(v: Column): Column = sqrt(Similarity.norm2(v.cast("array<double>")))

  /** Array scaled to unit L2 norm (the zero vector passes through
    * unchanged). The norm is bound ONCE as a lambda variable via a
    * single-element transform: Catalyst subexpression elimination does
    * not descend into lambdas, so capturing the norm column directly in
    * the per-element lambda would recompute the O(dim) dot product for
    * every element (O(dim²) per row). */
  def normalize(v: Column): Column = {
    val d = v.cast("array<double>")
    val n = sqrt(Similarity.norm2(d))
    when(n === 0.0, d).otherwise(element_at(
      transform(array(n), nn => transform(d, x => x / nn)), 1))
  }

  /** int8 symmetric quantization of the unit-normalized vector:
    * q_i = floor(x_i / ‖x‖ · 127 + 0.5), values in [-127, 127]. The
    * zero vector quantizes to all zeros — without the guard the 0/0
    * division yields NaN, which a non-ANSI int cast silently turns into
    * 0 here while an oracle engine errors or diverges. Same
    * once-bound-norm shape as [[normalize]]. */
  def quantize(v: Column): Column = {
    val d = v.cast("array<double>")
    val n = sqrt(Similarity.norm2(d))
    when(n === 0.0, transform(d, _ => lit(0)))
      .otherwise(element_at(
        transform(array(n), nn =>
          transform(d, x => floor(x / nn * 127.0 + lit(0.5)).cast("int"))), 1))
  }

  /** One Lloyd (k-means) iteration in quantized space: assign every
    * vector to its nearest current centroid (IVF lists via
    * [[Similarity.ivfAssign]]), then emit the new centroid of each list
    * as per-dimension means of the int8-quantized members.
    *
    * Integer sums are exact, so the means are partition-order
    * independent without any decimal routing. Output is long-form
    * (list_id, pos, centroid_val) — one row per centroid dimension —
    * which shuffles once on (list_id, pos) with map-side combine; the
    * array form is a collect_list away when needed.
    */
  def quantizedKMeansStep(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, centroidRem: Int): DataFrame = {
    val assigned = Similarity
      .ivfAssign(corpus, idCol, vecCol, centroidMod, centroidRem)
      .select(col("list_id"), quantize(col("v")).as("q"))
    assigned
      .select(col("list_id"), posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy(col("list_id"), col("pos"))
      .agg((sum(col("qv")).cast("double") / count(lit(1))).as("centroid_val"))
  }
}
