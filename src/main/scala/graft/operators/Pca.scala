package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA of the embedding corpus — top principal component
  * via the classical two-phase shape: ONE distributed pass computes
  * exact second moments, then the driver runs power iteration on the
  * d×d covariance (d²-bounded state, the same driver-footprint class
  * as [[LinearClassifier]]'s weight vector and
  * [[Similarity.kmeansCentroids]]' centroid table). Training-data
  * pipelines use this for embedding whitening, drift monitoring, and
  * as the projection axis for spread-based subset selection.
  *
  * Exactness discipline: vectors are int8-quantized unit vectors
  * ([[Embeddings.quantize]], the e1-proven portable path), so every
  * moment is an INTEGER sum — partition-order free. The augmented
  * vector qa = [1, q₁…q_d] folds count, sums, and products into one
  * moment matrix: s(0,0) = n, s(0,j) = Σq_j, s(i,j) = Σq_iq_j — one
  * aggregate instead of three. Covariance entries and the iteration
  * itself are fixed-order IEEE double ops on exactly-representable
  * integers (exact while n·127² < 2⁵³, i.e. n ≲ 5×10¹¹ rows —
  * enforced loudly), so DuckDB replays the whole computation
  * bit-for-bit as chained CTEs.
  *
  * Scale shape: the corpus pass emits (dim+1)(dim+2)/2 partial sums
  * per task — map-side combinable, one tiny exchange, no shuffle of
  * vectors, no window (shape pinned in PlanAuditSpec). Everything
  * after is O(d²) on the driver.
  */
object Pca {

  /** Exact upper-triangle moment table (i, j, s), 0 ≤ i ≤ j ≤ dim,
    * over the augmented quantized vector qa = [1, q…]. Rows whose
    * vector is not exactly `dim` long are excluded (a ragged vector
    * has no place in a fixed covariance). */
  def momentsTable(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    // bind qa ONCE as a lambda variable before the O(d²) pair
    // expansion indexes it (Catalyst does not eliminate subexpressions
    // inside lambdas — see TextOps.wordNGrams)
    val pairs = element_at(
      transform(
        array(concat(array(lit(1L)),
          transform(Embeddings.quantize(col(vecCol)), _.cast("long")))),
        qa =>
          flatten(transform(sequence(lit(0), lit(dim)), i =>
            transform(sequence(i, lit(dim)), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(qa, i + 1) * element_at(qa, j + 1)).as("p")))))),
      1)
    df.filter(size(col(vecCol)) === dim)
      .select(explode(pairs).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("s"))
  }

  /** Linear first-moment pass over the augmented quantized vector:
    * (n, s) with s(0) = n and s(j) = Σq_j — the d+1-per-row sibling
    * of [[momentsTable]] for consumers that never read the d²
    * products. Same combinable-aggregate shape, ~d× cheaper. */
  def firstMoments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Long]) = {
    val qa = concat(array(lit(1L)),
      transform(Embeddings.quantize(col(vecCol)), _.cast("long")))
    val s = Array.ofDim[Long](dim + 1)
    df.filter(size(col(vecCol)) === dim)
      .select(posexplode(qa).as(Seq("i", "q")))
      .groupBy(col("i")).agg(sum(col("q")).as("s"))
      .collect()
      .foreach(r => s(r.getInt(0)) = r.getLong(1))
    (s(0), s)
  }

  /** Top principal direction after `iters` power-iteration rounds from
    * the all-ones start, unit-normalized each round. Deterministic to
    * the bit: exact integer moments, then fixed-order double folds. */
  def topComponent(df: DataFrame, vecCol: String, dim: Int, iters: Int): Seq[Double] = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val s = Array.ofDim[Long](dim + 1, dim + 1)
    momentsTable(df, vecCol, dim).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2))
      s(i)(j) = v; s(j)(i) = v
    }
    val n = s(0)(0)
    require(n > 0, s"PCA needs at least one $dim-length vector, found none")
    require(n <= (1L << 53) / (127L * 127L),
      s"n=$n exceeds the exact-double moment range (~5e11) — shard the corpus or extend moments to decimal")
    val nd = n.toDouble
    // covariance C = S/n − (m/n)(m/n)ᵀ — each entry three divisions,
    // one multiply, one subtract on exact inputs: deterministic IEEE
    val a = Array.tabulate(dim, dim)((i, j) =>
      s(i + 1)(j + 1).toDouble / nd -
        (s(0)(i + 1).toDouble / nd) * (s(0)(j + 1).toDouble / nd))
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += a(i)(j) * v(j); j += 1 }
        acc
      }
      var s2 = 0.0; var i = 0
      while (i < dim) { s2 += u(i) * u(i); i += 1 }
      val nrm = math.sqrt(s2)
      require(!nrm.isNaN && nrm != 0.0,
        "power iteration collapsed to the zero vector (degenerate covariance)")
      v = u.map(_ / nrm)
    }
    v.toIndexedSeq
  }

  /** Integer centroid-distance outlier scores: (id, dist2) with
    * dist2 = ‖n·qᵢ − m‖² — the squared distance to the corpus mean
    * scaled by n² so it stays EXACT integer arithmetic (m = Σq is the
    * mean times n). Monotone in the true distance, so thresholding /
    * ranking for embedding-outlier screening is unaffected by the
    * scaling. One LINEAR moments pass ([[firstMoments]] — d+1
    * partials per row, not momentsTable's d² products, which this
    * operator never reads), then a
    * map-only per-row fold against the mean literal. Exact while
    * 64·(2·127·n)² < 2⁶³, i.e. n ≲ 1.4×10⁶ rows per shard — enforced
    * loudly (shard the corpus or extend to decimal beyond). */
  def centroidDistances(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    val (n, m) = firstMoments(df, vecCol, dim)
    require(n > 0, s"centroid distances need at least one $dim-length vector, found none")
    require(n <= math.sqrt((Long.MaxValue / dim).toDouble).toLong / 254,
      s"n=$n exceeds the exact integer range (~1.4e6 rows at d=64) — shard the corpus or extend to decimal")
    val mLit = array((1 to dim).map(j => lit(m(j))): _*)
    val q = transform(Embeddings.quantize(col(vecCol)), _.cast("long"))
    df.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("id"),
        aggregate(
          zip_with(q, mLit, (qv, mv) => (lit(n) * qv - mv) * (lit(n) * qv - mv)),
          lit(0L), (acc, v) => acc + v).as("dist2"))
  }

  /** DataFrame face: (dim_idx, component), dim_idx 0-based. */
  def topComponentDF(
      spark: SparkSession, df: DataFrame, vecCol: String, dim: Int, iters: Int): DataFrame = {
    import spark.implicits._
    topComponent(df, vecCol, dim, iters).zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("dim_idx", "component")
  }
}
