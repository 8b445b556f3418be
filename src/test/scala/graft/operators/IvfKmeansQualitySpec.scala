package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-quality guard for the k-means-refined IVF quantizer:
  * recall@10 against [[Similarity.bruteForceTopK]] ground truth on the
  * real sf0.1 embeddings table must clear a stated floor, and the
  * Lloyd refinement must not lose to the id-mod seed it starts from.
  *
  * The floor (0.60 at nProbe=4 over ~22 lists, i.e. probing <20% of
  * the corpus) is deliberately below typical observed recall — the
  * spec exists to catch a broken quantizer (empty lists, wrong argmax,
  * mean over the wrong axis), not to pin a point estimate of a
  * statistic. Everything here is deterministic: fixed corpus, fixed
  * seed rule, fixed iteration count.
  */
class IvfKmeansQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("8", "ivf-kmeans-quality")

  private val dir = "/root/testdata/sf0.1"
  private val K = 10
  private val NQueries = 50
  private val CentroidMod = 223 // ~n/223 lists ≈ √n for sf0.1's ~5e3 vectors
  private val CentroidRem = 7
  private val NProbe = 4

  private lazy val corpus: DataFrame =
    graft.core.Tables(spark, dir, "embeddings").cache()
  private lazy val queries: DataFrame = corpus.filter(col("vec_id") < NQueries)

  /** recall@K: |ann ∩ truth| / |truth| over all queries. */
  private def recall(ann: DataFrame, truth: DataFrame): Double = {
    val hit = ann.join(truth, Seq("query_id", "corpus_id")).count()
    hit.toDouble / truth.count()
  }

  test("kmeans-refined IVF clears the recall@10 floor and beats or ties its seed") {
    val truth = Similarity
      .bruteForceTopK(corpus, queries, "vec_id", "embedding", K)
      .select("query_id", "corpus_id").cache()
    assert(truth.count() == NQueries.toLong * K)

    val seedTopK = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      K, CentroidMod, CentroidRem, NProbe)
    val seedRecall = recall(seedTopK.select("query_id", "corpus_id"), truth)

    val cents = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", CentroidMod, CentroidRem, iters = 4)
    val kmTopK = Similarity.ivfTopKWith(
      corpus, queries, "vec_id", "embedding", K, cents, NProbe)
    val kmRecall = recall(kmTopK.select("query_id", "corpus_id"), truth)

    info(f"recall@$K nProbe=$NProbe: id-mod seed $seedRecall%.3f, kmeans(4) $kmRecall%.3f")
    assert(kmRecall >= 0.60,
      f"kmeans IVF recall@$K = $kmRecall%.3f below the 0.60 floor")
    // Lloyd refinement must not degrade the quantizer it was seeded with
    // (tolerance for probe-boundary flips on near-tie lists)
    assert(kmRecall >= seedRecall - 0.05,
      f"kmeans recall $kmRecall%.3f fell more than 0.05 below seed $seedRecall%.3f")
  }

  test("kmeans centroids honor the cache contract at iters = 0") {
    // the returned seed table must be cached in its own right — not
    // lineage over the prepVectors scan the finally block unpersists —
    // so ivfTopKWith's repeated broadcasts don't rescan the corpus
    val cents = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", CentroidMod, CentroidRem, iters = 0)
    try {
      assert(cents.storageLevel.useMemory,
        s"iters=0 centroids not cached: ${cents.storageLevel}")
      assert(cents.count() > 0)
    } finally cents.unpersist()
  }

  test("a list averaging to the zero vector drops out instead of NaN-capturing everything") {
    import spark.implicits._
    // one seed list (id 0) whose two members are exact opposites: the
    // Lloyd mean is [0,0], whose 0/0 cosine is NaN — NaN sorts above
    // every double, so an unguarded zero centroid captures every
    // vector and probe. The guard drops it like an empty list.
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", centroidMod = 2, centroidRem = 0, iters = 1)
    try assert(cents.count() == 0) // k shrank to zero, loudly countable
    finally cents.unpersist()
    // an all-zero SEED vector is filtered the same way
    val zeroSeed = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents2 = Similarity.kmeansCentroids(
      zeroSeed, "vec_id", "embedding", centroidMod = 2, centroidRem = 0, iters = 0)
    try {
      val ids = cents2.collect().map(_.getLong(0)).toSet
      assert(ids == Set(2L), s"zero seed not filtered: $ids")
    } finally cents2.unpersist()
  }

  test("kmeans centroids: lists keep the seed family's ids, dims intact, norms positive") {
    val cents = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", CentroidMod, CentroidRem, iters = 2)
    val rows = cents.collect()
    assert(rows.nonEmpty && rows.length <= corpus.count() / CentroidMod + 1)
    val dim = corpus.select(size(col("embedding"))).head.getInt(0)
    assert(rows.forall(_.getSeq[Double](1).length == dim))
    assert(rows.forall(_.getDouble(2) > 0.0)) // no degenerate zero centroid
    // list ids stay within the id-mod seed family (Lloyd moves centroid
    // VALUES, never invents list ids)
    assert(rows.forall(r => r.getLong(0) % CentroidMod == CentroidRem))
  }
}
