package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN semantics: list assignment is a partition of the corpus, and
  * probing every list degrades gracefully to the exact answer. */
class IvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivf-test")

  // deterministic corpus: unit-ish vectors spread around 4 directions
  def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = Array.fill(8)(0.05)
      base(i % 4) = 1.0
      base((i / 4) % 8) += 0.01 * (i % 7)
      (i.toLong, base.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("ivfAssign assigns every vector to exactly one existing centroid list") {
    val c = corpus(40)
    val assigned = Similarity.ivfAssign(c, "vec_id", "embedding", 10, 3)
    assert(assigned.count() == 40)
    assert(assigned.select("id").distinct().count() == 40)
    val lists = assigned.select("list_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val cents = Set(3L, 13L, 23L, 33L)
    assert(lists.subsetOf(cents), s"unknown list ids: ${lists -- cents}")
    // a centroid belongs to its own list (cos(self) = 1 is maximal)
    val self = assigned.filter(col("id") === 13L)
      .select("list_id").head.getLong(0)
    assert(self == 13L)
  }

  test("probing all lists makes IVF exact (= brute force top-k)") {
    val c = corpus(40)
    val q = c.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val ivfAll = Similarity.ivfTopK(c, q, "vec_id", "embedding", 4,
        centroidMod = 10, centroidRem = 3, nProbe = 4) // 4 centroids, probe all
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(ivfAll.toSeq == exact.toSeq)
  }

  test("small nProbe returns a subset of candidates with exact cosines") {
    val c = corpus(40)
    val q = c.filter(col("vec_id") < 3)
    val ivf1 = Similarity.ivfTopK(c, q, "vec_id", "embedding", 4,
      centroidMod = 10, centroidRem = 3, nProbe = 1)
    val exactPairs = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 40)
      .select("query_id", "corpus_id", "cos_sim")
    // every IVF hit carries the true cosine for that pair
    assert(ivf1.join(exactPairs, Seq("query_id", "corpus_id", "cos_sim"))
      .count() == ivf1.count())
  }
}
