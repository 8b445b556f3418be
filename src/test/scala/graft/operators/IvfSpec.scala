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

  test("semanticDedup drops within-cluster near-dups, keeping the lowest id") {
    import spark.implicits._
    // well-separated corpus: 4 directions, members spread wide enough
    // that no NATURAL pair reaches the 0.9999 threshold (adjacent-eps
    // same-direction cosines top out ≈ 0.9994)
    val base = (0 until 40).map { i =>
      val a = Array.fill(8)(0.0f)
      a(i % 4) = 1.0f
      a(4 + i % 4) = (0.2 + 0.15 * (i / 4)).toFloat
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
    // inject exact copies of vectors 0 and 13 with higher ids — same
    // vector ⇒ same argmax list ⇒ guaranteed in-cluster candidates
    val dups = base.filter(col("vec_id").isin(0L, 13L))
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val dropped = Similarity.semanticDedup(base.unionByName(dups),
      "vec_id", "embedding", centroidMod = 10, centroidRem = 3, threshold = 0.9999)
    val rows = dropped.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1000L, 1013L), rows.toSeq)
    assert(rows.map(_._2).toSeq == Seq(0L, 13L))
    rows.foreach { case (_, _, cos) => assert(cos > 0.99999) }
    // left-anti against the result is the deduped corpus: originals stay
    val deduped = base.unionByName(dups)
      .join(dropped.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
    assert(deduped.count() == 40)
    dropped.unpersist()
  }

  test("semanticDedup: a zero-norm vector cannot NaN-capture its list") {
    import spark.implicits._
    val base = (0 until 12).map { i =>
      val a = Array.fill(8)(0.0f)
      a(i % 4) = 1.0f
      a(4 + i % 4) = (0.2 + 0.15 * (i / 4)).toFloat
      (i.toLong + 10, a)
    }.toDF("vec_id", "embedding")
    // id 0 — the LOWEST id, so a NaN-passing pair would make it the
    // keeper and drop every other vector in its list
    val zero = Seq((0L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val dropped = Similarity.semanticDedup(base.unionByName(zero),
      "vec_id", "embedding", centroidMod = 5, centroidRem = 2, threshold = 0.9)
    val rows = dropped.collect()
    assert(!rows.exists(_.getLong(1) == 0L),
      s"zero vector captured real docs: ${rows.mkString(", ")}")
    assert(!rows.exists(_.getLong(0) == 0L))
    assert(!rows.exists(r => r.getDouble(2).isNaN))
    dropped.unpersist()
  }
}
