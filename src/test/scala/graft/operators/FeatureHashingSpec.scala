package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashing-trick embeddings: unit norm, corpus-size independence,
  * dense-vector face, composition with the ANN family. */
class FeatureHashingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "feature-hashing-test")
  import spark.implicits._

  val dim = 8

  def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("weights are l2-normalized and identical texts embed identically") {
    val d = docs((1L, "spark join table"), (2L, "spark join table"), (3L, "window agg"))
    val t = FeatureHashing.hashedTable(d, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byDoc = t.groupBy(_._1)
    // per-doc Σ weight² == 1 (within fp rounding of the one divide)
    byDoc.values.foreach { rs =>
      assert(math.abs(rs.map(x => x._4 * x._4).sum - 1.0) < 1e-12)
    }
    // identical text → identical (bucket, c, weight) sets
    assert(byDoc(1L).map(x => (x._2, x._3, x._4)).toSet ==
      byDoc(2L).map(x => (x._2, x._3, x._4)).toSet)
  }

  test("embedding of a row is independent of the rest of the corpus (no vocabulary)") {
    val small = FeatureHashing.hashedTable(
      docs((1L, "spark join table")), "doc_id", "text", dim)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val big = FeatureHashing.hashedTable(
      docs((1L, "spark join table"), (2L, "completely different words here"),
        (3L, "and some more text rows")), "doc_id", "text", dim)
      .filter($"id" === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(small == big)
  }

  test("partition invariance") {
    val d = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} common"))
    def run(parts: Int) = FeatureHashing.hashedTable(
      d.toDF("doc_id", "text").repartition(parts), "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(run(1) == run(13))
  }

  test("dense face: dim-length vectors, zero-filled, cosine 1 for identical texts") {
    val d = docs((1L, "spark join table"), (2L, "spark join table"), (3L, "window agg x"))
    val vecs = FeatureHashing.hashedVectors(d, "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs.values.forall(_.length == dim))
    val cos12 = vecs(1L).lazyZip(vecs(2L)).map(_ * _).sum
    assert(math.abs(cos12 - 1.0) < 1e-12)
    val cos13 = vecs(1L).lazyZip(vecs(3L)).map(_ * _).sum
    assert(cos13 < 0.999)
  }

  test("composes with the brute-force knn over hashed vectors") {
    val d = docs((1L, "spark join table"), (2L, "spark join table wide"),
      (3L, "unrelated audio frames"), (4L, "spark join"))
    val vecs = FeatureHashing.hashedVectors(d, "doc_id", "text", dim)
    val nn = Similarity.bruteForceTopK(vecs, vecs, "id", "vec", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the two near-identical spark docs pick each other
    assert(nn(1L) == 2L && nn(2L) == 1L)
  }

  test("guard: dim must be at least 2") {
    intercept[IllegalArgumentException] {
      FeatureHashing.signedCounts(docs((1L, "a")), "doc_id", "text", 1)
    }
  }
}
