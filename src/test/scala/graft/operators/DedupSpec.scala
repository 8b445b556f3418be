package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the dedup/similarity operator family over planted
  * duplicates. */
class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "dedup-test")

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  val base = "the quick brown fox jumps over the lazy dog and runs far away home"

  test("ExactDedup keeps lowest id per content group") {
    val d = docs((1L, base), (2L, base), (3L, "something else entirely here"))
    val groups = ExactDedup.groups(d, "doc_id", Seq("text")).collect()
    assert(groups.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dup_cnt"))).toSet
      == Set((1L, 2L), (3L, 1L)))
    val kept = ExactDedup.dedup(d, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("MinHashLSH finds planted near-duplicates, not unrelated docs") {
    val d = docs(
      (1L, base),
      (2L, base + " extra"),                       // near-dup of 1
      (3L, "completely different words about spark catalyst optimizer plans and shuffles"),
      (4L, "yet another unrelated document talking about parquet files and row groups"))
    val pairs = MinHashLSH.nearDuplicates(d, "doc_id", "text", 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("SimHash: identical docs at hamming 0; near-dups close; pairs found") {
    val d = docs((1L, base), (2L, base), (3L, base + " tail word added"),
      (4L, "totally unrelated text with many distinct other tokens present here now"))
    val sims = SimHash.simhashes(d, "doc_id", "text")
    val m = sims.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(4L)) > 10)
    val pairs = SimHash.nearPairs(sims, 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("cosine: identical vectors ~1, orthogonal 0; topk ranks by similarity") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.bruteForcePairs(e, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L)))
    val topk = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Int]("rank")))
    assert(topk.toSeq.sortBy(_._2) == Seq((1L, 1), (3L, 2)))
  }

  test("hyperplane LSH buckets identical vectors together") {
    import spark.implicits._
    val e = Seq(
      (0L, Array.fill(8)(0.5f)),
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val b = e.select(col("vec_id"),
      Similarity.hyperplaneBucket(col("embedding"), 6, 8).as("bucket"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // opposite vectors land in the complementary bucket
  }
}
