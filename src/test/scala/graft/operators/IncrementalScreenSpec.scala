package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-dedup contract: screening a batch against a prebuilt
  * [[MinHashLSH.DedupIndex]] must return exactly the cross
  * (batch, corpus) pairs a full [[MinHashLSH.nearDuplicates]] recompute
  * over corpus ∪ batch finds — without touching corpus text again.
  */
class IncrementalScreenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "inc-screen")

  // per-seed vocabularies are disjoint, so the only near-dup structure
  // is the one this spec constructs deliberately
  private def sentence(seed: Int, words: Int): String =
    (0 until words).map(w => s"s${seed}w$w").mkString(" ")

  private def corpus = {
    import spark.implicits._
    ((0 until 40).map(i => (i.toLong, sentence(i, 30))) ++
      // exact copies inside the corpus — exercises the rep expansion
      Seq((100L, sentence(3, 30)), (101L, sentence(3, 30))))
      .toDF("doc_id", "text")
  }

  private def batch = {
    import spark.implicits._
    Seq(
      // near-copy of corpus doc 3 (and its exact copies 100/101)
      (1000L, sentence(3, 30) + " drift drift"),
      // exact copy of corpus doc 7
      (1001L, sentence(7, 30)),
      // novel document — must not match anything
      (1002L, sentence(9999, 30))).toDF("doc_id", "text")
  }

  test("screenAgainst equals the full-recompute cross pairs") {
    val idx = MinHashLSH.buildIndex(corpus, "doc_id", "text")
    val inc = MinHashLSH.screenAgainst(batch, "doc_id", "text", idx, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = MinHashLSH.nearDuplicates(
        corpus.unionByName(batch), "doc_id", "text", 0.7)
      .filter(col("id_b") >= 1000L && col("id_a") < 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(inc == full, s"inc=$inc full=$full")
    // the copy cluster expands through the representative: doc 1000
    // matches 3 AND both of its exact copies, with the same jaccard
    val m1000 = inc.filter(_._1 == 1000L).map(_._2)
    assert(m1000 == Set(3L, 100L, 101L), m1000)
    assert(inc.filter(_._1 == 1001L).map(_._2) == Set(7L))
    assert(!inc.exists(_._1 == 1002L))
    // exact copy carries jaccard 1.0
    assert(inc.filter(_._1 == 1001L).head._3 == 1.0)
  }

  test("the screen derives the batch signatures from the INDEX's recorded family") {
    // a non-default family: if screenAgainst hard-coded defaults, the
    // batch band keys would be cut from k=32/b=8 signatures and would
    // (essentially) never collide with this index — silent empty output
    val idx = MinHashLSH.buildIndex(corpus, "doc_id", "text", k = 16, bands = 4)
    assert(idx.k == 16 && idx.bands == 4)
    val inc = MinHashLSH.screenAgainst(batch, "doc_id", "text", idx, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = MinHashLSH.nearDuplicates(
        corpus.unionByName(batch), "doc_id", "text", 0.7, k = 16, bands = 4)
      .filter(col("id_b") >= 1000L && col("id_a") < 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.nonEmpty) // the family produced real collisions
  }

  test("a k that does not band evenly fails loudly at index build") {
    val e = intercept[IllegalArgumentException](
      MinHashLSH.buildIndex(corpus, "doc_id", "text", k = 30, bands = 8))
    assert(e.getMessage.contains("divide"))
  }
}
