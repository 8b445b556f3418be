package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Winnowing fingerprints: the Schleimer et al. guarantee (any shared
  * run of ≥ k+w−1 tokens produces a shared fingerprint), density and
  * degenerate-document contracts, and the bucketed pair join. */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "winnow-test")

  private val K = 3
  private val W = 4

  private def fps(rows: (Long, String)*): Map[Long, Set[Long]] = {
    import spark.implicits._
    Winnowing.fingerprintTable(rows.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
  }

  test("guarantee: a shared run of k+w-1 tokens shares a fingerprint") {
    // seeded property sweep, batched into ONE Spark job (house pattern
    // from RandomizedOpsSpec): 20 doc pairs, each with a pair-unique
    // planted run of exactly k+w-1 = 6 tokens and pair-unique random
    // filler lengths on both sides
    val rnd = new Random(42)
    val rows = (0 until 20).flatMap { p =>
      val run = (0 until (K + W - 1)).map(i => s"run$p-$i").mkString(" ")
      def doc(side: String) = {
        val a = rnd.nextInt(31); val b = rnd.nextInt(31)
        ((0 until a).map(i => s"$side$p-a$i") ++ Seq(run) ++
          (0 until b).map(i => s"$side$p-b$i")).mkString(" ")
      }
      Seq((p * 2).toLong -> doc("x"), (p * 2 + 1).toLong -> doc("y"))
    }
    val m = fps(rows: _*)
    (0 until 20).foreach { p =>
      assert(m(p * 2L).intersect(m(p * 2L + 1)).nonEmpty,
        s"pair $p violates the winnowing guarantee")
    }
  }

  test("density: fingerprints are a subset of the gram-hash set") {
    import spark.implicits._
    val text = (0 until 40).map(i => s"t${i % 7}").mkString(" ")
    val df = Seq(1L -> text).toDF("doc_id", "text")
    val all = df.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.transform(
          TextOps.wordNGrams(org.apache.spark.sql.functions.col("text"), K),
          g => TextOps.hexHash60(g))))
      .collect().map(_.getLong(0)).toSet
    val sel = fps(1L -> text)(1L)
    assert(sel.subsetOf(all))
    assert(sel.size < all.size) // winnowing thins, never copies all
  }

  test("degenerate docs: one fingerprint when 0 < grams < w, none when no gram") {
    // 4 tokens → 2 grams < w → the global-min fallback, exactly 1 fp
    val m = fps(1L -> "a b c d", 2L -> "a b")
    assert(m(1L).size == 1)
    assert(!m.contains(2L)) // 2 tokens < k → no gram → no row
  }

  test("sharedPairs finds planted pair and nothing between unrelated docs") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      1L -> s"a0 a1 a2 $shared a3 a4",
      2L -> s"b0 b1 $shared b2 b3 b4 b5",
      3L -> (0 until 20).map(i => s"c$i").mkString(" "),
      4L -> (0 until 20).map(i => s"d$i").mkString(" ")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.sharedPairs(docs, "doc_id", "text", K, W, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 1L)
  }

  test("editVerifiedPairs: near-identical pair survives, high-distance candidate dies") {
    import spark.implicits._
    val shared = (0 until 14).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      1L -> s"$shared tail one",          // vs 2: small suffix edit
      2L -> s"$shared tail two",
      3L -> s"$shared ${(0 until 12).map(i => s"x$i xx$i").mkString(" ")}", // shares fps, big distance
      4L -> (0 until 25).map(i => s"z$i").mkString(" ")
    ).toDF("doc_id", "text")
    val verified = Winnowing.editVerifiedPairs(docs, "doc_id", "text",
        K, W, minShared = 1, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(verified.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(verified.head._3 == 3) // "one" -> "two": o->t, n->w, e->o
    // the (1,3)/(2,3) candidates existed but were distance-killed
    val cand = Winnowing.sharedPairs(docs, "doc_id", "text", K, W, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L)))
  }

  test("partitioning-invariant fingerprint sets") {
    import spark.implicits._
    val rows = (1 to 30).map(d =>
      (d.toLong, (0 until 25).map(i => s"w${(d * 7 + i * 3) % 11}").mkString(" ")))
    def run(parts: Int): Set[(Long, Long)] =
      Winnowing.fingerprintTable(
          rows.toDF("doc_id", "text").repartition(parts), "doc_id", "text", K, W)
        .collect().map((r: Row) => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(8) && run(1).nonEmpty)
  }
}
