package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM scoring: hand-computed smoothed probabilities, OOV
  * behavior, the fluency ordering the filter exists for, and
  * partitioning-invariance of the fixed-fold sum. */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "lm-test")

  private def score(train: Seq[(Long, String)], docs: Seq[(Long, String)]):
      Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    LanguageModel.bigramScore(
        train.toDF("doc_id", "text"), docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
  }

  test("hand-computed add-one probabilities on a tiny corpus") {
    // train: "a b a c" → bigrams ab, ba, ac; V = {a,b,c} = 3
    // histories: c(a·)=2, c(b·)=1; counts: c(ab)=1, c(ba)=1, c(ac)=1
    val train = Seq(1L -> "a b a c")
    // doc "a b": p(b|a) = (1+1)/(2+3) = 0.4
    val m = score(train, Seq(10L -> "a b"))
    assert(m(10L) == ((1L, 0.4, 0.4)))
    // doc "a b a c": 0.4 + (1+1)/(1+3) + 0.4 = 1.3 / 3
    val m2 = score(train, Seq(11L -> "a b a c"))
    assert(m2(11L)._1 == 3L)
    assert(math.abs(m2(11L)._2 - (0.4 + 0.5 + 0.4)) < 1e-15)
  }

  test("OOV bigrams score 1/V-floored, never zero, and rows survive") {
    val train = Seq(1L -> "a b a c")
    // "x y": history x unseen → (0+1)/(0+3)
    val m = score(train, Seq(20L -> "x y"))
    assert(m(20L) == ((1L, 1.0 / 3, 1.0 / 3)))
    // seen history, unseen continuation: "a z" → (0+1)/(2+3)
    val m2 = score(train, Seq(21L -> "a z"))
    assert(m2(21L) == ((1L, 0.2, 0.2)))
  }

  test("fluent text outranks gibberish against the model") {
    val train = (1 to 20).map(i =>
      i.toLong -> "the cat sat on the mat and the dog sat on the rug")
    val m = score(train, Seq(
      100L -> "the cat sat on the mat",
      101L -> "mat the on cat rug sat"))
    assert(m(100L)._3 > m(101L)._3)
  }

  test("single-token and empty docs are absent (no bigram, no row)") {
    val m = score(Seq(1L -> "a b"), Seq(30L -> "solo", 31L -> "", 32L -> "a b"))
    assert(!m.contains(30L) && !m.contains(31L) && m.contains(32L))
  }

  test("sum is partitioning-invariant (bit-exact fixed fold)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (1 to 40).map(d =>
      d.toLong -> (0 until 60).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    def run(parts: Int): Map[Long, Double] =
      LanguageModel.bigramScore(
          docs.toDF("doc_id", "text").repartition(parts),
          docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(2)
    assert(a == run(11) && a.nonEmpty)
  }
}
