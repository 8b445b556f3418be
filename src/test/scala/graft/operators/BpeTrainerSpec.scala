package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE learning: hand-computed merge trajectory, leftmost-greedy fold
  * vs a reference implementation (incl. the run cases the chain-parity
  * oracle must match), determinism, loud exhaustion. */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "bpe-test")
  import spark.implicits._

  def words(rows: (String, Long)*) = rows.toDF("word", "freq")

  test("hand-computed 3-round trajectory with tie-break") {
    val w = words("abab" -> 3L, "ab" -> 2L, "aaab" -> 1L)
    val (ms, st) = BpeTrainer.train(w, 3)
    // r1: (a,b) 3·2+2·1+1·1 = 9 beats (b,a) 3 and (a,a) 2
    // r2: (ab,ab) 3 from "abab"
    // r3: (a,a) and (a,ab) tie at 1 → lexicographic picks (a,a)
    assert(ms == Seq(
      BpeTrainer.Merge(1, "a", "b", 9L),
      BpeTrainer.Merge(2, "ab", "ab", 3L),
      BpeTrainer.Merge(3, "a", "a", 1L)))
    val fin = st.select(col("word"), concat_ws(" ", col("syms")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    st.unpersist()
    assert(fin == Map("abab" -> "abab", "ab" -> "ab", "aaab" -> "aa ab"))
  }

  /** Reference leftmost-greedy merge — shared single definition. */
  def greedy(s: Seq[String], a: String, b: String): Seq[String] =
    BpeTestRef.greedy(s, a, b)

  test("applyMerge == leftmost greedy on adversarial runs and random strings") {
    val fixed = Seq("aaaa", "aaa", "abab", "aab", "abb", "ababa", "bbbb", "a", "")
    val rnd = new scala.util.Random(7)
    val randoms = (1 to 60).map(_ =>
      (1 to rnd.nextInt(10)).map(_ => "ab" (rnd.nextInt(2))).mkString)
    val cases = (fixed ++ randoms).distinct
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("b", "a"), ("b", "b"))) {
      val got = cases.toDF("word")
        .select(col("word"),
          BpeTrainer.applyMerge(BpeTrainer.chars(col("word")), a, b).as("m"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      cases.foreach { w =>
        val exp = greedy(w.map(_.toString), a, b)
        assert(got(w) == exp, s"word=$w pair=($a,$b): got ${got(w)}, want $exp")
      }
    }
  }

  test("merges are partition-invariant") {
    val w = (1 to 100).map(i => (s"w${i % 17}x${i % 5}", (i % 7 + 1).toLong))
      .toDF("word", "freq")
    def run(parts: Int) = {
      val (ms, st) = BpeTrainer.train(w.repartition(parts), 2)
      st.unpersist(); ms
    }
    assert(run(1) == run(9))
  }

  test("compressionStats: trained-state join counts chars vs symbols per document") {
    val docs = Seq((1L, "abab ab"), (2L, "cc"), (3L, "")).toDF("doc_id", "text")
    // train on the same corpus: (a,b) merges first, then (ab,ab)
    val (ms, st) = BpeTrainer.train(BpeTrainer.wordTable(docs, "text"), 2)
    assert(ms.map(m => (m.a, m.b)) == Seq(("a", "b"), ("ab", "ab")))
    val got = BpeTrainer.compressionStats(docs, "doc_id", "text", st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    st.unpersist()
    assert(got.toSeq == Seq(
      (1L, 2L, 6L, 2L),  // 2 words, 6 chars, syms: abab + ab → 1 each
      (2L, 1L, 2L, 2L),  // cc: no merge applies
      (3L, 1L, 0L, 0L))) // empty text → the single empty token
    // frozen-model convention: unseen words count 0 symbols
    val other = Seq((9L, "zz abab")).toDF("doc_id", "text")
    val (_, st2) = BpeTrainer.train(BpeTrainer.wordTable(docs, "text"), 2)
    val unseen = BpeTrainer.compressionStats(other, "doc_id", "text", st2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    st2.unpersist()
    assert(unseen.toSeq == Seq((9L, 2L, 6L, 1L))) // zz unseen → 0 syms
  }

  test("compressionStatsExact: unseen words re-fold through the merge chain") {
    val docs = Seq((1L, "abab ab"), (2L, "cc")).toDF("doc_id", "text")
    val (ms, st) = BpeTrainer.train(BpeTrainer.wordTable(docs, "text"), 2)
    // the opt-in path must tokenize the unseen word exactly as TRAINING
    // would have: fold the learned merges greedily, in order (reference
    // = the shared pure-Scala greedy chain)
    val unseenWords = Seq("ababab", "ba", "zz", "aabb")
    val expect = unseenWords.map { w =>
      w -> ms.foldLeft(w.map(_.toString): Seq[String])((s, m) =>
        BpeTestRef.greedy(s, m.a, m.b)).length.toLong
    }.toMap
    val other = unseenWords.zipWithIndex
      .map { case (w, i) => (100L + i, w) }.toDF("doc_id", "text")
    val got = BpeTrainer.compressionStatsExact(other, "doc_id", "text", st, ms)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == unseenWords.zipWithIndex
      .map { case (w, i) => (100L + i) -> expect(w) }.toMap)
    // seen words still come from the precompiled state (frozen path
    // agreement), and a mixed doc sums both
    val mixed = Seq((9L, "zz abab")).toDF("doc_id", "text")
    val gotMixed = BpeTrainer.compressionStatsExact(mixed, "doc_id", "text", st, ms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    st.unpersist()
    // zz re-folds to 2 symbols (no merge applies), abab to 1 (trained)
    assert(gotMixed.toSeq == Seq((9L, 2L, 6L, 3L)))
    assert(expect("ababab") == 2L) // abab + ab: leftmost-greedy chain, not 3×ab
  }

  test("exhausted corpus fails loudly; rounds guard") {
    val (ms, st) = BpeTrainer.train(words("ab" -> 1L), 1)
    st.unpersist()
    assert(ms.head.a == "a" && ms.head.b == "b")
    val e = intercept[IllegalArgumentException] {
      val (_, st2) = BpeTrainer.train(words("ab" -> 1L), 2)
      st2.unpersist()
    }
    assert(e.getMessage.contains("no adjacent pairs"))
    intercept[IllegalArgumentException] { BpeTrainer.train(words("ab" -> 1L), 0) }
  }
}
