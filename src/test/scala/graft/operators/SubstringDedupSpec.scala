package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact repeated-substring spans: planted duplicates are found with
  * exact token bounds, overlapping windows merge maximally, short
  * documents and unique text contribute nothing, and the result is
  * partitioning-invariant. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "substring-test")

  private val L = 4

  // unique filler: uq-<doc>-<i> never repeats across or within docs
  private def uq(doc: Int, n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"uq$doc-$i").mkString(" ")

  private def spans(rows: (Long, String)*): Seq[(Long, Int, Int, Long)] = {
    import spark.implicits._
    SubstringDedup.duplicateSpans(rows.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("planted shared run yields one merged span per doc at exact bounds") {
    // doc 1: 5 unique + 10 shared + 5 unique; doc 2: 3 unique + 10 shared
    val shared = (0 until 10).map(i => s"sh$i").mkString(" ")
    val got = spans(
      1L -> s"${uq(1, 5)} $shared ${uq(1, 5, 100)}",
      2L -> s"${uq(2, 3)} $shared")
    // 10 shared tokens at resolution 4 → 7 windows, one merged span
    assert(got == Seq((1L, 5, 15, 7L), (2L, 3, 13, 7L)))
  }

  test("same-document repetition is detected") {
    // the run repeats within ONE doc: positions 0.. and 10..
    val rep = (0 until 6).map(i => s"rep$i").mkString(" ")
    val got = spans(7L -> s"$rep ${uq(7, 4)} $rep")
    assert(got == Seq((7L, 0, 6, 3L), (7L, 10, 16, 3L)))
  }

  test("exact copies merge to one full-document span each") {
    val text = uq(9, 12) // 12 tokens, all windows duplicated via the copy
    val got = spans(1L -> text, 2L -> text)
    assert(got == Seq((1L, 0, 12, 9L), (2L, 0, 12, 9L)))
  }

  test("unique text and sub-L documents produce nothing") {
    assert(spans(1L -> uq(1, 20), 2L -> uq(2, 20)).isEmpty)
    // 3 < L tokens, even though identical
    assert(spans(1L -> "a b c", 2L -> "a b c").isEmpty)
  }

  test("adjacent-but-not-touching spans stay separate, touching merge") {
    // doc 1 carries two shared runs separated by L+1 unique tokens —
    // the gap exceeds the touch rule, so two spans survive
    val r1 = (0 until 4).map(i => s"ra$i").mkString(" ")
    val r2 = (0 until 4).map(i => s"rb$i").mkString(" ")
    val got = spans(
      1L -> s"$r1 ${uq(1, 5)} $r2",
      2L -> r1,
      3L -> r2)
    assert(got.filter(_._1 == 1L) == Seq((1L, 0, 4, 1L), (1L, 9, 13, 1L)))
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"sh$i").mkString(" ")
    val rows = Seq(1L -> s"${uq(1, 5)} $shared", 2L -> s"$shared ${uq(2, 5)}") ++
      (10 to 40).map(d => d.toLong -> uq(d, 15))
    def run(parts: Int) = {
      val df = rows.toDF("doc_id", "text").repartition(parts)
      SubstringDedup.duplicateSpans(df, "doc_id", "text", L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    }
    assert(run(1) == run(7) && run(1).nonEmpty)
  }
}
