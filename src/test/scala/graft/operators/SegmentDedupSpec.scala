package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Segment dedup: first occurrence survives, later copies vanish,
  * documents reassemble in order and never lose their row. */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "segment-dedup-test")
  import spark.implicits._

  // hand-built single-token segments (segmentation-agnostic core API)
  def segs(rows: (Long, String)*) =
    rows.flatMap { case (id, text) =>
      text.split(" ").zipWithIndex.map { case (t, i) => (id, i, t) }
    }.toDF("id", "chunk_idx", "chunk_text")

  def runOn(rows: (Long, String)*) =
    SegmentDedup.reassemble(SegmentDedup.keepFirst(segs(rows: _*)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)

  test("later occurrences of a segment vanish; first stays; order preserved") {
    val out = runOn(
      1L -> "alpha beta gamma", 2L -> "beta delta alpha", 3L -> "delta")
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, "alpha beta gamma"), // all first occurrences
      (2L, 3L, 1L, "delta"),            // beta/alpha seen in doc 1
      (3L, 1L, 0L, "")))                // delta seen in doc 2
  }

  test("within-document repeats also collapse to the first occurrence") {
    assert(runOn(5L -> "x y x x z").toSeq == Seq((5L, 5L, 3L, "x y z")))
  }

  test("partition invariance of the keep decision") {
    val rows = (1L to 60L).map(i => (i, s"common w${i % 9} w${i % 4} tail${i % 13}"))
    def run(parts: Int) = SegmentDedup.reassemble(
      SegmentDedup.keepFirst(segs(rows: _*).repartition(parts)))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(run(1) == run(11))
  }

  test("CDC end-to-end face: every doc keeps a row, kept ≤ total, text round-trips when unique") {
    val d = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "totally different words without any repeats"),
      (3L, "one two three four five six seven eight")) // exact dup of 1
      .toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(d, "doc_id", "text", divisor = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out.forall(r => r._3 <= r._2))
    // doc 3 duplicates doc 1 segment-for-segment → nothing survives
    assert(out(2)._3 == 0L && out(2)._4 == "")
    // doc 1 and doc 2 are globally unique → full text survives
    assert(out(0)._4 == "one two three four five six seven eight")
    assert(out(1)._4 == "totally different words without any repeats")
  }
}
