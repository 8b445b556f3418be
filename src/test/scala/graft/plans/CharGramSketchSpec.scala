package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** CharGramSketch must be value-identical to the builtin
  * slice(sort(distinct(transform(...)))) chain it replaces. */
class CharGramSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "sketch-test")

  private def builtinChain(text: org.apache.spark.sql.Column, gram: Int, k: Int) = {
    val hashes = transform(
      sequence(lit(1), greatest(lit(1), length(text) - (gram - 1))),
      i => TextOps.hexHash60(substring(text, i, lit(gram))))
    slice(array_sort(array_distinct(hashes)), 1, k)
  }

  test("native sketch == builtin chain on varied inputs") {
    import spark.implicits._
    val texts = Seq(
      "",                        // empty: one hash of ""
      "short",                   // shorter than the gram
      "exactly8",                // exactly one gram
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaa",      // every gram identical -> 1 distinct
      "ααββγγδδεεζζ 多字节文本 mixed", // multi-byte chars: char (not byte) positions
      ("spark " * 40).trim)
    val df = texts.toDF("text")
    Seq((8, 4), (8, 1), (3, 4), (5, 2)).foreach { case (g, k) =>
      val rows = df.select(
        CharGramSketch(col("text"), g, k).as("native"),
        builtinChain(col("text"), g, k).as("builtin")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"g=$g k=$k text='$t'")
      }
    }
  }

  test("interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq("the quick brown fox").toDF("text")
    val fromCodegen = df.select(CharGramSketch(col("text"), 8, 4)).head.getSeq[Long](0)
    val interpreted = CharGramSketch.sketch(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox"), 8, 4)
    assert(fromCodegen == interpreted.toLongArray().toSeq)
  }
}
