package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The native shingler must be VALUE-identical to the builtin chain it
  * replaces — same tokens (including the leading/trailing ""-token
  * edge cases of split-limit -1), same gram order, same first-occurrence
  * distinct — because every dedup oracle mirrors the builtin semantics
  * in DuckDB. */
class WordShinglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "shingles-test")

  /** The round-5 builtin chain, verbatim. */
  private def builtinShingles(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(TextOps.wordNGrams(text, n))

  private def compare(inputs: Seq[String], n: Int): Unit = {
    import spark.implicits._
    val df = inputs.toDF("s").select(col("s"),
      TextOps.shingles(col("s"), n).as("native"),
      builtinShingles(col("s"), n).as("builtin"))
    val bad = df.filter(not(col("native") <=> col("builtin")))
    assert(bad.isEmpty,
      s"n=$n:\n" + bad.collect().take(5).mkString("\n"))
  }

  test("equals the builtin chain on adversarial fixed inputs") {
    val inputs = Seq(
      "", " ", "\t", "a", "a b", "a b c", "a b c d e",
      "  leading and   multiple   spaces  ",
      "\ttab\tseparated\ttokens\t", "a\nb\nc", "ab c d",
      "MiXeD CaSe ÜÑÏ çôdé tokens here", "word " * 50,
      "repeat repeat repeat repeat", "a  b", "x\r\ny z w",
      "\u00a0nbsp is not java whitespace\u00a0 here",
      "emoji 😀 tokens 😀 emoji mix", "ab c a bc ab c",
      "\u000bvertical tab\u000bis java whitespace", "\f form feed \f")
    for (n <- Seq(1, 2, 3, 5)) compare(inputs, n)
  }

  test("equals the builtin chain on seeded random strings") {
    val rnd = new scala.util.Random(20260812L)
    val tokens = Array("a", "bb", "ÜÑÏ", "😀", "x9", "a-b", "a,b", "Zz", "")
    val seps = Array(" ", "  ", "\t", "\n", "", " \t ", "\r\n", "\u000b")
    val texts = (1 to 400).map { _ =>
      val k = rnd.nextInt(13)
      val sb = new StringBuilder(seps(rnd.nextInt(seps.length)))
      (1 to k).foreach { _ =>
        sb.append(tokens(rnd.nextInt(tokens.length)))
          .append(seps(rnd.nextInt(seps.length)))
      }
      sb.toString
    }
    for (n <- Seq(1, 2, 3, 4)) compare(texts, n)
  }

  test("first-occurrence distinct order and sub-n emptiness") {
    import spark.implicits._
    val r = Seq("b a b a b a").toDF("s")
      .select(TextOps.shingles(col("s"), 2)).head.getSeq[String](0)
    assert(r == Seq("b a", "a b"))
    val short = Seq("one two").toDF("s")
      .select(TextOps.shingles(col("s"), 3)).head.getSeq[String](0)
    assert(short.isEmpty)
  }
}
