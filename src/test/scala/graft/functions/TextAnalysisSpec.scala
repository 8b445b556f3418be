package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "text-test")

  def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("r")).head().get(0)
  }

  test("detectLanguage picks the profile with most hits") {
    assert(one("the cat sat on the mat and it is fine",
      TextAnalysis.detectLanguage(col("text"))) == "en")
    assert(one("der hund und die katze ist nicht da",
      TextAnalysis.detectLanguage(col("text"))) == "de")
    assert(one("le chat et les chiens dans une maison",
      TextAnalysis.detectLanguage(col("text"))) == "fr")
    // no hits anywhere -> every score 0 -> first profile (de) wins ties
    assert(one("zzz qqq xxx", TextAnalysis.detectLanguage(col("text"))) == "de")
  }

  test("token counts: whitespace vs BPE-ish vs estimate") {
    assert(one("hello world", TextAnalysis.tokenCountWs(col("text"))) == 2)
    // don't + comma split: [don]['t][,][ ]-> "don", "'t" attached, "," punct run
    assert(one("don't stop, now", TextAnalysis.tokenCountBpe(col("text"))) == 4)
    assert(one("12345678", TextAnalysis.tokenEstimate(col("text"))) == 2L)
  }

  test("quality: punctuation-heavy garbage scores below clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and it is a good day to run in the sun"
    val garbage = "!!!...;;;:::!!!,,,..."
    val qc = one(clean, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val qg = one(garbage, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(qc > qg + 0.3)
  }

  test("fingerprint: shared prefix-heavy docs share sketch entries; disjoint don't") {
    import spark.implicits._
    val sk = (t: String) => one(t, TextAnalysis.charGramSketch(col("text")))
      .asInstanceOf[collection.Seq[Long]].toSet
    val a = sk("the quick brown fox jumps over the lazy dog")
    val b = sk("the quick brown fox jumps over the lazy cat")
    val c = sk("zzzzyyyyxxxxwwwwvvvvuuuuttttssss")
    assert((a & b).nonEmpty)
    assert((a & c).isEmpty)
  }
}
