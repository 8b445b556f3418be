package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Batch perceptron: integer-exact trajectory, partition invariance,
  * deployment scoring face. */
class LinearClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "perceptron-test")

  def docs(parts: Int) = {
    import spark.implicits._
    Seq((1L, "a b a", "en"), (2L, "x y", "fr"), (3L, "a", "en"))
      .toDF("doc_id", "text", "lang").repartition(parts)
  }

  def feat(parts: Int) =
    LinearClassifier.featureTable(docs(parts), "doc_id", "text", "lang", "en")

  test("hand-computed trajectory: epoch-1 all-miss update, epoch-2 single miss") {
    val eps = LinearClassifier.trainPerceptron(feat(2), dim = 3, epochs = 2)
    // e1: w=0 → every margin 0 → all 3 miss; Δ = Σ y·x over all rows
    //   bias 1−1+1=1, words 3−2+1=2, distinct 2−2+1=1
    assert(eps(0) == LinearClassifier.Epoch(1, 3, Seq(0L, 0L, 0L), Seq(1L, 2L, 1L)))
    // e2: only doc 2 misses (y=−1, w·x=1+4+2=7) → Δ=(−1,−2,−2)
    assert(eps(1) == LinearClassifier.Epoch(2, 1, Seq(1L, 2L, 1L), Seq(0L, 0L, -1L)))
  }

  test("trajectory is partition-invariant (integer sums)") {
    val a = LinearClassifier.trainPerceptron(feat(1), 3, 3)
    val b = LinearClassifier.trainPerceptron(feat(7), 3, 3)
    assert(a == b)
  }

  test("scoreWith: margin of the trained model, pass = score > 0") {
    val got = LinearClassifier.scoreWith(feat(2), Seq(1L, 2L, 1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 9L, true), (2L, 7L, true), (3L, 4L, true)))
  }

  test("guards: dim and epochs must be positive") {
    intercept[IllegalArgumentException] {
      LinearClassifier.trainPerceptron(feat(1), 0, 1)
    }
    intercept[IllegalArgumentException] {
      LinearClassifier.trainPerceptron(feat(1), 3, 0)
    }
  }
}
