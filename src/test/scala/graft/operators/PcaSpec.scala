package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed PCA: exact moments, dominant-direction recovery,
  * bit-level partition invariance, loud degenerate failure. */
class PcaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "pca-test")
  import spark.implicits._

  def vecs(rows: Seq[Array[Float]], parts: Int = 3) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding").repartition(parts)

  test("moments: augmented matrix holds n, sums, and products exactly") {
    // unit vectors on the two axes: quantize → (±127, 0) / (0, ±127)
    val df = vecs(Seq(Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f)))
    val s = Pca.momentsTable(df, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(s((0, 0)) == 3L)                       // n
    assert(s((0, 1)) == 0L && s((0, 2)) == 127L)  // Σq₁, Σq₂
    assert(s((1, 1)) == 2L * 127 * 127)           // Σq₁²
    assert(s((1, 2)) == 0L)
    assert(s((2, 2)) == 127L * 127)
  }

  test("recovers the dominant variance axis") {
    // spread on dim 0, constant on dim 1 → component ≈ (±1, 0)
    val df = vecs(Seq(Array(1f, 0.01f), Array(-1f, 0.01f),
      Array(0.9f, 0.01f), Array(-0.95f, 0.01f)))
    val v = Pca.topComponent(df, "embedding", 2, iters = 3)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3, v.toString)
    assert(math.abs(v(1)) < 0.05, v.toString)
  }

  test("bit-identical across partitionings (integer moments, fixed-order folds)") {
    val rows = (1 to 200).map(i =>
      Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat))
    val a = Pca.topComponent(vecs(rows, 1), "embedding", 8, 2)
    val b = Pca.topComponent(vecs(rows, 13), "embedding", 8, 2)
    assert(a == b) // exact equality, not tolerance
  }

  test("centroidDistances: hand-computed n²-scaled squared distances, partition-invariant") {
    val d = vecs(Seq(Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f)))
    // quantized: (127,0), (−127,0), (0,127) → n=3, m=(0,127)
    val got = Pca.centroidDistances(d, "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      0L -> (381L * 381 + 127L * 127),
      1L -> (381L * 381 + 127L * 127),
      2L -> (254L * 254)))
    val again = Pca.centroidDistances(
      vecs(Seq(Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f)), parts = 7),
      "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("ragged vectors are excluded; empty corpus and degenerate covariance fail loudly") {
    val ragged = vecs(Seq(Array(1f, 0f), Array(1f, 0f, 3f)))
    val s = Pca.momentsTable(ragged, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(s((0, 0)) == 1L)
    val e1 = intercept[IllegalArgumentException] {
      Pca.topComponent(vecs(Seq(Array(1f, 2f, 3f))), "embedding", 2, 1)
    }
    assert(e1.getMessage.contains("found none"))
    val e2 = intercept[IllegalArgumentException] {
      // identical rows → zero covariance → first round collapses
      Pca.topComponent(vecs(Seq(Array(1f, 0f), Array(1f, 0f))), "embedding", 2, 1)
    }
    assert(e2.getMessage.contains("collapsed"))
  }
}
