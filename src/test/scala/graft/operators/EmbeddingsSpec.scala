package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding preprocessing: unit norms, bounded quantization, zero-vector
  * safety, and the quantized k-means step's output shape. */
class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "embed-test")

  def vecs(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 31 + j * 7) % 19 - 9).toFloat / 3f))
    }.toDF("vec_id", "embedding")
  }

  test("normalize yields unit L2 norm; zero vector passes through") {
    import spark.implicits._
    val d = vecs(50, 16)
      .union(Seq((999L, Array.fill(16)(0f))).toDF("vec_id", "embedding"))
    val norms = d.select(col("vec_id"),
        Embeddings.l2Norm(Embeddings.normalize(col("embedding"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(norms(0L) - 1.0) < 1e-12)
    assert(math.abs(norms(49L) - 1.0) < 1e-12)
    assert(norms(999L) == 0.0)
  }

  test("quantize stays within [-127, 127] and preserves sign") {
    val q = vecs(50, 16).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      Embeddings.quantize(col("embedding")).as("q"))
    val bad = q.select(explode(col("q")).as("x"))
      .filter(col("x") > 127 || col("x") < -127).count()
    assert(bad == 0)
    // largest-magnitude component of a unit vector quantizes to ±127
    val row = q.filter(col("vec_id") === 1L)
      .select(col("v"), col("q")).head
    val v = row.getSeq[Double](0); val qq = row.getSeq[Int](1)
    val iMax = v.indices.maxBy(i => math.abs(v(i)))
    assert(math.signum(qq(iMax).toDouble) == math.signum(v(iMax)))
  }

  test("quantizedKMeansStep emits one row per (list, dimension) in range") {
    val dim = 16
    val step = Embeddings.quantizedKMeansStep(vecs(60, dim), "vec_id", "embedding",
      centroidMod = 20, centroidRem = 3) // centroids 3, 23, 43
    val rows = step.collect()
    val lists = rows.map(_.getLong(0)).distinct.sorted
    assert(lists.forall(Set(3L, 23L, 43L)))
    assert(rows.length == lists.length * dim)
    assert(rows.forall { r =>
      val v = r.getDouble(2); v >= -127.0 && v <= 127.0
    })
  }
}
