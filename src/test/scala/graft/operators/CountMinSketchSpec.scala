package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: one-sided error (never under-counts), bounded
  * over-count, partition-order independence, wide-matrix exactness. */
class CountMinSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "cms-test")
  import spark.implicits._

  // deterministic skewed multiset: item i appears ~1000/i times
  private val occurrences: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
  private val exact: Map[String, Long] =
    occurrences.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def estimatesAt(width: Int, parts: Int): Map[String, Long] = {
    val df = occurrences.toDF("w").repartition(parts)
    val sk = CountMinSketch.build(df, "w", width)
    exact.keys.toSeq.toDF("w")
      .withColumn("est", CountMinSketch.estimate(col("w"), sk, width))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never under-count and over-count stays within the sketch bound") {
    val est = estimatesAt(width = 32, parts = 5)
    val n = occurrences.size.toLong
    exact.foreach { case (w, ex) =>
      assert(est(w) >= ex, s"$w under-counted: ${est(w)} < $ex")
      // classic bound: error ≤ εN with ε = e/W per row, min over 4
      // rows; generous 4N/W cap catches any structural break
      assert(est(w) - ex <= 4 * n / 32, s"$w over-counted: ${est(w)} vs $ex")
    }
    // collisions actually occurred at this width (the bound is live)
    assert(exact.exists { case (w, ex) => est(w) > ex })
  }

  test("a wide matrix separates this vocabulary exactly") {
    val est = estimatesAt(width = 1 << 14, parts = 3)
    assert(est == exact)
  }

  test("the matrix is partition-order independent (combinable build)") {
    val a = CountMinSketch.build(occurrences.toDF("w").repartition(2), "w", 64)
    val b = CountMinSketch.build(
      scala.util.Random.shuffle(occurrences).toDF("w").repartition(7), "w", 64)
    assert(a.toSeq == b.toSeq)
  }

  test("merge of disjoint-data sketches equals the sketch of the union, cell for cell") {
    val (left, right) = occurrences.splitAt(occurrences.size / 3)
    val merged = CountMinSketch.merge(
      CountMinSketch.build(left.toDF("w"), "w", 64),
      CountMinSketch.build(right.toDF("w"), "w", 64))
    val whole = CountMinSketch.build(occurrences.toDF("w"), "w", 64)
    assert(merged.toSeq == whole.toSeq)
    intercept[IllegalArgumentException](
      CountMinSketch.merge(whole, new Array[Long](8)))
  }

  test("wide matrices take the broadcast face: no array literal in the plan, bit-identical to the literal face") {
    val width = 1 << 16 // 262144 cells — a 2 MB array if embedded as a literal
    val sk = CountMinSketch.build(occurrences.toDF("w"), "w", width)
    assert(sk.length > CountMinSketch.LiteralCells)
    val items = (exact.keys.toSeq :+ null).toDF("w")
    val wide = items.withColumn("est", CountMinSketch.estimate(col("w"), sk, width))
    // the dispatched face must not embed the matrix as a plan literal —
    // a multi-MB literal re-deserializes inside every task binary
    val arrayLits = wide.queryExecution.analyzed.expressions.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => l
    })
    assert(arrayLits.isEmpty, "broadcast face leaked an array literal into the plan")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = toMap(wide)
    val viaLiteral = toMap(items.withColumn("est",
      CountMinSketch.estimateLiteral(col("w"), sk, width)))
    assert(got == viaLiteral) // same arithmetic, different shipping
    assert(got(None).isEmpty) // null item estimates null on both faces
    assert(got.collect { case (Some(w), Some(e)) => w -> e } == exact)
  }

  test("bad widths fail loudly") {
    intercept[IllegalArgumentException](
      CountMinSketch.build(occurrences.toDF("w"), "w", 48))
    intercept[IllegalArgumentException](
      CountMinSketch.estimate(col("w"), new Array[Long](8), 64))
  }

  test("JVM cell addressing is bit-compatible with the column-side build") {
    // folding cellsJvm over the occurrences must reproduce build()'s
    // matrix EXACTLY — the contract that lets a state-store holder
    // (StreamingHeavyHitters.sketchCounts) merge with batch sketches
    for (width <- Seq(32, 256)) {
      val built = CountMinSketch.build(occurrences.toDF("w"), "w", width)
      val folded = new Array[Long](CountMinSketch.Rows * width)
      occurrences.foreach(w =>
        CountMinSketch.cellsJvm(w, width).foreach(folded(_) += 1))
      assert(built.toSeq == folded.toSeq, s"width $width")
      // and the JVM estimate equals the column estimate per item
      val colEst = exact.keys.toSeq.toDF("w")
        .withColumn("est", CountMinSketch.estimate(col("w"), built, width))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.keys.foreach(w =>
        assert(CountMinSketch.estimateJvm(folded, w, width) == colEst(w), w))
    }
  }
}
