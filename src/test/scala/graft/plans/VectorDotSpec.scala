package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorDotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "vecdot-test")

  def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, 0.5f, 0.5f), Array(2.0f, 2.0f, 2.0f))
    ).toDF("id", "a", "b")
  }

  test("matches the builtin aggregate(zip_with) chain bit-for-bit") {
    val builtin = aggregate(
      zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorDot(col("a"), col("b")).as("native"),
      builtin.as("builtin")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(32.0, 3.0))
  }

  test("null array and mismatched lengths yield null") {
    import spark.implicits._
    val d = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0))),
      (Some(Array(1.0, 2.0)), Some(Array(1.0)))
    ).toDF("a", "b")
    val out = d.select(VectorDot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.toSeq == Seq(11.0, null, null))
  }

  test("registered as SQL function via GraftExtensions") {
    // getOrCreate reuses the suite-shared session, so builder-time
    // extensions can't apply here; install into its registry directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.ExprBridge.installFunctions(
      ext, spark.sessionState.functionRegistry)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("survives whole-stage codegen on a real pipeline") {
    val out = df.select(sum(VectorDot(col("a"), col("b"))).as("s")).head()
    assert(out.getDouble(0) == 35.0)
  }
}
