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

  test("non-nullable inputs still whole-stage-compile (nullable override)") {
    // a cached relation's columns come back non-nullable; VectorDot can
    // still return null (length mismatch), so it must declare itself
    // nullable or nullSafeCodeGen binds ev.isNull to the literal
    // `false` and the generated `isNull = true` branch fails to
    // compile — a silent fallback to interpreted mode on the hot path
    assert(VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))).nullable)
    val cached = df.select(col("id"),
      col("a").cast("array<double>").as("a"),
      col("b").cast("array<double>").as("b")).cache()
    try {
      cached.count()
      val q = cached.select(VectorDot(col("a"), col("b")).as("d"))
        .filter(col("d") > 0)
      assert(q.collect().map(_.getDouble(0)).sorted.toSeq == Seq(3.0, 32.0))
      // the shape that regressed: the filter stage over the cached scan
      // must be inside a WholeStageCodegen span, not a fallback
      val exec = q.queryExecution.executedPlan.toString
      assert(exec.contains("*("), exec) // codegen stage marker
    } finally cached.unpersist()
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

  test("VectorDotRewrite rewrites the builtin idiom and preserves results") {
    val builtin = aggregate(
      zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d")
    val q = df.select(builtin)
    // rule rewrites the analyzed plan
    val rewritten = VectorDotRewrite(q.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[VectorDot])),
      rewritten.toString)
    // end-to-end through the optimizer on a live session
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VectorDotRewrite
    try {
      // parquet-backed (a LocalRelation projection is constant-folded
      // away before user-provided rules run)
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val out = e.select(col("vec_id"), aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("norm2"))
      assert(out.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[VectorDot])))
      val native = e.select(col("vec_id"), VectorDot(col("embedding"), col("embedding")).as("norm2"))
      assert(out.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ==
        native.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("survives whole-stage codegen on a real pipeline") {
    val out = df.select(sum(VectorDot(col("a"), col("b"))).as("s")).head()
    assert(out.getDouble(0) == 35.0)
  }
}
