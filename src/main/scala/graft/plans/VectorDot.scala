package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns (SURVEY §7.3 —
  * the engine's custom-`Expression` tier: used where builtin
  * composition is correct but too slow).
  *
  * The builtin formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * allocates an intermediate product array per row and evaluates two
  * lambda closures per element; for the O(n²) similarity kernels that
  * dominates runtime. This expression folds left-to-right in one tight
  * loop — identical value and order to the builtin chain (and to the
  * DuckDB `list_reduce` oracle) — and generates straight-line Java in
  * whole-stage codegen via [[doGenCode]].
  *
  * Null semantics match the builtin chain: null input array → null;
  * a null element poisons the sum to null (aggregate over a null
  * product). Lengths are zipped (`zip_with` pads the shorter side with
  * null, which nulls the sum) — mismatched lengths therefore return
  * null rather than a partial dot.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // can return null even for NON-null inputs (length mismatch, null
  // element). Without this override, non-nullable children (e.g. out
  // of an InMemoryRelation) make nullSafeCodeGen bind ev.isNull to the
  // literal `false`, the template's `isNull = true` branch stops
  // compiling, and the whole stage silently falls back to interpreted
  // mode — the exact hot path this expression exists to speed up.
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var i = 0
    var s = 0.0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API: dot(a, b) with inputs cast to array<double>. */
  def apply(a: Column, b: Column): Column =
    ExprBridge.column(VectorDot(
      ExprBridge.expression(a.cast("array<double>")),
      ExprBridge.expression(b.cast("array<double>"))))
}
