package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Optimizer rule: rewrite the builtin dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * into the native [[VectorDot]] expression. The builtin chain runs on
  * `CodegenFallback` higher-order functions (interpreted, with a
  * per-row intermediate array); VectorDot is a straight codegen'd
  * loop with identical value, fold order, and null semantics — so any
  * user who writes the idiomatic builtin form gets the fast path
  * automatically once [[GraftExtensions]] is installed.
  *
  * Matching is conservative: both arrays must already be
  * `array<double>`, the multiply/add lambdas must be exactly the
  * two-variable products/sums (either argument order — IEEE add and
  * multiply are commutative), the seed must be literal 0.0, and the
  * finish lambda must be identity.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  private def isArrayOfDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVars(
      l: Expression, r: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul: Multiply,
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(add: Add,
          Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        finish)
      if isArrayOfDouble(a.dataType) && isArrayOfDouble(b.dataType) &&
        sameVars(mul.left, mul.right, x, y) &&
        sameVars(add.left, add.right, acc, el) &&
        isIdentity(finish) =>
      VectorDot(a, b)
  }
}
