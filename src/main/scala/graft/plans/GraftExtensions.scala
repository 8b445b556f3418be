package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point (SURVEY §7.3): registers the engine's
  * native expressions into the SQL function registry so `spark.sql`
  * users get them too. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or programmatically via `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorDotRewrite)
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_dot(a, b) takes two arguments")
        VectorDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash60"),
      new ExpressionInfo(classOf[HexHash60].getName, "hex_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash60(s) takes one argument")
        HexHash60(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash64"),
      new ExpressionInfo(classOf[HexHash64].getName, "hex_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash64(s) takes one argument")
        HexHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash60_pair"),
      new ExpressionInfo(classOf[HexHash60Pair].getName, "hex_hash60_pair"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash60_pair(s) takes one argument")
        HexHash60Pair(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(s, n) takes two arguments")
        val n = args(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(args.head, n)
      }))
  }
}
