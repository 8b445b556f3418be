package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingling — value-identical to the
  * builtin chain in [[graft.operators.TextOps.shingles]]
  * (`array_distinct` over once-bound `transform(sequence(...),
  * i -> concat_ws(" ", words[i..i+n-1]))` over
  * `split(trim(lower(text)), "\\s+")`) but ONE pass over the string:
  * the builtin chain allocates the token array, an index sequence, a
  * per-index gram string via element_at traversals, the full gram
  * array, and a distinct copy — five materializations per document on
  * the hottest path of the dedup family (d2/d3/d4/d6 all shingle the
  * corpus first).
  *
  * Semantics replicated exactly (proven by WordShinglesSpec's
  * equivalence property over adversarial inputs):
  *   - lowercase = `UTF8String.toLowerCase` (what the `lower` builtin
  *     calls), then space-only trim (the `trim` builtin strips 0x20
  *     only — tabs/newlines at the edges survive into the split);
  *   - tokenization = Java regex `\s+` with Spark's split limit -1
  *     (leading whitespace yields a leading "" token; trailing
  *     whitespace yields a trailing "" token — both participate in
  *     grams just as the builtin chain's do);
  *   - grams joined with a single space (`concat_ws(" ", ...)`);
  *   - fewer than n tokens → empty array;
  *   - distinct keeps FIRST occurrence order (`array_distinct`).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct word n-grams in first-occurrence order. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    // UTF8String.toLowerCase == the `lower` builtin; trim() == the
    // space-only `trim` builtin
    val t = s.toLowerCase.trim().toString
    // Spark's split(str, re) runs with limit -1: trailing empty strings
    // are KEPT (unlike java.lang.String#split's default limit 0)
    val words = Ws.split(t, -1)
    if (words.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column API over any input (cast to string first). */
  def apply(c: Column, n: Int): Column =
    ExprBridge.column(WordShingles(ExprBridge.expression(c.cast("string")), n))
}
