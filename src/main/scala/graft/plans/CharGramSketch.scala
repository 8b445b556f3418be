package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bottom-k distinct char-gram hash sketch — value-identical to
  * the builtin chain
  * `slice(array_sort(array_distinct(transform(sequence(1, len-g+1),
  *   i -> hex_hash60(substring(text, i, g))))), 1, k)`
  * but one pass over the string with a k-slot insertion buffer: the
  * builtin chain materializes a per-row array of every gram hash
  * (O(len) longs), distincts it, and fully sorts it, paying two
  * allocations and an O(g log g) sort per document; k is 4. The md5s
  * themselves go through the same thread-local digest as
  * [[HexHash60]]. Used by t4_fingerprint, where the builtin chain is
  * the bench's top single cost at sf0.1.
  */
case class CharGramSketch(child: Expression, gram: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_sketch requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharGramSketch.sketch(input.asInstanceOf[UTF8String], gram, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharGramSketch.sketch($c, $gram, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGramSketch =
    copy(child = newChild)
}

object CharGramSketch {

  /** Bottom-k distinct 60-bit gram hashes, ascending. Gram positions are
    * SQL-substring character positions (1-based, short tail grams for
    * strings shorter than `gram` — one whole-string gram), exactly the
    * builtin chain's sequence. */
  def sketch(s: UTF8String, gram: Int, k: Int): ArrayData = {
    val count = math.max(1, s.numChars() - gram + 1)
    val buf = new Array[Long](k)
    var size = 0
    var i = 0
    while (i < count) {
      val h = HexHash60.hash60(s.substringSQL(i + 1, gram))
      if (size < k || h < buf(size - 1)) {
        // insertion point (k ≤ 4: linear scan beats binary search)
        var j = 0
        while (j < size && buf(j) < h) j += 1
        if (j >= size || buf(j) != h) { // distinct only
          val newSize = math.min(size + 1, k)
          var m = newSize - 1
          while (m > j) { buf(m) = buf(m - 1); m -= 1 }
          buf(j) = h
          size = newSize
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, size))
  }

  /** Column API over any input (cast to string first). */
  def apply(c: Column, gram: Int, k: Int): Column =
    ExprBridge.column(CharGramSketch(ExprBridge.expression(c.cast("string")), gram, k))
}
