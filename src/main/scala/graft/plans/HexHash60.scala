package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable 60-bit hash — first 60 bits of md5(utf8(s)) as a
  * non-negative long; bit-identical to the builtin chain
  * `conv(substring(md5(c), 1, 15), 16, 10)` and to DuckDB's
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
  *
  * The builtin chain materializes a 32-char hex string, substrings it,
  * and re-parses it base-16 — three UTF8String allocations plus a
  * digit-loop per call, on top of a fresh MessageDigest lookup inside
  * the md5 expression. This expression reuses a thread-local digest and
  * reads the top 60 bits straight from the digest bytes. The minhash /
  * simhash / fingerprint family calls this millions of times per query,
  * where the allocation overhead is the dominant term.
  */
case class HexHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hex_hash60 requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HexHash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexHash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): HexHash60 =
    copy(child = newChild)
}

object HexHash60 {

  private val threadMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5 of the UTF-8 bytes (= first 15 hex chars). */
  def hash60(s: UTF8String): Long = hash64(s) >>> 4

  /** First 8 md5 bytes big-endian as a SIGNED long (= first 16 hex chars
    * wrapped to two's complement). DuckDB mirror: hi/lo 32-bit halves
    * from `substr(md5(x),1,8)` / `substr(md5(x),9,8)`, then
    * `(hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
    *  * 4294967296 + lo` — pure BIGINT arithmetic, no 64-bit shift
    * (DuckDB's `<<` raises on overflow). */
  def hash64(s: UTF8String): Long = {
    val md = threadMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Column API over any input (cast to string first). */
  def apply(c: Column): Column =
    ExprBridge.column(HexHash60(ExprBridge.expression(c.cast("string"))))
}

/** Native portable 64-bit hash — first 8 md5 bytes big-endian as a
  * signed long. Same thread-local-digest fast path as [[HexHash60]];
  * used by the 64-bit SimHash where 60 bits would leave 15-bit chunk
  * keys (which saturate by pigeonhole at ~10⁵ documents). */
case class HexHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hex_hash64 requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HexHash60.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexHash60.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): HexHash64 =
    copy(child = newChild)
}

object HexHash64 {
  /** Column API over any input (cast to string first). */
  def apply(c: Column): Column =
    ExprBridge.column(HexHash64(ExprBridge.expression(c.cast("string"))))
}

/** Two independent portable 60-bit hashes from ONE md5 digest: the
  * high half (digest bytes 0-7 ≫ 4 = hex chars 1-15, identical to
  * [[HexHash60]]) and the low half (bytes 8-15 ≫ 4 = hex chars 17-31).
  * Returned as `array<bigint>[2]`.
  *
  * This is the base of the Kirsch-Mitzenmacher derived hash family the
  * minhash signature stage uses (h_i = h1 + i·(h2 div 32) mod 2⁶⁰): one
  * digest yields every seed's hash, so a k=32 signature costs 1 md5 per
  * gram instead of 32 — md5 is the dominant CPU in the vocabulary
  * projection at scale. DuckDB mirrors of the halves:
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` and
  * `CAST(concat('0x', substr(md5(x),17,15)) AS BIGINT)`. */
case class HexHash60Pair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hex_hash60_pair requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HexHash60Pair.hashPair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexHash60Pair.hashPair($c)")

  override protected def withNewChildInternal(newChild: Expression): HexHash60Pair =
    copy(child = newChild)
}

object HexHash60Pair {

  private val threadMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** [hi60, lo60] from one digest pass. */
  def hashPair(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = threadMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    def be64(o: Int): Long =
      ((d(o) & 0xffL) << 56) | ((d(o + 1) & 0xffL) << 48) |
        ((d(o + 2) & 0xffL) << 40) | ((d(o + 3) & 0xffL) << 32) |
        ((d(o + 4) & 0xffL) << 24) | ((d(o + 5) & 0xffL) << 16) |
        ((d(o + 6) & 0xffL) << 8) | (d(o + 7) & 0xffL)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(be64(0) >>> 4, be64(8) >>> 4))
  }

  /** Column API over any input (cast to string first). */
  def apply(c: Column): Column =
    ExprBridge.column(HexHash60Pair(ExprBridge.expression(c.cast("string"))))
}
