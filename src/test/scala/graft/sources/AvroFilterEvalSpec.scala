package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The filter-pushdown evaluator's decision table: SQL three-valued
  * logic with unknown → keep, the conservative direction that makes
  * double evaluation (scan row-skip + residual Spark filter) safe. */
class AvroFilterEvalSpec extends AnyFunSuite {

  private val names = Array("id", "x", "s", "flag")
  private val types: Array[DataType] =
    Array(LongType, DoubleType, StringType, BooleanType)
  private def row(id: Any, x: Any, s: Any, flag: Any): Array[Any] =
    Array(id, x, s, flag)

  private def eval(f: Filter, r: Array[Any]): Boolean =
    AvroFilterEval.compile(Seq(f), names, types).get.eval(r)

  test("comparisons follow SQL semantics; null never satisfies them") {
    assert(eval(GreaterThan("id", 5L), row(6L, null, null, null)))
    assert(!eval(GreaterThan("id", 5L), row(5L, null, null, null)))
    assert(!eval(GreaterThan("id", 5L), row(null, null, null, null)))
    assert(eval(LessThanOrEqual("x", 1.5), row(null, 1.5, null, null)))
    assert(eval(EqualTo("s", "abc"), row(null, null, "abc", null)))
    assert(!eval(EqualTo("s", "abc"), row(null, null, null, null)))
    assert(eval(EqualTo("flag", java.lang.Boolean.TRUE), row(null, null, null, java.lang.Boolean.TRUE)))
    // int literal against a long column compares numerically
    assert(eval(EqualTo("id", 7), row(7L, null, null, null)))
  }

  test("In / IsNull / IsNotNull / And / Or") {
    assert(eval(In("id", Array(1L, 3L, 5L)), row(3L, null, null, null)))
    assert(!eval(In("id", Array(1L, 3L, 5L)), row(2L, null, null, null)))
    assert(!eval(In("id", Array(1L, 3L, 5L)), row(null, null, null, null)))
    assert(eval(IsNull("s"), row(1L, null, null, null)))
    assert(eval(IsNotNull("id"), row(1L, null, null, null)))
    assert(eval(And(GreaterThan("id", 1L), LessThan("id", 3L)), row(2L, null, null, null)))
    assert(eval(Or(EqualTo("id", 9L), EqualTo("s", "z")), row(1L, null, "z", null)))
  }

  test("Not over an unknown child KEEPS the row — the residual filter decides") {
    // child EqualTo(null-cell) is unknown → child false → Not true →
    // we keep; Spark's residual filter drops it (NOT unknown = unknown)
    assert(eval(Not(EqualTo("s", "abc")), row(null, null, null, null)))
    assert(!eval(Not(EqualTo("s", "abc")), row(null, null, "abc", null)))
    assert(eval(Not(EqualTo("s", "abc")), row(null, null, "xyz", null)))
  }

  test("unsupported shapes stay residual-only and never force conversion") {
    val schema = StructType(names.zip(types).map { case (n, t) => StructField(n, t) })
    assert(!AvroFilterEval.supports(StringContains("s", "a"), schema))
    assert(!AvroFilterEval.supports(EqualTo("missing", 1L), schema))
    // a binary-typed column is out of the supported set; so is a
    // literal shape the comparator does not recognize (string for a
    // date column) — keep-it-residual either way
    val bin = StructType(Seq(StructField("b", BinaryType)))
    assert(!AvroFilterEval.supports(EqualTo("b", Array[Byte](1)), bin))
    val dt = StructType(Seq(StructField("d", DateType)))
    assert(!AvroFilterEval.supports(EqualTo("d", "2026-01-01"), dt))
    // mixed batch: only the supported conjunct is compiled, and its
    // column list contains just that conjunct's reference
    val pred = AvroFilterEval.compile(
      Seq(GreaterThan("id", 1L), StringContains("s", "a")), names, types).get
    assert(pred.cols.toSeq == Seq(0))
    assert(pred.eval(row(2L, null, null, null)))
  }

  test("float -0.0 equals 0.0 and NaN sorts greatest — Spark's comparison semantics") {
    assert(eval(EqualTo("x", 0.0), row(null, -0.0d, null, null)))
    assert(eval(EqualTo("x", -0.0d), row(null, 0.0d, null, null)))
    assert(eval(GreaterThanOrEqual("x", 0.0), row(null, -0.0d, null, null)))
    // NaN: greater than everything, equal to itself (Spark convention)
    assert(eval(GreaterThan("x", 1e300), row(null, Double.NaN, null, null)))
    assert(eval(EqualTo("x", Double.NaN), row(null, Double.NaN, null, null)))
  }

  test("string ordering is UTF-8 byte order, not UTF-16 code units") {
    // U+1F600 (surrogate pair D83D DE00; UTF-8 F0 9F 98 80) vs U+EE00
    // (UTF-8 EE B8 80): byte order says the emoji is GREATER, UTF-16
    // code-unit order says smaller — Spark compares bytes, so the
    // evaluator must keep this row
    val emoji = new String(Character.toChars(0x1F600))
    val pivot = "\uEE00"
    assert(eval(GreaterThan("s", pivot), row(null, null, emoji, null)))
    assert(!eval(LessThan("s", pivot), row(null, null, emoji, null)))
  }

  test("compile returns None when nothing is evaluable") {
    assert(AvroFilterEval.compile(
      Seq(StringContains("s", "a")), names, types).isEmpty)
  }

  private def eval1(t: DataType, f: Filter, v: Any): Boolean = {
    val p = AvroFilterEval.compile(Seq(f), Array("c"), Array(t))
    assert(p.isDefined, s"$f over $t did not compile")
    p.get.eval(Array[Any](v))
  }

  test("date comparisons: LocalDate rows vs both java.sql.Date and LocalDate literals") {
    val d = java.time.LocalDate.of(2026, 2, 15)
    assert(eval1(DateType, EqualTo("c", java.sql.Date.valueOf("2026-02-15")), d))
    assert(eval1(DateType, GreaterThan("c", java.sql.Date.valueOf("2026-02-14")), d))
    assert(!eval1(DateType, LessThan("c", java.time.LocalDate.of(2026, 2, 15)), d))
    assert(eval1(DateType, LessThanOrEqual("c", java.time.LocalDate.of(2026, 2, 15)), d))
  }

  test("timestamp comparisons: Instant rows, Timestamp/Instant literals, pre-1970 exactness") {
    val i = java.time.Instant.parse("2026-03-01T12:00:00.000123Z")
    assert(eval1(TimestampType, EqualTo("c", java.sql.Timestamp.from(i)), i))
    assert(eval1(TimestampType,
      GreaterThan("c", java.time.Instant.parse("2026-03-01T11:59:59Z")), i))
    // pre-1970: epochSecond floors, nanos adjust upward — micros exact
    val old = java.time.Instant.parse("1969-12-31T23:59:59.999999Z")
    assert(eval1(TimestampType, LessThan("c", java.time.Instant.EPOCH), old))
    assert(!eval1(TimestampType, EqualTo("c", java.time.Instant.EPOCH), old))
  }

  test("local timestamp (NTZ) comparisons over LocalDateTime") {
    val l = java.time.LocalDateTime.of(2026, 5, 1, 9, 30, 0, 123000)
    assert(eval1(TimestampNTZType, EqualTo("c", l), l))
    assert(eval1(TimestampNTZType, GreaterThanOrEqual("c", l.minusNanos(1000)), l))
    assert(!eval1(TimestampNTZType, GreaterThan("c", l), l))
  }

  test("decimal comparisons are scale-blind and exact") {
    val v = new java.math.BigDecimal("1.50")
    assert(eval1(DecimalType(10, 2), EqualTo("c", new java.math.BigDecimal("1.5")), v))
    assert(eval1(DecimalType(10, 2), EqualTo("c", BigDecimal("1.500")), v))
    assert(eval1(DecimalType(10, 2),
      GreaterThan("c", new java.math.BigDecimal("1.49")), v))
    assert(!eval1(DecimalType(10, 2),
      GreaterThan("c", new java.math.BigDecimal("1.50")), v))
  }
}
