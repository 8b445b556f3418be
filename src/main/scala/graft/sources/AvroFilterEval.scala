package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Compiler from Catalyst's stable source-filter API
  * (`org.apache.spark.sql.sources.Filter`) to a row-skip predicate the
  * avro decode loop evaluates BEFORE building a row — the filter half
  * of the DSv2 face's pushdown ([[AvroTableProvider]]).
  *
  * Avro container blocks carry no min/max statistics, so this is
  * ROW-skip, not block-skip: every block in the scan range is still
  * decoded record-by-record, but a record failing a pushed predicate
  * converts only the predicate's own columns (cheap boxed compares)
  * and never materializes the rest — the same spirit as the projected
  * reader schema's byte-wise field skip, applied row-wise. All pushed
  * filters are ALSO left residual (Spark re-evaluates them above the
  * scan), so the evaluator only ever needs to be conservative in one
  * direction: it must never DROP a row Spark would keep; keeping an
  * extra row is free.
  *
  * Supported (everything else stays residual-only and is reported
  * un-pushed): Equal/ordering comparisons, In, IsNull/IsNotNull,
  * And/Or/Not over int/long/float/double/string/boolean TOP-LEVEL
  * columns, plus the logical-typed column family the reference's
  * type-stress fixture (`ppl_data_types.sql`) makes the common case
  * for migrated tables — date, timestamp, local timestamp (NTZ), and
  * decimal — each compared through its exact integer/BigDecimal form
  * (epoch days / epoch micros / scale-blind compareTo), never through
  * doubles. Nested fields stay deliberately unsupported. The
  * keep-it-residual contract makes every extension safe: an
  * unrecognized literal shape simply leaves the filter un-pushed.
  * Comparisons follow SQL three-valued logic with unknown → keep
  * (null never satisfies a comparison, so a null cell fails the
  * conjunct; a Not over an unknown child keeps the row for the
  * residual filter to decide).
  */
object AvroFilterEval {

  /** Compiled conjunction: `cols` the distinct name-indexes the
    * predicate reads (convert these first), `eval` over the partially
    * converted row array (unread positions may be null). */
  final case class Pred(cols: Array[Int], eval: Array[Any] => Boolean)
      extends Serializable

  /** Can `f` be evaluated by [[compile]] against `schema`? */
  def supports(f: Filter, schema: StructType): Boolean =
    one(f, schema.fieldNames, schema.fields.map(_.dataType)).isDefined

  /** Compile the supported subset of `filters` into one conjunction;
    * None when nothing is evaluable (the scan then skips nothing). */
  def compile(filters: Seq[Filter], names: Array[String],
      types: Array[DataType]): Option[Pred] = {
    val compiled = filters.flatMap(f => one(f, names, types).map(fn => (f, fn)))
    if (compiled.isEmpty) None
    else {
      val fns = compiled.map(_._2)
      // only the EVALUATED filters' columns need early conversion
      val cols = compiled.flatMap(_._1.references).distinct
        .flatMap(r => names.indexOf(r) match { case -1 => None; case i => Some(i) })
      Some(Pred(cols.toArray, arr => fns.forall(_(arr))))
    }
  }

  private def one(f: Filter, names: Array[String],
      types: Array[DataType]): Option[Array[Any] => Boolean] = {
    def idx(a: String): Option[Int] =
      names.indexOf(a) match { case -1 => None; case i => Some(i) }
    def cmp(a: String, v: Any, test: Int => Boolean): Option[Array[Any] => Boolean] =
      idx(a).flatMap(i => comparator(types(i), v)
        .map(c => arr => arr(i) != null && test(c(arr(i)))))
    f match {
      case EqualTo(a, v) => cmp(a, v, _ == 0)
      case GreaterThan(a, v) => cmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v, _ >= 0)
      case LessThan(a, v) => cmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v, _ <= 0)
      case IsNull(a) => idx(a).map(i => arr => arr(i) == null)
      case IsNotNull(a) => idx(a).map(i => arr => arr(i) != null)
      case In(a, vs) =>
        idx(a).flatMap { i =>
          val cs = vs.toSeq.map(v => comparator(types(i), v))
          if (cs.exists(_.isEmpty)) None
          else {
            val fns = cs.flatten
            Some(arr => arr(i) != null && fns.exists(_(arr(i)) == 0))
          }
        }
      case And(l, r) =>
        for { lf <- one(l, names, types); rf <- one(r, names, types) }
          yield (arr: Array[Any]) => lf(arr) && rf(arr)
      case Or(l, r) =>
        for { lf <- one(l, names, types); rf <- one(r, names, types) }
          yield (arr: Array[Any]) => lf(arr) || rf(arr)
      // safe under three-valued logic: the child returns false on
      // unknown (null), so Not keeps those rows — the residual filter
      // above the scan makes the final call
      case Not(c) => one(c, names, types).map(cf => arr => !cf(arr))
      case _ => None
    }
  }

  /** `value → compare(value, literal)` for a supported (type, literal)
    * pairing; None keeps the filter residual-only. Values are the
    * boxed-JVM shapes the avro `convert` emits for these types.
    *
    * Two semantics traps the evaluator must match Spark on exactly
    * (the never-drop-a-kept-row contract):
    *  - floating point: Spark's comparison treats -0.0 = 0.0 (while
    *    `Double.compare` orders them) — adding 0.0 to both operands
    *    normalizes the negative zero away; NaN needs no fixup
    *    (`Double.compare` already sorts NaN greatest and equal to
    *    itself, Spark's convention);
    *  - strings: Spark orders `UTF8String`s by UTF-8 BYTES (code
    *    points), Java `String.compareTo` by UTF-16 code units — the
    *    two diverge for supplementary characters, so ordering goes
    *    through `UTF8String` on both sides. */
  private def comparator(t: DataType, v: Any): Option[Any => Int] = (t, v) match {
    case (IntegerType | LongType, n: Number) =>
      Some(x => java.lang.Long.compare(x.asInstanceOf[Number].longValue, n.longValue))
    case (FloatType | DoubleType, n: Number) =>
      val lit = n.doubleValue + 0.0
      Some(x => java.lang.Double.compare(x.asInstanceOf[Number].doubleValue + 0.0, lit))
    case (StringType, s: String) =>
      val lit = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      Some(x => org.apache.spark.unsafe.types.UTF8String
        .fromString(x.asInstanceOf[String]).compareTo(lit))
    case (BooleanType, b: java.lang.Boolean) =>
      Some(x => java.lang.Boolean.compare(x.asInstanceOf[java.lang.Boolean], b))
    // logical types: the row side is the exact boxed shape the avro
    // `convert` emits (LocalDate / Instant / LocalDateTime /
    // java.math.BigDecimal); the literal side accepts both the legacy
    // java.sql shapes and the java8 ones (spark.sql.datetime.java8API
    // flips which Catalyst hands to source filters)
    case (DateType, v) =>
      epochDayOf(v).map(lit => x => java.lang.Long.compare(
        x.asInstanceOf[java.time.LocalDate].toEpochDay, lit))
    case (TimestampType, v) =>
      instantMicrosOf(v).map(lit => x => java.lang.Long.compare(
        instantMicros(x.asInstanceOf[java.time.Instant]), lit))
    case (TimestampNTZType, v) =>
      ldtMicrosOf(v).map(lit => x => java.lang.Long.compare(
        ldtMicros(x.asInstanceOf[java.time.LocalDateTime]), lit))
    case (_: DecimalType, v) =>
      bigDecOf(v).map(lit =>
        x => x.asInstanceOf[java.math.BigDecimal].compareTo(lit))
    case _ => None
  }

  /** Epoch micros — getEpochSecond floors and getNano is always in
    * [0, 1e9), so the formula is exact for pre-1970 instants too. */
  private def instantMicros(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000

  private def ldtMicros(l: java.time.LocalDateTime): Long =
    l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000

  private def epochDayOf(v: Any): Option[Long] = v match {
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case _ => None
  }

  private def instantMicrosOf(v: Any): Option[Long] = v match {
    case i: java.time.Instant => Some(instantMicros(i))
    case t: java.sql.Timestamp => Some(instantMicros(t.toInstant))
    case _ => None
  }

  private def ldtMicrosOf(v: Any): Option[Long] = v match {
    case l: java.time.LocalDateTime => Some(ldtMicros(l))
    case _ => None
  }

  private def bigDecOf(v: Any): Option[java.math.BigDecimal] = v match {
    case b: java.math.BigDecimal => Some(b)
    case b: scala.math.BigDecimal => Some(b.bigDecimal)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case _ => None
  }
}
