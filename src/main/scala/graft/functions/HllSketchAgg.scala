package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}

/** [[HyperLogLog]] as a true mergeable AGGREGATE FUNCTION: one
  * aggregation pass with a 256-byte sketch buffer per group, partial
  * sketches max-merged map-side — the shape that matters at scale,
  * where the query-form's two-level groupBy would shuffle a (group ×
  * bucket) row per occupied bucket instead of one small buffer per
  * group per partition.
  *
  * Hash and estimator are shared with [[HyperLogLog]] (same md5-derived
  * 60-bit hash, same fold constants), so `hll(col)` and the SQL
  * pipeline agree bit-for-bit — proven in HllSketchAggSpec.
  */
final class HllSketchAgg extends Aggregator[String, Array[Byte], Double] {
  import HyperLogLog.{M, WBits}

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(buf: Array[Byte], value: String): Array[Byte] = {
    if (value != null) {
      val h = HllSketchAgg.hash60(value)
      val bucket = (h >>> WBits).toInt
      val w = h & ((1L << WBits) - 1)
      val rho =
        if (w == 0L) WBits + 1
        else java.lang.Long.numberOfLeadingZeros(w) - (64 - WBits) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Double = {
    var v = 0
    var numPresent = 0L
    var i = 0
    while (i < M) {
      val r = buf(i)
      if (r > 0) { v += 1; numPresent += 1L << (WBits + 1 - r) }
      i += 1
    }
    HyperLogLog.estimate(v, numPresent)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HllSketchAgg {

  /** Same 60-bit value as [[graft.operators.TextOps.hexHash60]]
    * (first 15 hex chars of md5 = top 60 bits of the digest). */
  private[functions] def hash60(s: String): Long = {
    val d = threadMd5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(bytes).getLong >>> 4
  }

  private val threadMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Untyped column form: `df.agg(HllSketchAgg.hll(col("x")))`. */
  def hll(c: Column): Column = udaf(new HllSketchAgg()).apply(c.cast("string"))

  /** SQL registration: `SELECT hll_distinct(x) FROM t GROUP BY g`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("hll_distinct", udaf(new HllSketchAgg()))

  /** The BUFFER-valued twin — same reduce/merge, finish = the raw
    * 256-byte register array. This is the maintainable form: buffers
    * merge associatively and idempotently (bytewise max), so a stored
    * sketch absorbs a batch sketch with the view's history never
    * re-read — the cheap path for approximate COUNT(DISTINCT) over
    * insert-only streams (the exact path is
    * [[graft.operators.IvmDistinct]]). */
  final class Buf extends Aggregator[String, Array[Byte], Array[Byte]] {
    private val full = new HllSketchAgg()
    override def zero: Array[Byte] = full.zero
    override def reduce(b: Array[Byte], v: String): Array[Byte] = full.reduce(b, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = full.merge(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Per-group sketch buffers of a frame: (groupCols…, hll binary). */
  def sketchOf(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.groupBy(groupCols.map(col): _*)
      .agg(udaf(new Buf()).apply(col(valueCol).cast("string")).as("hll"))
  }

  private val mergeBufsUdf =
    org.apache.spark.sql.functions.udf((a: Array[Byte], b: Array[Byte]) =>
      (a, b) match {
        case (null, x) => x
        case (x, null) => x
        case (x, y) => new HllSketchAgg().merge(x.clone(), y)
      })

  /** Fold an insert batch's sketch into the stored per-group sketches:
    * stored ⊕ batch by bytewise register max — one broadcast join of
    * the batch-group-bounded delta frame against the store (the store
    * is never shuffled), new groups arrive whole. Maintained estimate
    * ≡ the one-shot [[hll]] over all rows ever inserted, bit-for-bit
    * (buffers are associative — HllSketchAggSpec). Deletes have no
    * sketch algebra; a CDC stream needs the exact dictionary path. */
  def foldBuffers(
      stored: Option[org.apache.spark.sql.DataFrame],
      inserts: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val batch = sketchOf(inserts, groupCols, valueCol)
      .withColumnRenamed("hll", "__hll_b")
    stored match {
      case None => batch.withColumnRenamed("__hll_b", "hll")
      case Some(s) =>
        s.join(broadcast(batch), groupCols, "full_outer")
          .select((groupCols.map(col) :+
            mergeBufsUdf(col("hll"), col("__hll_b")).as("hll")): _*)
    }
  }

  /** Estimate a maintained buffer — the same finish as [[hll]]. */
  def estimateOf(c: Column): Column =
    org.apache.spark.sql.functions.udf((buf: Array[Byte]) =>
      new HllSketchAgg().finish(buf)).apply(c)
}
