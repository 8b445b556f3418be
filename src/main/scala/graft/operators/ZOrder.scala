package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * Range-clustering on ONE column makes that column's per-file min/max
  * tight and every other column's useless; interleaving the bits of
  * several columns makes each file cover a small hyper-rectangle, so
  * parquet footer stats prune files/row-groups for predicates on ANY
  * clustered column — the property lakehouse engines sell as Z-ORDER
  * BY. At 100 TB this is the difference between scanning the whole
  * table and scanning a few percent for a 2-predicate query.
  *
  * The z-value is a pure per-row expression (static shift/mask chain,
  * whole-stage codegen'd); the write is repartitionByRange(z) +
  * sortWithinPartitions(z) — one range shuffle, same cost shape as a
  * plain clustered write.
  */
object ZOrder {

  /** Morton code of `cols`, each first rank-normalized to `bits` via
    * min/max scaling would need a pass; this variant interleaves the
    * RAW low `bits` of non-negative integer columns — right when the
    * columns are already dense ids/ordinals (use [[zValueScaled]] for
    * arbitrary distributions). */
  def zValue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63, "z-value must fit a long")
    val n = cols.size
    val morton = cols.zipWithIndex.map { case (c, ci) =>
      val x = c.cast("long")
      (0 until bits).map { i =>
        // bit i of column ci lands at position i*n + ci
        shiftleft(shiftrightunsigned(x, i).bitwiseAND(1), i * n + ci)
      }.reduce[Column](_ + _)
    }.reduce[Column](_ + _)
    // negative inputs would silently corrupt the code (their high bits
    // alias other columns' positions) — fail loudly, with ONE guard
    // around the whole expression rather than per bit extraction
    val anyNeg = cols.map(_.cast("long") < 0).reduce[Column](_ || _)
    when(anyNeg, raise_error(lit("zValue requires non-negative inputs")))
      .otherwise(morton)
  }

  /** Morton code over VALUE-SPACE-scaled columns: each column is
    * linearly mapped from its [min, max] onto 2^bits buckets (one tiny
    * min/max aggregate, then pure per-row arithmetic — no global
    * window, nothing serializes). Value-space scaling is the right
    * normalization for footer-stat pruning — min/max stats prune in
    * value space — and skewed bucket OCCUPANCY doesn't skew file sizes
    * because the write range-partitions on z afterwards. */
  def zValueScaled(df: DataFrame, colNames: Seq[String], bits: Int = 10): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input / all-null columns yield null aggregates: scaling is
    // then undefined — fail with a message instead of an NPE
    require(!(0 until 2 * colNames.size).exists(stats.isNullAt), {
      val bad = colNames.zipWithIndex.collect {
        case (c, i) if stats.isNullAt(2 * i) => c }
      s"zValueScaled: no non-null values to scale on column(s) ${bad.mkString(", ")}"
    })
    val minMax: Map[String, (Double, Double)] = colNames.zipWithIndex.map {
      case (c, i) => c -> (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }.toMap
    val top = (1 << bits) - 1
    val scaled = colNames.map { c =>
      val (lo, hi) = minMax(c)
      val span = if (hi > lo) hi - lo else 1.0
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * (top + 1)), lit(top))
        .cast("long")
    }
    df.withColumn("z", zValue(scaled, bits))
  }

  /** Write `df` z-ordered on `colNames` into `nFiles` parquet files. */
  def clusteredWrite(
      df: DataFrame, colNames: Seq[String], path: String, nFiles: Int,
      bits: Int = 10): Unit =
    zValueScaled(df, colNames, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
}
