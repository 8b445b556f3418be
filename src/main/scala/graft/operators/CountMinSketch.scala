package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — fixed-size approximate counting for heavy-count
  * queries at corpus scale (Cormode–Muthukrishnan): an R×W counter
  * matrix where every occurrence of item x increments one cell per
  * row (position = row-salted hash of x), and a point estimate is the
  * MIN over rows. One-sided error: estimates never UNDER-count (every
  * cell the item hashes to holds at least its true count), and
  * over-count only by colliding mass — expected ≤ N/W per row, driven
  * down exponentially by the min over R rows.
  *
  * Where exact counting (`hh1`'s groupBy) shuffles the full item
  * domain, the sketch is CONSTANT-size: the build is one combinable
  * (row, pos)-keyed sum whose result is ≤ R·W cells regardless of
  * corpus or vocabulary size — the 100-TB shape for "how often does
  * each of THESE items occur" when the domain is unbounded (URL
  * frequencies, n-gram counts for LM pruning). Estimates ride into
  * the plan as a literal matrix ([[BloomContamination]]'s discipline):
  * per-row codegen arithmetic, no join.
  *
  * Determinism and oracle-portability: positions come from the same
  * Kirsch–Mitzenmacher family as the minhash/Bloom machinery
  * (h_r = h1 + r·(h2 div 32) mod W over one md5 via
  * [[TextOps.hexHash60Pair]]) — sums are integers, so the sketch, its
  * collisions, and every estimate replay bit-for-bit in the DuckDB
  * mirror. */
object CountMinSketch {

  /** Rows in the matrix. r ≤ 3 keeps h1 + r·(h2 div 32) < 2⁶¹ — the
    * overflow-free pairing bound shared with [[BloomContamination]]. */
  val Rows = 4

  /** Build the R×W matrix (row-major `Array[Long]` of length R·W) over
    * one occurrence per input row of `df(itemCol)`. One combinable
    * keyed sum; the driver collects ≤ R·W cells — sketch-sized, never
    * data-sized. `width` must be a power of two. */
  def build(df: DataFrame, itemCol: String, width: Int): Array[Long] = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
    require(Rows.toLong * width <= (1 << 24),
      s"matrix $Rows x $width too large to embed as a plan literal")
    val cells = df
      .select(TextOps.hexHash60Pair(col(itemCol)).as("hp"))
      .select(col("hp")(0).as("h1"), shiftright(col("hp")(1), 5).as("h2d"))
      .select(explode(array((0 until Rows).map(r => struct(
        lit(r).as("r"),
        ((col("h1") + lit(r.toLong) * col("h2d")) % lit(width.toLong)).as("pos"))): _*))
        .as("c"))
      .groupBy(col("c.r"), col("c.pos")).agg(count(lit(1)).as("n"))
      .collect()
    val m = new Array[Long](Rows * width)
    cells.foreach(r => m(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    m
  }

  /** Sketches over disjoint data merge by cell-wise addition —
    * sketch(A ⊎ B) == merge(sketch(A), sketch(B)) EXACTLY (sums
    * commute), which is what makes the structure shardable: build one
    * sketch per partition/day/source and fold. Both operands must
    * share R and W. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"cannot merge sketches of different widths: ${a.length} vs ${b.length}")
    Array.tabulate(a.length)(i => a(i) + b(i))
  }

  /** JVM mirror of the cell addressing [[build]] uses — the exact
    * (row-major) cell indexes one occurrence of `item` increments.
    * Single definition point for the hash family on the JVM side
    * (same md5 pair, h2 div 32, mod W as the column faces), so
    * incremental holders of a sketch — the state-store variant in
    * [[graft.streaming.StreamingHeavyHitters.sketchCounts]] — stay
    * bit-compatible with batch-built matrices (CmsSpec pins it). */
  def cellsJvm(item: String, width: Int): Array[Int] = {
    val hp = graft.plans.HexHash60Pair.hashPair(
      org.apache.spark.unsafe.types.UTF8String.fromString(item))
    val h1 = hp.getLong(0)
    val h2d = hp.getLong(1) >>> 5
    Array.tabulate(Rows)(r =>
      (r.toLong * width + (h1 + r * h2d) % width).toInt)
  }

  /** JVM point estimate over a row-major matrix: min over the R
    * salted cells — the [[estimate]] arithmetic off-plan. */
  def estimateJvm(matrix: Array[Long], item: String, width: Int): Long =
    cellsJvm(item, width).map(matrix).min

  /** Matrices at or under this cell count embed as a plan literal
    * (codegen'd `element_at`, ≤ 128 KB serialized — inside the repo's
    * measured ≲100 KB-ish plan-literal comfort zone); wider matrices
    * route through the broadcast-UDF path below. */
  val LiteralCells = 1 << 14

  /** Point estimate for `item`: min over the R salted cells. Always ≥
    * the item's true occurrence count in the sketched data; ≤ true +
    * colliding mass.
    *
    * Two physical faces, one semantics: a matrix ≤ [[LiteralCells]]
    * rides into the plan as a `typedlit` (pure codegen arithmetic, no
    * join, no driver state at execution); a wider one ships ONCE per
    * executor as a `sparkContext.broadcast` probed inside a UDF — the
    * [[ShardManifest]] discipline, because a multi-MB plan literal
    * re-deserializes inside EVERY task binary (measured at ~3 s/job for
    * 4 MB × 32 tasks). The UDF mirrors the literal path's arithmetic
    * exactly (same md5 pair, h2 div 32, mod W, min over rows), so the
    * two faces are bit-identical — CmsSpec proves it per width. No SQL
    * registration (GraftExtensions carries only PURE functions of row
    * values; an estimate is parameterized by a driver-built matrix, so
    * its SQL face would need a temp-view join, not a function). */
  def estimate(item: Column, matrix: Array[Long], width: Int): Column = {
    require(matrix.length == Rows * width,
      s"matrix length ${matrix.length} != $Rows x $width")
    if (matrix.length <= LiteralCells) estimateLiteral(item, matrix, width)
    else estimateBroadcast(item, matrix, width)
  }

  /** Literal face: codegen'd `element_at` over a `typedlit`. The
    * explicit null guard matters: `element_at` over a containsNull=false
    * literal array returns 0 — not NULL — for a NULL index, so without
    * it a null item would "estimate" 0 here while the broadcast face
    * (correctly) returns null. */
  private[operators] def estimateLiteral(
      item: Column, matrix: Array[Long], width: Int): Column = {
    val mLit = typedlit(matrix.toSeq)
    val hp = TextOps.hexHash60Pair(item)
    val h1 = hp(0)
    val h2d = shiftright(hp(1), 5)
    val minCell = (0 until Rows).map { r =>
      val pos = (h1 + lit(r.toLong) * h2d) % lit(width.toLong)
      element_at(mLit, (lit(r.toLong * width) + pos + 1).cast("int"))
    }.reduce(least(_, _))
    when(hp.isNull, lit(null).cast("long")).otherwise(minCell)
  }

  /** Broadcast face: bits ship once per executor, probed in a UDF. */
  private[operators] def estimateBroadcast(
      item: Column, matrix: Array[Long], width: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bc = spark.sparkContext.broadcast(matrix)
    val w = width.toLong
    val est = udf { (s: String) =>
      if (s == null) null.asInstanceOf[java.lang.Long]
      else {
        val m = bc.value
        val hp = graft.plans.HexHash60Pair.hashPair(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
        val h1 = hp.getLong(0)
        val h2d = hp.getLong(1) >>> 5
        var best = Long.MaxValue
        var r = 0
        while (r < Rows) {
          val pos = (h1 + r * h2d) % w
          val v = m(r * width + pos.toInt)
          if (v < best) best = v
          r += 1
        }
        java.lang.Long.valueOf(best)
      }
    }
    est(item.cast("string"))
  }
}
