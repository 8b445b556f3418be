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

  /** Plan-literal point estimate for `item`: min over the R salted
    * cells. Always ≥ the item's true occurrence count in the sketched
    * data; ≤ true + colliding mass. */
  def estimate(item: Column, matrix: Array[Long], width: Int): Column = {
    require(matrix.length == Rows * width,
      s"matrix length ${matrix.length} != $Rows x $width")
    val mLit = typedlit(matrix.toSeq)
    val hp = TextOps.hexHash60Pair(item)
    val h1 = hp(0)
    val h2d = shiftright(hp(1), 5)
    (0 until Rows).map { r =>
      val pos = (h1 + lit(r.toLong) * h2d) % lit(width.toLong)
      element_at(mLit, (lit(r.toLong * width) + pos + 1).cast("int"))
    }.reduce(least(_, _))
  }
}
