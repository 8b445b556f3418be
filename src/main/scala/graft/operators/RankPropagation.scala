package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative rank propagation over an edge list — PageRank (Brin &
  * Page 1998) in FIXED-POINT integer arithmetic: ranks are integers
  * scaled by `scale`, each round is
  *
  *   rank'(v) = 0.15·scale + (17 · Σ_{u→v} (rank(u) div outdeg(u))) div 20
  *
  * i.e. damping 0.85 as the exact rational 17/20 with floor division
  * at the two defined points. The fixed-point discipline is what the
  * float version cannot give: partition-order-free (integer sums),
  * bit-reproducible across engines (DuckDB replays rounds as chained
  * CTEs — the d6/n5/pt1 family), and drift-free over any number of
  * rounds. Dangling mass is deliberately NOT redistributed (documented
  * variant: sinks absorb; ranks remain a valid relative ordering,
  * which is what curation uses rank propagation for — spreading
  * quality/trust signals over link or similarity graphs).
  *
  * Scale shape per round: one shuffle-hash join of ranks onto edges by
  * src (+ broadcast-sized outdegree table joined the same way), one
  * map-side-combinable sum by dst, one left join back to the node set
  * — the [[Similarity.kmeansCentroids]] iteration discipline, with
  * per-round cache materialization keeping lineage one round deep.
  * Nothing is ever collected to the driver.
  */
object RankPropagation {

  /** `iters` fixed-point PageRank rounds over (src, dst) edges
    * (deduplicated here — multi-edges would double-count
    * contributions). Returns (node, rank), nodes = src ∪ dst, every
    * rank ≥ 0. The returned frame is cached — `unpersist()` when
    * consumed. */
  def fixedPointPageRank(edges: DataFrame, iters: Int, scale: Long): DataFrame = {
    require(iters >= 0, s"need iters >= 0, got $iters")
    require(scale >= 20 && scale % 20 == 0,
      s"scale must be a positive multiple of 20 (0.15·scale and the 17/20 damping must be exact), got $scale")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    try {
      e.count()
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      // the seed is NOT counted: its lineage is one projection over
      // the cached edge set, so materializing it would only add a job
      // — round 1 reads it straight off the cache
      var ranks = nodes.withColumn("rank", lit(scale)).cache()
      val base = scale * 3 / 20
      try {
        for (_ <- 1 to iters) {
          val contrib = e
            .join(ranks.select(col("node").as("src"), col("rank")).hint("shuffle_hash"),
              Seq("src"))
            .join(outdeg.hint("shuffle_hash"), Seq("src"))
            .select(col("dst").as("node"), expr("rank div deg").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("inr"))
          val next = nodes
            .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
            .select(col("node"),
              (lit(base) + expr("(17 * coalesce(inr, 0L)) div 20")).as("rank"))
            .cache()
          try next.count()
          catch { case t: Throwable => next.unpersist(); throw t }
          ranks.unpersist()
          ranks = next
        }
        ranks
      } catch {
        // the current round's cache must not outlive a failed call —
        // the caller gets no handle to release it
        case t: Throwable => ranks.unpersist(); throw t
      }
    } finally e.unpersist()
  }
}
