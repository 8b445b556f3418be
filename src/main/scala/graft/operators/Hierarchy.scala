package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening — the warehouse `CONNECT BY` / recursive-CTE
  * surface (org charts, bills of material, account rollups) that Spark
  * SQL lacks natively: from a (child, parent) edge table, the full
  * ancestor closure (node, ancestor, depth ≥ 1).
  *
  * Spark-first shape: the recursion unrolls into iterative rounds of
  * one shuffle-hash join each — frontier(depth k) ⋈ edges extends
  * every path by one hop; rounds stop at the first empty frontier (or
  * fail loudly at `maxDepth`, which also breaks cycles instead of
  * spinning). Lineage is cut per round (`localCheckpoint`, the
  * ConnectedComponents/PageRank discipline) and each round's cost is
  * ∝ the frontier, not the accumulated closure. Depth is bounded by
  * the hierarchy's height (org charts ~10), so the round count — the
  * only serial structure — is small at any corpus size. A DAG with
  * shared descendants yields one row per DISTINCT (node, ancestor,
  * depth) path class, exactly the recursive-CTE `UNION` (not `UNION
  * ALL`) semantics; path multiplicity is a different query.
  */
object Hierarchy {

  /** (node, ancestor, depth) for every ancestor reachable from each
    * node through the (child, parent) edges; depth 1 = direct parent.
    * Depths up to and INCLUDING `maxDepth` are in-bounds: the loop runs
    * one probe round past the deepest non-empty frontier, so a
    * hierarchy whose height equals `maxDepth` exactly succeeds, and
    * only a frontier at depth `maxDepth + 1` — a cycle (every reachable
    * depth would repeat forever) or a hierarchy deeper than the
    * caller's bound — fails loudly.
    *
    * Each round's frontier is materialized once (`localCheckpoint`
    * cuts lineage, the ConnectedComponents/PageRank discipline) and the
    * closure is ONE union of the per-depth frontiers at the end — the
    * accumulated closure is never re-materialized per round, so total
    * materialization is O(closure), not O(depth × closure). The union
    * needs no distinct: each frontier is distinct within its own depth
    * and frontiers carry disjoint depth values. */
  def ancestors(
      edges: DataFrame, childCol: String, parentCol: String,
      maxDepth: Int = 30): DataFrame = {
    require(maxDepth >= 1, s"need maxDepth >= 1, got $maxDepth")
    val e = edges.select(col(childCol).as("child"), col(parentCol).as("parent"))
      .distinct().localCheckpoint(false)
    var frontier = e.select(col("child").as("node"), col("parent").as("ancestor"),
      lit(1).as("depth")).localCheckpoint(false)
    val frontiers = scala.collection.mutable.ListBuffer(frontier)
    var depth = 1
    var n = frontier.count()
    while (n > 0 && depth <= maxDepth) {
      depth += 1
      frontier = frontier
        .join(e.hint("shuffle_hash"), frontier("ancestor") === e("child"))
        .select(frontier("node"), e("parent").as("ancestor"), lit(depth).as("depth"))
        .distinct()
        .localCheckpoint(false)
      n = frontier.count()
      if (n > 0) {
        require(depth <= maxDepth,
          s"hierarchy still growing past depth $maxDepth — cycle, or raise maxDepth")
        frontiers += frontier
      }
    }
    frontiers.reduce(_ unionByName _)
  }
}
