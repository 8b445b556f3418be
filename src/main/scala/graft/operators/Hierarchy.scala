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
  *
  * SQL face: Spark 4.1 ships native `WITH RECURSIVE` (`UnionLoop`), so
  * warehouse SQL arriving from CONNECT BY / recursive CTEs runs as-is
  * through `spark.sql` — SqlParitySpec pins that a `UNION ALL`
  * recursion + outer `SELECT DISTINCT` equals [[ancestors]] exactly.
  * This operator remains the SCALE face: Spark's loop supports `UNION
  * ALL` only, so path multiplicity compounds inside the recursion on
  * shared-ancestry DAGs, while the per-depth `distinct` here bounds
  * every frontier by the true closure slice. No separate
  * GraftExtensions table function is registered — a whole-relation
  * iterative plan is the [[SequencePacker]] exclusion class, and the
  * native CTE already covers the SQL entry point.
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

  /** (node, ancestor, depth, path) — one row PER PATH, the
    * `SYS_CONNECT_BY_PATH` surface: `path` is the upward chain
    * `node<sep>…<sep>ancestor`, and a DAG with two routes to the same
    * ancestor yields two rows (recursive-CTE `UNION ALL` semantics —
    * path MULTIPLICITY, where [[ancestors]] collapses to the distinct
    * closure). Same iterative frontier machinery and loud `maxDepth`
    * failure; note the frontier here is bounded by PATH counts, which
    * compound on dense shared-ancestry DAGs — reach for [[ancestors]]
    * unless the routes themselves are the question. */
  def paths(
      edges: DataFrame, childCol: String, parentCol: String,
      sep: String = "/", maxDepth: Int = 30): DataFrame = {
    require(maxDepth >= 1, s"need maxDepth >= 1, got $maxDepth")
    val e = edges.select(col(childCol).as("child"), col(parentCol).as("parent"))
      .distinct().localCheckpoint(false)
    var frontier = e.select(col("child").as("node"), col("parent").as("ancestor"),
        lit(1).as("depth"),
        concat(col("child"), lit(sep), col("parent")).as("path"))
      .localCheckpoint(false)
    val frontiers = scala.collection.mutable.ListBuffer(frontier)
    var depth = 1
    var n = frontier.count()
    while (n > 0 && depth <= maxDepth) {
      depth += 1
      frontier = frontier
        .join(e.hint("shuffle_hash"), frontier("ancestor") === e("child"))
        .select(frontier("node"), e("parent").as("ancestor"),
          lit(depth).as("depth"),
          concat(frontier("path"), lit(sep), e("parent")).as("path"))
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

  /** (node, descendant, depth) — the transpose of [[ancestors]]: every
    * node reachable DOWNWARD from each node, depth 1 = direct child.
    * Same iterative frontier-join machinery, same distinct-per-depth
    * UNION semantics, same loud failure past `maxDepth`. */
  def descendants(
      edges: DataFrame, childCol: String, parentCol: String,
      maxDepth: Int = 30): DataFrame =
    ancestors(edges, childCol, parentCol, maxDepth)
      .select(col("ancestor").as("node"), col("node").as("descendant"),
        col("depth"))

  /** Hierarchical subtree aggregate — the account-rollup query every
    * warehouse migration carries (`CONNECT BY` + `SUM` over the
    * subtree): for EVERY hierarchy node, the count and exact sum of
    * `valueCol` over all facts attached to the node itself or any of
    * its descendants. Output: (node, subtree_count, subtree_value),
    * one row per hierarchy node — nodes with an empty fact subtree
    * report (0, 0.0), they are not dropped.
    *
    * Scale shape, in order: (1) facts pre-aggregate to ONE partial row
    * per fact node (map-side combinable; decimal partials keep the sum
    * exact and partition-order independent, the [[graft.core.Exact]]
    * discipline) — the closure fan-out below multiplies node partials
    * × depth, never raw facts × depth; (2) the descendant closure
    * collapses to DISTINCT (node, descendant) pairs — in a DAG a
    * descendant reachable at two depths must contribute its facts
    * ONCE — plus a depth-0 self pair per node; (3) one keyed join of
    * pairs against the partials and one re-aggregate by node. Every
    * exchange is keyed (descendant, then node); nothing is
    * corpus-wide. */
  def subtreeRollup(
      edges: DataFrame, childCol: String, parentCol: String,
      facts: DataFrame, factNodeCol: String, valueCol: String,
      maxDepth: Int = 30): DataFrame = {
    val partials = facts
      .groupBy(col(factNodeCol).as("descendant"))
      .agg(count(lit(1)).as("__cnt"), sum(graft.core.Exact.dec(col(valueCol))).as("__val"))
    val e = edges.select(col(childCol).as("child"), col(parentCol).as("parent"))
    val selfPairs = e.select(col("child").as("node"))
      .unionByName(e.select(col("parent").as("node")))
      .distinct()
      .withColumn("descendant", col("node"))
    val pairs = descendants(edges, childCol, parentCol, maxDepth)
      .select(col("node"), col("descendant")).distinct()
      .unionByName(selfPairs)
    pairs
      .join(partials.hint("shuffle_hash"), Seq("descendant"), "left")
      .groupBy(col("node"))
      .agg(coalesce(sum(col("__cnt")), lit(0L)).as("subtree_count"),
        coalesce(sum(col("__val")).cast("double"), lit(0.0)).as("subtree_value"))
  }
}
