package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a general DIRECTED edge table —
  * the graph-traversal face [[Hierarchy]] deliberately lacks:
  * `ancestors` is DAG-only (a cycle is a loud error there because a
  * closure over it is infinite), while BFS with a visited set is
  * CYCLE-SAFE — a frontier node already seen is dropped, so the walk
  * terminates on any graph and every reachable node reports its
  * MINIMUM hop count from the nearest source (level-synchronous
  * expansion makes first-visit = min-dist, the textbook invariant).
  *
  * Spark-first shape: per level, one shuffle-hash join
  * (frontier ⋈ edges) + distinct + one anti-join against the visited
  * set; levels are `localCheckpoint`ed once and never re-materialized
  * (the round-10 Hierarchy discipline). The visited set is maintained
  * as ONE checkpointed frame folded forward per round (the
  * StreamingScd2 closed/open discipline) — the anti-join reads a
  * single O(visited) scan with a constant-size plan, instead of
  * re-unioning every prior level (a depth-wide union whose plan and
  * scan count grow with the round number: on a high-diameter graph —
  * path-like, diameter D — that shape degrades to O(D²) plan/scan
  * overhead; this one stays one scan per round at any diameter, see
  * BfsSpec's path-graph case). Reaching `maxDepth` with a live
  * frontier fails loudly: the graph's diameter exceeds the caller's
  * bound (cycles can no longer cause it — the visited set already
  * absorbs them). */
object Bfs {

  /** (node, dist): dist = fewest hops from any source node (0 for the
    * sources themselves); unreachable nodes are absent. Depths up to
    * and including `maxDepth` are in-bounds (one probe level past the
    * deepest non-empty frontier, the [[Hierarchy.ancestors]]
    * contract). */
  def distances(
      edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, nodeCol: String, maxDepth: Int = 30): DataFrame = {
    require(maxDepth >= 1, s"need maxDepth >= 1, got $maxDepth")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    var frontier = sources.select(col(nodeCol).as("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint(false)
    val levels = scala.collection.mutable.ListBuffer(frontier)
    // one frame, re-checkpointed as it grows: each round's anti-join is
    // a single visited-sized scan regardless of how many rounds ran
    var visited = frontier.select(col("node")).localCheckpoint(false)
    var depth = 0
    var n = frontier.count()
    while (n > 0 && depth <= maxDepth) {
      depth += 1
      frontier = frontier
        .join(e.hint("shuffle_hash"), frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(false)
      n = frontier.count()
      if (n > 0) {
        require(depth <= maxDepth,
          s"graph deeper than maxDepth $maxDepth from the sources — raise the bound")
        levels += frontier
        // EAGER checkpoint, then release the superseded frame (the
        // TrainPipeline discipline): a local checkpoint has no lineage,
        // so the old blocks must outlive the new frame's materialization
        // — and without the release, a diameter-D run would pin O(D·V)
        // superseded block-manager bytes for the walk's duration.
        val prev = visited
        visited = visited.unionByName(frontier.select(col("node")))
          .localCheckpoint(true)
        prev.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(_.unpersist(false))
      }
    }
    levels.reduce(_ unionByName _)
  }
}
