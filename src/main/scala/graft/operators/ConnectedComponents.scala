package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — turns the output of any
  * near-duplicate detector ([[MinHashLSH]], [[SimHash]],
  * [[SetSimilarityJoin]], cosine pairs) into dedup CLUSTERS, so a
  * pipeline can keep one representative per component rather than per
  * pair (pairs alone under-delete: a~b and b~c must collapse to one
  * survivor even when a~c was never emitted).
  *
  * Algorithm: hash-to-min label propagation. Every node starts labeled
  * with its own id; each round every node takes the min label among
  * itself and its neighbors; at fixpoint the label is the component's
  * minimum id. Each round is one shuffle join + one min-aggregate —
  * both map-side combinable — and lineage is truncated per round
  * (`localCheckpoint`), which is what keeps an iterative dataflow
  * re-plannable at scale instead of growing an O(rounds)-deep plan.
  * Rounds needed = graph diameter; near-dup graphs are
  * small-diameter (clusters of mutually-similar docs), so this
  * converges in 2-4 rounds. For adversarially long chains swap the
  * step for large-star/small-star (Kiveris et al., SOCC'14) — the
  * driver loop and convergence test stay the same.
  */
object ConnectedComponents {

  /** (id, component) for every node in `edges` (src, dst), where
    * component = smallest id in the node's connected component.
    * Isolated nodes can be appended by the caller (their component is
    * themselves). */
  def components(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .cache()
    // fuse round 1 into init: label(id) = min(id, neighbors) needs only
    // the groupBy the node list requires anyway
    var labels = sym.groupBy(col("a").as("id"))
      .agg(min(least(col("a"), col("b"))).as("comp"))
      .localCheckpoint()
    // Σcomp strictly decreases until the fixpoint, so one cheap exact
    // aggregate replaces a join-based changed-count per round (decimal:
    // a 2^63-scale node-id sum must not overflow)
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = checksum(labels)
    var iter = 1
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("a"), col("comp")), "a")
        .groupBy(col("b").as("id"))
        .agg(min(col("comp")).as("nbr_comp"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint()
      val cur = checksum(next)
      labels = next
      converged = cur.compareTo(prev) == 0
      prev = cur
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
