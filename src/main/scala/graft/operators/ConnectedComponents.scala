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
    val spark = edges.sparkSession
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .cache()
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
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
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
