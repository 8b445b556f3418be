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
  * Two algorithms:
  *  - [[components]] — hash-to-min label propagation: one shuffle join +
  *    one min-aggregate per round; rounds = graph diameter. Near-dup
  *    graphs are small-diameter (clusters of mutually-similar docs plus
  *    member→representative stars), so this converges in 2-4 rounds and
  *    is the fast path.
  *  - [[componentsStar]] — alternating large-star/small-star edge
  *    rewriting (Kiveris et al., "Connected Components in MapReduce and
  *    Beyond", SoCC'14): O(log n) rounds regardless of diameter, two
  *    shuffles per round. The right choice for long-chain graphs
  *    (lineage chains, session stitching) where diameter ≫ log n.
  *
  * Both truncate lineage per round (`localCheckpoint`) — what keeps an
  * iterative dataflow re-plannable at scale instead of growing an
  * O(rounds)-deep plan — and both FAIL LOUDLY if the iteration cap is
  * hit before the fixpoint: silently returning unconverged labels would
  * hand the caller wrong cluster ids.
  */
object ConnectedComponents {

  /** (id, component) for every node in `edges` (src, dst), where
    * component = smallest id in the node's connected component.
    * Isolated nodes can be appended by the caller (their component is
    * themselves). Runs at most `maxIter` propagation rounds beyond the
    * fused init round; throws if the fixpoint is not reached (use
    * [[componentsStar]] for graphs whose diameter exceeds any sane
    * round count).
    *
    * Size-gated fast path (same pattern as the d5 brute-force gate):
    * near-dup REP graphs are orders of magnitude below corpus size —
    * usually a few thousand edges even when the corpus is billions of
    * documents — and every distributed round costs a full job of
    * scheduling latency that dwarfs the actual work. When the deduped
    * symmetric edge list is at most `localEdgeCap` rows (default 2¹⁸ —
    * ~4 MB of primitive (long, long) pairs plus an unboxed LongMap of
    * the same order, checked by an exact count first), labels come from
    * a driver-side union-find in one collect instead of O(diameter)
    * tiny jobs. Identical labels by construction (min id per
    * component); the distributed loop is unchanged beyond the cap, so
    * the 100 TB shape still never materializes a graph driver-side.
    * Pass `localEdgeCap = 0` to force the distributed loop.
    *
    * Ids must be integral (byte/short/int/long — cast to long on
    * entry, so both paths emit LongType labels and agree exactly).
    * Non-integral ids are rejected loudly: a silent `cast("long")` of
    * string/uuid ids would null out under non-ANSI configs and the
    * distributed loop would then converge on garbage null labels (the
    * earlier cast-free loop was no better — its decimal convergence
    * checksum threw mid-iteration on non-numeric ids) — map such ids
    * through `hex_hash60` or `monotonically_increasing_id` first. */
  def components(
      edges: DataFrame, maxIter: Int = 30,
      localEdgeCap: Long = 1L << 18): DataFrame = {
    Seq("src", "dst").foreach { c =>
      val t = edges.schema(c).dataType
      require(Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(t),
        s"components: edge column '$c' must be integral, got $t — hash or " +
          "index non-integral ids to longs first (hex_hash60, " +
          "monotonically_increasing_id)")
    }
    val sym = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .unionByName(
        edges.select(col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .distinct()
      .cache()
    if (localEdgeCap > 0 && sym.count() <= localEdgeCap) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      // iterative find + full path compression: a union-by-min forest
      // can chain O(n) deep, so a recursive find would blow the stack
      // near the cap
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      import edges.sparkSession.implicits._
      sym.as[(Long, Long)].collect().foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toSeq.sorted.map(x => (x, find(x)))
      sym.unpersist()
      return labels.toDF("id", "comp")
    }
    // fuse round 1 into init: label(id) = min(id, neighbors) needs only
    // the groupBy the node list requires anyway. Checkpoints are LAZY:
    // the checksum action below materializes them, so each round costs
    // one job (truncate-lineage + converge-check fused), not two.
    var labels = sym.groupBy(col("a").as("id"))
      .agg(min(least(col("a"), col("b"))).as("comp"))
      .localCheckpoint(false)
    // Σcomp strictly decreases until the fixpoint, so one cheap exact
    // aggregate replaces a join-based changed-count per round (decimal:
    // a 2^63-scale node-id sum must not overflow; ZERO for an empty
    // graph — sum-of-nothing is SQL-null and must not NPE the compare)
    def checksum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prev = checksum(labels)
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
        .localCheckpoint(false) // materialized by the checksum action
      val cur = checksum(next)
      labels = next
      converged = cur.compareTo(prev) == 0
      prev = cur
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents.components did not converge in $maxIter rounds " +
          "(graph diameter exceeds the cap) — raise maxIter or use " +
          "componentsStar, whose round count is O(log n) regardless of diameter")
    labels
  }

  /** (id, component) via alternating large-star/small-star rewriting —
    * O(log n) rounds on any graph shape.
    *
    * large-star: every node u with neighborhood Γ(u) and
    * m = min(Γ(u) ∪ {u}) re-attaches its LARGER neighbors to m.
    * small-star: every edge hangs off its larger endpoint u; u and its
    * smaller neighbors all re-attach to the minimum. Both steps preserve
    * connectivity; at the fixpoint every component is a star rooted at
    * its minimum id. Each step is one groupBy-min plus one keyed join
    * (map-side combinable; no neighborhood is ever collected into one
    * row, so a 10⁶-degree hub never builds a 10⁶-element array).
    *
    * Convergence check: edge endpoints only ever decrease, so the
    * (count, Σ(a+b)) pair is unchanged iff the edge set is unchanged —
    * two scalar aggregates per round, no join-based set compare. */
  def componentsStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // materialized by the stats action

    def stats(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum((col("a") + col("b")).cast("decimal(38,0)"))).head
      (r.getLong(0), r.getDecimal(1))
    }

    var prev = stats(e)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIter) {
      // large-star: for each u, m(u) = min(Γ(u) ∪ {u}); larger
      // neighbors v > u re-attach as (m(u), v)
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      // small-star: each edge (a < b) hangs off b; m(b) = min over the
      // smaller neighborhood; b and its smaller neighbors re-attach to m
      val smins = large.groupBy(col("b").as("u")).agg(min(col("a")).as("m"))
      val small = large.select(col("b").as("u"), col("a").as("v"))
        .join(smins, "u")
        .select(col("m").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .unionByName(smins.select(col("m").as("a"), col("u").as("b")))
        .distinct()
        .localCheckpoint(false) // materialized by the stats action
      val cur = stats(small)
      e = small
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents.componentsStar did not converge in $maxIter rounds")
    // fixpoint edge set is (root, member) stars; roots label themselves
    e.select(col("b").as("id"), col("a").as("comp"))
      .unionByName(e.select(col("a").as("id"), col("a").as("comp")))
      .distinct()
  }
}
