package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ancestor closure: chain depths, DAG dedup per (node, ancestor,
  * depth), loud cycle failure. */
class HierarchySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "hier-test")
  import spark.implicits._

  private def closure(edges: Seq[(String, String)], maxDepth: Int = 30) =
    Hierarchy.ancestors(edges.toDF("child", "parent"), "child", "parent", maxDepth)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("chain: every ancestor at its exact depth") {
    val got = closure(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(got == Set(
      ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
      ("a", "c", 2), ("b", "d", 2),
      ("a", "d", 3)))
  }

  test("DAG: two same-length paths collapse to one closure row (UNION semantics)") {
    // a → {l, r} → t: two depth-2 paths a→t, one row
    val got = closure(Seq("a" -> "l", "a" -> "r", "l" -> "t", "r" -> "t"))
    assert(got == Set(
      ("a", "l", 1), ("a", "r", 1), ("l", "t", 1), ("r", "t", 1),
      ("a", "t", 2)))
  }

  test("forest: disjoint trees never cross; duplicate edges are deduped") {
    val got = closure(Seq("a" -> "b", "a" -> "b", "x" -> "y"))
    assert(got == Set(("a", "b", 1), ("x", "y", 1)))
  }

  test("cycle fails loudly instead of spinning") {
    val e = intercept[IllegalArgumentException](
      closure(Seq("a" -> "b", "b" -> "a"), maxDepth = 5))
    assert(e.getMessage.contains("cycle"))
  }

  test("descendants is the exact transpose of ancestors") {
    val edges = Seq("a" -> "b", "b" -> "c", "x" -> "c")
    val anc = closure(edges)
    val got = Hierarchy.descendants(edges.toDF("child", "parent"), "child", "parent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == anc.map { case (n, a, d) => (a, n, d) })
  }

  test("subtreeRollup: exact sums per subtree, empty-subtree nodes kept at 0, DAG facts counted once") {
    import spark.implicits._
    // diamond DAG: d is reachable from a via both l and r — d's fact
    // must contribute to a exactly once
    val edges = Seq(("l", "a"), ("r", "a"), ("d", "l"), ("d", "r"), ("e", "l"))
      .toDF("child", "parent")
    val facts = Seq(("d", 10.5), ("d", 2.25), ("e", 4.0), ("a", 1.0))
      .toDF("fnode", "v")
    val got = Hierarchy.subtreeRollup(edges, "child", "parent", facts, "fnode", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "a" -> ((4L, 17.75)), // own 1.0 + d 12.75 (once) + e 4.0
      "l" -> ((3L, 16.75)),
      "r" -> ((2L, 12.75)),
      "d" -> ((2L, 12.75)),
      "e" -> ((1L, 4.0))))
  }

  test("subtreeRollup vs a brute-force reach reference on random DAGs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 2) {
      val n = 12 + rnd.nextInt(8)
      // parent indexes always lower → acyclic
      val edges = (1 until n).flatMap { c =>
        (0 until (1 + rnd.nextInt(2))).map(_ => (s"v$c", s"v${rnd.nextInt(c)}"))
      }.distinct
      val facts = (0 until n).filter(_ => rnd.nextBoolean())
        .map(i => (s"v$i", (rnd.nextInt(1000) * 0.25)))
      val got = Hierarchy.subtreeRollup(edges.toDF("child", "parent"), "child",
          "parent", facts.toDF("fnode", "v"), "fnode", "v")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // reference: BFS reach-down sets
      val down = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      def reach(s: String): Set[String] = {
        var seen = Set(s); var fr = Set(s)
        while (fr.nonEmpty) {
          fr = fr.flatMap(x => down.getOrElse(x, Set.empty)) -- seen
          seen ++= fr
        }
        seen
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val fmap = facts.groupBy(_._1)
      val want = nodes.map { nd =>
        val fs = reach(nd).toSeq.flatMap(x => fmap.getOrElse(x, Nil))
        nd -> ((fs.size.toLong, fs.map(f => BigDecimal(f._2)).sum.toDouble))
      }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("paths: one row per route with the full chain; DAG multiplicity preserved") {
    import spark.implicits._
    // diamond: a→{l,r}→t — TWO depth-2 routes a→t, distinct paths
    val edges = Seq(("a", "l"), ("a", "r"), ("l", "t"), ("r", "t"))
      .toDF("child", "parent")
    val got = Hierarchy.paths(edges, "child", "parent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("a", "l", 1, "a/l"), ("a", "r", 1, "a/r"),
      ("l", "t", 1, "l/t"), ("r", "t", 1, "r/t"),
      ("a", "t", 2, "a/l/t"), ("a", "t", 2, "a/r/t")))
    // …and the SAME DAG collapses to one closure row in ancestors
    assert(Hierarchy.ancestors(edges, "child", "parent")
      .filter($"node" === "a" && $"ancestor" === "t").count() == 1)
    // custom separator honored
    assert(Hierarchy.paths(edges, "child", "parent", sep = ">")
      .filter($"depth" === 2).collect().map(_.getString(3)).toSet ==
      Set("a>l>t", "a>r>t"))
  }

  test("height exactly maxDepth is in-bounds (one probe round past it)") {
    // chain a→b→c→d has height 3: depth-3 closure row must be reachable
    // with maxDepth = 3 (the pre-fix loop rejected it as still-growing)
    val got = closure(Seq("a" -> "b", "b" -> "c", "c" -> "d"), maxDepth = 3)
    assert(got.contains(("a", "d", 3)))
    // one deeper than the bound still fails loudly
    val e = intercept[IllegalArgumentException](
      closure(Seq("a" -> "b", "b" -> "c", "c" -> "d"), maxDepth = 2))
    assert(e.getMessage.contains("raise maxDepth"))
  }
}
