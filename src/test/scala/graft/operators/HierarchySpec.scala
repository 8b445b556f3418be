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
