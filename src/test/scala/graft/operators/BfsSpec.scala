package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cycle-safe BFS: min-hop distances, multi-source merging, cycle
  * termination, randomized functional-graph differential. */
class BfsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "bfs-test")
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long], maxDepth: Int = 30) =
    Bfs.distances(edges.toDF("src", "dst"), "src", "dst",
        sources.toDF("n"), "n", maxDepth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("cycles terminate; distances are minimal over all routes") {
    // 1→2→3→1 cycle with a spur 3→4; long alternative route 1→5→…→3
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 1L -> 5L, 5L -> 3L)
    assert(run(edges, Seq(1L)) ==
      Map(1L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 3))
  }

  test("multi-source: each node reports the NEAREST source") {
    val chain = (1L until 10L).map(i => i -> (i + 1))
    assert(run(chain, Seq(1L, 8L)) == Map(
      1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 5, 7L -> 6,
      8L -> 0, 9L -> 1, 10L -> 2))
  }

  test("diameter exactly maxDepth is in-bounds; one deeper fails loudly") {
    val chain = (1L to 3L).map(i => i -> (i + 1)) // depth 3 from node 1
    assert(run(chain, Seq(1L), maxDepth = 3)(4L) == 3)
    val e = intercept[IllegalArgumentException](run(chain, Seq(1L), maxDepth = 2))
    assert(e.getMessage.contains("raise the bound"))
  }

  test("high-diameter path graph: diameter ≈ round count, visited stays one bounded frame") {
    // the adversarial shape for the old re-union-all-levels visited set:
    // a path of depth D runs D rounds, so a depth-wide union per round
    // is O(D²) plan/scan overhead; the single maintained visited frame
    // keeps every round at one O(visited) scan with a constant-size plan
    val d = 60L
    val path = (1L to d).map(i => i -> (i + 1))
    assert(run(path, Seq(1L), maxDepth = d.toInt + 1) ==
      (1L to d + 1).map(i => i -> (i - 1).toInt).toMap)
  }

  test("random functional graphs (guaranteed cycles) vs a Scala BFS reference") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      // out-degree 1 everywhere → every walk ends in a cycle
      val edges = (1L to n.toLong).map(i => i -> (1L + rnd.nextInt(n)))
      val sources = (1 to 4).map(_ => 1L + rnd.nextInt(n)).distinct
      val got = run(edges, sources, maxDepth = n + 1)
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val want = scala.collection.mutable.Map[Long, Int]()
      var frontier = sources.toSet
      var d = 0
      while (frontier.nonEmpty) {
        frontier.foreach(v => want.getOrElseUpdate(v, d))
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .filterNot(want.contains)
        d += 1
      }
      assert(got == want.toMap, s"trial $trial (n=$n)")
    }
  }
}
