package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hash-to-min connected components: chains collapse transitively,
  * disjoint components stay apart, labels are the component minimum. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "cc-test")

  def comps(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive chain collapses to one component labeled by its min") {
    // 5-4, 4-3, 3-2, 2-1: a chain needs multiple propagation rounds
    val m = comps((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate labels") {
    val m = comps((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L))
    assert(m(2L) == 1L && m(12L) == 10L && m(21L) == 20L)
    assert(Set(m(1L), m(10L), m(20L)).size == 3)
  }

  test("edge direction does not matter") {
    assert(comps((2L, 1L), (2L, 3L)) == comps((1L, 2L), (3L, 2L)))
  }
}
