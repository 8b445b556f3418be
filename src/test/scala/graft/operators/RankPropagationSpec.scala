package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank: hand-computed rounds, sink absorption,
  * bit-level partition invariance, guards. */
class RankPropagationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "rank-prop-test")
  import spark.implicits._

  val S = 1000000L

  def ranksOf(edges: Seq[(Long, Long)], iters: Int, parts: Int = 3): Map[Long, Long] = {
    val df = RankPropagation.fixedPointPageRank(
      edges.toDF("src", "dst").repartition(parts), iters, S)
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.unpersist()
    m
  }

  test("hand-computed two rounds on a three-node graph") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)
    assert(ranksOf(edges, 0) == Map(1L -> S, 2L -> S, 3L -> S))
    // r1: 1 gets base only; 2 gets 17·(10⁶/2)/20; 3 gets 17·(10⁶/2 + 10⁶)/20
    assert(ranksOf(edges, 1) == Map(1L -> 150000L, 2L -> 575000L, 3L -> 1425000L))
    // r2: contributions from r1 ranks (3 is a sink — absorbs, never emits)
    assert(ranksOf(edges, 2) == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("multi-edges are deduplicated; partition invariance is exact") {
    val edges = Seq(1L -> 2L, 1L -> 2L, 1L -> 3L, 2L -> 3L)
    assert(ranksOf(edges, 1) == ranksOf(edges.distinct, 1))
    assert(ranksOf(edges, 2, parts = 1) == ranksOf(edges, 2, parts = 11))
  }

  test("guards: scale must be a positive multiple of 20; iters non-negative") {
    val e = Seq(1L -> 2L).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      RankPropagation.fixedPointPageRank(e, 1, 1000001L)
    }
    intercept[IllegalArgumentException] {
      RankPropagation.fixedPointPageRank(e, -1, S)
    }
  }
}
