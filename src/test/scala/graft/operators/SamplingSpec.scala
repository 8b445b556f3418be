package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling: reproducible across partitionings, k per
  * group, uniform-ish coverage. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "sample-test")

  def data(parts: Int) = {
    import spark.implicits._
    (1 to 1000).map(i => (if (i % 3 == 0) "a" else "b", i.toLong))
      .toDF("g", "id").repartition(parts)
  }

  test("bottomK: same k rows whatever the partitioning") {
    def run(parts: Int) = Sampling.bottomK(data(parts), "id", 25)
      .select("id", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    val a = run(2)
    assert(a == run(16))
    assert(a.length == 25 && a.map(_._2) == (1 to 25))
  }

  test("stratified: exactly k per group, deterministic") {
    def run(parts: Int) = Sampling.stratified(data(parts), Seq("g"), "id", 10)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s = run(3)
    assert(s == run(13))
    assert(s.count(_._1 == "a") == 10 && s.count(_._1 == "b") == 10)
  }

  test("hash order is not id order (actually pseudo-random)") {
    val ids = Sampling.bottomK(data(4), "id", 20)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids != ids.sorted)
  }
}
