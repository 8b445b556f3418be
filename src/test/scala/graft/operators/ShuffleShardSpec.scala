package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic shuffle-sharding: reproducible placement, dense
  * positions, balanced shards, ordered shard files. */
class ShuffleShardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "shuffle-shard-test")
  import spark.implicits._

  def ids(n: Int, parts: Int = 4) =
    (1L to n.toLong).toDF("id").repartition(parts)

  test("assignment is deterministic and partition-invariant") {
    def run(parts: Int) = ShuffleShard.assign(ids(500, parts), "id", 8, seed = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(2) == run(17))
  }

  test("positions are dense 0..n-1 within each shard; shards roughly balanced") {
    val rows = ShuffleShard.assign(ids(1000), "id", 8, seed = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { s =>
      assert(s.map(_._2).sorted.toSeq == (0L until s.size))
    }
    // multinomial balance: each shard within ±50% of the mean
    assert(byShard.values.forall(s => s.size > 62 && s.size < 188))
  }

  test("appending rows never moves an existing row to a different shard") {
    val before = ShuffleShard.assign(ids(300), "id", 8, seed = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val after = ShuffleShard.assign(ids(600), "id", 8, seed = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(before.forall { case (id, s) => after(id) == s })
  }

  test("hash order decorrelates from id order (it is a shuffle, not a sort)") {
    val pos = ShuffleShard.assign(ids(400), "id", 1, seed = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).map(_._2)
    // count adjacent id pairs that stay adjacent in shuffled order
    val adjacentKept = pos.sliding(2).count(p => (p(1) - p(0)).abs == 1)
    assert(adjacentKept < 20, s"order too correlated: $adjacentKept")
  }

  test("writeShards: one directory per shard, rows in position order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val df = (1L to 200L).map(i => (i, s"payload$i")).toDF("id", "text")
    ShuffleShard.writeShards(df, "id", 4, seed = 5, dir)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.map(_.getName).toSet == (0 until 4).map(i => s"shard=$i").toSet)
    // read one shard back: parquet preserves row order within files
    val rows = spark.read.parquet(s"$dir/shard=2").select("pos", "id", "text")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length))
    // placement matches assign()
    val expect = ShuffleShard.assign(df, "id", 4, seed = 5)
      .filter($"shard" === 2).collect().map(r => (r.getLong(2), r.getLong(0))).toMap
    rows.foreach(r => assert(expect(r.getLong(0)) == r.getLong(1)))
  }
}
