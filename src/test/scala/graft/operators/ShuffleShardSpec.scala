package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic shuffle-sharding: reproducible placement, dense
  * positions, balanced shards, ordered shard files. */
@org.scalatest.tags.Slow
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

  test("appendShards: existing positions immutable, increment lands as the per-shard suffix") {
    val dir = java.nio.file.Files.createTempDirectory("shards-app").toString
    val a = (1L to 120L).map(i => (i, s"payload$i")).toDF("id", "text")
    val b = (121L to 200L).map(i => (i, s"payload$i")).toDF("id", "text")
    ShuffleShard.writeShards(a, "id", 4, seed = 5, dir)
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 80L)
    def layout(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]) = df
      .collect().map(r => (r.getInt(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("pos")), r.getLong(r.fieldIndex("id"))))
      .sortBy(t => (t._1, t._2))
    val got = layout(spark.read.parquet(dir).select($"id", $"pos", $"shard"))
    // prefix per shard == A's one-shot layout; suffix == B's one-shot
    // layout offset by the shard's prefix length
    val oneA = ShuffleShard.assign(a, "id", 4, seed = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
    val aCount = oneA.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val oneB = ShuffleShard.assign(b, "id", 4, seed = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2) + aCount.getOrElse(r.getInt(1), 0L), r.getLong(0)))
    assert(got.toSeq == (oneA ++ oneB).sortBy(t => (t._1, t._2)).toSeq)
    // replay safety: re-offering already-exported rows appends nothing
    assert(ShuffleShard.appendShards(a.unionByName(b), "id", 4, seed = 5, dir) == 0L)
    assert(spark.read.parquet(dir).count() == 200L)
    // missing dir degrades to a first-batch writeShards
    val dir2 = java.nio.file.Files.createTempDirectory("shards-app2").toString + "/fresh"
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir2) == 120L)
    assert(layout(spark.read.parquet(dir2).select($"id", $"pos", $"shard")).toSeq ==
      oneA.sortBy(t => (t._1, t._2)).toSeq)
    // an EMPTY first batch must not create (and poison) the directory —
    // the next real batch still lands as the first export
    val dir3 = java.nio.file.Files.createTempDirectory("shards-app3").toString + "/fresh"
    assert(ShuffleShard.appendShards(a.limit(0), "id", 4, seed = 5, dir3) == 0L)
    assert(!new java.io.File(dir3).exists())
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir3) == 120L)
    assert(spark.read.parquet(dir3).count() == 120L)
  }

  test("appendShards: duplicate ids within one batch are refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("shards-dup").toString + "/out"
    val dup = Seq((1L, "a"), (2L, "b"), (1L, "a2")).toDF("id", "text")
    val e = intercept[IllegalArgumentException](
      ShuffleShard.appendShards(dup, "id", 3, seed = 5, dir))
    assert(e.getMessage.contains("duplicate"))
    // the refused batch must not have created the export
    assert(!new java.io.File(dir).exists())
  }

  test("appendShards property: any random batch partition yields the concatenated per-batch layouts") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 2) {
      val dir = java.nio.file.Files.createTempDirectory(s"shards-prop$trial").toString + "/out"
      val all = rnd.shuffle((1L to 150L).toList)
      val cuts = (1 to 2).map(_ => 1 + rnd.nextInt(149)).sorted.distinct
      val batches = (Seq(0) ++ cuts ++ Seq(150)).sliding(2)
        .map { case Seq(a, b) => all.slice(a, b) }.filter(_.nonEmpty).toSeq
      // expected: per shard, batch layouts concatenated with running offsets
      val offsets = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      val expect = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
      batches.foreach { b =>
        val layout = ShuffleShard.assign(b.toDF("id"), "id", 3, seed = 7)
          .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
        layout.foreach { case (s, p, id) => expect += ((s, p + offsets(s), id)) }
        layout.groupBy(_._1).foreach { case (s, rs) => offsets(s) += rs.size }
        ShuffleShard.appendShards(
          b.map(i => (i, s"t$i")).toDF("id", "text"), "id", 3, seed = 7, dir)
      }
      val got = spark.read.parquet(dir).select($"id", $"pos", $"shard")
        .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(0)))
      assert(got.sortBy(t => (t._1, t._2)).toSeq ==
        expect.sortBy(t => (t._1, t._2)).toSeq, s"trial $trial: ${batches.map(_.size)}")
    }
  }

  private def payloadFiles(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asScala.filter(p =>
      p.toString.contains("shard=") && p.toString.endsWith(".parquet")).toSeq
    finally walk.close()
  }

  private def fullLayout(dir: String) =
    spark.read.parquet(dir).select($"id", $"pos", $"shard")
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(0)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("append manifest: the append path never reads prior payload parquet (file audit by corruption)") {
    val dir = java.nio.file.Files.createTempDirectory("shards-man").toString + "/out"
    val a = (1L to 80L).map(i => (i, s"p$i")).toDF("id", "text")
    val b = (81L to 140L).map(i => (i, s"p$i")).toDF("id", "text")
    val c = (141L to 200L).map(i => (i, s"p$i")).toDF("id", "text")
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir) == 80L)
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 60L)
    // truncate every existing payload file to zero bytes: ANY read of
    // prior payload now throws (no parquet footer), so a successful
    // append PROVES the path touches only the manifest
    val prior = payloadFiles(dir)
    assert(prior.nonEmpty)
    val backup = prior.map(p => p -> java.nio.file.Files.readAllBytes(p)).toMap
    prior.foreach(p => java.nio.file.Files.write(p, Array.emptyByteArray))
    assert(ShuffleShard.appendShards(c, "id", 4, seed = 5, dir) == 60L)
    // replay screen also stays payload-blind: re-offering b appends 0
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 0L)
    backup.foreach { case (p, bytes) => java.nio.file.Files.write(p, bytes) }
    // restored export equals the reference concatenated layout
    val offsets = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val expect = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    Seq(a, b, c).foreach { batch =>
      val l = ShuffleShard.assign(batch, "id", 4, seed = 5)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
      l.foreach { case (s, p, id) => expect += ((s, p + offsets(s), id)) }
      l.groupBy(_._1).foreach { case (s, rs) => offsets(s) += rs.size }
    }
    assert(fullLayout(dir) == expect.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("append manifest: a stale intent marker (torn append) triggers rebuild from payload; replay safety holds") {
    val dir = java.nio.file.Files.createTempDirectory("shards-torn").toString + "/out"
    val a = (1L to 90L).map(i => (i, s"p$i")).toDF("id", "text")
    val b = (91L to 150L).map(i => (i, s"p$i")).toDF("id", "text")
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir) == 90L)
    // simulate a crash between payload commit and manifest commit
    val intent = java.nio.file.Paths.get(dir, "_graft_manifest", "intent")
    java.nio.file.Files.createFile(intent)
    // next append repairs from the payload: no duplicates, correct tails
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir) == 0L)
    assert(!java.nio.file.Files.exists(intent))
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 60L)
    assert(spark.read.parquet(dir).count() == 150L)
    // a wiped manifest (state gone entirely) also self-repairs
    locally {
      import scala.jdk.CollectionConverters._
      val rootP = java.nio.file.Paths.get(dir, "_graft_manifest")
      val walk = java.nio.file.Files.walk(rootP)
      val entries = try walk.iterator().asScala.toSeq finally walk.close()
      entries.reverse.foreach(java.nio.file.Files.deleteIfExists)
    }
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 0L)
  }

  test("append manifest: the Bloom filter regrows past capacity and still screens replays") {
    val dir = java.nio.file.Files.createTempDirectory("shards-grow").toString + "/out"
    def batch(lo: Long, hi: Long) = (lo to hi).toDF("id")
    def mBits = spark.read.parquet(dir + "/_graft_manifest/state")
      .collect().head.getAs[Int]("m_bits")
    // 80k ids fit the 2^20-bit floor (12 bits/id target)
    assert(ShuffleShard.appendShards(batch(1L, 80000L), "id", 4, seed = 5, dir) == 80000L)
    assert(mBits == (1 << 20))
    // +20k pushes past capacity → one doubling, rebuilt from the id table
    assert(ShuffleShard.appendShards(batch(80001L, 100000L), "id", 4, seed = 5, dir) == 20000L)
    assert(mBits == (1 << 21))
    // the regrown filter still contains EVERY exported id (no false
    // negatives across the rebuild): full replay appends nothing
    assert(ShuffleShard.appendShards(batch(1L, 100000L), "id", 4, seed = 5, dir) == 0L)
    assert(spark.read.parquet(dir).count() == 100000L)
  }

  test("append manifest: a mass redelivery (candidates past the collect cap) takes the join fallback and stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("shards-mass").toString + "/out"
    def batch(lo: Long, hi: Long) = (lo to hi).toDF("id")
    // 120k exported ids: a full re-offer makes every row Bloom-positive,
    // pushing candidates past CollectRows (100k) into the semi/anti path
    assert(ShuffleShard.appendShards(batch(1L, 120000L), "id", 4, seed = 5, dir) == 120000L)
    assert(ShuffleShard.appendShards(batch(1L, 120000L), "id", 4, seed = 5, dir) == 0L)
    // mixed mass redelivery: 115k replays + 10k fresh — only the fresh land
    assert(ShuffleShard.appendShards(batch(5001L, 130000L), "id", 4, seed = 5, dir) == 10000L)
    assert(spark.read.parquet(dir).count() == 130000L)
    // fresh rows landed with correct dense per-shard positions
    val byShard = spark.read.parquet(dir).groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx")).collect()
    byShard.foreach(r => assert(r.getLong(2) == r.getLong(1) - 1,
      s"shard ${r.getInt(0)}: max pos ${r.getLong(2)} vs count ${r.getLong(1)}"))
  }

  test("append manifest: a bare writeShards export upgrades in place on first append") {
    val dir = java.nio.file.Files.createTempDirectory("shards-up").toString + "/out"
    val a = (1L to 100L).map(i => (i, s"p$i")).toDF("id", "text")
    val b = (101L to 160L).map(i => (i, s"p$i")).toDF("id", "text")
    ShuffleShard.writeShards(a, "id", 4, seed = 5, dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_graft_manifest", "state")))
    assert(ShuffleShard.appendShards(b, "id", 4, seed = 5, dir) == 60L)
    assert(ShuffleShard.appendShards(a, "id", 4, seed = 5, dir) == 0L)
    assert(spark.read.parquet(dir).count() == 160L)
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
