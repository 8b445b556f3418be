package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShuffleShard

/** Streaming shard append ≡ sequential batch appends: a two-batch
  * stream produces exactly the one-shot layout of batch 1 as each
  * shard's position prefix with batch 2's one-shot layout as the
  * offset suffix, and a replayed batch appends nothing. */
class StreamingShardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-shard")

  test("two-batch stream equals the one-shot export minus position prefix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-shard").toString + "/out"
    val input = MemoryStream[(Long, String)](spark)
    val rows = input.toDF().toDF("id", "text")
    val audit = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val writer = StreamingShard.appendStream(
      rows, "id", shards = 4, seed = 5, dir,
      onBatch = (bid, n) => audit.synchronized { audit += ((bid, n)) })

    val b1 = (1L to 90L).map(i => (i, s"p$i"))
    val b2 = (91L to 150L).map(i => (i, s"p$i"))
    val q = writer.start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // replay: the same rows re-delivered append nothing (audit anti-join)
      input.addData(b1 ++ b2)
      q.processAllAvailable()
    } finally q.stop()

    assert(audit.sortBy(_._1).toList == List((0L, 90L), (1L, 60L), (2L, 0L)), audit)
    val got = spark.read.parquet(dir).select($"id", $"pos", $"shard")
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(0)))
      .sortBy(t => (t._1, t._2))
    // per shard: batch-1 one-shot layout as prefix, batch-2 as suffix
    val a = b1.toDF("id", "text")
    val b = b2.toDF("id", "text")
    val oneA = ShuffleShard.assign(a, "id", 4, seed = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
    val aCount = oneA.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val oneB = ShuffleShard.assign(b, "id", 4, seed = 5)
      .collect().map(r =>
        (r.getInt(1), r.getLong(2) + aCount.getOrElse(r.getInt(1), 0L), r.getLong(0)))
    assert(got.toSeq == (oneA ++ oneB).sortBy(t => (t._1, t._2)).toSeq)
    // positions are dense 0..n-1 within every shard after both batches
    got.groupBy(_._1).values.foreach { s =>
      assert(s.map(_._2).sorted.toSeq == (0L until s.size))
    }
  }
}
