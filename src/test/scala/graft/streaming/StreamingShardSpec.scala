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

  test("streaming micro-curation: gate -> split -> upsample -> shard append runs unchanged on a stream") {
    import spark.implicits._
    import graft.operators.Sampling
    val dir = java.nio.file.Files.createTempDirectory("stream-cur").toString + "/out"
    val input = MemoryStream[(Long, String, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "lang")
    // the per-row curation prefix: every operator here is a pure
    // (seed, id)-deterministic expression, so the same plan runs on a
    // stream and on a batch with identical row-level outcomes
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val gated = df.filter(length(col("text")) >= 10)
      val split = Sampling.splitAssign(gated, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.2), seed = 3)
      Sampling.weightedUpsample(split.filter(col("split") === "train"),
          "lang", "doc_id", Map("zh" -> 2.0), defaultRate = 1.0, seed = 3)
        .withColumn("uid", col("doc_id") * 8 + col("copy_idx"))
    }
    val writer = StreamingShard.appendStream(
      curate(docs), "uid", shards = 2, seed = 5, dir)
    val rows = (1L to 120L).map(i =>
      (i, s"document body number $i", if (i % 3 == 0) "zh" else "en"))
    val q = writer.start()
    try {
      input.addData(rows.take(70))
      q.processAllAvailable()
      input.addData(rows.drop(70))
      q.processAllAvailable()
    } finally q.stop()
    // row set equals the batch curation of the full corpus; every zh
    // train row appears exactly twice (rate 2.0), others once
    val streamed = spark.read.parquet(dir)
      .select(col("uid"), col("doc_id"), col("copy_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = curate(rows.toDF("doc_id", "text", "lang"))
      .select(col("uid"), col("doc_id"), col("copy_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
