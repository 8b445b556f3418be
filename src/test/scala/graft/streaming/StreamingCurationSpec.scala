package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** The curation filters are stateless per-row expressions, so they run
  * UNCHANGED on a stream — no foreachBatch bridge needed: split
  * assignment and mixture filtering applied to readStream micro-batches
  * agree with the static API row for row (the incremental-consistency
  * contract made literal: a row's fate depends only on (seed, id)). */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-curation")

  val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val rates = Map("en" -> 0.5, "zh" -> 1.0)

  test("splitAssign and weightedMixture on a stream match the static API") {
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "lang")
    val curated = Sampling.weightedMixture(
      Sampling.splitAssign(docs, "doc_id", splits, seed = 5),
      "lang", "doc_id", rates, defaultRate = 1.0, seed = 9)
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    val rows = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else "zh"))
    try {
      input.addData(rows.take(150): _*)
      q.processAllAvailable()
      input.addData(rows.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT doc_id, lang, split FROM curated")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val static = Sampling.weightedMixture(
      Sampling.splitAssign(rows.toDF("doc_id", "lang"), "doc_id", splits, seed = 5),
      "lang", "doc_id", rates, defaultRate = 1.0, seed = 9)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == static)
    // the mixture really filtered (en thinned to ~half)
    assert(streamed.count(_._2 == "en") < 70)
    assert(streamed.count(_._2 == "zh") == 200)
  }
}
