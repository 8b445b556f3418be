package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MinHashLSH

/** Streaming screen ≡ batch screen: every micro-batch's matches equal
  * [[MinHashLSH.screenAgainst]] on the same rows, and batches are
  * delivered with their ids in order. */
class StreamingScreenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-screen")

  private def sentence(seed: Int): String =
    (0 until 30).map(w => s"s${seed}w$w").mkString(" ")

  test("micro-batched screening matches the static batch API per batch") {
    import spark.implicits._
    val corpus = (0 until 20).map(i => (i.toLong, sentence(i)))
      .toDF("doc_id", "text")
    // buildIndex returns the tables cached and materialized
    val idx = MinHashLSH.buildIndex(corpus, "doc_id", "text")

    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Set[(Long, Long)])]()
    val writer = StreamingScreen.screenStream(
      docs, "doc_id", "text", idx, threshold = 0.7,
      sink = (matches, batchId) => seen.synchronized {
        seen += ((batchId,
          matches.collect().map(r => (r.getLong(0), r.getLong(1))).toSet))
      })

    // batch 0: a near-copy of corpus doc 3 and a novel doc
    input.addData((1000L, sentence(3) + " drift drift"), (1001L, sentence(777)))
    // batch 1: an exact copy of corpus doc 7
    val q = writer.start()
    try {
      q.processAllAvailable()
      input.addData(Seq((2000L, sentence(7))))
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = seen.sortBy(_._1).toList
    assert(byBatch.map(_._1) == List(0L, 1L), byBatch)
    assert(byBatch(0)._2 == Set((1000L, 3L)), byBatch)
    assert(byBatch(1)._2 == Set((2000L, 7L)), byBatch)
    // parity with the static API on the same rows
    import org.apache.spark.sql.functions.col
    val staticB0 = MinHashLSH.screenAgainst(
        Seq((1000L, sentence(3) + " drift drift"), (1001L, sentence(777)))
          .toDF("doc_id", "text"),
        "doc_id", "text", idx, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staticB0 == byBatch(0)._2)
    idx.groups.unpersist(); idx.repGrams.unpersist(); idx.repBands.unpersist()
  }

  test("a static DataFrame is rejected loudly") {
    import spark.implicits._
    val staticDf = Seq((1L, "a b c")).toDF("doc_id", "text")
    val idx = MinHashLSH.buildIndex(staticDf, "doc_id", "text")
    val e = intercept[IllegalArgumentException](
      StreamingScreen.screenStream(staticDf, "doc_id", "text", idx, 0.7, (_, _) => ()))
    assert(e.getMessage.contains("streaming"))
  }
}
