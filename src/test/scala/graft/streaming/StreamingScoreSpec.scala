package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Streaming LM scoring ≡ batch scoring: every micro-batch's scores
  * equal [[LanguageModel.scoreWith]] on the same rows against the same
  * frozen model, bit-exactly (same fold, same model tables). */
class StreamingScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "stream-score")

  test("micro-batched scoring matches the static API per batch, bit-exact") {
    import spark.implicits._
    val train = (0 until 15).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val model = LanguageModel.trainModel(train, "doc_id", "text")
    try {
      val input = MemoryStream[(Long, String)](spark)
      val docs = input.toDF().toDF("doc_id", "text")
      val seen = scala.collection.mutable.ArrayBuffer[(Long, Map[Long, (Long, Double)])]()
      val writer = StreamingScore.scoreStream(
        docs, "doc_id", "text", model,
        sink = (scores, batchId) => seen.synchronized {
          seen += ((batchId,
            scores.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap))
        })
      val b0 = Seq((100L, "the cat sat on the mat"), (101L, "mat the on cat rug sat"))
      val b1 = Seq((200L, "the dog sat on the rug again"))
      input.addData(b0: _*)
      val q = writer.start()
      try {
        q.processAllAvailable()
        input.addData(b1: _*)
        q.processAllAvailable()
      } finally q.stop()

      val byBatch = seen.sortBy(_._1).toList
      assert(byBatch.map(_._1) == List(0L, 1L), byBatch)
      def static(rows: Seq[(Long, String)]) =
        LanguageModel.scoreWith(model, rows.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(byBatch(0)._2 == static(b0))
      assert(byBatch(1)._2 == static(b1))
      // the frozen model means the fluent doc outranks the shuffled one
      assert(byBatch(0)._2(100L)._2 > byBatch(0)._2(101L)._2)
    } finally model.release()
  }

  test("a static DataFrame is rejected loudly") {
    import spark.implicits._
    val staticDf = Seq((1L, "a b c")).toDF("doc_id", "text")
    val model = LanguageModel.trainModel(staticDf, "doc_id", "text")
    try {
      val e = intercept[IllegalArgumentException](
        StreamingScore.scoreStream(staticDf, "doc_id", "text", model, (_, _) => ()))
      assert(e.getMessage.contains("streaming"))
    } finally model.release()
  }
}
