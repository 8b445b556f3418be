package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The curation funnel: monotone attrition, each stage doing real
  * work on the sf0.001 corpus, split accounting exact, deterministic
  * re-runs, ordered shard files. */
class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "train-pipeline")
  val sfDir = "/root/testdata/sf0.001"

  def freshDir() = java.nio.file.Files.createTempDirectory("train-pipe").toString

  lazy val report: TrainPipeline.Report =
    TrainPipeline.run(spark, sfDir, freshDir(), shards = 4, seed = 17)

  test("attrition is monotone and every stage survives rows") {
    val r = report
    assert(r.rowsIn >= r.afterQuality)
    assert(r.afterQuality >= r.afterExact)
    assert(r.afterExact >= r.afterNearDup)
    assert(r.afterNearDup >= r.afterDecontam)
    assert(r.afterDecontam > 0, r.toString)
    assert(r.totalSec > 0)
  }

  test("split accounting is exact and train dominates") {
    val r = report
    assert(r.splitCounts.values.sum == r.afterDecontam, r.splitCounts.toString)
    assert(r.trainRows == r.splitCounts.getOrElse("train", 0L))
    assert(r.trainRows >= r.afterDecontam / 2, r.splitCounts.toString)
  }

  test("deterministic: a re-run reproduces the report and the shard placement") {
    val dir2 = freshDir()
    val again = TrainPipeline.run(spark, sfDir, dir2, shards = 4, seed = 17)
    assert(again.copy(totalSec = 0) == report.copy(totalSec = 0))
    // shard files carry pos 0..n-1 in order
    val rows = spark.read.parquet(s"$dir2/shard=1").select("pos").collect()
      .map(_.getLong(0))
    assert(rows.toSeq == (0L until rows.length))
  }
}
