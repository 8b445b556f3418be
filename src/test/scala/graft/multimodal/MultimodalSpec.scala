package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "mm-test")

  def assets(n: Int) = {
    import spark.implicits._
    Multimodal.assetsFrom(spark,
      (0 until n).map(i => (i.toLong, s"payload-$i-${"x" * i}")).toDF("id", "body"),
      "id", "body", "image/fake")
  }

  test("readBinaryDir: one row per matching file, content intact, filter in listing") {
    val dir = java.nio.file.Files.createTempDirectory("binassets")
    try {
      for (i <- 0 until 5) {
        java.nio.file.Files.write(dir.resolve(s"img_$i.fake"),
          Array.tabulate[Byte](10 + i)(j => (i * 31 + j).toByte))
      }
      java.nio.file.Files.write(dir.resolve("notes.txt"), "skip me".getBytes)
      val ds = Multimodal.readBinaryDir(spark, dir.toString, "*.fake", "image/fake")
      val rows = ds.collect()
      assert(rows.length == 5) // .txt filtered at listing time
      assert(rows.map(_.uri).distinct.length == 5)
      assert(rows.map(_.asset_id).distinct.length == 5)
      val byLen = rows.map(r => r.data.length).sorted
      assert(byLen.toSeq == Seq(10, 11, 12, 13, 14))
      // pipeline composes: binary dir -> feature extraction
      val feats = Multimodal.extractImageFeatures(ds, embeddingDim = 8).collect()
      assert(feats.length == 5 && feats.forall(_.embedding.length == 8))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("extractImageFeatures: deterministic stub decode, stable dims + embedding") {
    val f = Multimodal.extractImageFeatures(assets(5), embeddingDim = 4).collect()
    assert(f.length == 5)
    assert(f.forall(x => x.width >= 16 && x.width < 80))
    assert(f.forall(x => x.height >= 16 && x.height < 80))
    assert(f.forall(_.embedding.length == 4))
    assert(f.forall(_.embedding.forall(v => v >= 0f && v < 1f)))
    // determinism: same payload -> same features
    val again = Multimodal.extractImageFeatures(assets(5), embeddingDim = 4).collect()
    assert(f.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
  }

  test("resizeImages: aspect-preserving fit within bounds, never upscales") {
    val out = Multimodal.resizeImages(assets(6), maxW = 20, maxH = 20).collect()
    assert(out.forall(f => f.width <= 20 && f.height <= 20))
    assert(out.forall(f => f.width >= 1 && f.height >= 1))
    // a bound larger than any stub image leaves dims untouched
    val untouched = Multimodal.resizeImages(assets(6), 4096, 4096).collect()
    val orig = Multimodal.extractImageFeatures(assets(6)).collect()
    assert(untouched.map(f => (f.width, f.height)).toSeq ==
      orig.map(f => (f.width, f.height)).toSeq)
  }

  test("sampleFrames: every Nth frame with timestamps") {
    import spark.implicits._
    val vids = Seq(Multimodal.VideoAsset(1L, "mem://1", 10, 25.0)).toDS()
    val frames = Multimodal.sampleFrames(vids, 4).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 4, 8))
    assert(frames.last.ts_sec == 8 / 25.0)
  }

  test("repartitionBySize: task count tracks payload bytes, not rows") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, 1000L)).toDF("id", "n_bytes")
    val parts = Multimodal.repartitionBySize(df, "n_bytes", targetBytesPerTask = 10000L)
      .rdd.getNumPartitions
    assert(parts == 10) // 100k bytes / 10k per task
  }
}
