package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The REAL codec paths: in-test generated PNG / JPEG / WAV payloads
  * decode through the same `extractImageFeatures` / `windowedEnergy`
  * entry points the stub corpus uses — dims, pixels, and energies are
  * checked against the known synthetic content, and non-decodable
  * mimes keep routing to the stub (the m1/m3 oracle contract). */
class RealCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "codec-test")

  /** wXh RGB image, left half black, right half white, as `fmt` bytes. */
  private def halfImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer in this JDK")
    out.toByteArray
  }

  /** Mono 16-bit little-endian PCM WAV of the given samples. */
  private def wav(samples: Array[Short], sampleRate: Float = 16000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decodes for real: true dims and luminance-strip embedding") {
    import spark.implicits._
    val png = halfImage(20, 10, "png")
    val ds = Seq(Multimodal.ImageAsset(1L, "mem://png", "image/png", png)).toDS()
    val f = Multimodal.extractImageFeatures(ds, embeddingDim = 2).collect().head
    assert(f.width == 20 && f.height == 10) // real dims, not md5-derived
    assert(f.n_bytes == png.length.toLong)
    assert(f.embedding.length == 2)
    assert(f.embedding(0) < 0.01f, s"left (black) strip ${f.embedding(0)}")
    assert(f.embedding(1) > 0.99f, s"right (white) strip ${f.embedding(1)}")
  }

  test("JPEG decodes for real with correct dims") {
    import spark.implicits._
    val jpg = halfImage(32, 16, "jpg")
    val ds = Seq(Multimodal.ImageAsset(2L, "mem://jpg", "image/jpeg", jpg)).toDS()
    val f = Multimodal.extractImageFeatures(ds, embeddingDim = 4).collect().head
    assert(f.width == 32 && f.height == 16)
    // JPEG is lossy: strip means are approximately black/white
    assert(f.embedding(0) < 0.1f && f.embedding(3) > 0.9f, f.embedding.toSeq.toString)
  }

  test("resizeImages scales real dims preserving aspect ratio") {
    import spark.implicits._
    val png = halfImage(40, 20, "png")
    val ds = Seq(Multimodal.ImageAsset(3L, "mem://r", "image/png", png)).toDS()
    val r = Multimodal.resizeImages(ds, maxW = 10, maxH = 10).collect().head
    assert(r.width == 10 && r.height == 5) // 40x20 fit into 10x10
  }

  test("corrupt payload with a decodable mime fails loudly, not silently stubbed") {
    import spark.implicits._
    val ds = Seq(Multimodal.ImageAsset(
      4L, "mem://bad", "image/png", Array[Byte](1, 2, 3))).toDS()
    val e = intercept[Exception](Multimodal.extractImageFeatures(ds).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no reader")), msgs(e).mkString(" | "))
  }

  test("non-decodable mime keeps the deterministic stub (m1 oracle contract)") {
    import spark.implicits._
    val data = "synthetic body".getBytes("UTF-8")
    val ds = Seq(Multimodal.ImageAsset(5L, "mem://s", "image/fake", data)).toDS()
    val f = Multimodal.extractImageFeatures(ds).collect().head
    val stub = new ImageCodec().decodeStub(data)
    assert(f.width == stub.width && f.height == stub.height)
  }

  /** wXh gradient image (brightness rises left→right), optionally
    * perturbed: every pixel's channels shifted by `delta`. */
  private def gradient(w: Int, h: Int, delta: Int, fmt: String = "png"): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, math.max(0, x * 255 / (w - 1) + delta))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer in this JDK")
    out.toByteArray
  }

  test("dHash: perturbed copy lands within Hamming 3 and buckets as a near-dup pair") {
    import spark.implicits._
    val codec = new ImageCodec()
    val a = gradient(90, 48, delta = 0)
    val b = gradient(90, 48, delta = 6) // retouched copy: +6 brightness
    // an inverted gradient: every horizontal luminance comparison flips
    val c = {
      val img = new BufferedImage(90, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 90) {
        val v = 255 - x * 255 / 89
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val ha = codec.perceptualHash("image/png", a)
    val hb = codec.perceptualHash("image/png", b)
    val hc = codec.perceptualHash("image/png", c)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // a uniform brightness shift preserves every left<right comparison
    assert(ham(ha, hb) <= 3, s"perturbed copy drifted ${ham(ha, hb)} bits")
    assert(ham(ha, hc) > 3, s"inverted image too close: ${ham(ha, hc)} bits")
    // end-to-end: the shared Hamming-bucketed pair machinery finds
    // exactly the planted pair
    val ds = Seq(
      Multimodal.ImageAsset(1L, "mem://a", "image/png", a),
      Multimodal.ImageAsset(2L, "mem://b", "image/png", b),
      Multimodal.ImageAsset(3L, "mem://c", "image/png", c)).toDS()
    val pairs = graft.operators.SimHash
      .nearPairs(Multimodal.perceptualHashes(ds), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), pairs.toSeq.toString)
  }

  test("dHash property: uniform brightness shift below saturation preserves the hash exactly") {
    val rnd = new scala.util.Random(53)
    val codec = new ImageCodec()
    for (trial <- 1 to 3) {
      val (w, h) = (18 + rnd.nextInt(60), 16 + rnd.nextInt(40))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // values in [10, 200] so a +40 shift can never saturate
        val v = 10 + rnd.nextInt(191)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      def png(delta: Int): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        val shifted = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val v = ((img.getRGB(x, y) & 0xff) + delta) & 0xff
          shifted.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        ImageIO.write(shifted, "png", out); out.toByteArray
      }
      val base = codec.perceptualHash("image/png", png(0))
      // strict comparisons on cross-multiplied cell sums: adding the
      // same constant to every pixel adds it to every cell mean, so
      // every left<right verdict is unchanged — hash is bit-identical
      val shifted = codec.perceptualHash("image/png", png(40))
      assert(base == shifted, s"trial $trial ($w x $h)")
    }
  }

  test("dHash is deterministic integer arithmetic; stub hash mirrors hexHash64") {
    val codec = new ImageCodec()
    val png = gradient(45, 24, 0)
    assert(codec.perceptualHash("image/png", png) ==
      codec.perceptualHash("image/png", png))
    // stub path: first 8 md5 bytes big-endian signed — identical to the
    // engine's portable string hash on UTF-8 payloads
    val text = "stub payload body"
    val got = codec.stubHash64(text.getBytes("UTF-8"))
    val expect = graft.plans.HexHash60.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    assert(got == expect)
  }

  test("WAV decodes for real: per-window energies match the generated waveform") {
    import spark.implicits._
    // 512 samples of constant amplitude 100 → two 256-sample windows,
    // each with energy 256 * 100^2
    val bytes = wav(Array.fill[Short](512)(100))
    val ds = Seq(Multimodal.AudioAsset(10L, "mem://wav", 16000, 512, bytes)).toDS()
    val w = Multimodal.windowedEnergy(ds, windowSize = 256)
      .collect().sortBy(_.window_idx)
    assert(w.length == 2)
    assert(w.forall(_.energy == 256L * 100 * 100), w.toSeq.toString)
    assert(w(0).start_sample == 0 && w(1).start_sample == 256)
  }

  test("WAV trailing partial window accumulates only the remaining samples") {
    import spark.implicits._
    // 300 samples: window0 = 256 full, window1 = 44 samples of amp 10
    val bytes = wav(Array.fill[Short](300)(10))
    val ds = Seq(Multimodal.AudioAsset(11L, "mem://wav2", 16000, 300, bytes)).toDS()
    val w = Multimodal.windowedEnergy(ds, windowSize = 256)
      .collect().sortBy(_.window_idx)
    assert(w.length == 2)
    assert(w(0).energy == 256L * 100 && w(1).energy == 44L * 100)
  }

  test("non-WAV payload keeps the deterministic stub waveform (m3 oracle contract)") {
    import spark.implicits._
    val data = "not a riff header".getBytes("UTF-8")
    val ds = Seq(Multimodal.AudioAsset(12L, "mem://txt", 16000, 64, data)).toDS()
    val real = Multimodal.windowedEnergy(ds, windowSize = 32).collect().sortBy(_.window_idx)
    val stub = new AudioCodec().windowEnergiesStub(
      Multimodal.AudioAsset(12L, "mem://txt", 16000, 64, data), 32).toSeq
    assert(real.toSeq == stub)
  }
}
