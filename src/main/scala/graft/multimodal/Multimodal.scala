package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling for training-data pipelines: opaque
  * `binary` payloads + typed metadata, decoded/feature-extracted in
  * batch via typed `mapPartitions` (the Scala analog of the
  * mapInPandas batch shape: per-partition iterators let a real decoder
  * initialize its codec/model once per task, not once per row).
  *
  * CODEC DISPATCH: formats the JDK itself can decode are decoded for
  * real — PNG/JPEG/BMP via `ImageIO` (selected by mime,
  * [[ImageCodec.RealMimes]]) and WAV/PCM via `javax.sound.sampled`
  * (selected by RIFF/WAVE header sniff). Payloads outside those
  * formats (e.g. the synthetic `image/fake` test corpus, or video
  * codecs absent from this container) fall back to
  * [[ImageCodec.decodeStub]] — a deterministic md5-derived fake —
  * through the same signatures, so the Spark-side plumbing (schemas,
  * encoder signatures, batch shape, partition sizing) is exercised
  * identically on both paths. A production build widens the real set
  * with a JNI/javacv decoder behind the same dispatch.
  *
  * Scale notes: payloads are the dominant bytes, so (a)
  * [[Multimodal.repartitionBySize]] targets a fixed number of payload
  * bytes per task to keep decode tasks uniform regardless of row-count
  * skew; (b) metadata-only transforms must prune the `data` column
  * before shuffles (parquet column pruning keeps payload IO out of
  * scans that don't touch it).
  */
object Multimodal {

  final case class ImageAsset(
      asset_id: Long, uri: String, mime: String, data: Array[Byte])

  final case class DecodedImage(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  final case class ImageFeatures(
      asset_id: Long, width: Int, height: Int, n_bytes: Long,
      embedding: Array[Float])

  final case class VideoAsset(
      asset_id: Long, uri: String, n_frames: Int, fps: Double)

  final case class Frame(asset_id: Long, frame_idx: Int, ts_sec: Double)

  final case class AudioAsset(
      asset_id: Long, uri: String, sample_rate: Int, n_samples: Int,
      data: Array[Byte])

  final case class AudioWindow(
      asset_id: Long, window_idx: Int, start_sample: Int, energy: Long)

  /** Extract image features in partition batches. One codec per
    * partition (the expensive init a real decoder needs), then a
    * per-row decode + featurize. */
  def extractImageFeatures(
      ds: Dataset[ImageAsset], embeddingDim: Int = 8): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageCodec // per-partition init, amortized
      it.map { a =>
        val img = codec.decode(a.mime, a.data)
        ImageFeatures(a.asset_id, img.width, img.height, a.data.length.toLong,
          codec.featurize(a.mime, a.data, img, embeddingDim))
      }
    }
  }

  /** Resize images in partition batches. Output dims are the decoded
    * dims (real for [[ImageCodec.RealMimes]], stub otherwise) scaled to
    * fit (maxW, maxH) preserving aspect ratio. */
  def resizeImages(
      ds: Dataset[ImageAsset], maxW: Int, maxH: Int): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageCodec
      it.map { a =>
        val img = codec.decode(a.mime, a.data)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / img.width, maxH.toDouble / img.height))
        val (w, h) = (math.max(1, (img.width * scale).toInt),
          math.max(1, (img.height * scale).toInt))
        ImageFeatures(a.asset_id, w, h, a.data.length.toLong, Array.empty[Float])
      }
    }
  }

  /** Sample every `everyN`-th frame of each video (generator shape —
    * flatMap, the idiomatic Spark form of a table-valued function). */
  def sampleFrames(ds: Dataset[VideoAsset], everyN: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { v =>
      (0 until v.n_frames by everyN).map(i => Frame(v.asset_id, i, i / v.fps))
    }
  }

  /** Per-window signal energy over decoded audio — the framing pass
    * every audio pipeline runs before VAD / feature extraction. Batch
    * mapPartitions like the image path (one codec per partition); both
    * decoders stream samples, so a window's energy accumulates without
    * materializing the waveform. RIFF/WAVE payloads decode for real;
    * anything else uses the deterministic stub waveform. */
  def windowedEnergy(
      ds: Dataset[AudioAsset], windowSize: Int = 256): Dataset[AudioWindow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new AudioCodec // per-partition init, amortized
      it.flatMap(a => codec.windowEnergies(a, windowSize))
    }
  }

  /** Per-asset 64-bit perceptual hash — the fingerprint half of
    * image-content near-dup dedup: REAL dHash over the ImageIO-decoded
    * pixels for decodable mimes ([[ImageCodec.dHash]] — a re-encoded
    * or slightly-retouched copy lands within a few Hamming bits),
    * deterministic md5-derived stub hash otherwise (same plumbing,
    * oracle-mirrorable). Output columns are (id, simhash) — exactly
    * the shape [[graft.operators.SimHash.nearPairs]] /
    * [[graft.operators.SimHash.nearDupClusters]] consume, so the
    * Hamming-bucketed candidate machinery (16-bit chunk pigeonhole,
    * value-grouped pair expansion, audited bucket caps) is shared with
    * text simhash rather than re-derived. */
  def perceptualHashes(ds: Dataset[ImageAsset]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageCodec // per-partition init, amortized
      it.map(a => (a.asset_id, codec.perceptualHash(a.mime, a.data)))
    }.toDF("id", "simhash")
  }

  /** Repartition so each task handles ~`targetBytesPerTask` of payload
    * (decode cost tracks bytes, not rows — uniform tasks at any scale). */
  def repartitionBySize(
      df: DataFrame, bytesCol: String, targetBytesPerTask: Long): DataFrame = {
    val total = df.agg(sum(col(bytesCol))).head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerTask).toInt)
    df.repartition(parts)
  }

  /** Ingest a directory tree of raw binary assets (images/audio/video
    * files) via Spark's `binaryFile` source: one row per file with
    * (path, length, content), listing and reading parallelized across
    * files, and the extension filter pushed into the file LISTING via
    * pathGlobFilter — files that don't match are never opened. Pair
    * with [[repartitionBySize]] before a decode stage so each task
    * holds a bounded byte budget regardless of file-size skew. */
  def readBinaryDir(
      spark: SparkSession, dir: String, glob: String, mime: String): Dataset[ImageAsset] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        col("path").as("uri"),
        lit(mime).as("mime"),
        col("content").as("data"))
      .as[ImageAsset]
  }

  /** Assemble an ImageAsset dataset from any table with an id and a
    * binary (or castable) payload column. */
  def assetsFrom(
      spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String,
      mime: String): Dataset[ImageAsset] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      concat(lit("mem://"), col(idCol).cast("string")).as("uri"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("data"))
      .as[ImageAsset]
  }

  /** [[assetsFrom]] with a PER-ROW mime column — the shape of a mixed-
    * modality corpus whose asset column carries heterogeneous payloads
    * (decodable mimes take the real-codec path, the rest the stub). */
  def assetsFromCols(
      spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String,
      mimeCol: String): Dataset[ImageAsset] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      concat(lit("mem://"), col(idCol).cast("string")).as("uri"),
      coalesce(col(mimeCol).cast("string"),
        lit("application/octet-stream")).as("mime"),
      col(payloadCol).cast("binary").as("data"))
      .as[ImageAsset]
  }
}

object ImageCodec {
  /** Mimes the JDK's ImageIO decodes natively in this container. */
  val RealMimes: Set[String] = Set("image/png", "image/jpeg", "image/bmp")
}

/** Image codec: REAL decode for [[ImageCodec.RealMimes]] (JDK ImageIO —
  * PNG/JPEG/BMP, no external libs), deterministic md5-derived stub for
  * everything else (same signatures, same downstream plumbing). */
final class ImageCodec {

  private val md = MessageDigest.getInstance("MD5")

  /** Decode dispatch: real for decodable mimes, stub otherwise. */
  def decode(mime: String, data: Array[Byte]): Multimodal.DecodedImage =
    if (ImageCodec.RealMimes(mime)) decodeReal(data) else decodeStub(data)

  /** Featurize dispatch: pixel-derived features for decodable mimes,
    * md5-derived stub embedding otherwise. */
  def featurize(
      mime: String, data: Array[Byte], img: Multimodal.DecodedImage,
      dim: Int): Array[Float] =
    if (ImageCodec.RealMimes(mime)) featurizeReal(img, dim)
    else featurizeStub(data, dim)

  /** REAL decode via ImageIO: any registered reader (PNG/JPEG/BMP in a
    * stock JDK), pixels out as packed RGB bytes row-major. A payload
    * that CLAIMS a decodable mime but fails to parse throws — a corrupt
    * image silently featurized as a fake is how training data rots. */
  def decodeReal(data: Array[Byte]): Multimodal.DecodedImage = {
    // MemoryCacheImageInputStream: ImageIO.read(InputStream) defaults
    // to a FileCacheImageInputStream — one temp-file write per payload
    // that is already fully in memory, pure wasted I/O on the hot path
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(data)))
    require(img != null,
      s"image: ImageIO found no reader for a ${data.length}-byte payload " +
        "declared as a decodable mime — corrupt file or mislabeled format")
    val (w, h) = (img.getWidth, img.getHeight)
    // one bulk ARGB fetch: per-pixel getRGB(x, y) re-runs the
    // ColorModel conversion per call — ~10× slower on the decode path
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < argb.length) {
      val rgb = argb(i)
      val o = i * 3
      px(o) = ((rgb >> 16) & 0xff).toByte
      px(o + 1) = ((rgb >> 8) & 0xff).toByte
      px(o + 2) = (rgb & 0xff).toByte
      i += 1
    }
    Multimodal.DecodedImage(w, h, 3, px)
  }

  /** REAL pixel features: mean luminance (Rec.601 weights) over `dim`
    * vertical strips, normalized to [0, 1] — a deterministic, testable
    * stand-in for an embedding model with the same output shape. */
  def featurizeReal(img: Multimodal.DecodedImage, dim: Int): Array[Float] = {
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * 3
        val lum = 0.299 * (img.pixels(o) & 0xff) +
          0.587 * (img.pixels(o + 1) & 0xff) + 0.114 * (img.pixels(o + 2) & 0xff)
        val b = math.min(dim - 1, x * dim / img.width)
        sums(b) += lum; counts(b) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(b =>
      if (counts(b) == 0) 0f else (sums(b) / counts(b) / 255.0).toFloat)
  }

  /** Perceptual-hash dispatch: real [[dHash]] for decodable mimes,
    * md5-derived stub otherwise. A null payload hashes as the empty
    * payload (the repo-wide null == empty coalesce contract) rather
    * than NPE-ing a corpus pass on one null row. */
  def perceptualHash(mime: String, data: Array[Byte]): Long = {
    val d = if (data == null) Array.emptyByteArray else data
    if (ImageCodec.RealMimes(mime)) dHash(decodeReal(d)) else stubHash64(d)
  }

  /** REAL 64-bit difference hash (dHash, the classic perceptual
    * fingerprint): integer Rec.601 luminance (299r + 587g + 114b, no
    * division — comparisons are scale-invariant) average-pooled onto a
    * 9×8 grid, bit (r, c) set iff cell (r, c+1) is strictly brighter
    * than cell (r, c). Averages compare exactly via cross-
    * multiplication (sumR·cntL > sumL·cntR) — no floating point
    * anywhere, so the hash is bit-reproducible across JVMs and
    * partitionings. Brightness/contrast shifts and small retouches
    * move few gradient signs, so perturbed copies land within a small
    * Hamming distance; images narrower/shorter than the grid leave
    * the empty cells' bits 0 (deterministic; comparisons against an
    * empty cell are false). */
  def dHash(img: Multimodal.DecodedImage): Long = {
    require(img.pixels.nonEmpty,
      "dHash needs decoded pixels — stub-decoded payloads have none " +
        "(use perceptualHash, which dispatches stubs to stubHash64)")
    val (w, h) = (img.width, img.height)
    val sums = new Array[Long](8 * 9)
    val counts = new Array[Long](8 * 9)
    var y = 0
    while (y < h) {
      val r = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val c = math.min(8, x * 9 / w)
        val o = (y * w + x) * 3
        val lum = 299L * (img.pixels(o) & 0xff) +
          587L * (img.pixels(o + 1) & 0xff) + 114L * (img.pixels(o + 2) & 0xff)
        sums(r * 9 + c) += lum; counts(r * 9 + c) += 1
        x += 1
      }
      y += 1
    }
    // cross-multiplied averages compare in 128 bits: sums reach
    // cellPixels·255000 and multiply by another cell's count, which
    // overflows a Long for multi-gigapixel inputs (cell counts beyond
    // ~3.5e7) and would silently flip gradient bits. 64 exact compares
    // per image — noise next to the decode. Operands are nonnegative,
    // so (multiplyHigh, low) compares as (signed hi, unsigned lo).
    def gtExact(a: Long, b: Long, c: Long, d: Long): Boolean = {
      val hi1 = java.lang.Math.multiplyHigh(a, b); val lo1 = a * b
      val hi2 = java.lang.Math.multiplyHigh(c, d); val lo2 = c * d
      hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c
        val rt = l + 1
        if (counts(l) > 0 && counts(rt) > 0 &&
            gtExact(sums(rt), counts(l), sums(l), counts(rt)))
          bits |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    bits
  }

  /** STUB perceptual hash: first 8 md5 bytes of the payload, big-endian
    * signed — the binary-payload twin of
    * [[graft.plans.HexHash60.hash64]], so when the payload is UTF-8
    * text the DuckDB mirror is the documented two-halves md5(text)
    * formula and an m-series oracle can grade the whole near-dup
    * pipeline. */
  def stubHash64(data: Array[Byte]): Long = {
    val d = md.digest(data)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 60-bit integer from the md5 of `bytes` (matches the engine's
    * portable hexHash60 when `bytes` is UTF-8 text). */
  private def hash60(bytes: Array[Byte]): Long = {
    val hex = md.digest(bytes).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** STUB — deterministic fake of image decoding. */
  def decodeStub(data: Array[Byte]): Multimodal.DecodedImage = {
    val h = hash60(data)
    val width = 16 + (h % 64).toInt
    val height = 16 + ((h >> 6) % 64).toInt
    // real decoder: pixels = decoded RGB; stub: empty (metadata only)
    Multimodal.DecodedImage(width, height, 3, Array.emptyByteArray)
  }

  private[multimodal] def hash60Of(bytes: Array[Byte]): Long = hash60(bytes)

  /** STUB — deterministic fake of an image-embedding model. */
  def featurizeStub(data: Array[Byte], dim: Int): Array[Float] = {
    val hex = md.digest(data).map("%02x".format(_)).mkString.take(15)
    Array.tabulate(dim) { i =>
      val hi = java.lang.Long.parseLong(
        md.digest(s"$i:$hex".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      (hi % 1000) / 1000.0f
    }
  }
}

object AudioCodec {
  /** RIFF/WAVE container sniff — the 12-byte header every WAV leads
    * with ("RIFF" <size> "WAVE"). */
  def isWav(data: Array[Byte]): Boolean =
    data.length >= 12 &&
      data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F' &&
      data(8) == 'W' && data(9) == 'A' && data(10) == 'V' && data(11) == 'E'
}

/** Audio codec: REAL WAV/PCM decode via `javax.sound.sampled` (header
  * sniff selects it), deterministic md5-derived stub waveform for
  * everything else — sample i of an asset with payload hash h is
  * ((h + i·2654435761) mod 201) − 100, a pseudo-waveform in
  * [−100, 100]. Both paths stream per-window accumulation and never
  * materialize the whole waveform.
  */
final class AudioCodec {
  private val imageCodec = new ImageCodec

  /** Decode dispatch: real WAV path on a RIFF/WAVE header, stub
    * waveform otherwise. */
  def windowEnergies(
      a: Multimodal.AudioAsset, windowSize: Int): Iterator[Multimodal.AudioWindow] =
    if (AudioCodec.isWav(a.data)) windowEnergiesWav(a, windowSize)
    else windowEnergiesStub(a, windowSize)

  /** REAL per-window energies over WAV/PCM: the payload's own header is
    * the source of truth (not the asset's declared sample metadata) —
    * samples convert to signed PCM and windows accumulate Σ s² as the
    * frames stream off the decoder. Multi-channel audio averages
    * channels per frame (mono mixdown), the framing convention the
    * stub path and the m3 oracle share. */
  def windowEnergiesWav(
      a: Multimodal.AudioAsset, windowSize: Int): Iterator[Multimodal.AudioWindow] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(a.data))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
      fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
      s"audio: only PCM WAV is decodable here, got ${fmt.getEncoding} in ${a.uri}")
    val bytesPerSample = fmt.getSampleSizeInBits / 8
    require(bytesPerSample == 1 || bytesPerSample == 2,
      s"audio: ${fmt.getSampleSizeInBits}-bit PCM unsupported in ${a.uri} (8/16 only)")
    val channels = fmt.getChannels
    val frameBytes = bytesPerSample * channels
    val buf = new Array[Byte](frameBytes * 1024) // stream in 1024-frame chunks
    new Iterator[Multimodal.AudioWindow] {
      private var windowIdx = 0
      private var frameInWindow = 0
      private var energy = 0L
      private var filled = 0 // bytes in buf
      private var off = 0
      private var eof = false
      private var pending: Multimodal.AudioWindow = null

      private def sampleAt(o: Int, ch: Int): Int = {
        val so = o + ch * bytesPerSample
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        if (bytesPerSample == 1) {
          if (unsigned) (buf(so) & 0xff) - 128 else buf(so).toInt
        } else {
          val (b0, b1) = if (fmt.isBigEndian) (buf(so), buf(so + 1)) else (buf(so + 1), buf(so))
          // unsigned 16-bit must NOT sign-extend the high byte: 0x8000
          // (midpoint silence) is +32768 raw, shifting to 0 — a
          // sign-extended read would turn it into -65536
          if (unsigned) (((b0 & 0xff) << 8) | (b1 & 0xff)) - 32768
          else (b0 << 8) | (b1 & 0xff)
        }
      }

      private def advance(): Unit = {
        while (pending == null && !eof) {
          if (off >= filled) {
            filled = ais.read(buf); off = 0
            if (filled <= 0) {
              eof = true; ais.close()
              if (frameInWindow > 0) { // trailing partial window
                pending = Multimodal.AudioWindow(
                  a.asset_id, windowIdx, windowIdx * windowSize, energy)
              }
              return
            }
          }
          while (off < filled && pending == null) {
            var s = 0L
            var ch = 0
            while (ch < channels) { s += sampleAt(off, ch); ch += 1 }
            val mono = s / channels
            energy += mono * mono
            off += frameBytes
            frameInWindow += 1
            if (frameInWindow == windowSize) {
              pending = Multimodal.AudioWindow(
                a.asset_id, windowIdx, windowIdx * windowSize, energy)
              windowIdx += 1; frameInWindow = 0; energy = 0L
            }
          }
        }
      }

      def hasNext: Boolean = { if (pending == null) advance(); pending != null }
      def next(): Multimodal.AudioWindow = {
        if (!hasNext) throw new NoSuchElementException
        val w = pending; pending = null; w
      }
    }
  }

  /** STUB — per-window energies Σ s_i² without materializing samples. */
  def windowEnergiesStub(
      a: Multimodal.AudioAsset, windowSize: Int): Iterator[Multimodal.AudioWindow] = {
    val h = imageCodec.hash60Of(a.data)
    val nWindows = (a.n_samples + windowSize - 1) / windowSize
    (0 until nWindows).iterator.map { w =>
      val start = w * windowSize
      val end = math.min(start + windowSize, a.n_samples)
      var e = 0L
      var i = start
      while (i < end) {
        val s = (h + i * 2654435761L) % 201 - 100
        e += s * s
        i += 1
      }
      Multimodal.AudioWindow(a.asset_id, w, start, e)
    }
  }
}
