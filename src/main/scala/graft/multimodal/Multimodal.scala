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
  * STUB NOTE: this container has no image/audio codecs, so
  * [[ImageCodec.decodeStub]] is a deterministic fake (md5-derived
  * dimensions and features). The Spark-side plumbing — schemas, encoder
  * signatures, batch shape, partition sizing — is real and tested; a
  * production build swaps the stub body for a JNI/javacv decoder with
  * the same signature.
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
        val img = codec.decodeStub(a.data)
        ImageFeatures(a.asset_id, img.width, img.height, a.data.length.toLong,
          codec.featurizeStub(a.data, embeddingDim))
      }
    }
  }

  /** Resize images in partition batches (stubbed scaler: real builds
    * swap the codec body; the metadata math and batch shape are the
    * production path). Output dims are the stub-decoded dims scaled to
    * fit (maxW, maxH) preserving aspect ratio. */
  def resizeImages(
      ds: Dataset[ImageAsset], maxW: Int, maxH: Int): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageCodec
      it.map { a =>
        val img = codec.decodeStub(a.data)
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
    * mapPartitions like the image path (one codec per partition); the
    * stub decoder streams samples, so a window's energy accumulates
    * without materializing the waveform. */
  def windowedEnergy(
      ds: Dataset[AudioAsset], windowSize: Int = 256): Dataset[AudioWindow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new AudioCodec // per-partition init, amortized
      it.flatMap(a => codec.windowEnergiesStub(a, windowSize))
    }
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
}

/** Stub codec: deterministic md5-derived "decode". A real build replaces
  * the two stub bodies (same signatures) with an actual codec. */
final class ImageCodec {

  private val md = MessageDigest.getInstance("MD5")

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

/** Stub audio codec: deterministic md5-derived "PCM" — sample i of an
  * asset with payload hash h is ((h + i·2654435761) mod 201) − 100, a
  * pseudo-waveform in [−100, 100]. A real build replaces the sample
  * generator with an actual decoder; the streaming per-window
  * accumulation (never materializing the waveform) is the production
  * shape.
  */
final class AudioCodec {
  private val imageCodec = new ImageCodec

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
