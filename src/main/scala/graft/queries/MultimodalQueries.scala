package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing corpus: binary payload columns with typed
  * metadata, batch decode via typed mapPartitions, frame sampling via
  * flatMap. Payloads are synthesized from document text (no codecs in
  * this container — the decode is the documented deterministic stub),
  * so the md5-derived metadata is mirrored exactly in DuckDB.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_image_features" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val assets = Multimodal.assetsFrom(s, docs, "doc_id", "text", "image/fake")
      Multimodal.extractImageFeatures(assets)
        .select(col("asset_id"), col("width"), col("height"), col("n_bytes"))
        .orderBy(col("asset_id"))
    }),
    "m2_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val vids = Tables(s, dir, "documents").select(
        col("doc_id").as("asset_id"),
        concat(lit("mem://"), col("doc_id")).as("uri"),
        ((col("n_chars") % 100) + 1).cast("int").as("n_frames"),
        lit(25.0).as("fps"))
        .as[Multimodal.VideoAsset]
      Multimodal.sampleFrames(vids, everyN = 7)
        .toDF()
        .orderBy(col("asset_id"), col("frame_idx"))
    }),
    "m3_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val audio = Tables(s, dir, "documents").select(
        col("doc_id").as("asset_id"),
        concat(lit("mem://"), col("doc_id")).as("uri"),
        lit(16000).as("sample_rate"),
        ((col("n_chars") % 500) * 4 + 64).cast("int").as("n_samples"),
        encode(col("text"), "UTF-8").as("data"))
        .as[Multimodal.AudioAsset]
      Multimodal.windowedEnergy(audio, windowSize = 256)
        .toDF()
        .orderBy(col("asset_id"), col("window_idx"))
    }))

  val oracle: Map[String, String] = Map(
    "m1_image_features" ->
      """SELECT doc_id AS asset_id,
        | CAST(16 + (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 64) AS INTEGER) AS width,
        | CAST(16 + ((CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) >> 6) % 64) AS INTEGER) AS height,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id AS asset_id, CAST(f.i AS INTEGER) AS frame_idx,
        | CAST(f.i AS DOUBLE) / 25.0 AS ts_sec
        |FROM documents, LATERAL (
        | SELECT unnest(generate_series(0, CAST(n_chars % 100 AS INTEGER), 7)) AS i) f
        |ORDER BY asset_id, frame_idx""".stripMargin,
    "m3_audio_energy" ->
      """WITH a AS (SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h,
        |  CAST((n_chars % 500) * 4 + 64 AS INTEGER) AS n FROM documents)
        |SELECT doc_id AS asset_id, CAST(w.w AS INTEGER) AS window_idx,
        | CAST(w.w * 256 AS INTEGER) AS start_sample,
        | CAST(list_sum(list_transform(range(w.w * 256, least((w.w + 1) * 256, n)),
        |   i -> ((h + i * 2654435761) % 201 - 100) * ((h + i * 2654435761) % 201 - 100)))
        |  AS BIGINT) AS energy
        |FROM a, LATERAL (SELECT unnest(range(0, (n + 255) // 256)) AS w) w
        |ORDER BY asset_id, window_idx""".stripMargin
  )
}
