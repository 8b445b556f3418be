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
    "m4_image_neardup" -> ((s, dir) => {
      // null text == empty payload (the repo-wide coalesce contract —
      // the oracle mirrors with md5(coalesce(text, '')))
      val docs = Tables(s, dir, "documents")
        .withColumn("text", coalesce(col("text"), lit("")))
      val assets = Multimodal.assetsFrom(s, docs, "doc_id", "text", "image/fake")
      // perceptual hashes (stub path on this corpus: md5-derived, so
      // DuckDB replays it exactly) through the SHARED Hamming-bucketed
      // pair machinery — 16-bit chunk pigeonhole, value-grouped
      // candidates, never the O(n²) pair space
      graft.operators.SimHash.nearPairs(
        Multimodal.perceptualHashes(assets), maxDist = 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "m5_image_dedup_clusters" -> ((s, dir) => {
      // near-dup CLUSTERS over the perceptual hashes — the d6 shape on
      // the multimodal side: CC runs on the tiny verified rep-pair
      // graph, members label through one join
      val docs = Tables(s, dir, "documents")
        .withColumn("text", coalesce(col("text"), lit("")))
      val assets = Multimodal.assetsFrom(s, docs, "doc_id", "text", "image/fake")
      graft.operators.SimHash.nearDupClusters(
        Multimodal.perceptualHashes(assets), maxDist = 3)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .orderBy(col("doc_id"))
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

  import graft.operators.SimHash

  /** hexHash64 mirror over the fake-image payload (= UTF-8 of text):
    * signed 64-bit from two 32-bit md5 halves, pure BIGINT arithmetic
    * (DuckDB `<<` raises on 64-bit shift overflow) — the documented
    * [[graft.plans.HexHash60.hash64]] formula. Shared hash + chunk +
    * candidate CTEs for the m4 pair and m5 cluster oracles. */
  private val m4Ctes: String =
    s"""hx AS (SELECT doc_id,
       |  CAST(concat('0x', substr(md5(coalesce(text, '')), 1, 8)) AS BIGINT) AS hi,
       |  CAST(concat('0x', substr(md5(coalesce(text, '')), 9, 8)) AS BIGINT) AS lo
       | FROM documents),
       |sh AS (SELECT doc_id,
       |  (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + lo AS simhash
       | FROM hx),
       |chunks AS (
       | SELECT doc_id, simhash, c.c, (simhash >> (c.c * ${SimHash.ChunkBits})) & ${(1 << SimHash.ChunkBits) - 1} AS ck
       | FROM sh, (SELECT unnest(range(0, ${SimHash.Chunks})) AS c) c),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.simhash AS sh_a, b.simhash AS sh_b
       | FROM chunks a JOIN chunks b ON a.c = b.c AND a.ck = b.ck
       |  AND a.doc_id < b.doc_id)""".stripMargin

  private val m4Oracle: String =
    s"""WITH $m4Ctes
       |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** Connected components over the verified pair list, min-id labels —
    * the d6 oracle's recursive-reach construction on m4's edges. */
  private val m5Oracle: String =
    s"""WITH RECURSIVE $m4Ctes,
       |edges AS (SELECT id_a, id_b FROM cand
       | WHERE bit_count(xor(sh_a, sh_b)) <= 3),
       |sym AS (
       | SELECT id_a AS a, id_b AS b FROM edges
       | UNION SELECT id_b AS a, id_a AS b FROM edges),
       |reach(id, r) AS (
       | SELECT DISTINCT a, a FROM sym
       | UNION
       | SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id)
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "m4_image_neardup" -> m4Oracle,
    "m5_image_dedup_clusters" -> m5Oracle,
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
