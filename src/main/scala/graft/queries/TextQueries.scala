package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.langProfiles

/** Text-analysis corpus (LLM-pipeline ops) over the documents table:
  * language ID, quality scoring, token counting, fingerprinting. Every
  * expression is mirrored in DuckDB SQL below, including the CASE-chain
  * argmax and the md5-derived char-gram sketch.
  */
object TextQueries {

  private val HDim = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "he1_hashed_embedding" -> ((s, dir) => {
      // vocabulary-free text embedding (hashing trick): signed bucket
      // counts l2-normalized — integer-exact until one sqrt + divide
      graft.operators.FeatureHashing
        .hashedTable(Tables(s, dir, "documents"), "doc_id", "text", HDim)
        .select(col("id").as("doc_id"), col("bucket").cast("int").as("bucket"),
          col("c"), col("weight"))
        .orderBy(col("doc_id"), col("bucket"))
    }),
    "t8_rarity" -> ((s, dir) => {
      // rare-token novelty screening: distinct-word count, rarest
      // word's document frequency, and hapax count per document
      graft.operators.TfIdf
        .rarityStats(Tables(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_distinct"), col("min_df"),
          col("n_hapax"))
        .orderBy(col("doc_id"))
    }),
    "cms1_sketch_counts" -> ((s, dir) => {
      // Count-Min word frequencies vs exact: the sketch builds as one
      // combinable (row, pos)-keyed sum (constant R×W size), estimates
      // ride as a plan-literal min-over-rows — collisions included,
      // deterministically mirrored by the DuckDB oracle
      val wx = Tables(s, dir, "documents")
        .select(explode(graft.operators.TextOps.words(col("text"))).as("word"))
      val width = 64
      val sk = graft.operators.CountMinSketch.build(wx, "word", width)
      wx.groupBy(col("word")).agg(count(lit(1)).as("exact_count"))
        .withColumn("est_count",
          graft.operators.CountMinSketch.estimate(col("word"), sk, width))
        .orderBy(col("word"))
    }),
    "t1_lang_id" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val scored = langProfiles.foldLeft(d.select(col("doc_id"), col("text"))) {
        case (acc, (l, p)) =>
          acc.withColumn(s"score_$l", TextAnalysis.profileScore(col("text"), p))
      }
      scored
        .withColumn("detected_lang", TextAnalysis.detectLanguage(col("text")))
        .select(col("doc_id") +: col("detected_lang") +:
          langProfiles.map { case (l, _) => col(s"score_$l") }: _*)
        .orderBy(col("doc_id"))
    }),
    "t2_quality_score" -> ((s, dir) => {
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        TextAnalysis.tokenCountWs(col("text")).as("n_words"),
        TextAnalysis.avgWordLen(col("text")).as("avg_word_len"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.punctCount(col("text")).as("punct_cnt"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"))
        .orderBy(col("doc_id"))
    }),
    "t3_token_count" -> ((s, dir) => {
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("tok_ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("tok_bpe"),
        TextAnalysis.tokenEstimate(col("text")).as("tok_est"))
        .orderBy(col("doc_id"))
    }),
    "t5_redact" -> ((s, dir) => {
      // synthesize PII-looking text deterministically, then scrub it
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.redact(concat(
          lit("contact user"), col("doc_id"), lit("@example.com id "),
          (col("doc_id") * 1000000 + 1234567).cast("string"), lit(" : "),
          substring(col("text"), 1, 40))).as("clean"))
        .orderBy(col("doc_id"))
    }),
    "t6_vocab" -> ((s, dir) => {
      // corpus vocabulary: top document-frequency words (dedup per doc),
      // deterministic tie-break on the word itself
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(graft.operators.TextOps.words(col("text")))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word"))
        .limit(20)
    }),
    "t7_winnowing_fp" -> ((s, dir) => {
      // MOSS winnowing fingerprints: per-row (tokenize → gram-hash →
      // windowed min → distinct), k=3 w=4 so any shared run of ≥ 6
      // tokens between two documents shares a fingerprint
      val p = s.sessionState.conf.numShufflePartitions
      graft.operators.Winnowing
        .fingerprintTable(Tables(s, dir, "documents").repartition(p),
          "doc_id", "text", k = 3, w = 4)
        .select(col("id").as("doc_id"), col("fp"))
        .orderBy(col("doc_id"), col("fp"))
    }),
    "t4_fingerprint" -> ((s, dir) => {
      // rebalance BEFORE the per-row md5 sketch: a single-file corpus
      // scans as 1-3 partitions, which would pin the CPU-heavy gram
      // hashing to as many cores (same pattern as TextOps.shingleTable)
      val p = s.sessionState.conf.numShufflePartitions
      Tables(s, dir, "documents").repartition(p).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        concat_ws(",", TextAnalysis.charGramSketch(col("text"))).as("sketch"))
        .orderBy(col("doc_id"))
    }))

  // ---- DuckDB mirrors -------------------------------------------------

  private val wordsExpr = OracleText.words

  private def scoreSql(profile: Seq[String]): String = {
    val arr = profile.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter($wordsExpr, x -> list_contains($arr, x))) AS INTEGER)"
  }

  private val detectSql: String = {
    val cases = langProfiles.map { case (l, _) =>
      val others = langProfiles.filter(_._1 != l)
        .map { case (o, _) => s"score_$l >= score_$o" }.mkString(" AND ")
      s"WHEN $others THEN '$l'"
    }.mkString("\n  ")
    s"CASE\n  $cases\n  ELSE 'und' END"
  }

  private val stopRatioSql = {
    val en = langProfiles.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter($wordsExpr, x -> list_contains($en, x))) AS DOUBLE) / len($wordsExpr)"
  }

  private val punctCntSql =
    """length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))"""

  private val avgWordLenSql =
    s"CAST(list_reduce(list_transform($wordsExpr, x -> CAST(length(x) AS BIGINT)), (a, x) -> a + x) AS DOUBLE) / len($wordsExpr)"

  private val hex60 = (e: String) =>
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  private val gramHashesSql =
    s"list_transform(range(1, greatest(1, length(text) - 7) + 1), i -> ${hex60("substr(text, i, 8)")})"

  val oracle: Map[String, String] = Map(
    "cms1_sketch_counts" ->
      // the sketch rebuilt in SQL: same md5 hash pair, same
      // Kirsch-Mitzenmacher positions, integer cell sums — estimates
      // (collisions included) match the plan-literal probe bit-for-bit
      s"""WITH wx AS (SELECT unnest($wordsExpr) AS word FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_count
         | FROM wx GROUP BY word),
         |h AS (SELECT word, exact_count,
         |  ${hex60("word")} AS h1,
         |  (CAST(concat('0x', substr(md5(word), 17, 15)) AS BIGINT) // 32) AS h2d
         | FROM c),
         |p AS (SELECT word, exact_count, r.r AS r, (h1 + r.r * h2d) % 64 AS pos
         | FROM h, (SELECT unnest(range(0, 4)) AS r) r),
         |cells AS (SELECT r, pos, CAST(SUM(exact_count) AS BIGINT) AS cell
         | FROM p GROUP BY r, pos),
         |est AS (SELECT p.word, MIN(cells.cell) AS est_count
         | FROM p JOIN cells USING (r, pos) GROUP BY p.word)
         |SELECT c.word, c.exact_count, est.est_count
         |FROM c JOIN est USING (word) ORDER BY word""".stripMargin,
    "t8_rarity" ->
      s"""WITH wv AS (SELECT doc_id, word FROM
         |  (SELECT doc_id, unnest($wordsExpr) AS word FROM documents)
         | WHERE word <> ''),
         |tf AS (SELECT doc_id, word FROM wv GROUP BY doc_id, word),
         |dfx AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
         | FROM tf GROUP BY word)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
         | MIN(df) AS min_df,
         | CAST(COUNT(*) FILTER (WHERE df = 1) AS BIGINT) AS n_hapax
         |FROM tf JOIN dfx USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "he1_hashed_embedding" ->
      s"""WITH wx AS (SELECT doc_id, unnest($wordsExpr) AS word FROM documents),
         |hb AS (SELECT doc_id,
         |  ${hex60("word")} % $HDim AS bucket,
         |  CASE WHEN CAST(concat('0x', substr(md5(word), 17, 15)) AS BIGINT) % 2 = 0
         |       THEN 1 ELSE -1 END AS s
         | FROM wx),
         |c AS (SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS c
         | FROM hb GROUP BY doc_id, bucket HAVING SUM(s) <> 0),
         |n AS (SELECT doc_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
         | FROM c GROUP BY doc_id)
         |SELECT c.doc_id, CAST(bucket AS INTEGER) AS bucket, c.c AS c,
         | c.c / n.nrm AS weight
         |FROM c JOIN n USING (doc_id) ORDER BY doc_id, bucket""".stripMargin,
    "t1_lang_id" -> {
      val scoreCols = langProfiles
        .map { case (l, p) => s"${scoreSql(p)} AS score_$l" }.mkString(",\n  ")
      s"""WITH s AS (SELECT doc_id, text,
         |  $scoreCols
         | FROM documents)
         |SELECT doc_id, $detectSql AS detected_lang,
         | ${langProfiles.map { case (l, _) => s"score_$l" }.mkString(", ")}
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "t2_quality_score" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS INTEGER) AS len_chars,
         | CAST(len($wordsExpr) AS INTEGER) AS n_words,
         | $avgWordLenSql AS avg_word_len,
         | $stopRatioSql AS stopword_ratio,
         | CAST($punctCntSql AS INTEGER) AS punct_cnt,
         | ($stopRatioSql) * 0.3
         |  + (1.0 - CAST($punctCntSql AS DOUBLE) / length(text)) * 0.3
         |  + least(1.0, CAST(len($wordsExpr) AS DOUBLE) / 100.0) * 0.4 AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_token_count" ->
      s"""SELECT doc_id,
         | CAST(len($wordsExpr) AS INTEGER) AS tok_ws,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]+(''[a-z]+)?|[0-9]+|[^A-Za-z0-9\\s]+')) AS INTEGER) AS tok_bpe,
         | CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tok_est
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t5_redact" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(
        |   'contact user' || CAST(doc_id AS VARCHAR) || '@example.com id ' ||
        |     CAST(doc_id * 1000000 + 1234567 AS VARCHAR) || ' : ' || substring(text, 1, 40),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{7,}', '<NUM>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t6_vocab" ->
      s"""SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM (
         | SELECT doc_id, unnest(list_distinct($wordsExpr)) AS word FROM documents)
         |GROUP BY word ORDER BY df DESC, word LIMIT 20""".stripMargin,
    "t7_winnowing_fp" ->
      s"""WITH ww AS (SELECT doc_id, $wordsExpr AS w FROM documents),
         |hs AS (SELECT doc_id, list_transform(range(1, len(w) - 1),
         |   i -> ${hex60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")}) AS hs
         | FROM ww WHERE len(w) >= 3),
         |fps AS (SELECT doc_id,
         |  CASE WHEN len(hs) >= 4 THEN
         |    list_distinct(list_transform(range(1, len(hs) - 2),
         |      i -> list_min(hs[i : i + 3])))
         |   ELSE [list_min(hs)] END AS fps
         | FROM hs)
         |SELECT doc_id, unnest(fps) AS fp FROM fps
         |ORDER BY doc_id, fp""".stripMargin,
    "t4_fingerprint" ->
      s"""SELECT doc_id,
         | list_min($gramHashesSql) AS fingerprint,
         | array_to_string(list_sort(list_distinct($gramHashesSql))[1:4], ',') AS sketch
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
