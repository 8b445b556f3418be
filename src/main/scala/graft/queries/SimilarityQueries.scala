package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search corpus (LLM-pipeline ops): exact top-k cosine
  * nearest-neighbor as the baseline, hyperplane-LSH ANN as the scale
  * path. Both are mirrored exactly in DuckDB (the LSH hyperplanes are
  * md5-derived, so bucketing is portable too).
  */
object SimilarityQueries {

  private val Dim = 64
  private val K = 5
  private val Planes = 8
  private val NQueries = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_knn_bruteforce" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("rank"))
    }),
    "n2_ann_lsh" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.annTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, Planes, Dim)
        .orderBy(col("query_id"), col("rank"))
    }))

  private def dot(a: String, b: String) =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)), (x, y) -> x + y)"

  /** DuckDB mirror of Similarity.hyperplaneBucket: bit p = sign of the
    * projection onto md5-derived plane p. */
  private def bucketSql(t: String): String =
    (0 until Planes).map { p =>
      val comp = s"CAST(CAST(concat('0x', substr(md5('plane$p:' || CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 - 0.5"
      val proj = s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> CAST($t.embedding[i] AS DOUBLE) * ($comp)), (x, y) -> x + y)"
      s"(CASE WHEN $proj > 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "n1_knn_bruteforce" ->
      s"""WITH n AS (SELECT vec_id, embedding,
         |  sqrt(${dot("e", "e")}) AS nrm FROM embeddings e)
         |SELECT query_id, corpus_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         | SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |  ${dot("q", "c")} / (q.nrm * c.nrm) AS cos_sim,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${dot("q", "c")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rank
         | FROM (SELECT * FROM n WHERE vec_id < $NQueries) q
         | JOIN n c ON q.vec_id != c.vec_id)
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "n2_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
         |  sqrt(${dot("e", "e")}) AS nrm,
         |  ${bucketSql("e")} AS bucket
         | FROM embeddings e)
         |SELECT query_id, corpus_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         | SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |  ${dot("q", "c")} / (q.nrm * c.nrm) AS cos_sim,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${dot("q", "c")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rank
         | FROM (SELECT * FROM b WHERE vec_id < $NQueries) q
         | JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id)
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  )
}
