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
  // IVF coarse quantizer: centroids = vectors with id % 23 == 7
  // (~22 lists at sf0.01, ~87 at sf0.1 ≈ √n); probe the 4 nearest lists
  private val CentroidMod = 23
  private val CentroidRem = 7
  private val NProbe = 4
  // n5: Lloyd rounds refining the id-mod seed family (fixed, so the
  // iterative operator is oracle-graded end-to-end, not just quality-spec'd)
  private val KmIters = 2
  // pc1: power-iteration rounds on the quantized covariance
  private val PcIters = 2

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
    }),
    "n3_ann_ivf" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, CentroidMod, CentroidRem, NProbe)
        .orderBy(col("query_id"), col("rank"))
    }),
    "n5_ann_ivf_kmeans" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding",
        CentroidMod, CentroidRem, KmIters)
      Similarity.ivfTopKWith(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K, cents, NProbe)
        .orderBy(col("query_id"), col("rank"))
    }),
    "em1_centroid_dist" -> ((s, dir) => {
      // embedding-outlier screening: exact integer n²-scaled squared
      // distance to the corpus centroid (one moments pass, then a
      // map-only fold against the mean literal)
      graft.operators.Pca.centroidDistances(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", Dim)
        .select(col("id").as("vec_id"), col("dist2"))
        .orderBy(col("vec_id"))
    }),
    "pc1_pca_power" -> ((s, dir) => {
      // top principal component of the quantized embedding corpus:
      // one exact distributed moment pass + driver power iteration,
      // bit-replayed by DuckDB round for round
      graft.operators.Pca.topComponentDF(
          s, Tables(s, dir, "embeddings"), "embedding", Dim, PcIters)
        .orderBy(col("dim_idx"))
    }),
    "e1_embed_quantize" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      e.select(col("vec_id"),
          graft.operators.Embeddings.l2Norm(col("embedding")).as("nrm"),
          graft.operators.Embeddings.quantize(col("embedding")).as("q"))
        .select(col("vec_id"), col("nrm"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
        .orderBy(col("vec_id"))
    }),
    "n4_kmeans_step" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.operators.Embeddings.quantizedKMeansStep(
          e, "vec_id", "embedding", CentroidMod, CentroidRem)
        .orderBy(col("list_id"), col("pos"))
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

  /** Fold-ordered dot product over two arbitrary list expressions
    * (DuckDB mirror of Similarity.dot on renamed CTE columns). */
  private def dotCols(a: String, b: String) =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  private val n3Oracle: String = {
    val qc = s"${dotCols("q.embedding", "c.cemb")} / (q.nrm * c.cnrm)"
    val nc = s"${dotCols("n.embedding", "c.cemb")} / (n.nrm * c.cnrm)"
    val pa = s"${dotCols("p.qv", "a.cv")} / (p.qn * a.cn)"
    s"""WITH n AS (SELECT vec_id, embedding,
       |  sqrt(${dot("e", "e")}) AS nrm FROM embeddings e),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       | FROM n WHERE vec_id % $CentroidMod = $CentroidRem),
       |asgn AS (
       | SELECT vec_id AS corpus_id, embedding AS cv, nrm AS cn, cent_id AS list_id FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |   row_number() OVER (PARTITION BY n.vec_id
       |     ORDER BY $nc DESC, c.cent_id) AS rn
       |  FROM n, cents c) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, cent_id AS list_id FROM (
       |  SELECT q.vec_id, q.embedding, q.nrm, c.cent_id,
       |   row_number() OVER (PARTITION BY q.vec_id
       |     ORDER BY $qc DESC, c.cent_id) AS rn
       |  FROM (SELECT * FROM n WHERE vec_id < $NQueries) q, cents c) WHERE rn <= $NProbe)
       |SELECT query_id, corpus_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
       | SELECT p.query_id, a.corpus_id, $pa AS cos_sim,
       |  row_number() OVER (PARTITION BY p.query_id
       |    ORDER BY $pa DESC, a.corpus_id) AS rank
       | FROM probes p JOIN asgn a
       |  ON p.list_id = a.list_id AND p.query_id <> a.corpus_id)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of the full kmeans-IVF chain: seed centroids →
    * `KmIters` Lloyd rounds (assignment argmax with the same
    * (cos DESC, cent_id ASC) tie-break, then per-(list, dim)
    * EXACT-DECIMAL mean — `CAST(SUM(CAST(x AS DECIMAL(38,18))) AS
    * DOUBLE) / COUNT(*)`, the order-independent form kmeansCentroids
    * itself computes) → IVF probe/rank against the refined centroids.
    * Zero-norm seeds/centroids drop out on both sides (`nrm > 0`),
    * mirroring the NaN-capture guard. */
  private val n5Oracle: String = {
    // nearest-centroid assignment of CTE `src` against centroid CTE `ct`
    def assign(src: String, ct: String, keep: String) = {
      val cos = s"${dotCols(s"$src.embedding", "c.cemb")} / ($src.nrm * c.cnrm)"
      s"""SELECT vec_id, embedding, nrm, cent_id AS list_id FROM (
         |  SELECT $src.vec_id, $src.embedding, $src.nrm, c.cent_id,
         |   row_number() OVER (PARTITION BY $src.vec_id
         |     ORDER BY $cos DESC, c.cent_id) AS rn
         |  FROM $src, $ct c) WHERE $keep""".stripMargin
    }
    // one Lloyd re-centering: per-(list, dim) exact-decimal mean of the
    // assigned vectors, reassembled in dimension order, zero-norm lists out
    def recenter(asgn: String) = {
      val nrm = s"sqrt(${dotCols("cemb", "cemb")})"
      s"""SELECT * FROM (
         | SELECT cent_id, cemb, $nrm AS cnrm FROM (
         |  SELECT list_id AS cent_id, list(m ORDER BY pos) AS cemb FROM (
         |   SELECT a.list_id, p.pos,
         |    CAST(SUM(CAST(CAST(a.embedding[p.pos + 1] AS DOUBLE)
         |      AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
         |   FROM $asgn a, (SELECT unnest(range(0, $Dim)) AS pos) p
         |   GROUP BY a.list_id, p.pos) GROUP BY list_id))
         |WHERE cnrm > 0""".stripMargin
    }
    val qc = s"${dotCols("q.embedding", "c.cemb")} / (q.nrm * c.cnrm)"
    val pa = s"${dotCols("p.qv", "a.cv")} / (p.qn * a.cn)"
    s"""WITH n AS (SELECT vec_id, embedding,
       |  sqrt(${dot("e", "e")}) AS nrm FROM embeddings e),
       |c0 AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       | FROM n WHERE vec_id % $CentroidMod = $CentroidRem AND nrm > 0),
       |a1 AS (${assign("n", "c0", "rn = 1")}),
       |c1 AS (${recenter("a1")}),
       |a2 AS (${assign("n", "c1", "rn = 1")}),
       |c2 AS (${recenter("a2")}),
       |asgn AS (SELECT vec_id AS corpus_id, embedding AS cv, nrm AS cn, list_id
       | FROM (${assign("n", "c2", "rn = 1")})),
       |probes AS (
       | SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, cent_id AS list_id FROM (
       |  SELECT q.vec_id, q.embedding, q.nrm, c.cent_id,
       |   row_number() OVER (PARTITION BY q.vec_id
       |     ORDER BY $qc DESC, c.cent_id) AS rn
       |  FROM (SELECT * FROM n WHERE vec_id < $NQueries) q, c2 c) WHERE rn <= $NProbe)
       |SELECT query_id, corpus_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
       | SELECT p.query_id, a.corpus_id, $pa AS cos_sim,
       |  row_number() OVER (PARTITION BY p.query_id
       |    ORDER BY $pa DESC, a.corpus_id) AS rank
       | FROM probes p JOIN asgn a
       |  ON p.list_id = a.list_id AND p.query_id <> a.corpus_id)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  // zero-norm guard mirrors Embeddings.quantize: a zero vector
  // quantizes to all zeros instead of 0/0 → NaN (whose int cast
  // diverges across engines)
  private val quantizeExpr = (v: String, nrm: String) =>
    s"(CASE WHEN $nrm = 0 THEN list_transform($v, x -> 0) ELSE " +
      s"list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) / $nrm * 127.0 + 0.5) AS INTEGER)) END)"

  private val e1Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  sqrt(${dot("e", "e")}) AS nrm FROM embeddings e),
       |q AS (SELECT vec_id, nrm,
       |  ${quantizeExpr("embedding", "nrm")} AS q FROM n)
       |SELECT vec_id, nrm,
       | CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
       | list_aggregate(q, 'min') AS q_min,
       | list_aggregate(q, 'max') AS q_max
       |FROM q ORDER BY vec_id""".stripMargin

  private val n4Oracle: String = {
    val nc = s"${dotCols("n.embedding", "c.cemb")} / (n.nrm * c.cnrm)"
    s"""WITH n AS (SELECT vec_id, embedding,
       |  sqrt(${dot("e", "e")}) AS nrm FROM embeddings e),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       | FROM n WHERE vec_id % $CentroidMod = $CentroidRem),
       |asgn AS (
       | SELECT vec_id, embedding AS cv, nrm AS cn, cent_id AS list_id FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |   row_number() OVER (PARTITION BY n.vec_id
       |     ORDER BY $nc DESC, c.cent_id) AS rn
       |  FROM n, cents c) WHERE rn = 1),
       |q AS (SELECT list_id, ${quantizeExpr("cv", "cn")} AS q FROM asgn),
       |ex AS (SELECT list_id, p.pos, q[p.pos + 1] AS qv
       | FROM q, (SELECT unnest(range(0, $Dim)) AS pos) p)
       |SELECT list_id, CAST(pos AS INTEGER) AS pos,
       | CAST(SUM(qv) AS DOUBLE) / COUNT(*) AS centroid_val
       |FROM ex GROUP BY list_id, pos ORDER BY list_id, pos""".stripMargin
  }

  /** pc1 mirror: exact integer moments, covariance as the same
    * fixed-order division/multiply sequence, then [[PcIters]] power
    * rounds as chained CTEs — each round a j-ordered list fold (DuckDB
    * list_reduce seeds with the first element; the driver's 0.0 seed
    * is bit-identical because 0.0 + x == x for every product here). */
  private val pc1Oracle: String = {
    val d1 = Dim + 1
    val rounds = (1 to PcIters).map { k =>
      s"""r$k AS (SELECT i, list_reduce(list_transform(range(1, $d1),
         |   j -> arow[j] * v${k - 1}.v[j]), (x, y) -> x + y) AS u
         | FROM ar, v${k - 1}),
         |n$k AS (SELECT sqrt(list_reduce(list_transform(list(u ORDER BY i), x -> x * x),
         |   (x, y) -> x + y)) AS nrm FROM r$k),
         |v$k AS (SELECT list_transform(list(u ORDER BY i), x -> x / n$k.nrm) AS v
         | FROM r$k, n$k GROUP BY n$k.nrm)"""
    }.mkString(",\n|")
    s"""WITH nv AS (SELECT vec_id, embedding, sqrt(${dot("e", "e")}) AS nrm
       | FROM embeddings e WHERE len(embedding) = $Dim),
       |q AS (SELECT ${quantizeExpr("embedding", "nrm")} AS q FROM nv),
       |S AS (SELECT t.i AS i, u.j AS j, CAST(SUM(q.q[t.i] * q.q[u.j]) AS BIGINT) AS s
       | FROM q, range(1, $d1) t(i), range(1, $d1) u(j) GROUP BY t.i, u.j),
       |m AS (SELECT t.i AS i, CAST(SUM(q.q[t.i]) AS BIGINT) AS m
       | FROM q, range(1, $d1) t(i) GROUP BY t.i),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
       |A AS (SELECT S.i, S.j,
       |  CAST(S.s AS DOUBLE) / CAST(n.n AS DOUBLE)
       |   - (CAST(m1.m AS DOUBLE) / CAST(n.n AS DOUBLE))
       |     * (CAST(m2.m AS DOUBLE) / CAST(n.n AS DOUBLE)) AS a
       | FROM S JOIN m m1 ON S.i = m1.i JOIN m m2 ON S.j = m2.i, n),
       |ar AS (SELECT i, list(a ORDER BY j) AS arow FROM A GROUP BY i),
       |v0 AS (SELECT list_transform(range(1, $d1), x -> 1.0) AS v),
       |$rounds
       |SELECT CAST(t.j - 1 AS INTEGER) AS dim_idx, v.v[t.j] AS component
       |FROM v$PcIters v, range(1, $d1) t(j) ORDER BY dim_idx""".stripMargin
  }

  private val em1Oracle: String = {
    val d1 = Dim + 1
    s"""WITH nv AS (SELECT vec_id, embedding, sqrt(${dot("e", "e")}) AS nrm
       | FROM embeddings e WHERE len(embedding) = $Dim),
       |q AS (SELECT vec_id, ${quantizeExpr("embedding", "nrm")} AS q FROM nv),
       |m AS (SELECT t.i AS i, CAST(SUM(q.q[t.i]) AS BIGINT) AS m
       | FROM q, range(1, $d1) t(i) GROUP BY t.i),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
       |ex AS (SELECT vec_id, t.i AS i, q.q[t.i] AS qv
       | FROM q, range(1, $d1) t(i))
       |SELECT vec_id,
       | CAST(SUM((n.n * qv - m.m) * (n.n * qv - m.m)) AS BIGINT) AS dist2
       |FROM ex JOIN m ON ex.i = m.i, n
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "em1_centroid_dist" -> em1Oracle,
    "pc1_pca_power" -> pc1Oracle,
    "n3_ann_ivf" -> n3Oracle,
    "n5_ann_ivf_kmeans" -> n5Oracle,
    "e1_embed_quantize" -> e1Oracle,
    "n4_kmeans_step" -> n4Oracle,
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
