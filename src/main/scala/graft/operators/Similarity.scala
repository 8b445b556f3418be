package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity: cosine kernel, near-duplicate pairs, top-k
  * nearest-neighbor search, and a hyperplane-LSH scale path
  * (LLM-pipeline ops).
  *
  * Numeric determinism: dot products and norms fold left-to-right over
  * the vector (aggregate over zip_with), so the resulting doubles are
  * bit-identical across engines that use the same order — which is what
  * lets cosine results hash-match a DuckDB `list_reduce` oracle.
  *
  * Scale design: [[bruteForcePairs]]/[[bruteForceTopK]] are O(n²·d) and
  * exact — right for ≤10⁵ vectors or as the verifier behind an ANN
  * candidate stage. [[hyperplaneBuckets]] gives the 100-TB path: p
  * deterministic pseudo-random hyperplanes → p-bit bucket key → bucket
  * join, candidates verified with exact cosine. Bucketing is a single
  * per-row projection; the join shuffles on the bucket key only.
  */
object Similarity {

  /** Left-to-right dot product of two float-array columns as double.
    * Backed by the native codegen'd [[graft.plans.VectorDot]]
    * expression — same value and fold order as the builtin
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)` chain, without the
    * per-row product-array allocation and lambda dispatch. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorDot(a, b)

  /** Rebalance rows to the session shuffle parallelism before an
    * O(n·d)-or-worse per-row stage: an embedding table often arrives as
    * few parquet files, and the downstream cross-join/bucket compute
    * would otherwise run on that few cores. The shuffle moves each row
    * once — noise next to the per-row vector math it parallelizes. */
  private def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  def norm2(a: Column): Column = dot(a, a)

  /** cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) in fixed op order. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** All pairs (id_a < id_b) with cosine ≥ threshold. Exact, O(n²·d):
    * norms are precomputed per row so the cross join multiplies-adds d
    * ops per pair. Use the LSH path beyond ~10⁵ vectors. */
  def bruteForcePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // cast to double once per row, not once per pair (O(n) vs O(n²) casts)
    val withNorm = rebalance(df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .withColumn("n", sqrt(norm2(col("v"))))
    val a = withNorm.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Exact top-k neighbors for each query vector (query rows × corpus
    * rows cross join → per-query window rank). Ties break on corpus id
    * so results are total-ordered. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = rebalance(corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", sqrt(norm2(col("cv"))))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(norm2(col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim
    * i): md5-derived value in [-0.5, 0.5). Same value as the SQL form
    * `hexHash60('plane<p>:<i>') / 2^60 - 0.5`, but computed ONCE at plan
    * build time: the planes are constants, so deriving them per row
    * (corpus × planes × dim md5 calls) would dominate the whole bucket
    * stage. */
  private def planeComponent(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2.0, 60) - 0.5
  }

  /** p-bit LSH bucket key: bit j = sign of <v, plane_j>. Vectors in the
    * same bucket are likely neighbors (random-hyperplane LSH). The plane
    * vectors are literal arrays; each projection is one codegen'd
    * [[dot]] with the same left-to-right fold as the SQL mirror. */
  def hyperplaneBucket(vecCol: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { pl =>
      val plane = lit(Array.tabulate(dim)(i => planeComponent(pl, i)))
      val proj = dot(vecCol.cast("array<double>"), plane)
      when(proj > 0, lit(1L << pl)).otherwise(0L)
    }.reduce[Column](_ + _)

  /** IVF list assignment: every corpus vector goes to its nearest
    * coarse centroid (highest cosine, ties to the lowest centroid id).
    *
    * The coarse quantizer is data-derived and deterministic: the
    * centroids are the corpus vectors whose id satisfies
    * `id % centroidMod == centroidRem` (≈ n/centroidMod lists — pick
    * centroidMod ≈ √n so list size ≈ centroid count). For a
    * k-means-refined quantizer, feed [[kmeansCentroids]] into
    * [[ivfTopKWith]] — same assignment/probe machinery, better lists
    * (recall floor pinned by IvfKmeansQualitySpec).
    *
    * Scale design (r17): the centroid table is tiny (√n rows) and
    * collected once at plan-build time; assignment is then a map-only
    * codegen'd argmax per corpus row — ZERO shuffles (the pre-r17
    * shape shuffled the whole corpus through a groupBy(id, v, n)
    * argmax carrying the full vectors). */
  def ivfAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, centroidRem: Int): DataFrame = {
    val c = prepVectors(corpus, idCol, vecCol)
    // centroid collect reads the un-rebalanced projection: same rows,
    // same per-row norms, one shuffle less in the plan-build job (r17)
    val cents = corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("id") % centroidMod === centroidRem)
      .select(col("id").as("cent_id"), col("v").as("cent_v"),
        sqrt(norm2(col("v"))).as("cent_n"))
    assignToCentroids(c, cents)
  }

  /** (id, v, n) prep shared by the IVF paths: project, cast, rebalance,
    * precompute the norm once per row. */
  private def prepVectors(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    rebalance(corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .withColumn("n", sqrt(norm2(col("v"))))

  /** Collect an arbitrary (cent_id, cent_v, cent_n) quantizer table to
    * the driver for the map-side assignment (r17): C ≈ √n rows — the
    * same order of driver memory as the broadcast hash relation the
    * old crossJoin(broadcast) shape built anyway. Returns the sorted
    * set plus the id column's type (the assignment casts its output
    * back, so `list_id` keeps joining/naming exactly as before). */
  private def collectCentroids(
      cents: DataFrame): (graft.plans.CentroidSet, org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    val idType = cents.schema("cent_id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"centroid ids must be integral (they tie-break the argmax " +
        s"numerically), got ${idType.simpleString}")
    val rows = cents.select(col("cent_id").cast("long"),
      col("cent_v").cast("array<double>"), col("cent_n").cast("double")).collect()
    val triples = rows.toSeq.map { r =>
      val cv =
        if (r.isNullAt(1)) None
        else {
          val s = r.getSeq[Any](1)
          if (s.contains(null)) None // null element → cosine always null
          else Some(s.map(_.asInstanceOf[Double]).toArray)
        }
      val cn = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      (r.getLong(0), cv, cn)
    }
    (graft.plans.CentroidSet(triples), idType)
  }

  /** Nearest-centroid argmax against an arbitrary (cent_id, cent_v,
    * cent_n) table — ONE codegen'd projection per corpus row, no
    * exchange (r17; was crossJoin(broadcast) + a corpus-sized
    * groupBy(id, v, n) argmax shuffle carrying the full vectors). The
    * centroid table is collected once at plan-build time — see
    * [[graft.plans.CentroidSet]] for the exact value/ordering contract
    * and the one documented divergence (exact-duplicate (id, v, n)
    * rows are no longer collapsed; all callers feed unique ids). */
  private def assignToCentroids(c: DataFrame, cents: DataFrame): DataFrame = {
    val (set, idType) = collectCentroids(cents)
    assignToCollected(c, set, idType)
  }

  /** The map-side face of [[assignToCentroids]] when the centroid set
    * is already collected (the kmeans loop holds it round to round). A
    * null vector/norm coalesces to the lowest centroid id — exactly
    * what max(struct(null_cos, -cent_id)) produced; an empty centroid
    * set yields the empty frame the old crossJoin produced. */
  private def assignToCollected(
      c: DataFrame, set: graft.plans.CentroidSet,
      idType: org.apache.spark.sql.types.DataType): DataFrame =
    if (set.isEmpty)
      c.filter(lit(false)).withColumn("list_id", lit(null).cast(idType))
    else c.withColumn("list_id",
      coalesce(graft.plans.NearestCentroid(col("v"), col("n"), set),
        lit(set.minId)).cast(idType))

  /** SemDeDup-style semantic deduplication (public technique: Abbas et
    * al. 2023, arXiv:2303.09540 — cluster embeddings, drop
    * near-duplicates within each cluster): vectors are assigned to
    * their IVF list ([[ivfAssign]]'s deterministic id-mod quantizer),
    * pairwise cosine runs ONLY within a list, and every vector with an
    * above-threshold partner of LOWER id becomes a drop candidate.
    * Returns (doc_id, keep_id, max_cos): the dropped vector, its
    * lowest-id above-threshold partner, and its best cosine —
    * `corpus.join(result, "doc_id", "left_anti")` is the deduped set.
    *
    * Scale shape: assignment is the broadcast-centroid map-only argmax;
    * the pair stage shuffles both sides on `list_id` once and computes
    * |list|² cosines per list — Σ|list|² ≈ n·(n/C), so with the
    * recommended C ≈ √n it is n^1.5 TOTAL, never the corpus-wide n²
    * cross join; the final per-doc keep/max is one map-side-combinable
    * min/max aggregation. Same within-bucket-only discipline as the
    * LSH/banded dedup family.
    *
    * Zero-norm vectors are excluded from the pair stage: their cosine
    * is 0/0 = NaN, and Spark's NaN-as-largest ordering would make
    * `NaN >= threshold` TRUE — one all-zero embedding with a low id
    * would silently mark its entire list as drop candidates (the same
    * NaN-capture [[kmeansCentroids]] guards against). A zero vector
    * has no cosine neighborhood, so excluding it is the semantics, not
    * a shortcut.
    *
    * Eager, like [[kmeansCentroids]]: the corpus-sized assignment is
    * cached only within this call (the pair self-join reads it twice;
    * Spark does not reuse a subplan across self-join branches) and
    * released before returning; the RETURNED drop-candidate table is
    * cached and materialized — `unpersist()` it when consumed. */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, centroidRem: Int, threshold: Double): DataFrame = {
    val assigned = ivfAssign(corpus, idCol, vecCol, centroidMod, centroidRem)
      .filter(col("n") > 0)
      .cache()
    try {
      val a = assigned.select(col("list_id"), col("id").as("id_a"),
        col("v").as("va"), col("n").as("na"))
      val b = assigned.select(col("list_id"), col("id").as("id_b"),
        col("v").as("vb"), col("n").as("nb"))
      // shuffle-hash, not sort-merge: both sides shuffle on list_id
      // anyway, and the hash build skips the per-partition sort of the
      // (wide) vector payload rows
      val out = a.join(b.hint("shuffle_hash"), "list_id")
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos_sim") >= threshold)
        .groupBy(col("id_b"))
        .agg(min(col("id_a")).as("keep_id"), max(col("cos_sim")).as("max_cos"))
        .select(col("id_b").as("doc_id"), col("keep_id"), col("max_cos"))
        .cache()
      try out.count()
      catch { case e: Throwable => out.unpersist(); throw e }
      out
    } finally assigned.unpersist()
  }

  /** K-means-refined coarse quantizer for IVF: seed centroids from the
    * deterministic id-mod rule ([[ivfAssign]]'s pinned family), then
    * run `iters` Lloyd rounds — assign every vector to its nearest
    * centroid by cosine, re-emit each list's per-dimension mean as the
    * new centroid. Returns a (cent_id, cent_v, cent_n) table for
    * [[ivfTopKWith]].
    *
    * Scale shape per round (r17): a map-side codegen'd argmax against
    * the collected centroid table (no exchange — see
    * [[graft.plans.CentroidSet]]) and ONE aggregate-sized
    * groupBy(list_id) carrying dim exact-decimal sums, map-side
    * combined. The per-round driver collect is the C ≈ √n-row
    * quantizer itself (tens of MB at 10⁹ vectors) — the same table
    * the old shape built into a broadcast relation each round, and it
    * doubles as the materialization the old count() performed. Each
    * round's centroid table is cached so the iterative lineage stays
    * one round deep (same discipline as connected components). Lists
    * that lose all members simply drop out (k shrinks), which is the
    * standard Lloyd behavior on empty clusters — and so do lists whose
    * members average to the exact zero vector, whose NaN cosine would
    * otherwise silently capture every vector and probe.
    *
    * The RETURNED table is still cached (it feeds a broadcast probe,
    * usually several times) — `unpersist()` it when the index is no
    * longer needed. Intermediate caches are released even when a round
    * fails. */
  def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, centroidRem: Int, iters: Int): DataFrame = {
    require(iters >= 0, s"kmeans iters must be >= 0, got $iters")
    val c = prepVectors(corpus, idCol, vecCol).cache()
    // seed cached + materialized so the RETURNED table never leans on
    // `c` (unpersisted below) — also covers iters == 0
    var cents = c.filter(col("id") % centroidMod === centroidRem)
      .select(col("id").as("cent_id"), col("v").as("cent_v"), col("n").as("cent_n"))
      .filter(col("cent_n") > 0) // an all-zero seed vector would NaN-capture
      .cache()
    try {
      // the collect doubles as the materialization the old per-round
      // count() provided AND hands each round its map-side argmax
      // table (r17): a Lloyd round is now ONE exchange — the
      // aggregate-sized groupBy(list_id) below — where it used to be
      // three (the corpus-sized argmax groupBy carrying full vectors,
      // the posexplode'd (list, pos) mean, and the per-list re-collect)
      var (set, idType) = collectCentroids(cents)
      (1 to iters).foreach { _ =>
        // an empty quantizer stays empty through every round (the old
        // crossJoin against no centroids produced no assignments)
        if (!set.isEmpty) {
          // per-dimension mean via exact decimal sum: a double SUM's
          // value depends on partition merge order, so a plain avg()
          // would make centroids (and every downstream assignment)
          // differ run-to-run on a cluster and never hash-match the
          // single-threaded oracle. decimal(38,18) holds any realistic
          // component magnitude exactly through corpus-sized sums; the
          // final cast+divide is one deterministic IEEE op on both
          // engines. Oracle mirror:
          // CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
          // The vector width is static (the embedding contract every
          // caller and both oracle mirrors already hard-code), so the
          // means are dim parallel aggregates over v[i] instead of a
          // posexplode — same per-dim sum/count, no n×dim row blow-up.
          val dim = set.dim.get
          val aggs = (0 until dim).flatMap(i => Seq(
            sum(graft.core.Exact.dec(col("v").getItem(i), 38, 18)).as(s"__s$i"),
            count(col("v").getItem(i)).as(s"__c$i")))
          val newCents = assignToCollected(c, set, idType)
            .groupBy(col("list_id"))
            .agg(aggs.head, aggs.tail: _*)
            .select(col("list_id").as("cent_id"),
              array((0 until dim).map(i =>
                col(s"__s$i").cast("double") / col(s"__c$i")): _*).as("cent_v"))
            .withColumn("cent_n", sqrt(norm2(col("cent_v"))))
            // a list whose members average to the zero vector must drop
            // out like an empty list: a zero-norm centroid's 0/0 cosine
            // is NaN, which sorts above every real double and would
            // silently capture ALL vectors (and all probes) next round
            .filter(col("cent_n") > 0)
            .cache()
          // materialize + collect for the next round; a failed round
          // must release ITS OWN cache entry, not just the previous one
          val collected =
            try collectCentroids(newCents)
            catch { case e: Throwable => newCents.unpersist(); throw e }
          cents.unpersist()
          cents = newCents
          set = collected._1
          idType = collected._2
        }
      }
      cents
    } catch {
      case e: Throwable =>
        cents.unpersist()
        throw e
    } finally c.unpersist()
  }

  /** [[ivfTopK]] with an explicit (cent_id, cent_v, cent_n) coarse
    * quantizer — e.g. the [[kmeansCentroids]] output. Identical probe
    * machinery: queries rank the broadcast centroids, probe their
    * `nProbe` nearest lists, and run exact cosine + rank against only
    * the vectors assigned to those lists. */
  def ivfTopKWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: DataFrame, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignToCentroids(prepVectors(corpus, idCol, vecCol), centroids)
      .select(col("id").as("corpus_id"), col("v").as("cv"),
        col("n").as("cn"), col("list_id"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(norm2(col("qv"))))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cent_cos",
        dot(col("qv"), col("cent_v")) / (col("qn") * col("cent_n")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("list_id"))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    probes.join(assigned, "list_id")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }

  /** ANN via an IVF (inverted-file) index: queries probe their `nProbe`
    * nearest centroid lists and run exact cosine + rank only against the
    * vectors assigned to those lists — a corpus-fraction of ~nProbe/C per
    * query instead of the full corpus. Recall < 1 by construction (a true
    * neighbor may live in an unprobed list). */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroidMod: Int, centroidRem: Int, nProbe: Int): DataFrame = {
    val cents = corpus.select(col(idCol).as("cent_id"),
        col(vecCol).cast("array<double>").as("cent_v"))
      .filter(col("cent_id") % centroidMod === centroidRem)
      .withColumn("cent_n", sqrt(norm2(col("cent_v"))))
    ivfTopKWith(corpus, queries, idCol, vecCol, k, cents, nProbe)
  }

  /** ANN via hyperplane LSH: candidates share a bucket key; exact cosine
    * + per-query rank on the candidate set. Recall < 1 by construction;
    * probe multiple buckets (rotations) for higher recall. */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bkt = (d: DataFrame, id: String, v: String) =>
      rebalance(d.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v)))
        .withColumn("bucket", hyperplaneBucket(col(v), planes, dim))
    val c = bkt(corpus, "corpus_id", "cv").withColumn("cn", sqrt(norm2(col("cv"))))
    val q = bkt(queries, "query_id", "qv").withColumn("qn", sqrt(norm2(col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    q.join(c, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }
}
