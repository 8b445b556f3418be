package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway INTERLEAVED A/B measurement harness for the optimization
  * rounds (r16 discipline: both variants in ONE binary, timed
  * alternately A,B,A,B × N so a host-contention swing hits both
  * equally; medians AND mins compared). The `old*` functions are
  * verbatim copies of the pre-r17 implementations — the executable
  * baseline; the `new` side calls the library.
  *
  *   runMain graft.Scratch <sfDir> <which> [rounds]
  *     which ∈ {n5, d7, ivm9, d4}
  */
object Scratch {
  import graft.operators.{IvmJoin, IvmTopK, Similarity}
  import org.apache.spark.sql.expressions.Window

  // ---------- pre-r17 kmeans/IVF shapes (verbatim) ----------------------

  private def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  private def prepVectors(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    rebalance(corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .withColumn("n", sqrt(Similarity.dot(col("v"), col("v"))))

  private def oldAssign(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(cents))
      .withColumn("cent_cos",
        Similarity.dot(col("v"), col("cent_v")) / (col("n") * col("cent_n")))
      .groupBy(col("id"), col("v"), col("n"))
      .agg(max(struct(col("cent_cos"), (-col("cent_id")).as("neg_cent"))).as("best"))
      .select(col("id"), col("v"), col("n"), (-col("best.neg_cent")).as("list_id"))

  private def oldKmeans(corpus: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, centroidRem: Int, iters: Int): DataFrame = {
    val c = prepVectors(corpus, idCol, vecCol).cache()
    var cents = c.filter(col("id") % centroidMod === centroidRem)
      .select(col("id").as("cent_id"), col("v").as("cent_v"), col("n").as("cent_n"))
      .filter(col("cent_n") > 0).cache()
    try {
      cents.count()
      (1 to iters).foreach { _ =>
        val newCents = oldAssign(c, cents)
          .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("list_id"), col("pos"))
          .agg((sum(graft.core.Exact.dec(col("x"), 38, 18)).cast("double") /
            count(col("x"))).as("m"))
          .groupBy(col("list_id"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("cent_v"))
          .select(col("list_id").as("cent_id"), col("cent_v"),
            sqrt(Similarity.dot(col("cent_v"), col("cent_v"))).as("cent_n"))
          .filter(col("cent_n") > 0)
          .cache()
        try newCents.count()
        catch { case e: Throwable => newCents.unpersist(); throw e }
        cents.unpersist()
        cents = newCents
      }
      cents
    } catch { case e: Throwable => cents.unpersist(); throw e }
    finally c.unpersist()
  }

  private def oldIvfTopKWith(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val assigned = oldAssign(prepVectors(corpus, idCol, vecCol), centroids)
      .select(col("id").as("corpus_id"), col("v").as("cv"),
        col("n").as("cn"), col("list_id"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cent_cos",
        Similarity.dot(col("qv"), col("cent_v")) / (col("qn") * col("cent_n")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("list_id"))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    probes.join(assigned, "list_id")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }

  private def oldN5(s: SparkSession, dir: String): DataFrame = {
    val e = graft.core.Tables(s, dir, "embeddings")
    val cents = oldKmeans(e, "vec_id", "embedding", 23, 7, 2)
    oldIvfTopKWith(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
      5, cents, 4).orderBy(col("query_id"), col("rank"))
  }

  private def oldD7(s: SparkSession, dir: String): DataFrame = {
    val e = graft.core.Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.unionByName(
      e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val c = prepVectors(corpus, "vec_id", "embedding")
    val cents = c.filter(col("id") % 23 === 7)
      .select(col("id").as("cent_id"), col("v").as("cent_v"), col("n").as("cent_n"))
    val assigned = oldAssign(c, cents).filter(col("n") > 0).cache()
    try {
      val a = assigned.select(col("list_id"), col("id").as("id_a"),
        col("v").as("va"), col("n").as("na"))
      val b = assigned.select(col("list_id"), col("id").as("id_b"),
        col("v").as("vb"), col("n").as("nb"))
      val out = a.join(b.hint("shuffle_hash"), "list_id")
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim",
          Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos_sim") >= 0.99)
        .groupBy(col("id_b"))
        .agg(min(col("id_a")).as("keep_id"), max(col("cos_sim")).as("max_cos"))
        .select(col("id_b").as("doc_id"), col("keep_id"), col("max_cos"))
        .cache()
      try out.count()
      catch { case e2: Throwable => out.unpersist(); throw e2 }
      out
    } finally assigned.unpersist()
  }

  // ---------- pre-r17 IvmTopK refresh (verbatim), + ivm9 chain ----------

  private def oldRefresh(
      topk0: DataFrame, counts1: DataFrame, deltaAgg: DataFrame,
      groupCols: Seq[String], keyCol: String, k: Int): (DataFrame, DataFrame) = {
    val pairCols = groupCols :+ keyCol
    val broken = deltaAgg.filter(col("__tk_dw") < 0)
      .select(groupCols.map(col): _*).distinct()
    val candPairs = topk0.select(pairCols.map(col): _*)
      .unionByName(deltaAgg.select(pairCols.map(col): _*))
      .distinct()
      .withColumn("__tk_n", count(lit(1)).over(Window.partitionBy()))
      .filter(when(col("__tk_n") > graft.operators.ScalableRank.MaxBroadcastCells,
        raise_error(lit("too large"))).otherwise(lit(true)))
      .drop("__tk_n")
    val candidates = counts1
      .join(broadcast(broken.withColumn("__tk_broken", lit(1))),
        groupCols, "left_outer")
      .join(broadcast(candPairs.withColumn("__tk_cand", lit(1))),
        pairCols, "left_outer")
      .filter(col("__tk_broken") === 1 || col("__tk_cand") === 1)
      .drop("__tk_broken", "__tk_cand")
    (IvmTopK.viewOf(candidates, groupCols, keyCol, k), counts1)
  }

  private def oldFoldWeighted(
      stored: Option[(DataFrame, DataFrame)], netDelta: DataFrame,
      groupCols: Seq[String], wCol: String, keyCol: String, k: Int,
      valueCol: Option[String]): (DataFrame, DataFrame) = {
    val pairCols = groupCols :+ keyCol
    val w = when(col(wCol).isNull || col(wCol) === 0,
      raise_error(lit("zero/NULL multiplicity"))).otherwise(col(wCol))
    val unit = valueCol.fold(lit(1L))(c =>
      when(col(c).isNull || col(c) <= 0,
        raise_error(lit("bad weight"))).otherwise(col(c)))
    val deltaAgg = netDelta.groupBy(pairCols.map(col): _*)
      .agg(sum(w * unit).as("__tk_dw"))
    val (topk0, counts0) = stored.get
    val mergedMeasure =
      coalesce(col("cnt"), lit(0L)) + coalesce(col("__tk_dw"), lit(0L))
    val merged = counts0.join(deltaAgg, pairCols, "full_outer")
      .select(pairCols.map(col) :+
        when(mergedMeasure < 0, raise_error(lit("never absorbed")))
          .otherwise(mergedMeasure).as("cnt"): _*)
    val counts1 = merged.filter(col("cnt") > 0)
    oldRefresh(topk0, counts1, deltaAgg, groupCols, keyCol, k)
  }

  /** The ivm9 chain verbatim from GovernanceQueries, parameterized on
    * the fold (old refresh vs library refresh). */
  private def ivm9(s: SparkSession, dir: String, old: Boolean): DataFrame = {
    def T(x: SparkSession, d: String, t: String) = graft.core.Tables(x, d, t)
    val sup = T(s, dir, "supplier").select(col("s_suppkey").as("sk"),
      col("s_nationkey").as("nk"))
    val cus = T(s, dir, "customer").select(col("c_custkey").as("ck"),
      col("c_nationkey").as("nk"))
    val ord = T(s, dir, "orders").select(col("o_orderkey").as("ok"),
      col("o_custkey").as("ck"), col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val smoved = pmod(col("sk"), lit(31)) === 0
    val cdropped = pmod(col("ck"), lit(89)) === 0
    val omoved = pmod(col("ok"), lit(101)) === 0
    val dS = sup.filter(smoved)
      .select(col("sk"), col("nk"), lit(-1L).as("__w"))
      .unionByName(sup.filter(smoved)
        .select(col("sk"), pmod(col("nk") + 1, lit(25)).as("nk"),
          lit(1L).as("__w")))
    val dC = cus.filter(cdropped)
      .select(col("ck"), col("nk"), lit(-1L).as("__w"))
    val dO = ord.filter(omoved)
      .select(col("ok"), col("ck"), col("prio"), col("cents"),
        lit(-1L).as("__w"))
      .unionByName(ord.filter(omoved)
        .select(col("ok"), col("ck"),
          concat(lit("moved-"), col("prio")).as("prio"), col("cents"),
          lit(1L).as("__w")))
    def asSet(df: DataFrame) = df.withColumn("__mult", lit(1L))
    val d1 = IvmJoin.deltaJoinWeighted(dS, dC, asSet(sup), asSet(cus),
      Seq("nk"), "__w", "__mult", Seq("ck", "nk"))
    val dlo = d1.groupBy(col("ck"), col("nk"))
      .agg(sum(col("__w")).as("__w")).filter(col("__w") =!= 0)
      .localCheckpoint(false)
    val lo = sup.join(cus, Seq("nk"))
      .groupBy(col("ck"), col("nk")).agg(count(lit(1)).as("__mult"))
    val d2 = IvmJoin.deltaJoinWeighted(dlo, dO, lo, asSet(ord),
      Seq("ck"), "__w", "__mult", Seq("prio", "nk", "cents"))
    val net = d2.groupBy(col("prio"), col("nk"), col("cents"))
      .agg(sum(col("__w")).as("__w")).filter(col("__w") =!= 0)
      .localCheckpoint(false)
    val joined = sup.join(cus, Seq("nk")).join(ord, Seq("ck"))
    val counts0 = IvmTopK.countsOf(joined, Seq("prio"), "nk",
      Some("cents")).localCheckpoint(false)
    val topk0 = IvmTopK.viewOf(counts0, Seq("prio"), "nk", 3)
      .localCheckpoint(false)
    val (topk1, _) =
      if (old) oldFoldWeighted(Some((topk0, counts0)), net,
        Seq("prio"), "__w", "nk", 3, Some("cents"))
      else IvmTopK.foldWeighted(Some((topk0, counts0)), net,
        Seq("prio"), "__w", "nk", 3, Some("cents"))
    topk1.select(col("prio"), col("rnk"), col("nk"), col("cnt"))
      .orderBy(col("prio"), col("rnk"))
  }

  // ---------------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "n5"
    val rounds = if (args.length > 2) args(2).toInt else 4
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => DataFrame)] = which match {
      case "n5" => Seq(
        "old  " -> (() => oldN5(spark, dir)),
        "new  " -> (() => SparkEntry.queries("n5_ann_ivf_kmeans")(spark, dir)))
      case "d7" => Seq(
        "old  " -> (() => oldD7(spark, dir).orderBy(col("doc_id"))),
        "new  " -> (() => SparkEntry.queries("d7_semantic_dedup")(spark, dir)))
      case "ivm9" => Seq(
        "old  " -> (() => ivm9(spark, dir, old = true)),
        "new  " -> (() => ivm9(spark, dir, old = false)))
      case "n3" => Seq(
        "new  " -> (() => SparkEntry.queries("n3_ann_ivf")(spark, dir)))
    }
    variants.foreach { case (_, f) => run(f()); spark.catalog.clearCache() }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to rounds).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime(); run(f())
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        acc(name) = sec :: acc.getOrElse(name, Nil)
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, xs) =>
      println(f"SCRATCH $which $n min ${xs.min}%6.2f med ${xs.sorted.apply(xs.size / 2)}%6.2f all ${xs.reverse.map(x => f"$x%5.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
