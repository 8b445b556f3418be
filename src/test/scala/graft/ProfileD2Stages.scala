package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for d2_minhash_lsh (the round-6 d4
  * discipline, re-applied per the round-10 verdict): time each stage of
  * the MinHashLSH pipeline on FRESH caches, bench-identical session
  * (local[32], 32 shuffle partitions, sf0.1, one warm-up at sf0.001),
  * so a drift in the end-to-end number can be pinned to the stage that
  * grew instead of guessed at. Run:
  * `sbt "Test/runMain graft.ProfileD2Stages [sfDir] [iters]"`. */
object ProfileD2Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.operators.MinHashLSH
    val K = 32; val Bands = 8
    def docs(dir: String) = graft.queries.DedupQueries.corpusDocsPublic(spark, dir)

    // stages mirror repPipeline exactly; each timing materializes the
    // stage ON TOP of cached predecessors, so a stage's number is its
    // own marginal cost (caches rebuilt per iteration, fresh every time)
    def stages(dir: String): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ListBuffer[(String, Double)]()
      def timed[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        out += name -> (System.nanoTime() - t0) / 1e9; r
      }
      val g = MinHashLSH.shingleTable(docs(dir), "doc_id", "text").cache()
      timed("shingleTable")(g.count())
      val groups = MinHashLSH.contentGroups(g).cache()
      timed("contentGroups")(groups.count())
      val repsG = g.join(groups.filter(col("id") === col("rep")).select(col("id")),
        Seq("id"), "left_semi").cache()
      timed("repFilter")(repsG.count())
      val banded = MinHashLSH.bandKeys(
        MinHashLSH.signaturesFrom(repsG, K), Bands, K / Bands).cache()
      timed("sign+band")(banded.count())
      val cands = MinHashLSH.candidatePairs(banded).cache()
      timed("candidates")(cands.count())
      val ga = repsG.select(col("id").as("id_a"), col("grams").as("grams_a"))
      val gb = repsG.select(col("id").as("id_b"), col("grams").as("grams_b"))
      timed("verify")(cands.join(ga, "id_a").join(gb, "id_b")
        .withColumn("jaccard",
          graft.operators.TextOps.jaccard(col("grams_a"), col("grams_b")))
        .filter(col("jaccard") >= 0.7).count())
      spark.catalog.clearCache()
      out.toSeq
    }
    stages("/root/testdata/sf0.001") // warm-up: compile the codegen classes
    spark.catalog.clearCache()
    val all = (1 to iters).map(_ => stages(sfDir))
    val names = all.head.map(_._1)
    println(f"[d2-stages] ${"stage"}%-14s ${"median"}%8s ${"min"}%8s")
    names.zipWithIndex.foreach { case (n, i) =>
      val xs = all.map(_(i)._2).sorted
      val med = if (xs.size % 2 == 1) xs(xs.size / 2)
        else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
      println(f"[d2-stages] $n%-14s $med%8.2f ${xs.min}%8.2f")
    }
    val totals = all.map(_.map(_._2).sum).sorted
    println(f"[d2-stages] TOTAL          ${totals(totals.size / 2)}%8.2f ${totals.min}%8.2f")
    spark.stop()
  }
}
