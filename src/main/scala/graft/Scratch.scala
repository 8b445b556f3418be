package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round. */
object Scratch {
  import graft.operators.{MinHashLSH, TextOps, PairExpansion}

  def d4(docs: DataFrame, hashed: Boolean): DataFrame = {
    val threshold = 0.5
    val g0 = TextOps.shingleTable(docs, "doc_id", "text", 3).cache()
    val groups = MinHashLSH.contentGroups(g0).cache()
    val g = g0.join(groups.filter(col("id") === col("rep")).select(col("id")),
        Seq("id"), "left_semi")
      .withColumn("sz", size(col("grams")))
      .cache()
    val ex0 = g.select(col("id"), col("sz"), explode(col("grams")).as("gram"))
    val ex = if (hashed) ex0.select(col("id"), col("sz"),
      TextOps.hexHash60(col("gram")).as("gram")) else ex0
    val dfreq = ex.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfreq, "gram")
      .groupBy(col("id"))
      .agg(first(col("sz")).as("sz"),
        array_sort(collect_list(struct(col("df"), col("gram")))).as("dfg"))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))
      .select(col("id"), col("sz"),
        explode(expr("transform(slice(dfg, 1, plen), x -> x.gram)")).as("gram"))
      .cache()
    val a = prefix.select(col("gram"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("gram"), col("id").as("id_b"), col("sz").as("sz_b"))
    val cand = a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .filter(lit(threshold) * greatest(col("sz_a"), col("sz_b")) <=
        least(col("sz_a"), col("sz_b")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val ga = g.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val gb = g.select(col("id").as("id_b"), col("grams").as("grams_b"))
    val repPairs = cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    PairExpansion.expand(groups, repPairs, "jaccard", lit(1.0))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def docs() = graft.queries.DedupQueries.corpusDocsPublic(spark, dir)
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old  " -> (() => d4(docs(), hashed = false).orderBy(col("id_a"), col("id_b"))),
      "new  " -> (() => d4(docs(), hashed = true).orderBy(col("id_a"), col("id_b"))))
    variants.foreach { case (_, f) => run(f()); spark.catalog.clearCache() }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to 4).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime(); run(f())
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        acc(name) = sec :: acc.getOrElse(name, Nil)
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, xs) =>
      println(f"SCRATCH $n min ${xs.min}%6.2f med ${xs.sorted.apply(xs.size / 2)}%6.2f all ${xs.reverse.map(x => f"$x%5.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
