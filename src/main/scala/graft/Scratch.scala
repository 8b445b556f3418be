package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round. */
object Scratch {
  import graft.operators.{MinHashLSH, TextOps}

  /** signaturesFrom variant: hash per OCCURRENCE (one md5 + KM derive
    * inline), no vocab distinct / repartition / join — zero extra
    * exchanges before the signature groupBy. */
  def sigsDirect(g: DataFrame, k: Int): DataFrame = {
    val mod = 1L << 60
    val ex = g.select(col("id"), explode(col("grams")).as("gram"))
      .withColumn("hp", TextOps.hexHash60Pair(col("gram")))
      .select(col("id") +: (0 until k).map(i =>
        ((element_at(col("hp"), 1) +
          lit(i.toLong) * shiftright(element_at(col("hp"), 2), 5)) % mod).as(s"h$i")): _*)
    ex.groupBy(col("id"))
      .agg(min(col("h0")).as("h0"), (1 until k).map(i => min(col(s"h$i")).as(s"h$i")): _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def docs() = graft.queries.DedupQueries.corpusDocsPublic(spark, dir)
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def banded(sigs: DataFrame) = MinHashLSH.bandKeys(sigs, 8, 4)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old  " -> (() => {
        val g = TextOps.shingleTable(docs(), "doc_id", "text", 3)
        banded(MinHashLSH.signaturesFrom(g, 32))
      }),
      "new  " -> (() => {
        val g = TextOps.shingleTable(docs(), "doc_id", "text", 3)
        banded(sigsDirect(g, 32))
      }))
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
