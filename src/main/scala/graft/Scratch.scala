package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round: builds
  * VARIANTS of one operator in a single session and times them
  * INTERLEAVED (A,B,A,B,…), so host-level contention swings hit every
  * variant equally and the relative ordering is trustworthy even on a
  * noisy box. Not referenced by any pipeline or spec.
  */
object Scratch {
  import graft.core.Exact.{dec, sumd}
  import graft.core.Tables

  def a10Old(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  def a10New(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("__n"), sum(dec(col("l_extendedprice"))).as("__s"))
    base.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old  " -> (() => a10Old(spark, dir)),
      "new  " -> (() => a10New(spark, dir)))
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
