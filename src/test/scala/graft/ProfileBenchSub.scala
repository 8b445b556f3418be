package graft

import org.apache.spark.sql.SparkSession

/** Bench-identical timing for a subset of queries (test scope). */
object ProfileBenchSub {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d2_minhash_lsh", "d3_simhash_values", "d3_simhash_pairs", "d4_ngram_jaccard")
    val warmDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, warmDir).count()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      spark.catalog.clearCache()
      println(f"[bench] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    spark.stop()
  }
}
