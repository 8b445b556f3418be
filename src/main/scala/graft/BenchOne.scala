package graft

/** Ad-hoc single-query timer: runMain graft.BenchOne <sfDir> <q1> [q2 ...]
  * Runs each query twice in a warm session, prints cold/warm seconds. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect() // warm codegen
    // noop sink, like Bench: count() lets Catalyst prune the projections
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); run(fn(spark, dir))
      val t1 = System.nanoTime(); run(fn(spark, dir))
      val t2 = System.nanoTime()
      println(f"BENCHONE $name%-24s cold ${(t1 - t0) / 1e9}%6.2f warm ${(t2 - t1) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
