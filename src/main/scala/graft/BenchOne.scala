package graft

/** Ad-hoc single-query timer: runMain graft.BenchOne <sfDir> <q1> [q2 ...]
  * Runs each query twice in a warm session, prints cold/warm seconds. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.core.GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect() // warm codegen
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val t1 = System.nanoTime(); fn(spark, dir).count()
      val t2 = System.nanoTime()
      println(f"BENCHONE $name%-24s cold ${(t1 - t0) / 1e9}%6.2f warm ${(t2 - t1) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
