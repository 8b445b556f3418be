package graft

/** Ad-hoc single-query timer: runMain graft.BenchOne <sfDir> <q1> [q2 ...]
  * Runs each query twice in a warm session, prints cold/warm seconds.
  *
  * Caches are cleared between the two runs: operator-internal `.cache()`
  * calls are matched by canonicalized-plan equality across SEPARATE
  * invocations of the same query function, so an uncleaned "warm" run
  * would silently reuse the cold run's stage caches and report a
  * fraction of the real steady-state cost (measured 1.9 s vs the true
  * 4.5 s on d4). "warm" here means JIT/codegen-warm, cache-cold — the
  * same contract as Bench's timed iterations. */
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
      val t1 = System.nanoTime() // before the clear — unpersist of the
      spark.catalog.clearCache() // cold run's caches is not cold cost
      val t2 = System.nanoTime(); run(fn(spark, dir))
      val t3 = System.nanoTime()
      println(f"BENCHONE $name%-24s cold ${(t1 - t0) / 1e9}%6.2f warm ${(t3 - t2) / 1e9}%6.2f")
      spark.catalog.clearCache() // don't leak caches into the next query's cold run
    }
    spark.stop()
  }
}
