package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The regime probe for qt3 vs qt2: ONE group holding the whole table.
  *
  * The per-lang contrast points in SCALING.md show the window shape
  * still WINNING absolutely while every group fits a partition — the
  * bucket-locate shape's payoff is the regime where it doesn't. This
  * probe makes that regime measurable on the deterministic blow-up
  * corpus: all rows in a single group, so the window formulation must
  * sort the entire table in ONE partition (31 of 32 cores idle) while
  * bucket-locate keeps every stage keyed and parallel. Run:
  * `sbt "Test/runMain graft.ProfileQt3OneGroup [blowupDir] [iters]"`
  * (blowupDir from a prior `graft.Scaling` run, e.g. /tmp/graft_sf100x).
  */
object ProfileQt3OneGroup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100x")
    val iters = if (args.length > 1) args(1).toInt else 3
    // in-memory row multiplier: replicas shift v by k·2^-20 (order
    // between replicas preserved per value, all values distinct-ish)
    // so the single-group frame reaches the tens-of-millions regime
    // without writing another corpus
    val mult = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val ps = Seq(0.5, 0.9, 0.99)
    def base = spark.read.parquet(s"$dir/documents.parquet")
      .select(lit("all").as("g"),
        graft.functions.TextAnalysis
          .tokenCountWs(coalesce(col("text"), lit(""))).cast("double").as("v"))
      .withColumn("k", explode(sequence(lit(1), lit(mult))))
      .withColumn("v", col("v") + col("k").cast("double") / 1048576.0)
      .drop("k")
      .repartition(32)

    def windowShape() = {
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      base
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))).cast("long"))
        .withColumn("p", explode(array(ps.map(lit): _*)))
        .withColumn("idx", (col("n") - 1).cast("double") * col("p"))
        .withColumn("lo", floor(col("idx")) + 1)
        .withColumn("hi", least(col("lo") + 1, col("n")))
        .filter(col("rn") === col("lo") || col("rn") === col("hi"))
        .groupBy(col("g"), col("p"))
        .agg(max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
          max(when(col("rn") === col("hi"), col("v"))).as("vhi"),
          max(col("idx") - floor(col("idx")).cast("double")).as("frac"))
        .select(col("g"), col("p"),
          (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("value"))
    }
    def bucketShape() =
      graft.operators.ScalableQuantile.percentileCont(base, "g", "v", ps)

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(iters / 2)
    }

    val n = base.count()
    val tw = time(windowShape _)
    val tb = time(bucketShape _)
    // both shapes must agree bit-for-bit before the timing means anything
    val a = windowShape().collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val b = bucketShape().collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    require(a == b, s"shapes disagree: $a vs $b")
    println(f"one-group n=$n%d rows: window(single-partition sort)=$tw%.2f s, " +
      f"bucket-locate=$tb%.2f s, speedup=${tw / tb}%.2f x (median of $iters)")
    spark.stop()
  }
}
