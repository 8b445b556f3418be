package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.E2ePipeline

/** Measured scale point for the MIGRATION e2e (round 14): the full
  * GraftApp run (ddl drop + 8-table load + 24 DVT validations +
  * report) timed at the bench scale and at a deterministic
  * `SPARK_GRAFT_SCALE_FACTOR`× blow-up of the same tables, with the
  * observed growth exponent appended to SCALING.md. The query corpus
  * has had deep points since round 8 (`graft.Scaling`); the e2e — the
  * thing a real migration user actually runs, whose 100-TB cost is
  * dominated by the DVT row-hash validation — had only a single-scale
  * wall time until now.
  *
  * Blow-up construction (deterministic, no RNG): replica k ≥ 1 shifts
  * each table's PRIMARY key by k·stride — row content otherwise
  * unchanged, so per-table validation work (count/sum/row-hash) grows
  * exactly ×factor with no cross-replica join fan-out (the pk stays
  * unique; a naive row copy would square the row-validation join).
  * region/nation stay as-is: real dims don't grow with the fact
  * volume, and their fixed cost is part of the honest measurement.
  *
  * Run: `sbt "runMain graft.E2eScale [sfDir] [outDir]"`;
  * SPARK_GRAFT_SCALE_FACTOR (default 10), SPARK_GRAFT_SCALE_ITERS
  * (default 3, median).
  */
object E2eScale {

  private val Stride = 100000000L

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val m = if (s.size % 2 == 1) s(s.size / 2)
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    math.rint(m * 1000) / 1000
  }

  private val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey"),
    "events" -> Seq("event_id"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_e2e_scale"
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "3").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("e2e-scale-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = s"$out/sf_x$factor"
    // SPARK_GRAFT_SCALE_REUSE=1 skips the blow-up write when it already
    // exists — the build shuffles ~factor× the corpus through THIS JVM
    // and the residual heap/GC drag inflates the measurement points
    // that follow (measured at 100×: the base e2e read 37 s in the
    // build JVM vs ~7.5 s in a fresh one). Build once, measure in a
    // fresh JVM.
    val reuse = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") &&
      Files.exists(Paths.get(s"$bigDir/lineitem.parquet"))
    if (!reuse) E2ePipeline.TableKeys.foreach { case (t, _, _) =>
      val base = Tables(spark, sfDir, t)
      val blown = KeyCols.get(t) match {
        case None => base
        case Some(ks) =>
          (0 until factor).map { k =>
            ks.foldLeft(base)((df, c) =>
              df.withColumn(c, col(c) + lit(k.toLong * Stride)))
          }.reduce(_ unionByName _)
      }
      blown.write.mode("overwrite").parquet(s"$bigDir/$t.parquet")
    }

    def deleteRecursively(root: java.nio.file.Path): Unit =
      try {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(root)
        val entries = try walk.iterator().asScala.toSeq finally walk.close()
        entries.reverse.foreach(p =>
          try Files.deleteIfExists(p) catch { case _: Exception => () })
      } catch { case _: Exception => () }

    def point(dir: String): (Double, Double, Double) = {
      val samples = (1 to iters).map { _ =>
        val root = Files.createTempDirectory("e2e-scale-run")
        try {
          val r = E2ePipeline.run(spark, dir, root.toString)
          require(r.allSuccess, s"e2e failed at $dir")
          (r.totalSec, r.ddlSec, r.dataSec)
        } finally deleteRecursively(root)
      }
      (median(samples.map(_._1)), median(samples.map(_._2)),
        median(samples.map(_._3)))
    }

    point(sfDir) // JIT/codegen/catalog warm-up, untimed
    val (b, bDdl, bData) = point(sfDir)
    val (g, gDdl, gData) = point(bigDir)
    def exp(big: Double, small: Double): Double =
      math.rint(math.log(big / small) / math.log(factor.toDouble) * 100) / 100
    def r2(x: Double) = math.rint(x * 100) / 100

    val section =
      f"""
         |## ${factor}× scale point — migration e2e
         |
         |The full GraftApp migration (ddl drop + 8-table load + 24 DVT
         |validations + report) driven by E2ePipeline at the bench scale
         |and at a deterministic ${factor}× pk-shifted blow-up of the
         |same tables (replicas disjoint in key space — validation work
         |grows exactly ×$factor, no cross-replica join fan-out; fixed
         |25/5-row dims stay). Median of $iters per point, local[$cpus]:
         |
         || phase | base (s) | ${factor}× (s) | ratio | exponent |
         ||---|---|---|---|---|
         || total | $b%.2f | $g%.2f | ${r2(g / b)}× | ${exp(g, b)} |
         || ddl drop (fixed work) | $bDdl%.2f | $gDdl%.2f | ${r2(gDdl / bDdl)}× | — |
         || data + DVT (the scaling phase) | $bData%.2f | $gData%.2f | ${r2(gData / bData)}× | ${exp(gData, bData)} |
         |
         |Regime attribution: the ddl drop translates and creates the
         |SAME two scripts at any data scale — pure fixed cost, its row
         |exists to show the total's exponent is dragged DOWN by it, not
         |to claim sublinearity. The data+DVT phase is the real-user
         |cost at 100 TB: per table one load write, one count+sum
         |aggregate pair, and the row-hash validation (a full-width
         |hash + pk-keyed full-outer compare) — every stage combinable
         |or keyed, nothing partition-global, so the expected exponent
         |is ~1 (linear in volume) with the sub-1 measurement explained
         |by fixed per-phase overhead (25-phase orchestration, audit
         |writes, report aggregation) amortizing across ×$factor data.
         |An exponent meaningfully ABOVE 1 here would name a
         |validation-shape bug (e.g. a row-compare degenerating to a
         |nested loop) — that is what this point guards.
         |
         |Reproduce: `sbt "runMain graft.E2eScale /root/testdata/sf0.1"`.
         |""".stripMargin
    val p = Paths.get("SCALING.md")
    Files.writeString(p, Files.readString(p) + section)
    println(section)
    spark.stop()
  }
}
