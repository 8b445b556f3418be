package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.AuditSink
import graft.load.TableLoader
import graft.pipeline.Controller
import graft.schema.DdlRunner
import graft.sources.{CatalogOps, ScriptScan}
import graft.validate.ColumnValidator.AggSpec

/** The Hive migration path end-to-end (SURVEY §3.3): source tables in a
  * "hive" database → DDL extraction (SHOW CREATE TABLE, exactly what
  * the reference's Dataproc job does) → per-table DDL files → re-run
  * into the target database → bulk data load → column validation
  * passes. The reference's five process boundaries collapse into one
  * driver run.
  */
class HiveRoundTripSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "hive-rt")

  test("extract -> files -> recreate -> load -> validate round trip") {
    // source warehouse: two "hive" tables materialized from testdata
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_src")
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_tgt")
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.mode(SaveMode.Overwrite).saveAsTable(s"hive_src.$t")
    }

    // 1. extract DDLs (S7) and write one .sql object per table (K5)
    val ddls = CatalogOps.extractDdls(spark, "hive_src")
    assert(ddls.size == 2)
    val outDir = Files.createTempDirectory("hive_ddls").toString
    CatalogOps.writeDdlFiles(ddls, outDir)

    // 2. scan the files back (S2/S3) and retarget to hive_tgt
    val scripts = ScriptScan.readScripts(spark, outDir).map { case (n, c) =>
      n -> c.replace("hive_src", "hive_tgt")
    }
    assert(scripts.size == 2)

    // 3. recreate via the retry machine
    val results = DdlRunner.run(spark,
      scripts.map { case (n, c) => n -> c.stripSuffix(";\n").stripSuffix(";") })
    assert(results.forall(_.state == DdlRunner.Done), results.mkString("\n"))
    assert(spark.catalog.tableExists("hive_tgt.region"))
    assert(spark.table("hive_tgt.nation").schema ==
      spark.table("hive_src.nation").schema)

    // 4. bulk load + 5. validate, through the controller's data route
    val audit = new AuditSink(spark, "dmt_logs_hive")
    val cfg = Controller.GraftConfig(
      kind = "data", source = "hive", uniqueId = "hive-rt",
      loads = Seq(
        TableLoader.LoadSpec("hive_tgt.region_data", "/root/testdata/sf0.001/region.parquet"),
        TableLoader.LoadSpec("hive_tgt.nation_data", "/root/testdata/sf0.001/nation.parquet")),
      validations = Seq(
        Controller.ValidationSpec("column", "hive_src.region", "hive_tgt.region_data",
          aggSpecs = Seq(AggSpec("count", "r_regionkey"), AggSpec("sum", "r_regionkey"))),
        Controller.ValidationSpec("schema", "hive_src.nation", "hive_tgt.nation_data"),
        Controller.ValidationSpec("row", "hive_src.nation", "hive_tgt.nation_data",
          primaryKeys = Seq("n_nationkey"), compareCols = Seq("n_name"))))
    val report = Controller.run(spark, cfg, audit)
    assert(report.forall(_.status == "Success"), report.toString)
    assert(audit.read("dmt_dvt_aggregated_results")
      .filter(col("unique_id") === "hive-rt").count() == 3)
  }
}
