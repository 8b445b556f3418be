package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.AuditSink

/** SURVEY §7.2 minimum end-to-end slice, event-driven: drop a ddl
  * config → translate Teradata DDL → create tables → audit/report; a
  * second drop is not reprocessed (checkpoint), and the created table
  * serves translated SQL. */
class GraftAppSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "app-test")

  test("config drop drives translate -> ddl -> report; checkpoint dedups") {
    val root = Files.createTempDirectory("e2e").toString
    val scripts = s"$root/input"
    val drops = s"$root/drops"
    Files.createDirectories(Paths.get(scripts))
    Files.createDirectories(Paths.get(s"$drops/ddl"))
    Files.writeString(Paths.get(s"$scripts/sales.sql"),
      """CREATE SET TABLE shop2.sales ,FALLBACK ,
        |     CHECKSUM = DEFAULT
        |     (
        |      SALE_ID INTEGER NOT NULL,
        |      AMOUNT DECIMAL(15,2),
        |      NOTE VARCHAR(44) CHARACTER SET LATIN NOT CASESPECIFIC)
        |PRIMARY INDEX ( SALE_ID );""".stripMargin)
    Files.writeString(Paths.get(s"$drops/ddl/run-e2e.json"),
      s"""{"type": "ddl", "source": "teradata", "unique_id": "run-e2e",
         | "migrationTask": {"translationConfigDetails": {
         |   "gcsSourcePath": "$scripts",
         |   "nameMappingList": {"name_map": [
         |     {"source": {"type": "SCHEMA", "schema": "shop2"},
         |      "target": {"schema": "shop2_tgt"}}]}}}}""".stripMargin)

    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val results = app.runOnce(drops)
    assert(results.size == 1)
    assert(results.head._2.forall(_.status == "Success"), results.toString)
    assert(spark.catalog.tableExists("shop2_tgt.sales"))
    val types = spark.table("shop2_tgt.sales").schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("AMOUNT") == "decimal(15,2)")
    assert(audit.read("dmt_report_table")
      .filter(col("unique_id") === "run-e2e").count() >= 2)

    // second drain: checkpoint remembers the processed drop
    assert(app.runOnce(drops).isEmpty)

    // the translated table serves dialect-translated SQL
    val n = spark.sql(graft.translate.TranslationEngine
      .translateSql("SEL * FROM shop2_tgt.sales")).count()
    assert(n == 0) // created empty, queryable
  }

  test("data config transfer params drive per-table loads (hive data-load DAG shape)") {
    val root = Files.createTempDirectory("e2e-data").toString
    Files.createDirectories(Paths.get(s"$root/drops/data"))
    // staging layout like hive_data/hive_db1.db/<table>/
    val staging = s"$root/staging/hive_db1.db"
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$staging/$t")
    }
    spark.sql("CREATE DATABASE IF NOT EXISTS bq_ds1")
    Files.writeString(Paths.get(s"$root/drops/data/run-dx.json"),
      s"""{"type": "data", "source": "hive", "unique_id": "run-dx",
         | "dvt_check": "N", "batchDistribution": 2,
         | "transfer_config": {"dataSourceId": "HIVE", "displayName": "dm_test",
         |  "params": {"database_type": "Hive", "hive_db_name": "hive_db1",
         |   "hive_gcs_staging_path": "$staging", "bq_dataset_id": "bq_ds1"}}}""".stripMargin)
    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val results = app.runOnce(s"$root/drops").head._2
    assert(results.exists(r => r.phase == "load" && r.status == "Success"), results.toString)
    assert(spark.table("bq_ds1.region").count() ==
      spark.read.parquet("/root/testdata/sf0.001/region.parquet").count())
    assert(spark.table("bq_ds1.nation").count() > 0)
    // dvt_check N suppressed validations
    assert(!results.exists(_.phase.startsWith("dvt_")), results.toString)
  }

  test("validation-params sheet drives the DVT stage end-to-end") {
    import org.apache.spark.sql.SaveMode
    val root = Files.createTempDirectory("e2e-vp").toString
    Files.createDirectories(Paths.get(s"$root/drops/data"))
    spark.sql("CREATE DATABASE IF NOT EXISTS vp_src")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode(SaveMode.Overwrite).saveAsTable("vp_src.nation_s")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode(SaveMode.Overwrite).saveAsTable("vp_src.nation_t")
    // positional sheet exactly like the reference sample
    // (common_utils/tests/mock/validation_params.csv): banner row, name
    // row, then flag cells at the CANONICAL 25 positions
    // (storage_utils.py validation_csv_header_fields — count at 11,
    // sum at 12, threshold at 19, hash at 20, primary-keys at 7)
    Files.writeString(Paths.get(s"$root/params.csv"),
      """Translation / Migration Type,Validation Type,Source and Target,,,,Common Flag to all Validations,Common Flag to Row and Column Validation,,Schema Validation Flags,,Column Validation Flags,,,,,,,,,Row Validation Flags,,,,
        |,,source-table,target-table,source-query-file,target-query-file,filter-status,primary-keys,filters,exclusion-columns,allow-list,count,sum,min,max,avg,grouped-columns,wildcard-include-string-len,cast-to-bigint,threshold,hash,concat,comparison-fields,use-random-row,random-row-batch-size
        |data,column,vp_src.nation_s,vp_src.nation_t,,,,,,,,n_nationkey,n_nationkey,,,,,,,,,,,,
        |data,row,vp_src.nation_s,vp_src.nation_t,,,,n_nationkey,,,,,,,,,,,,,*,,,,
        |ddl,column,vp_src.ignored,vp_src.ignored,,,,,,,,x,,,,,,,,,,,,,
        |""".stripMargin)
    Files.writeString(Paths.get(s"$root/drops/data/run-vp.json"),
      s"""{"type": "data", "source": "hive", "unique_id": "run-vp",
         | "validation_config": {
         |   "validation_type": "column",
         |   "validation_params_file_path": "$root/params.csv"}}""".stripMargin)
    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val results = app.runOnce(s"$root/drops").head._2
    // loads empty; the two 'data' sheet rows ran (the 'ddl' row filtered
    // out); identical tables -> both validations pass
    val dvt = results.filter(_.phase.startsWith("dvt_"))
    assert(dvt.size == 2, results.toString)
    assert(dvt.forall(_.status == "Success"), results.toString)
    assert(audit.read("dmt_dvt_aggregated_results")
      .filter(col("unique_id") === "run-vp").count() == 2)
  }

  test("hive_inc config drains staged arrivals into existing tables, idempotently") {
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val root = Files.createTempDirectory("e2e-inc").toString
    Files.createDirectories(Paths.get(s"$root/drops/data"))
    // initial migration created the table
    spark.sql("CREATE DATABASE IF NOT EXISTS inc_db1")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).saveAsTable("inc_db1.t")
    // two arrivals staged under <bucket>/inc_db1.db/t/
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$root/inc_staging/inc_db1.db/t")
    Files.writeString(Paths.get(s"$root/drops/data/run-inc1.json"),
      s"""{"type": "data", "source": "hive_inc", "unique_id": "run-inc1",
         | "dvt_check": "N",
         | "transfer_config": {"dataSourceId": "HIVE",
         |  "params": {"gcs_inc_staging_bucket": "$root/inc_staging"}}}""".stripMargin)
    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val r1 = app.runOnce(s"$root/drops").head._2
    assert(r1.exists(r => r.phase == "incremental" && r.status == "Success"), r1.toString)
    assert(spark.table("inc_db1.t").count() == 3)
    // a second, identical drop (fresh checkpoint via new drop file):
    // audit dedup keeps the same files from re-appending
    Files.writeString(Paths.get(s"$root/drops/data/run-inc2.json"),
      s"""{"type": "data", "source": "hive_inc", "unique_id": "run-inc2",
         | "dvt_check": "N",
         | "transfer_config": {"dataSourceId": "HIVE",
         |  "params": {"gcs_inc_staging_bucket": "$root/inc_staging"}}}""".stripMargin)
    app.runOnce(s"$root/drops")
    assert(spark.table("inc_db1.t").count() == 3)
  }

  test("sql config: custom-query sheet rows run after the dry-run") {
    val root = Files.createTempDirectory("e2e-cq").toString
    Files.createDirectories(Paths.get(s"$root/drops/sql"))
    Files.createDirectories(Paths.get(s"$root/scripts"))
    spark.sql("CREATE DATABASE IF NOT EXISTS cq_src")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable("cq_src.region")
    Files.writeString(Paths.get(s"$root/scripts/q1.sql"),
      "SEL COUNT(*) AS cnt, SUM(r_regionkey) AS s FROM cq_src.region") // dialect SEL
    Files.writeString(Paths.get(s"$root/scripts/q2.sql"),
      "SELECT COUNT(*) AS cnt, SUM(r_regionkey) AS s FROM cq_src.region")
    Files.writeString(Paths.get(s"$root/params.csv"),
      """banner,,,,,,
        |,,source-table,target-table,source-query-file,target-query-file,threshold
        |sql,custom query column,,,q1.sql,q2.sql,
        |""".stripMargin)
    // move the sheet next to the query files so they resolve
    Files.move(Paths.get(s"$root/params.csv"), Paths.get(s"$root/scripts/params.csv"))
    Files.writeString(Paths.get(s"$root/drops/sql/run-cq.json"),
      s"""{"type": "sql", "source": "teradata", "unique_id": "run-cq",
         | "migrationTask": {"translationConfigDetails": {
         |   "gcsSourcePath": "$root/scripts"}},
         | "validation_config": {
         |   "validation_params_file_path": "$root/scripts/params.csv"}}""".stripMargin)
    // keep only .sql scripts in the dry-run scan: the sheet is .csv so
    // ScriptScan's .sql filter naturally excludes it
    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val results = app.runOnce(s"$root/drops").head._2
    assert(results.exists(r => r.phase == "dry_run" && r.status == "Success"), results.toString)
    val custom = results.filter(_.phase.startsWith("dvt_custom"))
    assert(custom.size == 1 && custom.head.status == "Success", results.toString)
  }

  test("hive ddl config routes through CATALOG EXTRACTION (controller_dag P11)") {
    import org.apache.spark.sql.SaveMode
    val root = Files.createTempDirectory("e2e-hive").toString
    Files.createDirectories(Paths.get(s"$root/drops/ddl"))
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_xsrc")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .write.mode(SaveMode.Overwrite).saveAsTable("hive_xsrc.region")
    // no gcsSourcePath at all: the scripts MUST come from the catalog,
    // db = first name-map source schema (extract_hive_ddls_manual.py:77)
    Files.writeString(Paths.get(s"$root/drops/ddl/run-hx.json"),
      """{"type": "ddl", "source": "hive", "unique_id": "run-hx",
        | "extract_ddl": "yes",
        | "migrationTask": {"translationConfigDetails": {
        |   "nameMappingList": {"name_map": [
        |     {"source": {"type": "SCHEMA", "schema": "hive_xsrc"},
        |      "target": {"schema": "hive_xtgt"}}]}}}}""".stripMargin)
    val audit = new AuditSink(spark, "dmt_logs_app")
    val app = new GraftApp(spark, audit, s"$root/ck")
    val results = app.runOnce(s"$root/drops")
    assert(results.size == 1)
    assert(results.head._2.forall(_.status == "Success"), results.toString)
    assert(spark.catalog.tableExists("hive_xtgt.region"))
    assert(spark.table("hive_xtgt.region").schema ==
      spark.table("hive_xsrc.region").schema)
  }

  test("E2ePipeline drives ddl + load + full DVT over all 8 tables with phase rows") {
    val root = Files.createTempDirectory("e2e-full").toString
    // simulate the cross-JVM hazard: a previous run's managed-table
    // directories survive in the default warehouse while the fresh
    // in-memory catalog has forgotten the databases — without explicit
    // cleanup the first CREATE TABLE dies with LOCATION_ALREADY_EXISTS
    for (db <- Seq("e2e_src", "e2e_tgt", "e2e_ddl_tgt", "dmt_logs_e2e")) {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      Files.createDirectories(Paths.get(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"),
        s"$db.db", "region"))
    }
    val r = E2ePipeline.run(spark, "/root/testdata/sf0.001", root)
    // hermetic: every e2e database is anchored under the per-run root,
    // not the shared warehouse
    for (db <- Seq("e2e_src", "e2e_tgt", "e2e_ddl_tgt", "dmt_logs_e2e"))
      assert(spark.catalog.getDatabase(db).locationUri.contains(root),
        spark.catalog.getDatabase(db).locationUri)
    assert(r.allSuccess, r.phases.filterNot(_.status == "Success").toString)
    // ddl drop: translate + schema phases
    assert(r.phases.exists(_.phase == "translation"))
    assert(r.phases.exists(_.phase == "schema"))
    assert(spark.catalog.tableExists("e2e_ddl_tgt.audit_run"))
    // data drop: one load phase over the 8 tables, then per-table
    // schema/column/row DVT phases
    val load = r.phases.find(_.phase == "load").get
    assert(load.details("total") == E2ePipeline.TableKeys.size.toString, load.toString)
    assert(load.details("failed") == "0", load.toString)
    for ((t, _, _) <- E2ePipeline.TableKeys; kind <- Seq("schema", "column", "row"))
      assert(r.phases.exists(_.phase == s"dvt_$kind:e2e_tgt.$t"),
        s"missing dvt_$kind:e2e_tgt.$t in ${r.phases.map(_.phase)}")
    assert(r.validations == 3L * E2ePipeline.TableKeys.size)
    assert(spark.table("e2e_tgt.lineitem").count() ==
      spark.table("e2e_src.lineitem").count())
    // report rows exist for both drops
    assert(r.reportRows >= r.phases.size, s"${r.reportRows} vs ${r.phases.size}")
    assert(r.totalSec > 0 && r.ddlSec > 0 && r.dataSec > 0)
  }
}
