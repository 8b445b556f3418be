package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.DdlRunner
import graft.translate.{StatementSplitter, TranslationEngine}

/** Fidelity against the reference's samples corpus for the OTHER three
  * dialects (Teradata samples, Redshift, Oracle): DDL translates and
  * executes, the SQL corpus analyzes against the created tables, and
  * the DML corpus — including the comment-handling use cases — not
  * only dry-runs but actually EXECUTES (inserts/deletes land in the
  * created tables).
  */
class ReferenceSamplesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "refsamples-test")

  private def readAll(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Nil
    else Files.list(p).iterator().asScala.toSeq
      .filter(f => f.toString.endsWith(".sql") && Files.isRegularFile(f))
      .sortBy(_.toString)
      .map(f => f.getFileName.toString -> Files.readString(f))
  }

  private def runDdl(dir: String, db: String): Unit = {
    val files = readAll(dir)
    assume(files.nonEmpty, s"no fixtures under $dir")
    // sample DDL files have no trailing ';' — treat whole file as one stmt
    val stmts = files.map { case (n, c) =>
      val split = StatementSplitter.split(c)
      n -> (if (split.nonEmpty) split.head else c.trim)
    }
    val translated = stmts.map { case (n, stmt) =>
      val t = graft.translate.DdlTranslator.parse(stmt)
      assert(t.isRight, s"$n: ${t.left.toOption.map(_.message)}")
      n -> t.toOption.get.render()
    }
    DdlRunner.ensureDatabases(spark, Seq(db))
    val out = DdlRunner.run(spark, translated, parallelism = 4)
    assert(out.forall(_.state == DdlRunner.Done),
      out.filter(_.state != DdlRunner.Done).mkString("\n"))
  }

  test("Teradata samples DDL (EMPLOYEE1..6) creates DMT_DATASET tables") {
    runDdl("/root/reference/samples/ddl/teradata", "DMT_DATASET")
    assert(spark.catalog.tableExists("DMT_DATASET.EMPLOYEE1"))
    val t = spark.table("DMT_DATASET.EMPLOYEE1").schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    assert(t("salary") == "decimal(18,2)" && t("hire_date") == "date")
  }

  test("Redshift samples DDL + SQL corpus") {
    runDdl("/root/reference/samples/ddl/redshift", "mig_test")
    assert(spark.catalog.tableExists("mig_test.supplier"))
    // the redshift sql corpus references mig_test.test1 — create it to
    // match the DML corpus shape (name, id, age)
    spark.sql("CREATE TABLE IF NOT EXISTS mig_test.test1 " +
      "(t_name STRING, t_id INT, t_age STRING) USING parquet")
    readAll("/root/reference/samples/sql/redshift").foreach { case (n, c) =>
      val stmts = StatementSplitter.split(c) match {
        case Nil => Seq(c.trim); case s => s
      }
      stmts.foreach(s =>
        spark.sql(TranslationEngine.translateSql(s)).queryExecution.analyzed)
    }
  }

  test("Oracle samples DDL + SQL + DML execute end-to-end") {
    runDdl("/root/reference/samples/ddl/oracle", "EDW_ODB")
    assert(spark.catalog.tableExists("EDW_ODB.COUNTRIES"))
    // DML: the oracle sample inserts a row; execute for real
    readAll("/root/reference/samples/dml/oracle")
      .filterNot(_._1.contains("error")).foreach { case (n, c) =>
        val stmts = StatementSplitter.split(c) match {
          case Nil => Seq(c.trim); case s => s
        }
        stmts.foreach(s => spark.sql(TranslationEngine.translateSql(s)))
      }
    val rows = spark.table("EDW_ODB.COUNTRIES").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "JP")
    // SQL corpus analyzes + runs
    readAll("/root/reference/samples/sql/oracle").foreach { case (n, c) =>
      val stmts = StatementSplitter.split(c) match {
        case Nil => Seq(c.trim); case s => s
      }
      stmts.foreach(s => spark.sql(TranslationEngine.translateSql(s)).collect())
    }
    // the filtered query finds the inserted row
    assert(spark.sql("select * from EDW_ODB.COUNTRIES where COUNTRY_ID = 'JP'")
      .count() == 1)
  }

  test("Teradata DML use cases split + SEMANTIC dry-run like the reference") {
    // the reference BQ-dry-runs these (no execution) against the tables
    // the DDL phase created; the dry-run is semantic — Use_Case_2 is its
    // own negative fixture ("Error due to invalid_col not exist"), which
    // parses fine and must fail RESOLUTION. The DDL test above created
    // DMT_DATASET.EMPLOYEE1..6 in this shared session.
    val files = readAll("/root/reference/samples/dml/teradata")
    assume(files.nonEmpty)
    assume(spark.catalog.tableExists("DMT_DATASET.EMPLOYEE1"))
    val perFile = files.map { case (n, c) =>
      n -> StatementSplitter.split(c, StatementSplitter.Sql)
    }.toMap
    // use case 1: DELETE surrounded by fully-commented INSERT fragments
    // -> exactly one survivor containing the DELETE
    val uc1 = perFile.keys.find(_.contains("Use_Case_1")).map(perFile)
    uc1.foreach { stmts =>
      assert(stmts.count(_.toUpperCase.contains("DELETE FROM")) == 1)
    }
    val outcomes = perFile.toSeq.flatMap { case (n, stmts) =>
      stmts.map(s => n -> TranslationEngine.dryRun(spark, TranslationEngine.translateSql(s)))
    }
    assert(outcomes.nonEmpty)
    val (bad, good) = outcomes.partition(_._1.contains("Use_Case_2"))
    assert(good.forall(_._2.isEmpty), good.flatMap(_._2).mkString("\n"))
    assert(bad.nonEmpty && bad.forall(_._2.exists(_.contains("invalid_col"))),
      s"Use_Case_2 must fail the semantic dry-run on invalid_col: $bad")
  }

  test("every reference sample config parses through ConfigJson") {
    val files = Seq("hive", "oracle", "redshift", "teradata")
      .flatMap(d => readAllJson(s"/root/reference/samples/configs/$d"))
    assume(files.nonEmpty)
    assert(files.size >= 11, files.map(_._1).toString)
    files.foreach { case (name, raw) =>
      // the templates leave deployment choices as <...> placeholders; a
      // user substitutes them — do the same for the enum-valued ones
      val json = raw
        .replace("\"<ddl/sql>\"", "\"ddl\"")
        .replace("\"<BTEQ/SQL>\"", "\"BTEQ\"")
        .replace("\"<gke/cloudrun>\"", "\"gke\"")
      val p = graft.pipeline.ConfigJson.parse(json, "cfg-test")
      assert(Set("ddl", "sql", "dml", "data")(p.kind), s"$name: ${p.kind}")
      assert(p.source.nonEmpty, name)
      if (name.contains("ddl_sql_teradata")) {
        assert(p.mode == StatementSplitter.Bteq, name)
        assert(p.errorFilterRules.size == 7, name)
        assert(p.nameMapping.entries.nonEmpty, name)
      }
      if (name.contains("inc_data_load_hive")) assert(p.source == "hive_inc", name)
      if (name.contains("data_gke_column_hive")) {
        assert(p.transferParams("hive_db_name") == "hive_db1", name)
        assert(p.transferParams("hive_gcs_staging_path") == "hive_data/hive_db1.db", name)
        assert(p.transferParams("bq_dataset_id") == "bq_dataset1", name)
        assert(!p.dvtCheck, name) // dvt_check: "N"
      }
    }
  }

  private def readAllJson(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Nil
    else Files.list(p).iterator().asScala.toSeq
      .filter(f => f.toString.endsWith(".json") && Files.isRegularFile(f))
      .sortBy(_.toString)
      .map(f => f.getFileName.toString -> Files.readString(f))
  }

  test("Oracle dml_error fixture fails the semantic dry-run; dml_1 passes") {
    assume(spark.catalog.tableExists("EDW_ODB.COUNTRIES"))
    val files = readAll("/root/reference/samples/dml/oracle")
    assume(files.nonEmpty)
    val outcomes = files.flatMap { case (n, c) =>
      val stmts = StatementSplitter.split(c) match {
        case Nil => Seq(c.trim); case s => s
      }
      stmts.map(s => n -> TranslationEngine.dryRun(spark, TranslationEngine.translateSql(s)))
    }
    val (err, ok) = outcomes.partition(_._1.contains("error"))
    assert(ok.forall(_._2.isEmpty), ok.flatMap(_._2).mkString("\n"))
    // dml_error.sql: INSERT INTO COUNTRIES(country_id) VALUES(4, 'Americas')
    // — one target column, two values: an arity error only analysis sees
    assert(err.nonEmpty && err.forall(_._2.nonEmpty),
      s"dml_error.sql must fail the semantic dry-run: $err")
  }
}
