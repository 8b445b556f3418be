package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.load.TableLoader
import graft.operators.Salt
import graft.translate.StatementSplitter

class ConfigAndScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "cfg-test")

  val configJson =
    """{
      |  "batchDistribution": 3,
      |  "unique_id": "run-42",
      |  "type": "ddl",
      |  "source": "Teradata",
      |  "extract_ddl": false,
      |  "translationErrorFilterRules": [
      |    {"field": "Category", "matchType": "equals", "value": "NoTargetSupportForFeature"}
      |  ],
      |  "migrationTask": {
      |    "type": "Translation_Teradata2BQ",
      |    "translationConfigDetails": {
      |      "sourceDialect": {"teradataDialect": {"mode": "BTEQ"}},
      |      "gcsSourcePath": "gs://b/input/ddl/teradata",
      |      "gcsTargetPath": "gs://b/output/ddl/teradata",
      |      "nameMappingList": {"name_map": [
      |        {"source": {"type": "SCHEMA", "database": "p", "schema": "tpch"},
      |         "target": {"database": "p", "schema": "tpch_tgt"}},
      |        {"source": {"type": "RELATION", "database": "p", "schema": "tpch", "relation": "li"},
      |         "target": {"database": "p", "schema": "tpch_tgt", "relation": "lineitem"}}
      |      ]}
      |    }
      |  },
      |  "validation_config": {
      |    "validation_type": "column",
      |    "validation_params_file_path": "gs://c/validation/params.csv",
      |    "validation_mode": "gke"
      |  }
      |}""".stripMargin

  test("ConfigJson parses the reference document shape") {
    val p = ConfigJson.parse(configJson)
    assert(p.kind == "ddl" && p.source == "teradata" && p.uniqueId == "run-42")
    assert(p.batchDistribution == 3 && !p.extractDdl)
    assert(p.mode == StatementSplitter.Bteq)
    assert(p.sourcePath.endsWith("input/ddl/teradata"))
    assert(p.errorFilterRules.head.value == "NoTargetSupportForFeature")
    assert(p.validationType == "column" && p.validationMode == "gke")
    // SCHEMA entry renames the db; RELATION entry renames the table
    val t = graft.translate.DdlTranslator
      .translate("CREATE TABLE tpch.li (x INTEGER)", p.nameMapping).toOption.get
    assert(t.qualifiedName == "tpch_tgt.lineitem")
    val t2 = graft.translate.DdlTranslator
      .translate("CREATE TABLE tpch.other (x INTEGER)", p.nameMapping).toOption.get
    assert(t2.qualifiedName == "tpch_tgt.other")
  }

  test("ConfigJson rejects bad type and missing fields") {
    assertThrows[IllegalArgumentException](ConfigJson.parse("""{"type":"bogus","source":"x"}"""))
    assertThrows[IllegalArgumentException](ConfigJson.parse("""{"source":"x"}"""))
  }

  test("bucketed loads make bucket-key joins shuffle-free") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    Seq(
      TableLoader.LoadSpec("bkt.orders_b", "/root/testdata/sf0.001/orders.parquet",
        bucketBy = Some((4, Seq("o_custkey")))),
      TableLoader.LoadSpec("bkt.cust_b", "/root/testdata/sf0.001/customer.parquet",
        bucketBy = Some((4, Seq("c_custkey"))))
    ).foreach(s => assert(TableLoader.load(spark, s).status == "PASS"))
    val joined = spark.table("bkt.orders_b")
      .join(spark.table("bkt.cust_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("salted join equals plain join; salted agg equals plain agg") {
    import spark.implicits._
    // skewed left: one hot key
    val left = ((1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("b", 2L))).toDF("k", "v")
    val right = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = Salt.saltedJoin(left, right, "k", 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum("v")).head().getLong(0) ==
      plain.select(sum("v")).head().getLong(0))

    val agg = Salt.saltedCountSum(left, "k", "v", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg("hot") == (500L, (1 to 500).map(_.toLong).sum))
    assert(agg("a") == (1L, 1L))
  }
}
