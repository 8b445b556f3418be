package graft.translate

import org.scalatest.funsuite.AnyFunSuite

import graft.translate.DdlTranslator.{ColumnDef, TableDef}
import graft.translate.StatementSplitter.{Bteq, BteqControl, Sql}

/** Dialect translation semantics over the constructs the reference
  * corpus exercises (Teradata input/ddl fixtures, Redshift/Oracle
  * samples) — re-typed shapes, not copied files. */
class TranslateSpec extends AnyFunSuite {

  // ---- statement splitter (P6) ---------------------------------------

  test("splitter drops trailing fragment and blanks") {
    assert(StatementSplitter.split("SELECT 1;\nSELECT 2;\n") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(StatementSplitter.split("SELECT 1") == Nil) // no terminating ;
  }

  test("splitter drops fully-commented statements in SQL mode") {
    val script =
      "-- comment only\n-- more comment;\nDELETE FROM t WHERE k = 1;\n"
    // first fragment is all comments -> dropped; DELETE survives with the
    // leading comment block attached (reference keeps the raw statement)
    val out = StatementSplitter.split(script, Sql)
    assert(out.size == 1)
    assert(out.head.contains("DELETE FROM t"))
  }

  test("splitter keeps commented statements containing uncommented lines") {
    val stmt = "-- header\nINSERT INTO t VALUES (1)"
    assert(StatementSplitter.hasUncommented(stmt))
    assert(StatementSplitter.split(stmt + ";", Sql) == Seq(stmt))
    assert(!StatementSplitter.hasUncommented("-- a\n-- b"))
  }

  test("BTEQ mode: strips leading BEGIN, skips control statements") {
    val script = "BEGIN INSERT INTO t VALUES (1);END;EXCEPTION WHEN ERROR THEN x;"
    val out = StatementSplitter.split(script, Bteq)
    assert(out == Seq("INSERT INTO t VALUES (1)"))
    // dml_validation policy keeps control statements (its guard can
    // never fire — documented reference discrepancy)
    val kept = StatementSplitter.split("END;", Bteq, BteqControl.SkipCommentedOnly)
    assert(kept == Seq("END"))
  }

  // ---- type mapping (§1.2 matrix) ------------------------------------

  test("type matrix maps like the ppl_data_types stress fixture") {
    val cases = Map(
      "DECIMAL(20,0)" -> "DECIMAL(20,0)",
      "DECIMAL(13,13)" -> "DECIMAL(13,13)",
      "DECIMAL(38,12)" -> "DECIMAL(38,12)",
      "BIGINT" -> "BIGINT",
      "BYTEINT" -> "TINYINT",
      "SMALLINT" -> "SMALLINT",
      "INTEGER" -> "INT",
      "FLOAT" -> "DOUBLE",
      "CHAR(2048)" -> "STRING",
      "VARCHAR(16000)" -> "STRING",
      "DATE" -> "DATE",
      "TIMESTAMP(0)" -> "TIMESTAMP_NTZ",
      "TIMESTAMP(3)" -> "TIMESTAMP_NTZ",
      "TIMESTAMP(6) WITH TIME ZONE" -> "TIMESTAMP",
      "JSON(5000)" -> "STRING",
      "NUMBER" -> "DECIMAL(38,18)",
      "NUMBER(38,4)" -> "DECIMAL(38,4)",
      "VARBYTE(1024)" -> "BINARY",
      "CHARACTER VARYING(25)" -> "STRING",
      "VARCHAR2(40)" -> "STRING",
      "DOUBLE PRECISION" -> "DOUBLE",
      "DATETIME" -> "TIMESTAMP_NTZ")
    cases.foreach { case (in, want) =>
      assert(TypeMapper.map(in) == want, s"for $in")
    }
    assert(TypeMapper.tryMap("GEOMETRY").isEmpty)
  }

  // ---- Teradata DDL --------------------------------------------------

  val teradataDdl =
    """CREATE SET TABLE shop.sales ,FALLBACK ,
      |     NO BEFORE JOURNAL,
      |     NO AFTER JOURNAL,
      |     CHECKSUM = DEFAULT,
      |     DEFAULT MERGEBLOCKRATIO,
      |     MAP = TD_MAP1
      |     (
      |      SALE_ID INTEGER NOT NULL,
      |      AMOUNT DECIMAL(15,2) NOT NULL,
      |      FLAG CHAR(1) CHARACTER SET LATIN CASESPECIFIC NOT NULL,
      |      NOTE VARCHAR(44) CHARACTER SET LATIN NOT CASESPECIFIC,
      |      SALE_DATE DATE FORMAT 'yyyy-mm-dd' NOT NULL,
      |      CREATED_AT TIMESTAMP(0) FORMAT 'yyyy-mm-ddbhh:mi:ss',
      |      TZ_AT TIMESTAMP(6) WITH TIME ZONE,
      |      PAYLOAD JSON(5000) CHARACTER SET UNICODE,
      |      BLOB_F VARBYTE(1024),
      |      RATIO DECIMAL(13,13) DEFAULT NULL )
      |PRIMARY INDEX ( SALE_ID )""".stripMargin

  test("Teradata DDL translates: options stripped, types mapped, PI kept") {
    val t = DdlTranslator.parse(teradataDdl).toOption.get
    assert(t.database.contains("shop") && t.table == "sales")
    assert(t.distributionColumns == Seq("SALE_ID"))
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("SALE_ID") == ColumnDef("SALE_ID", "INT", notNull = true))
    assert(byName("AMOUNT") == ColumnDef("AMOUNT", "DECIMAL(15,2)", notNull = true))
    assert(byName("FLAG") == ColumnDef("FLAG", "STRING", notNull = true))
    assert(byName("NOTE") == ColumnDef("NOTE", "STRING", notNull = false))
    assert(byName("SALE_DATE") == ColumnDef("SALE_DATE", "DATE", notNull = true))
    assert(byName("CREATED_AT").sparkType == "TIMESTAMP_NTZ")
    assert(byName("TZ_AT").sparkType == "TIMESTAMP")
    assert(byName("PAYLOAD").sparkType == "STRING")
    assert(byName("BLOB_F").sparkType == "BINARY")
    assert(byName("RATIO") == ColumnDef("RATIO", "DECIMAL(13,13)", notNull = false))
    val ddl = t.render()
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS shop.sales"))
    assert(ddl.contains("USING parquet"))
    assert(!ddl.toUpperCase.contains("FALLBACK"))
  }

  test("Teradata PARTITION BY RANGE_N / CASE_N maps to partition metadata") {
    val rangeDdl =
      """CREATE SET TABLE shop.daily_sales, FALLBACK (
        |  SALE_ID INTEGER NOT NULL,
        |  SALE_DATE DATE FORMAT 'YYYY-MM-DD' NOT NULL,
        |  AMOUNT DECIMAL(15,2))
        |PRIMARY INDEX ( SALE_ID )
        |PARTITION BY RANGE_N(SALE_DATE BETWEEN DATE '2020-01-01'
        |  AND DATE '2026-12-31' EACH INTERVAL '1' MONTH)""".stripMargin
    val t = DdlTranslator.parse(rangeDdl).toOption.get
    assert(t.partitionColumns == Seq("SALE_DATE"))
    val rendered = t.render()
    assert(rendered.contains("PARTITIONED BY (SALE_DATE)"), rendered)

    val caseDdl =
      """CREATE TABLE shop.tiers (
        |  CUST_ID INTEGER,
        |  BAL DECIMAL(10,2))
        |PARTITION BY CASE_N(BAL < 100, BAL < 1000, NO CASE)""".stripMargin
    val c = DdlTranslator.parse(caseDdl).toOption.get
    assert(c.partitionColumns == Seq("BAL"))

    val extractDdl =
      """CREATE TABLE shop.yearly (
        |  EVT_ID INTEGER,
        |  EVT_TS TIMESTAMP(0))
        |PARTITION BY RANGE_N(EXTRACT(YEAR FROM EVT_TS) BETWEEN 2020 AND 2030 EACH 1)""".stripMargin
    val e = DdlTranslator.parse(extractDdl).toOption.get
    assert(e.partitionColumns == Seq("EVT_TS"))
  }

  test("RANGE_N-partitioned render executes as Spark partitioned table") {
    val spark = graft.core.GraftSession.local("2", "rangen-exec")
    val ddl =
      """CREATE TABLE pt_exec (
        |  ID INTEGER,
        |  D DATE)
        |PARTITION BY RANGE_N(D BETWEEN DATE '2020-01-01' AND DATE '2026-12-31' EACH INTERVAL '1' MONTH)""".stripMargin
    val t = DdlTranslator.parse(ddl).toOption.get
    spark.sql("DROP TABLE IF EXISTS pt_exec")
    spark.sql(t.render())
    val cat = spark.sql("DESCRIBE TABLE pt_exec").collect().map(_.getString(0))
    assert(cat.contains("# Partition Information"), cat.mkString(","))
    spark.sql("DROP TABLE pt_exec")
  }

  test("Redshift DDL: ENCODE stripped, DISTSTYLE ignored, SORTKEY kept") {
    val ddl =
      """CREATE TABLE mig.supp (
        |    k integer NOT NULL ENCODE raw,
        |    nm character varying(25) NOT NULL ENCODE lzo
        |)
        |DISTSTYLE ALL
        |SORTKEY ( k )""".stripMargin
    val t = DdlTranslator.parse(ddl).toOption.get
    assert(t.columns == Seq(
      ColumnDef("k", "INT", notNull = true),
      ColumnDef("nm", "STRING", notNull = true)))
    assert(t.sortColumns == Seq("k"))
  }

  test("Oracle DDL: VARCHAR2 and bare NUMBER") {
    val ddl = "CREATE TABLE EDW.CTY( ID CHAR (2) NOT NULL ,NAME VARCHAR2 (40)  ,RID NUMBER  )"
    val t = DdlTranslator.parse(ddl).toOption.get
    assert(t.columns == Seq(
      ColumnDef("ID", "STRING", notNull = true),
      ColumnDef("NAME", "STRING", notNull = false),
      ColumnDef("RID", "DECIMAL(38,18)", notNull = false)))
  }

  test("name mapping renames db, table, and columns") {
    val nm = NameMapping(Seq(
      NameMapping.Entry("shop", Some("sales"), None, Some("tpch"), Some("sales_v2")),
      NameMapping.Entry("shop", Some("sales"), Some("SALE_ID"), targetColumn = Some("id"))))
    val t = DdlTranslator.translate(teradataDdl, nm).toOption.get
    assert(t.qualifiedName == "tpch.sales_v2")
    assert(t.columns.head.name == "id")
    assert(t.distributionColumns == Seq("id"))
  }

  // ---- engine + report ------------------------------------------------

  test("translateDdl: good files translate, bad files become error records") {
    val good = "CREATE TABLE a.b (x INTEGER);"
    val bad = "CREATE TABLE a.c (x GEOMETRY);"
    val r = TranslationEngine.translateDdl(Seq(("good.sql", good), ("bad.sql", bad)))
    assert(r.successFiles == Seq("good.sql"))
    assert(r.failedFiles == Seq("bad.sql"))
    assert(r.errors.head.category == "parse_error")
    assert(r.errors.head.message.contains("GEOMETRY"))
  }

  test("translateSql: SEL / TOP / LOCKING rewrites") {
    assert(TranslationEngine.translateSql("SEL * FROM t") == "SELECT * FROM t")
    assert(TranslationEngine.translateSql("SELECT TOP 5 a FROM t") ==
      "SELECT a FROM t LIMIT 5")
    assert(TranslationEngine.translateSql(
      "LOCKING ROW FOR ACCESS SELECT a FROM t") == "SELECT a FROM t")
  }
}
