package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LIVE JDBC scans against embedded Derby (shipped in /opt/spark/jars —
  * the one JDBC engine available offline). The dialect catalog queries
  * (S8-S10) are executed VERBATIM against emulated catalog tables:
  * Derby resolves unquoted identifiers case-insensitively, so
  * `dbc.TablesV`, `pg_tables` and `all_tab_columns` bind to tables of
  * those names — which makes this an end-to-end test of the real
  * `spark.read.jdbc` path (driver loading, query-option pushdown,
  * schema inference, partitioned reads), not just option plumbing.
  */
class JdbcLiveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "jdbc-live-test")

  private lazy val dbPath =
    java.nio.file.Files.createTempDirectory("derby").resolve("cat").toString
  private lazy val url = s"jdbc:derby:$dbPath;create=true"
  private lazy val src = JdbcCatalog.JdbcSource(
    url, "", "", driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private lazy val setup: Unit = withConn { c =>
    val st = c.createStatement()
    st.execute("CREATE SCHEMA DBC")
    st.execute("CREATE TABLE DBC.TABLESV (DataBaseName VARCHAR(64), " +
      "TableName VARCHAR(64), RequestText VARCHAR(512), TableKind CHAR(1))")
    Seq(
      ("proddb", "orders", "CREATE TABLE orders (...)", "T"),
      ("proddb", "lineitem", "CREATE TABLE lineitem (...)", "O"),
      ("proddb", "v_orders", "CREATE VIEW v_orders AS ...", "V"),
      ("otherdb", "misc", "CREATE TABLE misc (...)", "T")
    ).foreach { case (d, t, r, k) =>
      st.execute(s"INSERT INTO DBC.TABLESV VALUES ('$d', '$t', '$r', '$k')")
    }
    st.execute("CREATE TABLE PG_TABLES (schemaname VARCHAR(64), tablename VARCHAR(64))")
    st.execute("INSERT INTO PG_TABLES VALUES ('public', 'customer'), ('public', 'orders'), ('pg_catalog', 'pg_class')")
    st.execute("CREATE TABLE ALL_TAB_COLUMNS (owner VARCHAR(64), table_name VARCHAR(64), " +
      "column_name VARCHAR(64), data_type VARCHAR(32), data_precision INT, data_scale INT, column_id INT)")
    st.execute("INSERT INTO ALL_TAB_COLUMNS VALUES " +
      "('EDW', 'COUNTRIES', 'COUNTRY_ID', 'CHAR', NULL, NULL, 1), " +
      "('EDW', 'COUNTRIES', 'REGION_ID', 'NUMBER', 38, 0, 2), " +
      "('HR', 'EMPLOYEES', 'EMP_NO', 'NUMBER', 10, 0, 1)")
    st.execute("CREATE TABLE EMP (ID INT NOT NULL, NAME VARCHAR(32))")
    (1 to 100).grouped(20).foreach { g =>
      st.execute("INSERT INTO EMP VALUES " +
        g.map(i => s"($i, 'name_$i')").mkString(", "))
    }
    st.close()
  }

  test("Teradata catalog query (dbc.TablesV) runs live and filters kind+db") {
    setup
    val rows = JdbcCatalog.readCatalog(spark, src, "teradata", "proddb").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet == Set("orders", "lineitem"))
  }

  test("Redshift catalog query (pg_tables) runs live") {
    setup
    val rows = JdbcCatalog.readCatalog(spark, src, "redshift", "public").collect()
    assert(rows.map(_.getString(1)).toSet == Set("customer", "orders"))
  }

  test("Oracle catalog query (all_tab_columns) runs live, schema uppercased") {
    setup
    val rows = JdbcCatalog.readCatalog(spark, src, "oracle", "edw").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(2)).toSet == Set("COUNTRY_ID", "REGION_ID"))
    // NUMBER(38,0) metadata comes through typed
    val reg = rows.find(_.getString(2) == "REGION_ID").get
    assert(reg.getInt(4) == 38 && reg.getInt(5) == 0)
  }

  test("range-partitioned bulk read: N concurrent partitions, full content") {
    setup
    val df = JdbcCatalog.readTable(spark, src, "EMP", "ID", 1, 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("ID")).head.getLong(0) == 5050L)
  }
}
