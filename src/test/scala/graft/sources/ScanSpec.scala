package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ScanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "scan-test")

  test("ScriptScan: recursion, suffix, artifact and subtree exclusions") {
    val dir = Files.createTempDirectory("scripts").toString
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.createDirectories(Paths.get(s"$dir/skip_validation"))
    Files.writeString(Paths.get(s"$dir/a.sql"), "CREATE TABLE x.a (i INT);")
    Files.writeString(Paths.get(s"$dir/sub/b.sql"), "CREATE TABLE x.b (i INT);")
    Files.writeString(Paths.get(s"$dir/notes.txt"), "not sql")
    Files.writeString(Paths.get(s"$dir/batch_translation_report.csv"), "report")
    Files.writeString(Paths.get(s"$dir/skip_validation/c.sql"), "skipped")
    val files = ScriptScan.listScripts(spark, dir)
    assert(files.map(_.split('/').last).toSet == Set("a.sql", "b.sql"))
    val contents = ScriptScan.readScripts(spark, dir).toMap
    assert(contents("a.sql").contains("x.a"))
    assert(ScriptScan.listScripts(spark, "/no/such/dir") == Nil)
  }

  test("JdbcCatalog: dialect catalog queries and option plumbing") {
    assert(JdbcCatalog.catalogQuery("teradata", "tpch").contains("dbc.TablesV"))
    assert(JdbcCatalog.catalogQuery("redshift", "mig").contains("pg_tables"))
    assert(JdbcCatalog.catalogQuery("oracle", "edw").contains("all_tab_columns"))
    assertThrows[IllegalArgumentException](JdbcCatalog.catalogQuery("db2", "x"))
    val src = JdbcCatalog.JdbcSource("jdbc:postgresql://h/db", "u", "p", Some("org.x.Driver"))
    assert(src.options == Map("url" -> "jdbc:postgresql://h/db",
      "user" -> "u", "password" -> "p", "driver" -> "org.x.Driver"))
  }
}
