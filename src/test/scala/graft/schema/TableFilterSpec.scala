package graft.schema

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TableFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("2", "test")
  import spark.implicits._

  val scripts = Seq(
    ("f1.sql", "CREATE TABLE ds1.t1 (x INT); CREATE OR REPLACE VIEW ds1.v1 AS SELECT 1;"),
    ("f2.sql", "CREATE TABLE IF NOT EXISTS `ds2.t2` (y STRING)"),
    ("f3.sql", "SELECT * FROM ds1.t1 -- no create here")
  ).toDF("file_name", "content")

  test("extracts db.table from CREATE statements, one row per table") {
    val m = TableFilter.fileTableMapping(scripts).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("f1.sql", "ds1.t1"), ("f1.sql", "ds1.v1"), ("f2.sql", "ds2.t2")))
  }

  test("intersect mapping with created set is a semi-join") {
    val mapping = Seq("ds1.t1", "ds9.missing").toDF("table_name")
    val created = TableFilter.fileTableMapping(scripts).select("table_name")
    val got = TableFilter.intersectWithCreated(mapping, created)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("ds1.t1"))
  }
}
