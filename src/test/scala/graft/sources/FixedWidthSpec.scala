package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-width parsing: offsets, pad trimming, typed casts, short and
  * malformed lines, file read path. */
class FixedWidthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "fw-test")
  import spark.implicits._

  private val fields = Seq(
    FixedWidth.Field("id", 1, 6, LongType),
    FixedWidth.Field("name", 7, 8),
    FixedWidth.Field("qty", 15, 4, IntegerType))

  test("offsets, zero/blank padding, typed casts") {
    val lines = Seq("000042alice   0007", "000001bob     0123").toDF("line")
    val got = FixedWidth.parse(lines, "line", fields)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((42L, "alice", 7), (1L, "bob", 123)))
  }

  test("short lines: missing extracts become '' / null, never a crash") {
    val lines = Seq("000042alice", "", "junk").toDF("line")
    val got = FixedWidth.parse(lines, "line", fields)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.isNullAt(2))).toSeq
    assert(got == Seq((Some(42L), "alice", true), (None, "", true), (None, "", true)))
  }

  test("trimPad = false keeps raw padding; duplicate names refused") {
    val lines = Seq("ab  ").toDF("line")
    val raw = FixedWidth.parse(lines, "line",
      Seq(FixedWidth.Field("x", 1, 4, trimPad = false))).collect().head.getString(0)
    assert(raw == "ab  ")
    intercept[IllegalArgumentException](FixedWidth.parse(lines, "line",
      Seq(FixedWidth.Field("x", 1, 2), FixedWidth.Field("x", 3, 2))))
    intercept[IllegalArgumentException](FixedWidth.Field("y", 0, 2))
  }

  test("read: line-parallel text scan to typed rows") {
    val dir = java.nio.file.Files.createTempDirectory("fw")
    java.nio.file.Files.writeString(dir.resolve("extract.txt"),
      "000042alice   0007\n000001bob     0123\n")
    val got = FixedWidth.read(spark, dir.toString, fields)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, "bob", 123), (42L, "alice", 7)))
  }
}
