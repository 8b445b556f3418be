package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native hash must be bit-identical to the builtin md5/conv chain it
  * replaces (which is what the DuckDB oracles mirror). */
class HexHash60Spec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "hexhash-test")

  test("matches conv(substring(md5(c),1,15),16,10) on varied inputs") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc def", "0:the quick brown fox",
      "üñïçôdé ÷ ≠", "\t\n", "x" * 1000) ++ (0 until 200).map(i => s"$i:gram $i")
    val df = inputs.toDF("s").select(
      HexHash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    assert(df.filter(col("native") < 0).count() == 0)
  }

  test("null in, null out; interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
    val rows = df.select(HexHash60(col("s")).as("h")).collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("hex_hash60_pair: [hi, lo] halves match the builtin hex chains") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc def", "üñïçôdé", "x" * 500) ++
      (0 until 100).map(i => s"gram $i")
    val df = inputs.toDF("s").select(
      HexHash60Pair(col("s")).as("p"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("hi"),
      conv(substring(md5(col("s")), 17, 15), 16, 10).cast("long").as("lo"))
    assert(df.filter(element_at(col("p"), 1) =!= col("hi") ||
      element_at(col("p"), 2) =!= col("lo")).count() == 0)
    // both halves inside the 60-bit ring
    assert(df.filter(element_at(col("p"), 1) < 0 ||
      element_at(col("p"), 2) < 0).count() == 0)
  }

  test("sql function hex_hash60 via extensions") {
    val ext = new GraftExtensions()
    // function registry injection is covered by session construction in
    // GraftSession when extensions are configured; here assert the
    // builder wiring at least produces the expression
    import spark.implicits._
    val h = Seq("abc").toDF("s").select(HexHash60(col("s"))).head.getLong(0)
    val expected = Seq("abc").toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")).head.getLong(0)
    assert(h == expected)
  }
}
