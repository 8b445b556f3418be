package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "asof-test")

  test("latest right at-or-before each left ts, per key; unmatched stays null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 4L, "l4"),
      (2L, 15L, "l15")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 99L, "r99")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "rv").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(out == Set(
      (1L, 10L, Some("r5")),   // latest before 10 is 5
      (1L, 20L, Some("r20")),  // equality matches
      (1L, 4L, None),          // nothing at or before 4
      (2L, 15L, None)))        // 99 is in the future
  }

  test("duplicate left timestamps each get the same match") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x"), (1L, 10L, "y")).toDF("k", "t", "lv")
    val right = Seq((1L, 9L, "r")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("lv", "rv").as[(String, String)].collect().toSet
    assert(out == Set(("x", "r"), ("y", "r")))
  }

  test("RangeJoin: exact-delta boundary pairs included, beyond excluded") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val l = Seq((1L, ts(10000), "L")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, ts(10000 - 1800), "at_delta"),   // exactly delta away -> in
      (1L, ts(10000 + 1800), "at_delta2"),  // exactly delta ahead -> in
      (1L, ts(10000 - 1801), "beyond"),     // 1s past -> out
      (2L, ts(10000), "wrong_key")).toDF("k", "rt", "rv")
    val out = RangeJoin.banded(l, r, Seq("k"), "t", "rt", 1800L)
      .select("rv").as[String].collect().toSet
    assert(out == Set("at_delta", "at_delta2"))
  }

  test("carries multiple right columns and preserves left payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, "keep")).toDF("k", "t", "payload")
    val right = Seq((1L, 3L, "a", 30), (1L, 7L, "b", 70)).toDF("k", "rt", "rv", "rn")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv", "rn")).head()
    assert(row.getAs[String]("payload") == "keep")
    assert(row.getAs[String]("rv") == "b" && row.getAs[Int]("rn") == 70)
  }
}
