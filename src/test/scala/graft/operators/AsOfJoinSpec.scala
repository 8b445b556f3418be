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

  test("carries multiple right columns and preserves left payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, "keep")).toDF("k", "t", "payload")
    val right = Seq((1L, 3L, "a", 30), (1L, 7L, "b", 70)).toDF("k", "rt", "rv", "rn")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv", "rn")).head()
    assert(row.getAs[String]("payload") == "keep")
    assert(row.getAs[String]("rv") == "b" && row.getAs[Int]("rn") == 70)
  }
}
