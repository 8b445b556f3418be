package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Upsert: source wins on match (including nulls), inserts appear,
  * unmatched target rows persist. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "upsert-test")

  test("update, insert, keep") {
    import spark.implicits._
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "qty")
    val source = Seq((2L, "B2", 200), (4L, "d", 40)).toDF("k", "name", "qty")
    val out = Upsert.upsert(target, source, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, "a", 10), (2L, "B2", 200), (3L, "c", 30), (4L, "d", 40)))
  }

  test("source null overwrites target value on match") {
    import spark.implicits._
    val target = Seq((1L, Some("a"))).toDF("k", "name")
    val source = Seq((1L, None: Option[String])).toDF("k", "name")
    val out = Upsert.upsert(target, source, Seq("k")).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("a target column literally named 'hit' does not collide with the match flag") {
    import spark.implicits._
    val target = Seq((1L, 5), (2L, 6)).toDF("k", "hit")
    val source = Seq((2L, 60), (3L, 70)).toDF("k", "hit")
    val out = Upsert.upsert(target, source, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((1L, 5), (2L, 60), (3L, 70)))
  }

  test("scd2History: no-op changes collapse, null-safe boundaries, intervals tile") {
    import spark.implicits._
    val log = Seq(
      (7L, 1, Some("A")), (7L, 2, Some("A")), // no-op collapses
      (7L, 3, Some("B")),
      (7L, 4, None), (7L, 5, None),           // change TO null is a boundary
      (7L, 6, Some("A")),
      (9L, 1, Some("X")))                     // second key independent
      .toDF("k", "seq", "status")
    val h = Upsert.scd2History(log, Seq("k"), Seq("status"), Seq("seq"))
      .select("k", "seq", "status", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getString(2)), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))
    assert(h.toSeq == Seq(
      (7L, 1, Some("A"), 1, Some(3), false),
      (7L, 3, Some("B"), 3, Some(4), false),
      (7L, 4, None, 4, Some(6), false),
      (7L, 6, Some("A"), 6, None, true),
      (9L, 1, Some("X"), 1, None, true)))
  }
}
