package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Erasure-list propagation: scrub = set-subtraction by key, audit
  * counts exactly the scrubbed rows, nulls retained, broadcast and
  * keyed paths identical. */
class ForgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "forget-test")
  import spark.implicits._

  private val rows = Seq(
    (1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (4L, "d"), (5L, "e"))
  private val table = rows.toDF("k", "v")
  private val withNull = table.unionByName(
    Seq((Option.empty[Long], "nul1"), (Option.empty[Long], "nul2"))
      .toDF("k", "v"))
  private val forget = Seq(2L, 4L, 99L).toDF("id") // 99 hits nothing

  test("scrub removes exactly the listed keys, every occurrence") {
    val kept = Forget.scrub(table, "k", forget).select("v")
      .as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "c", "e"))
  }

  test("null-key rows are retained by scrub and counted as retained by audit") {
    val kept = Forget.scrub(withNull, "k", forget).select("v")
      .as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "c", "e", "nul1", "nul2"))
    val r = Forget.audit(Seq(("t", withNull, "k")), forget)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((8L, 3L, 5L)))
  }

  test("audit counts match scrub exactly; broadcast and keyed paths agree") {
    for (bc <- Seq(true, false)) {
      val r = Forget.audit(Seq(("t", table, "k")), forget, broadcastKeys = bc)
        .collect().head
      val retained = Forget.scrub(table, "k", forget, broadcastKeys = bc).count()
      assert(r.getLong(1) == table.count())
      assert(r.getLong(3) == retained)
      assert(r.getLong(2) == table.count() - retained)
    }
  }

  test("duplicate keys in the forget list never double-count a row") {
    val dup = Seq(2L, 2L, 2L, 4L).toDF("id")
    val r = Forget.audit(Seq(("t", table, "k")), dup).collect().head
    assert((r.getLong(2), r.getLong(3)) == ((3L, 3L)))
  }

  test("multi-table audit is one row per table in input order via union") {
    val other = Seq((2L, 10), (7L, 11)).toDF("k", "n")
    val got = Forget.audit(
        Seq(("t1", table, "k"), ("t2", other, "k")), forget)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == Map("t1" -> 3L, "t2" -> 1L))
  }

  test("a multi-column forget frame fails loudly") {
    val e = intercept[IllegalArgumentException](
      Forget.scrub(table, "k", table, broadcastKeys = true))
    assert(e.getMessage.contains("one column"))
  }

  test("broadcast path pins a broadcast join regardless of stats") {
    // broadcastKeys=false leaves the strategy to the planner (it may
    // still auto-broadcast a tiny side — that's the point: the flag
    // forces the hint on, it never forbids the planner's choice), so
    // the plan assertion is only on the forced path.
    val bc = Forget.scrub(table, "k", forget, broadcastKeys = true)
      .queryExecution.executedPlan.toString
    assert(bc.contains("BroadcastHashJoin"))
  }
}
