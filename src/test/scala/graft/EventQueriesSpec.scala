package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the event-analytics family (fn1/co1/w6) —
  * the oracle keys prove cross-engine equality; these prove the
  * numbers mean what the operator names claim.
  */
class EventQueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "event-queries")
  val dir = "/root/testdata/sf0.001"

  test("fn1 funnel counts are monotonically non-increasing and step 1 = distinct signup users") {
    val rows = queries.EventQueries.queries("fn1_funnel")(spark, dir)
      .orderBy(col("step")).collect()
    assert(rows.length == 4)
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel widened: ${counts.mkString(",")}")
    val signups = graft.core.Tables(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(counts(0) == signups)
  }

  test("fn1 strict-sequence semantics bite: out-of-order steps don't count") {
    // user 1 does everything in order; user 2's purchase precedes the
    // click (must not reach step 4); user 3 views BEFORE signing up
    // (that view must not start the chain — stops at step 1)
    import spark.implicits._
    val ev = Seq(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L), (1L, "purchase", 40L),
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "purchase", 25L), (2L, "click", 30L),
      (3L, "view", 5L), (3L, "signup", 10L)
    ).toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val reached = queries.EventQueries.funnelStages(ev)
      .map(_.select(col("user_id")).collect().map(_.getLong(0)).toSet)
    assert(reached(0) == Set(1L, 2L, 3L))
    assert(reached(1) == Set(1L, 2L)) // user 3's pre-signup view ignored
    assert(reached(2) == Set(1L, 2L))
    assert(reached(3) == Set(1L))     // user 2's pre-click purchase ignored
  }

  test("co1 cohort retention: offset-0 cell equals the cohort size (everyone is active in their first week)") {
    val ret = queries.EventQueries.queries("co1_cohort_retention")(spark, dir)
    val offsets = ret.select(col("week_offset")).distinct()
      .collect().map(_.getLong(0))
    assert(offsets.forall(_ >= 0L), "activity before a user's first week")
    val cohortSizes = graft.core.Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 604800").as("w"))
      .groupBy(col("user_id")).agg(min(col("w")).as("cohort_week"))
      .groupBy(col("cohort_week")).agg(countDistinct(col("user_id")).as("size"))
    val zeroCells = ret.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users"))
    assert(zeroCells.join(cohortSizes, Seq("cohort_week"))
      .filter(col("n_users") =!= col("size")).isEmpty)
  }

  test("fn2 transition probabilities sum to 1 per from-type and pair counts total |events| − |users|") {
    val tr = queries.EventQueries.queries("fn2_transitions")(spark, dir)
    val sums = tr.groupBy(col("from_type"))
      .agg(sum(col("prob")).as("p"), sum(col("n")).as("n")).collect()
    assert(sums.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
    val ev = graft.core.Tables(spark, dir, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(sums.map(_.getLong(2)).sum == expected) // every event but each user's last has a successor
  }

  test("rfm1 bands are quartile-balanced over the customer frame") {
    val seg = queries.EventQueries.queries("rfm1_segments")(spark, dir)
    for (band <- Seq("r_band", "f_band", "m_band")) {
      val sizes = seg.groupBy(col(band)).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L), s"$band: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1L, s"$band: $sizes")
    }
  }

  test("hg1 histogram bins partition the table: counts and sums total the source exactly") {
    import graft.core.Exact.sumd
    val hist = queries.EventQueries.queries("hg1_histogram")(spark, dir)
      .agg(sum(col("n")).as("n"), sum(col("sum_price")).as("s")).collect()(0)
    val src = graft.core.Tables(spark, dir, "orders")
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("s")).collect()(0)
    assert(hist.getLong(0) == src.getLong(0))
    assert(math.abs(hist.getDouble(1) - src.getDouble(1)) < 1e-6)
  }

  test("w6 ntile bands are balanced (sizes differ by at most 1) and pct_rank/cume_dist lie in range") {
    val df = queries.EventQueries.queries("w6_ntile_bands")(spark, dir)
    val bandSizes = df.groupBy(col("o_orderstatus"), col("band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("o_orderstatus"))
      .agg((max(col("n")) - min(col("n"))).as("spread"), countDistinct(col("band")).as("bands"))
      .collect()
    assert(bandSizes.forall(r => r.getLong(1) <= 1L && r.getLong(2) == 4L))
    assert(df.filter(col("pct_rank") < 0.0 || col("pct_rank") > 1.0 ||
      col("cume") <= 0.0 || col("cume") > 1.0).isEmpty)
  }
}
