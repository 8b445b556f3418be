package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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

  private def snap(df: org.apache.spark.sql.DataFrame) = df
    .select("k", "seq", "status", "valid_from", "valid_to", "is_current")
    .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
      r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5)))
    .sortBy(t => (t._1, t._2)).toSeq

  test("scd2Apply: closes the open version, collapses no-ops against it, inserts new keys") {
    import spark.implicits._
    val hist = Seq((7L, 1, Some("A")), (7L, 2, Some("B")), (9L, 1, Some("X")))
      .toDF("k", "seq", "status")
    val dim = Upsert.scd2History(hist, Seq("k"), Seq("status"), Seq("seq"))
    val batch = Seq(
      (7L, 3, Some("B")), // no-op vs the open B version — must collapse
      (7L, 4, Some("C")), // real change — closes B at 4, opens C
      (5L, 3, Some("N"))) // brand-new key — history from scratch
      .toDF("k", "seq", "status")
    val out = Upsert.scd2Apply(dim, batch, Seq("k"), Seq("status"), Seq("seq"))
    assert(snap(out) == Seq(
      (5L, 3, Some("N"), 3, None, true),
      (7L, 1, Some("A"), 1, Some(2), false),
      (7L, 2, Some("B"), 2, Some(4), false),
      (7L, 4, Some("C"), 4, None, true),
      (9L, 1, Some("X"), 1, None, true)))
  }

  test("scd2Apply: no-op-only and empty batches leave the dimension bit-identical") {
    import spark.implicits._
    val hist = Seq((7L, 1, Some("A")), (9L, 1, Some("X"))).toDF("k", "seq", "status")
    val dim = Upsert.scd2History(hist, Seq("k"), Seq("status"), Seq("seq"))
    val noop = Seq((7L, 5, Some("A"))).toDF("k", "seq", "status")
    assert(snap(Upsert.scd2Apply(dim, noop, Seq("k"), Seq("status"), Seq("seq")))
      == snap(dim))
    assert(snap(Upsert.scd2Apply(dim, noop.limit(0), Seq("k"), Seq("status"), Seq("seq")))
      == snap(dim))
  }

  test("scd2Apply: a batch row at or before the open version fails loudly") {
    import spark.implicits._
    val hist = Seq((7L, 1, Some("A")), (7L, 4, Some("B"))).toDF("k", "seq", "status")
    val dim = Upsert.scd2History(hist, Seq("k"), Seq("status"), Seq("seq"))
    // seq 3 predates the open version's seq 4; seq 4 ties it — both refuse
    for (badSeq <- Seq(3, 4)) {
      val e = intercept[IllegalArgumentException](Upsert.scd2Apply(dim,
        Seq((7L, badSeq, Some("C"))).toDF("k", "seq", "status"),
        Seq("k"), Seq("status"), Seq("seq")))
      assert(e.getMessage.contains("in order"), s"seq=$badSeq")
    }
  }

  test("scd2Lookup: each fact matches exactly the version valid at its ts; pre-history facts keep null") {
    import spark.implicits._
    val log = Seq((7L, 2, Some("A")), (7L, 5, Some("B")), (9L, 4, Some("X")))
      .toDF("k", "seq", "status")
    val dim = Upsert.scd2History(log, Seq("k"), Seq("status"), Seq("seq"))
    val facts = Seq(
      (7L, 100L, 1),  // before first version → null
      (7L, 101L, 2),  // exactly valid_from of A → A
      (7L, 102L, 4),  // inside A's interval → A
      (7L, 103L, 5),  // boundary: A closes at 5, B opens → B
      (7L, 104L, 9),  // open version → B
      (8L, 105L, 3),  // key with no dimension at all → null
      (9L, 106L, 4))  // single-version key → X
      .toDF("k", "fact_id", "ts")
    val out = Upsert.scd2Lookup(dim, facts, Seq("k"), "ts")
      .select(col("fact_id"), col("v_status"), col("v_is_current"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (100L, None, None),
      (101L, Some("A"), Some(false)),
      (102L, Some("A"), Some(false)),
      (103L, Some("B"), Some(true)),
      (104L, Some("B"), Some(true)),
      (105L, None, None),
      (106L, Some("X"), Some(true))))
    // exactly one output row per fact — tiling guarantees uniqueness
    assert(Upsert.scd2Lookup(dim, facts, Seq("k"), "ts").count() == facts.count())
  }

  test("scd2Lookup: zero-width versions (same-order-value boundary) never double-match") {
    import spark.implicits._
    // A and B share seq-as-date 3 (tie broken by the second order col):
    // A's interval is [3,3) — empty — so ts=3 matches only B
    val log = Seq((7L, 3, 1L, Some("A")), (7L, 3, 2L, Some("B")))
      .toDF("k", "seq", "sub", "status")
    val dim = Upsert.scd2History(log, Seq("k"), Seq("status"), Seq("seq", "sub"))
    val facts = Seq((7L, 200L, 3), (7L, 201L, 4)).toDF("k", "fact_id", "ts")
    val out = Upsert.scd2Lookup(dim, facts, Seq("k"), "ts")
      .select(col("fact_id"), col("v_status"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((200L, "B"), (201L, "B")))
  }

  test("applyCdc: latest change wins, D deletes, U replaces/inserts, untouched rows persist") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", 1, "U"), (2L, "b3", 2, "U"), // compaction: b3 wins
      (3L, "x", 1, "U"), (3L, "x", 2, "D"),   // update-then-delete → deleted
      (4L, "ignored", 1, "D"), (4L, "d2", 2, "U"), // delete-then-reinsert → d2
      (5L, "e", 1, "U"),                      // insert of a new key
      (9L, "zz", 1, "D"))                     // delete of an absent key: no-op
      .toDF("k", "v", "seq", "op")
    val out = Upsert.applyCdc(target, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "b3"), (4L, "d2"), (5L, "e")))
  }

  test("applyCdc vs a fold reference on random change sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 3) {
      val target = (1L to 20L).filter(_ => rnd.nextBoolean()).map(k => (k, s"t$k"))
      val changes = (1 to 40).map { s =>
        val k = 1L + rnd.nextInt(25)
        (k, s"c$k-$s", s, if (rnd.nextInt(4) == 0) "D" else "U")
      }
      val got = Upsert.applyCdc(target.toDF("k", "v"),
          changes.toDF("k", "v", "seq", "op"), Seq("k"), "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val latest = changes.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
      val want = ((1L to 25L).flatMap { k =>
        latest.get(k) match {
          case Some((_, _, _, "D")) => None
          case Some((_, v, _, _)) => Some((k, v))
          case None => target.toMap.get(k).map((k, _))
        }
      }).sortBy(_._1)
      assert(got == want, s"trial $trial")
    }
  }

  test("applyCdc: a NULL op surviving compaction fails loudly instead of dropping the row") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    // k=3's latest change has a null op: neither delete nor upsert —
    // the row must not silently vanish from both branches
    val bad = Seq((2L, "b", 1, Some("U")), (3L, "c", 1, None: Option[String]))
      .toDF("k", "v", "seq", "op")
    val e = intercept[IllegalArgumentException](
      Upsert.applyCdc(target, bad, Seq("k"), "seq", "op"))
    assert(e.getMessage.contains("NULL 'op'"))
    // a null op SUPERSEDED by a later change is gone after compaction —
    // the feed's final word per key is well-formed, so it applies
    val healed = Seq((2L, "b0", 1, None: Option[String]), (2L, "b1", 2, Some("U")))
      .toDF("k", "v", "seq", "op")
    val out = Upsert.applyCdc(target, healed, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "b1")))
  }

  test("scd2Apply: a NULL key is one real key — touched split is null-safe, incremental == rebuild") {
    import spark.implicits._
    val hist = Seq((Some(7L), 1, Some("A")), (None: Option[Long], 1, Some("N1")))
      .toDF("k", "seq", "status")
    val dim = Upsert.scd2History(hist, Seq("k"), Seq("status"), Seq("seq"))
    val batch = Seq((None: Option[Long], 2, Some("N2"))).toDF("k", "seq", "status")
    val inc = Upsert.scd2Apply(dim, batch, Seq("k"), Seq("status"), Seq("seq"))
    val full = Upsert.scd2History(hist.unionByName(batch),
      Seq("k"), Seq("status"), Seq("seq"))
    def snapN(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "seq", "status", "valid_from", "valid_to", "is_current")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getInt(1),
        Option(r.getString(2)), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snapN(inc) == snapN(full))
    // before the null-safe split, the null-key batch rebuilt a SECOND
    // history and the dimension ended with two open null-key versions
    assert(inc.filter(col("k").isNull && col("is_current")).count() == 1)
    // and the lateRows guard can now SEE a late null-key batch
    val late = Seq((None: Option[Long], 1, Some("N3"))).toDF("k", "seq", "status")
    val e = intercept[IllegalArgumentException](
      Upsert.scd2Apply(dim, late, Seq("k"), Seq("status"), Seq("seq")))
    assert(e.getMessage.contains("in order"))
  }

  test("snapshotDiff: inserts, before-image deletes, null-safe updates, identical rows silent") {
    import spark.implicits._
    val oldS = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("k", "v")
    val newS = Seq((2L, Some("b")),   // identical → silent
      (3L, Some("c")),                // null → value: a real U
      (4L, None: Option[String]),     // value → null: a real U
      (5L, Some("e")))                // new key → I; 1 disappears → D
      .toDF("k", "v")
    val got = Upsert.snapshotDiff(oldS, newS, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("a"), "D"), // delete carries the before image
      (3L, Some("c"), "U"),
      (4L, None, "U"),
      (5L, Some("e"), "I")))
  }

  test("snapshotDiff round trip: applyCdc(old, diff) == new on random snapshots") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 3) {
      val oldS = (1L to 30L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"v$k-${rnd.nextInt(3)}"))
      val newS = (1L to 35L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"v$k-${rnd.nextInt(3)}"))
      val diff = Upsert.snapshotDiff(
          oldS.toDF("k", "v"), newS.toDF("k", "v"), Seq("k"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1))
      val rebuilt = Upsert.applyCdc(oldS.toDF("k", "v"), diff, Seq("k"), "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(rebuilt == newS.sortBy(_._1), s"trial $trial")
    }
  }

  test("scd2Apply: incremental ≡ full rebuild on random multi-batch change logs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val n = 60 + rnd.nextInt(60)
      // seq is globally increasing, so range cuts respect per-key order
      val rows = (1 to n).map { i =>
        val k = 1L + rnd.nextInt(7)
        val st = if (rnd.nextInt(6) == 0) None
          else Some(Seq("A", "B", "C")(rnd.nextInt(3)))
        (k, i, st)
      }
      val cuts = Seq(0, n / 3, 2 * n / 3, n)
      val batches = cuts.sliding(2).toSeq
        .map { case Seq(a, b) => rows.filter(r => r._2 > a && r._2 <= b) }
      var dim = Upsert.scd2History(
        batches.head.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
      batches.tail.foreach { b =>
        dim = Upsert.scd2Apply(dim, b.toDF("k", "seq", "status"),
          Seq("k"), Seq("status"), Seq("seq"))
      }
      val full = Upsert.scd2History(
        rows.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
      assert(snap(dim) == snap(full), s"trial $trial (n=$n)")
    }
  }
}
