package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random model checking for the round-13 IVM members: random
  * multi-batch CDC sequences (deletes sampled from the live state, so
  * every delta is contract-valid) folded through the operators must
  * track a plain-Scala model of the surviving multiset — distinct
  * counts, exact quantiles, and join-view sums — at every step. This
  * is the coverage the hand-picked shapes can't give: arbitrary
  * interleavings of duplicate inserts, partial deletes, group
  * emptyings, and re-insertions. */
class IvmFamilyPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-props")
  import spark.implicits._

  private val Groups = Seq("a", "b", "c")

  test("IvmDistinct tracks the model across random CDC sequences (seeded)") {
    val rnd = new scala.util.Random(130301)
    for (scenario <- 1 to 5) {
      val state = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      var st: Option[(DataFrame, DataFrame)] = None
      for (step <- 1 to 3) {
        val nDel = rnd.nextInt(math.min(4, state.size + 1))
        val dels = rnd.shuffle(state.toList).take(nDel)
        dels.foreach(d => state.remove(state.indexOf(d)))
        val ins = Seq.fill(1 + rnd.nextInt(4))(
          (Groups(rnd.nextInt(3)), rnd.nextInt(8).toLong))
        ins.foreach(state += _)
        val delta = (dels.map(t => (t._1, "D", t._2)) ++
          ins.map(t => (t._1, "I", t._2))).toDF("g", "op", "v")
        val after = state.toSeq.toDF("g", "v")
        val (c, d) = IvmDistinct.fold(st, delta, after, Seq("g"), "op", "v")
        val cc = c.localCheckpoint(true); val dd = d.localCheckpoint(true)
        st = Some((cc, dd))
        val want = state.groupBy(_._1).view
          .mapValues(_.map(_._2).distinct.size.toLong).toMap
        val got = cc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == want, s"scenario $scenario step $step: $got vs $want")
        val wantDict = state.map(t => (t._1, t._2)).distinct.sorted
        val gotDict = dd.collect().map(r => (r.getString(0), r.getLong(1)))
          .sorted.toSeq
        assert(gotDict == wantDict, s"scenario $scenario step $step dict")
      }
    }
  }

  test("IvmQuantile tracks the sort-form model across random CDC sequences (seeded)") {
    val rnd = new scala.util.Random(130302)
    val Lo = 0.0; val Hi = 100.0; val B = 8
    val Ps = Seq(0.0, 0.33, 0.5, 0.75, 1.0)
    def modelPercentiles(state: Seq[(String, Double)]): Map[(String, Double), Double] =
      state.groupBy(_._1).flatMap { case (g, rows) =>
        val vs = rows.map(_._2).sorted
        val n = vs.size
        Ps.map { p =>
          val idx = (n - 1).toDouble * p
          val lo = math.floor(idx).toLong + 1
          val hi = math.min(lo + 1, n.toLong)
          val frac = idx - math.floor(idx)
          val v = vs((lo - 1).toInt) + frac * (vs((hi - 1).toInt) - vs((lo - 1).toInt))
          (g, p) -> v
        }
      }
    for (scenario <- 1 to 5) {
      val state = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      var counts: Option[DataFrame] = None
      for (step <- 1 to 3) {
        val nDel = rnd.nextInt(math.min(4, state.size + 1))
        val dels = rnd.shuffle(state.toList).take(nDel)
        dels.foreach(d => state.remove(state.indexOf(d)))
        val ins = Seq.fill(1 + rnd.nextInt(4))(
          (Groups(rnd.nextInt(3)), rnd.nextInt(41) * 2.5))
        ins.foreach(state += _)
        val delta = (dels.map(t => (t._1, "D", t._2)) ++
          ins.map(t => (t._1, "I", t._2))).toDF("g", "op", "v")
        val c = IvmQuantile.foldCounts(counts, delta, Seq("g"), "op", "v",
          Lo, Hi, B).localCheckpoint(true)
        counts = Some(c)
        val got = IvmQuantile.percentileCont(c, state.toSeq.toDF("g", "v"),
            Seq("g"), "v", Ps, Lo, Hi, B)
          .collect()
          .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
        val want = modelPercentiles(state.toSeq)
        assert(got == want, s"scenario $scenario step $step: $got vs $want")
      }
    }
  }

  test("IvmJoin tracks the join-view model across random two-sided CDC sequences (seeded)") {
    val rnd = new scala.util.Random(130303)
    def modelView(r: Seq[(Long, Double)], s: Seq[(Long, String)]): Map[String, (Long, Double)] =
      (for { (rk, rv) <- r; (sk, g) <- s if rk == sk } yield (g, rv))
        .groupBy(_._1).view.mapValues { rows =>
          (rows.size.toLong,
            rows.map(t => BigDecimal(t._2)).sum.toDouble)
        }.toMap
    for (scenario <- 1 to 5) {
      val rState = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      val sState = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      var view: Option[DataFrame] = None
      for (step <- 1 to 3) {
        val rBefore = rState.toSeq; val sBefore = sState.toSeq
        val rDels = rnd.shuffle(rState.toList).take(rnd.nextInt(math.min(3, rState.size + 1)))
        rDels.foreach(d => rState.remove(rState.indexOf(d)))
        val rIns = Seq.fill(1 + rnd.nextInt(3))(
          (rnd.nextInt(4).toLong, (rnd.nextInt(400) + 1) / 4.0))
        rIns.foreach(rState += _)
        val sDels = rnd.shuffle(sState.toList).take(rnd.nextInt(math.min(2, sState.size + 1)))
        sDels.foreach(d => sState.remove(sState.indexOf(d)))
        val sIns = Seq.fill(rnd.nextInt(3))(
          (rnd.nextInt(4).toLong, Groups(rnd.nextInt(3))))
        sIns.foreach(sState += _)
        val dR = (rDels.map(t => (t._1, t._2, "D")) ++
          rIns.map(t => (t._1, t._2, "I"))).toDF("k", "rv", "op")
        val dS = (sDels.map(t => (t._1, t._2, "D")) ++
          sIns.map(t => (t._1, t._2, "I"))).toDF("k", "g", "op")
        val folded = IvmJoin.foldSumView(view, dR, dS,
            rBefore.toDF("k", "rv"), sBefore.toDF("k", "g"),
            Seq("k"), Seq("g"), "rv", "op")
          .localCheckpoint(true)
        view = Some(folded)
        val got = folded.collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
        val want = modelView(rState.toSeq, sState.toSeq)
        assert(got == want, s"scenario $scenario step $step: $got vs $want")
      }
    }
  }

  test("IvmTopK tracks the model across random CDC sequences (seeded)") {
    val rnd = new scala.util.Random(130304)
    val K = 2
    def modelTopK(state: Seq[(String, Long)]): Set[(String, Int, Long, Long)] =
      state.groupBy(_._1).flatMap { case (g, rows) =>
        rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (k, c) => (-c, k) }
          .take(K).zipWithIndex
          .map { case ((k, c), i) => (g, i + 1, k, c) }
      }.toSet
    for (scenario <- 1 to 5) {
      val state = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      var st: Option[(DataFrame, DataFrame)] = None
      for (step <- 1 to 3) {
        val nDel = rnd.nextInt(math.min(4, state.size + 1))
        val dels = rnd.shuffle(state.toList).take(nDel)
        dels.foreach(d => state.remove(state.indexOf(d)))
        val ins = Seq.fill(1 + rnd.nextInt(4))(
          (Groups(rnd.nextInt(3)), rnd.nextInt(5).toLong))
        ins.foreach(state += _)
        val delta = (dels.map(t => (t._1, "D", t._2)) ++
          ins.map(t => (t._1, "I", t._2))).toDF("g", "op", "ck")
        val (t, c) = IvmTopK.fold(st, delta, Seq("g"), "op", "ck", K)
        val tt = t.localCheckpoint(true); val cc = c.localCheckpoint(true)
        st = Some((tt, cc))
        val wantCounts = state.groupBy(identity).view
          .mapValues(_.size.toLong).toSeq
          .map { case ((g, k), c2) => (g, k, c2) }.toSet
        val gotCounts = cc.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(gotCounts == wantCounts,
          s"scenario $scenario step $step counts: $gotCounts vs $wantCounts")
        val got = tt.collect()
          .map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getLong(2)))
          .toSet
        val want = modelTopK(state.toSeq)
        assert(got == want, s"scenario $scenario step $step: $got vs $want")
      }
    }
  }

  test("IvmTopK weighted face tracks the model across random CDC sequences (seeded)") {
    val rnd = new scala.util.Random(130305)
    val K = 2
    def modelTopK(state: Seq[(String, Long, Long)]): Set[(String, Int, Long, Long)] =
      state.groupBy(_._1).flatMap { case (g, rows) =>
        rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
          .sortBy { case (k, s) => (-s, k) }
          .take(K).zipWithIndex
          .map { case ((k, s), i) => (g, i + 1, k, s) }
      }.toSet
    for (scenario <- 1 to 5) {
      val state = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      var st: Option[(DataFrame, DataFrame)] = None
      for (step <- 1 to 3) {
        val nDel = rnd.nextInt(math.min(4, state.size + 1))
        val dels = rnd.shuffle(state.toList).take(nDel)
        dels.foreach(d => state.remove(state.indexOf(d)))
        val ins = Seq.fill(1 + rnd.nextInt(4))(
          (Groups(rnd.nextInt(3)), rnd.nextInt(5).toLong,
            1L + rnd.nextInt(5)))
        ins.foreach(state += _)
        val delta = (dels.map(t => (t._1, "D", t._2, t._3)) ++
          ins.map(t => (t._1, "I", t._2, t._3))).toDF("g", "op", "ck", "w")
        val (t, c) = IvmTopK.fold(st, delta, Seq("g"), "op", "ck", K,
          Some("w"))
        val tt = t.localCheckpoint(true); val cc = c.localCheckpoint(true)
        st = Some((tt, cc))
        val wantCounts = state.groupBy(r => (r._1, r._2)).view
          .mapValues(_.map(_._3).sum).toSeq
          .map { case ((g, k), s) => (g, k, s) }.toSet
        val gotCounts = cc.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(gotCounts == wantCounts,
          s"scenario $scenario step $step counts: $gotCounts vs $wantCounts")
        val got = tt.collect()
          .map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getLong(2)))
          .toSet
        val want = modelTopK(state.toSeq)
        assert(got == want, s"scenario $scenario step $step: $got vs $want")
      }
    }
  }
}
