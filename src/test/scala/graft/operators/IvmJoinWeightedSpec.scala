package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The weighted bilinear algebra (round 15) model-checked against a
  * plain-Scala multiset model: for SEEDED random multisets R, S (with
  * genuine multiplicities — duplicate payloads) and random signed
  * deltas keeping R+ΔR, S+ΔS non-negative,
  * `deltaJoinWeighted(ΔR, ΔS, R, S)` net-compressed must equal the
  * multiset difference `(R+ΔR)⋈(S+ΔS) − R⋈S` exactly — multiplicity
  * products, cancellations and all — and `foldAggWeighted` must land
  * the maintained (n, s) view on the full recompute, groups dying at
  * zero. Zero/NULL weights refuse loudly. */
class IvmJoinWeightedSpec extends AnyFunSuite {
  lazy val spark = graft.core.GraftSession.local("4", "ivm-join-weighted")
  import spark.implicits._

  private type MS = Map[(Long, Long), Long] // (key, payload) -> mult

  private def randMultiset(rnd: scala.util.Random, n: Int, keys: Int,
      vals: Int): MS =
    (1 to n).map(_ => (rnd.nextInt(keys).toLong, rnd.nextInt(vals).toLong))
      .groupBy(identity).map { case (kv, xs) => kv -> xs.size.toLong }

  /** A random signed delta for `base`: deletes bounded by the held
    * multiplicity (so base+delta stays a multiset), plus fresh
    * inserts. Zero nets dropped. */
  private def randDelta(rnd: scala.util.Random, base: MS, keys: Int,
      vals: Int): MS = {
    val dels = base.toSeq.filter(_ => rnd.nextBoolean()).map {
      case (kv, m) => kv -> -(1L + rnd.nextInt(m.toInt)).min(m)
    }
    val ins = (1 to 6).map(_ =>
      (rnd.nextInt(keys).toLong, rnd.nextInt(vals).toLong) ->
        (1L + rnd.nextInt(3)))
    (dels ++ ins).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
  }

  private def plus(a: MS, b: MS): MS =
    (a.toSeq ++ b.toSeq).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap

  /** Model multiset join on the key: multiplicity products. */
  private def joinM(r: MS, s: MS): Map[(Long, Long, Long), Long] =
    (for (((rk, a), mr) <- r.toSeq; ((sk, b), ms) <- s.toSeq if rk == sk)
      yield ((rk, a, b), mr * ms))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 != 0).toMap

  private def minus(a: Map[(Long, Long, Long), Long],
      b: Map[(Long, Long, Long), Long]): Map[(Long, Long, Long), Long] =
    (a.toSeq ++ b.toSeq.map { case (k, m) => k -> -m }).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap

  private def storeDf(ms: MS, payload: String): DataFrame =
    ms.toSeq.map { case ((k, p), m) => (k, p, m) }
      .toDF("k", payload, "__mult")

  private def deltaDf(ms: MS, payload: String): DataFrame =
    ms.toSeq.map { case ((k, p), w) => (k, p, w) }
      .toDF("k", payload, "__w")

  for (seed <- Seq(11, 23, 47))
    test(s"bilinear multiset identity under random deltas (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val r0 = randMultiset(rnd, 30, 5, 4)
      val s0 = randMultiset(rnd, 25, 5, 3)
      val dR = randDelta(rnd, r0, 5, 4)
      val dS = randDelta(rnd, s0, 5, 3)
      val got = IvmJoin.deltaJoinWeighted(
          deltaDf(dR, "a"), deltaDf(dS, "b"),
          storeDf(r0, "a"), storeDf(s0, "b"),
          Seq("k"), "__w", "__mult", Seq("k", "a", "b"))
        .groupBy(col("k"), col("a"), col("b"))
        .agg(sum(col("__w")).as("w")).filter(col("w") =!= 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      val want = minus(joinM(plus(r0, dR), plus(s0, dS)), joinM(r0, s0))
      assert(got == want, s"seed $seed:\n got $got\nwant $want")
    }

  test("foldAggWeighted lands the view on the recompute; groups die at zero") {
    val rnd = new scala.util.Random(7)
    val r0 = randMultiset(rnd, 30, 4, 3)
    val s0 = randMultiset(rnd, 20, 4, 3)
    val dR = randDelta(rnd, r0, 4, 3)
    val dS = randDelta(rnd, s0, 4, 3)
    def viewOf(r: MS, s: MS): Map[Long, (Long, Long)] =
      joinM(r, s).toSeq.groupBy(_._1._2) // group by R's payload a
        .map { case (g, xs) =>
          g -> (xs.map(_._2).sum, xs.map { case ((_, _, b), m) => b * m }.sum)
        }.filter(_._2._1 != 0)
    val stored = viewOf(r0, s0).toSeq
      .map { case (g, (n, s)) => (g, n, s.toDouble) }.toDF("a", "n", "s")
      .select(col("a"), col("n"), col("s").cast("decimal(28,4)").as("s"))
    val d = IvmJoin.deltaJoinWeighted(
      deltaDf(dR, "a"), deltaDf(dS, "b"),
      storeDf(r0, "a"), storeDf(s0, "b"),
      Seq("k"), "__w", "__mult", Seq("a", "b"))
    val got = IvmJoin.foldAggWeighted(Some(stored), d, Seq("a"), "b", "__w")
      .select(col("a"), col("n"), col("s").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = viewOf(plus(r0, dR), plus(s0, dS))
    assert(got == want, s"\n got $got\nwant $want")
  }

  test("zero/NULL weights refuse loudly") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val z = Seq((1L, 1L, 0L)).toDF("k", "a", "__w")
    val ok = Seq((1L, 2L, 1L)).toDF("k", "b", "__w")
    val st = Seq((1L, 1L, 1L)).toDF("k", "a", "__mult")
    val ss = Seq((1L, 2L, 1L)).toDF("k", "b", "__mult")
    val e = intercept[Exception] {
      IvmJoin.deltaJoinWeighted(z, ok, st, ss, Seq("k"), "__w", "__mult",
        Seq("k", "a", "b")).collect()
    }
    assert(msgChain(e).contains("multiplicity"), msgChain(e))
    val e2 = intercept[Exception] {
      IvmJoin.foldAggWeighted(None, z.withColumnRenamed("a", "b"),
        Seq("k"), "b", "__w").collect()
    }
    assert(msgChain(e2).contains("multiplicity"), msgChain(e2))
  }
}
