package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical quality guard for the minhash signature family.
  *
  * Round 6 replaced the k-independent-md5s family with the
  * Kirsch-Mitzenmacher derivation (h_i = h1 + i·(h2 div 32) mod 2⁶⁰
  * over one digest's two 60-bit halves). That is only sound if the
  * derived family still behaves like a min-wise hash family: the
  * fraction of agreeing signature positions must estimate the true
  * Jaccard similarity. This spec pins that property with controlled
  * gram overlaps — if a future "optimization" breaks pairwise
  * independence (e.g. deriving from one half, or letting the
  * multiplier overflow), the estimates drift far outside tolerance
  * and this fails.
  *
  * The inputs are fixed strings and md5 is deterministic, so the
  * observed agreement is a constant for a given implementation — the
  * tolerances (±3σ for k=64) are generous enough that any correct
  * min-wise family passes and degenerate ones do not.
  */
class MinHashQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "minhash-quality")

  private val K = 64

  /** Two shingle-table rows with n grams each sharing m. */
  private def sigPair(n: Int, m: Int): (Seq[Long], Seq[Long]) = {
    import spark.implicits._
    val shared = (1 to m).map(i => s"shared gram number $i")
    val aOwn = (1 to n - m).map(i => s"alpha only gram $i")
    val bOwn = (1 to n - m).map(i => s"beta only gram $i")
    val g = Seq((1L, shared ++ aOwn), (2L, shared ++ bOwn)).toDF("id", "grams")
    val rows = MinHashLSH.signaturesFrom(g, K).orderBy(col("id")).collect()
    (rows(0).getSeq[Long](1), rows(1).getSeq[Long](1))
  }

  private def agreement(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / K

  test("signature agreement estimates Jaccard across overlap levels") {
    for ((n, m) <- Seq((100, 95), (100, 89), (100, 67), (100, 20))) {
      val j = m.toDouble / (2 * n - m)
      val (sa, sb) = sigPair(n, m)
      assert(sa.size == K && sb.size == K)
      val est = agreement(sa, sb)
      val sigma = math.sqrt(j * (1 - j) / K)
      assert(math.abs(est - j) <= 3 * sigma + 1e-9,
        f"n=$n m=$m: estimate $est%.3f vs true J=$j%.3f (3σ=${3 * sigma}%.3f)")
    }
  }

  test("disjoint gram sets agree (almost) nowhere; identical sets agree everywhere") {
    val (da, db) = sigPair(100, 0)
    // 60-bit hashes over 100-element sets: a positional collision is
    // ~100/2^60 per slot — zero in practice
    assert(agreement(da, db) == 0.0)
    val (ia, ib) = sigPair(100, 100)
    assert(ia == ib)
  }

  test("derived family is not degenerate: positions differ and h0 is the raw min-hash") {
    import spark.implicits._
    val g = Seq((1L, (1 to 50).map(i => s"gram $i"))).toDF("id", "grams")
    val sig = MinHashLSH.signaturesFrom(g, K).head().getSeq[Long](1)
    // k distinct hash functions must produce (nearly) k distinct minima —
    // a family collapsing to one function would repeat one value
    assert(sig.distinct.size > K / 2, s"degenerate family: ${sig.distinct.size} distinct")
    // position 0 is the undisplaced base hash: min over grams of h1
    val h0 = (1 to 50).map(i =>
      graft.plans.HexHash60.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"gram $i"))).min
    assert(sig.head == h0)
    // every value stays inside the 2^60 ring (derivation never overflows)
    assert(sig.forall(v => v >= 0 && v < (1L << 60)))
  }
}
