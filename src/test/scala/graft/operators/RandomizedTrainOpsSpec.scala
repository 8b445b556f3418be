package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded randomized checks of the round-8 training operators against
  * independent pure-Scala reference implementations — the oracle gate
  * proves engine parity on the fixed corpus; these prove ALGORITHM
  * correctness across random shapes (tiny alphabets force dense
  * tie-break and run-merge collisions the synthetic corpus never
  * hits). */
class RandomizedTrainOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "rand-train-test")
  import spark.implicits._

  /** Reference portable hash: first 15 md5 hex chars as a long —
    * independent reimplementation of TextOps.hexHash60. */
  private def refHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  // ---- BPE vs reference ---------------------------------------------

  private def refGreedy(s: Seq[String], a: String, b: String): Seq[String] =
    BpeTestRef.greedy(s, a, b)

  /** BMP-only reference: the tie-break below orders strings by Scala
    * tuple minBy (Java UTF-16 code units), while BpeTrainer/DuckDB
    * order by UTF-8 bytes (code points) — the two diverge only for
    * supplementary (non-BMP) symbols, which the 'ab' corpora here
    * never produce. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var st: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toSeq }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      st.foreach { case (w, syms) =>
        (0 until syms.length - 1).foreach { i =>
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
        }
      }
      val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      merges += ((a, b, c))
      st = st.map { case (w, syms) => w -> refGreedy(syms, a, b) }
    }
    (merges.toSeq, st)
  }

  test("BPE train == reference on random tiny-alphabet corpora (dense ties, runs)") {
    val rnd = new Random(11)
    for (trial <- 1 to 4) {
      val words = (1 to 15 + rnd.nextInt(20)).map(_ =>
        (1 to 1 + rnd.nextInt(7)).map(_ => "ab" (rnd.nextInt(2))).mkString)
        .distinct.map(w => w -> (1L + rnd.nextInt(5))).toMap
      val (expM, expSt) = refBpe(words, 3)
      val (gotM, st) = BpeTrainer.train(words.toSeq.toDF("word", "freq"), 3)
      val gotSt = st.select(col("word"), col("syms"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      st.unpersist()
      assert(gotM.map(m => (m.a, m.b, m.cnt)) == expM, s"trial $trial: $words")
      assert(gotSt == expSt, s"trial $trial: $words")
    }
  }

  test("exact OOV deployment == reference merge-chain fold on random unseen words") {
    val rnd = new Random(43)
    for (trial <- 1 to 3) {
      // train on a random 'ab' corpus; deploy docs built from words the
      // trainer never saw (longer 'ab' strings + a 'c' alphabet mix)
      val trainWords = (1 to 12 + rnd.nextInt(10)).map(_ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => "ab" (rnd.nextInt(2))).mkString)
        .distinct.map(w => w -> (1L + rnd.nextInt(4))).toMap
      val (ms, st) = BpeTrainer.train(trainWords.toSeq.toDF("word", "freq"), 2)
      val deployWords = (1 to 6).map(_ =>
        (6 to 8 + rnd.nextInt(3)).map(_ => "abc" (rnd.nextInt(3))).mkString)
        .distinct
      val docs = deployWords.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = BpeTrainer.compressionStatsExact(docs, "doc_id", "text", st, ms)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      st.unpersist()
      // seen or unseen, the contract is ONE function: fold the learned
      // merges greedily in order (the precompiled state for seen words
      // equals that fold by construction)
      val expect = deployWords.zipWithIndex.map { case (w, i) =>
        i.toLong -> ms.foldLeft(w.map(_.toString): Seq[String])(
          (s, m) => refGreedy(s, m.a, m.b)).length.toLong
      }.toMap
      assert(got == expect, s"trial $trial: merges=$ms deploy=$deployWords")
    }
  }

  test("scd2History == reference fold on random change logs (runs, nulls, multi-key)") {
    val rnd = new Random(61)
    for (trial <- 1 to 3) {
      val statuses = Seq(Some("A"), Some("B"), Some("C"), None)
      val log = for {
        k <- 1L to (3 + rnd.nextInt(4)).toLong
        s <- 1 to 5 + rnd.nextInt(12)
      } yield (k, s, statuses(rnd.nextInt(statuses.size)))
      val got = Upsert.scd2History(
          log.toDF("k", "seq", "status"), Seq("k"), Seq("status"), Seq("seq"))
        .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
          r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)),
          r.getBoolean(5)))
        .sortBy(t => (t._1, t._2)).toSeq
      // reference: per key in seq order, keep rows where the tracked
      // value changed; valid_to = next kept row's seq
      val expect = log.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val kept = rows.sortBy(_._2).foldLeft(Vector.empty[(Long, Int, Option[String])]) {
          case (acc, (_, s, v)) =>
            if (acc.nonEmpty && acc.last._3 == v) acc else acc :+ ((k, s, v))
        }
        kept.zipWithIndex.map { case ((_, s, v), i) =>
          val to = if (i + 1 < kept.size) Some(kept(i + 1)._2) else None
          (k, s, v, s, to, to.isEmpty)
        }
      }.sortBy(t => (t._1, t._2))
      assert(got == expect, s"trial $trial")
    }
  }

  test("Hierarchy.ancestors == BFS closure on random DAGs") {
    val rnd = new Random(67)
    for (trial <- 1 to 3) {
      // random DAG: edges only from lower to higher node ids (acyclic)
      val n = 8 + rnd.nextInt(8)
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextInt(100) < 22
      } yield (s"v$a", s"v$b")).distinct
      if (edges.nonEmpty) {
        val got = Hierarchy.ancestors(
            edges.toDF("child", "parent"), "child", "parent")
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        // reference: depth-k reachability = k-step products, deduped
        val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        var frontier: Set[(String, String)] =
          edges.map { case (c, p) => (c, p) }.toSet
        val expect = scala.collection.mutable.Set[(String, String, Int)]()
        var d = 1
        while (frontier.nonEmpty) {
          frontier.foreach { case (c, p) => expect += ((c, p, d)) }
          frontier = frontier.flatMap { case (c, p) =>
            adj.getOrElse(p, Set.empty).map(pp => (c, pp)) }
          d += 1
        }
        assert(got == expect.toSet, s"trial $trial (${edges.size} edges)")
      }
    }
  }

  // ---- segment dedup vs reference -----------------------------------

  test("segment dedup reassembly == first-occurrence reference on random corpora") {
    val rnd = new Random(23)
    for (trial <- 1 to 4) {
      val docs = (1L to 20L).map(id =>
        id -> (1 to 3 + rnd.nextInt(8)).map(_ => s"s${rnd.nextInt(9)}"))
      // reference: first occurrence of each segment text wins
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.map { case (id, segs) =>
        id -> segs.filter(s => seen.add(s)).mkString(" ")
      }.toMap
      val segDf = docs.flatMap { case (id, segs) =>
        segs.zipWithIndex.map { case (s, i) => (id, i, s) }
      }.toDF("id", "chunk_idx", "chunk_text")
      val got = SegmentDedup.reassemble(SegmentDedup.keepFirst(segDf))
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  // ---- fixed-point PageRank vs reference ----------------------------

  test("fixed-point PageRank == reference rounds on random graphs") {
    val rnd = new Random(37)
    val S = 1000000L
    for (trial <- 1 to 4) {
      val edges = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter(e => e._1 != e._2).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var rank = nodes.map(_ -> S).toMap
      for (_ <- 1 to 2) {
        val inr = scala.collection.mutable.Map[Long, Long]()
        edges.foreach { case (u, v) =>
          inr(v) = inr.getOrElse(v, 0L) + rank(u) / deg(u)
        }
        rank = nodes.map(n => n -> (S * 3 / 20 + 17 * inr.getOrElse(n, 0L) / 20)).toMap
      }
      val df = RankPropagation.fixedPointPageRank(edges.toDF("src", "dst"), 2, S)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      df.unpersist()
      assert(got == rank, s"trial $trial: $edges")
    }
  }

  // ---- hash-routed split and sharding vs md5 reference ---------------

  test("splitAssign and shard routing match an independent md5 reference") {
    val ids = (1L to 400L)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val thr = Sampling.splitThresholds(splits)
    val expSplit = ids.map { id =>
      val h = refHash60(s"7:$id")
      id -> (if (h < thr(0)) "train" else if (h < thr(1)) "val" else "test")
    }.toMap
    val gotSplit = Sampling.splitAssign(ids.toDF("id"), "id", splits, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotSplit == expSplit)
    val expShard = ids.map(id => id -> (refHash60(s"3:$id") % 8).toInt).toMap
    val gotShard = ShuffleShard.assign(ids.toDF("id"), "id", 8, seed = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotShard == expShard)
  }
}
