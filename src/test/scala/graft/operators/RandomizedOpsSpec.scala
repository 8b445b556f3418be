package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded randomized checks of the round-2 operators against pure-Scala
  * reference implementations (property-test intent, batched so each
  * case is one Spark job). */
class RandomizedOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "randops-test")

  // ---- connected components vs union-find ---------------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("components == union-find min-label on random graphs") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(60)
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(40, edges)
      val got = ConnectedComponents.components(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (local gate): $edges")
      // the distributed loop must agree with the gated driver-side path
      val gotDist = ConnectedComponents
        .components(edges.toDF("src", "dst"), localEdgeCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expected, s"trial $trial (distributed): $edges")
    }
  }

  test("components accepts non-long integral ids (cast on entry), both paths") {
    import spark.implicits._
    val expected = Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
    def run(cap: Long) = ConnectedComponents
      .components(Seq((1, 2), (2, 3), (5, 6)).toDF("src", "dst"), localEdgeCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1L << 18) == expected) // gated driver path
    assert(run(0) == expected)        // distributed loop
  }

  test("componentsStar == union-find min-label on random graphs") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(60)
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(40, edges)
      val got = ConnectedComponents.componentsStar(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $edges")
    }
  }

  test("componentsStar: path graph converges in O(log n) rounds where hash-to-min needs diameter") {
    import spark.implicits._
    val n = 200L
    val path = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    // diameter 199 ≫ the cap: hash-to-min must fail loudly, not return
    // wrong labels silently (localEdgeCap = 0 forces the distributed
    // loop — the driver-side gate would trivially solve a 199-edge path)
    intercept[IllegalStateException] {
      ConnectedComponents.components(path, maxIter = 10, localEdgeCap = 0)
    }
    // the gated path solves the same long chain exactly
    assert(ConnectedComponents.components(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == (1L to n).map(_ -> 1L).toMap)
    // log2(200) ≈ 7.6; the star algorithm gets a small constant on top
    val got = ConnectedComponents.componentsStar(path, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to n).map(_ -> 1L).toMap)
  }

  // ---- chunker vs pure sliding-window reference ----------------------

  test("bloom decontamination is a superset of exact overlap on random corpora") {
    import spark.implicits._
    val rnd = new Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (trial <- 1 to 3) {
      def doc() = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // tiny vocab + 3-grams => plenty of genuine shared grams per trial
      val bench = (1L to 5L).map(i => (i, doc())).toDF("doc_id", "text")
      val corpus = (10L to 40L).map(i => (i, doc())).toDF("doc_id", "text")
      val bits = BloomContamination.buildBits(bench, "text", 3, 4096)
      val bloom = BloomContamination.flagged(corpus, "doc_id", "text", 3, bits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = Contamination.overlap(corpus, bench, "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(exact.nonEmpty, s"trial $trial degenerate: no exact overlap planted")
      // one-sided error: every exactly-contaminated doc flagged, with a
      // per-doc count at least the exact distinct-gram overlap
      exact.foreach { case (id, n) =>
        assert(bloom.getOrElse(id, 0L) >= n, s"trial $trial doc $id: $n vs ${bloom.get(id)}")
      }
    }
  }

  test("Chunker == pure sliding-window reference across random shapes") {
    import spark.implicits._
    val rnd = new Random(23)
    def refChunks(words: IndexedSeq[String], size: Int, overlap: Int): Seq[(Int, IndexedSeq[String])] = {
      val step = size - overlap
      val n = words.length
      val nChunks = if (n <= size) 1 else 1 + ((n - size) + step - 1) / step
      (0 until nChunks).map(i => i -> words.slice(i * step, i * step + size))
    }
    for (_ <- 1 to 4) {
      val size = 2 + rnd.nextInt(40)
      val overlap = rnd.nextInt(size) // 0 <= overlap < size
      val docs = (1 to 30).map { id =>
        val n = 1 + rnd.nextInt(3 * size)
        (id.toLong, (1 to n).map(j => s"w$j").mkString(" "))
      }
      val got = graft.operators.Chunker
        .chunk(docs.toDF("doc_id", "text"), "doc_id", "text", size, overlap)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getAs[Int]("chunk_idx"))
            .map(r => (r.getAs[Int]("chunk_idx"),
              r.getAs[String]("chunk_text").split(" ").toIndexedSeq,
              r.getAs[Int]("n_tokens")))
            .toSeq
        }
      docs.foreach { case (id, text) =>
        val ref = refChunks(text.split(" ").toIndexedSeq, size, overlap)
        val g = got(id)
        assert(g.map(c => (c._1, c._2)) == ref,
          s"size=$size overlap=$overlap id=$id")
        assert(g.forall(c => c._3 == c._2.length),
          s"n_tokens mismatch at size=$size overlap=$overlap id=$id")
      }
    }
  }

  // ---- upsert vs map semantics --------------------------------------

  // ---- dedup-first detectors vs brute force -------------------------

  private def randomCorpus(rnd: Random, n: Int): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val bases = Seq.fill(5)(Seq.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    (1 to n).map { i =>
      val b = bases(rnd.nextInt(bases.size))
      val t = rnd.nextInt(4) match {
        case 0 => b                          // exact duplicate of a base
        case 1 => b + " " + vocab(rnd.nextInt(vocab.size)) // near-dup
        case _ => Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      (i.toLong, t)
    }
  }

  private def bruteJaccardPairs(
      docs: Seq[(Long, String)], n: Int, t: Double): Set[(Long, Long)] = {
    def shingles(s: String): Set[String] =
      s.trim.toLowerCase.split("\\s+").toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSet
    val g = docs.map { case (id, s) => id -> shingles(s) }.filter(_._2.nonEmpty)
    (for {
      (a, ga) <- g; (b, gb) <- g if a < b
      inter = (ga & gb).size.toDouble
      if inter / (ga.size + gb.size - inter) >= t
    } yield (a, b)).toSet
  }

  test("jaccardSelfJoin (dedup-first prefix filter) == brute force on random dup-heavy corpora") {
    import spark.implicits._
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val docs = randomCorpus(rnd, 40 + rnd.nextInt(40))
      val expected = bruteJaccardPairs(docs, 3, 0.5)
      val got = SetSimilarityJoin.jaccardSelfJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("MinHashLSH.nearDuplicates ⊆ brute force; catches every exact duplicate pair") {
    import spark.implicits._
    val rnd = new Random(29)
    val docs = randomCorpus(rnd, 60)
    // LSH may miss borderline pairs (probabilistic recall) but must never
    // emit a pair below threshold, and identical docs share all bands
    val expected = bruteJaccardPairs(docs, 3, 0.8)
    val exactDups = bruteJaccardPairs(docs, 3, 1.0 - 1e-9)
    val got = MinHashLSH.nearDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(expected), (got -- expected).toString)
    assert(exactDups.subsetOf(got), (exactDups -- got).toString)
  }

  test("TfIdf.topTerms == Scala reference ranking") {
    import spark.implicits._
    val rnd = new Random(31)
    val docs = randomCorpus(rnd, 30)
    val words = docs.map { case (id, s) => id -> s.trim.toLowerCase.split("\\s+").toSeq }
    val n = docs.size
    val tfm = words.map { case (id, ws) => id -> ws.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val dfm = tfm.flatMap(_._2.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = tfm.flatMap { case (id, tfs) =>
      tfs.toSeq.map { case (w, tf) => (id, w, tf * n.toDouble / dfm(w)) }
        .sortBy { case (_, w, sc) => (-sc, w) }.take(2).zipWithIndex
        .map { case ((_, w, _), i) => (id, w, i + 1) }
    }.toSet
    val got = TfIdf.topTerms(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("word"), r.getAs[Int]("rank"))).toSet
    assert(got == expected)
  }

  test("Contamination.overlap == brute-force shingle intersection counts") {
    import spark.implicits._
    val rnd = new Random(37)
    val docs = randomCorpus(rnd, 50)
    val (bench, corpus) = docs.partition(_._1 % 7 == 0)
    def sh(s: String) = s.trim.toLowerCase.split("\\s+").toSeq.sliding(3)
      .filter(_.size == 3).map(_.mkString(" ")).toSet
    val benchSet = bench.flatMap(d => sh(d._2)).toSet
    val expected = corpus.map { case (id, s) => id -> (sh(s) & benchSet).size.toLong }
      .filter(_._2 > 0).toMap
    val got = Contamination.overlap(corpus.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("upsert == map override on random keyed data") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val target = Seq.tabulate(30)(i => (i.toLong, s"t$i")).filter(_ => rnd.nextBoolean())
      val source = Seq.tabulate(35)(i => (i.toLong, s"s$i")).filter(_ => rnd.nextBoolean())
      val expected = (target.toMap ++ source.toMap)
      val got = Upsert.upsert(target.toDF("k", "v"), source.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  // ---- morton code vs bit-twiddled reference ------------------------

  test("zValue == interleaved-bit reference on random coordinates") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new Random(99)
    val coords = Seq.fill(300)((rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val rows = coords.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 10).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 10))
    }
    // z-codes of distinct (x, y) are distinct (bijectivity on the grid)
    assert(rows.map(_.getLong(2)).distinct.length == coords.distinct.length)
  }

  // ---- hash sampling uniformity -------------------------------------

  test("bottom-k hash sample rate matches expectation per stratum") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (if (i % 2 == 0) "even" else "odd", i.toLong))
      .toDF("g", "id")
    val sample = Sampling.bottomK(df, "id", 600).groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash order is independent of parity: expect ~300 ± 5 sigma each
    assert(math.abs(sample("even") - 300) < 60, sample)
    assert(math.abs(sample("odd") - 300) < 60, sample)
  }
}
