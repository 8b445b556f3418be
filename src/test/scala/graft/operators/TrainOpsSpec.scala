package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 training-data curation operators: two-phase sequence packing
  * vs the single-window definition, TF-IDF ranking, contamination
  * overlap vs brute force, quality-rule semantics. */
class TrainOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "trainops-test")

  test("Chunker: windows cover every token exactly once outside overlaps") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 150).map(i => s"t$i").mkString(" ")), // 3 chunks at 64/16
      (2L, (1 to 64).map(i => s"s$i").mkString(" ")),  // exactly one window
      (3L, (1 to 65).map(i => s"u$i").mkString(" ")),  // one token past -> 2 chunks
      (4L, "tiny doc"),                                 // shorter than a window
      (5L, ""),                                         // degenerate: one "" token
      (6L, null.asInstanceOf[String])                   // null == empty, never dropped
    ).toDF("doc_id", "text")
    val chunks = Chunker.chunk(docs, "doc_id", "text", 64, 16)
      .orderBy(col("id"), col("chunk_idx")).collect()
    def of(id: Long) = chunks.filter(_.getLong(0) == id)
    // doc 1: n=150, step=48 -> 1 + ceil(86/48) = 3 chunks; sizes 64,64,54
    assert(of(1L).map(_.getAs[Int]("n_tokens")).toSeq == Seq(64, 64, 54))
    // consecutive chunks share exactly the 16-token overlap
    val c1 = of(1L).map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(c1(0).takeRight(16) == c1(1).take(16))
    assert(c1(1).takeRight(16) == c1(2).take(16))
    // dropping each chunk's first 16 tokens (after the first chunk)
    // reconstructs the document exactly
    val rebuilt = c1.head ++ c1.tail.flatMap(_.drop(16))
    assert(rebuilt == (1 to 150).map(i => s"t$i"))
    // exact fit -> one window; one extra token -> a short second window
    assert(of(2L).length == 1 && of(2L).head.getAs[Int]("n_tokens") == 64)
    assert(of(3L).map(_.getAs[Int]("n_tokens")).toSeq == Seq(64, 17))
    assert(of(4L).length == 1 && of(4L).head.getAs[Int]("n_tokens") == 2)
    assert(of(5L).length == 1) // "" tokenizes to one empty token, like split
    assert(of(6L).length == 1) // null text coalesces to "", doc not dropped
    // invalid parameters rejected
    intercept[IllegalArgumentException](Chunker.chunk(docs, "doc_id", "text", 16, 16))
  }

  test("BloomContamination: no false negatives vs exact overlap; deterministic") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (200L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx alpha beta gamma delta epsilon yy"), // shares one 5-gram
      (2L, "one two three four five"),              // shares one 5-gram
      (3L, "totally different words here nothing"), // clean
      (4L, "five four three two one")               // reversed: clean
    ).toDF("doc_id", "text")
    val bits = BloomContamination.buildBits(bench, "text", 5, 4096)
    // 32-bits-per-word contract: the sign half of every word stays clear
    assert(bits.exists(_ != 0L) && bits.forall(w => (w >>> 32) == 0L))
    // filter-build is deterministic
    assert(bits.sameElements(BloomContamination.buildBits(bench, "text", 5, 4096)))
    val flagged = BloomContamination.flagged(corpus, "doc_id", "text", 5, bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided error: every exact overlap is flagged with >= its count
    val exact = Contamination.overlap(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet == Set(1L, 2L))
    exact.foreach { case (id, n) => assert(flagged.getOrElse(id, 0L) >= n) }
    intercept[IllegalArgumentException](
      BloomContamination.buildBits(bench, "text", 5, 1000)) // not a power of 2
  }

  test("BloomContamination.bitsFor: sized filter honors the fpp contract") {
    import spark.implicits._
    // power-of-two sizing, monotone in n, hard cap enforced
    assert(BloomContamination.bitsFor(2000, 1e-4) == 131072)
    assert(BloomContamination.bitsFor(500, 0.01) == 8192)
    assert(BloomContamination.bitsFor(4000, 0.01) > BloomContamination.bitsFor(500, 0.01))
    intercept[IllegalArgumentException](BloomContamination.bitsFor(1L << 40, 1e-9))
    // empirical check (fully deterministic — md5 hashing): 500 disjoint
    // single-word docs probed against a 500-gram filter sized for
    // fpp = 1%; every flagged doc is a false positive
    val bench = (0 until 500).map(i => (i.toLong, s"b$i")).toDF("doc_id", "text")
    val corpus = (0 until 500).map(i => (i.toLong, s"c$i")).toDF("doc_id", "text")
    val bits = BloomContamination.buildBits(bench, "text", 1,
      BloomContamination.bitsFor(500, 0.01))
    val fps = BloomContamination.flagged(corpus, "doc_id", "text", 1, bits).count()
    assert(fps <= 15, s"false-positive count $fps exceeds 3x the 1% contract on 500 probes")
  }

  test("weightedMixture: rate semantics, determinism, shuffle-free plan") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    def run(rates: Map[String, Double], default: Double) =
      Sampling.weightedMixture(docs, "source", "doc_id", rates, default, seed = 7)
    // rate 1 keeps every row of the stratum; rate 0 keeps none
    val kept = run(Map("src0" -> 1.0, "src1" -> 0.0), 0.5).collect()
    assert(kept.count(_.getString(1) == "src0") == 100)
    assert(kept.count(_.getString(1) == "src1") == 0)
    // default rate ~0.5 keeps roughly half of the remaining 200 rows
    val rest = kept.count(r => r.getString(1) == "src2" || r.getString(1) == "src3")
    assert(rest > 60 && rest < 140, s"default-rate keep count $rest implausible")
    // same seed -> identical keep set; keep-decisions independent of corpus size
    val again = run(Map("src0" -> 1.0, "src1" -> 0.0), 0.5).collect()
    assert(kept.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
    val half = Sampling.weightedMixture(docs.filter(col("doc_id") <= 200),
      "source", "doc_id", Map("src0" -> 1.0, "src1" -> 0.0), 0.5, seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(half == kept.map(_.getLong(0)).filter(_ <= 200).toSet)
    // pure filter: no exchange in the plan
    val plan = run(Map("src0" -> 0.5), 0.5).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException](run(Map("src0" -> 1.5), 0.5).collect())
  }

  test("SequencePacker two-phase prefix == single-window cumsum (gapped ids)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // non-contiguous ids exercise uneven blocks
    val rows = (0 until 500).map(i => (i.toLong * 3 + rnd.nextInt(2), 1L + rnd.nextInt(900)))
      .distinctBy(_._1)
    val df = rows.toDF("doc_id", "toks").repartition(7)
    val packed = SequencePacker.pack(df, "doc_id", "toks", budget = 2048, blockSize = 32)
      .select("id", "cum", "bin")
    val naive = df.select(col("doc_id").as("id"),
        sum(col("toks")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        col("toks"))
      .select(col("id"), col("cum"),
        floor((col("cum") - col("toks")) / lit(2048L)).cast("long").as("bin"))
    assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
    // bins are contiguous and (except possibly the last) near-budget
    val stats = SequencePacker.binStats(packed.withColumnRenamed("toks", "weight")
        .join(df.select(col("doc_id").as("id"), col("toks").as("weight")), "id"))
      .orderBy("bin").collect()
    assert(stats.map(_.getLong(0)).toSeq == stats.indices.map(_.toLong))
  }

  test("overlapFraction: share of DISTINCT grams, gate flags the leak not the long doc") {
    import spark.implicits._
    val bench = Seq((100L, "q r s t u v w x")).toDF("doc_id", "text")
    val corpus = Seq(
      // 10 words → 6 distinct 5-grams, 4 of them benchmark grams → 2/3
      (1L, "q r s t u v w x y z"),
      // long doc sharing ONE benchmark gram among many of its own
      (2L, "q r s t u " + (1 to 40).map(i => s"tok$i").mkString(" ")),
      (3L, "nothing shared here at all with anything")).toDF("doc_id", "text")
    val frac = Contamination.overlapFraction(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(frac(1L) == ((6L, 4L, 4.0 / 6)))
    assert(frac(2L)._2 == 1L && frac(2L)._3 < 0.1)
    assert(!frac.contains(3L))
    val flagged = Contamination.flaggedByFraction(
        corpus, bench, "doc_id", "text", 5, minFrac = 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L)) // the leak, not the long doc
  }

  test("packSplit: slices reassemble exactly, every bin holds budget tokens except the last") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1L to 80L).map(i => (i, 1L + rnd.nextInt(50))) :+ (81L, 0L)
    val df = rows.toDF("doc_id", "toks").repartition(5)
    val B = 64L
    val split = SequencePacker.packSplit(df, "doc_id", "toks", B, blockSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // zero-weight docs emit no slices
    assert(!split.exists(_._1 == 81L))
    // per-doc: slices dense from 0, token ranges tile [0, weight)
    split.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (0L until ss.size), s"doc $id")
      assert(sorted.map(_._6).sum == ss.head._2, s"doc $id")
      var off = 0L
      sorted.foreach { s => assert(s._5 == off, s"doc $id"); off += s._6 }
    }
    // per-bin: exactly B tokens in every bin except the last
    val byBin = split.groupBy(_._3).view.mapValues(_.map(_._6).sum).toMap
    val lastBin = byBin.keys.max
    assert(byBin.keys.toSeq.sorted == (0L to lastBin))
    byBin.foreach { case (b, n) =>
      if (b < lastBin) assert(n == B, s"bin $b holds $n") else assert(n <= B)
    }
    // slice 0's bin equals pack()'s start-where-it-begins bin
    val packBins = SequencePacker.pack(df, "doc_id", "toks", B, 16)
      .filter(col("weight") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    split.filter(_._4 == 0L).foreach { s => assert(s._3 == packBins(s._1)) }
  }

  test("SequencePacker: integral div survives ids/cums beyond 2^53; negative ids throw") {
    import spark.implicits._
    // cums reach ~100 * 2^52 ≈ 4.5e17: above 2^53 a double round-trip
    // rounds (cum - weight) to a multiple of its 64-wide ulp, so with
    // budget=2 almost every row would land in the wrong bin under
    // double division — the exact Long answer is the only stable one
    val rows = (0 until 100).map(i => ((1L << 62) + i * 3L, (1L << 52) + 2L * i + 1L))
    val df = rows.toDF("doc_id", "toks").repartition(5)
    val packed = SequencePacker.pack(df, "doc_id", "toks",
        budget = 2L, blockSize = 1L << 20)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("weight"),
        r.getAs[Long]("cum"), r.getAs[Long]("bin")))
    var cum = 0L
    val expected = rows.sortBy(_._1).map { case (id, w) =>
      cum += w
      (id, w, cum, (cum - w) / 2L)
    }
    assert(packed.toSeq == expected)
    val neg = Seq((-1L, 10L)).toDF("doc_id", "toks")
    intercept[Exception] {
      SequencePacker.pack(neg, "doc_id", "toks", budget = 100, blockSize = 16).collect()
    }
  }

  test("lengthBatches: bucket by width, fill batches in id order, dense positions") {
    import spark.implicits._
    val rows = Seq((1L, 5L), (2L, 37L), (3L, 8L), (4L, 40L), (5L, 31L), (6L, 33L))
      .toDF("doc_id", "toks")
    val got = SequencePacker.lengthBatches(rows, "doc_id", "toks",
        bucketWidth = 32L, batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // bucket 0: ids 1,3,5 → batches (1,3),(5); bucket 1: ids 2,4,6 → (2,4),(6)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 1L, 0L, 0L), (3L, 0L, 0L, 1L),
      (4L, 1L, 0L, 1L), (5L, 0L, 1L, 0L), (6L, 1L, 1L, 0L)))
    // partition invariance
    val again = SequencePacker.lengthBatches(rows.repartition(7), "doc_id", "toks", 32L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(again == got.toSet)
    intercept[IllegalArgumentException] {
      SequencePacker.lengthBatches(rows, "doc_id", "toks", 0L, 2)
    }
    // floor semantics: a negative weight lands in bucket -1, matching
    // the engine-portable `//` the oracle uses (truncation would say 0)
    val neg = SequencePacker.lengthBatches(
      Seq((1L, -5L), (2L, 5L)).toDF("doc_id", "toks"), "doc_id", "toks", 32L, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(neg == Map(1L -> -1L, 2L -> 0L))
  }

  test("rarityStats: distinct counts, rarest df, hapax words; wordless docs absent") {
    import spark.implicits._
    val d = Seq((1L, "aa bb"), (2L, "bb cc"), (3L, "bb"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TfIdf.rarityStats(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 1L),  // aa is hapax (df 1), bb df 3
      (2L, 2L, 1L, 1L),  // cc is hapax
      (3L, 1L, 3L, 0L))) // only the ubiquitous bb; doc 4 wordless → no row
  }

  test("TfIdf ranks a document's distinctive term above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common zebra"),
      (2L, "common words here"),
      (3L, "common words there"),
      (4L, "common words everywhere")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .filter(col("id") === 1L).head()
    // 'common' has tf 3 but df 4; 'zebra' tf 1 df 1: 1*4/1 > 3*4/4
    assert(top.getAs[String]("word") == "zebra")
    assert(top.getAs[Double]("score") == 4.0)
  }

  test("Contamination.overlap counts distinct shared n-grams, brute-force checked") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares the 5-gram window
      (2L, "totally different words appear right here")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Contamination.overlap(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L)) // exactly one shared 5-gram, doc 2 absent
  }

  test("gopherPass gates on word count, mean length, distinct ratio, stopwords") {
    import spark.implicits._
    val good = (Seq.tabulate(60)(i => s"word$i") :+ "the").mkString(" ")
    val tooShort = "the tiny doc"
    val degenerate = ("spam " * 60).trim + " the" // distinct ratio ~2/61
    val noStop = Seq.tabulate(60)(i => s"word$i").mkString(" ")
    val df = Seq((1L, good), (2L, tooShort), (3L, degenerate), (4L, noStop))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityRules.gopherPass(TextOps.words(col("text")), Seq("the", "a")).as("pass"))
    val got = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("salted aggregation and join are semantics-preserving under heavy skew") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val rows = (1 to 10000).map(i => ("hot", i.toLong, 1L)) ++
      (1 to 100).map(i => (s"tail_$i", i.toLong + 100000, 2L))
    val df = rows.toDF("k", "id", "v").repartition(8)
    val salted = Salt.saltedSumCount(df, Seq("k"), "v", Seq("id"), saltFactor = 8)
    val plain = df.groupBy("k").agg(
      org.apache.spark.sql.functions.sum("v").as("sum_v"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the hot key's partial stage really does split into multiple groups
    val partials = df.groupBy(col("k"),
        pmod(hash(col("id")), lit(8)).as("s")).count()
      .filter(col("k") === "hot").count()
    assert(partials == 8L)

    val right = (Seq("hot") ++ (1 to 100).map(i => s"tail_$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "attr")
    val sj = Salt.saltedJoin(df, right, Seq("k"), Seq("id"), saltFactor = 8)
    val pj = df.join(right, Seq("k"))
    assert(sj.count() == pj.count())
    assert(sj.except(pj).isEmpty && pj.except(sj).isEmpty)
  }

  test("dupBigramFraction: 0 for all-distinct, high for degenerate repetition") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),
      (2L, ("x y " * 10).trim)).toDF("doc_id", "text")
      .select(col("doc_id"), QualityRules.dupBigramFraction(col("text")).as("f"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) > 0.8) // 19 grams, 2 distinct
  }
}
