package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-heavy-corpus scale guards: a web-scale corpus carries
  * boilerplate duplicated 10⁶-10⁷ times, and every copy shares every
  * LSH band bucket — the candidate space must be bounded by DISTINCT
  * content, never by copy count. These tests plant a 10⁴-copy cluster
  * (big enough that an all-pairs bucket join would materialize ~5·10⁷
  * candidates per band and time out; small enough for CI) and assert
  * the bounded shapes end-to-end.
  */
@org.scalatest.tags.Slow
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "dedup-scale-test")

  private val Copies = 10000L
  private val boiler =
    "this exact boilerplate paragraph appears verbatim on every page of the crawl again and again"

  private def corpus = {
    import spark.implicits._
    val copies = (1L to Copies).map(i => (i, boiler))
    val distinctDocs = (Copies + 1 to Copies + 50).map(i =>
      (i, s"unique document number $i carrying tokens ${i * 7} ${i * 13} ${i * 29} of its own payload"))
    (copies ++ distinctDocs).toDF("doc_id", "text")
  }

  test("contentGroups collapse 10^4 copies to one representative") {
    val g = MinHashLSH.shingleTable(corpus, "doc_id", "text")
    val groups = MinHashLSH.contentGroups(g).cache()
    assert(groups.count() == Copies + 50)
    assert(groups.filter(col("id") === col("rep")).count() == 51)
    assert(groups.filter(col("rep") === 1L).count() == Copies)
    groups.unpersist()
  }

  test("minhash candidate space is bounded by distinct content, not copy count") {
    val g = MinHashLSH.shingleTable(corpus, "doc_id", "text").cache()
    val groups = MinHashLSH.contentGroups(g)
    val repsG = g.join(groups.filter(col("id") === col("rep")).select(col("id")),
      Seq("id"), "left_semi")
    val sigs = MinHashLSH.signaturesFrom(repsG, 16)
    val banded = MinHashLSH.bandKeys(sigs, 4, 4).cache()
    // 51 reps × 4 bands rows enter the bucket join; candidates ≤ C(51,2)
    assert(banded.count() == 51 * 4)
    assert(MinHashLSH.candidatePairs(banded).count() <= 51L * 50 / 2)
    banded.unpersist(); g.unpersist()
  }

  test("nearDupEdges: linear edge list, one cluster over 10^4 copies") {
    val edges = MinHashLSH.nearDupEdges(corpus, "doc_id", "text", 0.8).cache()
    // the 10^4-copy group contributes exactly copies-1 star edges; the
    // 50 distinct docs share no shingles so no verified rep pair forms
    assert(edges.count() == Copies - 1)
    val comps = ConnectedComponents.components(edges)
    assert(comps.count() == Copies)
    assert(comps.agg(countDistinct(col("comp"))).head.getLong(0) == 1L)
    assert(comps.agg(min(col("comp"))).head.getLong(0) == 1L)
    edges.unpersist()
  }

  test("nearDupClusters: CC never touches the corpus — empty rep-pair graph, one cluster") {
    // the 10^4-copy group forms one cluster with ZERO connected-components
    // edges (no cross-group pair verifies): members label straight off
    // their representative. This is the shape that makes clustering
    // viable at 10^6-10^7 copy multiplicities.
    val clusters = MinHashLSH.nearDupClusters(corpus, "doc_id", "text", 0.8).cache()
    assert(clusters.count() == Copies)
    assert(clusters.agg(countDistinct(col("comp"))).head.getLong(0) == 1L)
    assert(clusters.agg(min(col("comp")), max(col("comp"))).head ==
      org.apache.spark.sql.Row(1L, 1L))
    clusters.unpersist()
  }

  test("simhash pair search groups by value: chunk join sees distinct values only") {
    val sims = SimHash.simhashes(corpus, "doc_id", "text").cache()
    assert(sims.count() == Copies + 50)
    // all copies share one simhash value → 51 distinct values max
    assert(sims.agg(countDistinct(col("simhash"))).head.getLong(0) <= 51L)
    val edges = SimHash.nearEdges(sims).cache()
    // star edges dominate; verified cross-value pairs only between docs
    // within hamming 3 (the distinct docs are far apart)
    assert(edges.count() >= Copies - 1 && edges.count() <= Copies + 60)
    val comps = ConnectedComponents.components(edges)
    assert(comps.filter(col("comp") === 1L).count() >= Copies)
    edges.unpersist(); sims.unpersist()
  }

  test("simhash nearDupClusters mirrors the rep-pair CC shape") {
    val sims = SimHash.simhashes(corpus, "doc_id", "text")
    val clusters = SimHash.nearDupClusters(sims).cache()
    // every copy clusters with doc 1; the distinct docs are far apart in
    // hamming space, so they only appear if some value pair verifies
    assert(clusters.filter(col("comp") === 1L).count() >= Copies)
    // components equal those over the full star+pair edge list
    val viaEdges = ConnectedComponents.components(SimHash.nearEdges(sims))
    assert(clusters.exceptAll(viaEdges.select(col("id"), col("comp"))).count() == 0)
    assert(viaEdges.select(col("id"), col("comp")).exceptAll(clusters).count() == 0)
    clusters.unpersist()
  }

  test("prefix-filter join is dedup-first: copies collapse before the posting index") {
    import spark.implicits._
    val copies = (1L to 1000L).map(i => (i, boiler))
    val distinctDocs = (1001L to 1020L).map(i =>
      (i, s"another unique doc $i with payload ${i * 3} ${i * 11} ${i * 17} entirely its own"))
    val d = (copies ++ distinctDocs).toDF("doc_id", "text")
    val pairs = SetSimilarityJoin.jaccardSelfJoin(d, "doc_id", "text", 3, 0.5).cache()
    // output contract: all C(1000,2) copy pairs at jaccard 1.0, none across
    assert(pairs.count() == 1000L * 999 / 2)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
    pairs.unpersist()
  }

  test("content fingerprint is injective: adjacent grams never blur together") {
    import spark.implicits._
    // Four docs, two classic collision shapes at shingleN=1:
    //  - unseparated concat would merge ("ab c", "a bc") — both "abc";
    //  - any non-whitespace separator S would merge ("a<S>b", "a b") —
    //    the S-joined encodings are byte-identical. '\n' is whitespace,
    //    so the \s+ tokenizer guarantees it never appears inside a gram.
    val d = Seq(
      (1L, "ab c"), (2L, "a bc"), (3L, "a\u0001b"), (4L, "a b")
    ).toDF("doc_id", "text")
    val g = MinHashLSH.shingleTable(d, "doc_id", "text", shingleN = 1)
    val groups = MinHashLSH.contentGroups(g)
    // every doc has distinct content → each is its own representative
    assert(groups.filter(col("id") === col("rep")).count() == 4)
    // and none of them is reported as an exact (jaccard 1.0) duplicate
    val dupes = MinHashLSH.nearDuplicates(d, "doc_id", "text", 1.0,
      k = 16, bands = 4, shingleN = 1)
    assert(dupes.count() == 0)
  }

  test("simhash chunk-bucket cap skips hot buckets and audits them") {
    import spark.implicits._
    // values chosen so chunk 0 (low 16 bits) puts 12 docs in one hot
    // bucket while chunks 1-3 (= i each) separate them, plus two
    // close-value docs
    val hot = (1L to 12L).map(i => (i, (i << 48) | (i << 32) | (i << 16) | 7L))
    val close = Seq((100L, 0x0123456789abcdeFL), (101L, 0x0123456789abcdeEL)) // hamming 1
    val sims = (hot ++ close).toDF("id", "simhash")
    val capped = SimHash.nearPairs(sims, maxDist = 3, maxBucketWidth = 10)
    // hot-bucket candidates were skipped; the close pair still verifies
    // through its unshared chunks (its buckets have width 2)
    val got = capped.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)), got.toString)
    val audit = SimHash.oversizedChunkBuckets(sims, 10).collect()
    assert(audit.length == 1 && audit.head.getAs[Long]("width") == 12L,
      audit.mkString("\n"))
  }

  test("bucket-width cap skips oversized buckets and audits them") {
    import spark.implicits._
    // 40 distinct-content docs that still share one band bucket is the
    // residual risk; emulate with hand-built band rows
    val banded = ((1L to 40L).map(i => (0, "hot", i)) ++ Seq((0, "cold", 41L), (0, "cold", 42L)))
      .toDF("band", "bkey", "id")
    val capped = MinHashLSH.candidatePairs(banded, maxBucketWidth = 10)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((41L, 42L)))
    val audit = MinHashLSH.oversizedBuckets(banded, 10).collect()
    assert(audit.length == 1 && audit.head.getAs[String]("bkey") == "hot"
      && audit.head.getAs[Long]("width") == 40L)
  }
}
