package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunker, Sampling}

/** SQL-registry parity for the LLM-pipeline primitives: `chunk_spans`
  * and `mixture_keep` called through `spark.sql` must return exactly
  * what the Scala APIs ([[Chunker.chunk]],
  * [[Sampling.weightedMixture]]) return on the same input. */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.local("4", "sql-parity")
    // suite-shared session: install the extension functions into its
    // registry directly (builder-time extensions can't apply here)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.ExprBridge.installFunctions(
      ext, s.sessionState.functionRegistry)
    s
  }

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "short doc"),
      (3L, null.asInstanceOf[String]),
      (4L, ("tok " * 23).trim) // 23 tokens: exercises a trailing partial chunk
    ).toDF("doc_id", "text")
  }

  test("chunk_spans via spark.sql equals Chunker.chunk") {
    docs.createOrReplaceTempView("parity_docs")
    val sql = spark.sql(
      """SELECT doc_id AS id, s.chunk_idx, s.chunk_text, s.n_tokens
        |FROM parity_docs
        |LATERAL VIEW inline(chunk_spans(text, 5, 2)) s
        |ORDER BY id, chunk_idx""".stripMargin)
    val api = Chunker.chunk(docs, "doc_id", "text", chunkSize = 5, overlap = 2)
      .orderBy("id", "chunk_idx")
    assert(sql.schema == api.schema, s"${sql.schema} vs ${api.schema}")
    assert(sql.collect().toSeq == api.collect().toSeq)
    // the short and null docs still yield exactly one chunk each
    assert(sql.filter(col("id").isin(2L, 3L)).count() == 2)
  }

  test("mixture_keep via spark.sql equals Sampling.weightedMixture") {
    import spark.implicits._
    val corpus = (0L until 500L).map(i =>
      (i, if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "forum"))
      .toDF("doc_id", "domain")
    corpus.createOrReplaceTempView("parity_corpus")
    val sql = spark.sql(
      """SELECT doc_id, domain FROM parity_corpus
        |WHERE mixture_keep(42, doc_id,
        |  CASE domain WHEN 'web' THEN 0.25d WHEN 'code' THEN 0.9d ELSE 0.5d END)
        |ORDER BY doc_id""".stripMargin)
    val api = Sampling.weightedMixture(corpus, "domain", "doc_id",
        rates = Map("web" -> 0.25, "code" -> 0.9), defaultRate = 0.5, seed = 42)
      .orderBy("doc_id")
    assert(sql.collect().toSeq == api.collect().toSeq)
    assert(sql.count() > 0) // the sample is non-degenerate
  }

  test("mixture_keep rejects an out-of-range literal rate like the Scala API") {
    docs.createOrReplaceTempView("parity_docs")
    // past 1.0 the 2^60 threshold saturates and every row is silently
    // kept — the registry must fail as loudly as weightedMixture's require
    val e = intercept[Exception](
      spark.sql("SELECT doc_id FROM parity_docs WHERE mixture_keep(42, doc_id, 1.5d)")
        .collect())
    assert(e.getMessage.contains("[0, 1]"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT doc_id FROM parity_docs WHERE mixture_keep(42, doc_id, -0.1d)")
        .collect())
    assert(e2.getMessage.contains("[0, 1]"), e2.getMessage)
    // the real-world form is NON-foldable (CASE over the stratum
    // column) — the guard must also fire per row at runtime
    val e3 = intercept[Exception](
      spark.sql(
        """SELECT doc_id FROM parity_docs
          |WHERE mixture_keep(42, doc_id,
          |  CASE WHEN doc_id > 2 THEN 1.5d ELSE 0.5d END)""".stripMargin)
        .collect())
    assert(e3.getMessage.contains("[0, 1]"), e3.getMessage)
    // an in-range non-foldable rate still works (no spurious raise)
    assert(spark.sql(
      """SELECT doc_id FROM parity_docs
        |WHERE mixture_keep(42, doc_id,
        |  CASE WHEN doc_id > 2 THEN 1.0d ELSE 0.0d END)""".stripMargin)
      .count() >= 0)
  }

  test("bloom_might_contain via spark.sql equals BloomContamination.flagged") {
    import spark.implicits._
    import graft.operators.BloomContamination
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")).toDF("bid", "text")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma delta inside the doc"), // contaminated
      (2L, "totally clean document with its own unique phrasing here"),
      (3L, "two three four five trailing text"),                      // contaminated
      (4L, "short"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bits = BloomContamination.buildBits(bench, "text", n = 3,
      mBits = BloomContamination.bitsFor(16, 0.01))
    corpus.createOrReplaceTempView("parity_bloom")
    val bitsSql = bits.mkString("array(", "L,", "L)")
    val sql = spark.sql(
      s"""SELECT id, count(1) AS n_maybe FROM (
         |  SELECT doc_id AS id, explode(word_shingles(text, 3)) AS gram
         |  FROM parity_bloom)
         |WHERE bloom_might_contain($bitsSql, gram)
         |GROUP BY id ORDER BY id""".stripMargin)
    val api = BloomContamination.flagged(corpus, "doc_id", "text", 3, bits)
      .orderBy("id")
    assert(sql.schema.fieldNames.toSeq == api.schema.fieldNames.toSeq)
    assert(sql.collect().toSeq == api.collect().toSeq)
    // no false negatives: both contaminated docs are flagged
    val flaggedIds = sql.collect().map(_.getLong(0)).toSet
    assert(Set(1L, 3L).subsetOf(flaggedIds), s"missed contamination: $flaggedIds")
    // every benchmark gram must probe positive through the SQL form
    bench.createOrReplaceTempView("parity_bench")
    val misses = spark.sql(
      s"""SELECT gram FROM (
         |  SELECT explode(word_shingles(text, 3)) AS gram FROM parity_bench)
         |WHERE NOT bloom_might_contain($bitsSql, gram)""".stripMargin).count()
    assert(misses == 0)
  }

  test("winnow_fps via spark.sql equals Winnowing.fingerprintSet") {
    import graft.operators.Winnowing
    docs.createOrReplaceTempView("parity_docs")
    val sql = spark.sql(
      """SELECT doc_id AS id, fp
        |FROM parity_docs
        |LATERAL VIEW explode(winnow_fps(text, 3, 4)) AS fp
        |ORDER BY id, fp""".stripMargin)
    val api = Winnowing.fingerprintTable(docs, "doc_id", "text", 3, 4)
      .orderBy("id", "fp")
    assert(sql.schema == api.schema, s"${sql.schema} vs ${api.schema}")
    assert(sql.collect().toSeq == api.collect().toSeq)
    assert(sql.count() > 0)
    // degenerate windows: the two-token doc has no 3-gram → no row;
    // null text → no row — both engines drop them identically
    assert(sql.filter(col("id").isin(2L, 3L)).count() == 0)
  }

  test("cdc_starts via spark.sql rebuilds Chunker.contentDefined exactly") {
    import graft.operators.Chunker
    docs.createOrReplaceTempView("parity_docs")
    // the primitive exposes boundary starts; ends derive in plain SQL
    // (next start, else n+1) — a SQL user can chunk content-defined
    // without the Scala API
    val sql = spark.sql(
      """WITH t AS (SELECT doc_id,
        |    split(trim(lower(coalesce(text, ''))), '\\s+') AS w,
        |    cdc_starts(text, 4) AS st
        |  FROM parity_docs)
        |SELECT doc_id AS id, pos AS chunk_idx,
        |  concat_ws(' ', slice(w, s, coalesce(get(st, pos + 1), size(w) + 1) - s))
        |    AS chunk_text,
        |  coalesce(get(st, pos + 1), size(w) + 1) - s AS n_tokens
        |FROM t LATERAL VIEW posexplode(st) AS pos, s
        |ORDER BY id, chunk_idx""".stripMargin)
    val api = Chunker.contentDefined(docs, "doc_id", "text", divisor = 4)
      .orderBy("id", "chunk_idx")
    assert(sql.schema == api.schema, s"${sql.schema} vs ${api.schema}")
    assert(sql.collect().toSeq == api.collect().toSeq)
    // null-text row survives as one empty chunk in both forms
    assert(sql.filter(col("id") === 3L).count() == 1)
  }

  test("bpe_merge via spark.sql equals BpeTrainer.applyMerge, chained") {
    import graft.operators.BpeTrainer
    import spark.implicits._
    val words = Seq("abab", "aaab", "aaaa", "cab", "a", "")
      .toDF("word").as("w")
    words.createOrReplaceTempView("parity_words")
    // two chained merges: (a,b) then (ab,ab)
    val sql = spark.sql(
      """SELECT word, bpe_merge(bpe_merge(
        |  CASE WHEN length(word) = 0 THEN CAST(array() AS ARRAY<STRING>)
        |       ELSE split(word, '(?!^)(?=.)') END,
        |  'a', 'b'), 'ab', 'ab') AS syms
        |FROM parity_words ORDER BY word""".stripMargin)
    val api = words.select(col("word"),
      BpeTrainer.applyMerge(
        BpeTrainer.applyMerge(BpeTrainer.chars(col("word")), "a", "b"),
        "ab", "ab").as("syms"))
      .orderBy("word")
    assert(sql.schema == api.schema, s"${sql.schema} vs ${api.schema}")
    assert(sql.collect().toSeq == api.collect().toSeq)
    // non-literal pair rejected loudly
    val e = intercept[Exception](
      spark.sql("SELECT bpe_merge(array('a'), word, 'b') FROM parity_words")
        .collect())
    assert(e.getMessage.contains("string literal"), e.getMessage)
  }

  test("SQL face of the recursion surface: native WITH RECURSIVE equals Hierarchy.ancestors") {
    // warehouse users arriving from CONNECT BY / recursive CTEs reach
    // for SQL first — Spark 4.1's native recursive CTE (UnionLoop) IS
    // that face, and its UNION semantics must agree with the
    // operator's distinct-per-depth closure on a shared-path DAG
    import spark.implicits._
    val edges = Seq(("a", "l"), ("a", "r"), ("l", "t"), ("r", "t"), ("t", "z"))
      .toDF("child", "parent")
    edges.createOrReplaceTempView("parity_edges")
    // Spark 4.1 recursion accepts UNION ALL only (UNION dedup inside
    // the loop is not yet supported) — the closure dedups at the outer
    // SELECT DISTINCT instead. Note the operator's per-depth distinct
    // ALSO bounds frontier growth during the recursion, which UNION
    // ALL cannot (path multiplicity explodes on dense DAGs) — the
    // reason Hierarchy.ancestors stays the scale face.
    val sql = spark.sql(
      """WITH RECURSIVE cl(node, ancestor, depth) AS (
        | SELECT child, parent, 1 FROM parity_edges
        | UNION ALL
        | SELECT cl.node, e.parent, cl.depth + 1
        | FROM cl JOIN parity_edges e ON cl.ancestor = e.child)
        |SELECT DISTINCT node, ancestor, depth FROM cl""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val api = graft.operators.Hierarchy.ancestors(edges, "child", "parent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(sql == api)
    assert(api.contains(("a", "z", 3))) // the shared-path DAG really recursed
  }

  test("chunk_spans rejects non-literal sizes and bad windows loudly") {
    docs.createOrReplaceTempView("parity_docs")
    val e1 = intercept[Exception](
      spark.sql("SELECT chunk_spans(text, CAST(doc_id AS INT), 0) FROM parity_docs")
        .collect())
    assert(e1.getMessage.contains("integer literal"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT chunk_spans(text, 5, 5) FROM parity_docs").collect())
    assert(e2.getMessage.contains("overlap"), e2.getMessage)
  }
}
