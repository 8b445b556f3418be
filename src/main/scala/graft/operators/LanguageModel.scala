package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical n-gram language-model quality scoring (LLM-pipeline op):
  * the CCNet/KenLM-style filter — train a bigram model on a reference
  * corpus, score each candidate document by its mean in-model bigram
  * probability, and gate ingestion on the score (gibberish, boilerplate
  * markup, and wrong-language text all score low against an in-domain
  * model). Probabilities are add-one (Laplace) smoothed:
  * p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V), V the training vocabulary
  * size — so out-of-model bigrams score small but non-zero and the mean
  * stays defined for every document.
  *
  * Mean-of-probabilities rather than the classic mean-log-likelihood:
  * ln() rounds differently across engines' libm (the [[TfIdf]]
  * precedent), while each p here is ONE IEEE double division and the
  * per-document sum is a FIXED left fold over the position-ordered
  * probability array — bit-identical to DuckDB's `list_reduce`. The
  * score orders documents by in-model mass either way; the contract is
  * declared as the mean probability.
  *
  * Scale shape: counts are map-side-combinable aggregates keyed on the
  * bigram/history (vocabulary-sized, not corpus-sized); the score pass
  * joins the exploded candidate bigrams to both count tables
  * shuffle-hash (a corpus-wide vocabulary must never be broadcast-
  * guessed); V rides as a broadcast scalar. The per-document fold is
  * one grouped collect of (pos, p) pairs — document-length bounded —
  * sorted in-row, never a partition-wide window sort. Nothing is
  * collected to the driver.
  */
object LanguageModel {

  /** (id, pos, w1, w2) — one row per adjacent token pair, pos the
    * 0-based bigram position. Documents with fewer than two tokens
    * contribute nothing (and score as absent downstream). */
  def bigramTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), TextOps.words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("id"),
        posexplode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as(Seq("pos", "bg")))
      .select(col("id"), col("pos"), col("bg.w1"), col("bg.w2"))

  /** A frozen bigram model: the two count tables and the vocabulary
    * scalar. [[trainModel]] returns them cached and materialized so N
    * scoring passes (incremental batches, a long-running stream) cost
    * batch-sized work only; the caller owns the lifetime —
    * [[release]] when done. */
  final case class BigramModel(c2: DataFrame, c1: DataFrame, v: DataFrame) {
    def release(): Unit = { c2.unpersist(); c1.unpersist(); v.unpersist() }
  }

  /** One corpus-sized pass → cached model tables (the
    * [[graft.operators.MinHashLSH.buildIndex]] discipline: eager
    * materialize, unpersist everything on failure). */
  def trainModel(train: DataFrame, idCol: String, textCol: String): BigramModel = {
    val (c2, c1, v) = modelTables(train, idCol, textCol)
    val m = BigramModel(c2.cache(), c1.cache(), v.cache())
    try { m.c2.count(); m.c1.count(); m.v.count(); m }
    catch { case t: Throwable => m.release(); throw t }
  }

  /** The model tables as a lazy plan (uncached — [[bigramScore]]'s
    * one-shot path; [[trainModel]] adds the caching). */
  private def modelTables(
      train: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val p = train.sparkSession.sessionState.conf.numShufflePartitions
    // rebalance BEFORE the CPU-heavy shred (the shingleTable
    // convention): a few-large-files corpus would otherwise tokenize
    // on as many cores as it has files
    val tbg = bigramTable(train.repartition(p), idCol, textCol)
    val c2 = tbg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // history counts are the per-w1 sums of c2 — derived, not
    // re-aggregated from tbg, so the two model tables share one
    // corpus-sized shred + exchange instead of shredding twice
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // V intentionally scans words (not c2's w1 ∪ w2): single-token
    // documents contribute vocabulary but no bigram
    val v = train
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .agg(countDistinct(col("word")).as("v"))
    (c2, c1, v)
  }

  /** Score `docs` against a frozen [[BigramModel]]:
    * (id, n_bigrams, sum_p, mean_p) — batch-sized work per call. */
  def scoreWith(
      model: BigramModel, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    bigramTable(docs.repartition(p), idCol, textCol)
      // left joins: a candidate bigram absent from the model must keep
      // its row (c2 → 0), not silently shorten the document
      .join(model.c2.hint("shuffle_hash"), Seq("w1", "w2"), "left")
      .join(model.c1.hint("shuffle_hash"), Seq("w1"), "left")
      .crossJoin(broadcast(model.v))
      .withColumn("p",
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("p"))).as("ps"))
      // collect_list order is partition-dependent; the in-row sort on
      // the unique pos restores the positional fold order
      .select(col("id"),
        transform(array_sort(col("ps")), s => s.getField("p")).as("ps"))
      .select(col("id"),
        size(col("ps")).cast("long").as("n_bigrams"),
        aggregate(col("ps"), lit(0.0), (acc, x) => acc + x).as("sum_p"))
      .withColumn("mean_p", col("sum_p") / col("n_bigrams"))
  }

  /** One-shot train + score as a single lazy plan (nothing cached —
    * the oracle-friendly shape): (id, n_bigrams, sum_p, mean_p).
    * Pass the same DataFrame for self-scoring. */
  def bigramScore(
      train: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (c2, c1, v) = modelTables(train, idCol, textCol)
    scoreWith(BigramModel(c2, c1, v), docs, idCol, textCol)
  }
}
