package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF term weighting (LLM-pipeline op): per-document top-k
  * salient terms, the workhorse of keyword extraction / topic tagging /
  * near-dup triage over a crawl.
  *
  * Scale shape: one shuffle to (doc, word) term frequencies (map-side
  * combinable), one word-keyed aggregate for document frequencies, one
  * keyed join back (shuffle-hash hinted — the vocabulary is corpus-wide
  * and must not be broadcast-built from the exploded side), one window
  * partitioned by doc for top-k. Nothing is ever collected.
  *
  * The score is `tf · N / df` as one IEEE double division — bit-stable
  * across engines, unlike ln()-based idf whose libm rounding differs
  * (same reason HyperLogLog tables its ln values; here df has too many
  * distinct values to table, so the raw ratio IS the portable choice —
  * it orders terms identically to tf·ln(N/df) within a document when
  * comparing at equal tf only, and we declare the ratio as the scoring
  * contract).
  */
object TfIdf {

  /** (id, word, tf) raw term frequencies. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(TextOps.words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** (word, df) document frequencies from a term-frequency table. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("word")).agg(count(lit(1)).as("df"))

  /** Rare-token novelty stats — the "does this document contain
    * vocabulary nothing else has" screening signal (crawl-dedup
    * triage, contamination triage, glossary/code detection):
    * per document over its DISTINCT words, (id, n_distinct, min_df,
    * n_hapax) where min_df is the rarest word's document frequency
    * and n_hapax counts words appearing in NO other document. All
    * integers — no ratios, no logs. Documents with no non-empty
    * words have no row (they have no vocabulary to be novel in).
    *
    * Scale shape: the tf/df machinery above plus one vocabulary-keyed
    * shuffle-hash join and a per-doc combinable aggregate — the bpe3
    * deployment shape. */
  def rarityStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    tf.join(documentFrequencies(tf).hint("shuffle_hash"), "word")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_distinct"),
        min(col("df")).as("min_df"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
  }

  /** Per-document top-k terms by tf·N/df (ties broken on the word):
    * (id, word, tf, df, score, rank). */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = documentFrequencies(tf)
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df.hint("shuffle_hash"), "word")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("word"))))
      .filter(col("rank") <= k)
      .select(col("id"), col("word"), col("tf"), col("df"),
        col("score"), col("rank").cast("int").as("rank"))
  }
}
