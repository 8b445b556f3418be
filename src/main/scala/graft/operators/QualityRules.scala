package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021 §A1.1, public
  * heuristics) and intra-document repetition metrics — the rule-based
  * filter pass every crawl pipeline runs before model-based scoring.
  *
  * Everything is a pure per-row Catalyst expression over the tokenized
  * word array (bound once — same lambda-binding trick as
  * [[TextOps.wordNGrams]]), so the filter runs inside whole-stage
  * codegen at scan speed.
  */
object QualityRules {

  /** Mean word length over the word array. */
  def meanWordLen(words: Column): Column =
    aggregate(words, lit(0L), (a, w) => a + length(w)).cast("double") / size(words)

  /** Distinct-word fraction (1.0 = no repeated word). */
  def distinctRatio(words: Column): Column =
    size(array_distinct(words)).cast("double") / size(words)

  /** Word-level 2-gram repetition: fraction of 2-gram OCCURRENCES that
    * are repeats of an earlier occurrence — (n − distinct) / n. The
    * Gopher duplicate-n-gram family; high values flag boilerplate /
    * degenerate repetition. */
  def dupBigramFraction(text: Column): Column = {
    val grams = TextOps.wordNGrams(text, 2)
    when(size(grams) <= 0, lit(0.0)).otherwise(
      (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
  }

  /** The Gopher gate, parameterized: word count in [minWords, maxWords],
    * mean word length in [minMean, maxMean], distinct ratio above
    * minDistinct, and at least one stopword from `stops`. */
  def gopherPass(
      words: Column,
      stops: Seq[String],
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMean: Double = 2.0,
      maxMean: Double = 10.0,
      minDistinct: Double = 0.2): Column = {
    val n = size(words)
    val m = meanWordLen(words)
    (n >= minWords) && (n <= maxWords) &&
      (m >= minMean) && (m <= maxMean) &&
      (distinctRatio(words) > minDistinct) &&
      arrays_overlap(words, array(stops.map(lit): _*))
  }
}
