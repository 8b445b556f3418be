package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Text-analysis expressions for LLM training-data pipelines: language
  * identification, quality scoring, token counting, and winnowing-style
  * document fingerprinting.
  *
  * All pure Catalyst expressions — per-row, codegen'd, no UDFs, no
  * shuffles — so they run at scan speed over any corpus size, and every
  * one is mirrored exactly in the DuckDB oracle SQL (portable regex
  * classes, md5-derived hashes, fixed fold orders).
  */
object TextAnalysis {

  /** Tiny built-in stopword profiles (public, frequency-list-derived).
    * Good enough for a deterministic n-gram-style heuristic; real
    * pipelines would load fuller profiles through the same shape. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "du", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  /** Token hits (with repeats) against one profile. */
  def profileScore(text: Column, profile: Seq[String]): Column =
    size(filter(TextOps.words(text),
      w => array_contains(array(profile.map(lit): _*), w)))

  /** Detected language: argmax of profile scores, ties broken by the
    * profile order (alphabetical) via a first-match CASE chain — the
    * same chain the oracle SQL spells out, so results match exactly. */
  def detectLanguage(text: Column): Column = {
    val scores = langProfiles.map { case (l, p) => l -> profileScore(text, p) }
    scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(scores.filter(_._1 != l).map(_._2).map(s >= _).reduce(_ && _), lit(l))
        .otherwise(els)
    }
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(TextOps.words(text))

  /** BPE-ish token count: letters runs (with optional apostrophe
    * suffix), digit runs, and punctuation runs each count as one token
    * (a simplified GPT-2-style pre-tokenizer regex, portable between
    * Java regex and RE2). */
  val bpeTokenPattern = "[A-Za-z]+('[a-z]+)?|[0-9]+|[^A-Za-z0-9\\s]+"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** ~4-chars-per-token estimator (common LLM budgeting heuristic). */
  def tokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Mean token length (left-fold sum, matching list_reduce). */
  def avgWordLen(text: Column): Column = {
    val w = TextOps.words(text)
    aggregate(transform(w, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
      .cast("double") / size(w)
  }

  /** English-stopword token ratio. */
  def stopwordRatio(text: Column): Column = {
    val en = langProfiles.toMap.apply("en")
    profileScore(text, en).cast("double") / size(TextOps.words(text))
  }

  /** Composite quality score in [0,1]: rewards stopword density (real
    * prose has function words), penalizes punctuation density, rewards
    * length up to ~100 words. Fixed op order for oracle parity. */
  def qualityScore(text: Column): Column = {
    val stop = stopwordRatio(text)
    val punct = punctCount(text).cast("double") / length(text)
    val len = least(lit(1.0), tokenCountWs(text).cast("double") / 100.0)
    stop * 0.3 + (lit(1.0) - punct) * 0.3 + len * 0.4
  }

  /** PII-style scrubbing: replace email-like and long-digit-run tokens
    * with placeholders (portable regex classes; real pipelines extend
    * the pattern set the same way). */
  def redact(text: Column): Column = {
    val emails = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(emails, "[0-9]{7,}", "<NUM>")
  }

  /** Winnowing-style bottom-k sketch over character k-grams: hash every
    * k-char window with the portable 60-bit hash, keep the k smallest.
    * Two documents share sketch entries iff they share k-char runs —
    * the classic fingerprint for plagiarism/near-dup detection. */
  def charGramSketch(text: Column, gram: Int = 8, bottomK: Int = 4): Column =
    graft.plans.CharGramSketch(text, gram, bottomK)

  /** Single rolling fingerprint: min over the char-gram hashes
    * (= the bottom-1 sketch). */
  def fingerprint(text: Column, gram: Int = 8): Column =
    element_at(graft.plans.CharGramSketch(text, gram, 1), 1)
}
