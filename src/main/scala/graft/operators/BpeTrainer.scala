package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"), run corpus-scale on Spark: start from characters, and each
  * round (1) count adjacent symbol pairs across the whole corpus
  * weighted by word frequency, (2) pick the most frequent pair with a
  * total tie-break (count desc, then pair lexicographic), (3) merge
  * every leftmost-greedy occurrence of that pair into one symbol.
  * After R rounds the merge list IS the learned tokenizer.
  *
  * Classic BPE trains on the distinct-word frequency table, not raw
  * text — so the heavy per-round work scales with VOCABULARY size, not
  * corpus size: one corpus-wide word count up front, then each round
  * is a map-side-combinable pair-count aggregate over distinct words
  * plus a per-row merge rewrite (no shuffle). The driver holds one
  * (pair, count) row per round — the same iterated-aggregate shape as
  * [[LinearClassifier]] and [[Similarity.kmeansCentroids]], with the
  * same per-round cache discipline (lineage one round deep).
  *
  * The merge rewrite is a single left fold per word
  * ([[applyMerge]]): append each symbol, but when the accumulator ends
  * with `a` and the next symbol is `b`, replace the tail with the
  * merged symbol — exactly leftmost-greedy, including the aab/aaa run
  * cases (a merged tail can never re-match `a`: the merged symbol is
  * strictly longer). Everything is integer counts and exact string
  * ops, so DuckDB replays all R rounds as chained CTEs — the greedy
  * fold becomes the equivalent chain-parity window rule (candidates in
  * consecutive runs merge at even offsets from the run start;
  * equivalence is pinned by BpeTrainerSpec's adversarial cases).
  */
object BpeTrainer {

  /** Corpus word-frequency table: (word, freq). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Characters of a string column as array<string> — empty for the
    * empty string (Spark's sequence(1, 0) DESCENDS rather than being
    * empty, so the guard is load-bearing). */
  def chars(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))))

  /** Character-split start state: (word, freq, syms). */
  def charTable(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"), chars(col("word")).as("syms"))

  /** Corpus-wide adjacent-pair counts over (freq, syms) rows:
    * (a, b, cnt). Every adjacent position counts (overlapping runs
    * included) — the classic BPE counting rule. */
  def pairCounts(state: DataFrame): DataFrame =
    state
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        element_at(transform(array(col("syms")), s =>
          transform(sequence(lit(1), size(s) - 1),
            i => struct(element_at(s, i).as("a"), element_at(s, i + 1).as("b")))), 1))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Leftmost-greedy merge of pair (a, b) in a symbol array: one left
    * fold, O(len²) array rebuilds per row — fine for word-length
    * sequences, per-row and shuffle-free. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** One learned merge: the pair and its corpus-weighted count at
    * selection time. */
  final case class Merge(round: Int, a: String, b: String, cnt: Long)

  /** Deploy the trained tokenizer corpus-wide: per-document token
    * accounting — (id, n_words, n_base, n_syms) with n_base the
    * character count and n_syms the symbol count after all merges.
    *
    * Tokenization happened ONCE, at training: the (word, syms) state
    * is the compiled tokenizer, so deployment is a vocabulary-sized
    * shuffle-hash join of exploded corpus words against per-word
    * symbol counts plus one per-doc aggregate — never a re-fold of
    * the merge list over every corpus occurrence (the fold is
    * higher-order-function work outside whole-stage codegen; re-doing
    * it per occurrence measured ~6× the whole train cost at sf0.1).
    * Words absent from the training vocabulary count 0 symbols (the
    * frozen-model convention, mirrored by the oracle's left join);
    * [[compressionStatsExact]] is the opt-in path that re-folds unseen
    * words through the learned merge chain instead. */
  def compressionStats(
      docs: DataFrame, idCol: String, textCol: String, state: DataFrame): DataFrame = {
    val sizes = state.select(col("word"),
      size(col("syms")).cast("long").as("w_syms"))
    docs
      .select(col(idCol).as("id"), explode(TextOps.words(col(textCol))).as("word"))
      .join(sizes.hint("shuffle_hash"), Seq("word"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_base"),
        sum(coalesce(col("w_syms"), lit(0L))).as("n_syms"))
  }

  /** The learned tokenizer as a column expression: fold the merge list
    * in training order over a word's character split — exactly what
    * training did, so any word (seen or not) tokenizes to the symbols
    * training would have produced for it. The chain is one nested
    * [[applyMerge]] per learned merge, so expression depth grows with
    * the merge-list length — fine for the bounded merge lists trained
    * here; a 32k-merge production vocabulary wants the precompiled
    * (word → syms) state table instead ([[compressionStats]]). */
  def tokenizeExact(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(chars(word))((acc, m) => applyMerge(acc, m.a, m.b))

  /** Opt-in EXACT deployment: like [[compressionStats]] but
    * out-of-vocabulary words re-fold through the learned merge chain
    * instead of counting 0 symbols (the frozen-model default). The
    * fold runs ONCE PER DISTINCT unseen word — never per occurrence
    * (the 6×-measured anti-shape): distinct corpus words anti-join the
    * training vocabulary, the survivors tokenize via
    * [[tokenizeExact]], and the union of both symbol-count tables
    * joins back vocabulary-keyed exactly as the frozen path does. */
  def compressionStatsExact(
      docs: DataFrame, idCol: String, textCol: String, state: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    val known = state.select(col("word"),
      size(col("syms")).cast("long").as("w_syms"))
    val corpus = docs.select(
      col(idCol).as("id"), explode(TextOps.words(col(textCol))).as("word"))
    val unseen = corpus.select(col("word")).distinct()
      .join(known.select(col("word")), Seq("word"), "left_anti")
      .select(col("word"),
        size(tokenizeExact(col("word"), merges)).cast("long").as("w_syms"))
    corpus
      .join(known.unionByName(unseen).hint("shuffle_hash"), Seq("word"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_base"),
        sum(coalesce(col("w_syms"), lit(0L))).as("n_syms"))
  }

  /** Learn `rounds` merges from a word-frequency table. Returns the
    * merge list and the final (word, freq, syms) state. The state is
    * cached per round and materialized so iterative lineage stays one
    * round deep; the RETURNED state is cached — `unpersist()` when
    * consumed. Fails loudly if the corpus has no adjacent pairs left
    * (vocabulary exhausted before `rounds`); on ANY failure the
    * in-flight cached round is released before the throw escapes. */
  def train(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    var state = charTable(words).cache()
    try {
      state.count()
      val merges = (1 to rounds).map { r =>
        val top = pairCounts(state)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        require(top.nonEmpty,
          s"no adjacent pairs left at round $r — corpus exhausted, lower `rounds`")
        val m = Merge(r, top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val next = state.withColumn("syms", applyMerge(col("syms"), m.a, m.b)).cache()
        try next.count()
        catch { case e: Throwable => next.unpersist(); throw e }
        state.unpersist()
        state = next
        m
      }
      (merges, state)
    } catch { case e: Throwable => state.unpersist(); throw e }
  }
}
