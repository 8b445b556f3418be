package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (LLM-pipeline op): how many
  * distinct word n-grams each training document shares with an
  * evaluation/benchmark set — the standard "n-gram overlap" test-set
  * decontamination check (the 13-gram rule of GPT-3-style pipelines,
  * parameterized here).
  *
  * Scale shape: the benchmark is small by construction (eval sets are
  * thousands of documents, the corpus is billions), so its distinct
  * gram set broadcasts; the corpus side is one explode + broadcast-semi
  * shape with a map-side-combinable count — a single corpus shuffle on
  * doc id, no gram-keyed corpus shuffle at all. If the benchmark ever
  * outgrew broadcast, drop the hint and the same plan shuffles both
  * sides on gram.
  */
object Contamination {

  /** (id, n_overlap) for corpus documents sharing ≥1 distinct n-gram
    * with the benchmark; n_overlap counts the document's DISTINCT
    * overlapping grams. */
  def overlap(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val cg = corpus.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("gram"))
    val bg = bench.select(explode(TextOps.shingles(col(textCol), n)).as("gram"))
      .distinct()
    cg.join(broadcast(bg), "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Fraction-based contamination report — the GPT-3/PaLM rule gates
    * on the SHARE of a document's n-grams that appear in the
    * benchmark, not the raw count (a long document trivially shares a
    * few grams; a short one sharing most of itself IS the benchmark
    * leak): (id, n_grams, n_overlap, frac) with both counts over the
    * document's DISTINCT grams and frac their single IEEE division
    * (engine-portable). Documents with fewer than `n` words carry no
    * grams and emit no row. Same broadcast-semi scale shape as
    * [[overlap]]: one corpus explode, bench grams broadcast, one
    * doc-keyed combinable aggregate. */
  def overlapFraction(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = corpus.select(col(idCol).as("id"),
        array_distinct(TextOps.shingles(col(textCol), n)).as("grams"))
      .filter(size(col("grams")) > 0)
    val cg = grams.select(col("id"),
      size(col("grams")).cast("long").as("n_grams"),
      explode(col("grams")).as("gram"))
    val bg = bench.select(explode(TextOps.shingles(col(textCol), n)).as("gram"))
      .distinct()
    cg.join(broadcast(bg), Seq("gram"), "left_semi")
      .groupBy(col("id"))
      .agg(first(col("n_grams")).as("n_grams"), count(lit(1)).as("n_overlap"))
      .withColumn("frac", col("n_overlap").cast("double") / col("n_grams"))
  }

  /** The decontamination gate over [[overlapFraction]]: documents whose
    * benchmark-overlap share reaches `minFrac`. */
  def flaggedByFraction(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int, minFrac: Double): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"need minFrac in (0, 1], got $minFrac")
    overlapFraction(corpus, bench, idCol, textCol, n)
      .filter(col("frac") >= minFrac)
  }
}
