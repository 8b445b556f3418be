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
}
