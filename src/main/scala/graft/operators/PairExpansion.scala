package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared expansion step for dedup-first pair detectors ([[MinHashLSH]],
  * [[SimHash]], [[SetSimilarityJoin]]): pair search runs over one
  * REPRESENTATIVE per identical-content group (bounding the candidate
  * space by distinct content), and verified representative pairs expand
  * back to the full member-pair list here.
  *
  * Cross-group pairs inherit their representatives' score — members
  * share their representative's content exactly, so any pairwise score
  * that depends only on content is unchanged. Within-group pairs get
  * `selfScore` (Jaccard 1.0, Hamming 0, …). Both joins are bounded by
  * the OUTPUT size; the quadratic lives only where the requested output
  * is itself quadratic.
  */
object PairExpansion {

  /** `groups`: (id, rep); `repPairs`: (id_a, id_b, <scoreCol>) with both
    * ids representatives. Returns (id_a < id_b, <scoreCol>) over all
    * members. */
  def expand(
      groups: DataFrame, repPairs: DataFrame,
      scoreCol: String, selfScore: Column): DataFrame = {
    val mA = groups.select(col("rep").as("id_a"), col("id").as("m_a"))
    val mB = groups.select(col("rep").as("id_b"), col("id").as("m_b"))
    val cross = repPairs.join(mA, "id_a").join(mB, "id_b")
      .select(least(col("m_a"), col("m_b")).as("id_a"),
        greatest(col("m_a"), col("m_b")).as("id_b"), col(scoreCol))
    val within = groups.select(col("rep"), col("id").as("m_a"))
      .join(groups.select(col("rep"), col("id").as("m_b")), "rep")
      .filter(col("m_a") < col("m_b"))
      .select(col("m_a").as("id_a"), col("m_b").as("id_b"),
        selfScore.as(scoreCol))
    cross.unionByName(within)
  }

  /** Star edge list for clustering instead of pair expansion:
    * member→representative edges plus the representative pairs — linear
    * in corpus size, identical connected components. */
  def edges(groups: DataFrame, repPairs: DataFrame): DataFrame =
    groups.filter(col("id") =!= col("rep"))
      .select(col("id").as("src"), col("rep").as("dst"))
      .unionByName(repPairs.select(col("id_a").as("src"), col("id_b").as("dst")))
}
