package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exact set-similarity self-join via prefix filtering (the classic
  * AllPairs/PPJoin bound — Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08), over word-n-gram shingle sets.
  *
  * A naive shared-shingle join explodes on high-frequency shingles
  * (df² candidate pairs per shingle). Prefix filtering keeps the result
  * EXACT while indexing only each document's `|d| − ⌈t·|d|⌉ + 1`
  * globally-rarest shingles (rarity = ascending document frequency):
  * any pair with Jaccard ≥ t must share at least one prefix shingle,
  * so joining prefixes finds every qualifying pair, and the skewed
  * high-df shingles drop out of the index entirely. A length filter
  * (`t·max(|a|,|b|) ≤ min(|a|,|b|)`) prunes further before
  * verification; candidates are then verified with an exact
  * `array_intersect` Jaccard.
  *
  * Scale shape: one df-count shuffle over (doc, shingle), one window
  * sort per doc, a join whose input is only rare prefix entries, and a
  * verify join on the surviving candidates.
  */
object SetSimilarityJoin {

  /** All pairs (id_a < id_b) with shingle-Jaccard ≥ threshold.
    * Returns (id_a, id_b, jaccard) — exactly the brute-force result.
    *
    * Dedup-first like [[MinHashLSH]]: identical shingle sets collapse to
    * one representative before the prefix index is built — exact copies
    * share every prefix shingle, so a 10⁶-copy boilerplate group would
    * otherwise put 10⁶ entries in each of its prefix postings and
    * explode the candidate join; post-dedup it contributes one. Verified
    * representative pairs expand back via [[PairExpansion]] (identical
    * sets ⇒ identical jaccard), so the output is unchanged. */
  def jaccardSelfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double): DataFrame = {
    val g0 = TextOps.shingleTable(docs, idCol, textCol, shingleN).cache()
    val groups = MinHashLSH.contentGroups(g0).cache()
    val g = g0.join(groups.filter(col("id") === col("rep")).select(col("id")),
        Seq("id"), "left_semi")
      .withColumn("sz", size(col("grams")))
      .cache()
    val ex = g.select(col("id"), col("sz"), explode(col("grams")).as("gram"))
    val dfreq = ex.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    // per-doc prefix selection via hash-agg + in-row sort: collect the
    // (df, gram) pairs per doc, array_sort (struct order = df asc, gram
    // asc — deterministic, grams are distinct within a doc), slice the
    // |d| − ⌈t·|d|⌉ + 1 rarest. Same selection a row_number window
    // yields, without the partition-wide sort of the exploded corpus —
    // per-doc widths are bounded by document length, so the agg buffers
    // stay small at any corpus size.
    // cached: both self-join branches traverse it, and exchange reuse
    // does not apply across the aliased branches
    val prefix = ex.join(dfreq, "gram")
      .groupBy(col("id"))
      .agg(first(col("sz")).as("sz"),
        array_sort(collect_list(struct(col("df"), col("gram")))).as("dfg"))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))
      .select(col("id"), col("sz"),
        explode(expr("transform(slice(dfg, 1, plen), x -> x.gram)")).as("gram"))
      .cache()
    val a = prefix.select(col("gram"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("gram"), col("id").as("id_b"), col("sz").as("sz_b"))
    val cand = a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .filter(lit(threshold) * greatest(col("sz_a"), col("sz_b")) <=
        least(col("sz_a"), col("sz_b")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val ga = g.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val gb = g.select(col("id").as("id_b"), col("grams").as("grams_b"))
    val repPairs = cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    PairExpansion.expand(groups, repPairs, "jaccard", lit(1.0))
  }
}
