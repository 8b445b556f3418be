package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for pipeline runs that must be reproducible
  * (and auditable) across engines, runs, and cluster sizes — the
  * property `ORDER BY rand() LIMIT k` lacks.
  *
  * Both forms rank rows by the portable md5-derived
  * [[TextOps.hexHash60]] of the row id: a uniform pseudo-random order
  * that every engine computes identically. Bottom-k by hash is the
  * classic KMV construction — mergeable (bottom-k of a union is the
  * bottom-k of merged per-partition bottom-k's, which is exactly what
  * Spark's TakeOrderedAndProject computes: no full sort, no full
  * shuffle, O(k) state per partition).
  */
object Sampling {

  /** The k rows with the smallest id-hash. Adds `sample_rank` (1-based). */
  def bottomK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    val h = TextOps.hexHash60(col(idCol).cast("string"))
    // window over a single ordered partition would serialize; orderBy +
    // limit lets Spark take per-partition top-k and merge k·P rows
    df.withColumn("sample_h", h)
      .orderBy(col("sample_h"), col(idCol))
      .limit(k)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("sample_h"), col(idCol))))
      .drop("sample_h")
  }

  /** Per-group deterministic sample of k rows (stratified): hash-rank
    * within each group partition — one shuffle on the group key. */
  def stratified(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    val h = TextOps.hexHash60(col(idCol).cast("string"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("sample_h"), col(idCol))
    df.withColumn("sample_h", h)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("sample_h")
  }
}
