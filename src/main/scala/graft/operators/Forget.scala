package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten (opt-out) propagation across a table family.
  *
  * A data platform holding user-derived content must be able to take a
  * subject-key list (GDPR erasure requests, an opt-out registry, a
  * takedown list) and (a) report how many rows in each table the list
  * touches and (b) produce the scrubbed tables. The reference's DVT
  * family audits that a migration copied everything; this is the dual —
  * auditing that a deletion removed exactly what it should — and the
  * LLM-curation face is identical (scrub opted-out authors before
  * training-set export).
  *
  * Scale (100 TB):
  *  - The subject list is tiny next to the data (thousands–millions of
  *    keys vs billions of rows): `broadcastKeys = true` turns every
  *    audit/scrub into a broadcast hash join — one scan per table, no
  *    shuffle of the fact side at all.
  *  - Cascaded sets (e.g. the order keys of forgotten customers) grow
  *    with the data, so the cascade steps take `broadcastKeys = false`:
  *    a plain keyed anti/left join, one hash exchange on the key.
  *  - `audit` is a single combinable aggregate per table (count + count
  *    of matches in the same pass — never two scans), and the report is
  *    a union of one-row frames, so the whole family is one action.
  *
  * Null semantics: an erasure list identifies concrete subjects, so a
  * row with a NULL key can never match one — `scrub` retains it and
  * `audit` counts it as retained. Callers who must treat keyless rows
  * as toxic should filter them explicitly first.
  */
object Forget {

  private def keyFrame(forgetKeys: DataFrame): DataFrame = {
    require(forgetKeys.columns.length == 1,
      s"forget-key frame must have exactly one column, got ${forgetKeys.columns.toSeq}")
    forgetKeys.toDF("__forget_key").distinct()
  }

  /** The join below resolves `__forget_key` by NAME against the key
    * frame; a table that already carries a column of that name would
    * make the condition ambiguous (or silently resolve against the
    * wrong side) at analysis time — refuse it up front. */
  private def requireNoReservedColumn(df: DataFrame): Unit =
    require(!df.columns.contains("__forget_key"),
      "table already contains a '__forget_key' column — rename it " +
        "before scrubbing/auditing (the name is reserved for the key join)")

  /** Rows of `df` whose `keyCol` does not appear in `forgetKeys` (a
    * one-column frame). Anti-join; null keys are retained. */
  def scrub(
      df: DataFrame, keyCol: String, forgetKeys: DataFrame,
      broadcastKeys: Boolean = true): DataFrame = {
    requireNoReservedColumn(df)
    val keys = keyFrame(forgetKeys)
    val right = if (broadcastKeys) broadcast(keys) else keys
    df.join(right, col(keyCol) === col("__forget_key"), "left_anti")
  }

  /** Per-table touch report: for each `(tableName, frame, keyCol)`,
    * one row `(table_name, n_rows, n_forgotten, n_retained)`. A left
    * join against the distinct key set matches each row at most once,
    * so `count(matchedKey)` is exactly the forgotten-row count and the
    * whole audit is one scan + one combinable aggregate per table. */
  def audit(
      tables: Seq[(String, DataFrame, String)], forgetKeys: DataFrame,
      broadcastKeys: Boolean = true): DataFrame = {
    require(tables.nonEmpty, "audit needs at least one table")
    val keys = keyFrame(forgetKeys)
    val right = if (broadcastKeys) broadcast(keys) else keys
    tables.map { case (name, df, keyCol) =>
      requireNoReservedColumn(df)
      df.select(col(keyCol).as("__k"))
        .join(right, col("__k") === col("__forget_key"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(col("__forget_key")).as("n_forgotten"))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_forgotten"),
          (col("n_rows") - col("n_forgotten")).as("n_retained"))
    }.reduce(_ unionByName _)
  }
}
