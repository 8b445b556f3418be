package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Primary-key / uniqueness validation — the remaining DVT-adjacent
  * audit next to [[RefIntegrity]]: for each declared key, how many key
  * values are claimed by more than one row. A migration that loads a
  * table twice, or applies a changelog without its dedup step, passes
  * count/sum checks on many columns while silently double-keying; this
  * is the post-load audit that catches it.
  *
  * Shape per key: one keyed aggregate over the declared columns
  * (combinable counts), then a key-cardinality-sized re-aggregate; all
  * keys union into one frame, one action. Rows with a NULL in any key
  * column are counted separately (`null_key_rows`) — SQL PRIMARY KEY
  * forbids NULLs while UNIQUE admits them, so the caller, not the
  * audit, decides which discipline applies.
  */
object Uniqueness {

  final case class Key(name: String, df: DataFrame, cols: Seq[String])

  /** (key_name, total_rows, null_key_rows, duplicate_keys, excess_rows,
    * max_multiplicity) per declared key. `excess_rows` is the number of
    * rows a perfect dedup would remove; 0 everywhere = unique. */
  def check(keys: Seq[Key]): DataFrame = {
    require(keys.nonEmpty, "need at least one key to audit")
    keys.map { k =>
      require(k.cols.nonEmpty, s"key ${k.name} declares no columns")
      require(!k.cols.contains("__null_key"),
        s"key ${k.name} uses the reserved column name __null_key")
      val anyNull = k.cols.map(col(_).isNull).reduce(_ || _)
      val perKey = k.df
        .select(k.cols.map(col): _*)
        .withColumn("__null_key", anyNull)
        .groupBy(col("__null_key") +: k.cols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
      finish(k.name, perKey, "__n")
    }.reduce(_ unionByName _)
  }

  /** One declared key audited from a MAINTAINED per-key multiplicity
    * view instead of the table: `counts` holds one row per surviving
    * key value — (cols…, `cntCol`), the
    * [[graft.streaming.StreamingIvm]] aggregate family's (groupCols…,
    * n) shape with the key columns as groups. */
  final case class KeyCounts(name: String, counts: DataFrame,
    cols: Seq[String], cntCol: String = "n")

  /** [[check]] against maintained per-key COUNTS views (round 16 —
    * the incremental-validation wiring): identical output, but the
    * scan is the counts view (one row per DISTINCT key — the
    * aggregate, not the table), and the view itself folds
    * delta-proportionally per CDC batch through the streaming IVM
    * family, so a post-load audit that used to re-aggregate the whole
    * table per run now costs one aggregate-sized pass — and the per-
    * batch maintenance only touches the delta's key buckets.
    * IncrementalValidationSpec pins checkCounts(maintained view) ≡
    * check(full table) after every batch of a CDC sequence. */
  def checkCounts(keys: Seq[KeyCounts]): DataFrame = {
    require(keys.nonEmpty, "need at least one key to audit")
    keys.map { k =>
      require(k.cols.nonEmpty, s"key ${k.name} declares no columns")
      require(!k.cols.contains("__null_key"),
        s"key ${k.name} uses the reserved column name __null_key")
      val anyNull = k.cols.map(col(_).isNull).reduce(_ || _)
      val perKey = k.counts
        .select(k.cols.map(col) :+ col(k.cntCol): _*)
        .withColumn("__null_key", anyNull)
      finish(k.name, perKey, k.cntCol)
    }.reduce(_ unionByName _)
  }

  /** The shared audit aggregate over a per-key multiplicity frame
    * (cols…, __null_key, `cnt`). */
  private def finish(name: String, perKey: DataFrame,
      cnt: String): DataFrame =
    perKey.agg(
        sum(col(cnt)).as("total_rows"),
        sum(when(col("__null_key"), col(cnt)).otherwise(0L)).as("null_key_rows"),
        sum(when(!col("__null_key") && col(cnt) > 1, 1L).otherwise(0L))
          .as("duplicate_keys"),
        sum(when(!col("__null_key") && col(cnt) > 1, col(cnt) - 1)
          .otherwise(0L)).as("excess_rows"),
        max(when(!col("__null_key"), col(cnt)).otherwise(0L))
          .as("max_multiplicity"))
      .select(lit(name).as("key_name"),
        coalesce(col("total_rows"), lit(0L)).as("total_rows"),
        coalesce(col("null_key_rows"), lit(0L)).as("null_key_rows"),
        coalesce(col("duplicate_keys"), lit(0L)).as("duplicate_keys"),
        coalesce(col("excess_rows"), lit(0L)).as("excess_rows"),
        coalesce(col("max_multiplicity"), lit(0L)).as("max_multiplicity"))
}
