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
      perKey.agg(
          sum(col("__n")).as("total_rows"),
          sum(when(col("__null_key"), col("__n")).otherwise(0L)).as("null_key_rows"),
          sum(when(!col("__null_key") && col("__n") > 1, 1L).otherwise(0L))
            .as("duplicate_keys"),
          sum(when(!col("__null_key") && col("__n") > 1, col("__n") - 1)
            .otherwise(0L)).as("excess_rows"),
          max(when(!col("__null_key"), col("__n")).otherwise(0L))
            .as("max_multiplicity"))
        .select(lit(k.name).as("key_name"), col("total_rows"),
          col("null_key_rows"), col("duplicate_keys"), col("excess_rows"),
          col("max_multiplicity"))
    }.reduce(_ unionByName _)
  }
}
