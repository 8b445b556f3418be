package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for joins and aggregations (SURVEY §4 shuffle notes).
  *
  * When one join key carries a disproportionate share of rows, a plain
  * shuffle join puts that key's entire volume on one task. Salting
  * splits the hot side's key into `factor` sub-keys and replicates the
  * other side across all salts — the classic remedy where AQE's
  * skew-join split (enabled by default in this engine) can't help,
  * e.g. a single key bigger than any split threshold, or aggregations
  * (AQE does not split skewed aggregation groups).
  *
  * Correctness: salted join equals the plain join row-for-row; salted
  * two-phase aggregation equals single-phase for any commutative,
  * re-aggregable function. Salts are deterministic hashes (no rand()),
  * so reruns produce identical partials — replayable under streaming
  * retries and oracle-checkable (`sk1_salted_agg` proves the rewrite
  * equals the plain GROUP BY bit-for-bit via decimal accumulation).
  */
object Salt {

  /** Salted inner equi-join on `key`: `left` (the skewed side) gets a
    * random-but-deterministic salt from a hash of its row; `right` is
    * replicated across all `factor` salts. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(factor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Multi-key variant with explicit salt columns: salt from a hash of
    * `saltCols` (high-cardinality row-determining columns), join key =
    * (keys..., salt). */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      saltCols: Seq[String], saltFactor: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(saltCols.map(col): _*), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted count/sum aggregation on a skewed group key:
    * partial per (key, salt), then final per key. */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(valueCol)), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))

  /** Multi-key variant: groupBy(keys).agg(sum(valueCol), count(*))
    * computed skew-safely; salt from `saltCols`. Returns
    * (keys..., sum_<valueCol>, cnt). For double-typed values, cast to
    * decimal first so the re-combine is order-independent. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      saltCols: Seq[String], saltFactor: Int = 16): DataFrame = {
    val salt = pmod(hash(saltCols.map(col): _*), lit(saltFactor)).as("__salt")
    val partial = df
      .groupBy((keys.map(col) :+ salt): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }
}
