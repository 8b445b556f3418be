package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `rightTs <= leftTs` per key (the time-series point-in-time join
  * Spark lacks as a builtin; listed in the engine brief alongside
  * range joins).
  *
  * Implementation is the scalable composition, not a range cross join:
  * both sides union into one stream tagged left/right, one shuffle
  * partitions by key, and a running `last(rightCol, ignoreNulls)` over
  * (ts, side) order carries the most recent right payload forward onto
  * each left row. Cost is one shuffle + one in-partition sort at any
  * scale — never the |left|×|right| pair space, and skew follows the
  * key distribution like any other window.
  *
  * Tie semantics: a right row at exactly leftTs matches (right sorts
  * before left at equal ts). The right side must be unique per
  * (key, ts) — pre-aggregate it otherwise, or the carried payload at a
  * tied timestamp is arbitrary.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val rightTypes = rightCols.map(c => c -> right.schema(c).dataType).toMap
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__ts"), col("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__ts"), col("__side")) ++
        leftCols.map(c =>
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
        df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .drop("__ts", "__side")
      .withColumnsRenamed(rightCols.map(c => s"__r_$c" -> c).toMap)
  }
}
