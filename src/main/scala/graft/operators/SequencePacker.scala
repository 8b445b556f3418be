package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous sequence packing for LLM training (LLM-pipeline op):
  * assign documents, in a deterministic global order, to fixed-budget
  * context-window bins by running token count — bin = how many full
  * budgets precede the document's first token.
  *
  * The naive formulation is a running sum over ONE unpartitioned window
  * — a single-task sort at 100 TB. This implements the classic
  * distributed two-phase prefix sum instead:
  *   1. block id = id / blockSize (contiguous id ranges preserve the
  *      global order inside and across blocks);
  *   2. per-block running sums under a window PARTITIONED by block —
  *      embarrassingly parallel;
  *   3. per-block totals (one tiny aggregate, ≤ n/blockSize rows) turn
  *      into exclusive block offsets under one window over the block
  *      list, and broadcast-join back.
  * Global prefix = block offset + in-block prefix; identical to the
  * one-window answer, but the only serial structure is the block-total
  * list. Documents spanning a budget boundary are assigned to the bin
  * where they START (greedy contiguous packing; splitting overflow
  * documents is a downstream tokenizer concern).
  */
object SequencePacker {

  /** (id, weight, cum, bin) — `cum` the inclusive global running weight
    * in ascending `idCol` order, `bin` = floor((cum - weight) / budget).
    * `idCol` must be non-negative and unique (document ids); negative
    * ids fail loudly (ZOrder-style guard) rather than silently binning
    * out of order.
    *
    * Both divisions are integral (`div`), never double: a double
    * round-trip is exact only below 2⁵³, so long ids/cumulative weights
    * near 2⁶³ would silently land in the wrong block/bin, and double
    * division also truncates negatives toward zero instead of flooring.
    * With the non-negative guard, `div` (truncation) equals floor. */
  def pack(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, blockSize: Long = 1 << 20): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(blockSize > 0, s"blockSize must be positive: $blockSize")
    val id = col(idCol).cast("long")
    val guardedId = when(id < 0,
      raise_error(lit("SequencePacker.pack requires non-negative ids")))
      .otherwise(id)
    val base = df.select(guardedId.as("id"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("blk", expr(s"id div ${blockSize}L"))
    val inBlock = base.withColumn("local_cum",
      sum(col("weight")).over(
        Window.partitionBy(col("blk")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = base.groupBy(col("blk"))
      .agg(sum(col("weight")).as("blk_total"))
      .withColumn("blk_offset",
        coalesce(sum(col("blk_total")).over(
          Window.orderBy(col("blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("blk_offset"))
    inBlock.join(broadcast(offsets), "blk")
      .withColumn("cum", col("blk_offset") + col("local_cum"))
      .select(col("id"), col("weight"), col("cum"),
        expr(s"(cum - weight) div ${budget}L").as("bin"))
  }

  /** Bin summary: documents and total weight per bin (the packing
    * efficiency view: bins at ~budget are well-packed). */
  def binStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("bin_weight"))
}
