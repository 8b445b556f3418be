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

  /** Packing WITH overflow splitting — the production variant [[pack]]
    * defers: a document whose tokens cross one or more budget
    * boundaries is split into per-bin slices, so every bin holds
    * EXACTLY `budget` tokens (except the final one) and no context
    * window is padded short because a long document started late.
    * Output: (id, weight, bin, slice_idx, start_tok, n_tokens) — one
    * row per (document, bin) it occupies; `start_tok` is the slice's
    * 0-based token offset within the document, `slice_idx` the
    * 0-based slice number, and Σ n_tokens over a document's slices
    * equals its weight. Zero-weight documents occupy no tokens and
    * emit no slices.
    *
    * Scale shape: [[pack]]'s two-phase distributed prefix sum plus a
    * pure per-row bounded explode (a document spans at most
    * weight/budget + 1 bins) — no additional shuffle, everything
    * integral (`div`/`greatest`/`least` on longs, exact at any
    * corpus size). */
  def packSplit(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, blockSize: Long = 1 << 20): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val packed = pack(df, idCol, weightCol, budget, blockSize).drop("bin")
    packed.filter(col("weight") > 0)
      .withColumn("p", expr(s"(cum - weight) div ${budget}L"))
      .withColumn("q", expr(s"(cum - 1) div ${budget}L"))
      .withColumn("bin", explode(sequence(col("p"), col("q"))))
      .withColumn("slice_idx", (col("bin") - col("p")).cast("long"))
      .withColumn("bin_lo", greatest(col("cum") - col("weight"), col("bin") * budget))
      .withColumn("start_tok", col("bin_lo") - (col("cum") - col("weight")))
      .withColumn("n_tokens",
        least(col("cum"), (col("bin") + 1) * budget) - col("bin_lo"))
      .select(col("id"), col("weight"), col("bin"), col("slice_idx"),
        col("start_tok"), col("n_tokens"))
  }

  /** Bin summary: documents and total weight per bin (the packing
    * efficiency view: bins at ~budget are well-packed). */
  def binStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("bin_weight"))

  /** Length-bucketed batch assignment — dynamic batching for training:
    * rows with similar weights (token counts) group into width-
    * `bucketWidth` buckets, and each bucket fills fixed-size batches
    * in id order, so a batch pads to its longest member instead of the
    * corpus maximum. Output adds (bucket, batch_idx, pos_in_batch),
    * all 0-based and deterministic.
    *
    * Scale shape: one exchange keyed by bucket plus a per-bucket rank.
    * Parallelism equals the number of occupied buckets — fine when
    * lengths spread (context-window corpora have hundreds of buckets);
    * a corpus concentrated in ONE bucket degenerates to a single-task
    * sort, in which case the block-window + broadcast-offset pattern
    * of [[pack]] is the drop-in global variant. */
  def lengthBatches(
      df: DataFrame, idCol: String, weightCol: String,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1, s"need bucketWidth >= 1, got $bucketWidth")
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
    df.select(col(idCol).as("id"), col(weightCol).cast("long").as("weight"))
      // FLOOR division (pmod keeps the remainder non-negative), not
      // Spark's truncate-toward-zero `div`: a negative weight must
      // land in bucket -1, matching the engine-portable `//` semantics
      .withColumn("bucket",
        expr(s"(weight - pmod(weight, ${bucketWidth}L)) div ${bucketWidth}L"))
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("batch_idx", expr(s"rn div $batchSize"))
      .withColumn("pos_in_batch", expr(s"rn % $batchSize"))
      .drop("rn")
  }
}
