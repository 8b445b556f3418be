package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.ShuffleShard

/** Streaming face of the shard export — the incremental end of the
  * curation pipeline (SURVEY §2.9 + the sh1 batch story): a stream of
  * curated training rows lands in its deterministic shard as it
  * arrives, existing (shard, pos) placements immutable, so a trainer
  * already consuming shard files never sees a row move underneath it.
  *
  * Spark-first shape: the append is a multi-stage batch plan (audit
  * anti-join → seeded assignment → per-shard rank → ranged write), so
  * it runs inside `foreachBatch` — the same stream-static pattern as
  * [[StreamingScreen]]. Exactly-once lands on the AUDIT anti-join, not
  * on foreachBatch's batchId: a replayed micro-batch (at-least-once
  * upstream, a restarted query) re-offers rows whose ids are already
  * in the export and [[ShuffleShard.appendShards]] drops them — so the
  * sink is idempotent under any redelivery, not just same-batchId
  * redelivery. Per micro-batch cost: batch-sized assignment work plus
  * the append manifest's Bloom screen — O(batch + manifest), never a
  * re-scan of the standing export (see [[graft.operators.ShardManifest]]). */
object StreamingShard {

  /** Wire a micro-batched shard append onto `rows` (a STREAMING
    * DataFrame carrying `idCol` + payload columns). Each micro-batch
    * appends its not-yet-exported rows under `outDir`; `onBatch`
    * (optional) observes (batchId, rowsAppended) — an audit hook.
    * Call `.start()` (optionally after `.trigger(...)`). */
  def appendStream(
      rows: DataFrame,
      idCol: String,
      shards: Int,
      seed: Int,
      outDir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(rows.isStreaming, "appendStream expects a streaming DataFrame " +
      "(use ShuffleShard.writeShards/appendShards for static batches)")
    rows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batchId,
          ShuffleShard.appendShards(batch.toDF(), idCol, shards, seed, outDir))
      }
  }
}
