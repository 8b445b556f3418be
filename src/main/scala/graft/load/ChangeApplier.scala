package graft.load

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.Upsert

/** CDC "apply changes" stage: a stream of keyed change rows folded into
  * a maintained table — the composition of the streaming file/bus
  * source with [[Upsert]] that turns the reference's append-plus-audit
  * incremental load into true upsert semantics.
  *
  * Per micro-batch: (1) in-batch dedup — the LATEST change per key wins
  * (row_number over the sequence column, the standard CDC compaction);
  * (2) full-outer upsert against the current table state; (3) atomic-
  * enough swap for a filesystem table (lineage is cut with a
  * localCheckpoint before overwriting the table being read). On a
  * transactional format (Delta/Iceberg) step 3 becomes the format's
  * MERGE commit; steps 1-2 are unchanged.
  */
final class ChangeApplier(spark: SparkSession) {

  /** Apply one micro-batch of changes into `targetTable`. With
    * `opCol` set, the batch carries delete markers and folds through
    * [[Upsert.applyCdc]] (latest-wins compaction + matched-delete);
    * without it, every change row upserts — the original
    * append-stream contract. */
  private[load] def processBatch(
      batch: DataFrame, targetTable: String, keys: Seq[String], seqCol: String,
      opCol: Option[String] = None): Unit = {
    if (!batch.isEmpty) {
      // fresh-table schema: the CDC path must exclude seqCol/opCol (they
      // are change-feed metadata, and applyCdc requires the target NOT
      // carry them); the plain append-stream path KEEPS seqCol — the
      // original first-batch saveAsTable contract, where the persisted
      // sequence column records each key's last-applied change and
      // existing consumers read it. Dropping it here (a round-10 slip)
      // silently changed the schema of freshly created non-CDC tables.
      val tcols = batch.columns.toSeq
        .filterNot(c => opCol.contains(c) || (opCol.isDefined && c == seqCol))
      val target =
        if (spark.catalog.tableExists(targetTable)) spark.table(targetTable)
        else batch.select(tcols.map(col): _*).limit(0)
      val merged = (opCol match {
        case Some(op) => Upsert.applyCdc(target, batch, keys, seqCol, op)
        case None =>
          val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
          val latest = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          Upsert.upsert(target, latest.select(target.columns.map(col): _*), keys)
      }).localCheckpoint() // cut lineage: the write overwrites its own input
      merged.write.mode(SaveMode.Overwrite).saveAsTable(targetTable)
      spark.catalog.refreshTable(targetTable)
    }
  }

  /** Streaming entry: fold every arriving change batch into the table. */
  def start(
      changes: DataFrame, targetTable: String, keys: Seq[String], seqCol: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, _: Long) =>
        processBatch(df, targetTable, keys, seqCol))
      .start()

  /** Delete-aware streaming entry: `opCol` rows marked `"D"` remove
    * their key (the [[Upsert.applyCdc]] MERGE semantics per
    * micro-batch). */
  def startCdc(
      changes: DataFrame, targetTable: String, keys: Seq[String], seqCol: String,
      opCol: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, _: Long) =>
        processBatch(df, targetTable, keys, seqCol, Some(opCol)))
      .start()
}
