package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.Exact.dec

/** Streaming incremental view maintenance — the `ivm1` delta fold under
  * a CDC stream: a maintained per-group (count, exact-decimal sum)
  * aggregate absorbs each micro-batch of I/D changes as
  * `stored ⊕ delta`, never re-aggregating the base data. Updates
  * travel as delete+insert pairs (the ivm1/applyCdc convention).
  *
  * Storage is ONE [[BucketStore]] family per view
  * (`<aggDir>/snap/batch=<id>/`, bucketed by the group hash), the
  * shared exactly-once discipline: a batch always recomputes from the
  * latest COMMITTED snapshot with id < its own (`_SUCCESS` = commit),
  * so a redelivered batch reads the same input and overwrites its own
  * snapshot with identical bytes — idempotent at any crash point, no
  * WAL. Older snapshots are GC'd; steady state holds the directories
  * the last two manifests reference. Round 15: the snapshot writes
  * through the store's manifest-linked PARTITIONED UPSERT — only the
  * delta's groups' buckets merge and rewrite; at 100 TB the
  * group-count-sized view is itself big, and the old complete rewrite
  * per batch was its write-side scale wall.
  *
  * Contract (StreamingIvmSpec): after batch N commits, [[readAgg]]
  * equals the full recompute over every surviving row delivered so far,
  * groups whose rows are all deleted disappear, and an op that is
  * neither I nor D (or NULL) fails the batch loudly — the applyCdc
  * discipline; a silent default would corrupt the view forever since
  * nothing downstream ever recomputes it.
  */
object StreamingIvm {

  private def committed(spark: SparkSession, aggDir: String): Seq[Long] =
    BucketStore.committedIn(spark, aggDir, "snap").toSeq.sorted

  /** Fold ONE static change batch into the maintained aggregate as
    * micro-batch `batchId`; returns the surviving group count of the
    * TOUCHED slice after the fold (delta-sized to compute). Pass
    * `fullCount = true` for the whole store's group count — a
    * manifest-resolved scan over every live bucket, store-proportional
    * per batch, so keep it out of hot per-batch callbacks (r16, the
    * ADVICE read-cost item). */
  def applyBatch(
      batch: DataFrame, batchId: Long, groupCols: Seq[String],
      opCol: String, valueCol: String, aggDir: String,
      storeBuckets: Int = StreamingIvmMinMax.StoreBuckets,
      fullCount: Boolean = false): Long = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return -1L // no state change; snapshot ids may skip
    // fail loudly on an op outside {I, D} — including NULL, which
    // filters silently out of BOTH legs of any when() split
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D")).limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} (or NULL) " +
        s"in '$opCol' — refusing to fold a malformed delta into the view")
    val g = groupCols.map(col)
    val delta = batch.select(
        (g :+ when(col(opCol) === "I", 1L).otherwise(-1L).as("__w")) :+
          (when(col(opCol) === "I", dec(col(valueCol)))
            .otherwise(-dec(col(valueCol)))).as("__p"): _*)
      .groupBy(g: _*)
      .agg(sum(col("__w")).as("__dn"), sum(col("__p")).as("__ds"))
    val prevId = committed(spark, aggDir).filter(_ < batchId).lastOption
    // only the delta's groups' buckets read and merge — untouched
    // groups stay linked through the manifest, unread and unwritten
    val touched = BucketStore.bucketsOf(batch, groupCols, storeBuckets)
    val aggTemplate = batch.filter(lit(false))
      .select(g :+ lit(0L).as("n") :+ lit(0).cast("decimal(28,4)").as("s"): _*)
    val merged = prevId match {
      case None =>
        // coalesce here too: a first-batch group whose valueCol rows are
        // all NULL sums to s = NULL, which slips past the corruption
        // check below (n === 0 && s =!= 0 evaluates to NULL) and makes
        // the maintained state depend on batch boundaries — later
        // merges would coalesce it to 0, the first snapshot would not
        delta.select((g :+ coalesce(col("__dn"), lit(0L)).as("n")) :+
          coalesce(col("__ds"), lit(0)).as("s"): _*)
      case Some(_) =>
        val stored = BucketStore.readBuckets(spark, aggDir, "snap", prevId,
            touched, aggTemplate)
          .select((groupCols :+ "n" :+ "s").map(col): _*)
        stored.join(delta, groupCols, "full_outer")
          .select((g :+
            (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n")) :+
            (coalesce(col("s"), lit(0)) + coalesce(col("__ds"), lit(0))).as("s"): _*)
    }
    val next = merged.localCheckpoint(false)
    // a delete for rows that were never inserted drives a group's count
    // negative (or zeroes the count while leaving a remainder sum) —
    // fail the batch loudly before it commits; silently dropping the
    // group would corrupt the view forever (nothing downstream ever
    // recomputes it), the same discipline as the op check above
    val corrupt = next.filter(col("n") < 0 ||
      (col("n") === 0 && col("s") =!= 0)).limit(1).count()
    require(corrupt == 0L,
      s"change batch $batchId deletes rows the view never absorbed " +
        "(negative count or zero count with a remainder sum) — " +
        "refusing to fold an inconsistent delta into the view")
    val survivors = next.filter(col("n") > 0)
    BucketStore.upsert(spark, aggDir, "snap", batchId, prevId,
      survivors.withColumn("__g_bucket",
        BucketStore.bucketize(groupCols, storeBuckets)),
      touched)
    BucketStore.commit(spark, aggDir, "snap", batchId)
    BucketStore.gc(spark, aggDir, "snap", prevId.toSeq :+ batchId)
    val nGroups =
      if (fullCount)
        BucketStore.readAll(spark, aggDir, "snap", Some(batchId), aggTemplate)
          .count()
      else survivors.count() // the touched slice — `next` is checkpointed
    graft.operators.ScalableRank.release(next)
    nGroups
  }

  /** Wire the per-batch fold onto a STREAMING change frame; `onBatch`
    * observes (batchId, groupCount). Call `.start()`. */
  def applyStream(
      changes: DataFrame, groupCols: Seq[String], opCol: String,
      valueCol: String, aggDir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, groupCols, opCol, valueCol, aggDir))
    }
  }

  def hasCommitted(spark: SparkSession, aggDir: String): Boolean =
    committed(spark, aggDir).nonEmpty

  /** Collapse the manifest's link fan-out by rewriting every live
    * bucket into one batch directory — see
    * [[BucketStore.compactAll]]; run between folds at a fresh id. */
  def compact(spark: SparkSession, aggDir: String, batchId: Long): Unit =
    BucketStore.compactAll(spark, aggDir, Seq("snap"), batchId)

  /** The maintained aggregate as of the latest committed batch:
    * (groupCols…, n, s) with s the exact decimal sum. */
  def readAgg(spark: SparkSession, aggDir: String): DataFrame = {
    val snaps = committed(spark, aggDir)
    require(snaps.nonEmpty, s"no committed aggregate under $aggDir")
    BucketStore.readAllNonEmpty(spark, aggDir, "snap", snaps.last)
      .drop("__g_bucket")
  }
}
