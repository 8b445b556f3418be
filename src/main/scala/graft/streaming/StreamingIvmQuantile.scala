package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmQuantile

/** Streaming QUANTILE-view IVM — the `ivm5` fold under a CDC stream:
  * exact PERCENTILE_CONT maintained continuously by folding each
  * micro-batch into the per-(group, value-bucket) COUNTS — a purely
  * INVERTIBLE merge ([[IvmQuantile.foldCounts]]), so unlike the
  * min/max and distinct faces the fold NEVER reads any store, no
  * matter what the delta deletes.
  *
  * Storage is TWO snapshot families per batch under `<dir>`:
  * `rows/batch=<id>` (surviving rows, partitioned by the VALUE bucket
  * `__qb` — the read path's pruning key) and `counts/batch=<id>`; the
  * usual commit/redelivery discipline (both `_SUCCESS`, recompute from
  * latest committed, overwrite-idempotent).
  *
  * [[readPercentiles]] answers any `ps` from the latest snapshot: the
  * counts name each rank's candidate bucket(s), their `__qb` ids are
  * collected (≤ buckets ints) and the rows read prunes to exactly
  * those partitions — ≈ n/`buckets` rows per requested rank touched,
  * the rest of the store never opened. Domain params (lo, hi, buckets)
  * are the view's identity — pass the creation-time values to every
  * call (a mismatch re-buckets history and the counts invariant
  * breaks loudly at the next fold's negative-count guard).
  *
  * Contract (StreamingIvmQuantileSpec): after batch N commits,
  * readPercentiles ≡ the sort-based PERCENTILE_CONT recompute over
  * every surviving delivered row, bit-for-bit, across checkpoint
  * stop/restart; malformed deltas fail the batch loudly BEFORE
  * anything is written.
  */
object StreamingIvmQuantile {

  private def snapRoot(dir: String, family: String) =
    new HPath(new HPath(dir), family)

  private def snapPath(dir: String, family: String, id: Long) =
    new HPath(snapRoot(dir, family), s"batch=$id")

  private def committedIn(
      spark: SparkSession, dir: String, family: String): Set[Long] = {
    val root = snapRoot(dir, family)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).toSet
  }

  private def committed(spark: SparkSession, dir: String): Seq[Long] =
    (committedIn(spark, dir, "rows") & committedIn(spark, dir, "counts"))
      .toSeq.sorted

  /** Fold ONE static change batch (keyCol, groupCols…, opCol,
    * valueCol) into the maintained store as micro-batch `batchId`;
    * returns the count-row total after the fold (-1 empty batch). */
  def applyBatch(
      batch: DataFrame, batchId: Long, keyCol: String,
      groupCols: Seq[String], opCol: String, valueCol: String,
      dir: String, lo: Double, hi: Double, buckets: Int): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    require(!batch.columns.contains("__qb"),
      "change batch already contains reserved column '__qb'")
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D")).limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} (or NULL) " +
        s"in '$opCol' — refusing to fold a malformed delta into the view")

    val prior = committed(spark, dir).filter(_ < batchId)
    val dataCols = batch.columns.filterNot(_ == opCol).toSeq
    val prevRows = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "rows", id).toString)
        .select(dataCols.map(col): _*))
      .getOrElse(batch.filter(lit(false)).select(dataCols.map(col): _*))
    val dels = batch.filter(col(opCol) === "D").select(dataCols.map(col): _*)
    val ins = batch.filter(col(opCol) === "I").select(dataCols.map(col): _*)
    val unmatched = dels.join(prevRows, dataCols, "left_anti").limit(1).count()
    require(unmatched == 0L,
      s"change batch $batchId deletes rows the store never held " +
        "(unknown key, or a delete image disagreeing with the stored row)")
    val afterDel = prevRows
      .join(dels.select(col(keyCol)), Seq(keyCol), "left_anti")
    val collide = ins.join(afterDel.select(col(keyCol)), Seq(keyCol),
      "left_semi").limit(1).count()
    require(collide == 0L,
      s"change batch $batchId inserts a key the store still holds — " +
        "updates must travel as delete+insert pairs")

    // rows keyed by the VALUE bucket — the read path's pruning key;
    // null values land bucket -1 (SQL percentile ignores them, but the
    // store keeps the full row set)
    val qb = when(col(valueCol).isNull, lit(-1L))
      .otherwise(IvmQuantile.bucketIdOf(col(valueCol), lo, hi, buckets))
    afterDel.unionByName(ins)
      .withColumn("__qb", qb)
      .repartition(col("__qb"))
      .write.mode("overwrite").partitionBy("__qb")
      .parquet(snapPath(dir, "rows", batchId).toString)

    val prevCounts = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "counts", id).toString))
    IvmQuantile.foldCounts(prevCounts,
        batch.select((groupCols.map(col) :+ col(opCol)) :+ col(valueCol): _*),
        groupCols, opCol, valueCol, lo, hi, buckets)
      .write.mode("overwrite")
      .parquet(snapPath(dir, "counts", batchId).toString)
    prior.dropRight(1).foreach { id =>
      fs.delete(snapPath(dir, "rows", id), true)
      fs.delete(snapPath(dir, "counts", id), true)
    }
    spark.read.parquet(snapPath(dir, "counts", batchId).toString).count()
  }

  /** Wire the per-batch fold onto a STREAMING change frame; `onBatch`
    * observes (batchId, countRows). Call `.start()`. */
  def applyStream(
      changes: DataFrame, keyCol: String, groupCols: Seq[String],
      opCol: String, valueCol: String, dir: String,
      lo: Double, hi: Double, buckets: Int,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, keyCol, groupCols, opCol,
        valueCol, dir, lo, hi, buckets))
    }
  }

  def hasCommitted(spark: SparkSession, dir: String): Boolean =
    committed(spark, dir).nonEmpty

  /** Exact PERCENTILE_CONT at `ps` per group, as of the latest
    * committed batch — rows read PRUNED to the candidate buckets. */
  def readPercentiles(
      spark: SparkSession, dir: String,
      groupCols: Seq[String], valueCol: String, ps: Seq[Double],
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed quantile view under $dir")
    val counts = spark.read
      .parquet(snapPath(dir, "counts", snaps.last).toString)
    val candQb = IvmQuantile.candidates(counts, groupCols, ps)
      .select(col("__qb")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ buckets ids — bounded
    val rows = spark.read
      .parquet(snapPath(dir, "rows", snaps.last).toString)
      .filter(col("__qb").isin(candQb: _*)) // partition-pruned
      .select((groupCols :+ valueCol).map(col): _*)
    IvmQuantile.percentileCont(counts, rows, groupCols, valueCol, ps,
      lo, hi, buckets)
  }
}
