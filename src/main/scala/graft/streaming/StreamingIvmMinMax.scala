package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmFold

/** Streaming IVM for NON-invertible aggregates — the `ivm2` fold under
  * a CDC stream: the maintained per-group (count, exact sum, min, max)
  * absorbs each micro-batch as `stored ⊕ delta`, except that a delete
  * breaking a stored extremum re-aggregates ONLY its group
  * ([[IvmFold.foldMinMax]]). The re-agg source is a maintained ROWS
  * store — keyed surviving rows, updated per batch by the applyCdc
  * convention (updates travel as delete+insert pairs; delete images
  * carry the full row) — read through a broadcast semi-join on the
  * delta-bounded affected-group list, so an unaffected 100-TB store is
  * never re-scanned... the affected groups are, which is the price of
  * non-invertibility (min/max have no subtraction).
  *
  * Storage is TWO snapshot families per batch under `<dir>`:
  * `rows/batch=<id>` (surviving rows) and `agg/batch=<id>` (the
  * aggregate), written in that order; a batch is committed only when
  * BOTH carry `_SUCCESS`, and every fold recomputes from the latest
  * COMMITTED pair with id < its own — so a crash at any point (between
  * the two writes included) makes redelivery read the same input and
  * overwrite identical bytes, the [[StreamingIvm]]/[[StreamingScd2]]
  * exactly-once discipline without a WAL. Steady state holds two
  * snapshot pairs. The rows snapshot is data-sized: at test scale a
  * full rewrite per batch is fine; a production deployment keys the
  * rows store through a partitioned upsert (the ChangeApplier shape)
  * and keeps only the aggregate snapshot-per-batch — the fold logic is
  * unchanged.
  *
  * Contract (StreamingIvmMinMaxSpec): after batch N commits,
  * [[readAgg]] equals the full min/max recompute over every surviving
  * delivered row; fully-deleted groups disappear; a delete whose row
  * the store never held, an insert colliding with a live key, or an op
  * outside {I, D} fails the batch loudly BEFORE anything is written.
  */
object StreamingIvmMinMax {

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
    (committedIn(spark, dir, "rows") & committedIn(spark, dir, "agg"))
      .toSeq.sorted

  /** Fold ONE static change batch (keyCol, groupCols…, opCol,
    * valueCol) into the maintained store as micro-batch `batchId`;
    * returns the group count after the fold (-1 for an empty batch). */
  def applyBatch(
      batch: DataFrame, batchId: Long, keyCol: String,
      groupCols: Seq[String], opCol: String, valueCol: String,
      dir: String): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D")).limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} (or NULL) " +
        s"in '$opCol' — refusing to fold a malformed delta into the view")

    val prior = committed(spark, dir).filter(_ < batchId)
    val dataCols = batch.columns.filterNot(_ == opCol).toSeq
    val prevRows = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "rows", id).toString))
      .getOrElse(batch.filter(lit(false)).select(dataCols.map(col): _*))
    val dels = batch.filter(col(opCol) === "D").select(dataCols.map(col): _*)
    val ins = batch.filter(col(opCol) === "I").select(dataCols.map(col): _*)

    // delete images must match a stored row EXACTLY (key + group +
    // value): a drifting image would subtract the wrong value from the
    // sum and dodge (or spuriously fire) the extremum trigger
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
    val dupIns = ins.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).limit(1).count()
    require(dupIns == 0L,
      s"change batch $batchId inserts the same key twice")

    afterDel.unionByName(ins).write.mode("overwrite")
      .parquet(snapPath(dir, "rows", batchId).toString)
    // the fold's re-agg leg reads the rows snapshot just WRITTEN — no
    // recomputation of the union, and the aggregate provably derives
    // from the bytes the next batch will read
    val rowsAfter = spark.read.parquet(snapPath(dir, "rows", batchId).toString)
    val prevAgg = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "agg", id).toString))
    IvmFold.foldMinMax(prevAgg,
        batch.select((groupCols.map(col) :+ col(opCol)) :+ col(valueCol): _*),
        rowsAfter.select((groupCols.map(col) :+ col(valueCol)): _*),
        groupCols, opCol, valueCol)
      .write.mode("overwrite").parquet(snapPath(dir, "agg", batchId).toString)
    prior.dropRight(1).foreach { id =>
      fs.delete(snapPath(dir, "rows", id), true)
      fs.delete(snapPath(dir, "agg", id), true)
    }
    spark.read.parquet(snapPath(dir, "agg", batchId).toString).count()
  }

  /** Wire the per-batch fold onto a STREAMING change frame; `onBatch`
    * observes (batchId, groupCount). Call `.start()`. */
  def applyStream(
      changes: DataFrame, keyCol: String, groupCols: Seq[String],
      opCol: String, valueCol: String, dir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id,
        applyBatch(b.toDF(), id, keyCol, groupCols, opCol, valueCol, dir))
    }
  }

  def hasCommitted(spark: SparkSession, dir: String): Boolean =
    committed(spark, dir).nonEmpty

  /** The maintained aggregate as of the latest committed batch:
    * (groupCols…, n, s, mn, mx) — s the exact decimal sum. */
  def readAgg(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed aggregate under $dir")
    spark.read.parquet(snapPath(dir, "agg", snaps.last).toString)
  }

  /** The surviving rows as of the latest committed batch. */
  def readRows(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed rows store under $dir")
    spark.read.parquet(snapPath(dir, "rows", snaps.last).toString)
  }
}
