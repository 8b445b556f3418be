package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmDistinct

/** Streaming IVM for COUNT(DISTINCT value) — the `ivm3` fold under a
  * CDC stream: the maintained per-group distinct count absorbs each
  * micro-batch through [[IvmDistinct.fold]]'s pair-granular
  * discipline — the value DICTIONARY and the rows store are each
  * scanned once per batch through broadcast semi-joins on the delta's
  * own pairs, and the counts view folds invertibly (new − removed).
  *
  * Storage is THREE snapshot families per batch under `<dir>` —
  * `rows/batch=<id>` (surviving rows, partitioned by the
  * [[StreamingIvmMinMax]] `__g_bucket` group-hash layout),
  * `dict/batch=<id>` (surviving distinct pairs, partitioned by a
  * `__p_bucket` PAIR-hash layout), `agg/batch=<id>` (the counts
  * view) — written in that order; a batch is committed only when ALL
  * THREE carry `_SUCCESS`, and every fold recomputes from the latest
  * committed triple with id < its own, so redelivery after a crash at
  * any point reads the same input and overwrites identical bytes (the
  * family's exactly-once discipline without a WAL). Steady state
  * holds two snapshot triples.
  *
  * Both store reads the fold makes are partition-PRUNED by
  * batch-bounded driver lists (the audited-collect discipline):
  * the rows store to the DELETE rows' group buckets (the
  * surviving-pair check only consults rows that could carry a deleted
  * pair — an insert-only batch reads ZERO rows files), and the dict to
  * the delta's own pair buckets (membership only matters for the
  * delta's pairs — [[IvmDistinct.fold]]'s pruned-store contract). The
  * fold's compute is therefore delta-proportional regardless of store
  * size; what stays store-sized is the snapshot REWRITE of the
  * untouched dict/rows buckets, the documented test-scale
  * simplification (a production deployment upserts only the affected
  * bucket partitions — the plumbing here already splits affected from
  * untouched, so the upsert is a sink swap, not a logic change).
  *
  * Contract (StreamingIvmDistinctSpec): after batch N commits,
  * [[readCounts]] equals `SELECT g…, COUNT(DISTINCT v)` over every
  * surviving delivered row (null values ignored per SQL);
  * fully-deleted groups disappear; the CDC key discipline
  * (delete images must match, live-key inserts refused, op ∈ {I, D})
  * fails the batch loudly BEFORE anything is written.
  */
object StreamingIvmDistinct {

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
    (committedIn(spark, dir, "rows") & committedIn(spark, dir, "dict") &
      committedIn(spark, dir, "agg")).toSeq.sorted

  /** Fold ONE static change batch (keyCol, groupCols…, opCol,
    * valueCol) into the maintained store as micro-batch `batchId`;
    * returns the group count after the fold (-1 for an empty batch). */
  def applyBatch(
      batch: DataFrame, batchId: Long, keyCol: String,
      groupCols: Seq[String], opCol: String, valueCol: String,
      dir: String,
      storeBuckets: Int = StreamingIvmMinMax.StoreBuckets): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    Seq("__g_bucket", "__p_bucket").foreach(c =>
      require(!batch.columns.contains(c),
        s"change batch already contains reserved column '$c'"))
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

    // the StreamingIvmMinMax CDC key discipline, verbatim: delete
    // images must match a stored row exactly, inserts must not collide
    // with a live key, one insert per key per batch
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

    val bucketize =
      pmod(xxhash64(groupCols.map(col): _*), lit(storeBuckets.toLong)).cast("int")
    afterDel.unionByName(ins)
      .withColumn("__g_bucket", bucketize)
      .repartition(col("__g_bucket"))
      .write.mode("overwrite").partitionBy("__g_bucket")
      .parquet(snapPath(dir, "rows", batchId).toString)
    val delBuckets = batch.filter(col(opCol) === "D")
      .select(bucketize.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val rowsAfterAll =
      spark.read.parquet(snapPath(dir, "rows", batchId).toString)
    val rowsForFold =
      if (delBuckets.isEmpty) rowsAfterAll.filter(lit(false))
      else rowsAfterAll.filter(col("__g_bucket").isin(delBuckets: _*))

    // dict pruning: membership only matters for the delta's own pairs,
    // so the fold reads ONLY their hash-bucket partitions; the
    // untouched buckets ride into the next snapshot unread by the fold
    val pairCols = groupCols :+ valueCol
    val pairBucketize =
      pmod(xxhash64(pairCols.map(col): _*), lit(storeBuckets.toLong)).cast("int")
    val deltaBuckets = batch.select(pairBucketize.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val prevDictAll = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "dict", id).toString))
    val prevState = prior.lastOption.map { id =>
      (spark.read.parquet(snapPath(dir, "agg", id).toString),
        prevDictAll.get.filter(col("__p_bucket").isin(deltaBuckets: _*))
          .select(pairCols.map(col): _*))
    }
    val (counts, dictAffected) = IvmDistinct.fold(prevState,
      batch.select((groupCols.map(col) :+ col(opCol)) :+ col(valueCol): _*),
      rowsForFold.select((groupCols.map(col) :+ col(valueCol)): _*),
      groupCols, opCol, valueCol)
    val dictNext = prevDictAll
      .map(d => dictAffected.unionByName(
        d.filter(!col("__p_bucket").isin(deltaBuckets: _*))
          .select(pairCols.map(col): _*)))
      .getOrElse(dictAffected)
    // dict first (counts derive from it), then the view; commit is the
    // triple's intersection either way
    dictNext
      .withColumn("__p_bucket", pairBucketize)
      .repartition(col("__p_bucket"))
      .write.mode("overwrite").partitionBy("__p_bucket")
      .parquet(snapPath(dir, "dict", batchId).toString)
    counts.write.mode("overwrite")
      .parquet(snapPath(dir, "agg", batchId).toString)
    prior.dropRight(1).foreach { id =>
      fs.delete(snapPath(dir, "rows", id), true)
      fs.delete(snapPath(dir, "dict", id), true)
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

  /** The maintained view as of the latest committed batch:
    * (groupCols…, n_distinct). */
  def readCounts(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed distinct-count view under $dir")
    spark.read.parquet(snapPath(dir, "agg", snaps.last).toString)
  }

  /** The value dictionary as of the latest committed batch (the
    * `__p_bucket` partition key stays internal). */
  def readDict(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed dictionary under $dir")
    spark.read.parquet(snapPath(dir, "dict", snaps.last).toString)
      .drop("__p_bucket")
  }
}
