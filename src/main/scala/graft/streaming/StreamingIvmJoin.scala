package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.IvmJoin

/** Streaming JOIN-view IVM — the `ivm4` fold under a CDC stream that
  * changes EITHER side of `R ⋈ S`: the maintained per-group (n, s)
  * view absorbs each micro-batch through [[IvmJoin.foldSumView]]'s
  * bilinear legs, each broadcasting its delta side.
  *
  * Input stream: one tagged change frame — `sideCol` ∈ {R, S} names
  * which relation a row changes, `opCol` ∈ {I, D}; R rows carry R's
  * payload columns (S's are null) and vice versa. Batches may mix
  * sides freely — the ΔR⋈ΔS cross term is what makes that exact.
  *
  * Storage is THREE snapshot families per batch under `<dir>`:
  * `rows_r/batch=<id>` and `rows_s/batch=<id>` (surviving rows per
  * side, partitioned by a JOIN-KEY hash bucket) and `agg/batch=<id>`
  * (the view); commit = all three `_SUCCESS`, recompute-from-latest-
  * committed on redelivery — the family's exactly-once discipline.
  *
  * The bilinear legs read each stored side ONCE, pruned: ΔR joins S
  * only on ΔR's keys, so the S read prunes to ΔR's key buckets, and
  * symmetrically for R — both lists batch-bounded driver collects.
  * An R-only batch therefore reads ZERO R-store... S-store files
  * beyond ΔR's buckets, and vice versa; per-batch compute is
  * delta-proportional, with the snapshot rewrite of untouched buckets
  * the documented test-scale simplification (partitioned upsert in
  * production — the affected/untouched split is already explicit).
  *
  * Contract (StreamingIvmJoinSpec): after batch N commits,
  * [[readView]] equals the full `R ⋈ S` aggregate recompute over
  * surviving delivered rows; per-side CDC key discipline (delete
  * images match, live-key inserts refused, op/side domains) fails the
  * batch loudly BEFORE anything is written.
  */
object StreamingIvmJoin {

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
    (committedIn(spark, dir, "rows_r") & committedIn(spark, dir, "rows_s") &
      committedIn(spark, dir, "agg")).toSeq.sorted

  /** Per-side CDC validation + surviving-rows computation — the
    * StreamingIvmMinMax key discipline, applied to one side's slice of
    * the batch. Returns the post-delta rows for the side. Shared with
    * [[StreamingIvmCompose]], which applies it to three base relations
    * plus the maintained intermediate join. */
  private[streaming] def applySide(
      sideDelta: DataFrame, prevRows: DataFrame, keyCol: String,
      batchId: Long, side: String): DataFrame = {
    val dataCols = prevRows.columns.toSeq
    val dels = sideDelta.filter(col("__op") === "D")
      .select(dataCols.map(col): _*)
    val ins = sideDelta.filter(col("__op") === "I")
      .select(dataCols.map(col): _*)
    val unmatched = dels.join(prevRows, dataCols, "left_anti").limit(1).count()
    require(unmatched == 0L,
      s"change batch $batchId ($side side) deletes rows the store never " +
        "held (unknown key, or a delete image disagreeing with the stored row)")
    val afterDel = prevRows
      .join(dels.select(col(keyCol)), Seq(keyCol), "left_anti")
    val collide = ins.join(afterDel.select(col(keyCol)), Seq(keyCol),
      "left_semi").limit(1).count()
    require(collide == 0L,
      s"change batch $batchId ($side side) inserts a key the store still " +
        "holds — updates must travel as delete+insert pairs")
    val dupIns = ins.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).limit(1).count()
    require(dupIns == 0L,
      s"change batch $batchId ($side side) inserts the same key twice")
    afterDel.unionByName(ins)
  }

  /** Fold ONE static tagged change batch into the maintained store as
    * micro-batch `batchId`. `rCols`/`sCols` name each side's payload
    * columns (joinKeys included in both); `keyColR`/`keyColS` are the
    * per-side primary keys for the CDC discipline. Returns the view's
    * group count after the fold (-1 for an empty batch). */
  def applyBatch(
      batch: DataFrame, batchId: Long,
      sideCol: String, opCol: String,
      rCols: Seq[String], sCols: Seq[String],
      keyColR: String, keyColS: String,
      joinKeys: Seq[String], groupCols: Seq[String], valueCol: String,
      dir: String,
      storeBuckets: Int = StreamingIvmMinMax.StoreBuckets): Long = {
    val spark = batch.sparkSession
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (batch.isEmpty) return -1L
    Seq("__g_bucket", "__op", "__w").foreach(c =>
      require(!batch.columns.contains(c),
        s"change batch already contains reserved column '$c'"))
    val bad = batch.filter(col(opCol).isNull ||
      (col(opCol) =!= "I" && col(opCol) =!= "D") ||
      col(sideCol).isNull ||
      (col(sideCol) =!= "R" && col(sideCol) =!= "S")).limit(1).count()
    require(bad == 0L,
      s"change batch $batchId has rows with op outside {I, D} or side " +
        s"outside {R, S} — refusing to fold a malformed delta into the view")

    val prior = committed(spark, dir).filter(_ < batchId)
    val bucketize =
      pmod(xxhash64(joinKeys.map(col): _*), lit(storeBuckets.toLong)).cast("int")

    def prevRowsOf(family: String, cols: Seq[String]): DataFrame =
      prior.lastOption
        .map(id => spark.read.parquet(snapPath(dir, family, id).toString)
          .select(cols.map(col): _*))
        .getOrElse(batch.filter(lit(false)).select(cols.map(col): _*))

    val dR = batch.filter(col(sideCol) === "R")
      .select(rCols.map(col) :+ col(opCol).as("__op"): _*)
    val dS = batch.filter(col(sideCol) === "S")
      .select(sCols.map(col) :+ col(opCol).as("__op"): _*)
    val prevR = prevRowsOf("rows_r", rCols)
    val prevS = prevRowsOf("rows_s", sCols)
    val afterR = applySide(dR, prevR, keyColR, batchId, "R")
    val afterS = applySide(dS, prevS, keyColS, batchId, "S")

    def writeRows(family: String, rows: DataFrame): Unit =
      rows.withColumn("__g_bucket", bucketize)
        .repartition(col("__g_bucket"))
        .write.mode("overwrite").partitionBy("__g_bucket")
        .parquet(snapPath(dir, family, batchId).toString)
    writeRows("rows_r", afterR)
    writeRows("rows_s", afterS)

    // each stored side is consulted only against the OTHER side's
    // delta keys — prune its read to those buckets (batch-bounded
    // driver lists). The fold uses the PRE-delta states per the
    // bilinear formula, so prune the PREVIOUS snapshots, not the ones
    // just written.
    def bucketsOf(d: DataFrame): Seq[Int] =
      d.select(bucketize.as("__b")).distinct().collect().map(_.getInt(0)).toSeq
    val rBuckets = bucketsOf(dS) // R is probed by ΔS's keys
    val sBuckets = bucketsOf(dR) // S is probed by ΔR's keys

    // previous snapshots re-read WITH the bucket column for pruning
    def prevBucketed(family: String, cols: Seq[String], bs: Seq[Int]): DataFrame =
      prior.lastOption.map { id =>
        val full = spark.read.parquet(snapPath(dir, family, id).toString)
        (if (bs.isEmpty) full.filter(lit(false))
         else full.filter(col("__g_bucket").isin(bs: _*)))
          .select(cols.map(col): _*)
      }.getOrElse(batch.filter(lit(false)).select(cols.map(col): _*))

    val rForFold = prevBucketed("rows_r", rCols, rBuckets)
    val sForFold = prevBucketed("rows_s", sCols, sBuckets)
    val prevAgg = prior.lastOption
      .map(id => spark.read.parquet(snapPath(dir, "agg", id).toString))
    IvmJoin.foldSumView(prevAgg,
        dR.withColumnRenamed("__op", opCol),
        dS.withColumnRenamed("__op", opCol),
        rForFold, sForFold, joinKeys, groupCols, valueCol, opCol)
      .write.mode("overwrite").parquet(snapPath(dir, "agg", batchId).toString)
    prior.dropRight(1).foreach { id =>
      fs.delete(snapPath(dir, "rows_r", id), true)
      fs.delete(snapPath(dir, "rows_s", id), true)
      fs.delete(snapPath(dir, "agg", id), true)
    }
    spark.read.parquet(snapPath(dir, "agg", batchId).toString).count()
  }

  /** Wire the per-batch fold onto a STREAMING tagged change frame;
    * `onBatch` observes (batchId, groupCount). Call `.start()`. */
  def applyStream(
      changes: DataFrame, sideCol: String, opCol: String,
      rCols: Seq[String], sCols: Seq[String],
      keyColR: String, keyColS: String,
      joinKeys: Seq[String], groupCols: Seq[String], valueCol: String,
      dir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    require(changes.isStreaming, "applyStream expects a streaming DataFrame " +
      "(use applyBatch for static deltas)")
    changes.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      onBatch(id, applyBatch(b.toDF(), id, sideCol, opCol, rCols, sCols,
        keyColR, keyColS, joinKeys, groupCols, valueCol, dir))
    }
  }

  def hasCommitted(spark: SparkSession, dir: String): Boolean =
    committed(spark, dir).nonEmpty

  /** The maintained view as of the latest committed batch:
    * (groupCols…, n, s). */
  def readView(spark: SparkSession, dir: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed join view under $dir")
    spark.read.parquet(snapPath(dir, "agg", snaps.last).toString)
  }

  /** Surviving rows of one side ("rows_r" / "rows_s"), bucket column
    * dropped. */
  def readRows(spark: SparkSession, dir: String, family: String): DataFrame = {
    val snaps = committed(spark, dir)
    require(snaps.nonEmpty, s"no committed rows store under $dir")
    spark.read.parquet(snapPath(dir, family, snaps.last).toString)
      .drop("__g_bucket")
  }
}
