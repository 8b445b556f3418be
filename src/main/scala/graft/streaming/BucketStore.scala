package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.nio.charset.StandardCharsets

/** Manifest-linked bucket store — BATCH-PROPORTIONAL snapshot writes
  * for the streaming IVM families (round 15, the verdict's #1).
  *
  * The r13/r14 layout wrote every snapshot family IN FULL per
  * micro-batch: compute was delta-proportional and reads were
  * bucket-pruned, but the store-sized write per batch was the one
  * remaining 100-TB scale-killer (self-documented in every
  * StreamingIvm* face as "partitioned upsert in production"). This is
  * that upsert, kept inside the family's exactly-once discipline:
  *
  * Layout per family under `<dir>/<family>/batch=<id>/`:
  *   - `data/__g_bucket=<b>/…parquet` — ONLY the buckets the batch
  *     touched (post-delta state of those buckets);
  *   - `keys/__k_bucket=<b>/…parquet` — the pk→existence index slice
  *     for the touched PK buckets (families with a CDC key
  *     discipline);
  *   - `manifest` / `keys_manifest` — bucket → batch-id pointers for
  *     EVERY live bucket: touched buckets point at this batch,
  *     untouched buckets inherit the previous manifest's pointer
  *     verbatim (the [[graft.operators.ShardManifest]] pointer-WAL
  *     discipline applied to snapshots);
  *   - `_SUCCESS` — the commit marker, written LAST.
  *
  * Bytes written per batch are therefore ∝ |delta| (touched-bucket
  * data + a ≤`storeBuckets`-line manifest), never ∝ |store|; a batch
  * that does not touch a family writes that family's manifest + marker
  * only. Reads resolve the manifest: a full read unions the (≤
  * `storeBuckets`, in practice few) distinct pointed batch
  * directories, each pruned to the buckets that live there; a pruned
  * read touches only the requested buckets' files — the fold legs'
  * existing bucket-prune contract, now enforced by layout.
  *
  * Exactly-once: a batch is committed only when every family carries
  * `_SUCCESS`; every fold recomputes from the latest COMMITTED batch
  * below its own id, so a crash anywhere (mid-data, mid-manifest,
  * between families) makes redelivery read the same input and
  * overwrite identical bytes. GC keeps the batch directories
  * referenced by the last TWO committed manifests (redelivery of the
  * newest committed batch replays against the previous one) and
  * deletes the rest.
  *
  * CDC exactness note: the per-side key discipline (delete images
  * match, live-key inserts refused, duplicate inserts refused) used to
  * scan the FULL store; on the upsert layout the delete-image and
  * duplicate checks stay exact on the touched-bucket slice (a delete
  * image determines its own bucket — the bucket key is a function of
  * the image's columns), but an insert colliding with a pk that lives
  * in a DIFFERENT data bucket (an upstream CDC bug: update without
  * delete, join key changed) would be invisible to a slice check. The
  * `keys/` index closes that hole exactly and delta-proportionally:
  * it maintains every live pk bucketed by PK hash, so the collide
  * check reads only the inserted pks' index buckets.
  */
object BucketStore {

  /** The shared group-hash bucket expression (the StreamingIvmMinMax
    * convention). */
  def bucketize(keys: Seq[String], storeBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(storeBuckets.toLong)).cast("int")

  private def familyRoot(dir: String, family: String) =
    new HPath(new HPath(dir), family)

  private def batchDir(dir: String, family: String, id: Long) =
    new HPath(familyRoot(dir, family), s"batch=$id")

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Batch ids of `family` that carry the commit marker. */
  def committedIn(spark: SparkSession, dir: String, family: String): Set[Long] = {
    val root = familyRoot(dir, family)
    val fs = fsOf(spark, dir)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).toSet
  }

  /** Batch ids committed across ALL `families` (ascending). */
  def committedAll(spark: SparkSession, dir: String,
      families: Seq[String]): Seq[Long] =
    families.map(committedIn(spark, dir, _)).reduce(_ & _).toSeq.sorted

  // ---- manifests ---------------------------------------------------

  private def writeManifest(fs: FileSystem, path: HPath,
      entries: Map[Int, Long]): Unit = {
    // deterministic bytes (sorted) so a redelivered batch overwrites
    // identical content
    val body = entries.toSeq.sorted
      .map { case (b, id) => s"$b $id" }.mkString("", "\n", "\n")
    val out = fs.create(path, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readManifestFile(fs: FileSystem, path: HPath): Map[Int, Long] = {
    if (!fs.exists(path)) return Map.empty
    val in = fs.open(path)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      Iterator.continually(in.read(tmp)).takeWhile(_ > 0)
        .foreach(n => buf.write(tmp, 0, n))
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val Array(b, id) = line.split(" ")
      b.toInt -> id.toLong
    }.toMap
  }

  /** The bucket → batch-id pointer map of `family` as of batch `id`
    * (empty for `id = None` — the empty store). `kind` is "manifest"
    * (data) or "keys_manifest". */
  def readManifest(spark: SparkSession, dir: String, family: String,
      id: Option[Long], kind: String = "manifest"): Map[Int, Long] =
    id.map(i => readManifestFile(fsOf(spark, dir),
      new HPath(batchDir(dir, family, i), kind))).getOrElse(Map.empty)

  // ---- reads -------------------------------------------------------

  private def emptyLike(template: DataFrame, bucketCol: String): DataFrame =
    template.filter(lit(false))
      .withColumn(bucketCol, lit(0).cast("int"))

  private def readVia(spark: SparkSession, dir: String, family: String,
      manifest: Map[Int, Long], buckets: Option[Seq[Int]],
      sub: String, bucketCol: String, template: DataFrame): DataFrame = {
    val wanted = buckets match {
      case Some(bs) => manifest.filter { case (b, _) => bs.contains(b) }
      case None => manifest
    }
    if (wanted.isEmpty) return emptyLike(template, bucketCol)
    // one pruned scan per distinct pointed batch directory — bounded by
    // storeBuckets, in practice a handful (hot buckets live in recent
    // batches, cold ones share old ones). The wanted buckets are read
    // as EXPLICIT partition paths: the manifest already knows exactly
    // which directories exist, so the driver never lists the batch
    // directory's full bucket fan-out (at thousands of buckets that
    // listing dominated a pruned read's cost — measured in the r15w
    // IvmScale section's first cut)
    wanted.groupBy(_._2).toSeq.sortBy(_._1).map { case (pid, entries) =>
      val base = new HPath(batchDir(dir, family, pid), sub).toString
      val paths = entries.keys.toSeq.sorted.map(b => s"$base/$bucketCol=$b")
      spark.read.option("basePath", base).parquet(paths: _*)
    }.reduce(_ unionByName _)
  }

  /** Rows of the requested data `buckets` as of snapshot `id` —
    * partition-pruned to exactly those buckets' files. Returns the
    * data columns plus `__g_bucket`; `template` supplies the schema
    * when the store (or the slice) is empty. */
  def readBuckets(spark: SparkSession, dir: String, family: String,
      id: Option[Long], buckets: Seq[Int], template: DataFrame): DataFrame =
    readVia(spark, dir, family, readManifest(spark, dir, family, id),
      Some(buckets), "data", "__g_bucket", template)

  /** The family's full surviving rows as of snapshot `id` (every live
    * bucket, resolved through the manifest). */
  def readAll(spark: SparkSession, dir: String, family: String,
      id: Option[Long], template: DataFrame): DataFrame =
    readVia(spark, dir, family, readManifest(spark, dir, family, id),
      None, "data", "__g_bucket", template)

  /** [[readAll]] for callers with no schema template at hand (the
    * read-side public APIs): requires at least one live bucket — a
    * family whose every row has been deleted has no parquet footer
    * left to speak its schema. */
  def readAllNonEmpty(spark: SparkSession, dir: String, family: String,
      id: Long): DataFrame = {
    val manifest = readManifest(spark, dir, family, Some(id))
    require(manifest.nonEmpty,
      s"store family '$family' under $dir is empty as of batch $id " +
        "(every row deleted) — no rows, and no schema, to read")
    readVia(spark, dir, family, manifest, None, "data", "__g_bucket",
      // template is never consulted on a non-empty manifest
      spark.emptyDataFrame)
  }

  private def readKeyBuckets(spark: SparkSession, dir: String, family: String,
      id: Option[Long], buckets: Seq[Int], template: DataFrame): DataFrame =
    readVia(spark, dir, family,
      readManifest(spark, dir, family, id, "keys_manifest"),
      Some(buckets), "keys", "__k_bucket", template)

  // ---- writes ------------------------------------------------------

  /** The batch-bounded distinct bucket list of `df` under `keys` — the
    * audited-collect discipline (≤ `storeBuckets` ints). */
  def bucketsOf(df: DataFrame, keys: Seq[String], storeBuckets: Int): Seq[Int] =
    df.select(bucketize(keys, storeBuckets).as("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq

  private def writeSlice(spark: SparkSession, dir: String, family: String,
      batchId: Long, prevId: Option[Long], rows: DataFrame,
      touched: Seq[Int], sub: String, bucketCol: String,
      manifestKind: String): Unit = {
    val fs = fsOf(spark, dir)
    val bd = batchDir(dir, family, batchId)
    val dataPath = new HPath(bd, sub)
    if (touched.nonEmpty)
      rows.repartition(col(bucketCol))
        .write.mode("overwrite").partitionBy(bucketCol)
        .parquet(dataPath.toString)
    // buckets actually PRESENT after the write (a touched bucket whose
    // rows all died leaves no partition dir — it drops off the
    // manifest, which is exactly "empty")
    val present: Set[Int] =
      if (!fs.exists(dataPath)) Set.empty
      else fs.listStatus(dataPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$bucketCol="))
        .map(_.getPath.getName.stripPrefix(s"$bucketCol=").toInt).toSet
    val prev = readManifest(spark, dir, family, prevId, manifestKind)
    val entries = (prev -- touched) ++ present.iterator.map(_ -> batchId)
    writeManifest(fs, new HPath(bd, manifestKind), entries)
  }

  /** Upsert the post-delta state of the TOUCHED data buckets (`rows`
    * must hold exactly those buckets' surviving rows, `__g_bucket`
    * included) and link every untouched bucket from `prevId`'s
    * manifest. Does NOT commit — call [[commit]] after every family of
    * the batch has written. */
  def upsert(spark: SparkSession, dir: String, family: String,
      batchId: Long, prevId: Option[Long], rows: DataFrame,
      touched: Seq[Int]): Unit =
    writeSlice(spark, dir, family, batchId, prevId, rows, touched,
      "data", "__g_bucket", "manifest")

  private def upsertKeys(spark: SparkSession, dir: String, family: String,
      batchId: Long, prevId: Option[Long], keys: DataFrame,
      touched: Seq[Int]): Unit =
    writeSlice(spark, dir, family, batchId, prevId, keys, touched,
      "keys", "__k_bucket", "keys_manifest")

  /** Write the family's commit marker — the LAST step of its batch. */
  def commit(spark: SparkSession, dir: String, family: String,
      batchId: Long): Unit = {
    val fs = fsOf(spark, dir)
    fs.create(new HPath(batchDir(dir, family, batchId), "_SUCCESS"), true)
      .close()
  }

  /** Rewrite every live bucket of each family into ONE batch directory
    * `batchId`, collapsing the manifest's link fan-out — the
    * maintenance face of the upsert layout. Cold buckets otherwise
    * keep pointing at ever-older batch directories: correct (GC keeps
    * whatever a live manifest references) and bounded by
    * `storeBuckets`, but a full read then unions up to that many
    * pruned scans. Compaction is a rewrite, so it costs store-sized
    * I/O by design — schedule it like any warehouse OPTIMIZE, between
    * folds, at a fresh batch id (folds skip ids freely).
    *
    * Exactly-once: content derives deterministically from the latest
    * committed manifests below `batchId`, the id commits only when all
    * `families` carry markers, and a crash/redelivery overwrites
    * identical bytes — the same discipline as a fold. Old directories
    * fall out of reach once the NEXT fold's GC runs with both its
    * keep-manifests pointing at (or past) the compacted directory. */
  def compactAll(spark: SparkSession, dir: String, families: Seq[String],
      batchId: Long): Unit = {
    val prior = committedAll(spark, dir, families).filter(_ < batchId)
    require(prior.nonEmpty, s"nothing committed under $dir to compact")
    val prevId = Some(prior.last)
    families.foreach { family =>
      def rewrite(sub: String, bucketCol: String, kind: String): Unit = {
        val manifest = readManifest(spark, dir, family, prevId, kind)
        val all =
          if (manifest.isEmpty) None
          else Some(readVia(spark, dir, family, manifest, None, sub,
            bucketCol, spark.emptyDataFrame))
        val bd = batchDir(dir, family, batchId)
        val fs = fsOf(spark, dir)
        all.foreach(rows =>
          rows.repartition(col(bucketCol))
            .write.mode("overwrite").partitionBy(bucketCol)
            .parquet(new HPath(bd, sub).toString))
        // every bucket now lives here; dead buckets were already off
        // the manifest
        writeManifest(fs, new HPath(bd, kind),
          manifest.keys.map(_ -> batchId).toMap)
      }
      rewrite("data", "__g_bucket", "manifest")
      rewrite("keys", "__k_bucket", "keys_manifest")
    }
    families.foreach(f => commit(spark, dir, f, batchId))
    families.foreach(f => gc(spark, dir, f, prior.lastOption.toSeq :+ batchId))
  }

  /** Delete batch directories no longer reachable: keep `keepIds`
    * themselves plus every batch their manifests (data AND keys) still
    * point into. Call with the last two committed ids — redelivery of
    * the newest replays against the previous. */
  def gc(spark: SparkSession, dir: String, family: String,
      keepIds: Seq[Long]): Unit = {
    val fs = fsOf(spark, dir)
    val root = familyRoot(dir, family)
    if (!fs.exists(root)) return
    val referenced = keepIds.toSet ++ keepIds.flatMap { id =>
      readManifest(spark, dir, family, Some(id)).values ++
        readManifest(spark, dir, family, Some(id), "keys_manifest").values
    }
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => s.getPath)
      .filter(p => !referenced.contains(
        p.getName.stripPrefix("batch=").toLong))
      .foreach(p => fs.delete(p, true))
  }

  // ---- the CDC-validated per-side upsert ----------------------------

  /** A validated, not-yet-written per-side upsert: the post-delta rows
    * of the touched data buckets and the post-delta pk-index slice of
    * the touched key buckets. */
  case class Prepared(
      family: String, rows: DataFrame, touched: Seq[Int],
      keys: DataFrame, touchedKeys: Seq[Int])

  /** Validate one side's CDC delta (payload columns + `__op` ∈ {I, D})
    * against the keyed store — the [[StreamingIvmMinMax]] per-side key
    * discipline made delta-proportional — and return the touched-slice
    * post-state for [[writePrepared]]. All three refusals stay EXACT
    * and fire HERE, eagerly, so a batch validates every side before
    * any side writes: delete images must match a stored row
    * byte-for-byte (a delete image determines its own bucket, so the
    * touched slice is sufficient), inserts must not collide with a
    * live pk ANYWHERE (checked against the pk index, pruned to the
    * inserted pks' index buckets — the exactness the slice alone could
    * not give), and a batch may not insert one pk twice. */
  def prepareCdcUpsert(
      sideDelta: DataFrame, dataCols: Seq[String], keyCols: Seq[String],
      bucketKeys: Seq[String], dir: String, family: String,
      batchId: Long, prevId: Option[Long], storeBuckets: Int,
      side: String): Prepared =
    prepareCdcUpsertExpr(sideDelta, dataCols, keyCols,
      bucketize(bucketKeys, storeBuckets), dir, family, batchId, prevId,
      storeBuckets, side)

  /** [[prepareCdcUpsert]] with an ARBITRARY order-/domain-meaningful
    * bucket expression for the data layout (e.g. the quantile face's
    * VALUE bucket, whose ids are the read path's pruning key) instead
    * of the hash of a key set. The expression must be a pure function
    * of the row's data columns — a delete image then determines its
    * own bucket, which is what keeps the slice validation exact. The
    * pk index stays hash-bucketed by `keyCols`. */
  def prepareCdcUpsertExpr(
      sideDelta: DataFrame, dataCols: Seq[String], keyCols: Seq[String],
      bucketExpr: Column, dir: String, family: String,
      batchId: Long, prevId: Option[Long], storeBuckets: Int,
      side: String): Prepared = {
    val spark = sideDelta.sparkSession
    val dels = sideDelta.filter(col("__op") === "D")
      .select(dataCols.map(col): _*)
    val ins = sideDelta.filter(col("__op") === "I")
      .select(dataCols.map(col): _*)
    val template = sideDelta.select(dataCols.map(col): _*)
    val keysTemplate = sideDelta.select(keyCols.map(col): _*)
    val touchedData = sideDelta.select(bucketExpr.cast("int").as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val touchedKeys = bucketsOf(sideDelta, keyCols, storeBuckets)

    val prevSlice = readBuckets(spark, dir, family, prevId, touchedData,
      template).select(dataCols.map(col): _*)
    val unmatched = dels.join(prevSlice, dataCols, "left_anti")
      .limit(1).count()
    require(unmatched == 0L,
      s"change batch $batchId ($side side) deletes rows the store never " +
        "held (unknown key, or a delete image disagreeing with the stored row)")
    val afterDel = prevSlice
      .join(dels.select(keyCols.map(col): _*), keyCols, "left_anti")

    val prevKeys = readKeyBuckets(spark, dir, family, prevId, touchedKeys,
      keysTemplate).select(keyCols.map(col): _*)
    val liveAfterDel = prevKeys
      .join(dels.select(keyCols.map(col): _*), keyCols, "left_anti")
    val collide = ins.join(liveAfterDel, keyCols, "left_semi")
      .limit(1).count()
    require(collide == 0L,
      s"change batch $batchId ($side side) inserts a key the store still " +
        "holds — updates must travel as delete+insert pairs")
    val dupIns = ins.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).limit(1).count()
    require(dupIns == 0L,
      s"change batch $batchId ($side side) inserts the same key twice")

    Prepared(family,
      afterDel.unionByName(ins)
        .withColumn("__g_bucket", bucketExpr.cast("int")),
      touchedData,
      liveAfterDel.unionByName(ins.select(keyCols.map(col): _*))
        .withColumn("__k_bucket", bucketize(keyCols, storeBuckets)),
      touchedKeys)
  }

  /** Write a [[Prepared]] side's data + keys slices and manifests (no
    * commit marker — [[commit]] is the caller's last step). */
  def writePrepared(spark: SparkSession, dir: String, batchId: Long,
      prevId: Option[Long], p: Prepared): Unit = {
    upsert(spark, dir, p.family, batchId, prevId, p.rows, p.touched)
    upsertKeys(spark, dir, p.family, batchId, prevId, p.keys, p.touchedKeys)
  }

  // ---- the multiset upsert (no pk — (payload, __mult) rows) ---------

  /** Prepare the touched-bucket post-state of a MULTISET store family
    * — (payload columns, `__mult`) rows with no pk discipline, the
    * intermediate-join shape of [[StreamingIvmComposeN]] — under a
    * net-weighted delta (`wCol` signed integers). Multiplicities fold
    * additively; a fold driving any row's multiplicity negative raises
    * loudly (the delta deletes join rows the store never absorbed),
    * rows at zero disappear. Returns (post-state rows of the touched
    * buckets with `__g_bucket`, touched bucket list) for [[upsert]]. */
  def prepareMultisetUpsert(
      netDelta: DataFrame, payloadCols: Seq[String], wCol: String,
      bucketKeys: Seq[String], dir: String, family: String,
      prevId: Option[Long], storeBuckets: Int): (DataFrame, Seq[Int]) = {
    val spark = netDelta.sparkSession
    val p = payloadCols.map(col)
    val touched = bucketsOf(netDelta, bucketKeys, storeBuckets)
    val template = netDelta.filter(lit(false))
      .select(p :+ lit(0L).as("__mult"): _*)
    val prevSlice = readBuckets(spark, dir, family, prevId, touched, template)
      .select(p :+ col("__mult"): _*)
    // re-compress defensively (the merge's full-outer join needs one
    // row per payload on each side) — delta-sized
    val net = netDelta.groupBy(p: _*)
      .agg(sum(col(wCol)).as("__dm")).filter(col("__dm") =!= 0)
    val merged = prevSlice.join(net, payloadCols, "full_outer")
      .select(p :+
        (coalesce(col("__mult"), lit(0L)) +
          coalesce(col("__dm"), lit(0L))).as("__mult"): _*)
      .withColumn("__mult",
        when(col("__mult") < 0,
          raise_error(concat(
            lit(s"multiset fold drives a '$family' row's multiplicity " +
              "negative ("), col("__mult").cast("string"),
            lit(") — the delta deletes join rows the store never absorbed"))))
          .otherwise(col("__mult")))
      .filter(col("__mult") > 0)
    (merged.withColumn("__g_bucket", bucketize(bucketKeys, storeBuckets)),
      touched)
  }
}
