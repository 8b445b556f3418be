package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Append manifest for [[ShuffleShard.appendShards]] — the compact
  * audit state that makes each append cost O(batch + manifest) instead
  * of O(prior export): per-shard tail positions, a Bloom filter over
  * every exported id (the replay screen's fast path), and an
  * append-only id-column table (the exact-confirm slow path and the
  * Bloom's rebuild source). Lives under `<outDir>/_graft_manifest/` —
  * the underscore prefix keeps Spark's payload scans blind to it.
  *
  * Commit protocol (per append): `intent` marker first, then payload
  * parquet, then the id append, then Bloom + state (each temp-dir +
  * rename, state last — state is the commit record). The marker clears
  * only after state lands, so any torn append leaves it behind and the
  * next [[open]] repairs by [[rebuild]]ing from the payload — the
  * single source of truth — in one loud O(export) scan. The same
  * repair path adopts manifests-less exports (pre-manifest dirs, bare
  * [[ShuffleShard.writeShards]] output) in place.
  *
  * Bloom discipline mirrors [[BloomContamination]]'s hash family
  * (Kirsch-Mitzenmacher over [[TextOps.hexHash60Pair]],
  * 32-bits-per-long words), but the probe ships as a BROADCAST
  * variable inside a UDF, not a plan literal — no join on the fast
  * path and no multi-MB literal re-deserializing per task. One-sided
  * error means a set id ALWAYS probes positive (a redelivered row can
  * never sneak past) and a false-positive new id merely takes the
  * collect-and-confirm pass — correctness never depends on the
  * filter. The filter doubles and rebuilds from the id table once the
  * id count outgrows ~1% false-positive capacity — amortized O(1) per
  * exported id — and saturates gracefully (more exact confirms, never
  * wrong answers) at the 32 MB cap.
  *
  * Single-writer contract: appends to one export must be serialized
  * (the natural shape — a streaming sink has one query). Two
  * concurrent appenders would race the tails/Bloom swap; the intent
  * marker detects the torn result and the next append repairs, but
  * rows appended by the losing writer could duplicate — serialize
  * writers, don't rely on repair for concurrency.
  */
object ShardManifest {

  /** Probes per id / bits per stored word — [[BloomContamination]]'s
    * overflow-free pairing. */
  private val HashK = 4
  private val WordBits = 32

  /** 2^27 bits = 32 MB stored: the same plan-literal sanity cap as
    * [[BloomContamination.bitsFor]]. */
  private val CapBits = 1 << 27

  /** ~1% fpp at k=4 needs ≈ 10.5 bits/id; 12 leaves regrow margin. */
  private val BitsPerId = 12L

  /** Candidate sets collect to the driver below this row count (the
    * clean-batch/few-redeliveries case: Bloom-positives ≈ fpp·batch);
    * larger (a mass redelivery) falls back to semi/anti joins. */
  private val CollectRows = 100000L

  final case class State(
      spark: SparkSession, outDir: String, idCol: String,
      tails: Map[Int, Long], ids: Long, mBits: Int, bits: Array[Long])

  private def root(outDir: String) = new HPath(outDir, "_graft_manifest")
  private def intentPath(outDir: String) = new HPath(root(outDir), "intent")
  private def statePath(outDir: String) = new HPath(root(outDir), "state")
  private def bloomPath(outDir: String) = new HPath(root(outDir), "bloom")
  private def idsPath(outDir: String) = new HPath(root(outDir), "ids")

  private def fsOf(spark: SparkSession, outDir: String): FileSystem =
    root(outDir).getFileSystem(spark.sessionState.newHadoopConf())

  private def pow2For(ids: Long): Int = {
    val want = math.max(1L << 20, ids * BitsPerId)
    var m = 1L << 20
    while (m < want && m < CapBits) m <<= 1
    math.min(m, CapBits.toLong).toInt
  }

  /** OR-folded sparse Bloom words for the ids in `df(idCol)` —
    * executor-side fold, driver collects ≤ mBits/32 rows. */
  private def wordsOf(df: DataFrame, idCol: String, mBits: Int): Array[(Long, Long)] =
    // h2 div 32 == h2 >> 5 (hashes are nonnegative 60-bit) — keeps
    // h1 + 3·h2d < 2⁶¹, the BloomContamination overflow-free pairing
    df.select(TextOps.hexHash60Pair(col(idCol).cast("string")).as("hp"))
      .select(col("hp")(0).as("h1"), shiftright(col("hp")(1), 5).as("h2d"))
      .select(explode(array((0 until HashK).map(i =>
        (col("h1") + lit(i.toLong) * col("h2d")) % lit(mBits.toLong)): _*)).as("pos"))
      .select(shiftright(col("pos"), 5).as("wi"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(31L)).cast("int")).as("mask"))
      .groupBy(col("wi")).agg(expr("bit_or(mask)").as("word"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Membership probe as a BROADCAST-variable UDF (not a plan
    * literal): a multi-MB literal array re-deserializes inside every
    * task's binary — 32 tasks × 4 references × filter-sized — while a
    * broadcast ships the bits once per executor. Hash/position
    * arithmetic mirrors [[wordsOf]] exactly (same md5 pair, h2 >>> 5,
    * mod mBits), so a set id always probes true. */
  private def probe(
      spark: SparkSession, bits: Array[Long], mBits: Int,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bc = spark.sparkContext.broadcast(bits)
    val m = mBits.toLong
    val might = udf { (s: String) =>
      s != null && {
        val b = bc.value
        val hp = graft.plans.HexHash60Pair.hashPair(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
        val h1 = hp.getLong(0)
        val h2d = hp.getLong(1) >>> 5
        var r = 0
        var all = true
        while (all && r < HashK) {
          val pos = (h1 + r * h2d) % m
          all = (b((pos >>> 5).toInt) & (1L << (pos & 31L).toInt)) != 0L
          r += 1
        }
        all
      }
    }
    might(id.cast("string"))
  }

  /** Atomic-ish directory swap: write to `<target>__tmp`, delete the
    * old target, rename. A crash inside the window loses the target —
    * which [[open]] treats as torn state and repairs. */
  private def swapWrite(fs: FileSystem, target: HPath)(write: String => Unit): Unit = {
    val tmp = new HPath(target.getParent, target.getName + "__tmp")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(target, true)
    require(fs.rename(tmp, target), s"manifest rename failed: $tmp -> $target")
  }

  /** Bloom stored as ONE dense array row (not a cell-per-row table):
    * filter-sized either way, but a single-row read/write skips half a
    * million Row allocations per append. */
  private def writeBloomAndState(
      spark: SparkSession, outDir: String, tails: Map[Int, Long], ids: Long,
      mBits: Int, bits: Array[Long]): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, outDir)
    swapWrite(fs, bloomPath(outDir))(tmp =>
      Seq(Tuple1(bits.toSeq)).toDF("words").repartition(1).write.parquet(tmp))
    swapWrite(fs, statePath(outDir))(tmp =>
      Seq((ids, mBits, tails)).toDF("ids", "m_bits", "tails")
        .repartition(1).write.parquet(tmp))
  }

  private def denseBits(mBits: Int, words: Array[(Long, Long)]): Array[Long] = {
    val bits = new Array[Long](mBits / WordBits)
    words.foreach { case (wi, w) => bits(wi.toInt) = w }
    bits
  }

  /** Rebuild the whole manifest from the payload export (ground
    * truth): O(export) — the repair path for torn appends and the
    * upgrade path for pre-manifest exports. Also the first-batch
    * initializer. */
  def rebuild(spark: SparkSession, outDir: String, idCol: String): Unit = {
    val fs = fsOf(spark, outDir)
    fs.mkdirs(root(outDir))
    // re-entrant: mark intent so a torn REBUILD also repairs
    fs.create(intentPath(outDir), true).close()
    val payload = spark.read.parquet(outDir)
      .select(col(idCol), col("shard"), col("pos"))
    val tails = payload.groupBy(col("shard"))
      .agg((max(col("pos")) + 1).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    swapWrite(fs, idsPath(outDir))(tmp =>
      payload.select(col(idCol)).write.parquet(tmp))
    val idsTable = spark.read.parquet(idsPath(outDir).toString)
    val n = idsTable.count()
    val mBits = pow2For(n)
    writeBloomAndState(spark, outDir, tails, n, mBits,
      denseBits(mBits, wordsOf(idsTable, idCol, mBits)))
    fs.delete(intentPath(outDir), false)
  }

  /** Load the manifest, repairing first when a torn append left its
    * intent marker or no state exists at all. */
  def open(spark: SparkSession, outDir: String, idCol: String): State = {
    val fs = fsOf(spark, outDir)
    if (fs.exists(intentPath(outDir)) || !fs.exists(statePath(outDir))) {
      System.err.println(
        s"graft: shard-append manifest missing or torn under $outDir — " +
          "rebuilding from the payload export")
      rebuild(spark, outDir, idCol)
    }
    val st = spark.read.parquet(statePath(outDir).toString).collect().head
    val mBits = st.getInt(st.fieldIndex("m_bits"))
    val tails = st.getMap[Int, Long](st.fieldIndex("tails")).toMap
    val bits = spark.read.parquet(bloomPath(outDir).toString)
      .collect().head.getSeq[Long](0).toArray
    require(bits.length == mBits / WordBits,
      s"bloom length ${bits.length} != $mBits/$WordBits — torn manifest")
    State(spark, outDir, idCol, tails, st.getLong(st.fieldIndex("ids")), mBits, bits)
  }

  private[graft] def probeForTest(st: State, id: org.apache.spark.sql.Column) =
    probe(st.spark, st.bits, st.mBits, id)

  /** Replay screen: rows of `df` whose id is NOT already exported.
    * Fast path is the per-row Bloom probe (broadcast bits, no join, no
    * export read). Bloom-positive candidates — ≈ fpp·batch on a clean
    * batch, the redelivered rows otherwise — collect to the driver and
    * exact-confirm via one set-membership filter over the manifest's
    * compact id column (the only export-sized touch, skipped when the
    * Bloom stays silent); the confirmed set then screens the batch as
    * another per-row filter. No join anywhere on this path. A mass
    * redelivery (candidates past [[CollectRows]]) falls back to
    * semi/anti joins — that batch genuinely needs the audit scan. */
  def screen(st: State, df: DataFrame, idCol: String): DataFrame = {
    val spark = st.spark
    val cand = df.select(col(idCol).cast("string").as("__id"))
      .filter(probe(spark, st.bits, st.mBits, col("__id")))
      .localCheckpoint(false)
    val nCand = cand.count()
    if (nCand == 0) df
    else if (nCand <= CollectRows) {
      val candSet = cand.collect().map(_.getString(0)).toSet
      val bcCand = spark.sparkContext.broadcast(candSet)
      val inCand = udf((s: String) => s != null && bcCand.value.contains(s))
      val confirmed = spark.read.parquet(idsPath(st.outDir).toString)
        .select(col(idCol).cast("string").as("__id"))
        .filter(inCand(col("__id")))
        .collect().map(_.getString(0)).toSet
      if (confirmed.isEmpty) df
      else {
        val bcConf = spark.sparkContext.broadcast(confirmed)
        val dup = udf((s: String) => s != null && bcConf.value.contains(s))
        df.filter(!dup(col(idCol).cast("string")))
      }
    } else {
      val idsTable = spark.read.parquet(idsPath(st.outDir).toString)
        .select(col(idCol).cast("string").as("__id"))
      val confirmed = idsTable.join(cand, Seq("__id"), "left_semi")
        .localCheckpoint(false)
      if (confirmed.count() == 0) df
      else df.join(confirmed.withColumnRenamed("__id", "__cid"),
        col(idCol).cast("string") === col("__cid"), "left_anti")
    }
  }

  /** WAL-style marker: written before any mutation of payload or
    * manifest; cleared by [[commit]] only after state lands. */
  def writeIntent(st: State): Unit =
    fsOf(st.spark, st.outDir).create(intentPath(st.outDir), true).close()

  /** Fold a committed batch (`fresh`: id + shard + pos, already
    * written to the payload) into the manifest: append ids, OR the
    * batch's Bloom words in (or double + rebuild the filter from the
    * id table when past capacity), advance tails, commit state, clear
    * the intent marker. */
  def commit(st: State, fresh: DataFrame, idCol: String): Unit = {
    val spark = st.spark
    val fs = fsOf(spark, st.outDir)
    fresh.select(col(idCol)).write.mode("append")
      .parquet(idsPath(st.outDir).toString)
    val counts = fresh.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val newIds = st.ids + counts.map(_._2).sum
    val newTails = counts.foldLeft(st.tails) { case (m, (s, n)) =>
      m.updated(s, m.getOrElse(s, 0L) + n)
    }
    val (mBits, bits) =
      if (newIds * BitsPerId > st.mBits.toLong && st.mBits < CapBits) {
        val m = pow2For(newIds)
        (m, denseBits(m,
          wordsOf(spark.read.parquet(idsPath(st.outDir).toString), idCol, m)))
      } else {
        val merged = st.bits.clone()
        wordsOf(fresh, idCol, st.mBits)
          .foreach { case (wi, w) => merged(wi.toInt) |= w }
        (st.mBits, merged)
      }
    writeBloomAndState(spark, st.outDir, newTails, newIds, mBits, bits)
    fs.delete(intentPath(st.outDir), false)
  }
}
