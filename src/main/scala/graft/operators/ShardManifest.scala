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
  * Bloom discipline mirrors [[BloomContamination]] (same
  * Kirsch-Mitzenmacher probe family over [[TextOps.hexHash60Pair]],
  * 32-bits-per-long words, plan-literal probes — no join on the fast
  * path): one-sided error means a set id ALWAYS probes positive (a
  * redelivered row can never sneak past) and a false-positive new id
  * merely takes the exact-confirm join — correctness never depends on
  * the filter. The filter doubles and rebuilds from the id table once
  * the id count outgrows ~1% false-positive capacity — amortized O(1)
  * per exported id — and saturates gracefully (more exact confirms,
  * never wrong answers) at the 32 MB plan-literal cap.
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

  /** Candidate/confirmed sets broadcast below this row count; larger
    * (a full-batch redelivery of a huge batch) falls back to an
    * un-hinted join and lets AQE plan it. */
  private val BroadcastRows = 4000000L

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

  /** Plan-literal membership probe (no join): true iff all K positions
    * are set — i.e. the id MIGHT be exported already. */
  private def probe(bits: Array[Long], mBits: Int, id: org.apache.spark.sql.Column) = {
    val bitsLit = typedlit(bits.toSeq)
    val hp = TextOps.hexHash60Pair(id.cast("string"))
    val h1 = hp(0)
    val h2d = shiftright(hp(1), 5) // must mirror wordsOf exactly
    (0 until HashK).map { i =>
      val pos = (h1 + lit(i.toLong) * h2d) % lit(mBits.toLong)
      val word = element_at(bitsLit, (shiftright(pos, 5) + 1).cast("int"))
      val mask = call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(31L)).cast("int"))
      word.bitwiseAND(mask) =!= 0
    }.reduce(_ && _)
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

  private def writeBloomAndState(
      spark: SparkSession, outDir: String, tails: Map[Int, Long], ids: Long,
      mBits: Int, words: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, outDir)
    swapWrite(fs, bloomPath(outDir))(tmp =>
      words.toDF("wi", "word").repartition(1).write.parquet(tmp))
    swapWrite(fs, statePath(outDir))(tmp =>
      Seq((ids, mBits, tails)).toDF("ids", "m_bits", "tails")
        .repartition(1).write.parquet(tmp))
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
      wordsOf(idsTable, idCol, mBits).toSeq)
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
    val bits = new Array[Long](mBits / WordBits)
    spark.read.parquet(bloomPath(outDir).toString).collect()
      .foreach(r => bits(r.getLong(0).toInt) = r.getLong(1))
    State(spark, outDir, idCol, tails, st.getLong(st.fieldIndex("ids")), mBits, bits)
  }

  /** Replay screen: rows of `df` whose id is NOT already exported.
    * Fast path is the per-row Bloom probe (no join, no export read);
    * only Bloom-positive candidates — none on a clean batch — take the
    * exact-confirm semi-join against the manifest's id table. */
  def screen(st: State, df: DataFrame, idCol: String): DataFrame = {
    val cand = df.select(col(idCol))
      .filter(probe(st.bits, st.mBits, col(idCol)))
      .localCheckpoint(false)
    val nCand = cand.count()
    if (nCand == 0) df
    else {
      val idsTable = st.spark.read.parquet(idsPath(st.outDir).toString)
      val candSide = if (nCand <= BroadcastRows) broadcast(cand) else cand
      val confirmed = idsTable.join(candSide, Seq(idCol), "left_semi")
        .localCheckpoint(false)
      val nConf = confirmed.count()
      if (nConf == 0) df
      else {
        val confSide =
          if (nConf <= BroadcastRows) broadcast(confirmed) else confirmed
        df.join(confSide, Seq(idCol), "left_anti")
      }
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
    val (mBits, words) =
      if (newIds * BitsPerId > st.mBits.toLong && st.mBits < CapBits) {
        val m = pow2For(newIds)
        (m, wordsOf(spark.read.parquet(idsPath(st.outDir).toString), idCol, m).toSeq)
      } else {
        val merged = st.bits.clone()
        wordsOf(fresh, idCol, st.mBits)
          .foreach { case (wi, w) => merged(wi.toInt) |= w }
        (st.mBits, merged.toSeq.zipWithIndex.collect {
          case (w, i) if w != 0L => (i.toLong, w)
        })
      }
    writeBloomAndState(spark, st.outDir, newTails, newIds, mBits, words)
    fs.delete(intentPath(st.outDir), false)
  }
}
