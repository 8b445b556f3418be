package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{Path => HPath}

/** Deterministic global shuffle + sharding — the last step of a
  * training-data pipeline: examples must reach the trainer in a fixed
  * pseudo-random order, split into a fixed number of shard files, and
  * the (shard, position) of every example must be reproducible from
  * the data alone (re-running the export, resuming a failed one, or
  * appending a corpus increment must never silently reorder what a
  * trainer already consumed — the same determinism contract as
  * [[Sampling.weightedMixture]]).
  *
  * Order is the seeded portable hash of the id: shard = h % shards,
  * position = rank of (h, id) within the shard. Ids, not row content,
  * drive placement, so two exports of the same corpus agree row for
  * row regardless of upstream partitioning.
  *
  * Scale shape: one exchange keyed by shard plus a per-shard sort —
  * the unavoidable minimum, since a totally-ordered shard file IS a
  * sorted partition. Parallelism equals `shards`: size it to the
  * cluster (hundreds-to-thousands of shards at 100 TB, exactly how
  * training shards are sized in practice — shard files are read by
  * data loaders, so their count is a product requirement, not a tuning
  * knob). The 60-bit hash balances shard populations to within
  * multinomial noise; no key skew is possible because ids are unique.
  */
object ShuffleShard {

  /** (id, shard, pos) assignment: pos is 0-based and dense within each
    * shard, ordered by (hash, id) — a total order, so ties from hash
    * collisions cannot reorder between runs. */
  def assign(df: DataFrame, idCol: String, shards: Int, seed: Int): DataFrame = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("id"))
    df.select(col(idCol).as("id"))
      .withColumn("h", TextOps.hexHash60(seed, col("id").cast("string")))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("id"), col("shard"), col("pos"))
  }

  /** Export face: write one directory per shard with rows in shard
    * order (parquet preserves within-file row order, so a loader
    * reading shard=k gets positions 0..n-1 in sequence). The
    * assignment columns are computed INLINE on the payload rows — one
    * scan, no self-join — and the pre-write exchange is RANGE
    * partitioning on the shard id: ranges keep equal shard values
    * together and assign shard ids to tasks near-1:1, where a hash
    * exchange would collide ~37% of shard ids into shared tasks and
    * leave as many write slots empty. The 1:1 task-to-shard mapping
    * (and thus "≤ 1 file per shard directory") is BEST-EFFORT:
    * repartitionByRange samples boundaries, so heavily skewed shard
    * populations can co-locate two shard values in one task — output
    * order within each shard directory is still correct (the
    * per-partition sort leads with `shard`), those two shards' files
    * are just written serially by the shared task. */
  def writeShards(
      df: DataFrame, idCol: String, shards: Int, seed: Int, outDir: String): Unit = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    df.withColumn("h", TextOps.hexHash60(seed, col(idCol).cast("string")))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("h")
      .repartitionByRange(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** APPEND-mode export — the incremental half of the scaladoc's
    * determinism contract: rows already exported NEVER move (their
    * (shard, pos) is immutable) and never duplicate; new rows land in
    * their deterministic shard (same seeded hash as [[writeShards]])
    * at positions following the shard's existing tail, ordered by
    * (hash, id) within the increment. Equivalently: appending batch B
    * to an export of batch A yields, per shard, A's one-shot layout as
    * the position prefix and B's one-shot layout (offset by the prefix
    * length) as the suffix.
    *
    * Replay safety at BATCH-PROPORTIONAL cost (the append manifest):
    * an at-least-once upstream (a restarted stream re-delivering a
    * micro-batch) appends each row exactly once, and the screen no
    * longer re-scans the prior export per batch. A manifest beside the
    * payload (`_graft_manifest/`) carries (a) the per-shard tail
    * positions, (b) a serialized Bloom filter over every exported id,
    * and (c) an append-only id-column table. A steady-state append
    * reads O(batch + manifest): tails and Bloom words are
    * filter-sized, the batch probes the Bloom through a
    * broadcast-variable UDF (no join, bits shipped once per
    * executor), and only the Bloom-POSITIVE candidates —
    * empty on a clean batch, redelivered/false-positive ids otherwise
    * — are exactly confirmed against the id table (no false positive
    * ever drops a genuinely-new row; no set id ever sneaks past). The
    * payload parquet is never read on the append path. The Bloom
    * doubles and rebuilds from the id table whenever the id count
    * outgrows ~1% false-positive capacity (amortized O(1) per id,
    * capped at 32 MB stored — past that the filter saturates
    * gracefully into more exact confirms, never incorrectness).
    *
    * Torn-append safety: each append writes a WAL-style intent marker
    * first and clears it only after payload, ids, Bloom, and state all
    * commit (state last, via temp + rename). A crash in between leaves
    * the marker, and the next append REBUILDS the manifest from the
    * payload — the single source of truth — in one loud O(export)
    * repair scan. A missing manifest (pre-manifest exports, or a
    * directory produced by bare [[writeShards]]) takes the same repair
    * path, so old exports upgrade in place.
    *
    * A missing `outDir` degrades to [[writeShards]] (first batch of a
    * stream). Returns the number of rows actually appended.
    *
    * Ordered-read note: each append adds new parquet files to a shard
    * directory; WITHIN each file rows are position-ordered, but a
    * multi-file shard must be read ordered by `pos` (or file-by-file
    * in append order) — Spark's scan does not promise cross-file
    * order. One-shot [[writeShards]] exports keep the ≤-1-file-per-
    * shard fast path. */
  def appendShards(
      df: DataFrame, idCol: String, shards: Int, seed: Int, outDir: String): Long = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    // within-batch id uniqueness is part of the never-duplicate
    // contract: the replay screen dedups against PRIOR exports only,
    // so two rows sharing an id inside ONE batch would both land (at
    // distinct positions). Refuse the batch loudly — silently picking
    // a survivor would make the export depend on partition order. One
    // batch-sized aggregate; the export is never touched.
    val dups = df.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count()
    require(dups == 0,
      s"appendShards: duplicate '$idCol' values within one batch — " +
        "dedup upstream (ids must be unique per batch)")
    val spark = df.sparkSession
    val p = new HPath(outDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      val n = df.count()
      // an EMPTY first batch must not create the directory: a 0-row
      // partitioned write emits no parquet files, and the schema-less
      // dir would poison every later append's read-back (routine on
      // stream start when the whole first micro-batch fails upstream
      // gates)
      if (n > 0) {
        writeShards(df, idCol, shards, seed, outDir)
        ShardManifest.rebuild(spark, outDir, idCol)
      }
      return n
    }
    val st = ShardManifest.open(spark, outDir, idCol)
    val screened = ShardManifest.screen(st, df, idCol)
    val tailsLit = typedlit(st.tails)
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    val fresh = screened
      .withColumn("h", TextOps.hexHash60(seed, col(idCol).cast("string")))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("rk", (row_number().over(w) - 1).cast("long"))
      .withColumn("pos",
        coalesce(element_at(tailsLit, col("shard")), lit(0L)) + col("rk"))
      .drop("h", "rk")
      .cache()
    try {
      val n = fresh.count()
      if (n > 0) {
        ShardManifest.writeIntent(st)
        fresh.repartitionByRange(shards, col("shard"))
          .sortWithinPartitions(col("shard"), col("pos"))
          .write.mode("append").partitionBy("shard").parquet(outDir)
        ShardManifest.commit(st, fresh, idCol)
      }
      n
    } finally fresh.unpersist()
  }
}
