package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured proof of the round-10 batch-proportional claims: the cost
  * of folding a FIXED-size increment must stay (near-)flat while the
  * standing state grows 10× — for both
  * [[graft.operators.ShuffleShard.appendShards]] (manifest screen, no
  * export re-scan) and [[graft.operators.Upsert.scd2Apply]]
  * (touched-keys-only merge, no history re-window).
  *
  * Protocol: build standing state at sizes N and 10N, then time the
  * SAME increment against each (median of `SPARK_GRAFT_SCALE_ITERS`,
  * default 3; state rebuilt before every append sample so each sample
  * appends onto identical state). The ratio t(10N)/t(N) is the
  * headline: ~1 = batch-proportional, ~10 = the operator secretly
  * re-scans its history. Appends a section to SCALING.md.
  */
object AppendScale {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val m = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    math.rint(m * 1000) / 1000
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_append_scale")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "3").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseN = 100000L
    val batchN = 10000L
    // spark.range, never a driver-local Seq: the 1M-row state points
    // must build distributed or the driver heap pays for them
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).toDF("id")
        .withColumn("text", concat(lit("payload"), col("id")))

    // --- appendShards: fixed 10k batch onto 100k vs 1M exports -------
    def appendPoint(n: Long): Double = {
      val samples = (1 to iters).map { it =>
        val dir = s"$out/shards_${n}_$it"
        graft.operators.ShuffleShard.writeShards(rows(1L, n), "id", 32, 5, dir)
        graft.operators.ShardManifest.rebuild(spark, dir, "id")
        val inc = rows(n + 1, n + batchN)
        val t0 = System.nanoTime()
        val appended = graft.operators.ShuffleShard.appendShards(inc, "id", 32, 5, dir)
        val sec = (System.nanoTime() - t0) / 1e9
        require(appended == batchN, s"expected $batchN appended, got $appended")
        sec
      }
      median(samples)
    }
    // warm codegen/JIT on a tiny throwaway export
    appendPoint(1000L)
    val app1 = appendPoint(baseN)
    val app10 = appendPoint(baseN * 10)

    // --- scd2Apply: fixed 10k-key batch onto a 100k-key dimension
    // whose HISTORY grows 10× (15 vs 150 versions/key). Deployment
    // shape (StreamingScd2's storage split): the open snapshot lives
    // apart from closed history, so the apply reads open + batch —
    // never the history. The growth axis is history depth; keys (the
    // open set) stay fixed, because the open set IS the dimension's
    // working state and legitimately scales with keys.
    val dimKeys = 100000L
    def changeLog(keys: Long, rounds: Int) =
      (1 to rounds).map(r =>
        spark.range(1L, keys + 1).toDF("k")
          .withColumn("seq", lit(r))
          .withColumn("status", concat(lit("S"), (col("k") + r) % 5)))
        .reduce(_ unionByName _)
    def applyPoint(rounds: Int): Double = {
      val dim = graft.operators.Upsert.scd2History(
        changeLog(dimKeys, rounds), Seq("k"), Seq("status"), Seq("seq"))
      val openDir = s"$out/open_$rounds"
      dim.filter(col("is_current")).write.mode("overwrite").parquet(openDir)
      val open = spark.read.parquet(openDir)
      val batch = spark.range(1L, batchN + 1).toDF("k")
        .withColumn("seq", lit(rounds + 1)).withColumn("status", lit("NEW"))
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Upsert.scd2Apply(open, batch, Seq("k"), Seq("status"), Seq("seq"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      median(samples)
    }
    applyPoint(2) // warm
    val ap1 = applyPoint(15)
    val ap10 = applyPoint(150)

    def r1(x: Double) = math.rint(x * 100) / 100
    val section =
      f"""
         |## Batch-proportional increments — measured (round 10)
         |
         |Fixed ${batchN}-row increment folded into standing state that
         |grows 10× (median of $iters, local[$cpus]; state rebuilt per
         |sample). Ratio ≈ 1 means the increment's cost does NOT grow
         |with the standing state — the manifest/touched-keys claims,
         |measured:
         |
         || operator | growth axis | small (s) | 10× (s) | ratio |
         ||---|---|---|---|---|
         || `appendShards` (10k rows) | export rows $baseN → ${baseN * 10} | $app1%.2f | $app10%.2f | ${r1(app10 / app1)}× |
         || `scd2Apply` (10k-key batch, stored open snapshot) | history 15 → 150 versions/key ($dimKeys keys) | $ap1%.2f | $ap10%.2f | ${r1(ap10 / ap1)}× |
         |
         |appendShards reads tails + the Bloom (broadcast once per
         |executor, O(bits)) + — only when the Bloom fires — one
         |collect-confirm pass over the compact id column; payload
         |parquet is NEVER read (the corruption spec proves it).
         |scd2Apply in the StreamingScd2 deployment shape reads the
         |key-set-sized open snapshot, never closed history, and its
         |only key exchange is over (touched opens ∪ batch). A ratio
         |near 10× on either row would mean a hidden O(state) re-scan.
         |An earlier draft of this harness measured scd2Apply against a
         |MONOLITHIC in-memory dimension and read 2.6× — that slope was
         |the open-set extraction scanning the whole dimension per
         |apply, which is exactly why the streaming face stores open
         |and closed separately.
         |
         |Reproduce: `sbt "runMain graft.AppendScale /tmp/graft_append_scale"`.
         |""".stripMargin
    val p = Paths.get("SCALING.md")
    Files.writeString(p, Files.readString(p) + section)
    println(section)
    spark.stop()
  }
}
