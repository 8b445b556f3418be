package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for pipeline runs that must be reproducible
  * (and auditable) across engines, runs, and cluster sizes — the
  * property `ORDER BY rand() LIMIT k` lacks.
  *
  * Both forms rank rows by the portable md5-derived
  * [[TextOps.hexHash60]] of the row id: a uniform pseudo-random order
  * that every engine computes identically. Bottom-k by hash is the
  * classic KMV construction — mergeable (bottom-k of a union is the
  * bottom-k of merged per-partition bottom-k's, which is exactly what
  * Spark's TakeOrderedAndProject computes: no full sort, no full
  * shuffle, O(k) state per partition).
  */
object Sampling {

  /** The k rows with the smallest id-hash. Adds `sample_rank` (1-based). */
  def bottomK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    val h = TextOps.hexHash60(col(idCol).cast("string"))
    // window over a single ordered partition would serialize; orderBy +
    // limit lets Spark take per-partition top-k and merge k·P rows.
    // The post-limit rank window runs over ≤ k rows — partitionBy a
    // constant (one explicit partition) rather than an empty spec, so
    // the bounded window doesn't trip WindowExec's move-everything-to-
    // one-partition warning on every run
    df.withColumn("sample_h", h)
      .orderBy(col("sample_h"), col(idCol))
      .limit(k)
      .withColumn("sample_rank",
        row_number().over(
          Window.partitionBy(lit(0)).orderBy(col("sample_h"), col(idCol))))
      .drop("sample_h")
  }

  /** Per-group deterministic sample of k rows (stratified): hash-rank
    * within each group partition — one shuffle on the group key. */
  def stratified(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    val h = TextOps.hexHash60(col(idCol).cast("string"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("sample_h"), col(idCol))
    df.withColumn("sample_h", h)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("sample_h")
  }

  /** Rate-based deterministic mixture sampling — the corpus-MIXING
    * primitive (domain weights): keep each row of stratum s with
    * probability `rates(s)` (else `defaultRate`), decided by comparing
    * the seeded portable id-hash against `rate · 2⁶⁰`. Unlike
    * [[stratified]] (fixed count per group, needs a per-group shuffle)
    * this is a pure per-row filter — NO shuffle, no window, fully
    * codegen'd — and the keep-decision for a given (seed, id) never
    * changes as the corpus grows, so incremental runs are consistent
    * with full reruns. Rates are a small when-chain literal (domain
    * weight tables are tens of entries); rate 1.0 keeps everything
    * (2⁶⁰ exceeds every 60-bit hash), rate 0.0 keeps nothing. */
  def weightedMixture(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double, seed: Int): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    def threshold(r: Double) = lit((r * (1L << 60).toDouble).toLong)
    val thr = rates.foldLeft(threshold(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, threshold(r)).otherwise(acc)
    }
    val h = TextOps.hexHash60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    df.filter(h < thr)
  }

  /** Rate-based deterministic UPSAMPLING — the other half of the
    * corpus-mixing contract: [[weightedMixture]] expresses rates in
    * [0, 1] (drop-only); training mixes also repeat scarce domains
    * (rate 2.5 = every row twice, plus a third copy for a
    * deterministic 50% of rows). Row (s, id) yields
    * `floor(rate(s))` copies plus one more iff the seeded portable
    * id-hash falls under `frac(rate(s)) · 2⁶⁰` — so expected copies
    * equal the rate exactly, the keep/repeat decision for a given
    * (seed, id) never changes as the corpus grows (incremental-run
    * consistent, same argument as weightedMixture), and rate ≤ 1
    * degenerates to weightedMixture with a `copy_idx` 0 column.
    * Pure per-row explode of a bounded sequence — no shuffle; output
    * is input columns + `copy_idx` (0-based within the row's copies).
    * Rows whose stratum rates 0 copies disappear before the explode. */
  def weightedUpsample(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double, seed: Int): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 100),
      "rates must be in [0, 100]")
    def base(r: Double) = lit(math.floor(r).toLong)
    def thr(r: Double) = lit(((r - math.floor(r)) * (1L << 60).toDouble).toLong)
    val baseC = rates.foldLeft(base(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, base(r)).otherwise(acc)
    }
    val thrC = rates.foldLeft(thr(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, thr(r)).otherwise(acc)
    }
    val h = TextOps.hexHash60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    df.withColumn("n_copies", baseC + when(h < thrC, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      // sequence(0, n-1) is safe here: n_copies >= 1 is enforced by the
      // filter above, so the sequence never runs backwards
      .withColumn("copy_idx", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Temperature-rebalancing keep rates (the multilingual α-sampling
    * of XLM-R/mBERT): expected kept count per stratum ∝ count^α, so
    * dominant languages thin toward the scarce ones as α → 0 and
    * nothing changes at α = 1. Normalized downsample-only (the
    * smallest stratum keeps rate 1): r_s = (c_min / c_s)^(1−α).
    * α = 0.5 computes via `sqrt` — correctly rounded IEEE, so the
    * rates (and the integer thresholds derived from them) are
    * bit-identical on any engine; other α use `pow`, whose libm
    * rounding is NOT portable — fine for production use, excluded
    * from the oracle contract. */
  def temperatureRates(counts: Map[String, Long], alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"need alpha in [0, 1], got $alpha")
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "temperatureRates needs positive per-stratum counts")
    val cmin = counts.values.min.toDouble
    counts.map { case (s, c) =>
      val ratio = cmin / c
      s -> (if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1 - alpha))
    }
  }

  /** Temperature-rebalanced corpus sampling: one tiny per-stratum
    * count aggregate (#strata rows to the driver — the BPE/perceptron
    * driver-round shape), rates derived by [[temperatureRates]], then
    * the pure per-row seeded-hash filter of [[weightedMixture]] — no
    * corpus shuffle, incremental-run consistent for fixed rates. Note
    * the rates themselves shift as the corpus grows (they depend on
    * the counts); pin them explicitly via weightedMixture when
    * incremental stability across ingestion batches matters. */
  def temperatureSample(
      df: DataFrame, strataCol: String, idCol: String,
      alpha: Double, seed: Int): DataFrame = {
    val rows = df.groupBy(col(strataCol)).count().collect()
    // a null stratum would become a map key no when(col === s) chain can
    // ever match (null === never matches), silently falling through to
    // defaultRate — fail loudly instead; callers coalesce to a sentinel
    require(rows.forall(!_.isNullAt(0)),
      s"temperatureSample: stratum column '$strataCol' carries nulls — " +
        "coalesce them to a sentinel stratum before sampling")
    val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    weightedMixture(df, strataCol, idCol,
      temperatureRates(counts, alpha), defaultRate = 1.0, seed = seed)
  }

  /** Integer 60-bit thresholds for an ordered fraction list — the
    * first split claims h < thr(f₁), the next h < thr(f₁+f₂), …; the
    * LAST split is the unconditional remainder, so floating-point
    * rounding of the cumulative sums can never open an unassigned gap.
    * Shared with the DuckDB oracle generator so an edit to the
    * fractions cannot desynchronize the engines. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => (c * (1L << 60).toDouble).toLong)

  /** Deterministic k-way corpus split (train/val/test): each row's
    * seeded portable id-hash picks the first split whose cumulative
    * threshold exceeds it. Membership depends only on (seed, id) —
    * growing the corpus never reassigns an existing row (the same
    * incremental-consistency contract as [[weightedMixture]]), which
    * is what keeps a held-out set held out across pipeline re-runs.
    * Pure per-row filter expression: no shuffle, no state. Adds a
    * `split` column. */
  def splitAssign(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)], seed: Int): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = TextOps.hexHash60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val expr = splits.init.zip(splitThresholds(splits))
      .foldRight(lit(splits.last._1)) { case (((name, _), t), acc) =>
        when(h < t, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Proportional interleave key — weighted-fair-queueing order for
    * curriculum mixing: stratum s with integer weight w(s) should
    * contribute every w(s)-th row of the merged stream, so row k
    * (0-based within its stratum, id order) gets virtual finish time
    * `(k+1) / w(s)`; sorting by (ikey, stratum, pos) yields the
    * proportional round-robin schedule. The key is one exact integer
    * division per row (correctly-rounded IEEE — portable), so the
    * schedule is deterministic and any consumer can materialize it
    * with a plain sort. Adds (pos, ikey); the only shuffle is the
    * per-stratum rank — the GLOBAL sort is deliberately left to the
    * consumer (a range-partitioned write, a pk1-style block rank),
    * because emitting a global position here would hide a
    * single-partition window inside an operator. */
  def proportionalInterleave(
      df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Int], defaultWeight: Int): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(_ >= 1),
      "interleave weights must be >= 1")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, x)) =>
      when(col(strataCol) === s, lit(x)).otherwise(acc)
    }
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol))
    df.withColumn("pos", (row_number().over(rank) - 1).cast("long"))
      .withColumn("ikey", (col("pos") + 1).cast("double") / w.cast("double"))
  }
}
