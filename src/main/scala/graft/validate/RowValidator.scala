package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DVT-style row-hash validation (SURVEY §2.5 A8).
  *
  * Reference semantics: DVT `--type Row` with `--hash`/`--concat` over
  * comparison fields joined on `--primary-keys`
  * (`validation_dag.py:100-114`), optional `use-random-row` sampling.
  * Each side computes `sha2(concat_ws('||', fields), 256)` inside the
  * scan (whole-stage codegen), then a shuffle join on the primary key
  * compares hashes. At scale this is the dominant cost pattern of the
  * engine — one hash pass + one co-partitioned join; both sides shuffle
  * on the same key so AQE can coalesce, and the hash (32 bytes) replaces
  * wide row payloads in the shuffle.
  */
object RowValidator {

  /** `sha2(concat_ws('||', cols), 256)` — the DVT row fingerprint.
    * Callers are responsible for casting non-string columns to a
    * deterministic string form first (integers are safe as-is; format
    * doubles/timestamps explicitly). */
  def rowHash(cols: Seq[Column]): Column =
    sha2(concat_ws("||", cols: _*), 256)

  /** Compare `source` vs `target` row-by-row on `compareCols`, joined on
    * `primaryKeys`. Returns pk cols + `source_hash`, `target_hash`,
    * `validation_status` ∈ match|mismatch|source_only|target_only. */
  def validate(
      source: DataFrame,
      target: DataFrame,
      primaryKeys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val s = source.select(
      primaryKeys.map(col) :+ rowHash(compareCols.map(col)).as("source_hash"): _*)
    val t = target.select(
      primaryKeys.map(col) :+ rowHash(compareCols.map(col)).as("target_hash"): _*)
    s.join(t, primaryKeys, "full_outer")
      .withColumn("validation_status",
        when(col("source_hash").isNull, "target_only")
          .when(col("target_hash").isNull, "source_only")
          .when(col("source_hash") === col("target_hash"), "match")
          .otherwise("mismatch"))
  }

  /** Random-row sampling variant (`use-random-row`, batch size n):
    * validates a seeded random sample of source keys. Sampling happens on
    * the source keys only, then a semi-join restricts both sides — the
    * full-table hash pass is avoided. */
  def validateSample(
      source: DataFrame,
      target: DataFrame,
      primaryKeys: Seq[String],
      compareCols: Seq[String],
      sampleSize: Int,
      seed: Long = 42L): DataFrame = {
    val keys = source.select(primaryKeys.map(col): _*)
      .orderBy(rand(seed)).limit(sampleSize)
    validate(
      source.join(broadcast(keys), primaryKeys, "left_semi"),
      target.join(broadcast(keys), primaryKeys, "left_semi"),
      primaryKeys, compareCols)
  }
}
