package graft.validate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** DVT-style schema validation (SURVEY §2.5 A9).
  *
  * Reference semantics: DVT `--type Schema` with `--exclusion-columns`
  * and an `--allow-list` of permitted type coercions
  * (`validation_dag.py:82-86`). Compares two schemas column-by-column
  * (a full outer "join" on column name) and reports
  * source_only/target_only/type_mismatch/pass per column. Schemas are
  * driver-side metadata (a few hundred entries at most), so this is a
  * plain Scala computation surfaced as a DataFrame for the audit sink.
  */
object SchemaValidator {

  final case class ColumnCheck(
      column_name: String,
      source_type: String,
      target_type: String,
      validation_status: String)

  /** Canonical type spelling (Spark `simpleString`, lowercased). */
  private def types(s: StructType): Map[String, String] =
    s.fields.map(f => f.name.toLowerCase -> f.dataType.simpleString).toMap

  def compare(
      source: StructType,
      target: StructType,
      exclusionColumns: Set[String] = Set.empty,
      allowList: Map[String, Set[String]] = Map.empty): Seq[ColumnCheck] = {
    val excl = exclusionColumns.map(_.toLowerCase)
    val s = types(source) -- excl
    val t = types(target) -- excl
    (s.keySet ++ t.keySet).toSeq.sorted.map { name =>
      (s.get(name), t.get(name)) match {
        case (Some(st), None) => ColumnCheck(name, st, null, "source_only")
        case (None, Some(tt)) => ColumnCheck(name, null, tt, "target_only")
        case (Some(st), Some(tt)) if st == tt =>
          ColumnCheck(name, st, tt, "pass")
        case (Some(st), Some(tt)) if allowList.getOrElse(st, Set.empty)(tt) =>
          ColumnCheck(name, st, tt, "pass")
        case (Some(st), Some(tt)) => ColumnCheck(name, st, tt, "type_mismatch")
        case (None, None) => throw new IllegalStateException(name)
      }
    }
  }

  def validate(spark: SparkSession, source: DataFrame, target: DataFrame,
      exclusionColumns: Set[String] = Set.empty,
      allowList: Map[String, Set[String]] = Map.empty): DataFrame = {
    import spark.implicits._
    compare(source.schema, target.schema, exclusionColumns, allowList).toDF()
  }
}
