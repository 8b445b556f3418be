package graft.translate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One error-classification rule: match a field by equality or substring,
  * optionally case-insensitive.
  *
  * Semantics follow the reference's translation-report rule filter
  * (`src/common_utils/csv_utils.py:43-78`): a row matches the rule set if
  * ANY rule matches (OR-fold); `matchType` ∈ {equals, contains}.
  * Instead of evaluating row dicts in a driver loop, rules compile to one
  * Catalyst [[Column]] predicate so the filter runs codegen'd inside the
  * scan and pushes down where possible.
  */
final case class FilterRule(
    field: String,
    matchType: String,
    value: String,
    caseSensitive: Boolean = true) {

  def toColumn: Column = {
    val (c, v) =
      if (caseSensitive) (col(field), lit(value))
      else (lower(col(field)), lit(value.toLowerCase))
    matchType.toLowerCase match {
      case "equals"   => c === v
      case "contains" => c.contains(v)
      case other =>
        throw new IllegalArgumentException(s"unknown matchType: $other")
    }
  }
}

/** OR-fold of [[FilterRule]]s (reference `csv_utils.py:49-78`). */
final case class FilterRules(rules: Seq[FilterRule]) {
  require(rules.nonEmpty, "empty rule list")
  def toColumn: Column = rules.map(_.toColumn).reduce(_ || _)
}

/** `FIELD=KEYWORD,...` any-match pattern filter
  * (reference `csv_utils.py:22-40`): row passes if any (field, keyword)
  * pair matches exactly. Compiles to one OR-folded Column predicate.
  */
final case class PatternFilter(pairs: Seq[(String, String)]) {
  require(pairs.nonEmpty, "empty pattern list")
  def toColumn: Column =
    pairs.map { case (f, k) => col(f) === lit(k) }.reduce(_ || _)

  def filterSpec: String = pairs.map { case (f, k) => s"$f=$k" }.mkString(",")
}

object PatternFilter {
  /** Parse the reference's `FIELD=KEYWORD,FIELD=KEYWORD` spec string. */
  def parse(spec: String): PatternFilter =
    PatternFilter(spec.split(",").toSeq.map { p =>
      val Array(f, k) = p.split("=", 2)
      (f.trim, k.trim)
    })
}
