package graft.translate

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FilterRulesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("2", "test")
  import spark.implicits._

  val df = Seq(
    ("Syntax error near FROM", "ERROR"),
    ("permission denied", "WARNING"),
    ("ok", "INFO")).toDF("message", "severity")

  test("equals rule, case-sensitive") {
    val r = FilterRules(Seq(FilterRule("severity", "equals", "ERROR")))
    assert(df.filter(r.toColumn).count() == 1)
  }

  test("equals rule, case-insensitive") {
    val r = FilterRules(Seq(FilterRule("severity", "equals", "error", caseSensitive = false)))
    assert(df.filter(r.toColumn).count() == 1)
  }

  test("contains rule OR-folds across rules") {
    val r = FilterRules(Seq(
      FilterRule("message", "contains", "syntax", caseSensitive = false),
      FilterRule("severity", "equals", "WARNING")))
    assert(df.filter(r.toColumn).count() == 2)
  }

  test("unknown matchType throws") {
    intercept[IllegalArgumentException] {
      FilterRules(Seq(FilterRule("x", "regex", "y"))).toColumn
    }
  }

  test("pattern filter parse + match") {
    val p = PatternFilter.parse("severity=INFO,severity=WARNING")
    assert(df.filter(p.toColumn).count() == 2)
    assert(p.filterSpec == "severity=INFO,severity=WARNING")
  }
}
