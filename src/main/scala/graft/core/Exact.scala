package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregation helpers.
  *
  * Double sums are not associative, so a distributed sum over doubles can
  * differ in the last bits from a single-threaded oracle. Casting inputs to
  * decimal before aggregating makes the sum exact and partition-order
  * independent; the final cast back to double then yields bit-identical
  * values on any engine. Used by every query that must hash-match the
  * DuckDB oracle.
  */
object Exact {
  /** Cast to an exact decimal. p/s chosen to cover testdata ranges
    * (prices < 1e6, quantities < 100, 2-decimal inputs). */
  def dec(c: Column, p: Int = 18, s: Int = 4): Column = c.cast(DecimalType(p, s))

  /** Exact sum surfaced as double. Oracle mirror:
    * CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average as double (sum/count both exact before the division).
    * Oracle mirror: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x) */
  def avgd(c: Column): Column = sum(dec(c)).cast("double") / count(c)
}
