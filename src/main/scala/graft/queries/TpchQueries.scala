package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Exact._
import graft.core.Tables

/** TPC-H-style analytical headliners over the testdata star schema —
  * the query surface the reference migrates/validates (its e2e corpus
  * is the TPC-H DDL set). These exercise multi-join planning where the
  * scale answer is explicit broadcasts of the small dimensions
  * (region/nation/customer-side) against the lineitem fact table, with
  * filters pushed into every scan.
  */
object TpchQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3-shaped: shipping priority — fact × two dims, grouped revenue
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = T(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      li.join(broadcast(ord.join(broadcast(cust),
          col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(8,4)") -
          col("l_discount").cast("decimal(8,4)"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    // Q5-shaped: local supplier volume — 5-way join, dims broadcast
    "q5_local_volume" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val cust = T(s, dir, "customer")
      val supp = T(s, dir, "supplier")
      val nat = T(s, dir, "nation")
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(8,4)") -
          col("l_discount").cast("decimal(8,4)"))).cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),
    // Q10-shaped: returned-item customer ranking
    "q10_returned_items" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val cust = T(s, dir, "customer")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(8,4)") -
          col("l_discount").cast("decimal(8,4)"))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }))

  private val rev =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         | $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_volume" ->
      s"""SELECT n_name, $rev AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_mktsegment, $rev AS revenue,
         | COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01'
         |  AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY c_custkey, c_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
