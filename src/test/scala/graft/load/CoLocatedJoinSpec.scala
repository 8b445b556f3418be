package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Enforces TableLoader's co-located-join contract — until now prose
  * on the `bucketBy` field ("joins on the bucket columns between
  * tables bucketed the same way need NO shuffle"). At 100 TB this is
  * THE repeated-join lever: a fact and dim bucketed by the join key at
  * load time join and aggregate forever after with zero exchanges —
  * the shuffle is paid once, at write, instead of per query.
  *
  * Pinned here, with a negative control so the assertions can't pass
  * vacuously:
  *  - bucketed ⋈ bucketed on the bucket key plans NO shuffle exchange
  *    on either side (sorts are per-partition, exchange-free);
  *  - groupBy on the bucket key aggregates with NO exchange at all
  *    (the partial/final split collapses onto the bucket layout);
  *  - the same join over plain parquet reads DOES shuffle (control);
  *  - results are bit-identical between the two layouts.
  */
class CoLocatedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "smb-join")
  private val dir = "/root/testdata/sf0.001"

  private lazy val tables: Unit = {
    Seq(
      TableLoader.LoadSpec(table = "smb_orders",
        sourcePath = s"$dir/orders.parquet",
        bucketBy = Some((8, Seq("o_custkey")))),
      TableLoader.LoadSpec(table = "smb_customer",
        sourcePath = s"$dir/customer.parquet",
        bucketBy = Some((8, Seq("c_custkey"))))
    ).foreach { spec =>
      val out = TableLoader.load(spark, spec)
      assert(out.status == "PASS", out.message)
    }
  }

  private def plan(df: DataFrame): String = {
    // materialize so AQE finalizes its decisions, then read the final plan
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  private def joined(o: DataFrame, c: DataFrame): DataFrame =
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Exact.dec(col("o_totalprice"))).as("s"))

  // FormattedMode lists each Exchange's keys on a detail line:
  // "Arguments: hashpartitioning(<col>#id, ...)"
  private def hashExchangeKeys(p: String): Seq[String] =
    "Arguments: hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq

  test("bucketed join on the bucket key plans zero shuffle exchanges; plain parquet control shuffles") {
    tables
    // keep the test honest at this tiny scale: broadcast would hide
    // the exchange question entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(joined(spark.table("smb_orders"), spark.table("smb_customer")))
      // the join itself runs exchange-free on the bucket layout; the
      // downstream mktsegment aggregate is the only hash exchange left
      assert(p.contains("SortMergeJoin"), p)
      val exchanges = hashExchangeKeys(p)
      assert(!exchanges.exists(_.contains("custkey")),
        s"join key shuffled despite bucket layout: $exchanges\n$p")

      val control = plan(joined(
        spark.read.parquet(s"$dir/orders.parquet"),
        spark.read.parquet(s"$dir/customer.parquet")))
      val controlExchanges = hashExchangeKeys(control)
      assert(controlExchanges.exists(_.contains("custkey")),
        s"control should shuffle on the join key: $controlExchanges\n$control")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("groupBy on the bucket key aggregates with zero exchanges") {
    tables
    val agg = spark.table("smb_orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
    val p = plan(agg)
    assert(hashExchangeKeys(p).isEmpty, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("bucketed and plain layouts answer bit-identically") {
    tables
    val bucketed = joined(spark.table("smb_orders"), spark.table("smb_customer"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq).toSeq
    val plain = joined(
        spark.read.parquet(s"$dir/orders.parquet"),
        spark.read.parquet(s"$dir/customer.parquet"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq).toSeq
    assert(bucketed == plain)
  }
}
