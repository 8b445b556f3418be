package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located IVM stores (round 14): the one per-batch shuffle the
  * invertible folds still paid was the STORE side of the
  * aggregate-frame merge — `counts0.join(deltaAgg, pairCols,
  * "full_outer")` re-hashes the whole store every batch even though
  * the delta is tiny. TableLoader's bucketBy contract
  * (CoLocatedJoinSpec) exists precisely for repeated same-key joins:
  * persist the store BUCKETED BY the merge keys and the merge reads it
  * shuffle-free forever after — only the delta-sized side exchanges,
  * to the store's own bucket count.
  *
  * Pinned here with flat-parquet controls so the assertions can't pass
  * vacuously, for the two merge shapes the family uses: IvmTopK's
  * pair-keyed counts store and IvmJoin.foldAggSigned's group-keyed
  * aggregate store. Results bit-identical across layouts.
  */
class IvmStoreCoLocationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "ivm-smb")

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  // bucket count == the session's shuffle-partition count (4): the
  // delta aggregate's own exchange then already satisfies the join's
  // distribution at the store's bucketing, so the bucketed plan pays
  // exactly ONE exchange (the delta agg's) and the flat control TWO
  // (delta agg + the store-sized re-hash). A production deployment
  // sizes buckets to its standing shuffle parallelism the same way.
  /** Exchange nodes in the FINAL (AQE-decided) plan tree only — the
    * formatted string also carries the Initial Plan tree and a shared
    * node-detail list, both of which would double-count. */
  private def finalPlanExchanges(p: String): Int = {
    val start = p.indexOf("== Final Plan ==")
    val end = p.indexOf("== Initial Plan ==")
    val sec = if (start >= 0 && end > start) p.substring(start, end) else p
    "Exchange \\(\\d".r.findAllIn(sec).length
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("IvmTopK counts store bucketed by the pair key merges with ONE exchange (the delta's); flat store pays two") {
    import spark.implicits._
    val pairs = spark.range(0L, 5000L)
      .select((col("id") % 50).as("g"), col("id").as("ck"),
        (lit(1L) + col("id") % 7).as("cnt"))
    val flatDir = java.nio.file.Files.createTempDirectory("tk-flat").toString
    pairs.write.mode("overwrite").parquet(flatDir)
    pairs.write.mode("overwrite").bucketBy(4, "g", "ck")
      .sortBy("g", "ck").saveAsTable("smb_tk_counts")

    val delta = ((0 until 200).map(i => (i.toLong % 50, 1000000L + i, "I")) ++
      (0 until 200).map(i => (i.toLong % 50, i.toLong, "D")))
      .toDF("g", "ck", "op")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def counts1(store: DataFrame): DataFrame =
        IvmTopK.fold(Some((IvmTopK.viewOf(store, Seq("g"), "ck", 3), store)),
          delta, Seq("g"), "op", "ck", 3)._2
      val bucketed = counts1(spark.table("smb_tk_counts"))
      val pB = plan(bucketed)
      assert(pB.contains("Bucketed: true"), pB)
      val flat = counts1(spark.read.parquet(flatDir))
      val pF = plan(flat)
      // the store leg reads exchange-free: the scan feeds the merge
      // join through a per-partition sort only, so the bucketed plan
      // carries exactly ONE FEWER (g…)-keyed exchange than the flat
      // control — the store-sized one. (The delta side legitimately
      // keeps its own: the partial aggregate plus the re-shuffle to
      // the store's bucket count — both delta-sized.)
      val (nB, nF) = (finalPlanExchanges(pB), finalPlanExchanges(pF))
      assert(nB == nF - 1,
        s"store leg still shuffles: bucketed=$nB flat=$nF\n$pB")
      assert(sorted(bucketed) == sorted(flat))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS smb_tk_counts")
    }
  }

  test("IvmJoin.foldAggSigned's aggregate store bucketed by the group merges shuffle-free on the store leg") {
    import spark.implicits._
    // counts >= 2 per group so a single delete never zeroes a group
    // (a zeroed group with a remainder sum is the fold's own loud
    // contract violation — not what this plan pin is about)
    val stored = spark.range(0L, 2000L)
      .select(col("id").as("nation"), (col("id") % 11 + 2).as("n"),
        (col("id") % 100).cast("decimal(28,4)").as("s"))
    val flatDir = java.nio.file.Files.createTempDirectory("agg-flat").toString
    stored.write.mode("overwrite").parquet(flatDir)
    stored.write.mode("overwrite").bucketBy(4, "nation")
      .sortBy("nation").saveAsTable("smb_agg_store")

    val delta = (0 until 300).map(i =>
      (i.toLong % 2000, (i % 13).toDouble, if (i % 3 == 0) "D" else "I"))
      .toDF("nation", "price", "op")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def folded(store: DataFrame): DataFrame =
        IvmJoin.foldAggSigned(Some(store), delta, Seq("nation"), "price", "op")
      val bucketed = folded(spark.table("smb_agg_store"))
      val pB = plan(bucketed)
      assert(pB.contains("Bucketed: true"), pB)
      val flat = folded(spark.read.parquet(flatDir))
      val pF = plan(flat)
      val (nB, nF) = (finalPlanExchanges(pB), finalPlanExchanges(pF))
      assert(nB == nF - 1,
        s"store leg still shuffles: bucketed=$nB flat=$nF\n$pB")
      assert(sorted(bucketed.select(col("nation"), col("n"),
          col("s").cast("double"))) ==
        sorted(flat.select(col("nation"), col("n"),
          col("s").cast("double"))))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS smb_agg_store")
    }
  }
}
