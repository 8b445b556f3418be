package graft.load

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.AuditSink

/** Streaming durability: state survives a stop/restart from the
  * checkpoint, replayed batches stay exactly-once through the audit
  * anti-join, and the whole stack runs on the RocksDB state store
  * (the 100 TB configuration — state spills off-heap instead of
  * living in executor memory).
  */
class DurabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "durability-test")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeFile(dir: String, name: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    val stage = tmp("stage")
    rows.toDF("k", "v").coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
    val part = Files.list(java.nio.file.Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.copy(java.nio.file.Paths.get(part), java.nio.file.Paths.get(s"$dir/$name"))
  }

  /** One AvailableNow pass of a stateful running count over `srcDir`,
    * recording each batch's output rows into `sink`. */
  private def runCounts(srcDir: String, ck: String, sink: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("k STRING, v BIGINT")
      .parquet(srcDir)
      .groupBy(col("k")).agg(sum(col("v")).as("total"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Update)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.withColumn("batch", lit(batchId))
          .write.mode(SaveMode.Append).saveAsTable(sink)
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("stateful aggregation state survives stop + restart from checkpoint") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS sdur")
    val src = tmp("cksrc"); val ck = tmp("ckstate")
    writeFile(src, "f1.parquet", Seq(("a", 2L), ("a", 3L)))
    runCounts(src, ck, "sdur.counts")
    // restart: new file arrives; batch 1 must see ONLY f2's rows but
    // fold them into the RECOVERED state (a: 5 + 4 = 9), not recompute
    writeFile(src, "f2.parquet", Seq(("a", 4L), ("b", 7L)))
    runCounts(src, ck, "sdur.counts")
    val rows = spark.table("sdur.counts")
      .groupBy(col("k")).agg(max_by(col("total"), col("batch")).as("total"))
      .as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 9L, "b" -> 7L), rows.toString)
  }

  test("retried micro-batch stays exactly-once through the audit anti-join") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS sdur2")
    val audit = new AuditSink(spark, "sdur2_logs")
    val inc = new IncrementalLoader(spark, audit, "inc_audit")
    val src = tmp("retrysrc")
    writeFile(src, "f1.parquet", Seq(("a", 1L), ("b", 2L)))
    // _metadata.file_path, like the production stream: input_file_name()
    // is unreliable once the scan is under a join
    val batch = spark.read.schema("k STRING, v BIGINT").parquet(src)
      .select(col("*"), col("_metadata.file_path").as("file_path"))
    // simulate a foreachBatch retry AFTER the append landed but BEFORE
    // the checkpoint committed: the same batch arrives twice
    inc.processBatch(batch, "sdur2.t")
    inc.processBatch(batch, "sdur2.t")
    assert(spark.table("sdur2.t").count() == 2)
    // and a full re-run from a lost checkpoint re-delivers everything —
    // still no duplicates
    inc.runOnce(src, org.apache.spark.sql.types.StructType.fromDDL("k STRING, v BIGINT"),
      "sdur2.t", tmp("freshck"))
    assert(spark.table("sdur2.t").count() == 2)
  }

  test("stateful recovery runs on the RocksDB state store") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS sdur3")
      val src = tmp("rocksrc"); val ck = tmp("rockck")
      writeFile(src, "f1.parquet", Seq(("x", 10L)))
      runCounts(src, ck, "sdur3.counts")
      writeFile(src, "f2.parquet", Seq(("x", 5L), ("y", 1L)))
      runCounts(src, ck, "sdur3.counts")
      val rows = spark.table("sdur3.counts")
        .groupBy(col("k")).agg(max_by(col("total"), col("batch")).as("total"))
        .as[(String, Long)].collect().toMap
      assert(rows == Map("x" -> 15L, "y" -> 1L), rows.toString)
      // the checkpoint actually used RocksDB (its per-partition dirs
      // exist under the state store path)
      val stateDir = java.nio.file.Paths.get(s"$ck/state")
      assert(Files.exists(stateDir))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
