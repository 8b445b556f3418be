package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Registry over the driver-generated parquet tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. All engine
  * queries read through here so the read path (format options, pruning) is
  * centralized. `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4
  * refuses by default — we read it as long (legacy conf) and convert to a
  * microsecond timestamp with integer division (ns values exceed 2^53, so
  * double division would lose precision).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
