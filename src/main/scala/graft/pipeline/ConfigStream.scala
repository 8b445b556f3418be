package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-driven config ingestion (SURVEY §2.9; reference
  * `event_listener/main.py:14,42-60` + `controller_dag.py:56-84`).
  *
  * The reference listens to storage OBJECT_FINALIZE events on json
  * drops under `config/{ddl,sql,dml,data}/` and rejects bad folders or
  * extensions before triggering the controller. Spark-first equivalent:
  * a Structured Streaming file source over the drop directory;
  * `Trigger.AvailableNow` drains everything that has arrived (the
  * batch-over-stream shape), the checkpoint remembers processed drops,
  * and the same folder/extension validation runs as a path filter
  * before dispatch.
  */
object ConfigStream {

  private val ValidFolders = Set("ddl", "sql", "dml", "data")

  /** Reference validation: phase subfolder + .json extension. */
  def validDrop(path: String): Boolean = {
    val parts = path.split('/')
    parts.length >= 2 &&
      ValidFolders.contains(parts(parts.length - 2).toLowerCase) &&
      path.toLowerCase.endsWith(".json")
  }

  /** Drain the drop directory once; call `handler(path, content)` for
    * each valid config file that has arrived since the last run. */
  def runOnce(
      spark: SparkSession,
      dropDir: String,
      checkpointDir: String,
      handler: (String, String) => Unit): Unit = {
    val stream = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(s"$dropDir/*/*")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.withColumn("path", input_file_name())
          .collect()
          .map(r => (r.getAs[String]("path"), r.getAs[String]("value")))
          .filter { case (p, _) => validDrop(p) }
          .foreach { case (p, c) => handler(p, c) }
      }
      .start()
    q.awaitTermination()
  }
}
