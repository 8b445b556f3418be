package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.AuditSink
import graft.sources.ScriptScan

/** The assembled event-driven engine (SURVEY §3.1 end-to-end): a config
  * JSON dropped into `<dropDir>/<phase>/` triggers parse → script scan
  * → controller stage graph → audit + report — the reference's
  * Cloud-Run-listener → Airflow-controller loop in one driver.
  *
  * Local paths stand in for gs:// URIs (the reference's bucket layout
  * maps 1:1 onto any Hadoop-compatible filesystem; swap the scheme and
  * nothing else changes).
  */
final class GraftApp(
    spark: SparkSession,
    audit: AuditSink,
    checkpointDir: String) {

  /** Resolve a config's source path to (fileName, content) scripts. */
  private def scriptsFor(parsed: ConfigJson.Parsed): Seq[(String, String)] =
    if (parsed.sourcePath.isEmpty) Nil
    else ScriptScan.readScripts(spark, parsed.sourcePath)

  /** Handle one config document; returns phase results. */
  def handle(json: String, defaultUniqueId: String): Seq[Controller.RunResult] = {
    val parsed = ConfigJson.parse(json, defaultUniqueId)
    val scripts = scriptsFor(parsed)
    val cfg = Controller.GraftConfig(
      kind = parsed.kind,
      source = parsed.source,
      uniqueId = parsed.uniqueId,
      mode = parsed.mode,
      ddlFiles = if (parsed.kind == "ddl") scripts else Nil,
      sqlFiles = if (parsed.kind == "sql" || parsed.kind == "dml") scripts else Nil,
      nameMapping = parsed.nameMapping,
      batchDistribution = parsed.batchDistribution)
    Controller.run(spark, cfg, audit)
  }

  /** Drain pending config drops once (Trigger.AvailableNow). */
  def runOnce(dropDir: String): Seq[(String, Seq[Controller.RunResult])] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Seq[Controller.RunResult])]
    ConfigStream.runOnce(spark, dropDir, checkpointDir, (path, content) => {
      val uniqueId = path.split('/').last.stripSuffix(".json")
      out += path -> handle(content, uniqueId)
    })
    out.toList
  }
}
