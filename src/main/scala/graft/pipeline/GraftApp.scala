package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.AuditSink
import graft.sources.{CatalogOps, ScriptScan}

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

  /** Resolve a config's scripts. DDL configs for a hive source go
    * through CATALOG EXTRACTION, not file reads — the reference's
    * controller routes source==hive (and extract_ddl=yes) to the
    * extractor DAG, whose database is the first name-map source schema
    * (`controller_dag.py:195-205`, `extract_hive_ddls_manual.py:77`).
    * For warehouse sources, extract_ddl=yes needs a live JDBC endpoint
    * (the `JdbcCatalog` path, Derby-tested); absent one, scripts are
    * read pre-extracted from the source path like the file flow. */
  private def scriptsFor(parsed: ConfigJson.Parsed): Seq[(String, String)] = {
    val hiveExtract = parsed.kind == "ddl" && parsed.source == "hive"
    val extractDb = parsed.nameMapping.entries.headOption
      .map(_.sourceDb).filter(_.nonEmpty)
    (hiveExtract, extractDb) match {
      case (true, Some(db)) if spark.catalog.databaseExists(db) =>
        CatalogOps.extractDdls(spark, db)
      case _ if parsed.sourcePath.isEmpty => Nil
      case _ => ScriptScan.readScripts(spark, parsed.sourcePath)
    }
  }

  /** DVT specs from the config's validation-params sheet (the
    * reference's validation DAG reads the same file; local paths stand
    * in for the gs:// URI). Missing/unreadable sheet → no validations. */
  private def validationsFor(parsed: ConfigJson.Parsed): Seq[Controller.ValidationSpec] = {
    val sheet = java.nio.file.Paths.get(parsed.validationParamsPath)
    if (parsed.validationParamsPath.isEmpty || !java.nio.file.Files.exists(sheet)) Nil
    else {
      val specs = Controller.validationSpecs(
        graft.sources.ValidationParams.read(spark, parsed.validationParamsPath)
          .filter(_.translationType.equalsIgnoreCase(parsed.kind)))
      // custom-query rows name SQL files next to the sheet (the
      // reference reads them from the validation scripts prefix);
      // resolve + dialect-translate, drop rows whose files are missing
      val dir = Option(sheet.getParent).getOrElse(java.nio.file.Paths.get("."))
      specs.flatMap {
        case v if v.kind == "custom" =>
          val (s, t) = (dir.resolve(v.sourceTable), dir.resolve(v.targetTable))
          if (java.nio.file.Files.exists(s) && java.nio.file.Files.exists(t))
            Some(v.copy(
              sourceSql = graft.translate.TranslationEngine.translateSql(
                java.nio.file.Files.readString(s)),
              targetSql = graft.translate.TranslationEngine.translateSql(
                java.nio.file.Files.readString(t))))
          else None
        case v => Some(v)
      }
    }
  }

  /** Table loads from a data config's transfer params (the reference's
    * hive data-load DAG: every table staged under
    * `hive_gcs_staging_path/<table>` loads into
    * `<bq_dataset_id>.<table>`; local dirs stand in for the bucket). */
  private def loadsFor(parsed: ConfigJson.Parsed): Seq[graft.load.TableLoader.LoadSpec] = {
    val staging = parsed.transferParams.getOrElse("hive_gcs_staging_path", "")
    val p = java.nio.file.Paths.get(if (staging.isEmpty) "/nonexistent" else staging)
    if (parsed.kind != "data" || staging.isEmpty || !java.nio.file.Files.isDirectory(p)) Nil
    else {
      val tgtDb = parsed.transferParams.getOrElse("bq_dataset_id",
        parsed.transferParams.getOrElse("hive_db_name", "default"))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala.toSeq
        .filter(java.nio.file.Files.isDirectory(_))
        .sortBy(_.getFileName.toString)
        .map { d =>
          val table = d.getFileName.toString.stripSuffix(".db")
          graft.load.TableLoader.LoadSpec(s"$tgtDb.$table", d.toString)
        }
    }
  }

  /** Incremental streams from a hive_inc data config (the reference's
    * scheduled incremental-load DAG): arrivals staged under
    * `<gcs_inc_staging_bucket>/<db>.db/<table>/` drain into the EXISTING
    * `<db>.<table>` (created by the initial load), schema taken from the
    * target; tables that don't exist yet are skipped — the reference
    * requires the initial migration first. Checkpoints live beside the
    * staging area; the audit anti-join keeps re-drains exactly-once
    * even if they are lost. */
  private def incrementalsFor(parsed: ConfigJson.Parsed): Seq[Controller.IncrementalSpec] = {
    val staging = parsed.transferParams.getOrElse("gcs_inc_staging_bucket", "")
    val root = java.nio.file.Paths.get(if (staging.isEmpty) "/nonexistent" else staging)
    if (parsed.source != "hive_inc" || staging.isEmpty ||
        !java.nio.file.Files.isDirectory(root)) Nil
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(root).iterator().asScala.toSeq
        .filter(d => java.nio.file.Files.isDirectory(d) &&
          !d.getFileName.toString.startsWith("_"))
        .flatMap { dbDir =>
          val db = dbDir.getFileName.toString.stripSuffix(".db")
          java.nio.file.Files.list(dbDir).iterator().asScala.toSeq
            .filter(java.nio.file.Files.isDirectory(_))
            .sortBy(_.getFileName.toString)
            .flatMap { tDir =>
              val table = s"$db.${tDir.getFileName.toString}"
              if (!spark.catalog.tableExists(table)) None
              else Some(Controller.IncrementalSpec(
                tDir.toString, spark.table(table).schema.toDDL, table,
                s"$staging/_ck/${db}_${tDir.getFileName}"))
            }
        }
    }
  }

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
      loads = loadsFor(parsed),
      incrementals = incrementalsFor(parsed),
      validations = if (parsed.dvtCheck) validationsFor(parsed) else Nil,
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
