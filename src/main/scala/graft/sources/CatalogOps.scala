package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog introspection + text-object sinks (SURVEY §2.1 S7, §2.2
  * K5/K7; reference `extract_hive_ddls.py:81-199` — which itself uses
  * Spark for this — and `storage_utils.py:66-73`,
  * `teradata_transfer_run_log_dag.py:262-278`).
  */
object CatalogOps {

  /** All tables of a database with their DDL (SHOW CREATE TABLE), the
    * Hive-extraction scan. */
  def extractDdls(spark: SparkSession, database: String): Seq[(String, String)] =
    spark.catalog.listTables(database).collect().toSeq
      .filter(!_.isTemporary) // listTables also returns session temp views
      .map { t =>
      val fq = s"$database.${t.name}"
      // SHOW CREATE emits a three-part `spark_catalog.db.table` name;
      // normalize to db.table so name-mapping/translation (which key on
      // the source SCHEMA) see the same coordinates the config names
      val raw = spark.sql(s"SHOW CREATE TABLE $fq").head().getString(0)
      fq -> raw.replaceFirst(
        "(?is)^CREATE TABLE [\\w$]+\\.(" + java.util.regex.Pattern.quote(fq) + ")",
        "CREATE TABLE $1")
    }

  /** Per-table text-object write: one `<db>_<table>.sql` file per DDL
    * (K5 — the reference writes one GCS object per table). */
  def writeDdlFiles(ddls: Seq[(String, String)], outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    ddls.map { case (fq, ddl) =>
      val p = Paths.get(outDir, fq.replace('.', '_') + ".sql")
      Files.write(p, (ddl + ";\n").getBytes(StandardCharsets.UTF_8))
      p.toString
    }
  }

  /** Single-object log archive: newline-joined JSON rows (K7 — the
    * reference joins DTS log JSONs into one object). */
  def writeJsonArchive(df: DataFrame, outPath: String): String = {
    val lines = df.toJSON.collect().mkString("\n")
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.write(Paths.get(outPath), lines.getBytes(StandardCharsets.UTF_8))
    outPath
  }

  /** describe-formatted metadata as a DataFrame (S7). */
  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE FORMATTED $table")
}
