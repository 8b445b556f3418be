package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Script-file directory scan with exclusion rules (SURVEY §2.1 S2/S3;
  * reference `batch_sql_translation.py:179-201` lists translated files
  * under the target prefix, excluding the report/name-map artifacts and
  * the `skip_validation/` subtree; `ddl.py:45-51,106-110` reads one
  * script per file).
  */
object ScriptScan {

  /** Default exclusions mirroring the reference: translation artifacts
    * and the skip_validation subtree. */
  val DefaultExcludeNames: Set[String] =
    Set("batch_translation_report.csv", "consumed_name_map.json")
  val DefaultExcludeSubtrees: Seq[String] = Seq("skip_validation")

  /** Recursively list script files under `dir`, applying exclusions. */
  def listScripts(
      spark: SparkSession,
      dir: String,
      suffix: String = ".sql",
      excludeNames: Set[String] = DefaultExcludeNames,
      excludeSubtrees: Seq[String] = DefaultExcludeSubtrees): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val path = f.getPath.toUri.getPath
      val name = f.getPath.getName
      val excludedTree = excludeSubtrees.exists(s => path.contains(s"/$s/"))
      if (f.isFile && name.endsWith(suffix) && !excludeNames(name) && !excludedTree)
        out += path
    }
    out.result().sorted
  }

  /** Read each script as (fileName, content) — the translation-engine
    * input shape. */
  def readScripts(spark: SparkSession, dir: String,
      suffix: String = ".sql"): Seq[(String, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    listScripts(spark, dir, suffix).map { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        p.getName -> new String(bytes, StandardCharsets.UTF_8)
      } finally in.close()
    }
  }
}
