package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.translate.{FilterRule, NameMapping, StatementSplitter}

/** Config-document parsing (SURVEY §2.1 S1; reference
  * `controller_dag.py:87-117` + `input_validation_utils.py:76-135`;
  * document shape as in `src/tests/end_to_end/config/ddl/teradata/
  * teradata_ddl.json`).
  *
  * Normalization mirrors the reference: `source` lowercased, missing
  * `unique_id` defaulted (caller supplies), required fields checked
  * with clear errors. The BQ-style nameMappingList (`SCHEMA` /
  * `RELATION` / `ATTRIBUTE` entries with database/schema/relation/
  * attribute coordinates) maps onto Spark terms: schema → database,
  * relation → table, attribute → column.
  */
object ConfigJson {

  final case class Parsed(
      kind: String,
      source: String,
      uniqueId: String,
      batchDistribution: Int,
      extractDdl: Boolean,
      mode: StatementSplitter.Mode,
      sourcePath: String,
      targetPath: String,
      nameMapping: NameMapping,
      errorFilterRules: Seq[FilterRule],
      validationType: String,
      validationParamsPath: String,
      validationMode: String,
      transferParams: Map[String, String] = Map.empty,
      dvtCheck: Boolean = true)

  private val mapper = new ObjectMapper()

  private def req(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    require(v != null && !v.isNull, s"config missing required field: $field")
    v
  }

  private def opt(n: JsonNode, path: String*): Option[JsonNode] =
    path.foldLeft(Option(n)) { (acc, f) => acc.flatMap(x => Option(x.get(f))) }

  def parse(json: String, defaultUniqueId: String = "run"): Parsed = {
    val root = mapper.readTree(json)
    val kind = req(root, "type").asText().toLowerCase
    require(Set("ddl", "sql", "dml", "data")(kind), s"unknown config type: $kind")
    val details = opt(root, "migrationTask", "translationConfigDetails")
    val mode = details.flatMap(d => opt(d, "sourceDialect", "teradataDialect", "mode"))
      .map(_.asText.toUpperCase) match {
      case Some("BTEQ") => StatementSplitter.Bteq
      case _            => StatementSplitter.Sql
    }
    Parsed(
      kind = kind,
      source = req(root, "source").asText().toLowerCase,
      uniqueId = opt(root, "unique_id").map(_.asText).filter(_.nonEmpty)
        .getOrElse(defaultUniqueId),
      batchDistribution = opt(root, "batchDistribution").map(_.asInt).getOrElse(10),
      extractDdl = opt(root, "extract_ddl").exists(v =>
        v.asText == "yes" || v.asBoolean(false)),
      mode = mode,
      sourcePath = details.flatMap(d => opt(d, "gcsSourcePath")).map(_.asText).getOrElse(""),
      targetPath = details.flatMap(d => opt(d, "gcsTargetPath")).map(_.asText).getOrElse(""),
      nameMapping = details.flatMap(d => opt(d, "nameMappingList", "name_map"))
        .map(parseNameMap).getOrElse(NameMapping.empty),
      errorFilterRules = opt(root, "translationErrorFilterRules")
        .map(_.elements().asScala.toSeq.map(parseRule)).getOrElse(Nil),
      validationType = opt(root, "validation_config", "validation_type")
        .map(_.asText).getOrElse(""),
      validationParamsPath = opt(root, "validation_config", "validation_params_file_path")
        .map(_.asText).getOrElse(""),
      validationMode = opt(root, "validation_config", "validation_mode")
        .map(_.asText).getOrElse(""),
      transferParams = opt(root, "transfer_config", "params").map { p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
      }.getOrElse(Map.empty) ++
        opt(root, "transfer_config", "displayName").map("displayName" -> _.asText),
      dvtCheck = !opt(root, "dvt_check").map(_.asText).exists(_.equalsIgnoreCase("N")))
  }

  private def parseRule(n: JsonNode): FilterRule =
    FilterRule(
      field = req(n, "field").asText,
      matchType = req(n, "matchType").asText,
      value = req(n, "value").asText,
      caseSensitive = opt(n, "caseSensitive").forall(_.asBoolean(true)))

  /** BQ-style name_map → [[NameMapping]]: schema ≙ database,
    * relation ≙ table, attribute ≙ column. */
  private def parseNameMap(arr: JsonNode): NameMapping =
    NameMapping(arr.elements().asScala.toSeq.map { e =>
      val src = req(e, "source")
      val tgt = req(e, "target")
      NameMapping.Entry(
        sourceDb = opt(src, "schema").map(_.asText).getOrElse(""),
        sourceTable = opt(src, "relation").map(_.asText),
        sourceColumn = opt(src, "attribute").map(_.asText),
        targetDb = opt(tgt, "schema").map(_.asText),
        targetTable = opt(tgt, "relation").map(_.asText),
        targetColumn = opt(tgt, "attribute").map(_.asText))
    })
}
