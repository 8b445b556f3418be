package graft.translate

import graft.translate.DdlTranslator.TableDef

/** Object-name mapping applied during translation
  * (`nameMappingList.name_map` in the reference config, e.g.
  * `src/tests/end_to_end/config/ddl/teradata/teradata_ddl.json`): each
  * entry maps a source (database, table[, column]) to a target name.
  * Database-only entries rename schemas; table entries rename
  * relations; column entries rename attributes of their table.
  */
final case class NameMapping(entries: Seq[NameMapping.Entry]) {

  private val dbMap: Map[String, String] = entries
    .filter(e => e.sourceTable.isEmpty && e.sourceColumn.isEmpty)
    .map(e => e.sourceDb.toLowerCase -> e.targetDb.getOrElse(e.sourceDb)).toMap

  private val tableMap: Map[(String, String), (String, String)] = entries
    .filter(e => e.sourceTable.nonEmpty && e.sourceColumn.isEmpty)
    .map { e =>
      (e.sourceDb.toLowerCase, e.sourceTable.get.toLowerCase) ->
        (e.targetDb.getOrElse(e.sourceDb), e.targetTable.getOrElse(e.sourceTable.get))
    }.toMap

  private val columnMap: Map[(String, String, String), String] = entries
    .filter(_.sourceColumn.nonEmpty)
    .map { e =>
      (e.sourceDb.toLowerCase, e.sourceTable.getOrElse("").toLowerCase,
        e.sourceColumn.get.toLowerCase) -> e.targetColumn.getOrElse(e.sourceColumn.get)
    }.toMap

  def apply(t: TableDef): TableDef = {
    val db = t.database.getOrElse("")
    val (newDb, newTable) = tableMap.get((db.toLowerCase, t.table.toLowerCase))
      .getOrElse((dbMap.getOrElse(db.toLowerCase, db), t.table))
    val cols = t.columns.map { c =>
      columnMap.get((db.toLowerCase, t.table.toLowerCase, c.name.toLowerCase))
        .map(n => c.copy(name = n)).getOrElse(c)
    }
    val renameCol = (n: String) =>
      columnMap.getOrElse((db.toLowerCase, t.table.toLowerCase, n.toLowerCase), n)
    t.copy(
      database = if (newDb.isEmpty) None else Some(newDb),
      table = newTable,
      columns = cols,
      distributionColumns = t.distributionColumns.map(renameCol),
      sortColumns = t.sortColumns.map(renameCol),
      partitionColumns = t.partitionColumns.map(renameCol))
  }
}

object NameMapping {
  final case class Entry(
      sourceDb: String,
      sourceTable: Option[String] = None,
      sourceColumn: Option[String] = None,
      targetDb: Option[String] = None,
      targetTable: Option[String] = None,
      targetColumn: Option[String] = None)

  val empty: NameMapping = NameMapping(Nil)
}
