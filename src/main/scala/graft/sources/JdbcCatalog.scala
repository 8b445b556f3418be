package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC catalog/bulk-extraction shapes (SURVEY §2.1 S8-S10, §3.2).
  *
  * The reference shells out to `dwh-migration-dumper` (Teradata),
  * `pg_tables`+`SHOW TABLE` (Redshift) and an `all_tab_columns` CTE
  * (Oracle); the Spark-native form of all three is `spark.read.jdbc`
  * against the system catalog plus range-partitioned bulk reads. No
  * warehouse drivers ship in this container, but the full path —
  * driver loading, query-option pushdown, schema inference, partitioned
  * reads — runs LIVE against embedded Derby in JdbcLiveSpec, with each
  * dialect's catalog SQL executed verbatim over emulated catalog
  * tables; only the warehouse-specific driver jar differs in
  * production.
  */
object JdbcCatalog {

  final case class JdbcSource(
      url: String,
      user: String,
      password: String,
      driver: Option[String] = None) {
    def options: Map[String, String] =
      Map("url" -> url, "user" -> user, "password" -> password) ++
        driver.map("driver" -> _)
  }

  /** Catalog query per source dialect (the S8-S10 scans). */
  def catalogQuery(dialect: String, schema: String): String = dialect match {
    case "teradata" =>
      s"SELECT DataBaseName, TableName, RequestText FROM dbc.TablesV " +
        s"WHERE DataBaseName = '$schema' AND TableKind IN ('T','O')"
    case "redshift" =>
      s"SELECT schemaname, tablename FROM pg_tables WHERE schemaname = '$schema'"
    case "oracle" =>
      s"SELECT owner, table_name, column_name, data_type, data_precision, " +
        s"data_scale, column_id FROM all_tab_columns WHERE owner = '${schema.toUpperCase}'"
    case other => throw new IllegalArgumentException(s"unknown dialect: $other")
  }

  /** Catalog scan as a DataFrame (pushes the dialect query down). */
  def readCatalog(
      spark: SparkSession, src: JdbcSource, dialect: String, schema: String): DataFrame =
    spark.read.format("jdbc")
      .options(src.options)
      .option("query", catalogQuery(dialect, schema))
      .load()

  /** Range-partitioned bulk table read — the Spark-native replacement
    * for the reference's agent-based Teradata transfer (§3.2): N
    * partitions read concurrently on the numeric key, sized like
    * `batchDistribution`. */
  def readTable(
      spark: SparkSession, src: JdbcSource, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int = 10): DataFrame =
    spark.read.format("jdbc")
      .options(src.options)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
