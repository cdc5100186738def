package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{SqlGuard, TableId}

/** Source abstraction (SURVEY §7.0): the engine reads tables through `Source`
  * so the same CDC/extract code path serves Parquet fixtures (tests, bench)
  * and a real MySQL over JDBC (production parity).
  */
trait Source {
  /** Lazy DataFrame for a table — plan only; Catalyst pushes CDC predicates
    * into the scan (JDBC WHERE / Parquet row-group skip). */
  def table(spark: SparkSession, id: TableId): DataFrame
  /** List table names visible to this source (ref SHOW TABLES analog).
    * Shape: `schema.table` where the source HAS schemas (JDBC); bare table
    * names for schema-less sources (parquet dirs) — `TableId.parse` accepts
    * both, defaulting the schema. */
  def listTables(spark: SparkSession): Seq[String]
}

/** Parquet-directory source: each table is `<dir>/<table>.parquet`.
  * Primary source for correctness/bench on `/root/testdata/sf*`. */
final class ParquetSource(dir: String) extends Source {
  def table(spark: SparkSession, id: TableId): DataFrame =
    spark.read.parquet(s"$dir/${id.table}.parquet")
  def tableByName(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
  def listTables(spark: SparkSession): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }
}

/** JDBC source (MySQL parity). Partition bounds are chosen from min/max of the
  * partition column — the Spark-native replacement for the reference's
  * intra-table thread chunking (src/backup/intra_table.py + base.py:1302-1356,
  * SURVEY §4 "scan parallelization"). Exercised against embedded Derby in
  * JdbcSpec; the same `DataFrame` flows through every downstream operator.
  *
  * Every identifier that reaches source-side SQL (schema, table, partition
  * column — ALL of them config-sourced) passes [[SqlGuard]] validation first:
  * this is the one path where an injected string executes on the PRODUCTION
  * DATABASE, not just in Spark.
  */
final class JdbcSource(url: String, props: java.util.Properties,
                       numPartitions: Int = 32) extends Source {

  private def qualified(id: TableId): String =
    SqlGuard.validateQualifiedIdentifier(s"${id.schema}.${id.table}")

  def table(spark: SparkSession, id: TableId): DataFrame =
    spark.read.jdbc(url, qualified(id), props)

  /** Live schema discovery (S7, ref flexible_schema_manager.py:137-176): the
    * table's StructType straight from JDBC metadata — plan-only, no data
    * read. Feed this to [[graft.load.Loader.generateDdl]] /
    * [[graft.model.TypeMapper.sparkToWarehouseDdl]] for target DDL. */
  def discoverSchema(spark: SparkSession, id: TableId):
      org.apache.spark.sql.types.StructType =
    table(spark, id).schema

  /** Range-partitioned read: one cheap min/max query picks even bounds, then
    * `numPartitions` parallel range scans — replaces detect_optimal_window_size
    * (ref base.py:486-735) with ~10 lines.
    *
    * `lowerBoundHint` (e.g. the CDC cursor's last id) tightens the bounds
    * query and the range layout for INCREMENTAL reads: without it the ranges
    * span the whole table and the pushed-down watermark predicate leaves
    * every new row in the last partition — a serial scan plus
    * numPartitions-1 empty range queries against the source. */
  def partitionedTable(spark: SparkSession, id: TableId,
                       partitionColumn: String,
                       lowerBoundHint: Option[Long] = None): DataFrame = {
    val colName = SqlGuard.validateIdentifier(partitionColumn)
    val where = lowerBoundHint.map(lo => s" WHERE $colName > $lo").getOrElse("")
    val bounds = spark.read
      .jdbc(url,
        s"(SELECT MIN($colName) lo, MAX($colName) hi FROM ${qualified(id)}$where) b",
        props)
      .head()
    if (bounds.isNullAt(0)) table(spark, id)
    else spark.read
      .option("partitionColumn", colName)
      .option("lowerBound", bounds.get(0).toString)
      .option("upperBound", bounds.get(1).toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, qualified(id), props)
  }

  /** Live table listing via JDBC catalog metadata (ref SHOW TABLES,
    * base.py:634-665) — returns `schema.table` names. MySQL's driver reports
    * databases as CATALOGS (TABLE_SCHEM is null), so the schema falls back
    * catalog-first, and the listing is scoped to the CONNECTED
    * catalog/schema rather than every database on the server. */
  def listTables(spark: SparkSession): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val catalog = Option(conn.getCatalog).filter(_.nonEmpty).orNull
      val rs = conn.getMetaData.getTables(catalog, null, "%", Array("TABLE"))
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (rs.next()) {
        val schema = Option(rs.getString("TABLE_SCHEM"))
          .orElse(Option(rs.getString("TABLE_CAT")))
          .getOrElse("default")
        buf += s"$schema.${rs.getString("TABLE_NAME")}"
      }
      buf.toSeq.sorted
    } finally conn.close()
  }
}
