package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.TableId

/** Source abstraction (SURVEY §7.0): the engine reads tables through `Source`
  * so the same CDC/extract code path serves Parquet fixtures (tests, bench)
  * and a real MySQL over JDBC (production parity).
  */
trait Source {
  /** Lazy DataFrame for a table — plan only; Catalyst pushes CDC predicates
    * into the scan (JDBC WHERE / Parquet row-group skip). */
  def table(spark: SparkSession, id: TableId): DataFrame
  /** List table names visible to this source (ref SHOW TABLES analog). */
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
  */
final class JdbcSource(url: String, props: java.util.Properties,
                       numPartitions: Int = 32) extends Source {

  def table(spark: SparkSession, id: TableId): DataFrame =
    spark.read.jdbc(url, s"${id.schema}.${id.table}", props)

  /** Live schema discovery (S7, ref flexible_schema_manager.py:137-176): the
    * table's StructType straight from JDBC metadata — plan-only, no data
    * read. Feed this to [[graft.load.Loader.generateDdl]] /
    * [[graft.model.TypeMapper.sparkToWarehouseDdl]] for target DDL. */
  def discoverSchema(spark: SparkSession, id: TableId):
      org.apache.spark.sql.types.StructType =
    table(spark, id).schema

  /** Range-partitioned read: one cheap min/max query picks even bounds, then
    * `numPartitions` parallel range scans — replaces detect_optimal_window_size
    * (ref base.py:486-735) with ~10 lines. */
  def partitionedTable(spark: SparkSession, id: TableId,
                       partitionColumn: String): DataFrame = {
    val bounds = spark.read
      .jdbc(url,
        s"(SELECT MIN($partitionColumn) lo, MAX($partitionColumn) hi FROM ${id.schema}.${id.table}) b",
        props)
      .head()
    if (bounds.isNullAt(0)) table(spark, id)
    else spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", bounds.get(0).toString)
      .option("upperBound", bounds.get(1).toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, s"${id.schema}.${id.table}", props)
  }

  /** Live table listing via JDBC catalog metadata (ref SHOW TABLES,
    * base.py:634-665) — returns `schema.table` names. */
  def listTables(spark: SparkSession): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (rs.next())
        buf += s"${rs.getString("TABLE_SCHEM")}.${rs.getString("TABLE_NAME")}"
      buf.toSeq.sorted
    } finally conn.close()
  }
}
