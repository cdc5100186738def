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

  /** MySQL-dialect schema discovery through INFORMATION_SCHEMA.COLUMNS —
    * the reference's actual mechanism (flexible_schema_manager.py:151-176
    * runs this exact projection), preserving the COLUMN_TYPE display-width
    * quirks (`tinyint(1)`, `bigint(20) unsigned`) the JDBC-metadata path
    * of [[discoverSchema]] loses. Rows replay through the pure
    * [[InfoSchemaDiscovery]]; JdbcSpec drives this live against a recorded
    * catalog fixture. */
  def infoSchemaColumns(spark: SparkSession, id: TableId): Seq[InfoSchemaColumn] = {
    val schema = SqlGuard.validateIdentifier(id.schema)
    val table = SqlGuard.validateIdentifier(id.table)
    val q =
      s"""(SELECT COLUMN_NAME, DATA_TYPE, COLUMN_TYPE, IS_NULLABLE,
         |        ORDINAL_POSITION, COLUMN_DEFAULT, EXTRA
         | FROM INFORMATION_SCHEMA.COLUMNS
         | WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$table') c""".stripMargin
    spark.read.jdbc(url, q, props).collect().toSeq.map { r =>
      InfoSchemaColumn(
        columnName = r.getString(0),
        dataType = r.getString(1),
        columnType = r.getString(2),
        isNullable = r.getString(3).equalsIgnoreCase("YES"),
        ordinalPosition = r.get(4).toString.toInt,
        columnDefault = Option(r.get(5)).map(_.toString),
        extra = Option(r.get(6)).map(_.toString).getOrElse(""))
    }
  }

  /** Discovered Spark schema + persisted-style rename map via the
    * INFORMATION_SCHEMA path. */
  def discoverSchemaInfoSchema(spark: SparkSession, id: TableId):
      (org.apache.spark.sql.types.StructType, Map[String, String]) =
    InfoSchemaDiscovery.toSchema(infoSchemaColumns(spark, id))

  /** EXACT-match existence check. The reference probes with
    * `SHOW TABLES LIKE '<name>'` (base.py:934) — MySQL LIKE treats `_`/`%`
    * as wildcards there, so a probe for `settle_orders` also matches
    * `settleXorders`; this escapes the metadata wildcards instead (JdbcSpec
    * proves the non-match). The escaped-literal probe is O(1) against the
    * catalog — never an O(all-tables) enumeration; as-given, UPPER and
    * lower spellings are each probed for case-insensitive catalogs. */
  def tableExists(spark: SparkSession, id: TableId): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val meta = conn.getMetaData
      // Derby reports an EMPTY escape string yet honors backslash — treat
      // blank like null or the wildcards go through unescaped
      val esc = Option(meta.getSearchStringEscape)
        .filter(_.nonEmpty).getOrElse("\\")
      def lit(s: String) = s.replace(esc, esc + esc)
        .replace("_", esc + "_").replace("%", esc + "%")
      val catalog = Option(conn.getCatalog).filter(_.nonEmpty).orNull
      Seq[String => String](identity, _.toUpperCase, _.toLowerCase)
        .exists { f =>
          val rs = meta.getTables(catalog, lit(f(id.schema)),
            lit(f(id.table)), Array("TABLE"))
          try rs.next() finally rs.close()
        }
    } finally conn.close()
  }

  /** Source-side scalar execution: ONE row over a direct JDBC statement —
    * zero Spark jobs, nothing shipped to the cluster. This is the channel the
    * reference uses for its session-start MAX(id) snapshot
    * (src/backup/row_based.py:799) and COUNT(*) window estimates
    * (src/backup/base.py:1018-1022). It matters because Spark's DSv1 JDBC
    * relation does NOT push aggregates: a Spark-side `df.agg(max(id))`
    * against a live source fetches the whole table to compute one number.
    * `params` bind as prepared-statement parameters (never interpolated). */
  def scalarLong(selectSql: String, params: Seq[Any] = Nil): Option[Long] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(selectSql)
      try {
        st.setMaxRows(1)
        params.zipWithIndex.foreach {
          case (v: java.sql.Timestamp, i) => st.setTimestamp(i + 1, v)
          case (v: Long, i)               => st.setLong(i + 1, v)
          case (v: Int, i)                => st.setInt(i + 1, v)
          case (v, i)                     => st.setString(i + 1, String.valueOf(v))
        }
        val rs = st.executeQuery()
        try {
          if (!rs.next()) None
          else {
            val v = rs.getLong(1)
            if (rs.wasNull()) None else Some(v)
          }
        } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** Session-start MAX(id) ceiling, pushed to the source (A2 infinite-sync
    * guard, ref row_based.py:278-292, 799). */
  def maxId(id: TableId, idColumn: String): Option[Long] =
    scalarLong(
      s"SELECT MAX(${SqlGuard.validateIdentifier(idColumn)}) FROM ${qualified(id)}")

  /** Source row count, pushed (A4 parity counts, ref base.py:1360-1399). */
  def rowCount(id: TableId): Long =
    scalarLong(s"SELECT COUNT(*) FROM ${qualified(id)}").getOrElse(0L)

  /** COUNT(*) in a `(lo, hi]` timestamp window, pushed (A1 window estimate
    * the reference runs before sizing a sync, base.py:1018-1022). */
  def windowCount(id: TableId, tsColumn: String,
                  lo: java.sql.Timestamp, hi: java.sql.Timestamp): Long = {
    val c = SqlGuard.validateIdentifier(tsColumn)
    scalarLong(
      s"SELECT COUNT(*) FROM ${qualified(id)} WHERE $c > ? AND $c <= ?",
      Seq(lo, hi)).getOrElse(0L)
  }

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
