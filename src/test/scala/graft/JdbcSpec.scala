package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.TableId
import graft.sources.JdbcSource

/** Live-database integration seam (S7 discovery + D3 partitioned JDBC scan +
  * JDBC write sink) exercised against EMBEDDED Derby — the closest analog to
  * the reference's MySQL INFORMATION_SCHEMA / chunked-scan paths that runs
  * without a database server (ref flexible_schema_manager.py:137-176,
  * intra_table.py, gemini_redshift_loader.py:568-662). */
class JdbcSpec extends AnyFunSuite with SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()
  private val id = TableId("derby", "FX", "ORDERS")

  private lazy val setup: Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA FX")
      st.execute(
        """CREATE TABLE FX.ORDERS (
          |  ID BIGINT NOT NULL,
          |  CREATED_AT TIMESTAMP,
          |  STATUS VARCHAR(10),
          |  AMOUNT DECIMAL(12,2)
          |)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO FX.ORDERS VALUES (?, ?, ?, ?)")
      (1 to 500).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setTimestamp(2, java.sql.Timestamp.valueOf(
          f"2026-01-${i % 28 + 1}%02d 12:00:00"))
        ins.setString(3, if (i % 3 == 0) "done" else "open")
        ins.setBigDecimal(4, new java.math.BigDecimal(s"$i.25"))
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  private def source = { setup; new JdbcSource(url, props, numPartitions = 8) }

  test("JDBC table read returns every row with JDBC-resolved schema") {
    val df = source.table(spark, id)
    assert(df.count() == 500)
    assert(df.columns.map(_.toLowerCase).toSet ==
      Set("id", "created_at", "status", "amount"))
  }

  test("partitionedTable picks bounds from min/max and range-partitions the scan") {
    val df = source.partitionedTable(spark, id, "ID")
    // parallelism: the scan really is split into range partitions
    assert(df.rdd.getNumPartitions == 8)
    // completeness: no row lost or duplicated at partition boundaries
    assert(df.count() == 500)
    assert(df.select(countDistinct(col("ID"))).head().getLong(0) == 500)
    assert(df.agg(min("ID"), max("ID")).head() match {
      case r => r.getLong(0) == 1L && r.getLong(1) == 500L
    })
    // pushdown composes: a CDC-style predicate still returns exact results
    assert(df.filter(col("ID") > 400).count() == 100)
  }

  test("CDC predicate pushes into the partitioned JDBC scan") {
    // the whole point of predicate-not-SQL-string CDC: the same Column
    // predicate the strategies build reaches the DATABASE as WHERE, composed
    // with the range-partition clauses — the source filters, Spark doesn't
    val df = source.partitionedTable(spark, id, "ID")
      .filter(col("ID") > 400)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ID,400"),
      s"CDC predicate not pushed to JDBC:\n${plan.take(1200)}")
    assert(df.count() == 100)
  }

  test("live schema discovery feeds warehouse DDL generation (S7)") {
    val schema = source.discoverSchema(spark, id)
    // JDBC metadata → Spark types, no data read
    assert(schema("ID").dataType == org.apache.spark.sql.types.LongType)
    assert(schema("AMOUNT").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    val store = new graft.watermark.WatermarkStore(tmpDir("jdbcwm"))
    val loader = new graft.load.Loader(store, tmpDir("jdbcwh"))
    val ddl = loader.generateDdl(id, schema, distKey = Some("ID"),
      sortKeys = Seq("CREATED_AT"))
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS FX.ORDERS"))
    assert(ddl.contains("ID BIGINT"))
    assert(ddl.contains("AMOUNT DECIMAL(12,2)"))
    assert(ddl.contains("CLUSTERED BY (ID) SORTED BY (CREATED_AT)"))
  }

  test("listTables sees the live catalog (SHOW TABLES analog)") {
    assert(source.listTables(spark).contains("FX.ORDERS"))
  }

  test("YAML pipeline syncs a live JDBC source incrementally (product path)") {
    // the reference's core behavior — incremental CDC off a live database —
    // through the FULL product surface: pipeline.source = jdbc url, range-
    // partitioned scan, extract→stage→load, cursor advance, delta-only resync
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE FX.ORDERS_INC (
          |  ID BIGINT NOT NULL, STATUS VARCHAR(10)
          |)""".stripMargin)
      val ins = conn.prepareStatement("INSERT INTO FX.ORDERS_INC VALUES (?, ?)")
      (1 to 200).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, "open"); ins.addBatch()
      }
      ins.executeBatch(); st.close(); ins.close()
    } finally conn.close()

    val work = tmpDir("jdbcsync")
    val p = graft.pipeline.PipelineConfig.fromString(
      s"""pipeline:
         |  name: "derby_sync"
         |  source: "$url"
         |  target: "warehouse"
         |tables:
         |  FX.ORDERS_INC:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "ID"
         |""".stripMargin)
    val runner = new graft.pipeline.PipelineRunner(spark, work)
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    assert(r1.totalRows == 200)
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.head.tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    assert(loader.readTarget(spark, id).get.count() == 200)
    // idle resync: cursor advanced, nothing re-extracted
    val r2 = runner.sync(p)
    assert(r2.allOk && r2.totalRows == 0)
    // live inserts → only the delta flows on the next sync
    val conn2 = java.sql.DriverManager.getConnection(url, props)
    try {
      val ins2 = conn2.prepareStatement("INSERT INTO FX.ORDERS_INC VALUES (?, ?)")
      (201 to 230).foreach { i =>
        ins2.setLong(1, i.toLong); ins2.setString(2, "new"); ins2.addBatch()
      }
      ins2.executeBatch(); ins2.close()
    } finally conn2.close()
    val r3 = runner.sync(p)
    assert(r3.allOk && r3.totalRows == 30, s"delta sync moved ${r3.totalRows} rows")
    val target = loader.readTarget(spark, id).get
    assert(target.count() == 230)
    assert(target.filter(col("STATUS") === "new").count() == 30)
  }

  test("JDBC write sink round-trips through the warehouse (D3)") {
    // extract from Derby → stage → write back to a Derby sink table, the
    // df.write.jdbc path the loader uses against a real warehouse
    val df = source.partitionedTable(spark, id, "ID")
      .filter(col("ID") <= 100)
    df.write.mode("overwrite").jdbc(url, "FX.ORDERS_SINK", props)
    val back = spark.read.jdbc(url, "FX.ORDERS_SINK", props)
    assert(back.count() == 100)
    assert(back.agg(sum(col("AMOUNT"))).head().getDecimal(0) ==
      df.agg(sum(col("AMOUNT"))).head().getDecimal(0))
    // appending the next increment accumulates (COPY-per-increment analog)
    source.table(spark, id).filter(col("ID").between(101, 150))
      .write.mode("append").jdbc(url, "FX.ORDERS_SINK", props)
    assert(spark.read.jdbc(url, "FX.ORDERS_SINK", props).count() == 150)
  }
}
