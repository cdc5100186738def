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

  /** Execute DDL, tolerating Derby's already-exists errors (X0Y32/X0Y68):
    * the in-memory db is keyed by NAME within the test JVM, so a filtered
    * re-run or suite-ordering change must not trip over leftover state. */
  private def ddl(st: java.sql.Statement, sql: String): Unit =
    try { st.execute(sql); () } catch {
      case e: java.sql.SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "X0Y68" => ()
    }

  private lazy val setup: Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      ddl(st, "CREATE SCHEMA FX")
      ddl(st,
        """CREATE TABLE FX.ORDERS (
          |  ID BIGINT NOT NULL,
          |  CREATED_AT TIMESTAMP,
          |  STATUS VARCHAR(10),
          |  AMOUNT DECIMAL(12,2)
          |)""".stripMargin)
      val rs = st.executeQuery("SELECT COUNT(*) FROM FX.ORDERS")
      rs.next()
      if (rs.getLong(1) == 0) {
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
        ins.close()
      }
      st.close()
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

  test("recorded MySQL INFORMATION_SCHEMA replays through discovery → DDL → alignment") {
    // A RECORDED catalog fixture: real MySQL INFORMATION_SCHEMA.COLUMNS rows
    // (the dialect quirks of ref flexible_schema_manager.py:206-272 —
    // tinyint(1), unsigned bigint/int/smallint, decimal(20,6), zero-date
    // default, enum value list, digit-leading + mixed-case names) loaded
    // into an embedded-Derby INFORMATION_SCHEMA.COLUMNS so the LIVE
    // JdbcSource.discoverSchemaInfoSchema path runs the reference's exact
    // query shape without a MySQL server.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      ddl(st, "CREATE SCHEMA INFORMATION_SCHEMA")
      ddl(st,
        """CREATE TABLE INFORMATION_SCHEMA.COLUMNS (
          |  TABLE_SCHEMA VARCHAR(64), TABLE_NAME VARCHAR(64),
          |  COLUMN_NAME VARCHAR(64), DATA_TYPE VARCHAR(64),
          |  COLUMN_TYPE VARCHAR(128), IS_NULLABLE VARCHAR(3),
          |  ORDINAL_POSITION INT, COLUMN_DEFAULT VARCHAR(128),
          |  EXTRA VARCHAR(64)
          |)""".stripMargin)
      st.execute("DELETE FROM INFORMATION_SCHEMA.COLUMNS") // re-run: reseed
      val ins = conn.prepareStatement(
        "INSERT INTO INFORMATION_SCHEMA.COLUMNS VALUES " +
          "('settlement','settle_orders',?,?,?,?,?,?,?)")
      val rows = Seq(
        ("id", "bigint", "bigint(20) unsigned", "NO", 1, null, "auto_increment"),
        ("is_active", "tinyint", "tinyint(1)", "YES", 2, "1", ""),
        ("retry_count", "tinyint", "tinyint(3) unsigned", "NO", 3, "0", ""),
        ("amount", "decimal", "decimal(20,6)", "YES", 4, null, ""),
        ("created_at", "datetime", "datetime", "NO", 5, "0000-00-00 00:00:00", ""),
        ("2nd_phone", "varchar", "varchar(32)", "YES", 6, null, ""),
        ("UserName", "varchar", "varchar(255)", "YES", 7, null, ""),
        ("status", "enum", "enum('new','done')", "NO", 8, "new", ""),
        ("payload", "json", "json", "YES", 9, null, ""),
        ("big_count", "int", "int(10) unsigned", "NO", 10, "0", ""),
        ("small_u", "smallint", "smallint(5) unsigned", "YES", 11, null, ""),
        ("notes", "text", "text", "YES", 12, null, ""))
      rows.foreach { case (n, dt, ct, nul, pos, dflt, extra) =>
        ins.setString(1, n); ins.setString(2, dt); ins.setString(3, ct)
        ins.setString(4, nul); ins.setInt(5, pos); ins.setString(6, dflt)
        ins.setString(7, extra); ins.addBatch()
      }
      ins.executeBatch(); st.close(); ins.close()
    } finally conn.close()

    import org.apache.spark.sql.types._
    val mysqlId = TableId("mysql", "settlement", "settle_orders")
    val cols = source.infoSchemaColumns(spark, mysqlId)
    assert(cols.size == 12)
    // zero-date default rides through as opaque metadata, never parsed
    assert(cols.find(_.columnName == "created_at").get.columnDefault
      .contains("0000-00-00 00:00:00"))

    val (schema, mapping) = source.discoverSchemaInfoSchema(spark, mysqlId)
    // one assertion per reference quirk:
    assert(schema("id").dataType == LongType && !schema("id").nullable,
      "bigint(20) unsigned must force SIGNED Long (ref :227-230)")
    assert(schema("is_active").dataType == BooleanType,
      "tinyint(1) must map to Boolean (ref :240-245)")
    assert(schema("retry_count").dataType == ShortType,
      "tinyint(3) unsigned stays int16 'for better range' (ref :245)")
    assert(schema("amount").dataType == DecimalType(18, 6),
      "decimal(20,6) precision caps at 18, scale preserved (ref :212-219)")
    assert(schema("created_at").dataType == TimestampType &&
      !schema("created_at").nullable)
    assert(schema("col_2nd_phone").dataType == StringType,
      "digit-leading name must normalize with col_ prefix")
    assert(schema("username").dataType == StringType, "names lowercase")
    assert(schema("status").dataType == StringType, "enum value list → string")
    assert(schema("payload").dataType == StringType, "json → string")
    assert(schema("big_count").dataType == LongType,
      "int(10) unsigned must WIDEN to Long (3e9 overflows signed int)")
    assert(schema("small_u").dataType == IntegerType,
      "smallint unsigned must WIDEN to Integer")
    assert(schema("notes").dataType == StringType)
    assert(mapping == Map("2nd_phone" -> "col_2nd_phone",
      "UserName" -> "username"))

    // → warehouse DDL (ref :494-543): 2× varchar buffer, capped decimal
    val colDdl = graft.sources.InfoSchemaDiscovery.warehouseColumnDdl(cols)
    assert(colDdl.contains("id BIGINT NOT NULL"))
    assert(colDdl.contains("is_active BOOLEAN"))
    assert(colDdl.contains("amount DECIMAL(18,6)"))
    assert(colDdl.contains("col_2nd_phone VARCHAR(64)"), "2x safety buffer")
    assert(colDdl.contains("username VARCHAR(510)"))
    assert(colDdl.contains("status VARCHAR(255) NOT NULL"))
    assert(colDdl.contains("payload VARCHAR(65535)"))
    assert(colDdl.contains("big_count BIGINT NOT NULL"))

    // → alignment: a staged batch with the ORIGINAL MySQL names flows
    // through the persisted rename map into the discovered target schema
    val s = spark; import s.implicits._
    val staged0 = Seq((7L, "555", "Ada"))
      .toDF("id", "2nd_phone", "UserName")
    val renamed = graft.sources.ColumnMapStore(staged0, mapping)
    assert(renamed.columns.toSeq == Seq("id", "col_2nd_phone", "username"))
    val aligned = graft.operators.Relational.alignToSchema(renamed, schema)
    assert(aligned.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(aligned.select("id", "col_2nd_phone", "username", "notes")
      .collect().head.toSeq == Seq(7L, "555", "Ada", null))
  }

  test("tableExists is exact-match, not SHOW TABLES LIKE wildcard semantics") {
    // ref base.py:934 probes `SHOW TABLES LIKE '<name>'`: MySQL LIKE treats
    // `_` as any-char there, so probing settle_orders would also match a
    // table named settleXorders. Create ONLY the X variant: the exact-match
    // probe must say no.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      ddl(st, "CREATE TABLE FX.SETTLEXORDERS (ID BIGINT)")
      st.close()
    } finally conn.close()
    assert(source.tableExists(spark, TableId("derby", "FX", "SETTLEXORDERS")))
    assert(!source.tableExists(spark, TableId("derby", "FX", "SETTLE_ORDERS")),
      "underscore must NOT act as a wildcard in the existence probe")
    assert(source.tableExists(spark, TableId("derby", "FX", "ORDERS")))
  }

  test("pushed scalars: ceiling/count/window fetch ONE source-side row, zero Spark jobs") {
    // The reference runs MAX(id) (row_based.py:799) and COUNT(*) window
    // estimates (base.py:1018-1022) INSIDE MySQL. Spark's DSv1 JDBC relation
    // does not push aggregates, so the equivalent df.agg would fetch the
    // whole table — these APIs must bypass Spark entirely.
    val s = source
    // job ids are monotonic; anything the calls launch would appear above
    // this high-water mark (immune to UI-store eviction of old jobs)
    def jobsAbove(n: Int): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).count(_ > n)
    val beforeMax = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).maxOption.getOrElse(-1)

    assert(s.maxId(id, "ID").contains(500L))                        // A2 ceiling
    assert(s.rowCount(id) == 500L)                                  // A4 parity
    val lo = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2026-01-20 23:59:59")
    val expect = (1 to 500).count { i => val d = i % 28 + 1; d >= 10 && d <= 20 }
    assert(s.windowCount(id, "CREATED_AT", lo, hi) == expect.toLong) // A1 window
    // catalog-level ceiling rides the same pushed channel
    val cat = new graft.pipeline.JdbcCatalog(url)
    val spec = graft.pipeline.TableSpec("FX.ORDERS",
      graft.model.CdcConfig(graft.model.CdcStrategyKind.IdOnly,
        idColumn = Some("ID")))
    assert(cat.snapshotCeiling(spark, spec).contains(500L))

    // one sentinel job flushes the ordered listener bus; the tracker must
    // then show exactly that sentinel above the mark and nothing else
    spark.sparkContext.parallelize(1 to 2, 1).count()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (jobsAbove(beforeMax) < 1 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(jobsAbove(beforeMax) == 1,
      "pushed scalars must not launch Spark jobs (a DSv1 JDBC aggregate " +
        "would scan the whole source table)")
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

  test("multi-connection pipeline: two Derby databases sync in ONE run, " +
    "state scoped per connection") {
    // the reference's [connection:]schema.table addressing
    // (connection_registry.py:378-449): one pipeline, two live databases —
    // each table resolves its own catalog, watermarks/warehouse scope under
    // the connection name, and deltas advance independently
    val urlA = "jdbc:derby:memory:graftconnA;create=true"
    val urlB = "jdbc:derby:memory:graftconnB;create=true"
    def seed(url: String, n: Int, status: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = c.createStatement()
        ddl(st, "CREATE SCHEMA FX")
        ddl(st,
          "CREATE TABLE FX.EVENTS (ID BIGINT NOT NULL, STATUS VARCHAR(10))")
        val rs = st.executeQuery("SELECT COALESCE(MAX(ID), 0) FROM FX.EVENTS")
        rs.next()
        val from = rs.getLong(1) + 1
        val ins = c.prepareStatement("INSERT INTO FX.EVENTS VALUES (?, ?)")
        (from until from + n).foreach { i =>
          ins.setLong(1, i); ins.setString(2, status); ins.addBatch()
        }
        ins.executeBatch(); ins.close(); st.close()
      } finally c.close()
    }
    seed(urlA, 100, "a")
    seed(urlB, 40, "b")
    val work = tmpDir("multiconn")
    // table one uses the scoped-name form, table two the connection: key —
    // both reference syntaxes must land on the same resolution
    val p = graft.pipeline.PipelineConfig.fromString(
      s"""pipeline:
         |  name: "two_dbs"
         |  target: "warehouse"
         |  connections:
         |    dba:
         |      source: "$urlA"
         |    dbb:
         |      source: "$urlB"
         |tables:
         |  "dba:FX.EVENTS":
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "ID"
         |    target_name: "events_a"
         |  FX.EVENTS:
         |    connection: dbb
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "ID"
         |    target_name: "events_b"
         |""".stripMargin)
    val runner = new graft.pipeline.PipelineRunner(spark, work)
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    assert(r1.totalRows == 140)
    val (store, _, loader) = runner.rigFor(p)
    val idA = p.tables.find(_.targetName.contains("events_a")).get.tableId(p)
    val idB = p.tables.find(_.targetName.contains("events_b")).get.tableId(p)
    assert(idA.connection == "dba" && idB.connection == "dbb")
    assert(loader.readTarget(spark, idA).get.count() == 100)
    assert(loader.readTarget(spark, idB).get.count() == 40)
    // watermark state is per connection — distinct scoped documents, each
    // carrying its own cursor
    assert(store.get(idA.scoped).flatMap(_.mysql_state.last_id).contains(100L))
    assert(store.get(idB.scoped).flatMap(_.mysql_state.last_id).contains(40L))
    // a delta lands on connection A only; B stays idle on the next run
    seed(urlA, 10, "a2")
    val r2 = runner.sync(p)
    assert(r2.allOk && r2.totalRows == 10, s"delta moved ${r2.totalRows} rows")
    assert(loader.readTarget(spark, idA).get.count() == 110)
    assert(loader.readTarget(spark, idB).get.count() == 40)
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
