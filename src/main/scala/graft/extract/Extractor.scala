package graft.extract

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.model._
import graft.util.{ParquetFooters, SessionMetrics}
import graft.watermark.{Watermark, WatermarkStore}

/** Result of one extract session (ref get_backup_summary, base.py:1446-1471). */
final case class ExtractResult(table: TableId, rows: Long, files: Long,
                               cursor: Cursor, stagedPath: String,
                               metrics: SessionMetrics)

/** Stage-1 extractor: incremental scan → partitioned Parquet staging →
  * per-session watermark commit. The Spark-native replacement for the
  * reference's chunk loop (src/backup/row_based.py:294-568):
  *
  *  - the chunked LIMIT/OFFSET pagination dissolves into a single partitioned
  *    scan (Catalyst pushes the CDC predicate into the file/JDBC scan);
  *  - per-batch watermark commits become one atomic commit per session, with
  *    resume correctness carried by the (ts,id) keyset predicate itself;
  *  - the MAX(id) "ceiling" snapshot (infinite-sync guard,
  *    row_based.py:278-292) is preserved as a semantic predicate.
  *
  * Scale: no collect of data rows — the only driver-side values are the 1-row
  * cursor aggregate and file listing. Output partitioning is the reference's
  * Hive-style layout (s3_manager.py:129-223), which is exactly Spark partition
  * pruning's native format.
  */
final class Extractor(val store: WatermarkStore, stagingRoot: String,
                      partitionStrategy: PartitionStrategy = PartitionStrategy.ByTable,
                      targetFileRows: Long = 5000000,
                      compression: String = "snappy") {

  /** Per-table staging root, keyed on the FULL safe name (conn_schema_table)
    * — keying on the bare table name would share one dir between same-named
    * tables of different schemas/connections, whose orphan sweeps would then
    * delete each other's committed-but-unloaded sessions. */
  def stagingDir(id: TableId): String = partitionStrategy match {
    case PartitionStrategy.ByTable => s"$stagingRoot/table=${id.safeName}"
    case _ => s"$stagingRoot/${id.safeName}"
  }

  /** Run one extract session for `id`, reading from `df` (already sourced).
    * Holds the table's exclusive session lock for the whole extract — a
    * second concurrent session of the same table is REFUSED with
    * [[graft.watermark.TableLockedException]] (ref locks every backup
    * session, simple_watermark_manager.py:408-463). Reentrant under an
    * outer [[graft.pipeline.PipelineRunner]] sync lock on the same thread. */
  def extract(spark: SparkSession, id: TableId, df: DataFrame,
              config: CdcConfig, ceiling: Option[Long] = None): ExtractResult =
    store.withTableLock(id.scoped) {
      extractLocked(spark, id, df, config, ceiling)
    }

  private def extractLocked(spark: SparkSession, id: TableId, df: DataFrame,
                            config: CdcConfig, ceiling: Option[Long]): ExtractResult = {
    val strategy = CdcStrategy(config)
    val wm = store.getOrCreate(id.scoped, config.strategy.name)
    store.save(wm.markExtractInProgress(store.nowString()))
    try {
      val cursor = Cursor(wm.mysql_state.last_timestamp, wm.mysql_state.last_id)
      val batch = strategy match {
        // custom SQL: the TEMPLATE carries the incremental predicate (its
        // {last_timestamp}/{last_id} placeholders render from the cursor) —
        // running the raw df through an empty ScanSpec would re-stage the
        // whole unfiltered source every sync and the append load would
        // duplicate it. The view is dropped right after planning (the
        // DataFrame holds the resolved plan, not the view reference).
        case cs: CustomSqlStrategy =>
          val view = s"graft_custom_${id.safeName}_${System.nanoTime()}"
          df.createOrReplaceTempView(view)
          try cs.run(spark, view, cursor)
          finally spark.catalog.dropTempView(view)
        case _ =>
          val scan = strategy.scanSpec(cursor)
          // ceiling: snapshot MAX(id) bound so rows arriving mid-extract are
          // left for the next session (ref row_based.py:278-292, 525-536)
          val bounded = (ceiling, config.idColumn) match {
            case (Some(c), Some(idCol)) => scan.copy(predicate =
              Some(scan.predicate.map(_ && col(idCol) <= lit(c))
                .getOrElse(col(idCol) <= lit(c))))
            case _ => scan
          }
          bounded(df)
      }

      val outDir = stagingDir(id)
      // orphan cleanup: session dirs ABOVE the committed high-water tag are
      // leftovers of a crashed extract (cursor never advanced over them; the
      // table lock excludes concurrent writers). They must be REMOVED before
      // this session commits a higher tag, or they would become loadable and
      // duplicate the rows this session is about to re-extract. The loader's
      // own isSessionLoadable filter covers the window until we get here.
      // a non-numeric committed tag (corrupted watermark) REFUSES the
      // extract loudly: skipping the sweep would let orphan dirs survive
      // until this session commits a numeric tag above them — at which
      // point they turn loadable next to the re-extracted copies of their
      // own rows (silent duplicates). Same fail-closed polarity as the
      // loader's isSessionLoadable.
      wm.metadata.last_session.foreach { committed =>
        val c = committed.toLongOption.getOrElse(throw new IllegalStateException(
          s"${id.qualified}: committed last_session '$committed' is not " +
            "numeric — refusing to extract (the orphan-session sweep " +
            "cannot run safely); repair the watermark first"))
        val outPath = new org.apache.hadoop.fs.Path(outDir)
        val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(outPath)) {
          fs.listStatus(outPath).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith("session=") &&
                n.stripPrefix("session=").toLongOption.exists(_ > c))
              fs.delete(st.getPath, true)
          }
        }
      }
      val partitionCols = datetimePartitionCols(batch, config, id)
      // nanoTime for uniqueness across rapid sequential sessions (ms
      // resolution collided), clamped ABOVE the committed high-water: nanoTime
      // is boot-relative, so after a host reboot it can run BELOW the
      // committed tag — a crash would then leave an orphan session the
      // high-water filter considers loadable (duplicates) and the orphan
      // sweep above never deletes. Monotonic tags keep both invariants.
      val sessionTag = math.max(System.nanoTime(),
        wm.metadata.last_session.flatMap(_.toLongOption).getOrElse(0L) + 1L)
      val sessionDir = s"$outDir/session=$sessionTag"

      // SIZE-AWARE staging file count: maxRecordsPerFile bounds files from
      // ABOVE but a many-partition small batch (a 64-file source table, a
      // wide JDBC bound scan that matched few rows) still writes one tiny
      // file per partition — per-file footer opens on every later load and
      // object-store request amplification at scale. When plan statistics
      // say the batch is small, shuffle it down to ~32 MB/file before
      // staging; unknown or large stats keep the source partitioning (at
      // real scale many staged files per session IS the desired layout).
      // ~4 MB/file target keeps parquet encode PARALLEL for mid-size
      // batches (a 32 MB/file target would funnel a 100 MB batch into 3
      // write tasks) while still collapsing the tiny-batch file spray;
      // capped at the session's parallelism — more write tasks than cores
      // buys nothing.
      def sized(d: org.apache.spark.sql.DataFrame) = {
        val plan = d.queryExecution.optimizedPlan
        val sentinel =
          org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes
        val stats = plan.stats.sizeInBytes
        // INPUT bytes too, summed over the leaves: coalesce caps the whole
        // shuffle-free stage — scan and filter included — so a CBO-style
        // estimate that shrinks a selective filter's OUTPUT below the
        // threshold while the scan still reads a multi-GB source must not
        // funnel that scan into 1-2 tasks. Engage only when the leaves say
        // the read side is small too.
        val leafBytes = plan.collectLeaves().map(_.stats.sizeInBytes).sum
        val unknown = stats >= sentinel || leafBytes >= sentinel
        if (unknown || stats > (128L << 20) || leafBytes > (512L << 20)) d
        else {
          val target = ((stats / (4L << 20)) + 1)
            .min(BigInt(spark.sparkContext.defaultParallelism)).toInt
          // coalesce, not repartition: the staging write is encode-bound
          // map work, so folding it into fewer tasks costs nothing
          // upstream, skips a shuffle (an added exchange on a 1-partition
          // source measurably halved extract throughput at bench sf), and
          // is a NO-OP when the batch is already at or below the target —
          // no current-partition probe needed.
          d.coalesce(target)
        }
      }
      val writer = partitionCols match {
        case Some((withParts, cols)) =>
          sized(withParts).write.partitionBy(cols: _*)
        case None => sized(batch).write
      }
      val (_, secs) = SessionMetrics.timed {
        writer
          .mode(SaveMode.Append)
          .option("compression", compression)
          // bound file size instead of per-batch files (small-file fix the
          // reference left as roadmap, PERFORMANCE_OPTIMIZATION_GUIDE.md:190-199)
          .option("maxRecordsPerFile", targetFileRows.toString)
          .parquet(sessionDir)
      }

      // Post-write accounting is METADATA-ONLY: one recursive listing gives
      // paths+bytes, ONE footer open per file gives rows — and, for id-only
      // CDC, the exact max(id) from the footer int64 statistics, so the
      // cursor needs NO post-write read at all. Other strategies recover the
      // cursor with a pruned columnar scan of only the ts/id columns.
      val conf = spark.sparkContext.hadoopConfiguration
      val listed = listParquetFilesWithSize(spark, sessionDir)
      val statsCursorCol =
        if (config.strategy == CdcStrategyKind.IdOnly) config.idColumn else None
      val (rows, footerMax) =
        ParquetFooters.scanStats(listed.map(_._1), conf, statsCursorCol)
      val bytes = listed.map(_._2).sum
      val files = listed.size.toLong
      val next =
        if (rows == 0) cursor
        else footerMax match {
          case Some(m) if statsCursorCol.isDefined => Cursor(lastId = Some(m))
          case _ => strategy.extractCursor(spark.read.parquet(sessionDir))
        }

      val done = store.getOrCreate(id.scoped, config.strategy.name)
        .afterExtractSession(next.lastTimestamp.orElse(cursor.lastTimestamp),
          next.lastId.orElse(cursor.lastId), rows, files, store.nowString(),
          // the ONE commit point: cursor advance + session loadability
          // become visible together (a crashed session stays invisible to
          // the loader and its rows are re-extracted — never duplicated)
          sessionTag = Some(sessionTag.toString))
      store.save(done)
      ExtractResult(id, rows, files, next, sessionDir,
        SessionMetrics(rows, files, bytes, secs))
    } catch {
      case e: Throwable =>
        val failed = store.getOrCreate(id.scoped, config.strategy.name)
          .markExtractFailed(Option(e.getMessage).getOrElse(e.getClass.getName),
            store.nowString())
        store.save(failed)
        throw e
    }
  }

  /** datetime/hybrid layouts derive partition columns from the CDC timestamp,
    * matching the reference's key shapes EXACTLY (generate_s3_key,
    * s3_manager.py:179-211): datetime = `year/month/day/hour`, hybrid =
    * `year/month/table/day/hour` (the table level interleaved mid-path).
    * month/day/hour are zero-padded like the reference's `%02d`. The derived
    * columns live only in the directory structure — the loader reads staged
    * LEAF FILES directly, so they never enter the warehouse schema. */
  private def datetimePartitionCols(df: DataFrame, config: CdcConfig, id: TableId)
      : Option[(DataFrame, Seq[String])] = {
    def pad2(c: org.apache.spark.sql.Column) = format_string("%02d", c)
    // withColumn on an existing name REPLACES it — a source column named
    // 'year'/'hour'/... would be silently overwritten by the derived value
    // and then stripped into the directory structure: its real data would
    // never reach the staged leaf files. Refuse loudly instead.
    def requireNoClash(derived: Seq[String]): Unit = {
      val clash = df.columns.map(_.toLowerCase).toSet.intersect(derived.toSet)
      require(clash.isEmpty,
        s"source columns ${clash.mkString(",")} collide with the " +
          s"$partitionStrategy staging layout's derived partition columns; " +
          "rename them or use the 'table' partition strategy")
    }
    // epoch-seconds CDC columns are BIGINT: convert before the calendar
    // functions or the write plan fails analysis
    def tsExpr(ts: String) =
      if (config.timestampIsUnixEpoch) to_timestamp(col(ts)) else col(ts)
    (partitionStrategy, config.timestampColumn) match {
      case (PartitionStrategy.Datetime, Some(ts)) =>
        requireNoClash(Seq("year", "month", "day", "hour"))
        val t = tsExpr(ts)
        val withParts = df
          .withColumn("year", year(t))
          .withColumn("month", pad2(month(t)))
          .withColumn("day", pad2(dayofmonth(t)))
          .withColumn("hour", pad2(hour(t)))
        Some((withParts, Seq("year", "month", "day", "hour")))
      case (PartitionStrategy.Hybrid, Some(ts)) =>
        requireNoClash(Seq("year", "month", "table", "day", "hour"))
        val t = tsExpr(ts)
        val withParts = df
          .withColumn("year", year(t))
          .withColumn("month", pad2(month(t)))
          .withColumn("table", lit(id.table))
          .withColumn("day", pad2(dayofmonth(t)))
          .withColumn("hour", pad2(hour(t)))
        Some((withParts, Seq("year", "month", "table", "day", "hour")))
      case _ => None
    }
  }

  private[extract] def listParquetFiles(spark: SparkSession, dir: String): Seq[String] =
    listParquetFilesWithSize(spark, dir).map(_._1)

  /** One recursive listing returning (path, bytes) — the shared
    * [[graft.util.FsListing]] (hidden-segment-aware, zero extra RPCs). */
  private[extract] def listParquetFilesWithSize(spark: SparkSession,
                                                dir: String): Seq[(String, Long)] =
    graft.util.FsListing
      .parquetFilesMeta(dir, spark.sparkContext.hadoopConfiguration)
      .map(f => (f._1, f._2))

  /** Snapshot MAX(id) ceiling at session start (ref row_based.py:781-845). */
  def snapshotCeiling(df: DataFrame, idCol: String): Option[Long] = {
    val row = df.agg(max(col(idCol)).cast("long")).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }
}
