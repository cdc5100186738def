package graft.pipeline

import java.util.concurrent.{Executors, TimeUnit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.{ExtractResult, Extractor}
import graft.load.{LoadResult, Loader}
import graft.model._
import graft.util.{Retry, SessionMetrics}
import graft.watermark.WatermarkStore
import scala.util.{Failure, Success, Try}

/** Per-table outcome of one pipeline run (ref per-table summary,
  * base.py:1446-1471). */
final case class TableReport(table: TableId, ok: Boolean,
                             extract: Option[ExtractResult],
                             load: Option[LoadResult],
                             error: Option[String],
                             seconds: Double,
                             parityOk: Option[Boolean] = None,
                             // summed hot-bucket census of this table's
                             // post-ops (LSH dedup maintenance): what the
                             // bucket cap silently DISCARDED this sync —
                             // recall loss a user can't see in the output,
                             // so the sync report carries it. None = no
                             // LSH post-op ran.
                             hotBucketDrops:
                               Option[graft.functions.DedupFunctions.HotBucketDrops] = None) {
  def rows: Long = load.map(_.loadedRows).orElse(extract.map(_.rows)).getOrElse(0L)
}

final case class PipelineReport(pipeline: String, tables: Seq[TableReport],
                                seconds: Double) {
  def allOk: Boolean = tables.forall(_.ok)
  def totalRows: Long = tables.map(_.rows).sum
}

/** Resolves a configured table spec to a source DataFrame. The parquet
  * catalog reads `{root}/{table}.parquet` (the fixture layout); the JDBC
  * catalog serves a live database (`pipeline.source: "jdbc:..."` in YAML). */
trait SourceCatalog {
  /** Lazy source DataFrame. `cursor` is the table's committed CDC cursor —
    * a hint only: catalogs that can bound their scan with it (JDBC range
    * partitioning) should; file catalogs ignore it. The STRATEGY still
    * applies its exact predicate downstream either way. */
  def table(spark: SparkSession, spec: TableSpec,
            cursor: graft.cdc.Cursor = graft.cdc.Cursor()): DataFrame

  /** Session-start MAX(id) snapshot feeding the extract ceiling (A2
    * infinite-sync guard, ref row_based.py:278-292): rows arriving after
    * this point must not extend the running session. Catalogs override with
    * a pushed / metadata-only form — the default is a pruned single-column
    * Spark aggregate, correct everywhere but a full column scan. */
  def snapshotCeiling(spark: SparkSession, spec: TableSpec): Option[Long] =
    spec.cdc.idColumn.flatMap { idCol =>
      val row = table(spark, spec)
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(idCol)).cast("long")).head()
      if (row.isNullAt(0)) None else Some(row.getLong(0))
    }

  /** Source row count for the optional source-vs-target parity gate
    * (`validation.enable_source_count_check`; ref count validation,
    * base.py:1360-1399). Catalogs override with pushed/metadata-only
    * forms; the default is a Spark count — correct everywhere, a scan on
    * live sources. */
  def sourceRowCount(spark: SparkSession, spec: TableSpec): Long =
    table(spark, spec).count()
}

/** File-based catalog: `{root}/{table}.{ext}` in the configured format.
  * `parquet` is the fixture/warehouse norm; `orc` the other columnar
  * warehouse staple; `json` (JSONL) and `csv` cover the common
  * training-data delivery formats — the same CDC predicates and load path
  * apply unchanged. */
final class FileCatalog(root: String, format: String = "parquet",
                        nanosAsLong: Boolean = false) extends SourceCatalog {
  def table(spark: SparkSession, spec: TableSpec,
            cursor: graft.cdc.Cursor = graft.cdc.Cursor()): DataFrame = {
    val bare = spec.name.split("\\.").last
    format match {
      case "parquet" =>
        // TIMESTAMP(NANOS) parquet sources (YAML `source_nanos_as_long`):
        // surfaced as epoch-ns longs. A session-level legacy toggle — scoped
        // to the pipeline's own config, never keyed on a table's NAME.
        if (nanosAsLong)
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$root/$bare.parquet")
      case "orc" =>
        spark.read.orc(s"$root/$bare.orc")
      case "json" =>
        spark.read.json(s"$root/$bare.json")
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(s"$root/$bare.csv")
      case other => throw new IllegalArgumentException(
        s"unknown source_format: '$other' (parquet | orc | json | csv)")
    }
  }

  /** Parquet ceiling from FOOTER int64 statistics — zero Spark jobs, one
    * footer open per file (same machinery as the extractor's post-write
    * accounting). Falls back to the scan-based default when any row-bearing
    * block lacks trustworthy stats for the id column. */
  override def snapshotCeiling(spark: SparkSession, spec: TableSpec): Option[Long] =
    spec.cdc.idColumn match {
      case Some(idCol) if format == "parquet" =>
        val bare = spec.name.split("\\.").last
        val conf = spark.sparkContext.hadoopConfiguration
        val files = graft.util.FsListing
          .parquetFilesMeta(s"$root/$bare.parquet", conf).map(_._1)
        val (_, footerMax) =
          graft.util.ParquetFooters.scanStats(files, conf, Some(idCol))
        footerMax.orElse(super.snapshotCeiling(spark, spec))
      case _ => super.snapshotCeiling(spark, spec)
    }

  /** Parquet sources answer the count gate from FOOTERS — zero jobs. */
  override def sourceRowCount(spark: SparkSession, spec: TableSpec): Long =
    if (format == "parquet") {
      val bare = spec.name.split("\\.").last
      val conf = spark.sparkContext.hadoopConfiguration
      graft.util.ParquetFooters.totalRows(
        graft.util.FsListing
          .parquetFilesMeta(s"$root/$bare.parquet", conf).map(_._1), conf)
    } else super.sourceRowCount(spark, spec)
}

/** Back-compat alias for the parquet fixture layout. */
final class ParquetCatalog(root: String) extends SourceCatalog {
  private val inner = new FileCatalog(root, "parquet")
  def table(spark: SparkSession, spec: TableSpec,
            cursor: graft.cdc.Cursor = graft.cdc.Cursor()): DataFrame =
    inner.table(spark, spec, cursor)
}

/** Live-database catalog: `pipeline.source` is the JDBC url (credentials via
  * url params or `${ENV}` interpolation in the YAML). Tables with a CDC id
  * column get the RANGE-PARTITIONED scan (D3 — min/max bound chooser), so a
  * 100 TB source table reads as parallel range scans with the CDC predicate
  * pushed into each partition's WHERE; others read as a single JDBC relation
  * with pushdown. */
final class JdbcCatalog(url: String, numPartitions: Int = 32) extends SourceCatalog {
  private val source = new graft.sources.JdbcSource(
    url, new java.util.Properties(), numPartitions)
  def table(spark: SparkSession, spec: TableSpec,
            cursor: graft.cdc.Cursor = graft.cdc.Cursor()): DataFrame = {
    val id = TableId.parse(spec.name)
    spec.cdc.idColumn match {
      // the cursor's last id tightens both the bounds query and the range
      // layout for incremental reads — without it the ranges span the whole
      // table and every new row lands in the last partition (serial scan)
      case Some(idCol) =>
        source.partitionedTable(spark, id, idCol,
          lowerBoundHint = cursor.lastId)
      case None => source.table(spark, id)
    }
  }

  /** Ceiling as a PUSHED source-side scalar (`SELECT MAX(id)`) — one row
    * fetched, no Spark job, no table scan. DSv1 JDBC never pushes Spark
    * aggregates, so the default `df.agg(max)` would fetch the whole table. */
  override def snapshotCeiling(spark: SparkSession, spec: TableSpec): Option[Long] =
    spec.cdc.idColumn.flatMap(idCol =>
      source.maxId(TableId.parse(spec.name), idCol))

  /** Count gate as a pushed `SELECT COUNT(*)` — one source-side row. */
  override def sourceRowCount(spark: SparkSession, spec: TableSpec): Long =
    source.rowCount(TableId.parse(spec.name))
}

/** Composes Extractor → Loader over a configured table set — the engine's
  * analog of the reference's sequential runner + inter-table thread pool
  * (src/backup/sequential.py, inter_table.py:38-175).
  *
  * Parallel mode maps the reference's ThreadPoolExecutor onto Spark's FAIR
  * scheduler: each table runs extract→load on its own driver thread inside a
  * scheduler pool, so N tables' jobs interleave on the cluster instead of
  * convoying behind the largest table. At 100 TB this is the difference
  * between "cluster saturated by one table's final skewed stage" and
  * "smaller tables stream through alongside it".
  */
final class PipelineRunner(spark: SparkSession, workRoot: String,
                           maxAttempts: Int = 3) {

  /** Report the ROOT failure, not the retry wrapper: "failed after 3
    * attempts" hides the actionable message (e.g. schema drift). */
  private def rootMessage(e: Throwable): String = {
    val cause = e match {
      case r: Retry.RetryExhausted => Option(r.getCause).getOrElse(r)
      case other => other
    }
    Option(cause.getMessage).getOrElse(cause.getClass.getName)
  }

  private def prefixed(p: Pipeline, sub: String): String = {
    val prefix = if (p.sink.isolationPrefix.nonEmpty)
      p.sink.isolationPrefix.stripSuffix("/") + "/" else ""
    s"$workRoot/$prefix$sub"
  }

  def rigFor(p: Pipeline): (WatermarkStore, Extractor, Loader) = {
    val store = new WatermarkStore(prefixed(p, "watermarks"))
    val extractor = new Extractor(store, prefixed(p, "staging"),
      p.sink.partitionStrategy, compression = p.sink.compression)
    val loader = new Loader(store, prefixed(p, "warehouse"),
      commitBatchFiles = p.processing.commitBatchFiles,
      maxFilesPerLoad = p.processing.maxFilesPerLoad,
      evolutionPolicy =
        graft.sources.EvolutionPolicy.fromName(p.processing.evolutionPolicy),
      normalizeColumns = p.processing.normalizeColumns,
      compression = p.sink.compression)
    (store, extractor, loader)
  }

  def catalogFor(p: Pipeline): SourceCatalog = catalogFor(p, None)

  /** Catalog for one (possibly named) connection — the reference's
    * multi-connection registry resolution (connection_registry.py:505-607):
    * a table's `connection:` name selects its own source url/dir + format;
    * None is the pipeline's default `source:`. Unknown names were rejected
    * at config parse, so the lookup here cannot miss. */
  def catalogFor(p: Pipeline, conn: Option[String]): SourceCatalog = {
    val (src, fmt, nanos) = conn.flatMap(p.connections.get) match {
      case Some(c) => (c.source, c.sourceFormat, c.sourceNanosAsLong)
      case None => (p.source, p.sourceFormat, p.sourceNanosAsLong)
    }
    if (src.startsWith("jdbc:")) new JdbcCatalog(src)
    else new FileCatalog(src, fmt, nanos)
  }

  /** One catalog per distinct connection per run (a JDBC catalog carries
    * partition-bound state worth reusing across that connection's tables);
    * an explicit `catalog` override (tests, CLI injection) wins for ALL
    * tables. Thread-safe — parallel mode resolves from worker threads. */
  private def catalogResolver(p: Pipeline, overrideCat: Option[SourceCatalog])
      : TableSpec => SourceCatalog = {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, SourceCatalog]()
    spec => overrideCat.getOrElse(
      cache.computeIfAbsent(spec.connection.getOrElse(""),
        _ => catalogFor(p, spec.connection)))
  }

  /** Run the whole pipeline (extract+load per table). `tableFilter` narrows to
    * one table (CLI `-t`). */
  def sync(p: Pipeline, tableFilter: Option[String] = None,
           catalog: Option[SourceCatalog] = None): PipelineReport = {
    // scratch scope: every relation an operator scratch-materializes during
    // this run is drained into sinks by the time sync returns, so the sync
    // sweeps ITS OWN scope at release — a per-sync daemon no longer grows
    // scratch until JVM exit (round-9 ask #7), and concurrent syncs or
    // ad-hoc callers on other threads are untouched (scope membership is
    // per-thread + explicit worker tagging, not a process-global counter)
    graft.util.Scratch.retain()
    try syncInner(p, tableFilter, catalog)
    finally {
      val reclaimed = graft.util.Scratch.release()
      if (reclaimed > 0)
        System.err.println(f"[graft] scratch swept: $reclaimed%d bytes")
    }
  }

  private def syncInner(p: Pipeline, tableFilter: Option[String],
                        catalog: Option[SourceCatalog]): PipelineReport = {
    val cat = catalogResolver(p, catalog)
    val (store, extractor, loader) = rigFor(p)
    val specs = p.tables.filter(t => tableFilter.forall(f =>
      t.matches(f)))
    val t0 = System.nanoTime()

    // DAG-style phase ordering (D7): dimensions complete before facts start,
    // so a fact increment never joins against a stale dimension snapshot.
    // Within each phase, parallel mode applies.
    val (dims, facts) = specs.partition(_.tableType == TableType.Dimension)
    // `strategy: parallel` is honored even when max_parallel_tables is left
    // at its default (pool falls back to the phase size, capped at 4);
    // max_parallel_tables > 1 alone also enables it (back-compat).
    val wantParallel = p.processing.strategy.equalsIgnoreCase("parallel") ||
      p.processing.maxParallelTables > 1
    def runPhase(phase: Seq[TableSpec]): Seq[TableReport] =
      if (wantParallel && phase.size > 1) {
        val pool =
          if (p.processing.maxParallelTables > 1) p.processing.maxParallelTables
          else math.min(phase.size, 4)
        runParallel(p, phase, cat, extractor, loader, pool)
      } else
        phase.map(runTable(p, _, cat, extractor, loader))
    val reports = runPhase(dims) ++ runPhase(facts)

    val report = PipelineReport(p.name, reports, (System.nanoTime() - t0) / 1e9)
    // completion markers for external orchestration — written strictly
    // AFTER every table's lock released, from the FINAL reports (a crash
    // anywhere above emits nothing; a failed table emits only a _FAILED
    // artifact). ONE date + timestamp for the whole run, or a sync crossing
    // midnight would scatter its artifacts over two date dirs and strand a
    // sensor polling either. A marker-write failure must not fail a sync
    // that already committed — it is reported, and the sensor's timeout is
    // the backstop.
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = markersRoot(p)
      val date = java.time.LocalDate.now()
      val now = java.time.Instant.now()
      val execId = s"${p.name.replaceAll("[^A-Za-z0-9_]", "_")}_" +
        s"${System.currentTimeMillis()}"
      reports.foreach(r => CompletionMarkers.writeTable(conf, root, p.name,
        execId, r, store.get(r.table.scoped), date, now))
      // a FILTERED sync is a partial run: its tables get their markers, but
      // signaling whole-pipeline completion from a one-table backfill would
      // fire every downstream sensor gated on the pipeline artifact
      if (tableFilter.isEmpty)
        CompletionMarkers.writePipeline(conf, root, report, execId, date, now)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] completion-marker write failed: ${e.getMessage}")
    }
    report
  }

  /** THE marker-artifact root for a pipeline — one definition shared with
    * the CLI `markers` verb (a drifting copy would list an empty dir and
    * report "no markers" while markers exist). */
  def markersRoot(p: Pipeline): String = prefixed(p, "markers")

  /** Session-start ceiling for the id-keyset strategies (A2): snapshot
    * MAX(id) BEFORE the source scan plans, so rows arriving mid-extract
    * stay for the next session (ref row_based.py:278-292). Timestamp-only /
    * full-sync / custom-SQL syncs take no id ceiling, matching the
    * reference's row_based-only guard. */
  private def ceilingFor(cat: SourceCatalog, spec: TableSpec): Option[Long] =
    spec.cdc.strategy match {
      case CdcStrategyKind.IdOnly | CdcStrategyKind.Hybrid
          if spec.cdc.idColumn.isDefined =>
        cat.snapshotCeiling(spark, spec)
      case _ => None
    }

  private def runTable(p: Pipeline, spec: TableSpec,
                       cats: TableSpec => SourceCatalog,
                       extractor: Extractor, loader: Loader): TableReport = {
    val cat = cats(spec)
    val id = spec.tableId(p)
    val t0 = System.nanoTime()
    // ONE session lock spans extract+load+parity: a second concurrent sync of
    // the same table is refused outright (TableLockedException → failed
    // report) instead of interleaving watermark saves with this one. The
    // extractor/loader's own locks are reentrant under it (same thread).
    Try {
      extractor.store.withTableLock(id.scoped) {
        val wm0 = extractor.store.get(id.scoped)
        val ceiling = ceilingFor(cat, spec)
        val df = cat.table(spark, spec, graft.cdc.Cursor(
          wm0.flatMap(_.mysql_state.last_timestamp),
          wm0.flatMap(_.mysql_state.last_id)))
        val ext = Retry.withBackoff(maxAttempts)(
          extractor.extract(spark, id, df, spec.cdc, ceiling))
        val load = Retry.withBackoff(maxAttempts)(
          if (spec.mergeKeys.nonEmpty)
            loader.mergeLoad(spark, id, extractor.stagingDir(id), spec.cdc,
              spec.mergeKeys, spec.mergeBuckets)
          else
            loader.load(spark, id, extractor.stagingDir(id), spec.cdc))
        // D7 count-parity quality gate (ref DAG quality gate,
        // prod_to_dw_mysql_sync_hourly.py:754): warehouse row count must equal
        // the watermark's cumulative loaded rows. Only meaningful for
        // append-style loads (replace resets the target but not the counter).
        // The count comes from parquet FOOTERS — O(files) metadata reads, not
        // a full scan of the warehouse per sync.
        // ...and only for APPEND loads: merge-mode dedups by key, so the
        // cumulative counter (which counts every staged row, updates
        // included) legitimately exceeds the warehouse count — the gate
        // would false-fail every merge table after its first update row
        val wmParity: Option[Boolean] =
          if (spec.countCheck && !spec.cdc.requiresTruncateBeforeLoad &&
              spec.mergeKeys.isEmpty) {
            val targetRows = loader.targetRowCount(spark, id)
            val wmRows = extractor.store.get(id.scoped)
              .map(_.redshift_state.total_rows).getOrElse(0L)
            Some(targetRows == wmRows)
          } else None
        // A4 source-vs-target count gate (ref base.py:1360-1399): pushed
        // COUNT(*) on JDBC, footer rows on parquet — valid for snapshot
        // (full-sync replace) and append-only tables, where the counts are
        // expected equal after every sync
        val srcParity: Option[Boolean] =
          if (spec.sourceCountCheck)
            Some(cat.sourceRowCount(spark, spec) ==
              loader.targetRowCount(spark, id))
          else None
        val parity: Option[Boolean] = (wmParity, srcParity) match {
          case (None, None) => None
          case (a, b) => Some(a.forall(identity) && b.forall(identity))
        }
        // declarative data-quality gate (YAML expectations): all contracts
        // in ONE aggregate pass over the target; violations fail the table
        val expViolations: Seq[String] =
          if (spec.expectations.isEmpty) Nil
          else loader.readTarget(spark, id) match {
            case Some(t) =>
              graft.operators.Expectations.violations(t, spec.expectations)
            case None => Seq("expectations declared but table never loaded")
          }
        // post-load derived tables (YAML post_ops), still under the
        // session lock — the reference's post-load SQL stage runs inside
        // every sync the same way. The expectations gate GATES them: a
        // violating increment must not be folded into derived state whose
        // exactly-once cursors make the fold irreversible (neardup_labels
        // bands, scd2 history). Held-back sessions refold on the next
        // PASSING sync — the fold cursor never advanced.
        val hotDrops =
          if (expViolations.isEmpty) {
            // the LSH post-ops evaluate their hot-bucket census eagerly on
            // THIS thread (plan-construction jobs) and append to the
            // per-thread log — drain stale records first so the report
            // carries only THIS table's censuses
            graft.functions.DedupFunctions.drainHotBucketDrops()
            PostOps.run(spark, spec, id, extractor, loader)
            val d = graft.functions.DedupFunctions.drainHotBucketDrops()
            if (d.isEmpty) None
            else Some(graft.functions.DedupFunctions.HotBucketDrops(
              d.map(_.buckets).sum, d.map(_.indexRows).sum))
          } else None
        (ext, load, parity, expViolations, hotDrops)
      }
    } match {
      case Success((ext, load, parity, expViolations, hotDrops)) =>
        val errs =
          (if (parity.contains(false)) Seq("count parity check failed")
           else Nil) ++ expViolations
        hotDrops.filter(_.indexRows > 0).foreach(d =>
          System.err.println(s"[graft] ${id.qualified}: LSH hot-bucket cap " +
            s"dropped ${d.indexRows} index rows in ${d.buckets} buckets " +
            "this sync (recall loss - raise max_bucket_size to keep them)"))
        TableReport(id, ok = parity.forall(identity) && expViolations.isEmpty,
          Some(ext), Some(load),
          if (errs.nonEmpty) Some(errs.mkString("; ")) else None,
          (System.nanoTime() - t0) / 1e9, parity, hotBucketDrops = hotDrops)
      case Failure(e) =>
        TableReport(id, ok = false, None, None,
          Some(rootMessage(e)),
          (System.nanoTime() - t0) / 1e9)
    }
  }

  /** Inter-table parallelism (D2): driver threads + FAIR scheduler pools.
    * Requires spark.scheduler.mode=FAIR for true pool fairness; with the
    * default FIFO it still overlaps stages, just unweighted. */
  private def runParallel(p: Pipeline, specs: Seq[TableSpec],
                          cat: TableSpec => SourceCatalog,
                          extractor: Extractor, loader: Loader,
                          poolSize: Int): Seq[TableReport] = {
    val pool = Executors.newFixedThreadPool(poolSize)
    // carry the sync's scratch scope onto the worker threads: scope
    // membership is per-thread (so concurrent ad-hoc callers can't be
    // swept), which means fan-out workers must tag themselves in or their
    // per-table scratch would silently fall to the JVM-exit tier
    val scratchScope = graft.util.Scratch.currentScope
    try {
      val futures = specs.map { spec =>
        pool.submit(new java.util.concurrent.Callable[TableReport] {
          def call(): TableReport = {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool",
              s"graft-${spec.name}")
            scratchScope.foreach(_.enter())
            try runTable(p, spec, cat, extractor, loader)
            finally {
              scratchScope.foreach(_.exit())
              spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            }
          }
        })
      }
      // A table exceeding the timeout becomes a FAILED report for that table
      // only — completed tables keep their results, and the stuck task is
      // interrupted via shutdownNow in the finally (it must not keep running
      // and mutating watermarks after the sync returned).
      futures.zip(specs).map { case (fut, spec) =>
        Try(fut.get(p.processing.timeoutMinutes.toLong, TimeUnit.MINUTES)) match {
          case Success(report) => report
          case Failure(e) =>
            fut.cancel(true)
            TableReport(spec.tableId(p),
              ok = false, None, None,
              Some(e match {
                case _: java.util.concurrent.TimeoutException =>
                  s"timed out after ${p.processing.timeoutMinutes} minutes"
                case other => rootMessage(other)
              }),
              (p.processing.timeoutMinutes.toLong * 60).toDouble)
        }
      }
    } finally pool.shutdownNow()
  }

  /** Extract-only (CLI `backup`). */
  def backup(p: Pipeline, tableFilter: Option[String] = None): PipelineReport = {
    val cats = catalogResolver(p, None)
    val (_, extractor, _) = rigFor(p)
    val specs = p.tables.filter(t => tableFilter.forall(f =>
      t.matches(f)))
    val t0 = System.nanoTime()
    val reports = specs.map { spec =>
      val cat = cats(spec)
      val id = spec.tableId(p)
      val s0 = System.nanoTime()
      val ceiling = ceilingFor(cat, spec)
      Try(Retry.withBackoff(maxAttempts)(
        extractor.extract(spark, id, cat.table(spark, spec), spec.cdc,
          ceiling))) match {
        case Success(ext) => TableReport(id, ok = true, Some(ext), None, None,
          (System.nanoTime() - s0) / 1e9)
        case Failure(e) => TableReport(id, ok = false, None, None,
          Some(rootMessage(e)),
          (System.nanoTime() - s0) / 1e9)
      }
    }
    PipelineReport(p.name, reports, (System.nanoTime() - t0) / 1e9)
  }

  /** Load-only (CLI `load`): picks up staged-but-unprocessed files. */
  def loadOnly(p: Pipeline, tableFilter: Option[String] = None): PipelineReport = {
    val (_, extractor, loader) = rigFor(p)
    val specs = p.tables.filter(t => tableFilter.forall(f =>
      t.matches(f)))
    val t0 = System.nanoTime()
    val reports = specs.map { spec =>
      val id = spec.tableId(p)
      val s0 = System.nanoTime()
      // same session lock as the sync path (runTable above): PostOps.run may
      // call loader.recoverDerived — a MUTATING swap recovery whose contract
      // is "we hold the table lock" — and an unlocked recovery racing a
      // concurrent sync's fold mid-installSwap can rename .__old back over
      // the live dir between the writer's two renames. Lock outside Retry,
      // like sync: a concurrently-locked table must refuse, not retry.
      Try(extractor.store.withTableLock(id.scoped)(
        Retry.withBackoff(maxAttempts) {
        val l = loader.load(spark, id, extractor.stagingDir(id), spec.cdc)
        // the same expectations gate as sync: load-only drains staged
        // sessions into the target, so the quality contracts apply — and
        // must hold back the post_ops folds — identically
        val viol: Seq[String] =
          if (spec.expectations.isEmpty) Nil
          else loader.readTarget(spark, id) match {
            case Some(t) =>
              graft.operators.Expectations.violations(t, spec.expectations)
            case None => Seq("expectations declared but table never loaded")
          }
        // load-only drains staged sessions, so the derived tables that
        // depend on them must refresh here too
        if (viol.isEmpty) PostOps.run(spark, spec, id, extractor, loader)
        (l, viol)
      })) match {
        case Success((l, viol)) => TableReport(id, ok = viol.isEmpty, None,
          Some(l), if (viol.isEmpty) None else Some(viol.mkString("; ")),
          (System.nanoTime() - s0) / 1e9)
        case Failure(e) => TableReport(id, ok = false, None, None,
          Some(rootMessage(e)),
          (System.nanoTime() - s0) / 1e9)
      }
    }
    PipelineReport(p.name, reports, (System.nanoTime() - t0) / 1e9)
  }
}
