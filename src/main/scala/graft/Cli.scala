package graft

import org.apache.spark.sql.SparkSession
import graft.load.Maintenance
import graft.pipeline._
import graft.watermark.WatermarkStore

/** CLI entry point mirroring the reference's verb surface
  * (src/cli/main.py: sync :512-735, backup :512-669, watermark :1505-1958,
  * status :1116-1262, s3clean :2205-2410):
  *
  * {{{
  * graft.Cli sync      -c pipeline.yml [-t table] [--work-dir DIR] [--parallel N] [--dry-run]
  * graft.Cli backup    -c pipeline.yml [-t table] [--work-dir DIR]
  * graft.Cli load      -c pipeline.yml [-t table] [--work-dir DIR]
  * graft.Cli merge     -c pipeline.yml -t table [--keys k1,k2]
  * graft.Cli status    -c pipeline.yml [--work-dir DIR]
  * graft.Cli watermark get|set|reset -c pipeline.yml -t table
  *                     [--timestamp TS] [--id N] [--work-dir DIR]
  * graft.Cli watermark-count get|set|status -c pipeline.yml -t table [--count N]
  * graft.Cli column-map list|get|clear -c pipeline.yml [-t table] [--force]
  * graft.Cli unlock    -c pipeline.yml -t table [--stale-minutes M] [--force]
  * graft.Cli s3clean   -c pipeline.yml --older-than-hours H
  *                     [--keep-newest N] [--dry-run] [--work-dir DIR]
  * }}}
  */
object Cli {

  private def parseArgs(args: Seq[String]): (Seq[String], Map[String, String], Set[String]) = {
    val verbs = scala.collection.mutable.ArrayBuffer[String]()
    val opts = scala.collection.mutable.Map[String, String]()
    val flags = scala.collection.mutable.Set[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dry-run" => flags += "dry-run"; i += 1
        case a if a.startsWith("-") =>
          val key = a.dropWhile(_ == '-')
          // a following token is this option's VALUE unless it looks like
          // another option — negative numbers ("--id -1") are values, not
          // flags, or the cursor silently resets instead of being set
          def isValue(t: String): Boolean =
            !t.startsWith("-") || t.matches("-\\d+(\\.\\d+)?")
          if (i + 1 < args.length && isValue(args(i + 1))) {
            opts(key) = args(i + 1); i += 2
          } else { flags += key; i += 1 }
        case v => verbs += v; i += 1
      }
    }
    (verbs.toSeq, opts.toMap, flags.toSet)
  }

  private def fmtReport(r: PipelineReport): String = {
    val lines = r.tables.map { t =>
      val status = if (t.ok) "OK  " else "FAIL"
      val rps = t.extract.map(e => f"${e.metrics.rowsPerSec}%.0f rows/s")
        .getOrElse("")
      val q = t.load.map(_.quarantinedFiles.size).filter(_ > 0)
        .map(n => s" quarantined=$n").getOrElse("")
      f"  $status ${t.table.qualified}%-32s rows=${t.rows}%-10d ${t.seconds}%6.1fs $rps$q" +
        t.error.map(e => s"  error: $e").getOrElse("")
    }
    val header = s"pipeline ${r.pipeline}: ${if (r.allOk) "SUCCESS" else "FAILED"} " +
      f"(${r.totalRows} rows, ${r.seconds}%.1fs)"
    (header +: lines).mkString("\n")
  }

  /** Thrown by argument-validation helpers; [[run]] converts it to an exit
    * code (keeps the CLI surface testable without sys.exit). */
  private final case class CliExit(code: Int) extends RuntimeException

  /** Numeric option with a usage error instead of a raw
    * NumberFormatException stack trace. */
  private def numOpt[T](opts: Map[String, String], key: String,
                        parse: String => T): Option[T] =
    opts.get(key).map { v =>
      try parse(v) catch {
        case _: NumberFormatException =>
          System.err.println(s"--$key: '$v' is not a number"); throw CliExit(2)
      }
    }

  def main(args: Array[String]): Unit = sys.exit(run(args))

  /** The whole CLI as a function returning the exit code. */
  def run(args: Array[String]): Int =
    try runOrThrow(args) catch { case CliExit(c) => c }

  private def runOrThrow(args: Array[String]): Int = {
    val (verbs, opts, flags) = parseArgs(args.toSeq)
    if (verbs.isEmpty) { System.err.println(usage); throw CliExit(2) }

    val configPath = opts.get("c").orElse(opts.get("config")).getOrElse {
      System.err.println("missing -c <pipeline.yml>"); throw CliExit(2)
    }
    val pipeline =
      try PipelineConfig.fromFile(configPath)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          System.err.println(s"config file not found: $configPath")
          throw CliExit(2)
        case e: Exception =>
          System.err.println(s"invalid pipeline config $configPath: ${e.getMessage}")
          throw CliExit(2)
      }
    val workDir = opts.getOrElse("work-dir", s"/tmp/graft_work/${pipeline.name}")
    val tableFilter = opts.get("t").orElse(opts.get("table"))

    // the product entry runs on the engine's scale configuration (AQE, skew
    // join, scan-split sizing, S3A multipart) — GraftSession, not a bare
    // builder
    lazy val spark = GraftSession.builder(
        appName = s"graft-${pipeline.name}",
        master = Some(sys.env.getOrElse("SPARK_MASTER", "local[*]")),
        shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .config("spark.scheduler.mode",
        if (pipeline.processing.maxParallelTables > 1) "FAIR" else "FIFO")
      .getOrCreate()

    def runner = {
      val parallel = numOpt(opts, "parallel", _.toInt)
      val p = parallel.map(n => pipeline.copy(processing =
        pipeline.processing.copy(maxParallelTables = n))).getOrElse(pipeline)
      (new PipelineRunner(spark, workDir), p)
    }

    val exitCode: Int = verbs.head match {
      case "sync" =>
        val (r, p) = runner
        if (flags("dry-run")) {
          // plan preview: the scan each table WOULD run, from its current
          // cursor — nothing executes, nothing is written
          val (store, _, _) = r.rigFor(p)
          p.tables.filter(t => tableFilter.forall(f =>
            t.matches(f))).foreach { spec =>
            val id = spec.tableId(p)
            val wm = store.get(id.scoped)
            val cursor = graft.cdc.Cursor(
              wm.flatMap(_.mysql_state.last_timestamp),
              wm.flatMap(_.mysql_state.last_id))
            val scan = graft.cdc.CdcStrategy(spec.cdc).scanSpec(cursor)
            val pred = scan.predicate.map(_.toString).getOrElse("(full scan)")
            val mode = if (spec.mergeKeys.nonEmpty)
              s"merge on (${spec.mergeKeys.mkString(",")})" else "append"
            println(f"${id.qualified}%-32s ${spec.cdc.strategy.name}%-14s " +
              s"$mode  cursor=(${cursor.lastTimestamp.getOrElse("-")}," +
              s"${cursor.lastId.map(_.toString).getOrElse("-")})  WHERE $pred")
          }
          0
        } else {
          val report = r.sync(p, tableFilter)
          println(fmtReport(report))
          if (report.allOk) 0 else 1
        }

      case "backup" =>
        val (r, p) = runner
        val report = r.backup(p, tableFilter)
        println(fmtReport(report))
        if (report.allOk) 0 else 1

      case "load" =>
        val (r, p) = runner
        val report = r.loadOnly(p, tableFilter)
        println(fmtReport(report))
        if (report.allOk) 0 else 1

      case "status" =>
        val (r, p) = runner
        val (store, _, _) = r.rigFor(p)
        p.tables.foreach { spec =>
          val id = spec.tableId(p)
          store.get(id.scoped) match {
            case Some(w) =>
              println(f"${id.qualified}%-32s mysql=${w.mysql_state.status}%-12s " +
                f"redshift=${w.redshift_state.status}%-12s " +
                f"rows=${w.mysql_state.total_rows}%-10d " +
                s"cursor=(${w.mysql_state.last_timestamp.getOrElse("-")}," +
                s"${w.mysql_state.last_id.map(_.toString).getOrElse("-")}) " +
                s"files=${w.processed_files.size}")
            case None =>
              println(f"${id.qualified}%-32s (no watermark)")
          }
        }
        0

      case "watermark" =>
        val sub = verbs.lift(1).getOrElse("get")
        val (r, p) = runner
        val (store, _, _) = r.rigFor(p)
        // -t is MANDATORY here: without it the first configured table would
        // be silently selected, and `watermark reset` would wipe the wrong
        // table's cursor (forcing a full re-extract)
        val spec = requireTable(p, tableFilter, "watermark")
        val id = spec.tableId(p)
        sub match {
          case "get" =>
            store.get(id.scoped) match {
              case Some(w) => println(graft.watermark.Watermark.toJson(w)); 0
              case None => println("(no watermark)"); 1
            }
          case "set" =>
            val w = store.setManual(id.scoped, opts.get("timestamp"),
              numOpt(opts, "id", _.toLong))
            println(graft.watermark.Watermark.toJson(w)); 0
          case "reset" =>
            store.reset(id.scoped) match {
              case Some(w) => println(graft.watermark.Watermark.toJson(w)); 0
              case None => println("(no watermark to reset)"); 1
            }
          case other =>
            System.err.println(s"unknown watermark subcommand: $other"); 2
        }

      case "watermark-count" =>
        // externally-verified target row count (ref src/cli/main.py:1959-2204):
        // set the cumulative loaded-rows counter from an authoritative
        // warehouse COUNT(*); get it back; status compares it against the
        // actual warehouse footprint (footer-based, no data scan)
        val sub = verbs.lift(1).getOrElse("get")
        val (r, p) = runner
        val (store, _, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "watermark-count")
        val id = spec.tableId(p)
        sub match {
          case "set" =>
            val n = numOpt(opts, "count", _.toLong).getOrElse {
              System.err.println("watermark-count set requires --count N")
              throw CliExit(2)
            }
            val w = store.setExternalCount(id.scoped, n)
            println(s"${id.qualified} external count set: " +
              s"${w.redshift_state.total_rows}")
            0
          case "get" =>
            store.get(id.scoped) match {
              case Some(w) => println(w.redshift_state.total_rows); 0
              case None => println("(no watermark)"); 1
            }
          case "status" =>
            val wmCount = store.get(id.scoped)
              .map(_.redshift_state.total_rows).getOrElse(0L)
            val actual = loader.targetRowCount(spark, id)
            val parity = wmCount == actual
            println(s"${id.qualified} watermark=$wmCount warehouse=$actual " +
              s"parity=${if (parity) "OK" else "MISMATCH"}")
            if (parity) 0 else 1
          case other =>
            System.err.println(s"unknown watermark-count subcommand: $other"); 2
        }

      case "column-map" =>
        // inspect/manage the PERSISTED column rename maps (digit-prefix /
        // lowercase normalization, P5) — the operator surface of ref
        // src/cli/column_mapping_commands.py (list/show/clear). The map
        // lives as _column_mapping.json next to the warehouse table data.
        val sub = verbs.lift(1).getOrElse("list")
        val (r, p) = runner
        val (_, _, loader) = r.rigFor(p)
        val conf = spark.sparkContext.hadoopConfiguration
        sub match {
          case "list" =>
            val withMaps = p.tables.map { spec =>
              val id = spec.tableId(p)
              id -> graft.sources.ColumnMapStore.load(loader.targetPath(id), conf)
            }.filter(_._2.nonEmpty)
            if (withMaps.isEmpty) println("(no column mappings)")
            else withMaps.foreach { case (id, m) =>
              println(s"${id.qualified}: ${m.size} mapped column(s)")
              m.toSeq.sortBy(_._1).foreach { case (o, n) =>
                println(s"  $o -> $n")
              }
            }
            0
          case "get" =>
            val spec = requireTable(p, tableFilter, "column-map")
            val id = spec.tableId(p)
            val m = graft.sources.ColumnMapStore.load(loader.targetPath(id), conf)
            if (m.isEmpty) { println(s"(no mapping for ${id.qualified})"); 1 }
            else {
              m.toSeq.sortBy(_._1).foreach { case (o, n) => println(s"$o -> $n") }
              0
            }
          case "clear" =>
            // destructive: future loads re-derive the map, but readers that
            // rely on the persisted original→normalized record lose it —
            // mirror the reference's confirmation gate with --force
            val spec = requireTable(p, tableFilter, "column-map")
            val id = spec.tableId(p)
            if (!flags("force")) {
              System.err.println("column-map clear requires --force"); 2
            } else if (graft.sources.ColumnMapStore.clear(loader.targetPath(id), conf)) {
              println(s"cleared column mapping for ${id.qualified}"); 0
            } else { println(s"(no mapping for ${id.qualified})"); 1 }
          case other =>
            System.err.println(s"unknown column-map subcommand: $other"); 2
        }

      case "merge" =>
        // DELETE+INSERT merge of staged-but-unprocessed files into the
        // warehouse table, committed by directory swap (ref settle_orders
        // DELETE USING + INSERT transaction). Routed through mergeLoad — the
        // same path the pipeline takes — so the session lock is held, the
        // processed-files blacklist filters already-merged increments (raw
        // mergeInto over the whole staging dir would resurrect every stale
        // version of every key), the schema-evolution gate applies, and a
        // merge_buckets table keeps its bucketed layout.
        val (r, p) = runner
        val (_, extractor, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "merge")
        val keys = opts.get("keys").map(_.split(",").toSeq)
          .orElse(Option(spec.mergeKeys).filter(_.nonEmpty))
          .orElse(spec.cdc.idColumn.map(Seq(_))).getOrElse {
          System.err.println("merge requires --keys k1,k2 or a cdc_id_column")
          throw CliExit(2)
        }
        val id = spec.tableId(p)
        val res = loader.mergeLoad(spark, id, extractor.stagingDir(id),
          spec.cdc, keys, spec.mergeBuckets)
        println(s"merged ${id.qualified} on (${keys.mkString(",")}): " +
          s"${res.loadedRows} staged rows merged, ${res.skippedFiles} files already processed")
        0

      case "diff" =>
        // source-vs-warehouse row-level parity audit: read BOTH sides in
        // full, snapshotDiff on the key columns, print per-change-type
        // counts + a bounded sample. The debugging complement of the
        // count-parity gate: WHICH keys differ and in WHICH columns.
        // Exit 1 when any difference exists (sensor-friendly).
        val (r, p) = runner
        val (_, _, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "diff")
        val keys = opts.get("keys").map(_.split(",").toSeq)
          .orElse(Option(spec.mergeKeys).filter(_.nonEmpty))
          .orElse(spec.cdc.idColumn.map(Seq(_))).getOrElse {
          System.err.println("diff requires --keys k1,k2 or a cdc_id_column")
          throw CliExit(2)
        }
        val id = spec.tableId(p)
        val target = loader.readTarget(spark, id).getOrElse {
          System.err.println(s"diff: ${id.qualified} has never been loaded")
          throw CliExit(2)
        }
        val source = r.catalogFor(p, spec.connection).table(spark, spec)
        // compare only columns both sides carry (rename maps / evolution
        // can leave the warehouse wider than the live source). When the
        // two schemas share ONLY the keys, snapshotDiff's default would
        // refuse the vacuous comparison — fall back to an explicit
        // presence-only diff and SAY so, instead of a stack trace.
        val shared = source.columns.filter(target.columns.contains)
          .filterNot(keys.contains).toSeq
        if (shared.isEmpty) println(
          s"diff: no non-key columns shared between source and " +
            s"${id.qualified} — reporting key presence only")
        val d = graft.operators.Relational.snapshotDiff(
          source, target, keys,
          compareCols = if (shared.isEmpty) keys else Nil).cache()
        try {
          val counts = d.groupBy("change_type").count().collect()
            .map(row => row.getString(0) -> row.getLong(1)).toMap
          val added = counts.getOrElse("added", 0L)    // in warehouse only
          val removed = counts.getOrElse("removed", 0L) // in source only
          val changed = counts.getOrElse("changed", 0L)
          println(s"${id.qualified} vs source on (${keys.mkString(",")}): " +
            s"$removed source-only, $added warehouse-only, $changed changed")
          val sample = numOpt(opts, "sample", _.toInt).getOrElse(20)
          d.orderBy(keys.map(org.apache.spark.sql.functions.col): _*)
            .limit(sample).collect().foreach { row =>
            println("  " + keys.map(k => s"$k=${row.getAs[Any](k)}")
              .mkString(",") + s" ${row.getAs[String]("change_type")}" +
              Option(row.getAs[String]("changed_cols")).filter(_.nonEmpty)
                .map(c => s" [$c]").getOrElse(""))
          }
          if (added + removed + changed == 0) 0 else 1
        } finally { d.unpersist(); () }

      case "forget" =>
        // targeted deletion (right-to-be-forgotten): remove the given key
        // values from the warehouse table AND tombstone them so a later
        // re-sync cannot resurrect the rows. --key-column defaults to the
        // table's CDC id column; --values is a comma list of key values.
        val (r, p) = runner
        val (cliStore, _, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "forget")
        val keyCol = opts.get("key-column").orElse(spec.cdc.idColumn).getOrElse {
          System.err.println("forget requires --key-column (no cdc_id_column)")
          throw CliExit(2)
        }
        val values = opts.get("values").map(_.split(",").toSeq).getOrElse {
          System.err.println("forget requires --values v1,v2,...")
          throw CliExit(2)
        }
        val id = spec.tableId(p)
        val keysDf = {
          import spark.implicits._
          // key values arrive as strings; cast to the target column's type
          // so the anti-join compares natively
          val raw = values.toDF(keyCol)
          loader.readTarget(spark, id) match {
            case Some(t) if t.columns.contains(keyCol) =>
              raw.select(org.apache.spark.sql.functions.col(keyCol)
                .cast(t.schema(keyCol).dataType))
            case _ => raw
          }
        }
        val deleted = loader.deleteKeys(spark, id, keysDf)
        // right-to-be-forgotten must reach DERIVED near-dup state too: the
        // forgotten doc's label row and its CONTENT-DERIVED band hashes are
        // scrubbed from each label-maintaining side-table (neardup_labels /
        // simhash_labels / embedding_neardup), preserving the fold
        // cursor (or the next sync would refold history and resurrect the
        // pairs). Other docs' cluster labels may retain the forgotten doc's
        // NUMERIC id as their group label — an opaque group id, not content.
        val bandSuffix: Map[String, Seq[(String, String)]] = Map(
          "neardup_labels" -> Seq(".__bands" -> "doc_id"),
          "simhash_labels" -> Seq(".__simbands" -> "doc_id"),
          "embedding_neardup" -> Seq(".__cosbands" -> "doc_id"),
          // edge form: band rows by doc_id AND the content-class rep rows
          // (md5 fingerprints are content-derived — they must go too)
          "neardup_labels_edges" -> Seq(".__repbands" -> "doc_id",
            ".__repfps" -> "rep_id"))
        // the scrub rewrites derived side tables and runs swap recovery —
        // MUTATING operations that must hold the table lock (a concurrent
        // sync's fold mid-installSwap could otherwise have its commit
        // broken by our recovery rename). deleteKeys above takes the same
        // lock internally; two windows, each internally consistent.
        cliStore.withTableLock(id.scoped) {
          spec.postOps.filter(po => bandSuffix.contains(po.op))
            .filter(_.idColumn.contains(keyCol)).foreach { po =>
              val dId = id.copy(table = po.target)
              // locked context: converge any crashed swap before reading the
              // label table or its state (readState itself is read-only)
              loader.recoverDerived(spark, dId)
              val state = loader.readDerivedState(spark, dId)
              def scrub(path: String, keyName: String,
                        keepState: Boolean): Unit = {
                val fsP = new org.apache.hadoop.fs.Path(path)
                val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
                if (fs.exists(fsP)) {
                  import org.apache.spark.sql.functions.col
                  val cur = spark.read.parquet(path)
                  val s2 = spark; import s2.implicits._
                  val doomed = values.toDF(keyName)
                    .select(col(keyName).cast(cur.schema(keyName).dataType))
                  // through the loader, not AtomicDir directly: the rewrite
                  // must keep the pipeline's configured sink compression
                  loader.replaceDerivedAt(spark, path,
                    cur.join(doomed, Seq(keyName), "left_anti"),
                    if (keepState) state else None)
                  ()
                }
              }
              scrub(loader.targetPath(dId), "id", keepState = true)
              bandSuffix(po.op).foreach { case (suffix, keyName) =>
                scrub(loader.targetPath(dId) + suffix, keyName,
                  keepState = false)
              }
              // EDGE-FORM REP RE-ELECTION: the rep-collapsed side tables key
              // whole content classes through one representative — scrubbing
              // a rep whose class has SURVIVING members would orphan them
              // (their band rows were never in the rep index, so future
              // identical or near-dup content could never link to them
              // again: silent recall loss the full-form tables don't have,
              // since there every member keeps its own rows). Re-elect the
              // min surviving id per orphaned fingerprint from the already-
              // scrubbed base table, restore its (fingerprint, rep_id) row,
              // and add the new rep's band-index rows. Runs BEFORE the
              // generic scrub would be wrong (the doomed rows must go and
              // the base must already be deleted) — so it recomputes from
              // the PRE-scrub fps relation read here, after deleteKeys.
              if (po.op == "neardup_labels_edges") {
                val fpsPath = loader.targetPath(dId) + ".__repfps"
                val bandsPath = loader.targetPath(dId) + ".__repbands"
                val fpsP = new org.apache.hadoop.fs.Path(fpsPath)
                val fs2 = fpsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
                if (fs2.exists(fpsP)) {
                  import org.apache.spark.sql.functions.col
                  val curFps = spark.read.parquet(fpsPath)
                  // the generic scrub above already removed doomed rows —
                  // orphaned FINGERPRINTS are therefore exactly the class
                  // fingerprints still present in the (already-deleted) BASE
                  // but absent from the fps table: classes that lost their
                  // rep. repFingerprints is THE class definition (same
                  // normalization, same eligibility gate) — the re-elected
                  // rep is its min surviving id, so any future change to the
                  // fingerprint rule reaches this path automatically.
                  val txt = po.textColumn.get
                  val base = loader.readTarget(spark, id).getOrElse(
                    throw new IllegalStateException(
                      s"forget: ${id.qualified} vanished mid-scrub"))
                  val newReps = graft.util.Scratch.materialize(
                    graft.functions.DedupFunctions
                      .repFingerprints(base, keyCol, txt)
                      .join(curFps.select(col("fingerprint")),
                        Seq("fingerprint"), "left_anti"),
                    "forget_newreps")
                  if (newReps.limit(1).count() > 0) {
                    loader.replaceDerivedAt(spark, fpsPath,
                      spark.read.parquet(fpsPath).unionByName(newReps), None)
                    val bandsP = new org.apache.hadoop.fs.Path(bandsPath)
                    val newRepBands = graft.functions.DedupFunctions
                      .minhashBandIndex(
                        base.join(newReps.select(col("rep_id").as(keyCol)),
                          Seq(keyCol), "left_semi"),
                        keyCol, txt)
                    if (fs2.exists(bandsP))
                      loader.replaceDerivedAt(spark, bandsPath,
                        spark.read.parquet(bandsPath)
                          .unionByName(newRepBands), None)
                    else
                      newRepBands.write.mode("overwrite").parquet(bandsPath)
                    println(s"re-elected ${po.target} class reps for " +
                      "orphaned content classes")
                  }
                }
              }
              println(s"scrubbed ${po.target} labels + band index")
            }
        }
        println(s"forgot ${values.size} key(s) from ${id.qualified}: " +
          s"$deleted row(s) deleted, tombstones persisted")
        0

      case "compact" =>
        // small-file maintenance: rewrite a warehouse table (or each bucket
        // of a bucketed one) into ~target-file-mb files, atomic dir swap
        val (r, p) = runner
        val (_, _, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "compact")
        val id = spec.tableId(p)
        val mb = numOpt(opts, "target-file-mb", _.toLong).getOrElse(256L)
        val (before, after) = loader.compact(spark, id, mb * 1024 * 1024)
        println(s"compacted ${id.qualified}: $before -> $after files")
        0

      case "export" =>
        // materialize a training shard layout: join the base table to a
        // DERIVED (id, shard, pos) address table (curriculum /
        // epoch_shards post-op output) and write shard=<s>/ parquet in
        // exact pos order — the hand-off from warehouse to trainer
        val (r, p) = runner
        val (_, _, loader) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "export")
        val id = spec.tableId(p)
        val layoutName = opts.getOrElse("layout", {
          System.err.println(
            "export requires --layout <derived shard table>"); throw CliExit(2)
        })
        val out = opts.getOrElse("out", {
          System.err.println("export requires --out <dir>"); throw CliExit(2)
        })
        val idColumn = opts.get("id-column")
          .orElse(spec.cdc.idColumn).getOrElse {
          System.err.println(
            "export requires --id-column or a cdc_id_column"); throw CliExit(2)
        }
        val base = loader.readTarget(spark, id).getOrElse {
          System.err.println(s"export: ${id.qualified} has never been loaded")
          throw CliExit(2)
        }
        val layout = loader.readTarget(
          spark, id.copy(table = layoutName)).getOrElse {
          System.err.println(s"export: layout table $layoutName not found")
          throw CliExit(2)
        }
        graft.operators.Layout.writeOrderedShards(base, layout, idColumn, out)
        // count from parquet footers (zero jobs) — an EMPTY export has no
        // data files at all, so a read-back would die on schema inference
        // instead of giving the operator a usable error
        val hconf = spark.sparkContext.hadoopConfiguration
        val nOut = graft.util.FsListing.parquetFilesMeta(out, hconf)
          .map(f => graft.util.ParquetFooters.rowCount(f._1, hconf)).sum
        if (nOut == 0L) {
          System.err.println(s"export: 0 rows written — no '$idColumn' " +
            s"values in $layoutName match ${id.qualified} (wrong layout " +
            "or --id-column?)")
          throw CliExit(2)
        }
        println(s"exported ${id.qualified} via $layoutName: $nOut rows -> $out")
        0

      case "unlock" =>
        // break a STALE per-table session lock — the manual recovery path
        // after a crashed sync left its lock behind (ref lock cleanup CLI,
        // simple_watermark_manager.py:408-463). --stale-minutes defaults to
        // 60 so the bare documented recovery command cannot kill a LIVE
        // session's lock (live sessions heartbeat the lock mtime, so a
        // 60-minute-stale mtime really means a dead owner); breaking
        // unconditionally requires an explicit --force.
        val (r, p) = runner
        val (store, _, _) = r.rigFor(p)
        val spec = requireTable(p, tableFilter, "unlock")
        val id = spec.tableId(p)
        val staleMs =
          if (flags("force")) 0L
          else numOpt(opts, "stale-minutes", _.toLong).map(_ * 60000L).getOrElse(3600000L)
        if (store.breakStaleLock(id.scoped, staleMs)) {
          println(s"broke lock for ${id.qualified}"); 0
        } else { println(s"no lock (or not stale — use --force if the owner is dead) for ${id.qualified}"); 1 }

      case "s3clean" =>
        val (r, p) = runner
        val hours = numOpt(opts, "older-than-hours", _.toDouble).getOrElse {
          System.err.println("s3clean requires --older-than-hours"); throw CliExit(2)
        }
        val cutoff = System.currentTimeMillis() - (hours * 3600 * 1000).toLong
        val stagingRoot = {
          val prefix = if (p.sink.isolationPrefix.nonEmpty)
            p.sink.isolationPrefix.stripSuffix("/") + "/" else ""
          s"$workDir/${prefix}staging"
        }
        val report = Maintenance.clean(stagingRoot, cutoff,
          keepNewest = numOpt(opts, "keep-newest", _.toInt).getOrElse(0),
          dryRun = flags("dry-run"))
        val verb = if (flags("dry-run")) "would delete" else "deleted"
        println(s"s3clean: scanned ${report.scanned} files, $verb " +
          s"${report.deleted.size} (${report.bytesFreed / 1024} KiB)")
        report.deleted.foreach(f => println(s"  $f"))
        0

      case "markers" =>
        // list a run date's completion markers (ref completion-marker CLI,
        // src/cli/completion_marker_utils.py): the sensor's view — each
        // artifact's key already carries table + terminal status; the body
        // is echoed for --verbose-style inspection via cat. --date YYYYMMDD
        // defaults to today.
        val (r, p) = runner
        val date = opts.getOrElse("date",
          java.time.LocalDate.now()
            .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
        // list through the Hadoop FS API, matching how the markers are
        // WRITTEN — java.io.File would silently report "no markers" for any
        // non-local warehouse root (s3a/hdfs) while SUCCESS markers exist
        val dirPath = new org.apache.hadoop.fs.Path(s"${r.markersRoot(p)}/$date")
        val mfs = dirPath.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val files =
          (if (mfs.exists(dirPath)) mfs.listStatus(dirPath).toSeq else Nil)
            .filter(_.getPath.getName.endsWith(".json"))
            .sortBy(_.getPath.getName)
        if (files.isEmpty) { println(s"no markers for $date"); 1 }
        else {
          files.foreach { f =>
            val status =
              if (f.getPath.getName.contains("_SUCCESS")) "OK  " else "FAIL"
            println(s"  $status ${f.getPath.getName}  (${f.getLen} B)")
          }
          if (files.exists(_.getPath.getName.contains("_FAILED"))) 1 else 0
        }

      case "config" =>
        // resolved-config inspection (ref config show-pipeline,
        // src/cli/main.py:1441-1505): everything the engine will actually
        // use, after template inheritance, env interpolation, and defaults.
        println(s"pipeline: ${pipeline.name} — ${pipeline.description}")
        println(s"source:   ${pipeline.source} (${pipeline.sourceFormat})")
        println(s"target:   ${pipeline.target}")
        val proc = pipeline.processing
        println(s"processing: strategy=${proc.strategy} " +
          s"parallel=${proc.maxParallelTables} timeout=${proc.timeoutMinutes}m " +
          s"evolution=${proc.evolutionPolicy} " +
          s"commitBatchFiles=${proc.commitBatchFiles} " +
          s"maxFilesPerLoad=${proc.maxFilesPerLoad.getOrElse("-")} " +
          s"normalizeColumns=${proc.normalizeColumns}")
        println(s"sink: compression=${pipeline.sink.compression} " +
          s"partitionStrategy=${pipeline.sink.partitionStrategy} " +
          s"isolationPrefix=${pipeline.sink.isolationPrefix}")
        pipeline.tables
          .filter(t => tableFilter.forall(f =>
            t.matches(f)))
          .foreach { spec =>
            val mode =
              if (spec.mergeKeys.isEmpty) "append"
              else s"merge(${spec.mergeKeys.mkString(",")})" +
                spec.mergeBuckets.map(b => s" buckets=$b").getOrElse("")
            val cdc = spec.cdc
            println(f"  ${spec.name}%-32s ${cdc.strategy.name}%-14s $mode%-28s " +
              s"ts=${cdc.timestampColumn.getOrElse("-")} " +
              s"id=${cdc.idColumn.getOrElse("-")} " +
              s"where=${cdc.additionalWhere.getOrElse("-")} " +
              s"type=${spec.tableType} countCheck=${spec.countCheck}")
          }
        0

      case other =>
        System.err.println(s"unknown verb: $other\n$usage"); 2
    }
    exitCode
  }

  /** Resolve `-t` to a configured table, REQUIRING it to be present — verbs
    * that mutate one table's state must never fall back to "first table". */
  private def requireTable(p: Pipeline, tableFilter: Option[String],
                           verb: String): TableSpec =
    tableFilter match {
      case None =>
        System.err.println(s"$verb requires -t <table>"); throw CliExit(2)
      case Some(f) =>
        p.tables.filter(_.matches(f)) match {
          case Seq(one) => one
          case Seq() =>
            System.err.println(s"table not found in pipeline config: $f")
            throw CliExit(2)
          case many =>
            // two same-named tables on different connections are legal
            // config; a single-table verb silently taking the FIRST would
            // e.g. forget a key from only one connection's warehouse while
            // reporting success — demand the scoped form instead
            System.err.println(s"-t $f is ambiguous; use a scoped name: " +
              many.map(_.scopedName).mkString(", "))
            throw CliExit(2)
        }
    }

  private val usage: String =
    """usage: graft.Cli <sync|backup|load|merge|status|config|watermark|markers|unlock|s3clean> -c <pipeline.yml>
      |  sync      extract + load every configured table (-t narrows; --parallel N)
      |  config    print the RESOLVED pipeline config (post-inheritance/env/defaults)
      |  backup    extract only
      |  load      load staged-but-unprocessed files only
      |  merge     upsert staged files into the warehouse: -t table [--keys k1,k2]
      |  status    one line per table from the watermark store
      |  watermark get|set|reset -t table [--timestamp TS] [--id N]
      |  watermark-count get|set|status -t table [--count N]
      |  column-map list|get|clear [-t table] [--force]  persisted rename maps
      |  compact   rewrite a table's small files: -t table [--target-file-mb N (256)]
      |  diff      source-vs-warehouse row audit: -t table [--keys k1,k2] [--sample N]
      |  forget    delete + tombstone keys: -t table --values v1,v2 [--key-column c]
      |  markers   list a date's completion markers [--date YYYYMMDD]; exit 1 on any FAILED
      |  export    write shard=<s>/ parquet in layout order: -t table --layout <derived> --out <dir> [--id-column c]
      |  unlock    break a stale session lock: -t table [--stale-minutes M (60)] [--force]
      |  s3clean   --older-than-hours H [--keep-newest N] [--dry-run]""".stripMargin
}
