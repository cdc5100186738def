package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.{ColumnMapStore, EvolutionPolicy, SchemaEvolution}
import graft.util.{ParquetFooters, SessionMetrics}
import graft.watermark.WatermarkStore

/** Result of one load session. `loadedRows` is the analog of the reference's
  * `pg_last_copy_count()` verification (gemini_redshift_loader.py:622-624);
  * `quarantinedFiles` are files that failed footer validation and were skipped
  * without poisoning the session (ref per-file error isolation,
  * gemini_redshift_loader.py:148-199). */
final case class LoadResult(table: TableId, files: Long, loadedRows: Long,
                            skippedFiles: Long, targetPath: String,
                            quarantinedFiles: Seq[String] = Nil,
                            metrics: SessionMetrics = SessionMetrics(0, 0, 0, 0.0))

/** Stage-2 loader: staged Parquet → warehouse table, idempotently.
  * The Spark-native replacement for the reference's per-file Redshift COPY loop
  * (gemini_redshift_loader.py:80-248, 568-662):
  *
  *  - file listing minus the processed-files blacklist (exactly-once at file
  *    granularity, ref :498-527 + simple_watermark_manager.py:203-249);
  *  - one `spark.read.parquet(files: _*)` over the fresh files — the
  *    "massively parallel COPY" is Spark's own parallel scan+write;
  *  - row-count verification from the written data;
  *  - blacklist + cumulative counters committed only after a successful write.
  *
  * Scale: the blacklist check is a driver-side Set on file PATHS (thousands of
  * entries for a 100 TB table at 5M rows/file — trivially driver-sized); the
  * data itself never routes through the driver.
  */
final class Loader(store: WatermarkStore, warehouseRoot: String,
                   commitBatchFiles: Int = 64,
                   maxFilesPerLoad: Option[Int] = None,
                   evolutionPolicy: EvolutionPolicy = EvolutionPolicy.AdditiveOnly,
                   normalizeColumns: Boolean = false,
                   mergeBuckets: Option[Int] = None,
                   compression: String = "snappy") {

  def targetPath(id: TableId): String = s"$warehouseRoot/${id.safeName}"

  /** Load all staged-but-unprocessed files for `id` into the warehouse table.
    * `truncate=true` implements full_sync replace (ref TRUNCATE,
    * gemini_redshift_loader.py:250-272). Orphaned files from a crashed extract
    * (`mysql_status=in_progress`) are still picked up, matching ref :391-397.
    *
    * Robustness (ref per-file COPY loop, gemini_redshift_loader.py:148-199):
    *  - every fresh file is footer-validated first; corrupt files are
    *    QUARANTINED (reported, not blacklisted, not loaded) while the valid
    *    set still loads — one bad file no longer poisons the session;
    *  - valid files load in sub-batches of `commitBatchFiles`, with the
    *    watermark blacklist committed after each sub-batch — the non-atomic
    *    crash window shrinks from the whole session to one sub-batch;
    *  - row counts come from the validated footers, not a second data scan.
    */
  def load(spark: SparkSession, id: TableId, stagedDir: String,
           config: CdcConfig, truncate: Boolean = false): LoadResult =
    store.withTableLock(id.scoped) {
      loadLocked(spark, id, stagedDir, config, truncate)
    }

  private def loadLocked(spark: SparkSession, id: TableId, stagedDir: String,
                         config: CdcConfig, truncate: Boolean): LoadResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    // ensure the watermark doc exists before recovery touches the store;
    // the authoritative snapshot (wmNow) is read AFTER recovery below
    store.getOrCreate(id.scoped, config.strategy.name)
    try {
      // converge any crashed MERGE/COMPACT swap first: if a previous
      // directory-swap died between its two renames, the table's only copy
      // is the `.__old` backup — an append load that ran without restoring
      // it would rebuild a staged-rows-only target, and the NEXT recovery
      // would then discard the backup as stale (silent loss of the table)
      locally {
        val tgt0 = new org.apache.hadoop.fs.Path(targetPath(id))
        val fs0 = tgt0.getFileSystem(conf)
        recoverSwap(fs0, tgt0, new org.apache.hadoop.fs.Path(targetPath(id) + ".__old"))
        recoverBucketBackups(fs0, tgt0)
        // finish any sub-batch whose data was committed but whose blacklist
        // save was lost — and do it BEFORE the blacklist is read below: the
        // recovery installs rows and blacklists their sources, and the
        // truncate/replay decision must SEE both effects. With a stale
        // snapshot, a truncate replay would judge isReplay=false and delete
        // the just-recovered rows while their (now-blacklisted) sources are
        // excluded from reload: permanent silent loss.
        recoverCommittedBatches(fs0, targetPath(id), id, config, conf)
      }
      // the watermark is re-read AFTER the recovery above so the blacklist
      // reflects any sources the recovery just committed
      val wmNow = store.getOrCreate(id.scoped, config.strategy.name)
      // one recursive listing carries the byte sizes too (zero extra RPCs).
      // Sessions a crashed extract never committed are INVISIBLE here — their
      // rows re-extract under the advanced-cursor-less watermark, so loading
      // the orphans too would duplicate them.
      val allMeta = listParquetFilesMeta(spark, stagedDir)
        .filter(f => wmNow.isSessionLoadable(f._1))
      val sizeByFile = allMeta.map(f => f._1 -> f._2).toMap
      val all = allMeta.map(_._1)
      val blacklist = wmNow.processedFileSet
      // newest-first trim (O4, ref gemini_redshift_loader.py:488-492): a huge
      // backlog can't starve fresh data; older files load in later sessions.
      // The mtimes come from the listing above — zero extra RPCs.
      // Footer validation runs DURING the cap selection: corrupt files must
      // not occupy maxFilesPerLoad slots session after session (a corrupt
      // newest set would otherwise wedge the valid backlog behind it
      // forever, with every session reporting success). The footer open
      // doubles as the row count for sub-batch accounting. NonFatal only:
      // an interrupt or OOM must ABORT the session, not quarantine
      // perfectly valid files under a success status.
      val unprocessed = allMeta.filterNot(f => blacklist(f._1))
      val orderedFresh = maxFilesPerLoad match {
        // sort the WHOLE candidate set newest-first (newestFirst's
        // early-return skips the sort when nothing would be trimmed — the
        // cap is applied by the validation loop below, so the order here
        // must be explicit or the O4 guarantee silently inverts)
        case Some(_) => unprocessed.sortBy(f => -f._3).map(_._1)
        case None => unprocessed.map(_._1)
      }
      val capN = maxFilesPerLoad.getOrElse(Int.MaxValue)
      // with the cap set, a mostly-corrupt backlog must not turn the cap
      // selection into an unbounded footer scan (it keeps probing past the
      // cap until it finds capN VALID files): bound total probes to a
      // multiple of the cap. Files past the probe budget stay unprobed and
      // unloaded this session — they are not blacklisted, so a later
      // session (or a repaired file) picks them up; the recurring per-sync
      // cost is the bounded probe budget, not the whole backlog.
      val probeBudget =
        if (maxFilesPerLoad.isDefined) math.max(4L * capN, 64L)
        else Long.MaxValue
      var probes = 0L
      val rowsAcc = scala.collection.mutable.LinkedHashMap[String, Long]()
      val quarAcc = scala.collection.mutable.ArrayBuffer[String]()
      val itFresh = orderedFresh.iterator
      while (rowsAcc.size < capN && probes < probeBudget && itFresh.hasNext) {
        val f = itFresh.next()
        probes += 1
        try rowsAcc(f) = ParquetFooters.rowCount(f, conf)
        catch { case scala.util.control.NonFatal(_) => quarAcc += f }
      }
      val valid = rowsAcc.keys.toSeq
      val quarantined = quarAcc.toSeq
      val fresh = valid ++ quarantined
      val rowsByFile: Map[String, Long] = rowsAcc.toMap
      val target = targetPath(id)
      val doTruncate = truncate || config.requiresTruncateBeforeLoad

      if (fresh.isEmpty && !doTruncate) {
        // a PURE replay (everything staged is already blacklisted) still
        // passes the tombstone gate: the pre-crash session may have
        // installed tombstoned rows and died before its own gate ran.
        // Cached behind the (last_session, tombstone_gen) marker — an
        // IDLE table with a retained backlog must not re-read every
        // staged file on every sync when nothing moved.
        if (all.nonEmpty) {
          val fs0 = new org.apache.hadoop.fs.Path(target).getFileSystem(conf)
          tombstoneGateCached(spark, id, all, fs0)
        }
        return LoadResult(id, 0, 0, all.size.toLong, target)
      }

      val t0 = System.nanoTime()
      var loadedRows = 0L
      var loadedBytes = 0L
      val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(conf)
      // (crashed committed sub-batches were already recovered at entry,
      // BEFORE the blacklist snapshot — SURVEY §7.4 hard-part #1)
      // Truncate (snapshot replace) must clear the target EXACTLY ONCE per
      // snapshot. A crash-replay mid-snapshot (fresh files share a session
      // with already-blacklisted ones) must NOT re-truncate — that would
      // drop the groups the crashed run already installed. Likewise an idle
      // re-run of a fully-loaded snapshot (staged files exist, all
      // blacklisted) must not wipe the table; only a truly empty staging
      // area means "replace with nothing".
      def sessionOf(p: String): Option[String] = {
        val i = p.indexOf("session=")
        if (i < 0) None else Some(p.substring(i).takeWhile(_ != '/'))
      }
      // For session-tagged staging (the product path) a replay is a session
      // that is partially blacklisted. Files staged WITHOUT session tags
      // can't be distinguished that way — there, ANY blacklisted file in the
      // staging dir means a prior partial load of this same file set, and
      // re-truncating would wipe its installed sub-batches (their sources
      // stay blacklisted → permanent loss). The cost of the conservative
      // fallback: mixing a new untagged snapshot into a dir with loaded
      // leftovers appends instead of replacing — stage snapshots into fresh
      // dirs (or session dirs) to get replace semantics.
      val isReplay = valid.flatMap(sessionOf).toSet
        .intersect(all.filter(blacklist).flatMap(sessionOf).toSet).nonEmpty ||
        (valid.exists(sessionOf(_).isEmpty) && all.exists(blacklist))
      if (valid.isEmpty && doTruncate) {
        if (all.isEmpty)
          fs.delete(new org.apache.hadoop.fs.Path(target), true)
        // else: fully-loaded snapshot re-run → keep the table as loaded
      } else {
        if (doTruncate && !isReplay)
          fs.delete(new org.apache.hadoop.fs.Path(target), true)
        // schema-evolution gate (S7): staged batches meet the existing target
        // schema under the configured policy; the reference's alert/halt path
        // becomes SchemaDriftException. Computed once per session, AFTER the
        // truncate decision: a replayed snapshot keeps its rows, so the gate
        // must stay armed against them (only an actually-emptied target
        // reads back None and skips the check)
        val targetSchema = readTarget(spark, id).map(_.schema)
        valid.grouped(math.max(1, commitBatchFiles))
          .foreach { group =>
          // mergeSchema: a group can mix extract sessions that straddle an
          // additive schema change — single-footer inference would hide the
          // new column from the whole group (drift misclassified, or new
          // values silently nulled)
          val raw = spark.read.option("mergeSchema", "true")
            .parquet(group: _*)
          // P5: column-name normalization with the rename map PERSISTED next
          // to the target (ref column_mapper.py:57-84)
          val renamed = if (normalizeColumns) {
            val (_, mapping) = TypeMapper.normalizeColumnNames(raw.columns.toSeq)
            if (mapping.nonEmpty) ColumnMapStore.save(target, mapping, conf)
            ColumnMapStore.apply(raw, mapping)
          } else raw
          val staged = SchemaEvolution(renamed, targetSchema, evolutionPolicy)
          // manifest-commit protocol, per sub-batch:
          //  1. write the batch into a HIDDEN `.__inflight_<h>` dir together
          //     with a manifest naming its source files (replays overwrite);
          //  2. rename to `.__commit_<h>` — the write is now complete;
          //  3. install: rename each part file into the target root under a
          //     deterministic `b<h>_` prefix (idempotent — a replay moves
          //     only what remains);
          //  4. blacklist the source group;
          //  5. drop the commit dir.
          // A crash at ANY point replays exactly-once: before (2) the
          // inflight dir is discarded and rewritten; between (2) and (4) the
          // entry-time recovery finishes the install from the manifest and
          // commits the blacklist; after (4) the group is skipped outright.
          val h = groupHash(group)
          val committed = new org.apache.hadoop.fs.Path(target, s".__commit_$h")
          if (!fs.exists(committed)) {
            val inflight = new org.apache.hadoop.fs.Path(target, s".__inflight_$h")
            fs.delete(inflight, true)
            staged.write.mode(SaveMode.Overwrite)
              .option("compression", compression).parquet(inflight.toString)
            writeGroupManifest(fs,
              new org.apache.hadoop.fs.Path(inflight, ManifestName), group)
            if (!fs.rename(inflight, committed))
              throw new java.io.IOException(s"commit rename failed: $inflight")
          }
          installCommitted(fs, target, committed, h)
          val rows = group.map(rowsByFile).sum
          loadedRows += rows
          loadedBytes += group.map(f =>
            sizeByFile.getOrElse(f, ParquetFooters.fileSize(f, conf))).sum
          // commit the blacklist for THIS sub-batch before starting the next
          store.save(store.getOrCreate(id.scoped, config.strategy.name)
            .afterLoadSession(group, rows, store.nowString()))
          fs.delete(committed, true)
        }
      }
      // Tombstone gate — see [[tombstoneGate]]. Guarded by `valid.nonEmpty`
      // (this session staged loadable rows), NOT by loadedRows: on a crash
      // replay every sub-batch is already blacklisted (loadedRows == 0) but
      // the pre-crash session may have installed tombstoned rows the crash
      // kept the gate from scrubbing — the replay must still re-suppress
      // (idempotent rewrite; the fresh-empty early return above runs the
      // same gate for pure replays WITHOUT truncate). A truncate-mode pure
      // replay (fresh empty, table kept as loaded) lands here with valid
      // empty — it must gate over the whole staged set, or the crash
      // window before the pre-crash session's own gate resurrects
      // tombstoned rows permanently.
      if (valid.nonEmpty) tombstoneGate(spark, id, valid, fs)
      // quarantined files must not enter the gate's read — one corrupt
      // footer would turn the gate into a permanent load failure
      else {
        val readable = all.filterNot(quarantined.toSet)
        if (readable.nonEmpty) tombstoneGateCached(spark, id, readable, fs)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // record the quarantine AFTER the sub-batch commits so the note isn't
      // overwritten by their success saves: status stays success (the valid
      // set loaded), error carries the warning for `status`/ops to see
      if (quarantined.nonEmpty) {
        val wmNow = store.getOrCreate(id.scoped, config.strategy.name)
        store.save(wmNow.copy(redshift_state = wmNow.redshift_state.copy(
          error = Some(s"quarantined ${quarantined.size} corrupt files: " +
            quarantined.take(3).mkString(",")))))
      }
      LoadResult(id, valid.size.toLong, loadedRows,
        (all.size - fresh.size).toLong, target, quarantined,
        SessionMetrics(loadedRows, valid.size.toLong, loadedBytes, secs))
    } catch {
      case e: Throwable =>
        store.save(store.getOrCreate(id.scoped, config.strategy.name)
          .markLoadFailed(Option(e.getMessage).getOrElse(e.getClass.getName),
            store.nowString()))
        throw e
    }
  }

  private val ManifestName = "_graft_group.txt"

  /** Stable identity of a sub-batch: md5 over its sorted source paths. */
  private def groupHash(group: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(group.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def writeGroupManifest(fs: org.apache.hadoop.fs.FileSystem,
                                 p: org.apache.hadoop.fs.Path,
                                 group: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(group.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readGroupManifest(fs: org.apache.hadoop.fs.FileSystem,
                                p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    txt.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Install a committed sub-batch: rename its part files into the target
    * root under the batch's deterministic prefix. Idempotent — a replay
    * moves only the files still inside the commit dir. */
  private def installCommitted(fs: org.apache.hadoop.fs.FileSystem,
                               target: String,
                               committed: org.apache.hadoop.fs.Path,
                               h: String): Unit = {
    fs.listStatus(committed)
      .filter(_.getPath.getName.endsWith(".parquet")).foreach { p =>
        val dest = new org.apache.hadoop.fs.Path(target,
          s"b${h}_${p.getPath.getName}")
        if (fs.exists(dest)) fs.delete(p.getPath, false)
        else if (!fs.rename(p.getPath, dest))
          throw new java.io.IOException(s"install failed: ${p.getPath} -> $dest")
      }
  }

  /** Entry-time crash recovery for the manifest-commit protocol: every
    * leftover `.__commit_<h>` dir is a sub-batch whose data write completed
    * but whose blacklist save did not — finish its install, account its rows
    * from the installed footers, commit its blacklist, and drop the dir.
    * Incomplete `.__inflight_*` writes are discarded (the replay rebuilds
    * them). */
  private def recoverCommittedBatches(fs: org.apache.hadoop.fs.FileSystem,
                                      target: String, id: TableId,
                                      config: CdcConfig,
                                      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val tgt = new org.apache.hadoop.fs.Path(target)
    if (!fs.exists(tgt)) return
    fs.listStatus(tgt).filter(_.getPath.getName.startsWith(".__commit_"))
      .foreach { st =>
        val h = st.getPath.getName.stripPrefix(".__commit_")
        val group = readGroupManifest(fs,
          new org.apache.hadoop.fs.Path(st.getPath, ManifestName))
        installCommitted(fs, target, st.getPath, h)
        // the blacklist save is all-or-nothing per group; if it already
        // committed (crash hit between the save and the commit-dir delete),
        // saving again would double-add the group's rows to the cumulative
        // counter and permanently skew the count-parity gate
        val wmNow = store.getOrCreate(id.scoped, config.strategy.name)
        if (group.exists(g => !wmNow.processedFileSet(g))) {
          val installed = fs.listStatus(tgt)
            .filter(_.getPath.getName.startsWith(s"b${h}_"))
            .map(_.getPath.toString).toSeq
          val rows = ParquetFooters.totalRows(installed, conf)
          store.save(wmNow.afterLoadSession(group, rows, store.nowString()))
        }
        fs.delete(st.getPath, true)
      }
    fs.listStatus(tgt).filter(_.getPath.getName.startsWith(".__inflight_"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Merge-mode load: staged-but-unprocessed files upserted into the
    * warehouse by key via [[mergeInto]] (the reference's settle_orders
    * DELETE+INSERT pipeline as a load mode). File-level blacklist semantics
    * match [[load]]; the merge itself is key-idempotent, so a crash between
    * the swap and the blacklist save re-merges the same rows harmlessly. */
  def mergeLoad(spark: SparkSession, id: TableId, stagedDir: String,
                config: CdcConfig, keys: Seq[String],
                buckets: Option[Int] = None): LoadResult =
    store.withTableLock(id.scoped) {
      mergeLoadLocked(spark, id, stagedDir, config, keys,
        buckets.orElse(mergeBuckets))
    }

  private def mergeLoadLocked(spark: SparkSession, id: TableId, stagedDir: String,
                              config: CdcConfig, keys: Seq[String],
                              bucketsEff: Option[Int]): LoadResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val wm = store.getOrCreate(id.scoped, config.strategy.name)
    try {
      val all = listParquetFiles(spark, stagedDir)
        .filter(wm.isSessionLoadable)
      val freshRaw = all.filterNot(wm.processedFileSet)
      val target = targetPath(id)
      if (freshRaw.isEmpty)
        return LoadResult(id, 0, 0, all.size.toLong, target)
      // the same per-file footer-validation gate as the append path: one
      // corrupt staged file must quarantine, not permanently fail every
      // merge session of the table (the read below throws on any bad
      // footer, markLoadFailed is saved, and Retry burns its attempts on
      // the identical failure forever). NonFatal only — interrupts/OOM
      // abort the session rather than quarantining valid files.
      val mergeRows = scala.collection.mutable.LinkedHashMap[String, Long]()
      val (fresh, quarantined) = freshRaw.partition { f =>
        try { mergeRows(f) = ParquetFooters.rowCount(f, conf); true }
        catch { case scala.util.control.NonFatal(_) => false }
      }
      if (fresh.isEmpty) {
        val wmQ = store.getOrCreate(id.scoped, config.strategy.name)
        store.save(wmQ.copy(redshift_state = wmQ.redshift_state.copy(
          error = Some(s"quarantined ${quarantined.size} corrupt files: " +
            quarantined.take(3).mkString(",")))))
        return LoadResult(id, 0, 0, all.size.toLong, target, quarantined)
      }
      val t0 = System.nanoTime()
      // converge any crashed swap BEFORE reading the target schema: after a
      // death between the two swap renames the only copy is `.__old`, and a
      // schema read against the missing live dir would return None —
      // silently disarming the drift gate for exactly this session
      locally {
        val tgt0 = new org.apache.hadoop.fs.Path(target)
        val fs0 = tgt0.getFileSystem(conf)
        recoverSwap(fs0, tgt0,
          new org.apache.hadoop.fs.Path(target + ".__old"))
        recoverBucketBackups(fs0, tgt0)
      }
      // the same schema-evolution gate as the append path: destructive drift
      // refuses the session (and lands markLoadFailed below); additive drift
      // flows through — the merge union carries new columns by name.
      // mergeSchema on the staged read: sessions straddling an additive
      // change must surface the union schema, not one sampled footer's
      val targetSchema = readTarget(spark, id).map(_.schema)
      val staged = SchemaEvolution(
        spark.read.option("mergeSchema", "true").parquet(fresh: _*),
        targetSchema, evolutionPolicy)
      // countRows=false: the LoadResult's row accounting comes from the
      // staged footers below; re-counting the whole merged TABLE here would
      // cost a footer open per warehouse file on every CDC increment
      bucketsEff match {
        case Some(n) => mergeIntoBucketed(spark, id, staged, keys, n,
          countRows = false)
        case None    => mergeInto(spark, id, staged, keys, countRows = false)
      }
      // Tombstone gate — merge-mode counterpart of [[load]]'s: a keyed CDC
      // re-sync that re-delivers forgotten rows has just UPSERTED them, so
      // re-suppress here or the `forget` guarantee ("deletion survives the
      // source disagreeing") silently fails on exactly the merge-keyed
      // tables the CLI verb targets. Same cost shape: one increment-sized
      // semi-join; the rewrite runs only on a hit and prunes to the
      // marker's buckets on bucketed layouts. Runs BEFORE the blacklist
      // save: a crash anywhere in between replays the (key-idempotent)
      // merge AND the gate, so no window exists where resurrected rows
      // are committed as processed.
      locally {
        val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(conf)
        val tombP = new org.apache.hadoop.fs.Path(tombstonePath(id))
        if (fs.exists(tombP)) {
          val tomb = castKeysLike(spark.read.parquet(tombstonePath(id)),
            staged.schema)
          if (tomb.columns.forall(staged.columns.contains) &&
              !staged.join(tomb, tomb.columns.toSeq, "left_semi").isEmpty)
            deleteKeysLocked(spark, id, tomb, persistTombstones = false)
        }
      }
      // row counts reuse the validation gate's footer reads — each staged
      // footer is opened exactly once per session, like the append path
      val rows = fresh.map(mergeRows).sum
      val bytes = ParquetFooters.totalBytes(fresh, conf)
      store.save(store.getOrCreate(id.scoped, config.strategy.name)
        .afterLoadSession(fresh, rows, store.nowString()))
      val secs = (System.nanoTime() - t0) / 1e9
      // quarantine note AFTER the session save so it isn't overwritten —
      // status stays success (the valid set merged), same as the append path
      if (quarantined.nonEmpty) {
        val wmQ = store.getOrCreate(id.scoped, config.strategy.name)
        store.save(wmQ.copy(redshift_state = wmQ.redshift_state.copy(
          error = Some(s"quarantined ${quarantined.size} corrupt files: " +
            quarantined.take(3).mkString(",")))))
      }
      LoadResult(id, fresh.size.toLong, rows, (all.size - fresh.size).toLong,
        target, quarantined, SessionMetrics(rows, fresh.size.toLong, bytes, secs))
    } catch {
      case e: Throwable =>
        store.save(store.getOrCreate(id.scoped, config.strategy.name)
          .markLoadFailed(Option(e.getMessage).getOrElse(e.getClass.getName),
            store.nowString()))
        throw e
    }
  }

  /** Merge (upsert) staged rows into the warehouse table by key, committed
    * with a DIRECTORY SWAP so readers never observe a half-written table
    * (SURVEY §7 hard-part #5 — merge atomicity without a transactional
    * format): the merged result is fully written to `<target>.__new`, the old
    * directory is renamed aside, the new one renamed in, then the old data is
    * deleted. The vulnerable window is two metadata renames, not the
    * data-sized write. A crash mid-swap leaves `.__old`/`.__new` for manual
    * recovery rather than a corrupt table.
    *
    * Scale note: the anti-join broadcasts the staged keys when small (the
    * usual CDC increment), so the 100 TB target is read+rewritten once and
    * never shuffled on the join key.
    *
    * Returns the merged table's row count (from the rewrite's own footers),
    * or -1 when `countRows=false` (pipeline loads account rows from the
    * staged footers instead — skipping a whole-table footer pass). */
  def mergeInto(spark: SparkSession, id: TableId, staged: DataFrame,
                keys: Seq[String], countRows: Boolean = true): Long = {
    val target = targetPath(id)
    val tgt = new org.apache.hadoop.fs.Path(target)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newPath = new org.apache.hadoop.fs.Path(target + ".__new")
    val oldPath = new org.apache.hadoop.fs.Path(target + ".__old")
    // crash recovery BEFORE reading the target: a previous run that died
    // between the two swap renames left the only copy in `.__old` — restore
    // it, or this merge would read zero existing rows and then destroy the
    // backup (silent data loss)
    recoverSwap(fs, tgt, oldPath)
    fs.delete(newPath, true)
    val merged = readTarget(spark, id) match {
      case Some(existing) => graft.operators.Relational.merge(existing, staged, keys)
      case None => staged
    }
    merged.write.mode(SaveMode.Overwrite)
      .option("compression", compression).parquet(newPath.toString)
    val rows = if (countRows) ParquetFooters.totalRows(
      listParquetFiles(spark, newPath.toString),
      spark.sparkContext.hadoopConfiguration) else -1L
    installSwap(fs, tgt, newPath, oldPath)
    rows
  }

  /** Double-rename install — shared protocol, see [[graft.util.AtomicDir]]. */
  private def installSwap(fs: org.apache.hadoop.fs.FileSystem,
                          tgt: org.apache.hadoop.fs.Path,
                          newPath: org.apache.hadoop.fs.Path,
                          oldPath: org.apache.hadoop.fs.Path): Unit =
    graft.util.AtomicDir.installSwap(fs, tgt, newPath, oldPath)

  /** Re-suppression gate: a CDC re-sync can legally re-deliver rows that
    * were taken down ([[deleteKeys]]) — when the staged increment contains
    * tombstoned keys, re-run the (idempotent) deletion. Costs one
    * increment-sized semi-join; the rewrite runs only on a hit (and prunes
    * to affected buckets on bucketed layouts). */
  /** Pure-replay form of [[tombstoneGate]] cached behind a marker file:
    * an idle re-sync of a table with a retained staged backlog must not
    * re-read every staged file on every cycle when neither the committed
    * session high-water nor the tombstone GENERATION (bumped by each
    * [[deleteKeys]]) moved since the last gate run. The marker writes
    * AFTER the gate, so a crash in between simply re-gates (idempotent).
    * Tombstone dirs persisted before the generation token exist gate once
    * per session high-water (empty-gen token) — strictly no worse than
    * the ungated form. */
  private def tombstoneGateCached(spark: SparkSession, id: TableId,
                                  incrementFiles: Seq[String],
                                  fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val tombP = new org.apache.hadoop.fs.Path(tombstonePath(id))
    // converge a crashed deleteKeys swap first (we hold the table lock):
    // with only `.__tombstones.__old` on disk the exists check below would
    // silently disarm the gate until some future deleteKeys recovered it
    graft.util.AtomicDir.recoverSwap(fs, tombP,
      new org.apache.hadoop.fs.Path(tombstonePath(id) + ".__old"))
    if (!fs.exists(tombP)) return
    // the token must capture LOADER progress too, not just the extract
    // high-water: manually staged files (no session= tag) load without
    // moving last_session, and a crash between their install and the gate
    // would otherwise replay into a cache hit — the processed-file count
    // advances with every committed sub-batch, so any loaded file
    // invalidates the cache
    val wmTok = store.get(id.scoped)
    val token = wmTok.flatMap(_.metadata.last_session).getOrElse("") + "|" +
      wmTok.map(_.processedFileSet.size).getOrElse(0) + "|" +
      graft.util.AtomicDir.readState(spark, tombstonePath(id)).getOrElse("")
    val markerP = new org.apache.hadoop.fs.Path(tombstonePath(id) + ".__gated")
    val prev =
      if (!fs.exists(markerP)) None
      else {
        val in = fs.open(markerP)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      }
    if (prev.contains(token)) return
    tombstoneGate(spark, id, incrementFiles, fs)
    val out = fs.create(markerP, true)
    try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def tombstoneGate(spark: SparkSession, id: TableId,
                            incrementFiles: Seq[String],
                            fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val tombP = new org.apache.hadoop.fs.Path(tombstonePath(id))
    // lock-holding context: converge a crashed deleteKeys swap before the
    // exists check (see tombstoneGateCached)
    graft.util.AtomicDir.recoverSwap(fs, tombP,
      new org.apache.hadoop.fs.Path(tombstonePath(id) + ".__old"))
    if (fs.exists(tombP)) {
      val tombRaw = spark.read.parquet(tombstonePath(id))
      val incRaw = spark.read.parquet(incrementFiles: _*)
      // the increment must be compared in the TARGET's column namespace
      val inc = if (normalizeColumns) {
        val (_, mapping) = TypeMapper.normalizeColumnNames(incRaw.columns.toSeq)
        ColumnMapStore.apply(incRaw, mapping)
      } else incRaw
      // ... and in the increment's TYPES: tombstones persisted before the
      // table first loaded carry CLI strings, which an implicit-cast
      // semi-join can fail to match against native numeric/temporal keys
      val tomb = castKeysLike(tombRaw, inc.schema)
      if (tomb.columns.forall(inc.columns.contains) &&
          !inc.join(tomb, tomb.columns.toSeq, "left_semi").isEmpty) {
        deleteKeysLocked(spark, id, tomb, persistTombstones = false)
        ()
      }
    }
  }

  /** Atomically REPLACE a derived warehouse table with `df` — the sink for
    * post-load operators (YAML `post_ops`). Same write-new + double-rename
    * discipline as [[mergeInto]]: for scd2/fold state the derived copy is
    * the ONLY copy (history is not rebuildable from the base table), so a
    * plain overwrite's crash window would be silent data loss. `stateJson`,
    * when given, commits atomically WITH the data (see
    * [[graft.util.AtomicDir.replace]]). */
  def replaceDerived(spark: SparkSession, id: TableId, df: DataFrame,
                     stateJson: Option[String] = None): Long =
    replaceDerivedAt(spark, targetPath(id), df, stateJson)

  /** Path-addressed form of [[replaceDerived]] for HIDDEN side-tables that
    * live next to a derived target (band indexes, tombstones) — same swap
    * discipline AND the loader's configured sink compression, so one-off
    * maintenance rewrites (CLI `forget`) don't silently drift a
    * zstd-configured table back to snappy. */
  def replaceDerivedAt(spark: SparkSession, path: String, df: DataFrame,
                       stateJson: Option[String] = None): Long =
    graft.util.AtomicDir.replace(spark, path, df, compression, stateJson)

  /** The committed post-op state of a derived table (see [[replaceDerived]]).
    * READ-ONLY — pair with [[recoverDerived]] at locked entry points that
    * will also read the derived DATA, or a mid-swap crash leaves the cursor
    * readable (from the backup) while the live dir is absent. */
  def readDerivedState(spark: SparkSession, id: TableId): Option[String] =
    graft.util.AtomicDir.readState(spark, targetPath(id))

  /** Converge a crashed [[replaceDerived]] swap — the mutating recovery a
    * LOCK-HOLDING reader runs before touching the derived table; unlocked
    * status readers must not (an unlocked rename can race a writer
    * mid-install — see [[graft.util.AtomicDir.readState]]). */
  def recoverDerived(spark: SparkSession, id: TableId): Unit = {
    val tgt = new org.apache.hadoop.fs.Path(targetPath(id))
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.util.AtomicDir.recoverSwap(fs, tgt,
      new org.apache.hadoop.fs.Path(targetPath(id) + ".__old"))
  }

  /** Per-bucket form of [[recoverSwap]]: restore or clear any `.__old_<b>`
    * backups a crashed bucket swap left inside the target. */
  private def recoverBucketBackups(fs: org.apache.hadoop.fs.FileSystem,
                                   tgt: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(tgt)) return
    fs.listStatus(tgt).filter(_.getPath.getName.startsWith(".__old_"))
      .foreach { st =>
        val b = st.getPath.getName.stripPrefix(".__old_")
        recoverSwap(fs, new org.apache.hadoop.fs.Path(tgt, s"$BucketCol=$b"),
          st.getPath)
      }
  }

  /** Converge a directory-swap commit interrupted by a crash: if the live
    * path is gone but its `.__old` backup survives, the crash hit between the
    * two renames — restore the backup. If both exist, the install completed
    * and the backup is stale — discard it. Never touches anything when no
    * backup exists. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                          live: org.apache.hadoop.fs.Path,
                          backup: org.apache.hadoop.fs.Path): Unit =
    graft.util.AtomicDir.recoverSwap(fs, live, backup)

  /** Bucket-partition column for [[mergeIntoBucketed]] targets. Internal —
    * stripped by [[readTarget]]. */
  private val BucketCol = "__gbucket"

  /** Layout contract of a bucketed target, persisted as a dot-file INSIDE the
    * target dir (invisible to Spark's listing, travels with directory swaps):
    * the bucket count and the key columns, in hash order. Written whenever
    * [[mergeIntoBucketed]] (re)defines the layout; consumed by the deletion /
    * tombstone path so bucket pruning NEVER trusts a caller-supplied bucket
    * count or key order — `pmod(hash(keys), n)` only prunes correctly when
    * both `n` and the key sequence match what laid the data out. */
  private val LayoutMarker = ".__glayout"

  private def writeLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
                                tgt: org.apache.hadoop.fs.Path,
                                buckets: Int, keys: Seq[String]): Unit = {
    // temp + rename: a TORN marker would parse to a valid-but-wrong key
    // subset and silently mis-prune later deletions — worse than no marker
    // (which degrades to the full-rewrite path)
    val tmp = new org.apache.hadoop.fs.Path(tgt, s"$LayoutMarker.tmp")
    val dst = new org.apache.hadoop.fs.Path(tgt, LayoutMarker)
    val out = fs.create(tmp, true)
    try out.write(s"buckets=$buckets\nkeys=${keys.mkString(",")}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"layout marker rename failed: $tmp -> $dst")
  }

  private def readLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
                               tgt: org.apache.hadoop.fs.Path): Option[(Int, Seq[String])] = {
    val p = new org.apache.hadoop.fs.Path(tgt, LayoutMarker)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val kv = txt.split("\n").map(_.trim).filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    for {
      n <- kv.get("buckets").flatMap(_.toIntOption)
      ks <- kv.get("keys").map(_.split(",").toSeq.filter(_.nonEmpty))
      if ks.nonEmpty
    } yield (n, ks)
  }

  /** Cast `keys`' columns to the types `schema` declares for them (columns
    * `schema` doesn't carry pass through). The deletion/tombstone path meets
    * key frames of foreign provenance — CLI string values persisted before
    * the table first loaded, tombstones written under an older schema — and
    * an implicit-cast comparison against natively-typed data can silently
    * fail to match (string "42" vs BIGINT 42 compares as DOUBLE; fine — but
    * string keys against DECIMAL or TIMESTAMP columns need not be). */
  private def castKeysLike(keys: DataFrame,
                           schema: org.apache.spark.sql.types.StructType): DataFrame =
    // resolve names CASE-INSENSITIVELY, like Spark's analyzer: a tombstone
    // persisted with key column "ID" must cast (and later gate) against a
    // table column "id" — a case-sensitive miss here silently skipped both
    // the cast and, downstream, the whole re-suppression gate. The output
    // column RENAMES to the schema's spelling so the gate's subset check
    // and join resolve identically.
    keys.select(keys.columns.toIndexedSeq.map { c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)) match {
        case Some(f) if f.dataType != keys.schema(c).dataType =>
          col(c).cast(f.dataType).as(f.name)
        case Some(f) => col(c).as(f.name)
        case None => col(c)
      }
    }: _*)

  /** Merge (upsert) into a BUCKET-PARTITIONED warehouse table, rewriting only
    * the buckets that contain staged keys — the scale-correct form of
    * [[mergeInto]] (which rewrites the whole target every increment). The
    * target is laid out `<target>/__gbucket=<pmod(hash(keys), n)>/...`; a CDC
    * increment touching k distinct buckets reads+rewrites k/n of the table,
    * mirroring the row-targeted cost of the reference's DELETE+INSERT inside
    * Redshift (settle_orders_download_and_sync.py:326-388).
    *
    * Atomicity: each affected bucket commits with its own directory swap
    * (rename to a dot-prefixed dir — invisible to Spark's listing — then
    * rename in). Across buckets the merge is not one transaction, but it IS
    * key-idempotent: re-running after a mid-merge crash converges — entry-time
    * recovery first restores any bucket whose swap was interrupted (its only
    * copy lives in the `.__old_<b>` backup), then re-merging the same staged
    * rows produces the same rows.
    */
  def mergeIntoBucketed(spark: SparkSession, id: TableId, staged: DataFrame,
                        keys: Seq[String], buckets: Int = 64,
                        countRows: Boolean = true): Long = {
    require(buckets > 0, "buckets must be positive")
    def countIf(): Long = if (countRows) targetRowCount(spark, id) else -1L
    val target = targetPath(id)
    val conf = spark.sparkContext.hadoopConfiguration
    val tgt = new org.apache.hadoop.fs.Path(target)
    val fs = tgt.getFileSystem(conf)
    def bucketed(n: Int, ks: Seq[String]): DataFrame =
      staged.withColumn(BucketCol, pmod(hash(ks.map(col): _*), lit(n)))
    // every partitionBy(BucketCol) write below first CO-LOCATES buckets:
    // an unaligned write emits one file per (input partition × bucket
    // present in it) — a 64-partition staged increment against 64 buckets
    // sprays up to 4096 KB-files per session, and each writer task holds
    // an open parquet writer PER BUCKET it sees (executor memory at real
    // scale). Aligned, the slice writes ~splits files per bucket and the
    // shuffle it costs is exactly the hash the layout is defined by.
    // When the session has more cores than the table has buckets, each
    // bucket SALTS into ceil(cores/buckets) sub-splits (a second key hash,
    // decorrelated from the bucket hash by an extra literal) — a pure
    // bucket-column repartition would cap every full-table rewrite at
    // `buckets` write tasks and funnel a hot bucket into ONE task.
    def alignBuckets(d: DataFrame, n: Int, ks: Seq[String]): DataFrame = {
      val splits =
        math.max(1, spark.sparkContext.defaultParallelism / math.max(1, n))
      if (splits <= 1) d.repartition(col(BucketCol))
      else d.repartition(n * splits, col(BucketCol),
        pmod(hash((ks.map(col) :+ lit(1)): _*), lit(splits)))
    }

    // crash recovery first: a migration/bootstrap crash between the root
    // renames leaves the whole table only in `<target>.__old` — restore it
    // BEFORE the existence check below, or this run would "bootstrap" a
    // staged-rows-only table over the backup
    recoverSwap(fs, tgt, new org.apache.hadoop.fs.Path(target + ".__old"))
    // ... and a per-bucket crash between rename(cur→old_b) and
    // rename(new→cur) leaves that bucket only in `.__old_<b>`
    recoverBucketBackups(fs, tgt)

    if (!fs.exists(tgt)) {
      // bootstrap: lay the table out bucketed from the first load, and
      // persist the layout contract alongside it
      alignBuckets(bucketed(buckets, keys), buckets, keys)
        .write.mode(SaveMode.Overwrite)
        .option("compression", compression)
        .partitionBy(BucketCol).parquet(target)
      writeLayoutMarker(fs, tgt, buckets, keys)
      return countIf()
    }

    // migration path: an existing NON-bucketed target — or a bucketed one
    // whose persisted layout keys no longer match the merge keys (pruning
    // by the new keys would hash into the wrong dirs) — is converted with
    // one full bucketed rewrite (the old mergeInto cost, paid once), after
    // which every increment is bucket-targeted
    val isBucketed = fs.listStatus(tgt)
      .exists(_.getPath.getName.startsWith(s"$BucketCol="))
    val markerOpt = if (isBucketed) readLayoutMarker(fs, tgt) else None
    if (!isBucketed || markerOpt.exists(_._2.toSet != keys.toSet)) {
      val withBucket = bucketed(buckets, keys)
      // mergeSchema everywhere the target is read for a REWRITE: after an
      // additive evolution the files are heterogeneous, and single-footer
      // inference would permanently null the new column for every survivor
      val existingAll = spark.read.option("mergeSchema", "true")
        .parquet(target)
      val survivorsAll = existingAll.join(
        staged.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(buckets)))
      val mergedAll = survivorsAll.unionByName(withBucket,
        allowMissingColumns = true)
      val newRoot0 = new org.apache.hadoop.fs.Path(target + ".__new")
      val oldRoot0 = new org.apache.hadoop.fs.Path(target + ".__old")
      fs.delete(newRoot0, true); fs.delete(oldRoot0, true)
      alignBuckets(mergedAll, buckets, keys).write.mode(SaveMode.Overwrite)
        .option("compression", compression)
        .partitionBy(BucketCol).parquet(newRoot0.toString)
      if (!fs.rename(tgt, oldRoot0))
        throw new java.io.IOException(s"swap failed: $tgt -> $oldRoot0")
      if (!fs.rename(newRoot0, tgt)) {
        fs.rename(oldRoot0, tgt)
        throw new java.io.IOException(s"swap failed: $newRoot0 -> $tgt")
      }
      if (!fs.exists(tgt))
        throw new java.io.IOException(s"swap verification failed: $tgt absent")
      fs.delete(oldRoot0, true)
      writeLayoutMarker(fs, tgt, buckets, keys)
      return countIf()
    }

    // the persisted layout (count + key ORDER) governs the hash, not the
    // caller's config — a YAML bucket-count change must not silently corrupt
    // pruning. Legacy pre-marker targets adopt the caller's params (the
    // status-quo trust) and persist them so the adoption happens once.
    val (nEff, layoutKeys) = markerOpt.getOrElse {
      writeLayoutMarker(fs, tgt, buckets, keys); (buckets, keys)
    }
    val withBucket = bucketed(nEff, layoutKeys)
    val affected = withBucket.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) return countIf()

    // partition pruning keeps the read to the affected bucket dirs only;
    // mergeSchema for the same rewrite-survivor reason as above
    val existing = spark.read.option("mergeSchema", "true").parquet(target)
      .filter(col(BucketCol).isin(affected.map(Integer.valueOf).toIndexedSeq: _*))
    val survivors = existing.join(
      staged.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val mergedSlice = survivors.unionByName(withBucket,
      allowMissingColumns = true)

    val newRoot = new org.apache.hadoop.fs.Path(target + ".__new")
    fs.delete(newRoot, true)
    alignBuckets(mergedSlice, nEff, layoutKeys).write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .partitionBy(BucketCol).parquet(newRoot.toString)

    affected.foreach { b =>
      val newB = new org.apache.hadoop.fs.Path(newRoot, s"$BucketCol=$b")
      val curB = new org.apache.hadoop.fs.Path(tgt, s"$BucketCol=$b")
      val oldB = new org.apache.hadoop.fs.Path(tgt, s".__old_$b")
      // entry-time recovery cleared any pre-existing backup; never delete
      // oldB here before the new bucket is verified installed
      if (fs.exists(curB) && !fs.rename(curB, oldB))
        throw new java.io.IOException(s"bucket swap failed: $curB -> $oldB")
      // a bucket can be newly-born (no staged key hashed there before):
      // newB may not exist if the merge produced zero rows for it
      if (fs.exists(newB) && !fs.rename(newB, curB)) {
        fs.rename(oldB, curB) // roll back this bucket
        throw new java.io.IOException(s"bucket swap failed: $newB -> $curB")
      }
      fs.delete(oldB, true)
    }
    fs.delete(newRoot, true)
    countIf()
  }

  /** Compact a warehouse table's accumulated small files (the long-run cost
    * of per-session sub-batch appends — the reference left this as its "row
    * accumulation buffer" roadmap item) into files of ~`targetFileBytes`,
    * committed with the same crash-recovering directory swap as
    * [[mergeInto]]. The row count is verified from footers BEFORE the swap —
    * a compaction that would lose rows aborts with the target untouched.
    * Returns (filesBefore, filesAfter). No-op when already at or below the
    * target file count. */
  def compact(spark: SparkSession, id: TableId,
              targetFileBytes: Long = 256L * 1024 * 1024): (Int, Int) =
    store.withTableLock(id.scoped) {
      compactLocked(spark, id, targetFileBytes)
    }

  private def compactLocked(spark: SparkSession, id: TableId,
                            targetFileBytes: Long): (Int, Int) = {
    val target = targetPath(id)
    val tgt = new org.apache.hadoop.fs.Path(target)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPath = new org.apache.hadoop.fs.Path(target + ".__old")
    recoverSwap(fs, tgt, oldPath)
    recoverBucketBackups(fs, tgt)
    if (!fs.exists(tgt)) return (0, 0)
    // stale compaction scratch from a crashed run is never the only copy
    fs.listStatus(tgt).filter(_.getPath.getName.startsWith(".__cnew_"))
      .foreach(st => fs.delete(st.getPath, true))
    val conf = spark.sparkContext.hadoopConfiguration
    // bucket-partitioned targets compact PER BUCKET (layout preserved, each
    // bucket swap independently crash-recoverable)
    val bucketDirs = fs.listStatus(tgt)
      .filter(_.getPath.getName.startsWith(s"$BucketCol="))
    if (bucketDirs.nonEmpty) {
      var before = 0
      var after = 0
      bucketDirs.foreach { st =>
        val bdir = st.getPath
        val bFiles = listParquetFilesWithSize(spark, bdir.toString)
        val want = math.max(1L,
          (bFiles.map(_._2).sum + targetFileBytes - 1) / targetFileBytes).toInt
        before += bFiles.size
        if (bFiles.size <= want) { after += bFiles.size }
        else {
          val b = bdir.getName.stripPrefix(s"$BucketCol=")
          val rows0 = ParquetFooters.totalRows(bFiles.map(_._1), conf)
          val newB = new org.apache.hadoop.fs.Path(tgt, s".__cnew_$b")
          fs.delete(newB, true)
          spark.read.option("mergeSchema", "true").parquet(bdir.toString)
            .repartition(want)
            .write.mode(SaveMode.Overwrite)
            .option("compression", compression).parquet(newB.toString)
          val newFiles = listParquetFilesWithSize(spark, newB.toString)
          if (ParquetFooters.totalRows(newFiles.map(_._1), conf) != rows0) {
            fs.delete(newB, true)
            throw new java.io.IOException(
              s"compaction aborted: bucket $b row count changed")
          }
          val oldB = new org.apache.hadoop.fs.Path(tgt, s".__old_$b")
          if (!fs.rename(bdir, oldB))
            throw new java.io.IOException(s"bucket swap failed: $bdir -> $oldB")
          if (!fs.rename(newB, bdir)) {
            fs.rename(oldB, bdir)
            throw new java.io.IOException(s"bucket swap failed: $newB -> $bdir")
          }
          fs.delete(oldB, true)
          after += newFiles.size
        }
      }
      return (before, after)
    }
    val files = listParquetFilesWithSize(spark, target)
    if (files.isEmpty) return (0, 0)
    val totalBytes = files.map(_._2).sum
    val wantFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (files.size <= wantFiles) return (files.size, files.size)
    val rowsBefore = ParquetFooters.totalRows(files.map(_._1), conf)
    val newPath = new org.apache.hadoop.fs.Path(target + ".__new")
    fs.delete(newPath, true)
    spark.read.option("mergeSchema", "true").parquet(target)
      .repartition(wantFiles)
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression).parquet(newPath.toString)
    val newFiles = listParquetFilesWithSize(spark, newPath.toString)
    val rowsAfter = ParquetFooters.totalRows(newFiles.map(_._1), conf)
    if (rowsAfter != rowsBefore) {
      fs.delete(newPath, true)
      throw new java.io.IOException(
        s"compaction aborted: rewrite has $rowsAfter rows, target has $rowsBefore")
    }
    if (!fs.rename(tgt, oldPath))
      throw new java.io.IOException(s"swap failed: $tgt -> $oldPath")
    if (!fs.rename(newPath, tgt)) {
      fs.rename(oldPath, tgt)
      throw new java.io.IOException(s"swap failed: $newPath -> $tgt")
    }
    if (!fs.exists(tgt))
      throw new java.io.IOException(s"swap verification failed: $tgt absent")
    fs.delete(oldPath, true)
    (files.size, newFiles.size)
  }

  /** Tombstone side-table of a target (hidden sibling dir — dot-prefixed, so
    * table listings and swaps never see it). Schema = the key columns. */
  def tombstonePath(id: TableId): String = targetPath(id) + ".__tombstones"

  /** Targeted key deletion — the takedown / right-to-be-forgotten operator
    * (GDPR Art. 17; a training-data pipeline's legal-removal path). Rewrites
    * the table WITHOUT rows whose key tuple appears in `keys` (column names
    * of `keys` = the key columns), committed with the same crash-recovering
    * swaps as merge/compact. Bucketed-merge targets rewrite ONLY the buckets
    * the keys hash to when the persisted layout marker confirms the deletion
    * keys ARE the layout keys; otherwise (no marker, or foreign key columns)
    * every bucket is rewritten — unpruned but correct (the persisted marker
    * ALONE governs pruning — no caller-supplied bucket count is trusted,
    * or even accepted). Flat targets pay one full rewrite. The
    * watermark's cumulative row counter is decremented so the count-parity
    * gate tracks the post-deletion truth. Keys are cast to the target's
    * column types before comparison and persistence.
    *
    * With `persistTombstones` (default) the keys also merge into a persisted
    * tombstone side-table: a later CDC re-sync that re-delivers a deleted
    * row is RE-SUPPRESSED by [[load]]'s tombstone gate — deletion survives
    * the source disagreeing. (An explicit [[mergeInto]] of a tombstoned key
    * is an application-level write and wins; syncs re-suppress.)
    * Returns the number of rows deleted from the current table. */
  def deleteKeys(spark: SparkSession, id: TableId, keys: DataFrame,
                 persistTombstones: Boolean = true): Long =
    store.withTableLock(id.scoped) {
      deleteKeysLocked(spark, id, keys, persistTombstones)
    }

  private def deleteKeysLocked(spark: SparkSession, id: TableId,
                               keys0: DataFrame,
                               persistTombstones: Boolean): Long = {
    val keyCols = keys0.columns.toSeq
    require(keyCols.nonEmpty, "deleteKeys: keys frame has no columns")
    val target = targetPath(id)
    val conf = spark.sparkContext.hadoopConfiguration
    val tgt = new org.apache.hadoop.fs.Path(target)
    val fs = tgt.getFileSystem(conf)
    recoverSwap(fs, tgt, new org.apache.hadoop.fs.Path(target + ".__old"))
    recoverBucketBackups(fs, tgt)
    // compare (and persist) keys in the TARGET's types: string-typed keys —
    // CLI values tombstoned before the table first loaded — must not meet
    // typed columns through implicit casts that can fail to match
    val keys = readTarget(spark, id) match {
      case Some(t) => castKeysLike(keys0, t.schema)
      case None => keys0
    }
    if (persistTombstones) {
      val tp = tombstonePath(id)
      val prev =
        if (fs.exists(new org.apache.hadoop.fs.Path(tp)))
          Some(castKeysLike(spark.read.parquet(tp), keys.schema))
        else None
      val merged = prev.fold(keys.distinct())(p =>
        p.unionByName(keys).distinct())
      // the committed state carries a GENERATION token: the idle-sync
      // tombstone gate caches on (last_session, generation) and skips the
      // full staged-backlog scan when neither moved — every deleteKeys
      // bumps the generation so the next sync of every table re-gates once
      graft.util.AtomicDir.replace(spark, tp, merged, compression,
        stateJson = Some(s"""{"tombstone_gen":"${System.nanoTime()}"}"""))
    }
    if (!fs.exists(tgt)) return 0L

    val before = targetRowCount(spark, id)
    val isBucketed = fs.listStatus(tgt)
      .exists(_.getPath.getName.startsWith(s"$BucketCol="))
    if (isBucketed) {
      // bucket pruning is only sound when the hash replays the layout that
      // wrote the dirs: the persisted marker's (count, key order), with the
      // deletion keys covering exactly the layout keys. Anything else —
      // no marker, foreign key columns — degrades to a FULL rewrite of
      // every bucket present (correct, just unpruned) instead of silently
      // deleting from wrongly-hashed buckets.
      val allBuckets = fs.listStatus(tgt)
        .filter(_.getPath.getName.startsWith(s"$BucketCol="))
        .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt).sorted.toSeq
      val affected: Seq[Int] = readLayoutMarker(fs, tgt) match {
        case Some((n, layoutKeys)) if layoutKeys.toSet == keyCols.toSet =>
          val hit = keys
            .select(pmod(hash(layoutKeys.map(col): _*), lit(n)).as(BucketCol))
            .distinct().collect().map(_.getInt(0)).toSet
          allBuckets.filter(hit)
        case _ => allBuckets
      }
      // mergeSchema: the rewrite's survivors must carry every evolved
      // column, not one sampled footer's subset
      val existing = spark.read.option("mergeSchema", "true").parquet(target)
        .filter(col(BucketCol).isin(affected.map(Integer.valueOf).toIndexedSeq: _*))
      val survivors = existing.join(keys.distinct(), keyCols, "left_anti")
      val newRoot = new org.apache.hadoop.fs.Path(target + ".__new")
      fs.delete(newRoot, true)
      survivors.write.mode(SaveMode.Overwrite)
        .option("compression", compression)
        .partitionBy(BucketCol).parquet(newRoot.toString)
      affected.foreach { b =>
        val newB = new org.apache.hadoop.fs.Path(newRoot, s"$BucketCol=$b")
        val curB = new org.apache.hadoop.fs.Path(tgt, s"$BucketCol=$b")
        val oldB = new org.apache.hadoop.fs.Path(tgt, s".__old_$b")
        if (fs.exists(curB) && !fs.rename(curB, oldB))
          throw new java.io.IOException(s"bucket swap failed: $curB -> $oldB")
        if (fs.exists(newB) && !fs.rename(newB, curB)) {
          fs.rename(oldB, curB)
          throw new java.io.IOException(s"bucket swap failed: $newB -> $curB")
        }
        fs.delete(oldB, true)
      }
      fs.delete(newRoot, true)
    } else {
      val survivors = spark.read.option("mergeSchema", "true").parquet(target)
        .join(keys.distinct(), keyCols, "left_anti")
      val newPath = new org.apache.hadoop.fs.Path(target + ".__new")
      val oldPath = new org.apache.hadoop.fs.Path(target + ".__old")
      fs.delete(newPath, true)
      survivors.write.mode(SaveMode.Overwrite)
        .option("compression", compression).parquet(newPath.toString)
      if (!fs.rename(tgt, oldPath))
        throw new java.io.IOException(s"swap failed: $tgt -> $oldPath")
      if (!fs.rename(newPath, tgt)) {
        fs.rename(oldPath, tgt)
        throw new java.io.IOException(s"swap failed: $newPath -> $tgt")
      }
      fs.delete(oldPath, true)
    }
    val deleted = before - targetRowCount(spark, id)
    if (deleted != 0) {
      // keep the count-parity gate honest: the cumulative loaded-rows
      // counter must drop with the rows, marked as a manual intervention
      // (the same audit convention as watermark-count)
      val wm = store.get(id.scoped)
      wm.foreach { w =>
        store.save(w.copy(
          redshift_state = w.redshift_state.copy(
            total_rows = math.max(0L, w.redshift_state.total_rows - deleted),
            last_updated = Some(store.nowString())),
          metadata = w.metadata.copy(manual_override = true)))
      }
    }
    deleted
  }

  /** Re-apply the persisted tombstones (if any) to the current table —
    * the idempotent form [[load]] uses after an increment re-delivered
    * deleted keys. Returns rows deleted. */
  def applyTombstones(spark: SparkSession, id: TableId): Long = {
    val tp = tombstonePath(id)
    val fs = new org.apache.hadoop.fs.Path(tp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(tp))) 0L
    else store.withTableLock(id.scoped) {
      deleteKeysLocked(spark, id, spark.read.parquet(tp),
        persistTombstones = false)
    }
  }

  /** Rewrite the warehouse table clustered on the z-curve over `cols`
    * ([[graft.operators.Layout.zorderBy]]) — compact's crash-safe
    * row-verified swap, but the rewrite ORDER is the product: after it,
    * footer min/max pruning cuts scans on ANY clustered column. Sized to
    * `targetFileBytes` like compaction. Bucketed-merge targets are refused:
    * their bucket dirs ARE the layout contract; z-order within buckets
    * would multiply files per bucket for little pruning gain.
    * Returns (filesBefore, filesAfter). */
  def rewriteLayoutZorder(spark: SparkSession, id: TableId,
                          cols: Seq[String], bitsPerDim: Int = 8,
                          targetFileBytes: Long = 256L * 1024 * 1024): (Int, Int) =
    store.withTableLock(id.scoped) {
      val target = targetPath(id)
      val tgt = new org.apache.hadoop.fs.Path(target)
      val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val oldPath = new org.apache.hadoop.fs.Path(target + ".__old")
      recoverSwap(fs, tgt, oldPath)
      recoverBucketBackups(fs, tgt)
      if (!fs.exists(tgt)) return (0, 0)
      if (fs.listStatus(tgt).exists(_.getPath.getName.startsWith(s"$BucketCol=")))
        throw new IllegalArgumentException(
          s"zorder rewrite refused for bucketed target ${id.scoped}: the " +
            "bucket layout is the clustering contract there")
      val conf = spark.sparkContext.hadoopConfiguration
      val files = listParquetFilesWithSize(spark, target)
      if (files.isEmpty) return (0, 0)
      val totalBytes = files.map(_._2).sum
      val wantFiles = math.max(1L,
        (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val rowsBefore = ParquetFooters.totalRows(files.map(_._1), conf)
      val newPath = new org.apache.hadoop.fs.Path(target + ".__new")
      fs.delete(newPath, true)
      graft.operators.Layout.zorderBy(
          spark.read.option("mergeSchema", "true").parquet(target),
          cols, bitsPerDim, outPartitions = Some(wantFiles))
        .write.mode(SaveMode.Overwrite)
        .option("compression", compression).parquet(newPath.toString)
      val newFiles = listParquetFilesWithSize(spark, newPath.toString)
      val rowsAfter = ParquetFooters.totalRows(newFiles.map(_._1), conf)
      if (rowsAfter != rowsBefore) {
        fs.delete(newPath, true)
        throw new java.io.IOException(
          s"zorder rewrite aborted: rewrite has $rowsAfter rows, target has $rowsBefore")
      }
      if (!fs.rename(tgt, oldPath))
        throw new java.io.IOException(s"swap failed: $tgt -> $oldPath")
      if (!fs.rename(newPath, tgt)) {
        fs.rename(oldPath, tgt)
        throw new java.io.IOException(s"swap failed: $newPath -> $tgt")
      }
      fs.delete(oldPath, true)
      (files.size, newFiles.size)
    }

  /** Read the warehouse table (empty DataFrame if never loaded). mergeSchema
    * so additively-evolved tables surface the union schema (old files read
    * NULL for new columns). Bucketed-merge targets surface WITHOUT the
    * internal bucket column. */
  def readTarget(spark: SparkSession, id: TableId): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(targetPath(id))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.option("mergeSchema", "true").parquet(targetPath(id))
        .drop(BucketCol))
    else None
  }

  private def listParquetFiles(spark: SparkSession, dir: String): Seq[String] =
    listParquetFilesWithSize(spark, dir).map(_._1)

  /** One recursive listing returning (path, bytes), sorted by path. Skips
    * files under hidden path segments (dot-prefixed, or underscore-prefixed
    * non-partition dirs) — the same rule Spark's file index applies — so
    * crash-recovery artifacts like `.__old_<b>` never double-count rows in
    * the parity gate. */
  private def listParquetFilesWithSize(spark: SparkSession,
                                       dir: String): Seq[(String, Long)] =
    listParquetFilesMeta(spark, dir).map(f => (f._1, f._2))

  /** (path, bytes, modificationTime) via the shared [[graft.util.FsListing]]
    * — one definition of the hidden-segment rule for extractor and loader. */
  private def listParquetFilesMeta(spark: SparkSession,
                                   dir: String): Seq[(String, Long, Long)] =
    graft.util.FsListing
      .parquetFilesMeta(dir, spark.sparkContext.hadoopConfiguration)

  /** Warehouse row count from parquet FOOTERS — O(files) metadata reads, no
    * data scan. The count-parity gate at 100 TB costs seconds of namenode
    * time instead of a full table scan per sync. */
  def targetRowCount(spark: SparkSession, id: TableId): Long =
    ParquetFooters.totalRows(listParquetFiles(spark, targetPath(id)),
      spark.sparkContext.hadoopConfiguration)

  /** Load staged files into a BUCKETED catalog table — the materialized form
    * of the DISTKEY/SORTKEY analog below: `bucketBy(distKey)` hash-partitions
    * the data on disk exactly like Redshift DISTSTYLE KEY, so joins between
    * tables bucketed on the same key are co-located (zero Exchange in the
    * physical plan — proven in MergeSwapSpec). `sortBy` = SORTKEY. Requires a
    * session with catalog support (default in-memory/derby works). */
  def loadBucketed(spark: SparkSession, id: TableId, stagedDir: String,
                   distKey: String, sortKeys: Seq[String] = Nil,
                   buckets: Int = 32): String = {
    val tableName = s"graft_${id.safeName}"
    // a previous JVM's catalog may be gone while its managed location
    // survives on disk — drop both so Overwrite can't trip on the orphan
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val warehouseDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tableName)
    warehouseDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(warehouseDir, true)
    val staged = spark.read.option("mergeSchema", "true")
      .parquet(listParquetFiles(spark, stagedDir): _*)
    val writer0 = staged.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, distKey)
    val writer = if (sortKeys.nonEmpty)
      writer0.sortBy(sortKeys.head, sortKeys.tail: _*) else writer0
    writer.saveAsTable(tableName)
    tableName
  }

  /** Generate warehouse DDL with distribution/sort hints — the Redshift
    * DISTKEY/SORTKEY generator (flexible_schema_manager.py:274-473) mapped to
    * Spark bucketing (`CLUSTERED BY` ≈ DISTKEY, `SORTED BY` ≈ SORTKEY). */
  def generateDdl(id: TableId, schema: org.apache.spark.sql.types.StructType,
                  distKey: Option[String] = None,
                  sortKeys: Seq[String] = Nil, buckets: Int = 32): String = {
    val cols = schema.fields.map(f =>
      s"  ${f.name} ${TypeMapper.sparkToWarehouseDdl(f.dataType)}").mkString(",\n")
    val clustered = distKey.map { k =>
      val sorted = if (sortKeys.nonEmpty)
        s" SORTED BY (${sortKeys.mkString(", ")})" else ""
      s"\nCLUSTERED BY ($k)$sorted INTO $buckets BUCKETS"
    }.getOrElse("")
    s"CREATE TABLE IF NOT EXISTS ${id.schema}.${id.table} (\n$cols\n) USING parquet$clustered"
  }
}
