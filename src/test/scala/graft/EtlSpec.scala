package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.util.Retry
import graft.watermark.WatermarkStore

/** Extract→load session robustness: idempotent re-load, corrupt-file
  * quarantine (per-file error isolation), incremental resume, retry wrapper. */
class EtlSpec extends AnyFunSuite with SparkTestBase {

  private val id = TableId("test", "fx", "events")
  private val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
  private def events = spark.read
    .option("mergeSchema", "false")
    .parquet(s"$sfDir/events.parquet")

  private def rig() = {
    val root = tmpDir("etl")
    val store = new WatermarkStore(s"$root/wm")
    (root, store, new Extractor(store, s"$root/staging"),
      new Loader(store, s"$root/warehouse"))
  }

  test("extract → load preserves all rows; metrics populated") {
    val (_, _, extractor, loader) = rig()
    val n = events.count()
    val ext = extractor.extract(spark, id, events, cfg)
    assert(ext.rows == n)
    assert(ext.metrics.rows == n && ext.metrics.seconds > 0)
    val load = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(load.loadedRows == n)
    assert(load.quarantinedFiles.isEmpty)
    assert(loader.readTarget(spark, id).get.count() == n)
  }

  test("re-load is a no-op (file-level blacklist idempotence)") {
    val (_, _, extractor, loader) = rig()
    extractor.extract(spark, id, events, cfg)
    val first = loader.load(spark, id, extractor.stagingDir(id), cfg)
    val second = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(second.files == 0 && second.loadedRows == 0)
    assert(second.skippedFiles == first.files)
    assert(loader.readTarget(spark, id).get.count() == events.count())
  }

  test("corrupt staged file is quarantined, others still load") {
    val (_, store, extractor, loader) = rig()
    extractor.extract(spark, id, events, cfg)
    // plant a corrupt parquet file among the staged output
    val bad = new java.io.File(extractor.stagingDir(id), "corrupt.parquet")
    java.nio.file.Files.writeString(bad.toPath, "this is not parquet")
    val load = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(load.quarantinedFiles.map(f => new java.io.File(f).getName) ==
      Seq("corrupt.parquet"))
    assert(load.loadedRows == events.count()) // the good files all loaded
    // session stays success; the quarantine warning survives in error
    val wm = store.get(id.scoped).get
    assert(wm.redshift_state.status == "success")
    assert(wm.redshift_state.error.exists(_.contains("quarantined 1")))
  }

  test("corrupt files do not occupy maxFilesPerLoad slots") {
    // the cap must select VALID files: a corrupt newest set would
    // otherwise wedge the whole valid backlog behind it forever, with
    // every session reporting success-with-warning and loading nothing
    val root = tmpDir("etlcap")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse",
      maxFilesPerLoad = Some(2))
    extractor.extract(spark, id, events, cfg)
    // plant two corrupt files with the NEWEST mtimes — under the old
    // selection they consume both cap slots every session
    val dir = new java.io.File(extractor.stagingDir(id))
    Seq("bad1", "bad2").foreach { n =>
      val f = new java.io.File(dir, s"$n.parquet")
      java.nio.file.Files.writeString(f.toPath, "not parquet")
      assert(f.setLastModified(System.currentTimeMillis() + 3600000L))
    }
    val load = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(load.quarantinedFiles.size == 2)
    assert(load.loadedRows > 0,
      "corrupt newest files starved the cap window: nothing valid loaded")
  }

  test("truncate-mode pure replay still runs the tombstone gate") {
    // full_sync replace: the pre-crash session installs everything (all
    // files blacklisted) and dies before its own gate — the replay keeps
    // the table but must still re-suppress tombstoned rows
    val root = tmpDir("etltruncgate")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val fullCfg = CdcConfig(CdcStrategyKind.FullSync)
    val s = spark; import s.implicits._
    extractor.extract(spark, id, events.filter(col("event_id") <= 500), fullCfg)
    loader.load(spark, id, extractor.stagingDir(id), fullCfg)
    val victim = 42L
    assert(loader.readTarget(spark, id).get
      .filter(col("event_id") === victim).count() == 1)
    // forget the key, then simulate the pre-crash session's install by
    // hiding the tombstones, re-syncing (row resurrects), restoring them
    loader.deleteKeys(spark, id, Seq(victim).toDF("event_id"))
    val tombP = new org.apache.hadoop.fs.Path(
      loader.targetPath(id) + ".__tombstones")
    val hidden = new org.apache.hadoop.fs.Path(
      loader.targetPath(id) + ".__tomb_hidden")
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(tombP, hidden))
    extractor.extract(spark, id, events.filter(col("event_id") <= 500), fullCfg)
    loader.load(spark, id, extractor.stagingDir(id), fullCfg)
    assert(loader.readTarget(spark, id).get
      .filter(col("event_id") === victim).count() == 1,
      "setup: the row must resurrect while the gate is disarmed")
    assert(fs.rename(hidden, tombP))
    // PURE replay in truncate mode: fresh empty, table kept — the gate
    // must still fire (previously skipped: valid.isEmpty bypassed it)
    val replay = loader.load(spark, id, extractor.stagingDir(id), fullCfg)
    assert(replay.loadedRows == 0L)
    assert(loader.readTarget(spark, id).get
      .filter(col("event_id") === victim).isEmpty,
      "truncate-mode pure replay left a tombstoned row resurrected")
  }

  test("tombstone re-suppression survives key-column case drift") {
    // forget with an upper-cased key column: the delete resolves (Spark is
    // case-insensitive) and the persisted tombstone must STILL gate future
    // re-deliveries — a case-sensitive column-subset check silently
    // disabled the gate for exactly this input
    val root = tmpDir("etlcase")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val s = spark; import s.implicits._
    extractor.extract(spark, id, events.filter(col("event_id") <= 500), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val victim = 123L
    assert(loader.deleteKeys(spark, id,
      Seq(victim).toDF("EVENT_ID")) == 1L)
    assert(loader.readTarget(spark, id).get
      .filter(col("event_id") === victim).isEmpty)
    // a later sync re-delivers the forgotten key
    extractor.extract(spark, id, events.filter(col("event_id") <= 800), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(loader.readTarget(spark, id).get
      .filter(col("event_id") === victim).isEmpty,
      "case-drifted tombstone failed to re-suppress the re-delivered key")
  }

  test("a second concurrent session of the same table is REFUSED by the lock") {
    val (_, store, extractor, loader) = rig()
    // another process's in-flight session holds the lock
    val token = store.tryLock(id.scoped).get
    intercept[graft.watermark.TableLockedException] {
      extractor.extract(spark, id, events, cfg)
    }
    intercept[graft.watermark.TableLockedException] {
      loader.load(spark, id, extractor.stagingDir(id), cfg)
    }
    // the refused sessions must not have mutated the watermark
    assert(store.get(id.scoped).isEmpty)
    store.unlock(id.scoped, token)
    // once released, the session proceeds normally end-to-end
    val ext = extractor.extract(spark, id, events, cfg)
    assert(ext.rows == events.count())
    val load = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(load.loadedRows == events.count())
  }

  test("withTableLock is reentrant on one thread (runner→extractor chain)") {
    val (_, store, extractor, _) = rig()
    // outer session lock (as PipelineRunner.runTable takes it), inner
    // extractor lock on the same thread must re-enter, not deadlock/refuse
    val ext = store.withTableLock(id.scoped) {
      extractor.extract(spark, id, events, cfg)
    }
    assert(ext.rows == events.count())
    // outer frame released the lock on exit
    val t = store.tryLock(id.scoped)
    assert(t.isDefined)
    store.unlock(id.scoped, t.get)
  }

  test("footer-based target row count runs ZERO Spark jobs (parity at scale)") {
    val (_, _, extractor, loader) = rig()
    extractor.extract(spark, id, events, cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val expected = events.count()
    Thread.sleep(300) // drain async listener events from the loads above
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val counted = loader.targetRowCount(spark, id)
    Thread.sleep(300)
    val after = tracker.getJobIdsForGroup(null).length
    assert(counted == expected)
    assert(after == before, "parity count must not launch a Spark job")
  }

  test("footer stats refuse DECIMAL-annotated columns (unscaled-value trap)") {
    // a DECIMAL(p,s) column stored as INT64 keeps the UNSCALED value in its
    // footer stats; trusting it would jump an id cursor to 100× the real max
    // and silently drop every later increment — scanStats must return None so
    // callers fall back to a value scan
    import graft.util.ParquetFooters
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("decstats")
    val df = events.limit(100)
      .withColumn("dec_id", col("event_id").cast("decimal(12,2)"))
    df.write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val (rows, decMax) = ParquetFooters.scanStats(files, conf, Some("dec_id"))
    assert(rows == 100)
    assert(decMax.isEmpty, "decimal-annotated footer stats must NOT be trusted")
    // a plain integral column still yields its exact max with zero data read
    val (_, longMax) = ParquetFooters.scanStats(files, conf, Some("event_id"))
    assert(longMax.contains(events.limit(100).agg(max("event_id"))
      .head().getLong(0)))
  }

  test("incremental extract resumes from the committed cursor") {
    val (_, store, extractor, loader) = rig()
    val firstHalf = events.filter(col("event_id") <= 300)
    val e1 = extractor.extract(spark, id, firstHalf, cfg)
    assert(e1.cursor.lastId.contains(300L))
    // second session sees the full table but must only take event_id > 300
    val e2 = extractor.extract(spark, id, events, cfg)
    assert(e2.rows == events.filter(col("event_id") > 300).count())
    val wm = store.get(id.scoped).get
    assert(wm.mysql_state.total_rows == events.count()) // cumulative
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(loader.readTarget(spark, id).get.count() == events.count())
  }

  test("full_sync replace truncates the target") {
    val (_, _, extractor, loader) = rig()
    val full = CdcConfig(CdcStrategyKind.FullSync)
    extractor.extract(spark, id, events.limit(100), full)
    loader.load(spark, id, extractor.stagingDir(id), full)
    // second replace cycle must overwrite, not append: the first session's
    // files are already blacklisted, so only the fresh 50-row session lands
    extractor.extract(spark, id, events.limit(50), full)
    loader.load(spark, id, extractor.stagingDir(id), full)
    assert(loader.readTarget(spark, id).get.count() == 50)
  }

  test("schema drift: removed column fails the load and marks the watermark") {
    // ref incident path (SCHEMA_MISMATCH_INCIDENT_REPORT.md): destructive
    // drift must HALT the load with an alert, never silently write
    val (root, store, extractor, loader) = rig()
    extractor.extract(spark, id, events, cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val dropped = tmpDir("drift_removed")
    events.drop("value").write.mode("overwrite").parquet(dropped)
    val e = intercept[graft.sources.SchemaDriftException] {
      loader.load(spark, id, dropped, cfg)
    }
    assert(e.diff.removed.map(_.name) == Seq("value"))
    val wm = store.get(id.scoped).get
    assert(wm.redshift_state.status == "failed")
    assert(wm.redshift_state.error.exists(_.contains("schema drift")))
    // the target is untouched by the refused batch
    assert(loader.readTarget(spark, id).get.count() == events.count())
  }

  test("schema drift: retyped column fails under AdditiveOnly AND Strict") {
    for (policy <- Seq(graft.sources.EvolutionPolicy.AdditiveOnly,
                       graft.sources.EvolutionPolicy.Strict)) {
      val root = tmpDir("drift_retyped")
      val store = new WatermarkStore(s"$root/wm")
      val extractor = new Extractor(store, s"$root/staging")
      val loader = new Loader(store, s"$root/warehouse",
        evolutionPolicy = policy)
      extractor.extract(spark, id, events, cfg)
      loader.load(spark, id, extractor.stagingDir(id), cfg)
      val retyped = tmpDir("drift_retyped_staged")
      events.withColumn("value", col("value").cast("string"))
        .write.mode("overwrite").parquet(retyped)
      val e = intercept[graft.sources.SchemaDriftException] {
        loader.load(spark, id, retyped, cfg)
      }
      assert(e.diff.changed.map(_._1.name) == Seq("value"), s"policy $policy")
      assert(store.get(id.scoped).get.redshift_state.status == "failed")
    }
  }

  test("schema drift: added column merges under AdditiveOnly, fails Strict") {
    val (root, store, extractor, loader) = rig()
    extractor.extract(spark, id, events, cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val widened = tmpDir("drift_added")
    events.limit(10).withColumn("extra_col", lit("x"))
      .write.mode("overwrite").parquet(widened)
    // AdditiveOnly (the default): new column accepted; old rows read NULL
    loader.load(spark, id, widened, cfg)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.columns.contains("extra_col"))
    assert(tgt.count() == events.count() + 10)
    assert(tgt.filter(col("extra_col").isNull).count() == events.count())
    // Strict refuses the same batch
    val strictRoot = tmpDir("drift_strict")
    val strictStore = new WatermarkStore(s"$strictRoot/wm")
    val strictEx = new Extractor(strictStore, s"$strictRoot/staging")
    val strictLoader = new Loader(strictStore, s"$strictRoot/warehouse",
      evolutionPolicy = graft.sources.EvolutionPolicy.Strict)
    strictEx.extract(spark, id, events, cfg)
    strictLoader.load(spark, id, strictEx.stagingDir(id), cfg)
    intercept[graft.sources.SchemaDriftException] {
      strictLoader.load(spark, id, widened, cfg)
    }
    assert(strictStore.get(id.scoped).get.redshift_state.status == "failed")
  }

  test("crashed blacklist save replays EXACTLY-ONCE (no duplicate rows)") {
    // simulate the worst crash window: a sub-batch's data is fully written
    // and installed, then the blacklist save dies. The replay must adopt the
    // committed batch from its manifest instead of re-appending it.
    val root = tmpDir("eo")
    class CrashingStore(dir: String) extends WatermarkStore(dir) {
      @volatile var failuresLeft = 0
      override def save(w: graft.watermark.Watermark,
                        target: String = "default"): Unit = {
        if (failuresLeft > 0 && w.redshift_state.status == "success") {
          failuresLeft -= 1
          throw new java.io.IOException("simulated watermark outage")
        }
        super.save(w, target)
      }
    }
    val store = new CrashingStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    // one file per sub-batch so the crash hits between batches
    val loader = new Loader(store, s"$root/warehouse", commitBatchFiles = 1)
    extractor.extract(spark, id, events, cfg)
    store.failuresLeft = 1 // first successful-load save dies
    intercept[java.io.IOException] {
      loader.load(spark, id, extractor.stagingDir(id), cfg)
    }
    // the crash left a committed batch: data present, blacklist missing
    val tgtDir = new java.io.File(loader.targetPath(id))
    assert(tgtDir.exists(), "no data installed before the crash")
    // replay with a healthy store: must converge to EXACTLY the source rows
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == events.count(),
      "crash replay duplicated or lost rows")
    assert(tgt.select("event_id").distinct().count() == events.count())
    // watermark accounting converged too: every staged file blacklisted once
    val wm = store.get(id.scoped).get
    assert(wm.redshift_state.total_rows == events.count())
    // no protocol litter left behind
    assert(!tgtDir.listFiles().exists(f =>
      f.getName.startsWith(".__commit_") || f.getName.startsWith(".__inflight_")))
  }

  test("crashed extract's orphan session never loads (re-extract, no dups)") {
    // crash window: staged parquet written, cursor save lost. The orphan
    // session must stay INVISIBLE to the loader — its rows re-extract under
    // the unadvanced cursor, so loading both would duplicate them.
    val root = tmpDir("orphan")
    class ExtractCrashStore(dir: String) extends WatermarkStore(dir) {
      @volatile var failuresLeft = 0
      override def save(w: graft.watermark.Watermark,
                        target: String = "default"): Unit = {
        if (failuresLeft > 0 && w.mysql_state.status == "success") {
          failuresLeft -= 1
          throw new java.io.IOException("simulated cursor-save outage")
        }
        super.save(w, target)
      }
    }
    val store = new ExtractCrashStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    store.failuresLeft = 1
    intercept[java.io.IOException] {
      extractor.extract(spark, id, events, cfg)
    }
    // staged bytes exist on disk, but the session was never committed
    assert(new java.io.File(extractor.stagingDir(id)).exists())
    val orphanLoad = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(orphanLoad.files == 0 && orphanLoad.loadedRows == 0,
      "orphan session was loaded")
    // healthy re-extract commits a new session; the load converges exactly
    val ext = extractor.extract(spark, id, events, cfg)
    assert(ext.rows == events.count()) // cursor had NOT advanced
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == events.count(), "orphan + re-extract duplicated rows")
    assert(tgt.select("event_id").distinct().count() == events.count())
  }

  test("session tags stay monotonic across a simulated host reboot") {
    // nanoTime is boot-relative: after a reboot it can run BELOW the
    // committed high-water tag. A tag below the high-water would make a
    // subsequently-crashed session loadable (duplicates) and invisible to
    // the orphan sweep. The extractor must clamp above the committed tag.
    val (_, store, extractor, loader) = rig()
    extractor.extract(spark, id, events.filter(col("event_id") <= 100), cfg)
    // simulate "pre-reboot" state: committed tag far above current nanoTime
    val future = System.nanoTime() + 100L * 365 * 24 * 3600 * 1000000000L
    val wm = store.get(id.scoped).get
    store.save(wm.copy(metadata = wm.metadata.copy(
      last_session = Some(future.toString))))
    val ext = extractor.extract(spark, id, events, cfg)
    val tag = ext.stagedPath.split("session=").last.toLong
    assert(tag > future, s"tag $tag not above committed high-water $future")
    // and the session actually loads (it is NOT above-committed-orphaned
    // once its own commit advances the high-water)
    val load = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(load.loadedRows > 0)
  }

  test("full-replace crash replay neither re-truncates nor duplicates") {
    // truncate must clear the target exactly ONCE per snapshot: a replay
    // that re-truncated would drop the groups the crashed run already
    // installed; an idle re-run of a loaded snapshot must not wipe the table
    val root = tmpDir("truncreplay")
    class FailNthStore(dir: String) extends WatermarkStore(dir) {
      @volatile var saves = 0
      @volatile var failAt = -1
      override def save(w: graft.watermark.Watermark,
                        target: String = "default"): Unit = {
        saves += 1
        if (saves == failAt) throw new java.io.IOException("simulated outage")
        super.save(w, target)
      }
    }
    val store = new FailNthStore(s"$root/wm")
    // small target file size → several staged part files → several sub-batches
    val extractor = new Extractor(store, s"$root/staging",
      targetFileRows = 100)
    val loader = new Loader(store, s"$root/warehouse", commitBatchFiles = 1)
    val snapshot = events.filter(col("event_id") <= 400).coalesce(1)
    val n = snapshot.count()
    extractor.extract(spark, id, snapshot, cfg)
    // crash during the SECOND sub-batch's blacklist save
    store.failAt = store.saves + 2
    intercept[java.io.IOException] {
      loader.load(spark, id, extractor.stagingDir(id), cfg, truncate = true)
    }
    store.failAt = -1
    // replay completes the snapshot: every row exactly once
    loader.load(spark, id, extractor.stagingDir(id), cfg, truncate = true)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == n, "replay lost or duplicated rows")
    assert(tgt.select("event_id").distinct().count() == n)
    // idle re-run of the fully-loaded snapshot: table stays intact
    loader.load(spark, id, extractor.stagingDir(id), cfg, truncate = true)
    assert(loader.readTarget(spark, id).get.count() == n,
      "idle truncate re-run wiped the table")
  }

  test("merge-mode load honors the schema-evolution gate") {
    // the upsert path must refuse destructive drift like the append path
    // (previously it bypassed the gate: added columns silently dropped,
    // removed columns a raw AnalysisException with no watermark record)
    val (root, store, extractor, loader) = rig()
    extractor.extract(spark, id, events.filter(col("event_id") <= 300), cfg)
    loader.mergeLoad(spark, id, extractor.stagingDir(id), cfg, Seq("event_id"))
    // destructive: a staged increment missing a column refuses + marks failed
    val dropped = tmpDir("mdrift_removed")
    events.filter(col("event_id") > 300).drop("value")
      .write.mode("overwrite").parquet(dropped)
    intercept[graft.sources.SchemaDriftException] {
      loader.mergeLoad(spark, id, dropped, cfg, Seq("event_id"))
    }
    assert(store.get(id.scoped).get.redshift_state.status == "failed")
    // additive: the increment's NEW column survives the merge (old rows NULL)
    val widened = tmpDir("mdrift_added")
    events.filter(col("event_id") > 300).withColumn("extra_col", lit("x"))
      .write.mode("overwrite").parquet(widened)
    loader.mergeLoad(spark, id, widened, cfg, Seq("event_id"))
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == events.count())
    assert(tgt.columns.contains("extra_col"),
      "additive column was silently dropped by the merge")
    assert(tgt.filter(col("extra_col") === "x").count() ==
      events.filter(col("event_id") > 300).count())
    assert(tgt.filter(col("event_id") <= 300 && col("extra_col").isNotNull)
      .count() == 0)
  }

  test("retry wrapper retries then surfaces RetryExhausted") {
    var calls = 0
    val r = Retry.withBackoff(maxAttempts = 3, initialDelayMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    calls = 0
    val e = intercept[Retry.RetryExhausted] {
      Retry.withBackoff(maxAttempts = 2, initialDelayMs = 1) {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(e.attempts == 2 && calls == 2)
  }

  test("extract failure marks watermark failed and rethrows") {
    val (_, store, extractor, _) = rig()
    val badCfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("no_such_col"))
    intercept[Exception] {
      extractor.extract(spark, id, events, badCfg,
        ceiling = Some(10L))
    }
    assert(store.get(id.scoped).get.mysql_state.status == "failed")
  }

  test("datetime layout refuses source columns that collide with derived partitions") {
    // withColumn would silently REPLACE a real 'hour' column with the
    // derived partition value and strip it into the directory structure —
    // the column's data would never reach the staged leaf files
    val s = spark
    import s.implicits._
    val root = tmpDir("clash")
    val store = new WatermarkStore(s"$root/wm")
    val ex = new Extractor(store, s"$root/staging",
      graft.model.PartitionStrategy.Datetime)
    val df = Seq((1L, "2024-01-01 10:00:00", 7))
      .toDF("id", "ts", "hour")
      .withColumn("ts", col("ts").cast("timestamp"))
    val hybrid = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("ts"), idColumn = Some("id"))
    val e = intercept[IllegalArgumentException] {
      ex.extract(spark, TableId("t", "fx", "clash"), df, hybrid)
    }
    assert(e.getMessage.contains("hour"), e.getMessage)
  }

  test("epoch-seconds CDC column works through the datetime staging layout") {
    val s = spark
    import s.implicits._
    val root = tmpDir("epochdt")
    val store = new WatermarkStore(s"$root/wm")
    val ex = new Extractor(store, s"$root/staging",
      graft.model.PartitionStrategy.Datetime)
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val df = (0L until 6L).map(i => (base + i * 3600, i)).toDF("ts", "id")
    val cfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("ts"), idColumn = Some("id"),
      timestampIsUnixEpoch = true)
    val r = ex.extract(spark, TableId("t", "fx", "epoch"), df, cfg)
    assert(r.rows == 6)
    assert(r.cursor.lastTimestamp.contains("2024-01-01 05:00:00"))
    assert(r.cursor.lastId.contains(5L))
    // the staging layout derived real calendar dirs from the epoch column
    val staged = new java.io.File(ex.stagingDir(TableId("t", "fx", "epoch")))
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) :+ f.getName
      else Seq(f.getName)
    assert(walk(staged).exists(_ == "year=2024"), "missing year= partition dir")
  }

  test("append load after a crashed merge swap restores the backup first") {
    // crash window: mergeInto died between rename(target -> .__old) and
    // rename(.__new -> target). The table's only copy is the backup. An
    // append load must restore it BEFORE reading the target — otherwise it
    // rebuilds a staged-rows-only table and the next recovery discards the
    // backup as stale (the table silently vanishes).
    val (_, _, extractor, loader) = rig()
    extractor.extract(spark, id, events.limit(100), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val tgt = new org.apache.hadoop.fs.Path(loader.targetPath(id))
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(tgt, new org.apache.hadoop.fs.Path(
      loader.targetPath(id) + ".__old")), "simulated crash rename failed")
    // next increment arrives and loads
    extractor.extract(spark, id, events.filter(col("event_id") > 100).limit(50), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(loader.readTarget(spark, id).get.count() == 150,
      "pre-crash rows lost: backup was not restored before the append")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      loader.targetPath(id) + ".__old")), "stale backup left behind")
  }

  test("leftover commit dir of an already-counted group never double-counts") {
    // crash window: blacklist save SUCCEEDED, commit-dir delete died. The
    // next session's recovery must adopt the dir without re-adding the
    // group's rows to the cumulative counter.
    val (_, store, extractor, loader) = rig()
    extractor.extract(spark, id, events.limit(100), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val wm0 = store.get(id.scoped).get
    val total0 = wm0.redshift_state.total_rows
    val group = wm0.processed_files.sorted
    // resurrect the commit dir exactly as the crash would leave it: manifest
    // naming the (already blacklisted, already installed) group
    val h = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(group.mkString("\n").getBytes("UTF-8"))
      md.digest().map("%02x".format(_)).mkString.take(16)
    }
    val commitDir = new java.io.File(loader.targetPath(id), s".__commit_$h")
    assert(commitDir.mkdirs())
    java.nio.file.Files.write(
      commitDir.toPath.resolve("_graft_group.txt"),
      group.mkString("\n").getBytes("UTF-8"))
    // fresh work so the load proceeds past the no-op early return
    extractor.extract(spark, id, events.filter(col("event_id") > 100).limit(40), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val total1 = store.get(id.scoped).get.redshift_state.total_rows
    assert(total1 == total0 + 40,
      s"cumulative counter drifted: $total0 -> $total1 (expected +40)")
    assert(!commitDir.exists(), "recovered commit dir not cleaned up")
  }

  test("session-less truncate replay never wipes installed sub-batches") {
    // full_sync replace over files staged WITHOUT session= tags (the
    // non-product path load() still supports): a crash after sub-batch 1's
    // blacklist save must not re-truncate on replay — file 1 stays
    // blacklisted, so its rows would be unrecoverable.
    val root = tmpDir("snless")
    class CrashingStore(dir: String) extends WatermarkStore(dir) {
      @volatile var failuresLeft = 0
      override def save(w: graft.watermark.Watermark,
                        target: String = "default"): Unit = {
        if (failuresLeft > 0 && w.redshift_state.status == "success") {
          failuresLeft -= 1
          super.save(w, target) // the save COMMITS...
          throw new java.io.IOException("crash after save")
        } else super.save(w, target)
      }
    }
    val store = new CrashingStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse", commitBatchFiles = 1)
    val staging = s"$root/flat_staging"
    // two single-file session-less staged parquets
    events.limit(30).coalesce(1).write.parquet(s"$staging/p1")
    events.filter(col("event_id") > 30).limit(20).coalesce(1)
      .write.parquet(s"$staging/p2")
    val full = CdcConfig(CdcStrategyKind.FullSync)
    store.failuresLeft = 1 // die right after sub-batch 1 commits
    intercept[java.io.IOException] {
      loader.load(spark, id, staging, full, truncate = true)
    }
    // replay: must keep sub-batch 1's installed rows and add the rest
    loader.load(spark, id, staging, full, truncate = true)
    assert(loader.readTarget(spark, id).get.count() == 50,
      "replay re-truncated and lost the first sub-batch")
  }

  test("truncate replay recovers a committed-but-unblacklisted sub-batch " +
    "instead of wiping it") {
    // the harder crash window than the test above: sub-batch 1 is
    // installed and its commit dir remains, but the blacklist save was
    // LOST. The replay's entry-time recovery blacklists it — and the
    // truncate decision must SEE that, or it judges isReplay=false,
    // re-truncates the just-recovered rows, and the (now-blacklisted)
    // source file is never reloaded: permanent silent loss.
    val root = tmpDir("trunc_eo")
    class CrashingStore(dir: String) extends WatermarkStore(dir) {
      @volatile var failuresLeft = 0
      override def save(w: graft.watermark.Watermark,
                        target: String = "default"): Unit = {
        if (failuresLeft > 0 && w.redshift_state.status == "success") {
          failuresLeft -= 1
          throw new java.io.IOException("simulated watermark outage")
        } else super.save(w, target)
      }
    }
    val store = new CrashingStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse", commitBatchFiles = 1)
    val staging = s"$root/flat_staging"
    events.limit(30).coalesce(1).write.parquet(s"$staging/p1")
    events.filter(col("event_id") > 30).limit(20).coalesce(1)
      .write.parquet(s"$staging/p2")
    val full = CdcConfig(CdcStrategyKind.FullSync)
    store.failuresLeft = 1 // sub-batch 1 installs, its blacklist save dies
    intercept[java.io.IOException] {
      loader.load(spark, id, staging, full, truncate = true)
    }
    loader.load(spark, id, staging, full, truncate = true)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == 50, "replay wiped the recovered sub-batch")
    assert(tgt.select("event_id").distinct().count() == 50)
  }

  test("a load group straddling an additive schema change carries the " +
    "new column (mergeSchema, not single-footer inference)") {
    val root = tmpDir("grp_ms")
    val store = new WatermarkStore(s"$root/wm")
    // commitBatchFiles = 2: BOTH files land in one spark.read group
    val loader = new Loader(store, s"$root/warehouse", commitBatchFiles = 2)
    val staging = s"$root/flat_staging"
    val s = spark; import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("event_id", "v")
      .coalesce(1).write.parquet(s"$staging/p1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("event_id", "v", "extra")
      .coalesce(1).write.parquet(s"$staging/p2")
    loader.load(spark, id, staging, cfg)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.columns.contains("extra"),
      s"new column lost to footer sampling: ${tgt.columns.mkString(",")}")
    assert(tgt.filter(col("extra").isNotNull).count() == 2 &&
      tgt.count() == 4)
  }
}
