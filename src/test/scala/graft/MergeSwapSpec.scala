package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.watermark.WatermarkStore

/** Atomic merge-into-warehouse (directory swap) and datetime-layout
  * partition pruning. */
class MergeSwapSpec extends AnyFunSuite with SparkTestBase {

  private val id = TableId("t", "fx", "orders")
  private val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("o_orderkey"))
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("mergeInto upserts by key and swaps atomically") {
    val root = tmpDir("merge")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1000), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val before = loader.readTarget(spark, id).get.count()

    // staged increment: keys 500.. updated (status U) + genuinely new keys
    val staged = orders.filter(col("o_orderkey") >= 500)
      .withColumn("o_orderstatus", lit("U"))
    val rows = loader.mergeInto(spark, id, staged, Seq("o_orderkey"))
    val after = loader.readTarget(spark, id).get
    assert(rows == after.count())
    // every key >= 500 now has status U; keys < 500 untouched
    assert(after.filter(col("o_orderkey") >= 500 && col("o_orderstatus") =!= "U")
      .count() == 0)
    assert(after.filter(col("o_orderkey") < 500 && col("o_orderstatus") === "U")
      .count() == 0)
    assert(after.count() ==
      orders.filter(col("o_orderkey") <= 1000).count() +
        orders.filter(col("o_orderkey") > 1000 && col("o_orderkey") >= 500).count())
    assert(before <= after.count())
    // no leftover swap directories
    val fs = new java.io.File(s"$root/warehouse")
    assert(!fs.listFiles().exists(f => f.getName.contains("__new") ||
      f.getName.contains("__old")))
  }

  test("mergeInto on an empty target bootstraps it") {
    val root = tmpDir("merge2")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val rows = loader.mergeInto(spark, id,
      orders.filter(col("o_orderkey") <= 100), Seq("o_orderkey"))
    assert(rows == loader.readTarget(spark, id).get.count())
    assert(rows == orders.filter(col("o_orderkey") <= 100).count())
  }

  test("bucketed merge rewrites ONLY the buckets containing staged keys") {
    val root = tmpDir("bmerge")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val nBuckets = 16
    // bootstrap a bucketed target
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), nBuckets)
    val targetDir = new java.io.File(loader.targetPath(id))
    def bucketFiles(): Map[String, Map[String, (Long, Long)]] =
      targetDir.listFiles().filter(_.getName.startsWith("__gbucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
        }.toMap
    val before = bucketFiles()
    assert(before.nonEmpty)

    // stage a single-key update → exactly one bucket affected
    val staged = orders.filter(col("o_orderkey") === 500)
      .withColumn("o_orderstatus", lit("U"))
    val total = loader.mergeIntoBucketed(spark, id, staged, Seq("o_orderkey"), nBuckets)
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit(500L)), lit(nBuckets))).head().getInt(0)

    val after = bucketFiles()
    // untouched buckets: identical file names, sizes, and mtimes (never rewritten)
    before.foreach { case (bucket, files) =>
      if (bucket != s"__gbucket=$expectedBucket")
        assert(after(bucket) == files, s"bucket $bucket was rewritten")
    }
    // the affected bucket WAS rewritten
    assert(after(s"__gbucket=$expectedBucket") !=
      before(s"__gbucket=$expectedBucket"))
    // merge semantics: count unchanged, key 500 updated, readTarget clean
    val tgt = loader.readTarget(spark, id).get
    assert(total == orders.filter(col("o_orderkey") <= 1000).count())
    assert(tgt.count() == total)
    assert(tgt.filter(col("o_orderkey") === 500).select("o_orderstatus")
      .head().getString(0) == "U")
    assert(!tgt.columns.contains("__gbucket"))
  }

  test("deleteKeys: crash-safe rewrite, tombstone re-suppression, parity kept") {
    val root = tmpDir("forget")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1000), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val n0 = loader.readTarget(spark, id).get.count()
    val s = spark; import s.implicits._
    // tombstone EVERY %7 key — including ones that have not arrived yet
    val doomed = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"))
    val nDoomed = orders.filter(col("o_orderkey") <= 1000)
      .filter(col("o_orderkey") % 7 === 0).count()

    val deleted = loader.deleteKeys(spark, id, doomed)
    assert(deleted == nDoomed) // only the present rows count as deleted
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == n0 - nDoomed)
    assert(tgt.filter(col("o_orderkey") % 7 === 0).isEmpty)
    // the count-parity counter followed the deletion
    assert(store.get(id.scoped).get.redshift_state.total_rows == n0 - nDoomed)
    // idempotent: deleting the same keys again removes nothing
    assert(loader.deleteKeys(spark, id, doomed) == 0L)

    // a later sync re-delivering tombstoned keys is re-suppressed
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1200), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val tgt2 = loader.readTarget(spark, id).get
    assert(tgt2.filter(col("o_orderkey") % 7 === 0).isEmpty,
      "tombstoned keys re-appeared after a re-sync")
    val n2 = tgt2.count()
    assert(n2 ==
      orders.filter(col("o_orderkey") <= 1200)
        .filter(col("o_orderkey") % 7 =!= 0).count())

    // crash recovery: simulate a mid-swap crash (table only in .__old).
    // (tgt2's plan dies with the swap — swap-based rewrites invalidate
    // earlier frames, hence the count captured above.)
    val tgtDir = new java.io.File(loader.targetPath(id))
    val oldDir = new java.io.File(loader.targetPath(id) + ".__old")
    assert(tgtDir.renameTo(oldDir))
    assert(loader.deleteKeys(spark, id,
      Seq(999999L).toDF("o_orderkey")) == 0L) // entry recovery restores first
    assert(loader.readTarget(spark, id).get.count() == n2)
  }

  test("tombstone gate fires on a crash REPLAY (all sub-batches blacklisted)") {
    // crash window: the pre-crash session installed its sub-batches and
    // committed their blacklists, then died BEFORE the gate's rewrite — on
    // replay loadedRows is 0, yet the resurrected rows sit in the target.
    // Emulate by hiding the tombstone sidecar during the install (gate
    // sees none), then restoring it for the replay.
    val root = tmpDir("replaygate")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val s = spark; import s.implicits._
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 500), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    // forget key 700 before it ever arrives: tombstone only, nothing deleted
    assert(loader.deleteKeys(spark, id, Seq(700L).toDF("o_orderkey")) == 0L)
    val tombP = new org.apache.hadoop.fs.Path(loader.targetPath(id) + ".__tombstones")
    val hidden = new org.apache.hadoop.fs.Path(loader.targetPath(id) + ".__tomb_hidden")
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(tombP, hidden)) // gate disarmed: simulates the crash
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 800), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(loader.readTarget(spark, id).get
      .filter(col("o_orderkey") === 700).count() == 1,
      "setup: resurrected row must be installed while the gate is disarmed")
    assert(fs.rename(hidden, tombP)) // crash is over; tombstone visible again
    // the REPLAY: nothing fresh to load (all blacklisted), but the gate
    // must still re-suppress the tombstoned key
    val replay = loader.load(spark, id, extractor.stagingDir(id), cfg)
    assert(replay.loadedRows == 0L, "setup: replay must load nothing")
    assert(loader.readTarget(spark, id).get
      .filter(col("o_orderkey") === 700).isEmpty,
      "crash replay left a tombstoned row resurrected")
  }

  test("deleteKeys on a bucketed target rewrites only the keys' buckets") {
    val root = tmpDir("bforget")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val nBuckets = 16
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), nBuckets)
    val targetDir = new java.io.File(loader.targetPath(id))
    def bucketFiles(): Map[String, Map[String, (Long, Long)]] =
      targetDir.listFiles().filter(_.getName.startsWith("__gbucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
        }.toMap
    val before = bucketFiles()
    val s = spark; import s.implicits._
    val deleted = loader.deleteKeys(spark, id, Seq(500L).toDF("o_orderkey"))
    assert(deleted == 1L)
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit(500L)), lit(nBuckets))).head().getInt(0)
    val after = bucketFiles()
    before.foreach { case (bucket, files) =>
      if (bucket != s"__gbucket=$expectedBucket")
        assert(after(bucket) == files, s"bucket $bucket was rewritten")
    }
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.filter(col("o_orderkey") === 500).isEmpty)
    assert(tgt.count() ==
      orders.filter(col("o_orderkey") <= 1000).count() - 1)
  }

  test("merge-mode load re-suppresses tombstoned keys (forget survives keyed re-sync)") {
    // the GDPR guarantee on exactly the tables the CLI forget verb targets:
    // a keyed CDC re-sync routes through mergeLoad, which UPSERTS the
    // re-delivered rows — the tombstone gate must take them back out
    val root = tmpDir("mforget")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1000), cfg)
    loader.mergeLoad(spark, id, extractor.stagingDir(id), cfg,
      Seq("o_orderkey"), Some(8))
    val s = spark; import s.implicits._
    // 500 is present now; 1100 is tombstoned BEFORE it ever arrives
    loader.deleteKeys(spark, id, Seq(500L, 1100L).toDF("o_orderkey"))
    assert(loader.readTarget(spark, id).get
      .filter(col("o_orderkey") === 500).isEmpty)
    // re-sync delivers 1001..1200 (incl. the tombstoned 1100) via MERGE
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1200), cfg)
    loader.mergeLoad(spark, id, extractor.stagingDir(id), cfg,
      Seq("o_orderkey"), Some(8))
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.filter(col("o_orderkey").isin(500L, 1100L)).isEmpty,
      "merge-mode re-sync resurrected forgotten keys")
    assert(tgt.count() ==
      orders.filter(col("o_orderkey") <= 1200).count() - 2)
    // count-parity counter tracked both the merge and the re-suppression
    assert(store.get(id.scoped).get.redshift_state.total_rows == tgt.count())
  }

  test("deleteKeys prunes by the persisted layout marker, not the caller's count") {
    val root = tmpDir("bforget2")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val nBuckets = 16
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), nBuckets)
    val targetDir = new java.io.File(loader.targetPath(id))
    def bucketFiles(): Map[String, Map[String, (Long, Long)]] =
      targetDir.listFiles().filter(_.getName.startsWith("__gbucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
        }.toMap
    val before = bucketFiles()
    val s = spark; import s.implicits._
    // no caller bucket count exists to get wrong anymore (the pre-marker
    // bug: pmod(hash,64) would pick a bucket the data isn't in, deleting
    // nothing while reporting success) — the persisted marker governs
    val deleted = loader.deleteKeys(spark, id, Seq(500L).toDF("o_orderkey"))
    assert(deleted == 1L, "deletion missed under a mismatched caller bucket count")
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit(500L)), lit(nBuckets))).head().getInt(0)
    val after = bucketFiles()
    before.foreach { case (bucket, files) =>
      if (bucket != s"__gbucket=$expectedBucket")
        assert(after(bucket) == files, s"bucket $bucket was rewritten")
    }
    assert(loader.readTarget(spark, id).get
      .filter(col("o_orderkey") === 500).isEmpty)
  }

  test("deleteKeys by a non-layout column falls back to a full (correct) rewrite") {
    val root = tmpDir("bforget3")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), 8)
    val s = spark; import s.implicits._
    // delete by o_custkey — NOT the bucket layout key; hashing it would
    // prune to wrong buckets, so the path must rewrite every bucket instead
    val victim = orders.filter(col("o_orderkey") <= 1000)
      .select("o_custkey").head().getLong(0)
    val expectGone = orders.filter(col("o_orderkey") <= 1000)
      .filter(col("o_custkey") === victim).count()
    assert(expectGone >= 1)
    val deleted = loader.deleteKeys(spark, id, Seq(victim).toDF("o_custkey"))
    assert(deleted == expectGone,
      "non-layout-key deletion missed rows (wrongly-hashed bucket pruning)")
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.filter(col("o_custkey") === victim).isEmpty)
    assert(tgt.count() ==
      orders.filter(col("o_orderkey") <= 1000).count() - expectGone)
  }

  test("string tombstones persisted before the first load still suppress typed keys") {
    // CLI forget on a never-loaded table has no target schema to cast
    // against: values persist as STRING. The load-time gate must cast them
    // to the increment's native types before comparing.
    val root = tmpDir("sforget")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val s = spark; import s.implicits._
    assert(loader.deleteKeys(spark, id,
      Seq("500", "707").toDF("o_orderkey")) == 0L) // nothing to delete yet
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1000), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.filter(col("o_orderkey").isin(500L, 707L)).isEmpty,
      "string tombstones failed to suppress natively-typed keys")
    // a second forget AFTER the table exists converges the side-table to
    // the target's native types (castKeysLike on both sides of the merge)
    assert(loader.deleteKeys(spark, id, Seq("3").toDF("o_orderkey")) == 1L)
    val tomb = spark.read.parquet(loader.tombstonePath(id))
    assert(tomb.schema("o_orderkey").dataType ==
      tgt.schema("o_orderkey").dataType)
  }

  test("bucketed merge converts a non-bucketed target once, then targets buckets") {
    val root = tmpDir("bmerge2")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    // plain (non-bucketed) load first
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 800), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    // bucketed merge over it: converts layout + applies the upsert
    val staged = orders.filter(col("o_orderkey").between(700, 900))
      .withColumn("o_orderstatus", lit("U"))
    loader.mergeIntoBucketed(spark, id, staged, Seq("o_orderkey"), 8)
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.filter(col("o_orderkey").between(700, 900) &&
      col("o_orderstatus") =!= "U").count() == 0)
    assert(tgt.count() ==
      orders.filter(col("o_orderkey") <= 800 || col("o_orderkey").between(700, 900))
        .count())
    // layout is now bucketed
    val dirs = new java.io.File(loader.targetPath(id)).listFiles()
    assert(dirs.exists(_.getName.startsWith("__gbucket=")))
  }

  test("bucketed merge recovers a bucket whose swap crashed mid-rename") {
    // simulate a crash between rename(cur→.__old_b) and rename(new→cur): the
    // bucket's only copy lives in the dot-prefixed backup. The next merge must
    // RESTORE it — not read zero survivors and destroy the backup.
    val root = tmpDir("bcrash")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val nBuckets = 8
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), nBuckets)
    val expectedTotal = orders.filter(col("o_orderkey") <= 1000).count()
    val bucketOf500 = spark.range(1)
      .select(pmod(hash(lit(500L)), lit(nBuckets))).head().getInt(0)
    // crash simulation: the bucket dir is renamed aside, install never happened
    val tgtDir = new java.io.File(loader.targetPath(id))
    val cur = new java.io.File(tgtDir, s"__gbucket=$bucketOf500")
    val bak = new java.io.File(tgtDir, s".__old_$bucketOf500")
    assert(cur.exists())
    assert(cur.renameTo(bak))
    // re-run the same increment; entry recovery must restore the bucket first
    val staged = orders.filter(col("o_orderkey") === 500)
      .withColumn("o_orderstatus", lit("U"))
    val total = loader.mergeIntoBucketed(spark, id, staged, Seq("o_orderkey"), nBuckets)
    assert(total == expectedTotal, "pre-merge rows of the crashed bucket were lost")
    val tgt = loader.readTarget(spark, id).get
    assert(tgt.count() == expectedTotal)
    assert(tgt.filter(col("o_orderkey") === 500).select("o_orderstatus")
      .head().getString(0) == "U")
    assert(!bak.exists(), "backup dir not cleaned up after recovery")
  }

  test("bucketed merge restores the whole table after a migration-swap crash") {
    // simulate a crash between rename(tgt→.__old) and rename(.__new→tgt):
    // the table exists ONLY in <target>.__old. Without recovery the next run
    // takes the bootstrap branch and replaces the table with staged rows.
    val root = tmpDir("bcrash2")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), 8)
    val expectedTotal = orders.filter(col("o_orderkey") <= 1000).count()
    val tgtDir = new java.io.File(loader.targetPath(id))
    val oldDir = new java.io.File(loader.targetPath(id) + ".__old")
    assert(tgtDir.renameTo(oldDir)) // crash window: tgt absent, backup present
    val staged = orders.filter(col("o_orderkey") === 7)
      .withColumn("o_orderstatus", lit("U"))
    val total = loader.mergeIntoBucketed(spark, id, staged, Seq("o_orderkey"), 8)
    assert(total == expectedTotal, "migration crash recovery lost the table")
    assert(!oldDir.exists())
  }

  test("mergeInto restores the target after a mid-swap crash") {
    val root = tmpDir("mcrash")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    loader.mergeInto(spark, id,
      orders.filter(col("o_orderkey") <= 500), Seq("o_orderkey"))
    val expected = orders.filter(col("o_orderkey") <= 500).count()
    val tgtDir = new java.io.File(loader.targetPath(id))
    val oldDir = new java.io.File(loader.targetPath(id) + ".__old")
    assert(tgtDir.renameTo(oldDir)) // crash between the two swap renames
    val staged = orders.filter(col("o_orderkey") === 3)
      .withColumn("o_orderstatus", lit("U"))
    val rows = loader.mergeInto(spark, id, staged, Seq("o_orderkey"))
    assert(rows == expected, "mid-swap crash recovery lost the target")
    assert(!oldDir.exists())
  }

  test("targetRowCount ignores parquet under hidden recovery dirs") {
    val root = tmpDir("hiddencount")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    loader.mergeInto(spark, id,
      orders.filter(col("o_orderkey") <= 200), Seq("o_orderkey"))
    val n = loader.targetRowCount(spark, id)
    // drop a stray parquet file under a dot-prefixed dir (leftover artifact)
    val tgtDir = new java.io.File(loader.targetPath(id))
    val junk = new java.io.File(tgtDir, ".__old_junk")
    junk.mkdirs()
    val aParquet = tgtDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(aParquet.toPath,
      new java.io.File(junk, aParquet.getName).toPath)
    assert(loader.targetRowCount(spark, id) == n,
      "hidden-dir parquet double-counted by the parity gate")
    // Spark's own read agrees (it skips the same dirs)
    assert(loader.readTarget(spark, id).get.count() == n)
  }

  test("compact: many small files collapse to few, rows byte-identical") {
    val root = tmpDir("compact")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    // accumulate small files: 6 separate single-key increments
    (1 to 6).foreach { i =>
      extractor.extract(spark, id,
        orders.filter(col("o_orderkey") <= i * 100), cfg)
      loader.load(spark, id, extractor.stagingDir(id), cfg)
    }
    val expect = loader.readTarget(spark, id).get
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val filesBefore = new java.io.File(loader.targetPath(id))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 6)
    val (b, a) = loader.compact(spark, id) // default 256 MB → 1 file here
    assert(b == filesBefore && a < b)
    val after = loader.readTarget(spark, id).get
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == expect, "compaction changed the data")
    // idempotent: second run is a no-op
    assert(loader.compact(spark, id) == ((a, a)))
    // and the count-parity gate still agrees
    assert(loader.targetRowCount(spark, id) == expect.size.toLong)
    // compaction holds the table session lock: a concurrent sync's lock
    // refuses it (maintenance never races a live load's directory swaps)
    val token = store.tryLock(id.scoped).get
    intercept[graft.watermark.TableLockedException] {
      loader.compact(spark, id)
    }
    store.unlock(id.scoped, token)
  }

  test("compact preserves a bucketed layout (per-bucket rewrite)") {
    val root = tmpDir("compactb")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    // several bucketed increments → multiple files per bucket
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") <= 500), Seq("o_orderkey"), 4)
    (1 to 3).foreach { i =>
      loader.mergeIntoBucketed(spark, id,
        orders.filter(col("o_orderkey").between(i * 200, i * 200 + 150))
          .withColumn("o_orderstatus", lit(s"U$i")), Seq("o_orderkey"), 4)
    }
    val expect = loader.readTarget(spark, id).get.count()
    val (b, a) = loader.compact(spark, id)
    assert(a <= b)
    val tgtDir = new java.io.File(loader.targetPath(id))
    assert(tgtDir.listFiles().exists(_.getName.startsWith("__gbucket=")),
      "compaction destroyed the bucket layout")
    assert(loader.readTarget(spark, id).get.count() == expect)
    // bucket-targeted merges still work after compaction
    loader.mergeIntoBucketed(spark, id,
      orders.filter(col("o_orderkey") === 42)
        .withColumn("o_orderstatus", lit("Z")), Seq("o_orderkey"), 4)
    assert(loader.readTarget(spark, id).get
      .filter(col("o_orderkey") === 42 && col("o_orderstatus") === "Z")
      .count() == 1)
  }

  test("bucketed load: co-located join has NO shuffle exchange") {
    val root = tmpDir("bucketed")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val custId = TableId("t", "fx", "customer")
    extractor.extract(spark, id, orders, cfg)
    extractor.extract(spark, custId,
      spark.read.parquet(s"$sfDir/customer.parquet"),
      CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("c_custkey")))
    // both tables bucketed 8 ways on the JOIN key = Redshift DISTKEY co-location
    val tOrders = loader.loadBucketed(spark, id,
      extractor.stagingDir(id), distKey = "o_custkey", buckets = 8)
    val tCust = loader.loadBucketed(spark, custId,
      extractor.stagingDir(custId), distKey = "c_custkey", buckets = 8)
    // at fixture scale Spark would rather BROADCAST the small side (and then
    // "no shuffle" proves nothing about bucketing — the planner even reports
    // "Bucketed: false"). Disable broadcast so the planner must co-locate:
    // a sort-merge join over matching buckets with ZERO Exchange is the
    // actual DISTKEY-analog guarantee at warehouse scale.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(tOrders)
        .join(spark.table(tCust),
          col("o_custkey") === col("c_custkey"))
      // correctness
      assert(joined.count() ==
        orders.join(spark.read.parquet(s"$sfDir/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count())
      // unwrap AQE (collect/exists do not descend into AdaptiveSparkPlanExec)
      // and pair the negative with POSITIVE evidence of the bucketed shape
      val plan = (joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("SortMergeJoin"),
        s"join shape unseen:\n${plan.take(2000)}")
      assert(plan.contains("Bucketed: true"),
        s"scan not bucket-aware:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange"), "bucketed join still shuffled:\n" +
        plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partition layouts match the reference's three key shapes") {
    // ref generate_s3_key (s3_manager.py:179-211):
    //   datetime: year=Y/month=MM/day=DD/hour=HH
    //   table:    table=T (flat per-table staging)
    //   hybrid:   year=Y/month=MM/table=T/day=DD/hour=HH
    val hybridCfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("o_orderdate"), idColumn = Some("o_orderkey"))
    def firstLeafDir(start: java.io.File): String = {
      var d = start
      val segs = scala.collection.mutable.ArrayBuffer[String]()
      while (d.isDirectory) {
        val subs = d.listFiles().filter(_.isDirectory)
        if (subs.isEmpty) return segs.mkString("/")
        d = subs.minBy(_.getName)
        segs += d.getName
      }
      segs.mkString("/")
    }
    def extractWith(strategy: PartitionStrategy): String = {
      val root = tmpDir(s"layout_${strategy.getClass.getSimpleName}")
      val store = new WatermarkStore(s"$root/wm")
      val ex = new Extractor(store, s"$root/staging", strategy)
      ex.extract(spark, id, orders.limit(100), hybridCfg)
      firstLeafDir(new java.io.File(s"$root/staging"))
    }
    // the staging ROOT is namespaced by the full safe name (schema-distinct
    // tables must never share an orphan-sweep domain); the reference-parity
    // part is the datetime level ordering + %02d padding below it, and the
    // hybrid layout's mid-path table= level keeps the BARE table name
    val dt = extractWith(PartitionStrategy.Datetime)
    assert(dt.matches(
      "t_fx_orders/session=\\d+/year=\\d{4}/month=\\d{2}/day=\\d{2}/hour=\\d{2}"), dt)
    val hy = extractWith(PartitionStrategy.Hybrid)
    assert(hy.matches(
      "t_fx_orders/session=\\d+/year=\\d{4}/month=\\d{2}/table=orders/day=\\d{2}/hour=\\d{2}"), hy)
    val tb = extractWith(PartitionStrategy.ByTable)
    assert(tb.matches("table=t_fx_orders/session=\\d+"), tb)
  }

  test("datetime layout: year/month/day dirs exist and prune the scan") {
    val root = tmpDir("dtpart")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging",
      PartitionStrategy.Datetime)
    val hybridCfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("o_orderdate"), idColumn = Some("o_orderkey"))
    extractor.extract(spark, id, orders, hybridCfg)
    val staged = spark.read.parquet(extractor.stagingDir(id) + "/session=*")
    assert(staged.columns.contains("year") && staged.columns.contains("month"))
    val all = staged.inputFiles.length
    val pruned = staged.filter(col("year") === 1997)
    assert(pruned.count() ==
      orders.filter(year(col("o_orderdate")) === 1997).count())
    // partition pruning: the filtered plan reads strictly fewer files
    val prunedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
            .map(_.files.size).sum
      }).sum
    assert(prunedFiles < all, s"pruned=$prunedFiles all=$all")
  }
}
