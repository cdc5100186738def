package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.watermark.{Watermark, WatermarkStore}

/** Watermark state machine: cumulative counters, blacklist dedup,
  * reset-preserving-files, locking — mirrors the reference's
  * tests/unit/test_simple_watermark_manager.py coverage. */
class WatermarkSpec extends AnyFunSuite with SparkTestBase {

  private val now = "2026-01-01T00:00:00"

  test("default document starts pending with zero counters") {
    val w = Watermark.default("conn:db.t", "hybrid", now)
    assert(w.version == "2.0")
    assert(w.mysql_state.status == "pending")
    assert(w.mysql_state.total_rows == 0)
    assert(w.processed_files.isEmpty)
  }

  test("extract sessions accumulate cumulative counters") {
    val w0 = Watermark.default("t", "hybrid", now)
    val w1 = w0.afterExtractSession(Some("2026-01-01 01:00:00"), Some(100L),
      sessionRows = 500, sessionFiles = 2, now)
    val w2 = w1.afterExtractSession(Some("2026-01-01 02:00:00"), Some(200L),
      sessionRows = 300, sessionFiles = 1, now)
    assert(w2.mysql_state.total_rows == 800)
    assert(w2.mysql_state.last_session_rows == 300)
    assert(w2.mysql_state.s3_files_created == 3)
    assert(w2.mysql_state.last_session_files == 1)
    assert(w2.mysql_state.last_id.contains(200L))
    assert(w2.mysql_state.status == "success")
  }

  test("empty-session cursor falls back to previous cursor") {
    val w0 = Watermark.default("t", "hybrid", now)
      .afterExtractSession(Some("2026-01-01 01:00:00"), Some(100L), 500, 2, now)
    val w1 = w0.afterExtractSession(None, None, 0, 0, now)
    assert(w1.mysql_state.last_timestamp.contains("2026-01-01 01:00:00"))
    assert(w1.mysql_state.last_id.contains(100L))
  }

  test("load session dedups blacklist entries") {
    val w0 = Watermark.default("t", "id_only", now)
    val w1 = w0.afterLoadSession(Seq("f1", "f2"), 100, now)
    val w2 = w1.afterLoadSession(Seq("f2", "f3"), 50, now)
    assert(w2.processed_files == List("f1", "f2", "f3"))
    assert(w2.redshift_state.last_loaded_files == List("f3")) // f2 was stale
    assert(w2.redshift_state.total_rows == 150)
  }

  test("reset preserves the processed-files blacklist") {
    val w = Watermark.default("t", "hybrid", now)
      .afterExtractSession(Some("2026-01-01 01:00:00"), Some(5L), 10, 1, now)
      .afterLoadSession(Seq("f1"), 10, now)
      .resetPreservingFiles(now)
    assert(w.mysql_state.last_timestamp.isEmpty)
    assert(w.mysql_state.last_id.isEmpty)
    assert(w.mysql_state.total_rows == 0)
    assert(w.processed_files == List("f1"))
    assert(w.metadata.manual_override)
  }

  test("failure marking keeps cursor but records error") {
    val w = Watermark.default("t", "hybrid", now)
      .afterExtractSession(Some("2026-01-01 01:00:00"), Some(5L), 10, 1, now)
      .markExtractFailed("boom", now)
    assert(w.mysql_state.status == "failed")
    assert(w.mysql_state.error.contains("boom"))
    assert(w.mysql_state.last_id.contains(5L))
  }

  test("JSON round-trip preserves every field") {
    val w = Watermark.default("conn:db.t", "hybrid", now)
      .afterExtractSession(Some("2026-01-01 01:00:00"), Some(42L), 7, 2, now)
      .afterLoadSession(Seq("s3://b/f1.parquet"), 7, now)
    assert(Watermark.fromJson(Watermark.toJson(w)) == w)
  }

  test("store: getOrCreate → save → get round-trips through the filesystem") {
    val store = new WatermarkStore(tmpDir("wm"))
    val w = store.getOrCreate("conn:db.orders", "hybrid")
    assert(w.mysql_state.status == "pending")
    store.save(w.afterExtractSession(Some("2026-02-02 00:00:00"), Some(9L), 3, 1,
      store.nowString()))
    val back = store.get("conn:db.orders").get
    assert(back.mysql_state.last_id.contains(9L))
    assert(back.mysql_state.total_rows == 3)
  }

  test("store: lock is exclusive and token-checked") {
    val store = new WatermarkStore(tmpDir("lock"))
    val t1 = store.tryLock("t")
    assert(t1.isDefined)
    assert(store.tryLock("t").isEmpty)          // second acquire fails
    assert(!store.unlock("t", "wrong-token"))   // wrong token refused
    assert(store.unlock("t", t1.get))
    assert(store.tryLock("t").isDefined)        // re-acquirable after release
  }

  test("store: stale lock can be broken, fresh lock cannot") {
    val store = new WatermarkStore(tmpDir("stale"))
    assert(store.tryLock("t").isDefined)
    assert(!store.breakStaleLock("t", staleAfterMs = 60000)) // fresh → refused
    assert(store.tryLock("t").isEmpty)                        // still held
    assert(store.breakStaleLock("t", staleAfterMs = -1))      // "stale" → broken
    assert(store.tryLock("t").isDefined)                      // re-acquirable
  }

  test("store: tryLock auto-breaks a lock whose owner stopped heartbeating") {
    // a kill -9'd JVM leaves its lock file behind forever; with a TTL the
    // next scheduled sync recovers on its own instead of failing until an
    // operator intervenes
    val dir = tmpDir("ttl")
    val store = new WatermarkStore(dir, staleLockTtlMs = 200)
    assert(store.tryLock("t").isDefined)
    assert(store.tryLock("t").isEmpty)     // fresh → refused
    // age the lock file past the TTL (simulates a dead owner: no heartbeat)
    val lockFile = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".lock")).get
    assert(lockFile.setLastModified(System.currentTimeMillis() - 10000))
    assert(store.tryLock("t").isDefined, "abandoned lock not auto-broken")
  }

  test("store: a token-matched beat keeps an aged lock fresh, a foreign " +
    "beat does not (object-store setTimes-no-op path)") {
    val dir = tmpDir("beat")
    val store = new WatermarkStore(dir, staleLockTtlMs = 200)
    val token = store.tryLock("t").get
    val lockFile = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".lock")).get
    // object-store analog: the lock mtime NEVER refreshes (S3A setTimes is
    // a no-op) — age it out, but plant the owner's beat file exactly as
    // the heartbeat writes it
    assert(lockFile.setLastModified(System.currentTimeMillis() - 10000))
    val beat = new java.io.File(lockFile.getParentFile,
      "." + lockFile.getName + ".hb")
    java.nio.file.Files.writeString(beat.toPath, token)
    assert(store.tryLock("t").isEmpty,
      "live lock stolen despite a fresh owner beat")
    // a beat carrying a DIFFERENT token (previous holder's leftover, or a
    // zombie heartbeat) must not keep a dead lock alive
    java.nio.file.Files.writeString(beat.toPath, "zombie-token")
    assert(store.tryLock("t").isDefined,
      "foreign beat kept an abandoned lock unbreakable")
  }

  test("store: heartbeat keeps a LIVE session's lock from aging out") {
    val dir = tmpDir("hb")
    val store = new WatermarkStore(dir, staleLockTtlMs = 400)
    val other = new WatermarkStore(dir, staleLockTtlMs = 400)
    @volatile var refusedDuring = true
    store.withTableLock("t") {
      // hold well past the TTL; the heartbeat (TTL/4) must keep mtime fresh
      val deadline = System.currentTimeMillis() + 1200
      while (System.currentTimeMillis() < deadline) {
        if (other.tryLock("t").isDefined) refusedDuring = false
        Thread.sleep(100)
      }
    }
    assert(refusedDuring, "a live (heartbeating) session's lock was stolen")
    assert(other.tryLock("t").isDefined) // released after the session
  }

  test("watermark-count CLI verb: set → get → status round-trip") {
    val work = tmpDir("wmcount")
    val yml = java.nio.file.Paths.get(tmpDir("wmcountcfg"), "p.yml")
    java.nio.file.Files.writeString(yml,
      s"""pipeline:
         |  name: "wmcount"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.region:
         |    cdc_strategy: "full_sync"
         |""".stripMargin)
    def cli(args: String*): Int =
      graft.Cli.run((args ++ Seq("-c", yml.toString, "--work-dir", work)).toArray)
    // sync through the CLI so the warehouse + watermark exist
    assert(cli("sync") == 0)
    val n = spark.read.parquet(s"$sfDir/region.parquet").count()
    // get returns the loaded count; status agrees with the warehouse footprint
    assert(cli("watermark-count", "get", "-t", "fx.region") == 0)
    assert(cli("watermark-count", "status", "-t", "fx.region") == 0)
    // an external correction is visible in get and breaks parity in status
    assert(cli("watermark-count", "set", "-t", "fx.region", "--count",
      (n + 7).toString) == 0)
    assert(cli("watermark-count", "status", "-t", "fx.region") == 1)
    // correcting back restores parity
    assert(cli("watermark-count", "set", "-t", "fx.region", "--count",
      n.toString) == 0)
    assert(cli("watermark-count", "status", "-t", "fx.region") == 0)
    // -t is mandatory; set requires --count
    assert(cli("watermark-count", "get") == 2)
    assert(cli("watermark-count", "set", "-t", "fx.region") == 2)
  }

  test("store: reset persists and preserves blacklist AND cumulative counter") {
    val store = new WatermarkStore(tmpDir("reset"))
    val w = store.getOrCreate("t", "hybrid")
    store.save(w.afterLoadSession(Seq("fileA"), 5, store.nowString()))
    val r = store.reset("t").get
    assert(r.processed_files == List("fileA"))
    assert(store.get("t").get.mysql_state.last_id.isEmpty)
    // the blacklisted file's rows are still IN the warehouse — zeroing the
    // counter would fail the count-parity gate on every later sync
    assert(r.redshift_state.total_rows == 5)
  }

  test("store: concurrent stale-lock breakers — exactly one wins") {
    // the delete-then-create race: breaker B must never delete the lock
    // breaker A just created. The rename-to-tombstone break makes the race
    // single-winner; everyone else sees the table as locked.
    val dir = tmpDir("race")
    val store = new WatermarkStore(dir, staleLockTtlMs = 200)
    assert(store.tryLock("t").isDefined)
    val lockFile = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".lock")).get
    assert(lockFile.setLastModified(System.currentTimeMillis() - 10000))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val tokens = try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] = { gate.await(); store.tryLock("t") }
        })
      }
      gate.countDown()
      futures.map(_.get())
    } finally pool.shutdown()
    assert(tokens.count(_.isDefined) == 1,
      s"${tokens.count(_.isDefined)} breakers acquired the same lock")
    // the winner's lock is live: nobody else can take it
    assert(store.tryLock("t").isEmpty)
  }

  test("store: names that sanitize identically get DISTINCT documents") {
    // 'a.b_c' and 'a_b.c' both flatten to a_b_c — without disambiguation
    // they'd share one watermark: one table's blacklist would suppress the
    // other's loads with no error surfaced
    val store = new WatermarkStore(tmpDir("collide"))
    val w1 = store.getOrCreate("conn:a.b_c", "hybrid")
    store.save(w1.afterLoadSession(Seq("f1"), 5, store.nowString()))
    val w2 = store.getOrCreate("conn:a_b.c", "hybrid")
    assert(w2.processed_files.isEmpty,
      "distinct tables are sharing one watermark document")
    assert(store.get("conn:a.b_c").get.processed_files == List("f1"))
  }
}
