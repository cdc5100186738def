package graft.watermark

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Thrown when a sync/extract/load session is refused because another session
  * holds the table's lock (ref simple_watermark_manager.py:408-463: every
  * backup session locks its table). */
final class TableLockedException(table: String)
  extends IllegalStateException(
    s"table '$table' is locked by another sync session " +
      "(break a stale lock with the CLI 'unlock' verb)")

/** Hadoop-FS-backed watermark store: works identically over local FS, HDFS, or
  * S3A, so the same code path serves `local[*]` tests and a real cluster.
  *
  * Mirrors the reference's S3-persisted store
  * (src/core/simple_watermark_manager.py): key scoping
  * `{source}_{table}_{target}` (:551-574), lock objects with owner identity
  * (:408-463), save retries (:501-549).
  *
  * Scale note: the watermark is driver-side metadata (KBs per table) — it never
  * touches executors, so this component is size-independent of the data volume.
  *
  * `staleLockTtlMs`: locks whose file mtime is older than this are considered
  * abandoned (crashed JVM, kill -9, OOM) and auto-broken by the next
  * [[tryLock]] — one crash never turns into an indefinite pipeline outage.
  * Live sessions are protected regardless of duration: [[withTableLock]]
  * heartbeats the lock mtime at TTL/4, so only a truly dead owner's lock ages
  * out. Set ≤0 to disable auto-break (manual `unlock` only).
  */
class WatermarkStore(rootDir: String,
                     hadoopConf: Configuration = new Configuration(),
                     staleLockTtlMs: Long = 60L * 60 * 1000) {

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Key scoping like the reference: one doc per (table, target), named by
    * THE shared sanitize convention ([[graft.model.Names.taggedSanitize]] —
    * the same rule as `TableId.safeName`, so watermark docs and data dirs
    * can never disagree on how `a.b_c` vs `a_b.c` disambiguate). */
  private[watermark] def docPath(tableName: String, target: String): Path =
    new Path(rootDir,
      graft.model.Names.taggedSanitize(tableName + "_" + target) + ".json")

  private def lockPath(tableName: String, target: String): Path =
    new Path(docPath(tableName, target).toString + ".lock")

  private def now(): String =
    java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))

  /** Get existing watermark or create the default (ref :91-118). */
  def getOrCreate(tableName: String, cdcStrategy: String,
                  target: String = "default"): Watermark = {
    val p = docPath(tableName, target)
    val f = fs(p)
    if (f.exists(p)) read(p)
    else {
      val w = Watermark.default(tableName, cdcStrategy, now())
      save(w, target)
      w
    }
  }

  def get(tableName: String, target: String = "default"): Option[Watermark] = {
    val p = docPath(tableName, target)
    if (fs(p).exists(p)) Some(read(p)) else None
  }

  private def read(p: Path): Watermark = {
    val in = fs(p).open(p)
    try Watermark.fromJson(new String(in.readAllBytes(), StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Atomic save: write temp, then a single overwriting rename via
    * FileContext (atomic on local/HDFS — no delete-then-rename window where
    * a crash leaves NO watermark; retried ×3 with backoff like ref :501-549).
    * On S3A, rename is copy+delete — there the tmp file plus retry loop is
    * the same protection the reference's S3 PUT had. */
  def save(w: Watermark, target: String = "default"): Unit = {
    val p = docPath(w.table_name, target)
    val f = fs(p)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < 3) {
      val tmp = new Path(p.toString + s".tmp${System.nanoTime()}")
      try {
        val out = f.create(tmp, true)
        try out.write(Watermark.toJson(w).getBytes(StandardCharsets.UTF_8))
        finally out.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          p.toUri, hadoopConf)
        fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        return
      } catch {
        // NonFatal ONLY: an interrupt (session shutdown) or a VM error
        // must abort the save, not burn retries; and each failed
        // attempt's uniquely-named tmp must not be left to accumulate
        case e if scala.util.control.NonFatal(e) =>
          lastErr = e; attempt += 1
          try f.delete(tmp, false)
          catch { case t if scala.util.control.NonFatal(t) => () }
          if (attempt < 3) Thread.sleep(50L << attempt)
      }
    }
    throw new java.io.IOException(s"watermark save failed after 3 attempts", lastErr)
  }

  /** Manual cursor set (ref :364-385). */
  def setManual(tableName: String, lastTs: Option[String], lastId: Option[Long],
                target: String = "default"): Watermark = {
    val w = get(tableName, target).getOrElse(
      Watermark.default(tableName, "hybrid", now()))
    val updated = w.copy(
      mysql_state = w.mysql_state.copy(last_timestamp = lastTs, last_id = lastId,
        last_updated = Some(now())),
      metadata = w.metadata.copy(manual_override = true))
    save(updated, target)
    updated
  }

  /** Set an EXTERNALLY-verified target row count (ref watermark-count CLI,
    * src/cli/main.py:1959-2204): ops can correct the cumulative loaded-rows
    * counter from an authoritative warehouse COUNT(*) so the parity gate
    * tracks reality after manual interventions. */
  def setExternalCount(tableName: String, count: Long,
                       target: String = "default"): Watermark = {
    val w = get(tableName, target).getOrElse(
      Watermark.default(tableName, "hybrid", now()))
    val updated = w.copy(
      redshift_state = w.redshift_state.copy(total_rows = count,
        last_updated = Some(now())),
      metadata = w.metadata.copy(manual_override = true))
    save(updated, target)
    updated
  }

  /** Reset cursor, preserving blacklist (ref :387-406). */
  def reset(tableName: String, target: String = "default"): Option[Watermark] =
    get(tableName, target).map { w =>
      val r = w.resetPreservingFiles(now())
      save(r, target)
      r
    }

  /** Acquire an exclusive per-table lock (uuid+pid+host owner identity like
    * ref :408-463). Returns a token to release with, or None if already held.
    * A lock left behind by a dead owner (mtime older than `staleLockTtlMs`,
    * i.e. no heartbeat for a full TTL) is auto-broken and re-acquired. */
  /** The held lock's heartbeat SIDE FILE. `setTimes` is a silent no-op on
    * object stores (S3A inherits `FileSystem`'s empty default), so a live
    * session's lock mtime never refreshes there and a long sync would get
    * auto-broken — the exact double-run the heartbeat exists to prevent.
    * Overwriting a small beat file is a fresh object PUT on every store,
    * so ITS mtime is the activity signal that works everywhere. */
  private def beatPath(p: Path): Path =
    new Path(p.getParent, s".${p.getName}.hb")

  /** ms since the lock's last observable activity: the lock's own mtime
    * or its CURRENT owner's beat file — counted only when the beat
    * content matches the lock's token, so a previous holder's leftover
    * beat (or a zombie heartbeat of a dead session) can never keep a
    * foreign lock fresh. None if the lock vanished. */
  private def lockAgeMs(f: org.apache.hadoop.fs.FileSystem,
                        p: Path): Option[Long] = {
    val lockSt = try Some(f.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    lockSt.map { st =>
      val hb = beatPath(p)
      val beatMs = try {
        val bs = f.getFileStatus(hb)
        val beatTok = readSmall(f, hb)
        val lockContent = readSmall(f, p)
        if (beatTok.nonEmpty && lockContent.contains(beatTok))
          bs.getModificationTime
        else 0L
      } catch {
        case _: java.io.FileNotFoundException => 0L
        case e if scala.util.control.NonFatal(e) => 0L
      }
      System.currentTimeMillis() - math.max(st.getModificationTime, beatMs)
    }
  }

  private def readSmall(f: org.apache.hadoop.fs.FileSystem,
                        p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def tryLock(tableName: String, target: String = "default"): Option[String] = {
    val p = lockPath(tableName, target)
    val f = fs(p)
    if (f.exists(p)) {
      // age from mtime OR the owner's beat file (object stores never
      // refresh the lock mtime; see beatPath). Vanished between exists
      // and stat: someone else just released or broke it — contended,
      // let the caller retry.
      val age = lockAgeMs(f, p).getOrElse(return None)
      if (staleLockTtlMs <= 0 || age <= staleLockTtlMs) return None
      // Abandoned (owner stopped heartbeating a full TTL ago) — break it
      // under the single-winner breaker-marker protocol (shared with the
      // CLI unlock verb; see [[breakUnderMarker]]).
      if (!breakUnderMarker(f, p, staleLockTtlMs)) return None
    }
    val token = java.util.UUID.randomUUID().toString
    val owner =
      s"""{"uuid":"$token","pid":${ProcessHandle.current().pid()},"hostname":"${java.net.InetAddress.getLocalHost.getHostName}","acquired_at":"${now()}"}"""
    if (createExclusive(f, p, owner)) Some(token) else None
  }

  /** Create `p` with `content` iff it does not exist — the single-winner
    * primitive both lock acquisition and lock-breaking rest on. */
  private def createExclusive(f: org.apache.hadoop.fs.FileSystem, p: Path,
                              content: String): Boolean = {
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // Hadoop's LOCAL create(path, overwrite=false) is exists-check-then-
      // create — two racers can both "succeed" (and read-back verification
      // can't catch serialized overwrites). O_EXCL via NIO is the real
      // single-winner primitive on a local/NFS path.
      try {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local,
          content.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else try {
      // HDFS create(overwrite=false) IS atomic; S3A is last-writer-wins
      // (documented limitation — pair with short TTLs there)
      val out = f.create(p, false)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  /** Breaking a stale lock must be SINGLE-WINNER and must never hit a lock
    * another breaker just recreated: a plain stat-then-delete lets breaker
    * B stat the stale file, sleep through A's break+reacquire, and then
    * destroy A's FRESH lock. So every break — tryLock's auto-break AND the
    * CLI unlock verb — runs under an exclusive breaker MARKER: only the
    * marker owner may delete, and only after re-verifying staleness under
    * the marker. A marker left by a crashed breaker expires after
    * max(ttl, 1s) and is cleared by the next caller. Returns true iff THIS
    * caller deleted the lock. */
  private def breakUnderMarker(f: org.apache.hadoop.fs.FileSystem, p: Path,
                               ttlMs: Long): Boolean = {
    val marker = new Path(p.getParent, s".${p.getName}.breaking")
    val markerTtl = math.max(ttlMs, 1000L)
    if (f.exists(marker)) {
      val (mAge, mMtime) = try {
        val st = f.getFileStatus(marker)
        (System.currentTimeMillis() - st.getModificationTime,
          st.getModificationTime)
      } catch { case _: java.io.FileNotFoundException => return false }
      if (mAge > markerTtl) {
        // delete ONLY the expired instance we observed: re-stat and
        // match the mtime, so a FRESH marker another breaker created
        // in the meantime is never the victim (the TTL re-verification
        // under the marker covers the remaining microsecond window)
        val still = try Some(f.getFileStatus(marker).getModificationTime)
          catch { case _: java.io.FileNotFoundException => None }
        if (still.contains(mMtime)) f.delete(marker, false)
      }
      return false // a break is (or was) in flight — contended, retry later
    }
    if (!createExclusive(f, marker, "{}")) return false
    try {
      // fresh again (recreated or late heartbeat) — not ours to break
      val age2 = lockAgeMs(f, p).getOrElse(return false)
      if (age2 <= ttlMs) return false
      f.delete(p, false)
      f.delete(beatPath(p), false) // the dead owner's beat goes with it
      true
    } finally f.delete(marker, false)
  }

  /** Break a lock whose holder is gone: deletes the lock object if it is
    * older than `staleAfterMs` (ref: manual lock cleanup via CLI; the owner
    * identity in the lock JSON makes the decision auditable). Runs the same
    * breaker-marker protocol as tryLock's auto-break, so an ops unlock can
    * never race a concurrent auto-break into deleting a freshly recreated
    * lock. Returns true if a lock was broken. */
  def breakStaleLock(tableName: String, staleAfterMs: Long,
                     target: String = "default"): Boolean = {
    val p = lockPath(tableName, target)
    val f = fs(p)
    if (!f.exists(p)) return false
    val age = lockAgeMs(f, p).getOrElse(return false)
    if (age > staleAfterMs) breakUnderMarker(f, p, staleAfterMs) else false
  }

  /** Locks held by the CURRENT THREAD through [[withTableLock]] — makes the
    * lock reentrant along one session's call chain (runner → extractor →
    * loader all lock the same table on one thread) while still refusing a
    * concurrent session on another thread or process. */
  private val heldByThread = ThreadLocal.withInitial[scala.collection.mutable.Map[String, String]](
    () => scala.collection.mutable.Map.empty[String, String])

  /** Run `body` holding the table's exclusive lock; refuse with
    * [[TableLockedException]] if another session holds it. Reentrant per
    * thread: nested sections on the same thread share the outer acquisition
    * (the outermost frame releases). This is the ENFORCEMENT point the
    * reference applies to every backup session (:408-463) — without it two
    * concurrent syncs of one table interleave watermark saves silently. */
  def withTableLock[A](tableName: String, target: String = "default")(body: => A): A = {
    val key = lockPath(tableName, target).toString
    val held = heldByThread.get()
    if (held.contains(key)) body
    else {
      val token = tryLock(tableName, target)
        .getOrElse(throw new TableLockedException(tableName))
      held += key -> token
      val hb = startHeartbeat(lockPath(tableName, target), token)
      try body
      finally {
        hb.interrupt()
        // JOIN the heartbeat before releasing: a beat write already past
        // its interrupt check would otherwise recreate the .hb file AFTER
        // unlock deleted it, orphaning one beat file per lock path forever
        // (token matching keeps it correctness-safe, but it accumulates).
        // Bounded wait — a beat blocked on a hung FS call must not turn
        // release into a hang; unlock's beat delete still wins that race
        // on the next acquisition (tryLock token-matches).
        try hb.join(2000) catch { case _: InterruptedException =>
          Thread.currentThread().interrupt() }
        held -= key
        unlock(tableName, token, target)
      }
    }
  }

  /** Daemon thread refreshing the held lock's liveness at TTL/4 so a LIVE
    * session — however long it runs — never looks stale to [[tryLock]]'s
    * auto-break or the CLI's `unlock --stale-minutes`. Each beat touches
    * the lock mtime (works on HDFS/local) AND overwrites the token-bearing
    * beat file (works on object stores where `setTimes` is a no-op; see
    * [[beatPath]]/[[lockAgeMs]]). */
  private def startHeartbeat(p: Path, token: String): Thread = {
    val interval = if (staleLockTtlMs > 0) staleLockTtlMs / 4 else Long.MaxValue
    val t = new Thread(() => {
      var running = true
      while (running && !Thread.currentThread().isInterrupted) {
        try {
          Thread.sleep(interval)
          // a transient FS error (S3A throttle, momentary NN failover) must
          // not kill the beat — a dead heartbeat makes a LIVE session's lock
          // age out and get auto-broken, which is the exact double-sync this
          // thread exists to prevent. Skip the tick and try again.
          try {
            val f = fs(p)
            if (f.exists(p)) {
              val nowMs = System.currentTimeMillis()
              try f.setTimes(p, nowMs, nowMs)
              catch { case e if scala.util.control.NonFatal(e) => () }
              val out = f.create(beatPath(p), true)
              try out.write(token.getBytes(StandardCharsets.UTF_8))
              finally out.close()
            }
          } catch {
            // Hadoop surfaces interrupts on blocked IO as IOExceptions —
            // letting NonFatal swallow one would consume the interrupt and
            // leave a ZOMBIE beat keeping future locks at this path
            // eternally fresh. Any interrupt signal terminates the loop.
            case _: java.io.InterruptedIOException => running = false
            case _: java.nio.channels.ClosedByInterruptException =>
              running = false
            case e if scala.util.control.NonFatal(e) =>
              if (Thread.currentThread().isInterrupted) running = false
          }
        } catch { case _: InterruptedException => running = false }
      }
    }, s"graft-lock-heartbeat-${p.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  def unlock(tableName: String, token: String, target: String = "default"): Boolean = {
    val p = lockPath(tableName, target)
    val f = fs(p)
    if (!f.exists(p)) return false
    val content = readSmall(f, p)
    if (content.contains(token)) {
      f.delete(beatPath(p), false) // our beat goes with our lock
      f.delete(p, false)
    } else false
  }

  def nowString(): String = now()
}
