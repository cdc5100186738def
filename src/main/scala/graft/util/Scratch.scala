package graft.util

import org.apache.spark.sql.DataFrame

/** Session-scratch materialization: write a DataFrame to a temp parquet
  * directory ONCE and hand back a plain scan of it.
  *
  * This is the leak-free alternative to `localCheckpoint(true)` for the
  * TERMINAL result of an iterative operator (cluster-label propagation,
  * incremental band indexes): a localCheckpoint's blocks live in the block
  * manager until someone unpersists them, but the operator has no safe
  * unpersist point — its caller consumes the relation lazily, possibly more
  * than once — so every invocation leaked its final checkpoint for the
  * session's lifetime (bench attribution recorded 4 leaked RDDs per
  * incremental-cluster run). A parquet scratch relation has the same
  * read-many / lineage-truncating semantics with ZERO block-manager
  * footprint: columnar-compressed bytes on the scratch filesystem.
  *
  * LIFECYCLE — two tiers, because "cleaned at JVM exit" is not a lifecycle
  * for a long-lived per-sync pipeline session (a daemon that scratch-
  * materializes media hashes every sync would grow disk without bound):
  *
  *  - dirs written INSIDE a pipeline-run scope ([[retain]]/[[release]],
  *    wrapped around `PipelineRunner.sync`) are swept when the LAST active
  *    scope releases — by then every run's relations have been drained
  *    into sinks, so no consumer remains (concurrent syncs defer the sweep
  *    until all finish, since one run's operators must not lose another's
  *    scratch mid-flight);
  *  - dirs written OUTSIDE any scope (ad-hoc operator calls whose returned
  *    DataFrames the caller may hold indefinitely) keep the conservative
  *    JVM-exit lifecycle, with [[registeredBytes]]/[[registeredCount]]
  *    exposing the footprint so a session can see what it is holding.
  *
  * Scratch root: `spark.graft.scratchDir` if set (on a multi-executor
  * cluster this MUST be a shared filesystem all executors reach — the same
  * contract as Spark's own reliable-checkpoint dir), else `java.io.tmpdir`
  * (correct for local[n], where driver and executors share the machine).
  */
object Scratch {

  private final case class Entry(dir: String, bytes: Long)

  private val scopedDirs = new java.util.concurrent.ConcurrentLinkedQueue[Entry]
  private val globalDirs = new java.util.concurrent.ConcurrentLinkedQueue[Entry]
  private val activeScopes = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var hooked = false

  private def ensureHook(): Unit =
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupAll()))
        hooked = true
      }
    }

  /** Enter a pipeline-run scope: scratch written until the matching
    * [[release]] is reclaimed when the last scope ends. */
  def retain(): Unit = { ensureHook(); activeScopes.incrementAndGet(); () }

  /** Leave a pipeline-run scope; when no scope remains active, sweep every
    * scope-tagged scratch dir. Returns bytes reclaimed (0 while other
    * scopes are still running — their operators may still be writing). */
  def release(): Long =
    if (activeScopes.decrementAndGet() <= 0) sweep(scopedDirs) else 0L

  /** Total bytes currently held across BOTH tiers (size accounting for
    * long sessions; sizes are as measured at write time). */
  def registeredBytes: Long = {
    val it = (scopedDirs.iterator().asScala ++ globalDirs.iterator().asScala)
    it.map(_.bytes).sum
  }

  /** Number of live scratch dirs across both tiers. */
  def registeredCount: Int = scopedDirs.size + globalDirs.size

  private implicit class QIt[A](private val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Delete every scratch dir written so far, both tiers (also runs at JVM
    * shutdown). Callers assert no scan of them is still live. */
  def cleanupAll(): Unit = { sweep(scopedDirs); sweep(globalDirs); () }

  private def sweep(
      q: java.util.concurrent.ConcurrentLinkedQueue[Entry]): Long = {
    var reclaimed = 0L
    var e = q.poll()
    while (e != null) {
      try { deleteRecursive(new java.io.File(e.dir)); reclaimed += e.bytes }
      catch { case _: Throwable => () }
      e = q.poll()
    }
    reclaimed
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete()
    ()
  }

  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    else f.length()

  /** Write `df` to a fresh scratch parquet dir and return a plain scan of
    * it. One write job now; every later consumer reads the files (no
    * lineage re-execution, no persisted RDD). `tag` names the dir for
    * debuggability. */
  def materialize(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val dir = s"$root/graft_scratch_${tag}_${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(dir)
    ensureHook()
    // size accounting is best-effort java.io measurement: a non-local
    // scratchDir (shared FS on a real cluster) records 0 bytes, and its
    // dirs are reclaimable only where java.io reaches them — the same
    // local-root assumption the delete path has always made
    val bytes = try dirBytes(new java.io.File(dir)) catch {
      case _: Throwable => 0L
    }
    val entry = Entry(dir, bytes)
    if (activeScopes.get() > 0) scopedDirs.add(entry) else globalDirs.add(entry)
    spark.read.parquet(dir)
  }
}
