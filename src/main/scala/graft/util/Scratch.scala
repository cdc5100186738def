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
  *  - dirs written under an EXPLICIT run scope ([[retain]] returns a
  *    [[Scope]] token; [[release]] pops and sweeps it) are reclaimed when
  *    THAT scope releases — by then the run's relations have been drained
  *    into sinks, so no consumer remains. Scope membership is carried on
  *    the writing THREAD (a per-thread scope stack), and a run that fans
  *    out to worker threads tags them in with [[Scope.enter]]/[[Scope.exit]]
  *    — so a concurrent AD-HOC caller on some other thread can never have
  *    its scratch tagged into a sync's scope and deleted under it (the
  *    former process-global counter did exactly that), and two concurrent
  *    syncs sweep their own dirs without racing each other's (each scope
  *    owns its queue; the former shared queue let an in-flight sweep drain
  *    a newer scope's freshly-added dirs);
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

  /** A pipeline-run scratch scope: every [[materialize]] on a thread whose
    * scope stack has this on top tags its dir here; [[release]] sweeps it.
    * Worker threads of the same run tag themselves in with [[enter]] and
    * out with [[exit]] (no sweep — only the owning [[release]] sweeps). */
  final class Scope private[Scratch] () {
    private[Scratch] val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Entry]
    // set by release() BEFORE its sweep: a straggler worker (cancelled but
    // still running after sync returned) that materializes afterwards must
    // not tag into a dead scope's queue that no sweep will ever visit —
    // closed scopes route new writes to the JVM-exit tier instead
    @volatile private[Scratch] var closed = false
    def enter(): Unit = { stack.get().push(Scope.this); () }
    def exit(): Unit = {
      val st = stack.get()
      if (!st.isEmpty && (st.peek() eq Scope.this)) { st.pop(); () }
    }
  }

  private val stack = new ThreadLocal[java.util.ArrayDeque[Scope]] {
    override def initialValue(): java.util.ArrayDeque[Scope] =
      new java.util.ArrayDeque[Scope]()
  }
  private val liveScopes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Scope]()
  // released scopes whose queue may still receive racing straggler writes —
  // swept by cleanupAll/the shutdown hook, dropped once verifiably empty
  private val deadScopes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Scope]()
  private val globalDirs = new java.util.concurrent.ConcurrentLinkedQueue[Entry]
  @volatile private var hooked = false

  private def ensureHook(): Unit =
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupAll()))
        hooked = true
      }
    }

  /** Enter a pipeline-run scope on THIS thread: scratch written until the
    * matching [[release]] (on this thread, or on worker threads tagged in
    * via [[Scope.enter]]) is reclaimed when the scope releases. Scopes
    * nest per thread — a nested retain/release pair sweeps only its own
    * dirs. */
  def retain(): Scope = {
    ensureHook()
    val sc = new Scope
    liveScopes.add(sc)
    stack.get().push(sc)
    sc
  }

  /** Leave this thread's innermost scope and sweep ITS dirs (other scopes
    * — concurrent syncs — are untouched). Returns bytes reclaimed; 0 when
    * no scope is active on this thread. */
  def release(): Long = {
    val st = stack.get()
    if (st.isEmpty) 0L
    else {
      val sc = st.pop()
      sc.closed = true // before the sweep: late writers re-route to global
      liveScopes.remove(sc)
      // the scope stays in the graveyard PERMANENTLY (a Scope is a few
      // dozen bytes, bounded by syncs-per-JVM): removing it when its queue
      // looks empty races the straggler's closed-check-then-add, and a
      // late entry in an unregistered queue would never be swept — the
      // shutdown hook's cleanupAll drains whatever raced in
      deadScopes.add(sc)
      sweep(sc.dirs)
    }
  }

  /** The scope the CURRENT thread would tag writes into, if any — a
    * fan-out runner captures this before submitting worker tasks and
    * brackets each task with [[Scope.enter]]/[[Scope.exit]]. */
  def currentScope: Option[Scope] = Option(stack.get().peek())

  /** Total bytes currently held across live scopes and the global tier
    * (size accounting for long sessions; sizes as measured at write
    * time). */
  def registeredBytes: Long = {
    val scoped = liveScopes.iterator().asScala
      .flatMap(_.dirs.iterator().asScala).map(_.bytes).sum
    scoped + globalDirs.iterator().asScala.map(_.bytes).sum
  }

  /** Number of live scratch dirs across all tiers. */
  def registeredCount: Int =
    liveScopes.iterator().asScala.map(_.dirs.size).sum + globalDirs.size

  private implicit class QIt[A](private val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Delete every scratch dir written so far, all tiers (also runs at JVM
    * shutdown). Callers assert no scan of them is still live. */
  def cleanupAll(): Unit = {
    liveScopes.iterator().asScala.foreach(sc => sweep(sc.dirs))
    deadScopes.iterator().asScala.foreach(sc => sweep(sc.dirs))
    sweep(globalDirs)
    ()
  }

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

  /** Size-aware scratch file count. None = keep the producer's
    * partitioning (stats unknown or large — at 100 TB the many-file write
    * IS the right behavior). Otherwise a single smooth ramp:
    * `clamp(stats/256KB, 4, max(cores, stats/4MB+1))` — 4 files up to
    * ~1 MB, then one file per ~256 KB until the session's cores, then flat
    * at cores up to the cutoff. The former two-tier rule (<256 KB → 4
    * files, else floor at cores) had a CLIFF at 256 KB: a 255 KB relation
    * wrote 4 files but a 257 KB one wrote cores-many ~8 KB files,
    * re-introducing for just-over-tiny relations exactly the cores×refs
    * band-pipeline scan overhead the 4-file tier exists to avoid (measured
    * 0.9 → 3.6 s on the steady audio near-dup family for that shape). The
    * ramp agrees with both old regimes at their interiors (1 MB → 4;
    * ≥8 MB at 32 cores → cores) and is monotone in between.
    *
    * Cutoff 24 MB (round 15; was 128 MB): the compaction is a FULL
    * EXCHANGE of the relation's bytes, and past a few hundred KB per core
    * it buys nothing — the producer's own partitioning already lands near
    * the ramp's target (a cores-parallel producer writes cores files), and
    * consumers of a multi-MB relation get adequate split parallelism from
    * Spark's openCost/maxPartitionBytes sizing regardless of file count.
    * Measured at the 100× bench point: every band-index materialization
    * (60-120 MB shuffle-compressed) paid its own bytes through the
    * repartition exchange just to arrive at the SAME cores-many file
    * count, ~10 task-s per index build. Relations in the 24-128 MB stats
    * band now keep the producer layout like >128 MB ones always did. */
  private[graft] def fileCount(statsBytes: BigInt, cores: Int): Option[Int] = {
    val unknown = statsBytes >=
      org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes
    if (unknown || statsBytes > (24L << 20)) None
    else {
      val ramp = statsBytes / (256L << 10)
      val ceil = BigInt(cores).max(statsBytes / (4L << 20) + 1)
      Some(ramp.min(ceil).max(4).toInt)
    }
  }

  /** Write `df` to a fresh scratch parquet dir and return a plain scan of
    * it. One write job now; every later consumer reads the files (no
    * lineage re-execution, no persisted RDD). `tag` names the dir for
    * debuggability.
    *
    * `compact = false` (round 15) skips the size-aware repartition
    * unconditionally — for CORPUS-SCALE relations (band indexes, signature
    * projections) whose producer partitioning is the input scan's splits:
    * that layout already scales with the data at every size, while the
    * optimizer's size ESTIMATE for an exploded projection routinely
    * undershoots the 24 MB engage threshold and the "compaction" then
    * pays a full exchange of the relation's real bytes to arrive at the
    * same cores-many file count (measured at the 100× bench point: every
    * band-index materialization shuffled its own 60-120 MB through the
    * repartition, ~10-15 task-s per index build, for an identical file
    * layout). Callers that KNOW the relation scales with the corpus pass
    * false; output-unknown relations (candidate sets, class tables) keep
    * the default stats-driven ramp. */
  def materialize(df: DataFrame, tag: String,
                  compact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val dir = s"$root/graft_scratch_${tag}_${java.util.UUID.randomUUID()}"
    // SIZE-AWARE file count: a plain write emits one file per input
    // partition regardless of bytes, so a small relation computed from a
    // many-partition source (a 64-file table at bench sf, a wide scan on a
    // real cluster) scatters into dozens of KB-sized files — the classic
    // small-files anti-pattern (per-file open/footer cost on every later
    // consumer; object-store request amplification at scale). When plan
    // statistics say the OUTPUT is small, shuffle it down to ~32 MB/file
    // (stats are routinely 2-5× the parquet bytes, so the real files land
    // near row-group size); unknown or large stats keep the producer's
    // partitioning — at 100 TB the many-file write IS the right behavior.
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // engage only when the whole output is small — the extra shuffle is
    // noise at that size, and probing the producer's partition count would
    // force a second round of physical planning ([[fileCount]] picks the
    // target; None keeps the producer's layout).
    // repartition, not coalesce: the producer is often the CPU-dense part
    // (an index build, a profile aggregation) and coalesce would cap its
    // compute parallelism; the shuffle moves only the small output. The
    // file count matters BOTH ways: for small files Spark's split sizing
    // hands out ~one task per file (maxSplitBytes = max(openCost,
    // totalBytes/cores)), so scratch files ARE the consumers' map/build-
    // probe parallelism — a 1-file scratch pinned a 17-exec-s pairwise-
    // verify stage to 2 tasks (12.8 s wall of a 14 s query) — while band
    // pipelines reference a scratch relation ~bands× per plan, so a
    // few-hundred-row relation in cores-many files pays cores×refs scan
    // tasks of pure overhead (measured: 0.9 → 3.6 s on the steady audio
    // near-dup family). Bytes pick the file count on a smooth ramp
    // (see [[fileCount]]).
    // Unconditional when stats are known (no current-partition probe: a
    // .rdd call here cost a full extra analysis/optimization pass per
    // materialize, and the fold/band operators materialize repeatedly).
    val out =
      if (!compact) df
      else fileCount(stats, spark.sparkContext.defaultParallelism)
        .fold(df)(df.repartition(_))
    out.write.mode("overwrite").parquet(dir)
    ensureHook()
    // size accounting is best-effort java.io measurement: a non-local
    // scratchDir (shared FS on a real cluster) records 0 bytes, and its
    // dirs are reclaimable only where java.io reaches them — the same
    // local-root assumption the delete path has always made
    val bytes = try dirBytes(new java.io.File(dir)) catch {
      case _: Throwable => 0L
    }
    val entry = Entry(dir, bytes)
    currentScope match {
      // a straggler worker whose scope already released (cancel that
      // failed to stop the task promptly) must not write into a dead
      // queue — route to the JVM-exit tier; the residue of the unavoidable
      // check-then-add race stays findable via the deadScopes graveyard
      case Some(sc) if !sc.closed => sc.dirs.add(entry)
      case _ => globalDirs.add(entry)
    }
    spark.read.parquet(dir)
  }
}
