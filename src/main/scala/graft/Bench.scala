package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Per-run stage-metric attribution (executor run/cpu/GC time, spill,
    * tasks) — the signal that separates "the plan got slower" from "the
    * session got noisier" (GC/codegen pressure from ~200 queries × 2 runs
    * in one JVM) and "the machine got noisier" (run time ≫ cpu time = tasks
    * descheduled by outside load). Counters are cumulative; callers snapshot
    * around a run after draining the listener bus. */
  private final class StageAcc extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      runMs.addAndGet(m.executorRunTime)
      cpuNs.addAndGet(m.executorCpuTime)
      gcMs.addAndGet(m.jvmGCTime)
      spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
      ()
    }
    def snapshot: (Long, Long, Long, Long, Long) =
      (runMs.get, cpuNs.get, gcMs.get, spill.get, tasks.get)
  }

  /** Process-level JVM counters (GC beans, JIT compiler bean, heap) — the
    * round-11 divergence (one family burning 6-24× the CPU of an identical
    * run, 119 gc-s vs 1.6 on the same 163 tasks) could not be adjudicated
    * because the artifact recorded stage metrics but nothing about the JVM
    * that produced them. Stage jvmGCTime only counts GC attributed to task
    * threads; these beans see EVERY collection and every JIT compile, so an
    * interpreted-fallback or GC-thrash run now names itself in the artifact. */
  private[graft] def procCounters: (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val gcs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    (gcs.map(_.getCollectionCount).sum, gcs.map(_.getCollectionTime).sum,
      if (jit != null && jit.isCompilationTimeMonitoringSupported)
        jit.getTotalCompilationTime else -1L)
  }

  /** Host-wide busy CPU (user+nice+system+irq+softirq+steal jiffies from
    * /proc/stat's aggregate line) and THIS process's CPU time. Their delta
    * over a timed run is the foreign-CPU detector: host_busy ≫ proc_cpu
    * means another process was burning the machine during the measurement —
    * the r11 driver-vs-builder divergence signature (cpu_sec and gc_sec
    * inflated 6-24× by co-located load thrashing caches and starving GC
    * threads) becomes a number in the artifact instead of a forensic
    * dispute. Jiffies are USER_HZ = 100 on every mainstream Linux.
    * Interpretation caveat: kernel threads (writeback/flush kworkers
    * draining THIS process's dirty pages, e.g. streaming-checkpoint fsync
    * storms) are not attributable to a pid and land in foreign_cpu_sec —
    * a write-heavy query showing moderate foreign CPU may be paying its
    * own I/O; sustained foreign CPU across READ-only queries is the real
    * co-located-load signature. */
  private[graft] def hostBusyJiffies: Long = hostStatJiffies._1

  private[graft] def procCpuNs: Long =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Busy and steal jiffies from ONE /proc/stat parse (the two deltas must
    * come from the same read or they can disagree by a jiffy; and timeOne
    * snapshots both at t0 and t1 — one parse, not two). Steal (aggregate
    * field 8) is already counted inside the busy sum; it is stamped
    * separately because steal is the one /proc-visible signature of a
    * CO-TENANT VM — the r12 contention window ran with foreign_cpu ≈ 0
    * (the thief was outside this kernel's view), and steal is the only
    * aggregate-line field that CAN see cross-VM displacement when the
    * hypervisor reports it. (-1, -1) = unreadable. */
  private[graft] def hostStatJiffies: (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().collectFirst {
        case l if l.startsWith("cpu ") =>
          val f = l.trim.split("\\s+").drop(1).map(_.toLong)
          // user nice system idle iowait irq softirq steal guest gnice →
          // busy = all except idle(3), iowait(4), and guest(8)/gnice(9) —
          // the kernel already folds guest time into user/nice, so
          // counting those fields would double-book any VM's CPU and flag
          // a clean run as load-contaminated
          val busy = f.zipWithIndex.collect {
            case (v, i) if i != 3 && i != 4 && i < 8 => v
          }.sum
          (busy, if (f.length > 7) f(7) else -1L)
      }.getOrElse((-1L, -1L))
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => (-1L, -1L) }

  private[graft] def stealJiffies: Long = hostStatJiffies._2

  /** This process's own cgroup path: v2 `0::<path>` preferred, else the
    * v1 line whose controller list includes `cpu`. The throttle/quota
    * readers below must resolve THIS path — a fixed root-level read is
    * silently blind on hosts without a private cgroup namespace (systemd
    * slices, K8s pods sharing the host ns), where the root cpu.stat has
    * no throttled_usec line while the pod's own cgroup accumulates it. */
  private[graft] def cgroupSelfPath: Option[(Boolean, String)] =
    try {
      val src = scala.io.Source.fromFile("/proc/self/cgroup")
      try {
        val lines = src.getLines().toList
        lines.collectFirst { case l if l.startsWith("0::") =>
          (true, l.stripPrefix("0::"))
        }.orElse(lines.collectFirst {
          case l if l.count(_ == ':') >= 2 &&
            l.split(":")(1).split(",").contains("cpu") =>
            (false, l.split(":", 3)(2))
        })
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def cgroupGrab(path: String, key: String,
                         div: Long): Option[Long] =
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().collectFirst {
        case l if l.startsWith(key + " ") => l.split("\\s+")(1).toLong / div
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Cgroup CPU-throttle time in usec (v2 `cpu.stat` throttled_usec, v1
    * `cpu.stat` throttled_time ns), read from THIS process's cgroup with
    * the root as fallback (a private cgroup namespace reports self as
    * `/`, which lands on the root path — the two cases converge).
    * -1 = no cgroup view / unreadable. */
  private[graft] def cgroupThrottledUsec: Long = {
    val self = cgroupSelfPath
    val v2Self = self.collect { case (true, p) =>
      s"/sys/fs/cgroup${if (p == "/") "" else p}/cpu.stat" }
    val v1Self = self.collect { case (false, p) =>
      s"/sys/fs/cgroup/cpu${if (p == "/") "" else p}/cpu.stat" }
    v2Self.flatMap(cgroupGrab(_, "throttled_usec", 1L))
      .orElse(v1Self.flatMap(cgroupGrab(_, "throttled_time", 1000L)))
      .orElse(cgroupGrab("/sys/fs/cgroup/cpu.stat", "throttled_usec", 1L))
      .orElse(cgroupGrab("/sys/fs/cgroup/cpu/cpu.stat", "throttled_time", 1000L))
      .getOrElse(-1L)
  }

  /** The cgroup v2 CPU quota line for THIS process's cgroup, verbatim
    * ("max 100000" = unthrottled), root fallback, for the env stamp. */
  private[graft] def cgroupCpuMax: String = {
    def read(path: String): Option[String] =
      try {
        val src = scala.io.Source.fromFile(path)
        try src.getLines().nextOption()
        finally src.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    cgroupSelfPath.collect { case (true, p) =>
      s"/sys/fs/cgroup${if (p == "/") "" else p}/cpu.max" }
      .flatMap(read)
      .orElse(read("/sys/fs/cgroup/cpu.max"))
      .getOrElse("absent")
  }

  /** Minimal JSON string escaper for values interpolated into the bench
    * artifact (conf values, env vars, java.version, dir paths): a stray
    * quote or backslash in any of them must not make target/bench.json —
    * the machine-adjudicable artifact — unparseable. */
  private[graft] def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** In-band calibration microprobe (round-13 gate): the r12 driver ran a
    * 40-query contiguous window at 2.3-9.2× with task cpu_sec ITSELF
    * inflated while foreign_cpu_sec ≈ 0 and load_suspect false everywhere —
    * the contention source (co-tenant VM / bandwidth thief) was invisible
    * to this kernel's /proc/stat, so no jiffy accounting can ever certify a
    * row. This probe doesn't try to SEE the thief; it measures what the
    * thief TAKES: a fixed, deterministic unit of work timed immediately
    * before every timed query. Two axes, because the r12 signature was
    * memory-bandwidth/LLC shaped:
    *  - single-thread rolling hash over a fixed 64 MB buffer (streams
    *    memory through one core: sensitive to LLC/bandwidth theft AND to
    *    core displacement) → calib_st_mops (million elements/sec);
    *  - all-cores parallel sum over the same buffer in disjoint slices
    *    (aggregate DRAM bandwidth: the axis task-CPU inflation lives on)
    *    → calib_mt_gbps.
    * Fixed WORK, not fixed time, so values are comparable across rows; a
    * row whose probe drops >1.5× below the run's median carries
    * calib_suspect=true in the artifact no matter where the contention
    * lives. ~100 ms/probe total, paid OUTSIDE the timed window. */
  private[graft] object Calib {
    /** stMops/mtGbps are the MAX over the sample's sub-windows (the
      * "was baseline capacity available in this moment" question the
      * suspect flag asks); stMin/mtMin stamp the MIN of the same
      * sub-windows (round-14 ask 1b) so sustained theft (every window
      * depressed: min ≈ max, both low) is distinguishable post-hoc from
      * intermittent theft (max clean, min cratered) — the r13
      * span_stats-10× escape was an episode flavor the max alone could
      * not see. The flag still fires on the max axes only; the mins are
      * evidence, not a gate. -1 = unavailable. */
    final case class Sample(stMops: Double, mtGbps: Double,
                            stMin: Double = -1.0, mtMin: Double = -1.0) {
      def json: String =
        f"""{"st_mops":$stMops%.1f,"mt_gbps":$mtGbps%.2f,""" +
          f""""st_min":$stMin%.1f,"mt_min":$mtMin%.2f}"""
    }
    private val N = 8 << 20 // 8M longs = 64 MB, larger than any LLC here
    private lazy val buf: Array[Long] = {
      val a = new Array[Long](N)
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < N) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        a(i) = x; i += 1
      }
      a
    }
    // sink defeats dead-code elimination of the probe loops
    @volatile private var sink = 0L

    private def stPass(passes: Int): Double = {
      val b = buf
      var h = 0xcbf29ce484222325L
      val t0 = System.nanoTime()
      var p = 0
      while (p < passes) {
        var i = 0
        while (i < N) { h = (h ^ b(i)) * 0x100000001b3L; i += 1 }
        p += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      sink = h
      (N.toDouble * passes) / sec / 1e6
    }

    // shared daemon pool: creating cores-many threads per probe added
    // multi-ms scheduling jitter to a ~15 ms measurement window
    private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, Runtime.getRuntime.availableProcessors),
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })

    private def mtPass(passes: Int): Double = {
      val b = buf
      val n = math.max(1, Runtime.getRuntime.availableProcessors)
      val chunk = N / n
      val acc = new java.util.concurrent.atomic.AtomicLong
      import scala.jdk.CollectionConverters._
      val tasks: java.util.List[java.util.concurrent.Callable[Unit]] =
        (0 until n).map { k =>
          new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              var s = 0L
              var p = 0
              val end = if (k == n - 1) N else (k + 1) * chunk
              while (p < passes) {
                var i = k * chunk
                while (i < end) { s += b(i); i += 1 }
                p += 1
              }
              acc.addAndGet(s); ()
            }
          }: java.util.concurrent.Callable[Unit]
        }.asJava
      val t0 = System.nanoTime()
      pool.invokeAll(tasks).asScala.foreach(_.get())
      val sec = (System.nanoTime() - t0) / 1e9
      sink = acc.get
      (N.toLong * 8L * passes) / sec / 1e9
    }

    /** One calibration sample: ~60 ms ST + ~50 ms MT on a quiet host,
      * each axis the MAX over short sub-windows. Max-of-k asks the right
      * question — was baseline compute/bandwidth AVAILABLE in this
      * moment? — and filters the two measured quiet-host failure modes
      * that a single window cannot dodge: a GC pause landing inside the
      * ST loop (observed 0.51× single-window dips) and a descheduled
      * worker in a sub-quantum MT pass (observed mt p5 at 0.55-0.58× of
      * median across two quiet 208-query runs, 24-35 falsely flagged
      * rows). Genuine sustained theft — the r12 episode spanned 40
      * consecutive queries, minutes of wall — depresses every sub-window
      * and still flags. First call pays the lazy 64 MB buffer fill (and
      * JIT of the probe loops) — callers run [[warm]] once before any
      * timed section. */
    def sample(): Sample =
      try {
        val st = (1 to 2).map(_ => stPass(2))
        val mt = (1 to 6).map(_ => mtPass(16))
        Sample(st.max, mt.max, st.min, mt.min)
      }
      catch { case scala.util.control.NonFatal(_) => Sample(-1.0, -1.0) }

    def warm(): Unit = { sample(); sample(); () }

    /** Median of the run's samples per axis (NaN-free; -1 failures
      * excluded). Robust to a contaminated minority: the r12 window was
      * 40 of 208 rows. */
    def medians(all: Seq[Sample]): (Double, Double) = {
      def med(v: Seq[Double]): Double =
        if (v.isEmpty) -1.0
        else { val s = v.sorted; s(s.size / 2) }
      (med(all.map(_.stMops).filter(_ > 0)),
        med(all.map(_.mtGbps).filter(_ > 0)))
    }

    /** >1.5× probe DROP vs the run's median on either axis = the host was
      * not delivering this process its baseline compute/bandwidth during
      * the window this sample fronted. Unavailable probe/median → not
      * flaggable (false), the -1 fields say why. */
    def suspect(s: Sample, medSt: Double, medMt: Double): Boolean =
      (s.stMops > 0 && medSt > 0 && s.stMops < medSt / 1.5) ||
        (s.mtGbps > 0 && medMt > 0 && s.mtGbps < medMt / 1.5)

    /** Axis-wise WORSE of the two probes bracketing a timed run; either
      * side unavailable poisons the axis to the -1 sentinel. One
      * definition — the per-query rows and the extract headline must
      * never compute their brackets under different rules. The min
      * stamps combine the same way (worst sub-window seen on either
      * side of the bracket). */
    def combine(pre: Sample, post: Sample): Sample = Sample(
      if (pre.stMops < 0 || post.stMops < 0) -1.0
      else math.min(pre.stMops, post.stMops),
      if (pre.mtGbps < 0 || post.mtGbps < 0) -1.0
      else math.min(pre.mtGbps, post.mtGbps),
      if (pre.stMin < 0 || post.stMin < 0) -1.0
      else math.min(pre.stMin, post.stMin),
      if (pre.mtMin < 0 || post.mtMin < 0) -1.0
      else math.min(pre.mtMin, post.mtMin))

    /** How contaminated was this run's window, conservatively: the LOWER
      * of the two axes relative to the run's median (a bandwidth-only
      * thief — the r12 signature — craters MT while leaving ST intact, so
      * a single-axis comparison would keep the contaminated run). Axes
      * with no probe or no median don't vote; no usable axis → +∞ (not
      * comparable — callers tie-break on wall time). */
    def score(s: Sample, medSt: Double, medMt: Double): Double = {
      val st = if (s.stMops > 0 && medSt > 0) s.stMops / medSt
               else Double.PositiveInfinity
      val mt = if (s.mtGbps > 0 && medMt > 0) s.mtGbps / medMt
               else Double.PositiveInfinity
      math.min(st, mt)
    }
  }

  /** Self-relative CPU deviation signal (round-14 gate). The one r13
    * certification escape — q_dedup_span_stats 10× at 16.9 s vs the
    * committed 1.8 s, task-CPU inflated 12× on IDENTICAL 163 tasks —
    * carried calibration-CLEAN probes (0.83-0.86× median): the episode's
    * flavor hit Spark's task threads without depressing a 60 ms probe
    * bracket, so no host-level signal could flag it. This signal needs no
    * host view at all: the untimed warmup run executes the IDENTICAL plan
    * on the identical data seconds before the timed run, so its task
    * cpu_sec is a contention-free in-session reference. A timed run whose
    * task CPU exceeds the warmup's by >1.5× at EQUAL task count burned
    * cycles the plan does not require — cache/bandwidth theft made every
    * task's work more expensive. Equal task count is required (a
    * different task layout means a different plan and the comparison is
    * meaningless — AQE re-plans invalidate it, and the stamped warmup
    * values let a judge adjudicate those rows by hand); a 0.5 cpu-s floor
    * keeps scheduler jitter on tiny runs from flagging. The flag also
    * requires the WALL time to exceed the reference run's: the flag
    * certifies the wall headline, and task-CPU drift with a flat wall is
    * the JVM's own long-session profile decay (deopt/recompile of shared
    * codegen classes — the first full run under this signal showed 4 of
    * 208 steady rows at 1.6-4× the cold pass's CPU with every wall BELOW
    * its reference), which a 32-thread local soak absorbs without
    * corrupting the number being certified. A contention episode inflates
    * both axes (the r13 escape: wall 9.3×, cpu 12×) and still flags. */
  private[graft] def cpuSuspect(warmSec: Double, warmCpuSec: Double,
                                warmTasks: Long, wallSec: Double,
                                a: Attrib): Boolean =
    warmTasks > 0 && a.tasks == warmTasks && warmCpuSec >= 0.5 &&
      a.cpuSec > 1.5 * warmCpuSec && warmSec > 0 && wallSec > warmSec

  /** After a retry, keep the run whose probe was closer to the run's
    * baseline on its WORSE axis (an MT-only thief — the r12 signature —
    * craters bandwidth while leaving the ST axis intact, so a single-axis
    * comparison would keep the contaminated run). An INFINITE score on
    * either side means that run's calibration is not comparable (probe
    * failed or no median yet) — fall back to the wall-time rule rather
    * than letting +∞ "win" the score comparison and enshrine an
    * unmeasured run over a well-calibrated one. */
  private[graft] def firstBetterCalibrated(
      s1: Double, c1: Calib.Sample, s2: Double, c2: Calib.Sample,
      medSt: Double, medMt: Double): Boolean = {
    val (k1, k2) = (Calib.score(c1, medSt, medMt), Calib.score(c2, medSt, medMt))
    s1 >= 0 && (s2 < 0 ||
      (if (k1.isInfinite || k2.isInfinite || k1 == k2) s1 <= s2 else k1 > k2))
  }

  /** Cheap arithmetic impossibility guard at artifact-write time (round-14
    * ask 1c): the scale fixtures are supersets along the document-copy
    * axis (8 → 30 → 80 copies of the same base corpus), so a query's
    * headline at a LOWER copy count running LONGER than its own headline
    * at a HIGHER one in the same session is physically impossible for the
    * engine — it is proof of an environmental episode even when every
    * probe read clean (the r13 span_stats case: 10× at 16.9 s vs 100× at
    * 6.9 s, derived by hand then; stamped in-band now). Takes
    * (sectionTag, docCopies, rows as name→headline-sec) per section;
    * returns the (sectionTag, query) pairs whose LOWER-scale row exceeds
    * any higher-scale row of the same query by >10% — the margin keeps a
    * constant-overhead-dominated pair that lands within run noise (two
    * ~2.8 s rows at a tiny sf flipping by 1-2%) from stamping a coin
    * flip as an impossibility, while real episodes (2.4-9× in r12/r13)
    * clear it by an order of magnitude. Failed rows (sec < 0) never
    * vote. */
  private[graft] def scaleInconsistent(
      sections: Seq[(String, Int, Seq[(String, Double)])])
      : Set[(String, String)] =
    (for {
      (loTag, loCopies, loRows) <- sections
      (hiTag, hiCopies, hiRows) <- sections
      if loCopies < hiCopies && hiTag != loTag
      hiMap = hiRows.filter(_._2 > 0).toMap
      (name, loSec) <- loRows
      if loSec > 0 && hiMap.get(name).exists(loSec > 1.1 * _)
    } yield (loTag, name)).toSet

  /** Bounded wait for the JIT compile queue to settle. Under co-located
    * host load the warmup passes enqueue compilations faster than starved
    * compiler threads drain them, and a timed run that starts with a deep
    * queue executes its hottest codegen'd loops INTERPRETED — measured on
    * q_dedup_span_stats 10×: jit_sec 335 (loaded) vs 3.8 (quiet) across
    * the same timed window, wall 72 s vs 2.2. Quiesced = compilation time
    * advanced < 50 ms over a 500 ms window; give up after maxWaitMs (a
    * loaded host may never settle — the artifact's jit_sec still tells). */
  private def awaitJitQuiesce(maxWaitMs: Long = 5000): Unit = {
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    if (jit == null || !jit.isCompilationTimeMonitoringSupported) return
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var prev = jit.getTotalCompilationTime
    while (System.nanoTime() < deadline) {
      Thread.sleep(500)
      val now = jit.getTotalCompilationTime
      if (now - prev < 50) return
      prev = now
    }
  }

  private[graft] def memAvailableMb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong / 1024 }.getOrElse(-1L)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }

  private[graft] def codeCacheUsedMb: Long =
    try {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
    } catch { case scala.util.control.NonFatal(_) => -1L }

  final case class Attrib(execSec: Double, cpuSec: Double, gcSec: Double,
                          spillMb: Double, tasks: Long, leakedRdds: Int,
                          procGcSec: Double = 0.0, procGcCount: Long = 0,
                          jitSec: Double = 0.0, hostBusySec: Double = -1.0,
                          procCpuSec: Double = -1.0, stealSec: Double = -1.0,
                          cgThrottledSec: Double = -1.0) {
    /** CPU burned by OTHER processes during this run (negative = counters
      * unavailable). A value rivaling proc_cpu_sec marks the run as
      * load-contaminated no matter what the wall clock says. */
    def foreignCpuSec: Double =
      if (hostBusySec < 0 || procCpuSec < 0) -1.0
      else math.max(0.0, hostBusySec - procCpuSec)
    /** Wall/cpu-divergence self-evidence: task run time far above task CPU
      * time (minus GC, which is honest JVM cost) means the tasks sat
      * blocked or descheduled. Read it ROUND-OVER-ROUND: a flag that flips
      * on for a previously-clean query = machine-load contamination (the
      * round-8 dispute — 73.9s driver wall vs 4.4s judge clean-room on the
      * same commit — would have carried this flag in the artifact itself);
      * a flag that is STABLE across rounds = operator-internal blocking.
      * Tiny runs are never flagged (wall ≥ 2s gate applied by callers). */
    def loadSuspect: Boolean =
      cpuSec > 0 && (execSec - gcSec) > 2.5 * cpuSec
    def json: String =
      f"""{"exec_sec":$execSec%.3f,"cpu_sec":$cpuSec%.3f,"gc_sec":$gcSec%.3f,""" +
        f""""spill_mb":$spillMb%.1f,"tasks":$tasks,"leaked_rdds":$leakedRdds,""" +
        f""""proc_gc_sec":$procGcSec%.3f,"jit_sec":$jitSec%.3f,""" +
        f""""steal_sec":$stealSec%.3f,"cg_throttled_sec":$cgThrottledSec%.3f,""" +
        f""""foreign_cpu_sec":$foreignCpuSec%.3f}"""
    def jsonWith(wallSec: Double): String =
      f"""{"sec":$wallSec%.3f,"exec_sec":$execSec%.3f,"cpu_sec":$cpuSec%.3f,""" +
        f""""gc_sec":$gcSec%.3f,"spill_mb":$spillMb%.1f,"tasks":$tasks,""" +
        f""""leaked_rdds":$leakedRdds,"proc_gc_sec":$procGcSec%.3f,""" +
        f""""proc_gc_count":$procGcCount,"jit_sec":$jitSec%.3f,""" +
        f""""host_busy_sec":$hostBusySec%.3f,"proc_cpu_sec":$procCpuSec%.3f,""" +
        f""""steal_sec":$stealSec%.3f,"cg_throttled_sec":$cgThrottledSec%.3f,""" +
        f""""foreign_cpu_sec":$foreignCpuSec%.3f,""" +
        f""""load_suspect":${wallSec >= 2.0 && loadSuspect}}"""
  }

  def main(args: Array[String]): Unit = {
    // the f-interpolator formats through the DEFAULT locale: under a
    // de_DE/fr_FR host locale every %.3f renders "0,123" and both JSON
    // artifacts become unparseable. Pin ROOT before any formatting.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // isolation mode: SPARK_GRAFT_BENCH_ONLY=q_a,q_b runs just those
    // queries in this (fresh) JVM — the clean-room cross-check for any
    // in-session number that looks interference-shaped. Filters the scale
    // sections too (so a single scale point can be isolation-rerun).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // ---- WALL-CLOCK BUDGET — the round-10 failure mode was a bench the
    // driver killed mid-30×-section (rc=124, parsed:null): nothing inside
    // the run bounded its own wall time, sections ran scale-first, and the
    // kill landed before the steady section (which runs last) or any
    // artifact write. Three defenses, all self-describing in the artifact:
    //  1. a total budget (SPARK_GRAFT_BENCH_BUDGET_S, default 1800 s —
    //     safely under the driver cap that killed r10 somewhere past
    //     2312 s): scale sections stop starting work once the budget minus
    //     a steady-section reserve is spent, each skip recorded in
    //     sections_skipped;
    //  2. target/bench.json is rewritten AFTER EVERY SECTION, so even a
    //     kill leaves a parseable artifact with everything that finished;
    //  3. any scale query whose first timed run exceeds
    //     SPARK_GRAFT_BENCH_SLOW_S (60 s) gets ONE timed run — JIT noise is
    //     irrelevant at that magnitude, and the second run of a 200 s query
    //     was exactly what starved round 10.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1800").toDouble
    // reserve for the steady section + extract (r10 committed artifact:
    // 166 s steady + 213 s cold + extract ≈ 450 s; reserve adds headroom)
    val steadyReserveS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STEADY_RESERVE_S", "700").toDouble
    val slowSingleRunS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_S", "60").toDouble
    val benchT0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchT0) / 1e9
    def scaleBudgetLeft: Double = (budgetS - steadyReserveS) - elapsedS
    val skipped = scala.collection.mutable.ArrayBuffer[String]()

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)

    // ---- environment stamp (round-12 ask 1a): everything cheap that could
    // explain a cross-run divergence rides the artifact — resolved JVM heap
    // (build.sbt defaults -Xmx${SPARK_DRIVER_MEM:-8g} and nothing else
    // records what actually applied), the half-dozen perf-relevant confs,
    // host memory at start, JDK, and the parquet LAYOUT of the steady
    // inputs (a 1-row-group table scans as ONE task no matter the split
    // size — the r11 q2 regression was exactly a reprovisioned testdata
    // collapsing row groups, invisible in the artifact).
    val memAvailStart = memAvailableMb
    val envJson = {
      val rt = Runtime.getRuntime
      def c(k: String): String =
        try spark.conf.get(k)
        catch { case scala.util.control.NonFatal(_) => "unset" }
      val confKeys = Seq("spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.files.maxPartitionBytes", "spark.sql.adaptive.enabled",
        "spark.sql.codegen.wholeStage", "spark.memory.fraction",
        "spark.sql.parquet.compression.codec")
      // every interpolated string routes through jstr: a conf value or env
      // var carrying a quote/backslash must not break the artifact's parse
      val confJson = confKeys.map(k => s""""${jstr(k)}":"${jstr(c(k))}"""")
        .mkString("{", ",", "}")
      s"""{"jvm_max_heap_mb":${rt.maxMemory / (1024 * 1024)},""" +
        s""""spark_driver_mem_env":"${jstr(sys.env.getOrElse(
          "SPARK_DRIVER_MEM", "unset(build.sbt default 8g)"))}",""" +
        s""""host_cores":${rt.availableProcessors},"local_threads":$cpus,""" +
        s""""java_version":"${jstr(sys.props.getOrElse("java.version", "?"))}",""" +
        s""""cgroup_cpu_max":"${jstr(cgroupCpuMax)}",""" +
        s""""mem_available_mb_start":$memAvailStart,"confs":$confJson}"""
    }
    // steady-input parquet layout: files / row groups / bytes per table,
    // footer metadata only (zero jobs). One row group = one scan task.
    val steadyInputsJson = {
      val conf = spark.sparkContext.hadoopConfiguration
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").flatMap { t =>
        try {
          val p = new java.io.File(s"$sfDir/$t.parquet")
          val files =
            if (p.isDirectory)
              p.listFiles().filter(f => f.getName.endsWith(".parquet")).toSeq
            else Seq(p)
          val bytes = files.map(_.length).sum
          val rgs = files.map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRowGroups.size finally r.close()
          }.sum
          Some(s""""$t":{"files":${files.size},"row_groups":$rgs,""" +
            s""""bytes":$bytes}""")
        } catch { case scala.util.control.NonFatal(_) => None }
      }.mkString("{", ",", "}")
    }
    // per-scale-section provenance, filled as sections run: fixture cache
    // hit/miss + size, host MemAvailable and code-cache use at section start
    val sectionEnv = scala.collection.mutable.LinkedHashMap[String, String]()
    def recordSectionEnv(section: String, dir: String, prov: String): Unit = {
      val (files, bytes) =
        try {
          val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          try {
            val counted = fs.filter(p =>
              java.nio.file.Files.isRegularFile(p) &&
                !java.nio.file.Files.isSymbolicLink(p))
              .mapToLong(p => java.nio.file.Files.size(p)).toArray
            (counted.length, counted.sum)
          } finally fs.close()
        } catch { case scala.util.control.NonFatal(_) => (-1, -1L) }
      sectionEnv(section) =
        s"""{"fixture":"$prov","fixture_files":$files,""" +
          s""""fixture_bytes":$bytes,"mem_available_mb":$memAvailableMb,""" +
          s""""code_cache_used_mb":$codeCacheUsedMb}"""
    }
    // untimed warmup: pay parquet-driver + codegen init before the clock
    // starts so the run-order-first query isn't charged for it
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case scala.util.control.NonFatal(_) => () }
    // pay the calibration buffer fill + probe-loop JIT before any probe
    // whose value rides the artifact
    Calib.warm()
    // every probe taken this run, for the median the suspect flag compares
    // against (computed at artifact-write time, so early writes use the
    // median-so-far and the final write uses the full run's)
    val calibSamples = scala.collection.mutable.ArrayBuffer[Calib.Sample]()

    // Inter-query hygiene: unpersist everything between runs — each run
    // rebuilds its own plan, so only garbage goes — and REPORT what leaked
    // so the leaking operator is visible, not just its victims. Since
    // round 9 every operator materializes terminal intermediates to
    // parquet scratch instead of checkpoints, so any nonzero count here is
    // a regression (the artifact's leak_gate flags it).
    def sweepLeaked(): Int = {
      val leaked = spark.sparkContext.getPersistentRDDs
      leaked.values.foreach(_.unpersist(blocking = false))
      leaked.size
    }

    // Failed queries report NEGATIVE elapsed time so they are visible in
    // BENCH json (a swallowed failure must not look like a fast pass).
    // Every timed run is BRACKETED by calibration probes (both outside the
    // timed window and outside the counter snapshots, so probe CPU never
    // pollutes the host/proc deltas); the row's stamped calib is the
    // WORSE axis-wise of the two — a pre-probe alone reads clean when an
    // episode starts mid-query (measured: a 2.06× row with a clean
    // pre-probe during the bracketing validation run, and r12's episode
    // decayed mid-query), while the bracket bounds the run on both sides.
    def timeOne(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String = sfDir)
        : (Double, Attrib, Calib.Sample) = {
      val pre = Calib.sample()
      calibSamples += pre
      org.apache.spark.sql.GraftShim.waitListenerBus(spark)
      val (r0, c0, g0, s0, t0n) = acc.snapshot
      val (pgc0, pgt0, pjt0) = procCounters
      // busy+steal from ONE /proc/stat parse per snapshot (the deltas
      // must be mutually consistent, and the second read is pure waste)
      val (hb0, st0) = hostStatJiffies
      val pc0 = procCpuNs
      val cg0 = cgroupThrottledUsec
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShim.waitListenerBus(spark)
      val (r1, c1, g1, s1, t1n) = acc.snapshot
      val (pgc1, pgt1, pjt1) = procCounters
      val (hb1, st1) = hostStatJiffies
      val pc1 = procCpuNs
      val cg1 = cgroupThrottledUsec
      val leaked = sweepLeaked()
      val post = Calib.sample()
      calibSamples += post
      val calib = Calib.combine(pre, post)
      val attrib = Attrib((r1 - r0) / 1e3, (c1 - c0) / 1e9, (g1 - g0) / 1e3,
        (s1 - s0) / 1e6, t1n - t0n, leaked,
        procGcSec = (pgt1 - pgt0) / 1e3, procGcCount = pgc1 - pgc0,
        jitSec = if (pjt0 < 0) -1.0 else (pjt1 - pjt0) / 1e3,
        hostBusySec = if (hb0 < 0 || hb1 < 0) -1.0 else (hb1 - hb0) / 100.0,
        procCpuSec = if (pc0 < 0 || pc1 < 0) -1.0 else (pc1 - pc0) / 1e9,
        stealSec = if (st0 < 0 || st1 < 0) -1.0 else (st1 - st0) / 100.0,
        cgThrottledSec =
          if (cg0 < 0 || cg1 < 0) -1.0 else (cg1 - cg0) / 1e6)
      (if (ok) sec else -sec, attrib, calib)
    }

    def extractRps(dir: String, tag: String, runs: Int): Double =
      try {
        (1 to runs).map { _ =>
          val scratch = java.nio.file.Files
            .createTempDirectory(s"graft_bench_$tag").toString
          val store = new graft.watermark.WatermarkStore(s"$scratch/wm")
          val extractor = new graft.extract.Extractor(store, s"$scratch/staging")
          val cfg = graft.model.CdcConfig(graft.model.CdcStrategyKind.IdOnly,
            idColumn = Some("l_orderkey"))
          extractor.extract(spark, graft.model.TableId(tag, "fixtures", "lineitem"),
            spark.read.parquet(s"$dir/lineitem.parquet"), cfg)
            .metrics.rowsPerSec
        }.max
      } catch { case e: Throwable =>
        System.err.println(s"[bench] extract ($tag) FAILED: ${e.getMessage}")
        -1.0
      }

    // ---- SCALE SECTIONS RUN FIRST — before 193×2 steady executions heat
    // the JVM (fragmented heap, codegen cache pressure, accumulated driver
    // state made round-7/8 scale numbers disagree across runs). Each scale
    // query still gets one untimed warm run for codegen, then timed runs
    // WITH full attribution: a wall/cpu divergence flags itself in the
    // artifact (load_suspect) instead of needing a judge clean-room rerun.
    // The budget + per-section artifact writes (above) keep a slow section
    // from starving the steady section the way round 10's did.

    // second scale point: ~10× locally. documents ×8 with a per-copy Caesar
    // SUBSTITUTION on the text: each copy keeps the original's internal
    // near-dup structure (pairs/clusters scale by exactly 8×) while copies
    // stay mutually non-duplicate — the row-scaled workload, not a
    // quadratic cross-copy pair explosion. lineitem ×10 with shifted keys
    // feeds the extract path; events ×10 with shifted (event_id, user_id)
    // gives 10× independent users (sessions are per-user, so the session
    // workload scales linearly). A query is scale-healthy when its 10×
    // time stays within ~linear of its sf time. The set covers the dedup
    // family AND the top-steady plans (cluster-incremental fold, session
    // self-join, BPE encode, image near-dup).
    val scaleQueries = Seq("q_dedup_span_stats", "q_dedup_cluster_drop",
      "q_split_by_cluster", "q_dedup_minhash_neardup", "q_dedup_minhash_edges",
      "q_dedup_lines_global",
      "q_zorder_layout", "q_crossmodal_dedup", "q_mixture_rebalance",
      "q_kn_logprob", "q_dsir_select", "q_curriculum_shards",
      "q_dedup_cluster_incremental", "q_session_overlap", "q_bpe_encode",
      "q_mm_image_neardup")
      .filter(n => only.forall(_.contains(n)))
    val scaleCheck = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "1") != "0"

    def alphaShifted(i: Int): (String, String) = {
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      (alpha, alpha.drop(i % 26) + alpha.take(i % 26))
    }
    // affine char permutation j → (a·j + b) mod 26 for copy i: 12 units ×
    // 26 offsets = 312 distinct permutations (Caesar is the a=1 slice), so
    // a ~100× corpus still has mutually non-duplicate copies; two affine
    // maps agree on ≤2 letters, which no 3-token shingle survives.
    def alphaAffine(i: Int): (String, String) = {
      val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      val (a, b) = (units((i / 26) % units.size), i % 26)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      (alpha, (0 until 26).map(j => alpha((a * j + b) % 26)).mkString)
    }

    /** Synthesized scale fixtures are CACHED by their parameters (and the
      * source sf dir) under the system temp dir: regenerating the ~100×
      * documents union on every bench invocation cost minutes of the
      * round-10 budget for bytes that are a pure function of the inputs. A
      * marker file commits a completed build; a partial dir (kill mid-
      * synthesis) has no marker and is rebuilt from scratch. The key
      * carries a synthesis-code VERSION: bump it whenever the synthesis
      * below changes shape, or a cached dir from an older binary would
      * silently serve the old bytes to the new bench. */
    val fixtureSynthVersion = 2 // v2: repartition(2*cpus) fixture layout

    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    // sweep crashed builds: a kill before the locked publish leaves a
    // '<key>.build_<pid>' dir behind forever (each run only deletes its
    // OWN pid's tmp), so crashed builds accumulate multi-GB residue.
    // Reclaim any sibling whose pid is no longer alive. Shared by the
    // scale-fixture and steady-amortization builders — a steady-only or
    // filtered invocation must sweep too.
    def sweepDeadBuilds(root: java.nio.file.Path): Unit =
      try Option(root.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
        val n = f.getName
        val i = n.lastIndexOf(".build_")
        if (i > 0) {
          val alive = scala.util.Try(n.substring(i + 7).toLong).toOption
            .flatMap(pid => {
              val h = ProcessHandle.of(pid)
              if (h.isPresent) Some(h.get.isAlive) else Some(false)
            }).getOrElse(true) // unparseable pid: leave it alone
          if (!alive) deleteRec(f)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    // SOURCE-DATA stamp (size + mtime), not just the sfDir path: a
    // testdata reprovisioned in place at the same path must invalidate
    // every fixture cache. Directory-shaped tables stamp PER PART FILE —
    // a dir whose part files are overwritten in place keeps its own
    // length/mtime, so stamping the top-level path would silently serve
    // fixtures built from the OLD bytes.
    def sourceStamp(tables: Seq[String]): String =
      java.lang.Long.toHexString(tables.flatMap { t =>
        val f = new java.io.File(s"$sfDir/$t.parquet")
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
            .map(p => p.length * 31L + p.lastModified).toSeq
        else Seq(f.length * 31L + f.lastModified)
      }.foldLeft(17L)((acc, h) => acc * 0x100000001b3L + h))
    /** Returns (fixture dir, provenance "hit"/"miss"/"lost_race") — rides
      * the artifact's sections_env so a run that synthesized fixtures
      * in-JVM right before timing (heap/page-cache state the warm-cache
      * run never sees) is distinguishable from one that reused them.
      * "lost_race" keeps BOTH facts: this JVM paid a full in-JVM build
      * (the contamination the flag exists to expose) AND timed against
      * the winner's finished bytes. */
    def synthDir(tag: String, docCopies: Int, permName: String,
                 perm: Int => (String, String), rowCopies: Int)
        : (String, String) = {
      val stampSrc = Seq("documents") ++
        (if (rowCopies > 1) Seq("lineitem", "events") else Nil)
      val stamp = sourceStamp(stampSrc)
      val key = s"${tag}_d${docCopies}_${permName}_r${rowCopies}_" +
        s"v${fixtureSynthVersion}_${stamp}_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bench_fixtures")
      val base = root.resolve(key)
      val marker = base.resolve("_GRAFT_FIXTURE_OK")
      if (java.nio.file.Files.exists(marker)) return (base.toString, "hit")
      sweepDeadBuilds(root)
      // Build into a PROCESS-PRIVATE sibling and rename into place: two
      // bench processes racing the same key (an isolation rerun next to a
      // full run) must never write one dir — a measured incident had the
      // loser reading the winner's half-built files and failing a query.
      // The rename publishes the finished build atomically; the loser of
      // the rename adopts the winner's dir and discards its own.
      val tmp = root.resolve(s"$key.build_${ProcessHandle.current().pid()}")
      deleteRec(tmp.toFile)
      java.nio.file.Files.createDirectories(tmp)
      val dir = tmp.toString
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until docCopies).map { i =>
        val d = docs.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 10000000L))
        if (i == 0) d
        else {
          val (from, to) = perm(i)
          d.withColumn("text", translate(col("text"), from, to))
        }
      }.reduce(_.unionByName(_))
        // evenly-sized 2-files-per-core layout: the fixture — not the
        // source table's row-group count, which a re-provisioned testdata
        // can change under us — decides scale-section scan granularity
        .repartition(2 * cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      if (rowCopies > 1) {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        (0 until rowCopies).map(i => li.withColumn("l_orderkey",
            col("l_orderkey") + lit(i.toLong * 100000000L)))
          .reduce(_.unionByName(_))
          .repartition(2 * cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        (0 until rowCopies).map(i => ev
            .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
            .withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L)))
          .reduce(_.unionByName(_))
          .repartition(2 * cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      val scaled = Set("documents") ++
        (if (rowCopies > 1) Set("lineitem", "events") else Set.empty[String])
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings") if !scaled(t))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir, s"$t.parquet"),
          java.nio.file.Paths.get(sfDir, s"$t.parquet"))
      java.nio.file.Files.write(
        tmp.resolve("_GRAFT_FIXTURE_OK"), Array.emptyByteArray)
      // publish under a cross-process FILE LOCK: the check-then-delete of
      // a crashed (marker-less) dir at base must not race another process
      // publishing the same key — an unguarded gap lets the loser delete a
      // freshly-published fixture out from under the winner's in-flight
      // scan. Marker-bearing dirs are never deleted, so a reader holding
      // base.toString can never lose its files.
      val lockCh = java.nio.channels.FileChannel.open(
        root.resolve(s"$key.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock()
      // losing the publish race = adopting the winner's FINISHED dir,
      // recorded as its own state: the timed bytes are the winner's, but
      // this JVM still paid a full in-JVM build first
      val lostRace =
        try {
          if (java.nio.file.Files.exists(marker)) {
            deleteRec(tmp.toFile); true
          } else {
            deleteRec(base.toFile)
            java.nio.file.Files.move(tmp, base,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            false
          }
        } finally { lock.release(); lockCh.close() }
      (base.toString, if (lostRace) "lost_race" else "miss")
    }

    /** Steady-input split amortization (round-12 ask 3): the reprovisioned
      * testdata writes ONE file / ONE row group per table, and a row group
      * is one scan task no matter the split size — q2's double lineitem
      * scan serialized (1.13 → 3.06 s) and every map-dense documents query
      * inherited 1-task tokenize parallelism. The bench is supposed to
      * measure the ENGINE, not the provisioner's layout, so steady inputs
      * are re-laid-out once (cached, stamped): documents at 2 files/core,
      * everything else bytes-proportional. The RAW layout still rides the
      * artifact (steady_inputs) so the sensitivity stays documented;
      * SPARK_GRAFT_BENCH_AMORTIZE_STEADY=0 restores raw reads. */
    def amortizedSteadyDir(): (String, String) = {
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      // v2: bytes-proportional file counts. documents keeps 2 files/core
      // (the CPU-dense table: tokenize/shingle parallelism IS its scan
      // parallelism); everything else gets ~256 KB/file capped at 2/core —
      // a 594 KB dim table in 64 files just taxes every consumer with 63
      // extra opens (v1 regressed the incremental-fold family ~2×).
      val key = s"steady_c${cpus}_v2_${sourceStamp(tables)}_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bench_fixtures")
      val base = root.resolve(key)
      val marker = base.resolve("_GRAFT_FIXTURE_OK")
      if (java.nio.file.Files.exists(marker)) return (base.toString, "hit")
      sweepDeadBuilds(root)
      val tmp = root.resolve(s"$key.build_${ProcessHandle.current().pid()}")
      deleteRec(tmp.toFile)
      java.nio.file.Files.createDirectories(tmp)
      for (t <- tables) {
        val src = new java.io.File(s"$sfDir/$t.parquet")
        val bytes =
          if (src.isDirectory)
            Option(src.listFiles()).map(_.map(_.length).sum).getOrElse(0L)
          else src.length
        val files =
          if (t == "documents") 2 * cpus.toInt
          else math.max(1L, math.min(2L * cpus.toInt, bytes / (256L << 10)))
            .toInt
        spark.read.parquet(s"$sfDir/$t.parquet")
          .repartition(files)
          .write.mode("overwrite").parquet(s"${tmp.toString}/$t.parquet")
      }
      java.nio.file.Files.write(
        tmp.resolve("_GRAFT_FIXTURE_OK"), Array.emptyByteArray)
      val lockCh = java.nio.channels.FileChannel.open(
        root.resolve(s"$key.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock()
      // losing the publish race = adopting the winner's FINISHED dir,
      // recorded as its own state: the timed bytes are the winner's, but
      // this JVM still paid a full in-JVM build first
      val lostRace =
        try {
          if (java.nio.file.Files.exists(marker)) {
            deleteRec(tmp.toFile); true
          } else {
            deleteRec(base.toFile)
            java.nio.file.Files.move(tmp, base,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            false
          }
        } finally { lock.release(); lockCh.close() }
      (base.toString, if (lostRace) "lost_race" else "miss")
    }

    // one timed run with everything stamped about it
    final case class ScaleRun(sec: Double, attrib: Attrib,
                              calib: Calib.Sample)
    // a scale row: the headline run, every timed run taken, and the
    // untimed warmup reference (identical plan on the identical scale
    // data) the round-14 cpu signal compares against
    final case class ScaleRow(name: String, run: ScaleRun,
                              runs: Seq[ScaleRun], warmSec: Double,
                              warmCpuSec: Double, warmTasks: Long)

    // median-so-far for the retry-once decision (the artifact's flags use
    // the final median; this one only gates spending retry budget)
    def suspectNow(c: Calib.Sample): Boolean = {
      val (mSt, mMt) = Calib.medians(calibSamples.toSeq)
      // too few samples to trust a median → treat as deviant (retry is
      // cheap insurance early in the run)
      calibSamples.size < 5 || Calib.suspect(c, mSt, mMt)
    }
    // probe OR cpu deviation — either signal means this run's number is
    // not yet credible (round 14: the span_stats-10× escape was
    // calibration-clean but 12× task-CPU inflated; the kn_logprob row
    // was cpu-clean but probe-flagged — each signal sees episodes the
    // other is blind to)
    def deviantNow(r: ScaleRun, warmSec: Double, warmCpu: Double,
                   warmTasks: Long): Boolean =
      suspectNow(r.calib) ||
        cpuSuspect(warmSec, warmCpu, warmTasks, math.abs(r.sec), r.attrib)
    // headline pick between two runs: a clean run always beats a deviant
    // one regardless of wall time; two clean runs take the reproducible
    // minimum; two deviant runs fall to the better worse-axis calibration
    // score with wall time as the not-comparable tie-break
    def betterOf(r1: ScaleRun, r2: ScaleRun, warmSec: Double,
                 warmCpu: Double, warmTasks: Long): ScaleRun = {
      if (r1.sec < 0) return (if (r2.sec >= 0) r2 else r1)
      if (r2.sec < 0) return r1
      val d1 = deviantNow(r1, warmSec, warmCpu, warmTasks)
      val d2 = deviantNow(r2, warmSec, warmCpu, warmTasks)
      if (d1 != d2) { if (d1) r2 else r1 }
      else if (!d1) { if (r1.sec <= r2.sec) r1 else r2 }
      else {
        val (mSt, mMt) = Calib.medians(calibSamples.toSeq)
        if (firstBetterCalibrated(r1.sec, r1.calib, r2.sec, r2.calib,
          mSt, mMt)) r1 else r2
      }
    }

    def runScale(section: String, names: Seq[String], dir: String,
                 timedRuns: Int): Seq[ScaleRow] = {
      val qmap = SparkEntry.queries
      names.flatMap { n =>
        if (scaleBudgetLeft <= 0) {
          skipped += s"$section:$n"
          System.err.println(s"[bench] budget: skipping $section $n " +
            f"(elapsed ${elapsedS}%.0f s)")
          None
        } else qmap.get(n).map { fn =>
          // JIT warmup at 1× FIRST: a cold JVM's first executions pay
          // interpreted Catalyst + tiered-compilation queueing behind 32
          // busy worker threads — measured in round 9 at 10-40× and
          // nondeterministic (q_dsir_select 10×: 3s, 14s and 208s across
          // three runs of identical code and data; cold-1× 19.3s vs
          // hot-1× 0.5s). Three cheap small-data passes compile the
          // plan's hot paths before any scale data is timed. NonFatal only:
          // an OOM/interrupt must surface, and a query failing every warmup
          // pass is WARNED (its first timed run would otherwise be
          // silently cold).
          (1 to 3).foreach(i =>
            try { fn(spark, sfDir).count(); () }
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[bench] $n warmup pass $i failed: ${e.getMessage}")
            })
          sweepLeaked()
          // untimed warm run ON the scale dir: pays page-cache + residual
          // codegen, AND its task cpu_sec/tasks are stamped as the
          // contention-free in-session reference the cpu_suspect signal
          // compares every timed run against (round-14 ask 1a)
          val (wSec, wAttrib, _) = timeOne(n, fn, dir)
          awaitJitQuiesce()   // drain the C2 queue before the clock starts
          def timed(): ScaleRun = {
            val (s, a, c) = timeOne(n, fn, dir); ScaleRun(s, a, c)
          }
          // min of up to TWO timed runs: residual C2 recompile / GC-epoch
          // noise lands on one run or the other, and the minimum is the
          // reproducible number a clean-room rerun can match. All raw run
          // times ride the artifact ("runs", with per-run probes/cpu in
          // "runs_calib"/"runs_cpu_sec") so the methodology is
          // self-describing. A first run past the slow threshold normally
          // gets NO second run — JIT noise is irrelevant at that magnitude
          // and the repeat is what starved round 10's driver cap. The
          // round-14 retry rule is UNGATED from that threshold: a first
          // run whose probe OR cpu signal deviated gets one budget-gated
          // retry no matter how fast it ran, single-run sections included —
          // a deviant single sample must never be the headline without
          // either a clean retry replacing it or both contaminated runs
          // riding the artifact (r13: q_kn_logprob 100× at 22.9 s was fast
          // enough to dodge the old slow-gated retry and rode as a flagged
          // single sample). The headline is the clean run if exactly one
          // is clean, the min of two clean runs, or the better
          // worse-axis-calibrated of two deviant ones.
          val r1 = timed()
          val firstSlow = math.abs(r1.sec) >= slowSingleRunS
          val wantSecond =
            if (timedRuns > 1 && !firstSlow) true
            else deviantNow(r1, wSec, wAttrib.cpuSec, wAttrib.tasks)
          if (wantSecond && scaleBudgetLeft > 0) {
            if (firstSlow || timedRuns <= 1)
              System.err.println(f"[bench] $section $n: run " +
                f"(${r1.sec}%.1f s) under probe/cpu deviation — retrying once")
            val r2 = timed()
            ScaleRow(n, betterOf(r1, r2, wSec, wAttrib.cpuSec,
              wAttrib.tasks), Seq(r1, r2), wSec, wAttrib.cpuSec,
              wAttrib.tasks)
          } else ScaleRow(n, r1, Seq(r1), wSec, wAttrib.cpuSec,
            wAttrib.tasks)
        }
      }
    }
    // FINAL headline re-selection at artifact-write time: the in-run pick
    // uses the median-so-far, which early in a contention window can flag
    // the CLEAN run and enshrine the contaminated retry (observed: a 10×
    // row carrying 22.1 s as headline with a 5.1 s run sitting in `runs`,
    // because the 5.1 s run's probe looked deviant against the first few
    // samples). The artifact's flags are computed against the FULL run's
    // median, so the headline must be re-picked under the same rules with
    // the same median: min wall among final-median-clean runs, else the
    // better worse-axis score among deviant ones (wall tie-break), failed
    // runs never win over a finished one.
    def finalPick(row: ScaleRow, medSt: Double, medMt: Double): ScaleRun = {
      val finished = row.runs.filter(_.sec >= 0)
      if (finished.isEmpty) return row.run
      def deviant(r: ScaleRun): Boolean =
        Calib.suspect(r.calib, medSt, medMt) ||
          cpuSuspect(row.warmSec, row.warmCpuSec, row.warmTasks,
            math.abs(r.sec), r.attrib)
      val clean = finished.filterNot(deviant)
      if (clean.nonEmpty) clean.minBy(_.sec)
      else finished.reduceLeft { (a, b) =>
        if (firstBetterCalibrated(a.sec, a.calib, b.sec, b.calib,
          medSt, medMt)) a else b
      }
    }
    def scaleJson(res: Seq[ScaleRow], medSt: Double, medMt: Double,
                  inconsistent: Set[String]): (String, String) = (
      res.map(r => "\"" + r.name + "\":" + r.run.sec)
        .mkString("{", ",", "}"),
      res.map { r =>
        val a = r.run.attrib
        val entry = a.jsonWith(r.run.sec).dropRight(1) +
          s""","calib":${r.run.calib.json},""" +
          s""""calib_suspect":${Calib.suspect(r.run.calib, medSt, medMt)},""" +
          s""""cpu_suspect":${cpuSuspect(r.warmSec, r.warmCpuSec,
            r.warmTasks, math.abs(r.run.sec), a)},""" +
          f""""warmup":{"sec":${r.warmSec}%.3f,""" +
          f""""cpu_sec":${r.warmCpuSec}%.3f,"tasks":${r.warmTasks}},""" +
          s""""scale_inconsistent":${inconsistent.contains(r.name)}""" +
          r.runs.map(x => f"${x.sec}%.3f")
            .mkString(",\"runs\":[", ",", "]") +
          r.runs.map(_.calib.json).mkString(",\"runs_calib\":[", ",", "]") +
          r.runs.map(x => f"${x.attrib.cpuSec}%.3f")
            .mkString(",\"runs_cpu_sec\":[", ",", "]") +
          r.runs.map(_.attrib.tasks)
            .mkString(",\"runs_tasks\":[", ",", "]}")
        "\"" + r.name + "\":" + entry
      }.mkString("{", ",", "}"))

    // ---- incremental artifact state: every section records its RAW
    // results here and writeArtifact() rebuilds target/bench.json from
    // them (so calib_suspect always reflects the newest probe median), so
    // a kill at ANY point leaves the completed sections parseable on disk.
    var scale10Res: Seq[ScaleRow] = Nil; var rps10x = -1.0
    var scale30Res: Seq[ScaleRow] = Nil
    var scale100Res: Seq[ScaleRow] = Nil
    // a steady row keeps the COLD pass's attrib too: the cold pass runs
    // the identical plan seconds before the steady pass, so its task
    // cpu_sec is the steady row's cpu_suspect reference (cold CPU is
    // normally the HIGHER of the two — interpreted generated code before
    // C2 — so steady >1.5× cold is a strong anomaly, not warmup noise)
    final case class SteadyRow(name: String, cold: Double,
      coldAttrib: Attrib, coldCalib: Calib.Sample, steady: Double,
      attrib: Attrib, steadyCalib: Calib.Sample)
    var steadyRes: Seq[SteadyRow] = Nil
    var totalCold = 0.0; var totalSteady = 0.0; var nFail = 0
    var steadyAmortized = false
    var leakGate = "\"pass\""
    var rps = -1.0
    // calibration brackets for the two extract-throughput headlines (the
    // BASELINE.md comparison must be certifiable like any query row)
    var extractCalib = Calib.Sample(-1, -1)
    var extractCalib10x = Calib.Sample(-1, -1)
    def bracketCalib[A](body: => A): (A, Calib.Sample) = {
      val pre = Calib.sample(); calibSamples += pre
      val a = body
      val post = Calib.sample(); calibSamples += post
      (a, Calib.combine(pre, post))
    }
    val scale100Copies =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE100_COPIES", "80").toInt
    val filterJson = only.map(f => "\"" + jstr(f.toSeq.sorted.mkString(",")) + "\"")
      .getOrElse("null")
    // steady run order is SHUFFLED with a stamped seed (round-13 ask 3):
    // the r12 contention window was only diagnosable because it happened
    // to cut across unrelated alphabetical neighbors — a seeded shuffle
    // makes that structural (an episode can never masquerade as a family
    // regression: the family's rows are scattered through run order).
    // Per-query maps stay keyed by name, so round-over-round comparison is
    // unaffected; maps EMIT in run order so a contiguous episode is
    // visible as a contiguous block of rows.
    val steadySeed = sys.env.get("SPARK_GRAFT_BENCH_STEADY_SEED")
      .map(_.toLong).getOrElse(System.nanoTime() & 0x7fffffffL)

    // latest JSON renderings of each section, refreshed by artifactJson()
    // from the raw results (the compact stdout line reuses the final ones)
    var scale10Json = "{}"; var scale30Json = "{}"; var scale100Json = "{}"
    var inconsistentJsonLast = "[]"

    def artifactJson(complete: Boolean): String = {
      val ivfTrain = graft.functions.VectorFunctions.lastTrainSec
      val clusterIdx = graft.functions.DedupFunctions.lastIndexBuildSec
      val pqTrain = graft.functions.VectorFunctions.lastPqTrainSec
      val pqEncode = graft.functions.VectorFunctions.lastPqEncodeSec
      val skippedJson = skipped.map("\"" + jstr(_) + "\"")
        .mkString("[", ",", "]")
      val sectionEnvJson = sectionEnv
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val (medSt, medMt) = Calib.medians(calibSamples.toSeq)
      // headline re-pick under the FINAL median (see finalPick), then the
      // cross-scale impossibility guard (ask 1c): a lower-copy-count row
      // beating its own higher-copy-count row in the same session is
      // environmental by arithmetic, probes notwithstanding
      val scale10F = scale10Res.map(r => r.copy(run = finalPick(r, medSt, medMt)))
      val scale30F = scale30Res.map(r => r.copy(run = finalPick(r, medSt, medMt)))
      val scale100F = scale100Res.map(r => r.copy(run = finalPick(r, medSt, medMt)))
      val inconsistent = scaleInconsistent(Seq(
        ("10x", 8, scale10F.map(r => (r.name, r.run.sec))),
        ("30x", 30, scale30F.map(r => (r.name, r.run.sec))),
        ("100x", scale100Copies, scale100F.map(r => (r.name, r.run.sec)))))
      val inconsistentJson = inconsistent.toSeq.sorted
        .map { case (t, n) => "\"" + jstr(s"$t:$n") + "\"" }
        .mkString("[", ",", "]")
      inconsistentJsonLast = inconsistentJson
      val (s10q, s10a) = scaleJson(scale10F, medSt, medMt,
        inconsistent.collect { case ("10x", n) => n })
      val (s30q, s30a) = scaleJson(scale30F, medSt, medMt,
        inconsistent.collect { case ("30x", n) => n })
      val (s100q, s100a) = scaleJson(scale100F, medSt, medMt,
        inconsistent.collect { case ("100x", n) => n })
      scale10Json = s10q; scale30Json = s30q; scale100Json = s100q
      val steadyColdJson = steadyRes
        .map(r => "\"" + r.name + "\":" + r.cold)
        .mkString("{", ",", "}")
      val steadyJson = steadyRes
        .map(r => "\"" + r.name + "\":" + r.steady)
        .mkString("{", ",", "}")
      val steadyAttribJson = steadyRes.map { r =>
        val entry = r.attrib.json.dropRight(1) +
          s""","calib":${r.steadyCalib.json},""" +
          s""""calib_suspect":${Calib.suspect(r.steadyCalib, medSt, medMt)},""" +
          s""""calib_cold":${r.coldCalib.json},""" +
          s""""calib_cold_suspect":${Calib.suspect(r.coldCalib, medSt, medMt)},""" +
          f""""cold_cpu_sec":${r.coldAttrib.cpuSec}%.3f,""" +
          s""""cold_tasks":${r.coldAttrib.tasks},""" +
          s""""cpu_suspect":${cpuSuspect(r.cold, r.coldAttrib.cpuSec,
            r.coldAttrib.tasks, math.abs(r.steady), r.attrib)}}"""
        "\"" + r.name + "\":" + entry
      }.mkString("{", ",", "}")
      val suspectRows = steadyRes.count(r =>
        Calib.suspect(r.steadyCalib, medSt, medMt) ||
          Calib.suspect(r.coldCalib, medSt, medMt)) +
        (scale10F ++ scale30F ++ scale100F)
          .count(r => Calib.suspect(r.run.calib, medSt, medMt))
      val cpuSuspectRows = steadyRes.count(r =>
        cpuSuspect(r.cold, r.coldAttrib.cpuSec, r.coldAttrib.tasks,
          math.abs(r.steady), r.attrib)) +
        (scale10F ++ scale30F ++ scale100F).count(r =>
          cpuSuspect(r.warmSec, r.warmCpuSec, r.warmTasks,
            math.abs(r.run.sec), r.run.attrib))
      // bench_schema 6 (round 14): the self-relative CPU signal —
      // per-row cpu_suspect vs the untimed warmup's task cpu_sec at equal
      // task count (scale rows; steady rows reference their cold pass),
      // warmup stamped per scale row, retry-once UNGATED from the slow
      // threshold (any probe/cpu deviation earns one retry, single-run
      // sections included), min-of-subwindow probe stamps
      // (st_min/mt_min beside the max axes), and the cross-scale
      // arithmetic guard (scale_inconsistent: a 10× headline exceeding
      // its own 100× headline is environmental by construction). The r13
      // escape — wall 9.3×, task-CPU 12× on identical tasks, probes
      // clean — now names itself three independent ways. (Schema 5 added
      // per-row calibration + seeded steady shuffle; 4 env/provenance +
      // foreign-CPU fields; 3 budget/skips; 2 min-of-2 runs; 1 one run.)
      s"""{"metric":"total","value":$totalCold,"unit":"sec","bench_schema":6,""" +
        s""""timing":"scale=min_of_2_timed_runs_after_warmup(first>${slowSingleRunS.toInt}s_or_1run_section=single_run;any_probe_or_cpu_deviation=retry_once;clean_beats_deviant_then_min_wall);steady=cold_then_steady_shuffled",""" +
        s""""failed":$nFail,"filter":$filterJson,"budget_s":$budgetS,""" +
        s""""steady_order_seed":$steadySeed,""" +
        s""""calib_summary":{"median_st_mops":$medSt,"median_mt_gbps":$medMt,""" +
        s""""samples":${calibSamples.size},"suspect_rows":$suspectRows,""" +
        s""""cpu_suspect_rows":$cpuSuspectRows,""" +
        s""""method":"row=axis_min_of_pre_post_bracket;st=max_of_2x2pass_64MB_hash;mt=max_of_6x16pass_allcores_sum;flag=either_axis_1.5x_below_run_median;st_min/mt_min=worst_subwindow_evidence_only;cpu_suspect=run_cpu>1.5x_ref_cpu_at_equal_tasks_and_wall>ref_wall"},""" +
        s""""scale_inconsistent":$inconsistentJson,""" +
        s""""env":$envJson,"sections_env":$sectionEnvJson,""" +
        s""""steady_inputs":$steadyInputsJson,""" +
        s""""steady_layout":"${if (steadyAmortized)
          "amortized(v2:documents=2_per_core;others_bytes_proportional_256KB_per_file_cap_2_per_core)"
        else "raw"}",""" +
        s""""sections_skipped":$skippedJson,"complete":$complete,""" +
        s""""extract_rows_per_sec":$rps,""" +
        s""""extract_calib":${extractCalib.json},""" +
        s""""extract_calib_suspect":${Calib.suspect(extractCalib, medSt, medMt)},""" +
        s""""total_steady":$totalSteady,""" +
        s""""leak_gate":$leakGate,"ivf_train_sec":$ivfTrain,""" +
        s""""cluster_index_build_sec":$clusterIdx,"pq_train_sec":$pqTrain,""" +
        s""""pq_encode_sec":$pqEncode,"queries":$steadyColdJson,""" +
        s""""queries_steady":$steadyJson,"attrib":$steadyAttribJson,""" +
        s""""queries_10x":$s10q,"attrib_10x":$s10a,""" +
        s""""extract_rows_per_sec_10x":$rps10x,""" +
        s""""extract_calib_10x":${extractCalib10x.json},""" +
        s""""extract_calib_10x_suspect":${Calib.suspect(extractCalib10x, medSt, medMt)},""" +
        s""""scale_10x":{"documents":8,"lineitem":10,"events":10},""" +
        s""""queries_30x":$s30q,"attrib_30x":$s30a,""" +
        s""""scale_30x":{"documents":30,"media":"payloads derive per doc_id, so media scales with documents"},""" +
        s""""queries_100x":$s100q,"attrib_100x":$s100a,""" +
        s""""scale_100x":{"documents":$scale100Copies},"sf":"${jstr(sfDir)}"}"""
    }
    // The FULL artifact (cold+steady+attrib maps, ~40 KB at 200 queries)
    // goes to target/bench.json only: printed, it exceeds the driver's
    // stdout tail-capture and the round's "parsed" field comes back null
    // (it did in rounds 6 and 7). Stdout carries ONE compact line instead.
    // FILTERED runs (SPARK_GRAFT_BENCH_ONLY) write to a SEPARATE path — an
    // isolation rerun must never clobber the round's full artifact with a
    // partial one (the round-8 pitfall).
    def writeArtifact(complete: Boolean): Unit =
      try {
        val out = java.nio.file.Paths.get("target",
          if (only.isDefined) "bench_filtered.json" else "bench.json")
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.write(out, artifactJson(complete).getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write bench artifact: ${e.getMessage}")
      }
    writeArtifact(complete = false) // parseable artifact from second zero

    if (!scaleCheck || scaleQueries.isEmpty) ()
    else if (scaleBudgetLeft <= 0) skipped += "10x:section"
    else try {
      val (dir10, hit10) = synthDir("10x", docCopies = 8, "shift", alphaShifted,
        rowCopies = 10)
      recordSectionEnv("10x", dir10, hit10)
      scale10Res = runScale("10x", scaleQueries, dir10, timedRuns = 2)
      rps10x =
        if (scaleBudgetLeft <= 0) { skipped += "10x:extract"; -1.0 }
        else {
          val (r, c) = bracketCalib(extractRps(dir10, "e2e10", runs = 1))
          extractCalib10x = c; r
        }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] 10x scale point FAILED: ${e.getMessage}")
    }
    writeArtifact(complete = false)

    // intermediate MEDIA scale point: ~30× documents — and since fixture
    // media payloads derive per doc_id, ~30× images/audio/video — for the
    // perceptual near-dup family, whose dominant input is the media axis.
    // Gives each mm near-dup operator a second scale point (round-9 ask:
    // their linearity claim rested on one measurement); audio/video get
    // their own 1× warmups here since the 10× section does not run them.
    // q_mm_video_neardup (full pairs) and q_mm_video_neardup_edges (star
    // collapse) both run: their contrast IS the scale argument — the full
    // form's output pair relation is quadratic where re-upload classes
    // repeat, the edge form stays linear on the same media
    val scale30Queries = Seq("q_mm_image_neardup", "q_mm_audio_neardup",
      "q_mm_video_neardup", "q_mm_video_neardup_edges", "q_crossmodal_dedup")
      .filter(n => only.forall(_.contains(n)))
    val scale30 = scaleCheck &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE30", "1") != "0"
    if (!scale30 || scale30Queries.isEmpty) ()
    else if (scaleBudgetLeft <= 0) skipped += "30x:section"
    else try {
      val (dir30, hit30) = synthDir("30x", docCopies = 30, "affine",
        alphaAffine, rowCopies = 1)
      recordSectionEnv("30x", dir30, hit30)
      scale30Res = runScale("30x", scale30Queries, dir30, timedRuns = 2)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] 30x scale point FAILED: ${e.getMessage}")
    }
    writeArtifact(complete = false)

    // third scale point: ~100× documents (80 affine-substituted copies) for
    // the dedup family alone — the linearity claim between 10× and 100× is
    // the one that matters for 100 TB. Copy count env-tunable
    // (SPARK_GRAFT_BENCH_SCALE100_COPIES) so a memory-bound host can run 30.
    // q_kn_logprob / q_dsir_select ride along (round-9 ask: their 10×
    // points were cpu-dense and super-linear-looking; a third point
    // settles whether the LM relations stay vocab-scale as affine copies
    // multiply word forms).
    // the full-pair/edge-form text contrast runs at BOTH document scale
    // points (the video contrast's analog on the text axis): the full form
    // is quadratic by OUTPUT contract where copies repeat, the edge form
    // star-collapses them
    val scale100Queries = Seq("q_dedup_span_stats", "q_dedup_minhash_neardup",
      "q_dedup_minhash_edges",
      "q_dedup_cluster_incremental", "q_crossmodal_dedup",
      "q_kn_logprob", "q_dsir_select")
      .filter(n => only.forall(_.contains(n)))
    val scale100 = scaleCheck && scale100Copies > 0 &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE100", "1") != "0"
    if (!scale100 || scale100Queries.isEmpty) ()
    else if (scaleBudgetLeft <= 0) skipped += "100x:section"
    else try {
      val (dir100, hit100) = synthDir("100x", docCopies = scale100Copies,
        "affine", alphaAffine, rowCopies = 1)
      recordSectionEnv("100x", dir100, hit100)
      // one timed run each (timedRuns = 1), full retry/cpu-signal rules.
      // The unified runScale path means the 100× rows now pay an untimed
      // warm run on the 100× data too — that run is what stamps the
      // warmup cpu reference, and without it the round-14 cpu signal
      // would be blind exactly where single-run rows most need a second
      // opinion (~60-80 s of extra section cost at r13 timings, well
      // inside the budget)
      scale100Res = runScale("100x", scale100Queries, dir100, timedRuns = 1)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] 100x scale point FAILED: ${e.getMessage}")
    }
    writeArtifact(complete = false)

    // ---- steady section: each query runs twice — the first timing carries
    // one-off codegen / first-touch costs, the second is the steady state a
    // long session sees — report both so round-over-round comparison isn't
    // polluted by compile-time noise. The steady section ignores the scale
    // budget (its reserve exists precisely so it always runs) but still
    // respects the TOTAL budget: past it, remaining queries are skipped and
    // recorded rather than racing the driver's kill.
    val amortizeSteady =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_AMORTIZE_STEADY", "1") != "0"
    val steadyDir =
      if (!amortizeSteady) sfDir
      else if (elapsedS > budgetS) {
        // the rebuild itself is un-skippable work (a 10-table
        // read-repartition-write, minutes at a real sf on a cache miss) —
        // past the total budget it must not race the driver's kill any
        // more than a query may; raw reads are the honest degraded mode
        skipped += "steady:amortize"
        sfDir
      } else try {
        val (d, hit) = amortizedSteadyDir()
        recordSectionEnv("steady", d, hit)
        steadyAmortized = true
        d
      } catch { case e: Throwable =>
        System.err.println(
          s"[bench] steady amortization FAILED (reading raw): ${e.getMessage}")
        sfDir
      }
    // deterministic base order (sorted) THEN the seeded shuffle — the same
    // seed must reproduce the same run order across JVMs
    val queries = new scala.util.Random(steadySeed)
      .shuffle(SparkEntry.queries.toSeq.sortBy(_._1))
      .filter { case (n, _) => only.forall(_.contains(n)) }
    steadyRes = queries.flatMap { case (name, fn) =>
      if (elapsedS > budgetS) {
        skipped += s"steady:$name"
        None
      } else {
        val (cold, coldAttrib, coldCalib) = timeOne(name, fn, steadyDir)
        val (steady, attrib, steadyCalib) =
          if (cold < 0) (cold, Attrib(0, 0, 0, 0, 0, 0), Calib.Sample(-1, -1))
          else timeOne(name, fn, steadyDir)
        Some(SteadyRow(name, cold, coldAttrib, coldCalib, steady, attrib,
          steadyCalib))
      }
    }
    totalCold = steadyRes.map(_.cold).filter(_ > 0).sum
    totalSteady = steadyRes.map(_.steady).filter(_ > 0).sum
    // a cold-pass/steady-fail query (state-dependent breakage) must count
    // as failed too, or its silent absence from total_steady reads as a
    // round-over-round improvement
    nFail = steadyRes.count(r => r.cold < 0 || r.steady < 0)
    // the leak GATE: post-round-9 no query may leave a persisted RDD
    // behind; name the offenders right in the artifact
    val leakers = steadyRes.filter(_.attrib.leakedRdds > 0).map(_.name)
    leakGate =
      if (leakers.isEmpty) "\"pass\""
      else "\"fail:" + leakers.mkString(";") + "\""
    writeArtifact(complete = false)

    // end-to-end extract→parquet throughput (BASELINE.md bar: >=115k rows/s).
    // Measured over LINEITEM (the largest fixture, 600k rows at sf0.1) so the
    // fixed per-session overhead (watermark saves, listing, footer reads)
    // amortizes the way it does in a real long session. Two runs into fresh
    // scratch dirs, best-of-2: the first pays writer codegen/committer init.
    locally {
      val (r, c) = bracketCalib(extractRps(sfDir, "e2e", runs = 2))
      rps = r; extractCalib = c
    }
    writeArtifact(complete = true)

    // The compact line's "queries" map carries the COLD timings — the
    // same meaning the key has in target/bench.json, so a consumer
    // comparing stdout against a committed artifact never diffs
    // steady-vs-cold. Steady totals ride as the total_steady scalar;
    // per-query steady stays in the full artifact. Printed AFTER
    // spark.stop() so no executor/streaming log line can interleave
    // mid-JSON — but stop() is guarded: a hang or throw there must not
    // lose the machine-readable line entirely.
    val compactQs = steadyRes
      .map(r => f""""${r.name}":${r.cold}%.3f""")
      .mkString("{", ",", "}")
    val skippedJson = skipped.map("\"" + jstr(_) + "\"").mkString("[", ",", "]")
    val sectionEnvCompact = sectionEnv
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val (medStF, medMtF) = Calib.medians(calibSamples.toSeq)
    // the compact line reuses the full artifact's final-pick guard list
    // (writeArtifact(complete = true) just rebuilt it)
    val inconsistentCompact = inconsistentJsonLast
    val compact =
      f"""{"metric":"total","value":$totalCold%.3f,"unit":"sec","bench_schema":6,"failed":$nFail,"steady_order_seed":$steadySeed,"calib_summary":{"median_st_mops":$medStF%.1f,"median_mt_gbps":$medMtF%.2f,"samples":${calibSamples.size}},"scale_inconsistent":$inconsistentCompact,"env":$envJson,"sections_env":$sectionEnvCompact,"sections_skipped":$skippedJson,"extract_rows_per_sec":$rps%.0f,"total_steady":$totalSteady%.3f,"leak_gate":$leakGate,"queries":$compactQs,"queries_10x":$scale10Json,"extract_rows_per_sec_10x":$rps10x%.0f,"queries_30x":$scale30Json,"queries_100x":$scale100Json,"sf":"${jstr(sfDir)}"}"""
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}")
    } finally println(compact)
  }
}
