package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's reproducibility counters (round 12) and in-band
  * calibration probe (round 13). These are the fields that adjudicate a
  * cross-run divergence (the r11/r12 driver-vs-builder disputes: 2.3-9.2×
  * inflation on identical code/data with nothing in the artifact to explain
  * it), so their parsers must return sane values on the platforms the bench
  * runs on — and degrade to the documented -1 sentinel, never throw,
  * anywhere else. /proc- and cgroup-dependent assertions are gated on
  * Linux (production code degrades to -1 elsewhere by design). */
class BenchCountersSpec extends AnyFunSuite {

  private def onLinux: Boolean =
    sys.props.getOrElse("os.name", "").toLowerCase.contains("linux")

  test("host/process counters return sane Linux values and advance") {
    // never-throws contract holds everywhere
    val busy0 = Bench.hostBusyJiffies
    val cpu0 = Bench.procCpuNs
    assume(onLinux, "/proc semantics are Linux-only; -1 sentinel elsewhere")
    assert(busy0 > 0, "/proc/stat aggregate busy jiffies")
    assert(cpu0 > 0, "process CPU ns")
    // burn a little CPU; both counters must be monotone non-decreasing
    var x = 0L
    (0 until 20000000).foreach(i => x += i * 31)
    assert(x != 0)
    assert(Bench.hostBusyJiffies >= busy0)
    assert(Bench.procCpuNs >= cpu0)
  }

  test("meminfo / code-cache / GC+JIT beans are readable") {
    val mem = Bench.memAvailableMb // must not throw anywhere
    assert(Bench.codeCacheUsedMb >= 0)
    val (gcCount, gcMs, jitMs) = Bench.procCounters
    assert(gcCount >= 0 && gcMs >= 0)
    assert(jitMs >= -1) // -1 = monitoring unsupported, documented sentinel
    assume(onLinux, "/proc/meminfo is Linux-only; -1 sentinel elsewhere")
    assert(mem > 0)
  }

  test("steal jiffies and cgroup throttle never throw; sane on Linux") {
    val steal = Bench.stealJiffies
    val throttled = Bench.cgroupThrottledUsec
    val cpuMax = Bench.cgroupCpuMax
    val self = Bench.cgroupSelfPath // never throws anywhere
    assert(cpuMax != null && cpuMax.nonEmpty)
    assume(onLinux)
    // steal can legitimately be 0 (bare metal) but the aggregate line must
    // have parsed; -1 only when /proc/stat is unreadable or truncated
    assert(steal >= 0 || steal == -1)
    // cgroup view may be absent (chroot without /sys): -1 sentinel
    assert(throttled >= -1)
    // busy and steal come from ONE parse and must be mutually consistent:
    // steal is a component of busy
    val (busy, st2) = Bench.hostStatJiffies
    if (busy > 0 && st2 > 0) assert(st2 <= busy)
    // a parsed self path is rooted
    self.foreach { case (_, p) => assert(p.startsWith("/"), p) }
  }

  test("Calib.combine: axis-wise min, -1 poisons the axis") {
    import Bench.Calib
    val c = Calib.combine(Calib.Sample(100, 20), Calib.Sample(90, 25))
    assert(c == Calib.Sample(90, 20))
    assert(Calib.combine(Calib.Sample(-1, 20), Calib.Sample(90, 25))
      == Calib.Sample(-1.0, 20))
    assert(Calib.combine(Calib.Sample(100, 20), Calib.Sample(90, -1))
      == Calib.Sample(90, -1.0))
  }

  test("Calib.score: the worse axis decides (MT-only theft must lose)") {
    import Bench.Calib
    val (mSt, mMt) = (500.0, 100.0)
    // the r12 signature: ST intact, MT cratered — score must reflect MT
    val mtThief = Calib.score(Calib.Sample(500, 10), mSt, mMt)
    val clean = Calib.score(Calib.Sample(490, 95), mSt, mMt)
    assert(mtThief < clean)
    // a retry choosing by score keeps the clean run even when the
    // contaminated one has the higher ST probe
    assert(Calib.score(Calib.Sample(510, 10), mSt, mMt) <
      Calib.score(Calib.Sample(480, 90), mSt, mMt))
    // no usable axis → +inf (callers tie-break on wall time)
    assert(Calib.score(Calib.Sample(-1, -1), mSt, mMt).isPosInfinity)
    assert(Calib.score(Calib.Sample(500, 100), -1, -1).isPosInfinity)
    // one usable axis still votes
    assert(Calib.score(Calib.Sample(-1, 50), mSt, mMt) == 0.5)
  }

  test("Attrib.foreignCpuSec: delta, floor at zero, -1 when unavailable") {
    def a(host: Double, proc: Double) =
      Bench.Attrib(0, 0, 0, 0, 0, 0, hostBusySec = host, procCpuSec = proc)
    assert(math.abs(a(10.0, 4.0).foreignCpuSec - 6.0) < 1e-9)
    assert(a(3.0, 4.0).foreignCpuSec == 0.0) // jiffy rounding must not go negative
    assert(a(-1.0, 4.0).foreignCpuSec == -1.0)
    assert(a(10.0, -1.0).foreignCpuSec == -1.0)
  }

  test("attrib json carries the diagnostic fields") {
    val j = Bench.Attrib(1, 2, 3, 4, 5, 0, procGcSec = 0.5, procGcCount = 7,
      jitSec = 0.25, hostBusySec = 9.0, procCpuSec = 8.0, stealSec = 0.1,
      cgThrottledSec = 0.2).jsonWith(2.5)
    for (k <- Seq("proc_gc_sec", "proc_gc_count", "jit_sec", "host_busy_sec",
      "proc_cpu_sec", "steal_sec", "cg_throttled_sec", "foreign_cpu_sec",
      "load_suspect"))
      assert(j.contains("\"" + k + "\""), k)
    assert(j.contains("\"foreign_cpu_sec\":1.000"))
    assert(j.contains("\"steal_sec\":0.100"))
    assert(j.contains("\"cg_throttled_sec\":0.200"))
  }

  test("calibration probe: positive fixed-work rates, stable across samples") {
    Bench.Calib.warm()
    val a = Bench.Calib.sample()
    val b = Bench.Calib.sample()
    // both axes must measure real positive rates on any JVM
    assert(a.stMops > 0 && a.mtGbps > 0, a)
    assert(b.stMops > 0 && b.mtGbps > 0, b)
    // back-to-back samples on the same (test) host should agree within the
    // suspect threshold itself — a probe noisier than the flag it powers
    // would flag clean rows. Generous 3× bound: CI hosts wobble.
    assert(a.stMops / b.stMops < 3.0 && b.stMops / a.stMops < 3.0, (a, b))
    assert(a.json.contains("\"st_mops\"") && a.json.contains("\"mt_gbps\""))
  }

  test("calib medians and the 1.5x suspect rule") {
    import Bench.Calib
    val clean = Seq(Calib.Sample(100, 10), Calib.Sample(110, 11),
      Calib.Sample(105, 10.5), Calib.Sample(95, 9.5), Calib.Sample(108, 10.2))
    val (mSt, mMt) = Calib.medians(clean)
    assert(mSt >= 100 && mSt <= 110 && mMt >= 10 && mMt <= 11)
    // clean row: not suspect
    assert(!Calib.suspect(Calib.Sample(100, 10), mSt, mMt))
    // 4x ST drop (the r12 episode shape): suspect
    assert(Calib.suspect(Calib.Sample(mSt / 4, mMt), mSt, mMt))
    // bandwidth-only theft (task-CPU inflation axis): suspect
    assert(Calib.suspect(Calib.Sample(mSt, mMt / 2), mSt, mMt))
    // just inside the threshold: clean
    assert(!Calib.suspect(Calib.Sample(mSt / 1.4, mMt / 1.4), mSt, mMt))
    // unavailable probe or median: never flaggable, sentinel says why
    assert(!Calib.suspect(Calib.Sample(-1, -1), mSt, mMt))
    assert(!Calib.suspect(Calib.Sample(100, 10), -1, -1))
    // -1 failures are excluded from the median
    val withFail = clean :+ Calib.Sample(-1, -1)
    assert(Calib.medians(withFail) == Calib.medians(clean))
    assert(Calib.medians(Nil) == ((-1.0, -1.0)))
  }

  test("synthetic bandwidth thief: cpu_suspect fires where calib_suspect " +
    "cannot") {
    import Bench.Calib
    // the r13 escape, reproduced numerically: q_dedup_span_stats 10× ran
    // 16.9 s vs the 1.8 s warmup-shape baseline with task CPU inflated
    // 12× on IDENTICAL 163 tasks, while the probe bracket read 0.83-0.86×
    // of the run median — under the 1.5× flag line, so calibration-CLEAN.
    // The self-relative cpu signal must flag exactly this row.
    val (medSt, medMt) = (250.0, 250.0)
    val probe = Calib.Sample(0.84 * medSt, 0.85 * medMt)
    assert(!Calib.suspect(probe, medSt, medMt),
      "probe bracket is clean by construction — the escape's signature")
    val warmSec = 1.9; val warmCpu = 12.0; val tasks = 163L
    val inflated = Bench.Attrib(16.9, warmCpu * 12, 0.4, 0, tasks, 0)
    assert(Bench.cpuSuspect(warmSec, warmCpu, tasks, 16.9, inflated),
      "12x task-CPU + inflated wall at equal task count must flag")
    // a clean timed run (cpu within 1.5x of warmup) stays unflagged
    assert(!Bench.cpuSuspect(warmSec, warmCpu, tasks, 1.7,
      Bench.Attrib(1.9, warmCpu * 1.2, 0.1, 0, tasks, 0)))
    // CPU drift with a FLAT wall (long-session JVM profile decay —
    // measured 4/208 steady rows at 1.6-4x cold CPU, walls all BELOW the
    // reference) must not flag: the wall headline it certifies is fine
    assert(!Bench.cpuSuspect(warmSec, warmCpu, tasks, 1.2,
      Bench.Attrib(1.2, warmCpu * 4, 0.1, 0, tasks, 0)))
    // different task count = different plan → not comparable, never flags
    assert(!Bench.cpuSuspect(warmSec, warmCpu, tasks, 16.9,
      Bench.Attrib(16.9, warmCpu * 12, 0.4, 0, tasks + 32, 0)))
    // sub-floor warmup CPU (tiny run): scheduler jitter must not flag
    assert(!Bench.cpuSuspect(warmSec, 0.05, tasks, 1.0,
      Bench.Attrib(1.0, 0.4, 0, 0, tasks, 0)))
    // no warmup reference (failed warm run): never flags
    assert(!Bench.cpuSuspect(warmSec, 2.0, 0L, 16.9, inflated))
    assert(!Bench.cpuSuspect(-1.1, warmCpu, tasks, 16.9, inflated))
  }

  test("firstBetterCalibrated: infinite score is not-comparable, wall " +
    "time decides") {
    import Bench.Calib
    val (mSt, mMt) = (500.0, 100.0)
    val clean = Calib.Sample(490, 95)
    val unmeasured = Calib.Sample(-1, -1) // probe failed → score +inf
    // an unmeasured run must NOT beat a measured one on score alone:
    // wall time decides when either side is infinite
    assert(!Bench.firstBetterCalibrated(12.0, unmeasured, 10.0, clean,
      mSt, mMt), "slower unmeasured run must lose on wall time")
    assert(Bench.firstBetterCalibrated(9.0, unmeasured, 10.0, clean,
      mSt, mMt), "faster run wins when scores are not comparable")
    // two finite scores: the better worse-axis score wins regardless of
    // wall time (the r12 MT-thief shape)
    assert(!Bench.firstBetterCalibrated(5.0, Calib.Sample(510, 10), 9.0,
      Calib.Sample(480, 90), mSt, mMt))
    // a failed run never wins
    assert(!Bench.firstBetterCalibrated(-3.0, clean, 10.0, clean, mSt, mMt))
    assert(Bench.firstBetterCalibrated(10.0, clean, -3.0, clean, mSt, mMt))
  }

  test("probe min-of-subwindow stamps ride the sample and the bracket") {
    import Bench.Calib
    Calib.warm()
    val s = Calib.sample()
    // min stamps are real measurements bounded by the max axes
    assert(s.stMin > 0 && s.stMin <= s.stMops, s)
    assert(s.mtMin > 0 && s.mtMin <= s.mtGbps, s)
    for (k <- Seq("st_mops", "mt_gbps", "st_min", "mt_min"))
      assert(s.json.contains("\"" + k + "\""), k)
    // bracket combine: worst sub-window across both sides; -1 poisons
    val c = Calib.combine(Calib.Sample(100, 20, 80, 15),
      Calib.Sample(90, 25, 85, 12))
    assert(c == Calib.Sample(90, 20, 80, 12))
    assert(Calib.combine(Calib.Sample(100, 20), Calib.Sample(90, 25)).stMin
      == -1.0, "missing min on either side poisons the stamp")
    // the flag still fires on the max axes only — a cratered min with a
    // clean max is evidence of an intermittent episode, not a gate
    val (mSt, mMt) = (100.0, 20.0)
    assert(!Calib.suspect(Calib.Sample(98, 19, 10, 2), mSt, mMt))
  }

  test("scaleInconsistent: lower-copy-count row exceeding a higher one " +
    "is stamped") {
    // the r13 derivation, now arithmetic: span_stats 16.9 s at 10x vs
    // 6.9 s at 100x in the same session
    val flagged = Bench.scaleInconsistent(Seq(
      ("10x", 8, Seq("q_span" -> 16.9, "q_ok" -> 2.0)),
      ("30x", 30, Seq("q_ok" -> 3.0)),
      ("100x", 80, Seq("q_span" -> 6.9, "q_ok" -> 8.0))))
    assert(flagged == Set(("10x", "q_span")))
    // failed rows (negative sec) never vote on either side
    assert(Bench.scaleInconsistent(Seq(
      ("10x", 8, Seq("q" -> -5.0)),
      ("100x", 80, Seq("q" -> 1.0)))).isEmpty)
    assert(Bench.scaleInconsistent(Seq(
      ("10x", 8, Seq("q" -> 5.0)),
      ("100x", 80, Seq("q" -> -1.0)))).isEmpty)
    // monotone timings never flag; 30x can flag against 100x too
    assert(Bench.scaleInconsistent(Seq(
      ("10x", 8, Seq("q" -> 1.0)),
      ("30x", 30, Seq("q" -> 9.0)),
      ("100x", 80, Seq("q" -> 4.0)))) == Set(("30x", "q")))
    // two near-equal rows inside the 10% noise margin (a constant-
    // overhead pair at tiny sf) must not stamp a coin flip
    assert(Bench.scaleInconsistent(Seq(
      ("10x", 8, Seq("q" -> 2.85)),
      ("30x", 30, Seq("q" -> 2.81)))).isEmpty)
  }

  test("jstr escapes quotes, backslashes and control chars") {
    assert(Bench.jstr("""plain""") == "plain")
    assert(Bench.jstr("""a"b""") == """a\"b""")
    assert(Bench.jstr("""a\b""") == """a\\b""")
    assert(Bench.jstr("a\nb\tc") == "a\\u000ab\\u0009c")
    // a conf value with both must round-trip through a JSON parser shape
    val hostile = "x\"y\\z\n"
    val escaped = Bench.jstr(hostile)
    assert(!escaped.exists(_ < ' '))
    assert(escaped == "x\\\"y\\\\z\\u000a")
  }
}
