package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's round-12 reproducibility counters. These are the
  * fields that adjudicate a cross-run divergence (the r11 driver-vs-builder
  * dispute: 6-24× CPU on identical code/data with nothing in the artifact
  * to explain it), so their parsers must return sane values on the
  * platforms the bench runs on — and degrade to the documented -1 sentinel,
  * never throw, anywhere else. */
class BenchCountersSpec extends AnyFunSuite {

  test("host/process counters return sane Linux values and advance") {
    val busy0 = Bench.hostBusyJiffies
    val cpu0 = Bench.procCpuNs
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
    assert(Bench.memAvailableMb > 0)
    assert(Bench.codeCacheUsedMb >= 0)
    val (gcCount, gcMs, jitMs) = Bench.procCounters
    assert(gcCount >= 0 && gcMs >= 0)
    assert(jitMs >= -1) // -1 = monitoring unsupported, documented sentinel
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
      jitSec = 0.25, hostBusySec = 9.0, procCpuSec = 8.0).jsonWith(2.5)
    for (k <- Seq("proc_gc_sec", "proc_gc_count", "jit_sec", "host_busy_sec",
      "proc_cpu_sec", "foreign_cpu_sec", "load_suspect"))
      assert(j.contains("\"" + k + "\""), k)
    assert(j.contains("\"foreign_cpu_sec\":1.000"))
  }
}
