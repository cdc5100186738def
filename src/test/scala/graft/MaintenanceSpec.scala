package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.load.Maintenance

/** s3clean retention + newest-first trim (K7/O4). */
class MaintenanceSpec extends AnyFunSuite with SparkTestBase {

  private def mkFiles(dir: String, names: Seq[String]): Seq[java.io.File] =
    names.zipWithIndex.map { case (n, i) =>
      val f = new java.io.File(dir, n)
      java.nio.file.Files.writeString(f.toPath, s"data$i")
      // stagger mtimes: older files first
      f.setLastModified(System.currentTimeMillis() - (names.size - i) * 60000L)
      f
    }

  test("clean deletes files older than cutoff, keeps protected newest") {
    val dir = tmpDir("clean")
    mkFiles(dir, Seq("a.parquet", "b.parquet", "c.parquet", "d.parquet"))
    // cutoff 2.5 minutes ago → a,b are older; keepNewest=0
    val cutoff = System.currentTimeMillis() - 150000L
    val dry = Maintenance.clean(dir, cutoff, dryRun = true)
    assert(dry.deleted.map(f => f.split('/').last).sorted ==
      Seq("a.parquet", "b.parquet"))
    assert(new java.io.File(dir, "a.parquet").exists) // dry-run deletes nothing
    val real = Maintenance.clean(dir, cutoff)
    assert(real.deleted.size == 2 && real.bytesFreed > 0)
    assert(!new java.io.File(dir, "a.parquet").exists)
    assert(new java.io.File(dir, "c.parquet").exists)
  }

  test("keepNewest floor protects recent files regardless of age") {
    val dir = tmpDir("keep")
    mkFiles(dir, Seq("x.parquet", "y.parquet", "z.parquet"))
    // everything is older than now, but keep the 2 newest
    val report = Maintenance.clean(dir, System.currentTimeMillis(), keepNewest = 2)
    assert(report.deleted.map(_.split('/').last) == Seq("x.parquet"))
  }

  test("newestFirst returns the most recent N") {
    val dir = tmpDir("trim")
    val files = mkFiles(dir, Seq("old1", "old2", "new1", "new2"))
    val trimmed = Maintenance.newestFirst(files.map(_.getPath), 2)
    assert(trimmed.map(_.split('/').last).toSet == Set("new1", "new2"))
    // under the cap: unchanged
    assert(Maintenance.newestFirst(files.map(_.getPath), 10).size == 4)
  }

  test("newestFirst RPC-free overload trims by the provided mtimes") {
    val listed = Seq(("a", 100L), ("b", 300L), ("c", 200L))
    assert(Maintenance.newestFirst(listed, 2) == Seq("b", "c"))
    assert(Maintenance.newestFirst(listed, 5) == Seq("a", "b", "c"))
  }

  test("scratch scope: dirs written inside a run scope are swept at release") {
    val s = spark
    import s.implicits._
    import graft.util.Scratch
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // scope tier: written between retain and release → reclaimed, with
    // bytes accounted — the per-sync lifecycle (a long-lived pipeline
    // session must not grow scratch until JVM exit)
    Scratch.retain()
    val scoped = Scratch.materialize(df, "scope_test")
    assert(scoped.count() == 2)
    val beforeBytes = Scratch.registeredBytes
    assert(beforeBytes > 0L, "written parquet must be size-accounted")
    val file = scoped.inputFiles.head.stripPrefix("file:")
    assert(new java.io.File(file).exists())
    // nested scope (concurrent sync): the inner release must NOT sweep
    Scratch.retain()
    assert(Scratch.release() == 0L)
    assert(new java.io.File(file).exists(), "swept while a scope was active")
    val reclaimed = Scratch.release()
    assert(reclaimed > 0L)
    assert(!new java.io.File(file).exists(), "scope scratch must be deleted")
    // global tier: written OUTSIDE any scope → survives scope sweeps
    // (ad-hoc callers may hold the relation indefinitely)
    val global = Scratch.materialize(df, "global_test")
    val gfile = global.inputFiles.head.stripPrefix("file:")
    Scratch.retain()
    Scratch.release()
    assert(new java.io.File(gfile).exists(),
      "out-of-scope scratch must keep the JVM-exit lifecycle")
    assert(global.count() == 2)
  }

  test("scratch materialize: tiny output from a wide producer collapses to the 4-file floor") {
    // the wiring check behind LayoutSpec's fileCount formula test: a tiny
    // relation computed by a 64-partition producer must NOT write 64
    // KB-files (the small-files spray) — it lands on the ramp's floor
    val s = spark
    import graft.util.Scratch
    val wide = s.range(0, 1000, 1, 64).toDF("id")
    val m = Scratch.materialize(wide, "ramp_wiring")
    val files = m.inputFiles.length
    assert(files == 4, s"expected the 4-file floor, got $files")
    assert(m.count() == 1000)
  }

  test("scratch scope: ad-hoc writes on OTHER threads never join a sync's scope") {
    val s = spark
    import s.implicits._
    import graft.util.Scratch
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // the daemon scenario: a sync holds a scope on THIS thread while an
    // ad-hoc caller materializes from a different thread — the ad-hoc dir
    // must land in the JVM-exit tier, not be deleted at the sync's release
    // (the former process-global counter tagged it into the scope)
    Scratch.retain()
    val swept = Scratch.materialize(df, "sync_side")
    val sweptFile = swept.inputFiles.head.stripPrefix("file:")
    var adhocFile: String = null
    val t = new Thread(() => {
      val adhoc = Scratch.materialize(df, "adhoc_side")
      adhocFile = adhoc.inputFiles.head.stripPrefix("file:")
    })
    t.start(); t.join()
    assert(Scratch.release() > 0L)
    assert(!new java.io.File(sweptFile).exists(), "sync scratch must sweep")
    assert(new java.io.File(adhocFile).exists(),
      "ad-hoc scratch from another thread must survive the sync's release")
    // worker threads tagged in via the scope TOKEN do join the sweep
    val scope = Scratch.retain()
    var workerFile: String = null
    val w = new Thread(() => {
      scope.enter()
      try {
        val wd = Scratch.materialize(df, "worker_side")
        workerFile = wd.inputFiles.head.stripPrefix("file:")
      } finally scope.exit()
    })
    w.start(); w.join()
    assert(Scratch.release() > 0L)
    assert(!new java.io.File(workerFile).exists(),
      "scope-tagged worker scratch must sweep with the scope")
  }
}
