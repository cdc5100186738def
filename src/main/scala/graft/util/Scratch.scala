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
  * footprint: columnar-compressed bytes on the scratch filesystem, cleaned
  * at JVM exit.
  *
  * Scratch root: `spark.graft.scratchDir` if set (on a multi-executor
  * cluster this MUST be a shared filesystem all executors reach — the same
  * contract as Spark's own reliable-checkpoint dir), else `java.io.tmpdir`
  * (correct for local[n], where driver and executors share the machine).
  */
object Scratch {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]
  @volatile private var hooked = false

  private def registerForCleanup(dir: String): Unit = {
    dirs.add(dir)
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupAll()))
        hooked = true
      }
    }
  }

  /** Delete every scratch dir written so far (also runs at JVM shutdown).
    * Safe to call while scans of them are no longer live. */
  def cleanupAll(): Unit = {
    var d = dirs.poll()
    while (d != null) {
      try deleteRecursive(new java.io.File(d)) catch { case _: Throwable => () }
      d = dirs.poll()
    }
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete()
    ()
  }

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
    registerForCleanup(dir)
    spark.read.parquet(dir)
  }
}
