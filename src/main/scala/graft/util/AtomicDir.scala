package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Crash-convergent directory replacement — ONE definition of the
  * write-new + double-rename swap shared by the loader's merge/derived
  * sinks and the streaming fold maintenance. The protocol:
  *
  *   1. entry recovery: a backup with no live dir means a previous run died
  *      between the two renames — restore it (the backup holds the ONLY
  *      copy); a backup WITH a live dir is stale — drop it;
  *   2. write the full replacement into `<path>.__new`;
  *   3. rename live → `.__old`, `.__new` → live, verify, delete `.__old`.
  *
  * A crash at any point converges on the next entry. `stateJson`, when
  * given, is committed INSIDE the swapped directory
  * (`_graft_postops.json`, underscore-hidden from Spark's listings), so
  * data and its fold cursor become visible atomically together — the
  * mechanism behind the post-op and streaming folds' exactly-once replay
  * guards. */
object AtomicDir {

  val StateFile = "_graft_postops.json"

  /** Converge a directory-swap commit interrupted by a crash: if the live
    * path is gone but its backup survives, the crash hit between the two
    * renames — restore the backup. If both exist, the install completed and
    * the backup is stale — discard it. Never touches anything when no
    * backup exists. */
  def recoverSwap(fs: FileSystem, live: Path, backup: Path): Unit = {
    if (!fs.exists(backup)) return
    if (fs.exists(live)) {
      fs.delete(backup, true) // install completed; backup is stale
      ()
    } else if (!fs.rename(backup, live)) {
      throw new java.io.IOException(
        s"crash recovery failed: could not restore $backup -> $live")
    }
  }

  /** Double-rename install of `newPath` over `tgt` with an `oldPath`
    * backup: live → backup, new → live, verify, drop backup. */
  def installSwap(fs: FileSystem, tgt: Path, newPath: Path,
                  oldPath: Path): Unit = {
    if (fs.exists(tgt) && !fs.rename(tgt, oldPath))
      throw new java.io.IOException(s"swap failed: $tgt -> $oldPath")
    if (!fs.rename(newPath, tgt)) {
      fs.rename(oldPath, tgt) // roll back
      throw new java.io.IOException(s"swap failed: $newPath -> $tgt")
    }
    // the old copy is deleted only AFTER the new one is verified installed
    if (!fs.exists(tgt))
      throw new java.io.IOException(s"swap verification failed: $tgt absent")
    fs.delete(oldPath, true)
    ()
  }

  /** Atomically replace the directory at `path` with `df` (+ optional
    * committed state). Returns the installed row count (parquet footers —
    * no data scan). */
  def replace(spark: SparkSession, path: String, df: DataFrame,
              compression: String = "snappy",
              stateJson: Option[String] = None): Long = {
    val tgt = new Path(path)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newPath = new Path(path + ".__new")
    val oldPath = new Path(path + ".__old")
    recoverSwap(fs, tgt, oldPath)
    fs.delete(newPath, true)
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression).parquet(newPath.toString)
    stateJson.foreach { s =>
      val out = fs.create(new Path(newPath, StateFile), true)
      try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val rows = ParquetFooters.totalRows(
      FsListing.parquetFilesMeta(newPath.toString,
        spark.sparkContext.hadoopConfiguration).map(_._1),
      spark.sparkContext.hadoopConfiguration)
    installSwap(fs, tgt, newPath, oldPath)
    rows
  }

  /** The committed state of a directory written by [[replace]] — read from
    * the live dir, falling back to the `.__old` backup when only it exists
    * (a crash between the swap renames). READ-ONLY on purpose: an earlier
    * version ran [[recoverSwap]] here, but a mutating rename from an
    * UNLOCKED reader (a status/CLI call) racing a writer mid-[[installSwap]]
    * could restore the backup between the writer's two renames and make the
    * writer's commit fail — recovery belongs to the lock-holding entry
    * points ([[replace]] recovers at entry; so do the loader sessions). */
  def readState(spark: SparkSession, path: String): Option[String] = {
    val tgt = new Path(path)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir =
      if (fs.exists(tgt)) tgt
      else new Path(path + ".__old") // mid-swap crash: the backup is the data
    val p = new Path(dir, StateFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }
}
