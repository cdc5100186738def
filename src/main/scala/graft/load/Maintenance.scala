package graft.load

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Staging-area maintenance: retention cleaning and newest-first trims —
  * the reference's `s3clean` verb (s3_manager.py:555-615 batch delete; CLI
  * main.py:2205-2410) and newest-first file cap
  * (gemini_redshift_loader.py:488-492), as filesystem ops over any
  * Hadoop-compatible store (local/HDFS/S3A).
  *
  * Scale: listing + deletion is driver-side metadata work, O(files); data
  * never moves. Deletes are issued per-file through the FS client, which on
  * S3A batches to multi-object DELETE under the hood.
  */
object Maintenance {

  final case class CleanReport(scanned: Int, deleted: Seq[String],
                               keptNewest: Int, bytesFreed: Long)

  private def listFiles(dir: String, conf: Configuration): Seq[(Path, Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer[(Path, Long, Long)]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) buf += ((f.getPath, f.getModificationTime, f.getLen))
    }
    buf.toSeq
  }

  /** Delete staged files older than `olderThanMs` (epoch millis cutoff),
    * optionally keeping at least `keepNewest` most-recent files regardless of
    * age (the reference's retention + safety floor). Dry-run lists only. */
  def clean(dir: String, olderThanMs: Long, keepNewest: Int = 0,
            dryRun: Boolean = false,
            conf: Configuration = new Configuration()): CleanReport = {
    val all = listFiles(dir, conf).sortBy(-_._2) // newest first
    val protectedSet = all.take(keepNewest).map(_._1).toSet
    val victims = all.filter { case (p, mtime, _) =>
      mtime < olderThanMs && !protectedSet.contains(p)
    }
    var freed = 0L
    // report only what was ACTUALLY removed: a concurrent deletion or an FS
    // refusal returns false, and counting it as freed bytes would make the
    // ops report claim space that is still occupied
    val deleted = victims.flatMap { case (p, _, len) =>
      val gone = dryRun || p.getFileSystem(conf).delete(p, false)
      if (gone) { freed += len; Some(p.toString) } else None
    }
    CleanReport(all.size, deleted, keepNewest.min(all.size), freed)
  }

  /** Newest-first trim (O4): return the `maxFiles` most recently modified
    * files of a listing — the reference caps a load session at the newest N
    * files so a huge backlog can't starve fresh data.
    *
    * Prefer the (path, mtime) overload when the caller just listed the
    * files: the recursive listing's LocatedFileStatus already carried the
    * mtime, and this form re-stats every file — O(files) extra namenode/S3
    * RPCs per session on a large backlog. */
  def newestFirst(files: Seq[String], maxFiles: Int,
                  conf: Configuration = new Configuration()): Seq[String] = {
    if (files.size <= maxFiles) return files
    newestFirst(files.map { f =>
      val p = new Path(f)
      (f, p.getFileSystem(conf).getFileStatus(p).getModificationTime)
    }, maxFiles)
  }

  /** RPC-free form: trim an already-listed (path, modificationTime) set. */
  def newestFirst(files: Seq[(String, Long)], maxFiles: Int): Seq[String] =
    if (files.size <= maxFiles) files.map(_._1)
    else files.sortBy(-_._2).take(maxFiles).map(_._1)
}
