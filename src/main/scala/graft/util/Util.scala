package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Generic retry with exponential backoff — the engine-side analog of the
  * reference's extract/load retry loops (src/backup/row_based.py:1279-1332,
  * CLI main.py:956-976). Driver-side only: Spark tasks already retry
  * internally (spark.task.maxFailures); this wraps whole sessions. */
object Retry {
  final case class RetryExhausted(attempts: Int, cause: Throwable)
      extends RuntimeException(s"failed after $attempts attempts", cause)

  def withBackoff[T](maxAttempts: Int = 3, initialDelayMs: Long = 500,
                     onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    var attempt = 0
    var delay = initialDelayMs
    while (true) {
      attempt += 1
      try return f
      catch {
        // NonFatal ONLY: a retry loop that swallows InterruptedException
        // defeats cancellation — runParallel's fut.cancel(true) interrupt
        // would be eaten here and the cancelled worker would re-run the
        // whole attempt (mutating watermarks after sync already returned).
        // Restore the interrupt flag and surface it; fatal VM errors
        // propagate untouched.
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxAttempts) throw RetryExhausted(attempt, e)
          onRetry(attempt, e)
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Per-session throughput metrics (ref get_backup_summary, base.py:33-91,
  * :1446-1471): rows, files, bytes, wall seconds, rows/s. */
final case class SessionMetrics(rows: Long, files: Long, bytes: Long,
                                seconds: Double) {
  def rowsPerSec: Double = if (seconds > 0) rows / seconds else 0.0
  def mbPerSec: Double = if (seconds > 0) bytes / 1e6 / seconds else 0.0
}

object SessionMetrics {
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}

/** Metadata-only Parquet accounting: row counts come from file footers, NOT a
  * second data scan — the writer-metrics fix for the round-1 double-read
  * (2x I/O on the 100 TB hot path). Footer reads are driver-side and O(files),
  * each a few KB. */
object ParquetFooters {
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile

  /** Rows in one parquet file, from its footer. Throws on corrupt/unreadable
    * files — used as the per-file validation gate in the loader. */
  def rowCount(file: String, conf: Configuration): Long = {
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val reader = ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }

  /** Total rows across files (footers only). */
  def totalRows(files: Seq[String], conf: Configuration): Long =
    files.map(rowCount(_, conf)).sum

  def fileSize(file: String, conf: Configuration): Long = {
    val p = new Path(file)
    p.getFileSystem(conf).getFileStatus(p).getLen
  }

  def totalBytes(files: Seq[String], conf: Configuration): Long =
    files.map(fileSize(_, conf)).sum

  /** ONE footer open per file: total rows plus (optionally) the exact MAX of
    * an integral column taken from the footer column statistics. Lets an
    * id-only cursor be recovered with ZERO data read after a write (int64
    * stats in parquet footers are exact, never truncated). Returns None for
    * the max when any row-bearing block lacks stats for the column — callers
    * must then fall back to a scan.
    *
    * The stats are only trusted when the column's LOGICAL type is absent or a
    * plain signed integer: a DECIMAL(p,s)-annotated INT64 column stores the
    * UNSCALED value in its stats, so taking it raw would jump the id cursor
    * far past the real ids and silently drop every later increment. */
  def scanStats(files: Seq[String], conf: Configuration,
                maxLongCol: Option[String] = None): (Long, Option[Long]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    def plainInteger(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean =
      c.getPrimitiveType.getLogicalTypeAnnotation match {
        case null => true
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
        case _ => false // DECIMAL/TIMESTAMP/etc: raw stats are not the value
      }
    var rows = 0L
    var max: Option[Long] = None
    var statsComplete = maxLongCol.isDefined
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { b =>
          rows += b.getRowCount
          if (statsComplete && b.getRowCount > 0) {
            val colMax = b.getColumns.asScala
              .find(_.getPath.toDotString == maxLongCol.get)
              .flatMap { c =>
                val st = c.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue ||
                    !plainInteger(c)) None
                else st.genericGetMax match {
                  case l: java.lang.Long    => Some(l.longValue())
                  case i: java.lang.Integer => Some(i.longValue())
                  case _                    => None
                }
              }
            colMax match {
              case Some(m) => max = Some(max.fold(m)(math.max(m, _)))
              case None    => statsComplete = false
            }
          }
        }
      } finally reader.close()
    }
    (rows, if (statsComplete) max else None)
  }
}

/** Recursive parquet listing shared by the extractor and loader: one pass
  * over the LocatedFileStatus stream yields (path, bytes, mtime) with ZERO
  * extra namenode/S3 RPCs, skipping files under hidden path segments
  * (dot-prefixed, or underscore-prefixed non-partition dirs — Spark's own
  * listing rule) so crash-recovery artifacts like `.__old_<b>` never enter
  * row/byte accounting. */
object FsListing {
  def parquetFilesMeta(dir: String,
                       conf: org.apache.hadoop.conf.Configuration)
      : Seq[(String, Long, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Nil
    else {
      val rootUri = fs.getFileStatus(path).getPath.toUri.getPath
      def hiddenSegment(name: String): Boolean =
        name.startsWith(".") || (name.startsWith("_") && !name.contains("="))
      def underHidden(p: org.apache.hadoop.fs.Path): Boolean = {
        var cur = p
        while (cur != null && cur.toUri.getPath != rootUri) {
          if (hiddenSegment(cur.getName)) return true
          cur = cur.getParent
        }
        false
      }
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet") && !underHidden(f.getPath))
          buf += ((f.getPath.toString, f.getLen, f.getModificationTime))
      }
      buf.sortBy(_._1).toSeq
    }
  }
}
