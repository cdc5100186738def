package graft.extract

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.model._
import graft.util.{ParquetFooters, SessionMetrics}
import graft.watermark.{Watermark, WatermarkStore}

/** Result of one extract session (ref get_backup_summary, base.py:1446-1471). */
final case class ExtractResult(table: TableId, rows: Long, files: Long,
                               cursor: Cursor, stagedPath: String,
                               metrics: SessionMetrics)

/** Stage-1 extractor: incremental scan → partitioned Parquet staging →
  * per-session watermark commit. The Spark-native replacement for the
  * reference's chunk loop (src/backup/row_based.py:294-568):
  *
  *  - the chunked LIMIT/OFFSET pagination dissolves into a single partitioned
  *    scan (Catalyst pushes the CDC predicate into the file/JDBC scan);
  *  - per-batch watermark commits become one atomic commit per session, with
  *    resume correctness carried by the (ts,id) keyset predicate itself;
  *  - the MAX(id) "ceiling" snapshot (infinite-sync guard,
  *    row_based.py:278-292) is preserved as a semantic predicate.
  *
  * Scale: no collect of data rows — the only driver-side values are the 1-row
  * cursor aggregate and file listing. Output partitioning is the reference's
  * Hive-style layout (s3_manager.py:129-223), which is exactly Spark partition
  * pruning's native format.
  */
final class Extractor(val store: WatermarkStore, stagingRoot: String,
                      partitionStrategy: PartitionStrategy = PartitionStrategy.ByTable,
                      targetFileRows: Long = 5000000) {

  def stagingDir(id: TableId): String = partitionStrategy match {
    case PartitionStrategy.ByTable => s"$stagingRoot/table=${id.table}"
    case _ => s"$stagingRoot/${id.table}"
  }

  /** Run one extract session for `id`, reading from `df` (already sourced). */
  def extract(spark: SparkSession, id: TableId, df: DataFrame,
              config: CdcConfig, ceiling: Option[Long] = None): ExtractResult = {
    val strategy = CdcStrategy(config)
    val wm = store.getOrCreate(id.scoped, config.strategy.name)
    store.save(wm.markExtractInProgress(store.nowString()))
    try {
      val cursor = Cursor(wm.mysql_state.last_timestamp, wm.mysql_state.last_id)
      val scan = strategy.scanSpec(cursor)
      // ceiling: snapshot MAX(id) bound so rows arriving mid-extract are left
      // for the next session (ref row_based.py:278-292, 525-536)
      val bounded = (ceiling, config.idColumn) match {
        case (Some(c), Some(idCol)) => scan.copy(predicate =
          Some(scan.predicate.map(_ && col(idCol) <= lit(c))
            .getOrElse(col(idCol) <= lit(c))))
        case _ => scan
      }
      val batch = bounded(df)

      val outDir = stagingDir(id)
      val partitionCols = datetimePartitionCols(batch, config)
      val sessionTag = System.nanoTime() // ms-resolution collided for rapid sequential sessions
      val sessionDir = s"$outDir/session=$sessionTag"

      val writer = partitionCols match {
        case Some((withParts, cols)) =>
          withParts.write.partitionBy(cols: _*)
        case None => batch.write
      }
      val (_, secs) = SessionMetrics.timed {
        writer
          .mode(SaveMode.Append)
          .option("compression", "snappy")
          // bound file size instead of per-batch files (small-file fix the
          // reference left as roadmap, PERFORMANCE_OPTIMIZATION_GUIDE.md:190-199)
          .option("maxRecordsPerFile", targetFileRows.toString)
          .parquet(sessionDir)
      }

      // Post-write accounting is METADATA-ONLY: row/byte counts come from the
      // parquet footers (no second data scan). The cursor agg below reads only
      // the ts/id columns of the session output — a pruned columnar scan, not
      // a re-read of the batch.
      val conf = spark.sparkContext.hadoopConfiguration
      val fileList = listParquetFiles(spark, sessionDir)
      val rows = ParquetFooters.totalRows(fileList, conf)
      val bytes = ParquetFooters.totalBytes(fileList, conf)
      val files = fileList.size.toLong
      val next =
        if (rows > 0) strategy.extractCursor(spark.read.parquet(sessionDir))
        else cursor

      val done = store.getOrCreate(id.scoped, config.strategy.name)
        .afterExtractSession(next.lastTimestamp.orElse(cursor.lastTimestamp),
          next.lastId.orElse(cursor.lastId), rows, files, store.nowString())
      store.save(done)
      ExtractResult(id, rows, files, next, sessionDir,
        SessionMetrics(rows, files, bytes, secs))
    } catch {
      case e: Throwable =>
        val failed = store.getOrCreate(id.scoped, config.strategy.name)
          .markExtractFailed(Option(e.getMessage).getOrElse(e.getClass.getName),
            store.nowString())
        store.save(failed)
        throw e
    }
  }

  /** datetime/hybrid layouts derive year/month/day partition columns from the
    * CDC timestamp (ref generate_s3_key, s3_manager.py:179-211). */
  private def datetimePartitionCols(df: DataFrame, config: CdcConfig)
      : Option[(DataFrame, Seq[String])] =
    (partitionStrategy, config.timestampColumn) match {
      case (PartitionStrategy.Datetime | PartitionStrategy.Hybrid, Some(ts)) =>
        val withParts = df
          .withColumn("year", year(col(ts)))
          .withColumn("month", month(col(ts)))
          .withColumn("day", dayofmonth(col(ts)))
        Some((withParts, Seq("year", "month", "day")))
      case _ => None
    }

  private[extract] def listParquetFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Nil
    else {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf.toSeq
    }
  }

  /** Snapshot MAX(id) ceiling at session start (ref row_based.py:781-845). */
  def snapshotCeiling(df: DataFrame, idCol: String): Option[Long] = {
    val row = df.agg(max(col(idCol)).cast("long")).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }
}
