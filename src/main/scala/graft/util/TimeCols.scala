package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Columns over the fixture's `TIMESTAMP_NTZ` event times.
  *
  * The events table stores wall-clock timestamps with no zone
  * (parquet `timestamp[us]`, UTC by fixture convention — the reference's
  * MySQL DATETIME analog, src/backup/row_based.py's `last_updated_at`).
  * Converting NTZ wall time to an absolute instant via `cast(... as
  * timestamp)` would silently depend on `spark.sql.session.timeZone`; these
  * helpers instead measure the wall-time distance from the NTZ epoch, which
  * is timezone-independent and matches engines that treat naive timestamps
  * as UTC (DuckDB's `epoch_us`). Both stay inside whole-stage codegen.
  */
object TimeCols {
  private val EpochNtz = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

  /** SQL fragment for the epoch-µs of a TIMESTAMP_NTZ column — for embedding
    * in larger `expr(...)` strings (e.g. integer `DIV` bucketing). */
  def epochUsSql(colName: String): String =
    s"timestampdiff(MICROSECOND, $EpochNtz, $colName)"

  /** Epoch microseconds of a TIMESTAMP_NTZ column (UTC wall-time convention). */
  def epochUs(colName: String): Column = expr(epochUsSql(colName))

  /** The NTZ column as an absolute TIMESTAMP (instant), timezone-independent.
    * Use for event-time streaming ops (watermarks, window/session_window). */
  def utcTs(colName: String): Column = timestamp_micros(epochUs(colName))
}
