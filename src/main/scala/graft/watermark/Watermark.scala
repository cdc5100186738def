package graft.watermark

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** The v2.0 watermark document — field-for-field the reference's JSON schema
  * (src/core/simple_watermark_manager.py:465-499; fixture FIXTURES.md §B2).
  * One document per (source table, target), persisted as JSON.
  */
final case class MysqlState(
    last_timestamp: Option[String] = None,   // 'yyyy-MM-dd HH:mm:ss[.SSSSSS]'
    last_id: Option[Long] = None,
    status: String = "pending",              // pending | in_progress | success | failed
    error: Option[String] = None,
    total_rows: Long = 0,                    // cumulative across sessions
    last_session_rows: Long = 0,
    s3_files_created: Long = 0,              // cumulative
    last_session_files: Long = 0,
    last_updated: Option[String] = None)

final case class RedshiftState(
    total_rows: Long = 0,
    last_session_rows: Long = 0,
    status: String = "pending",
    error: Option[String] = None,
    last_loaded_files: List[String] = Nil,
    last_updated: Option[String] = None)

final case class WatermarkMeta(
    created_at: String,
    manual_override: Boolean = false,
    // highest COMMITTED extract-session tag: staged `session=<tag>` dirs with
    // a greater tag are orphans of a crashed extract (cursor never advanced
    // over them) and must not load — the next extract re-stages those rows.
    // None on documents predating this field → legacy pick-up-everything.
    last_session: Option[String] = None)

final case class Watermark(
    version: String,
    table_name: String,                      // scoped CONN:schema.table
    cdc_strategy: String,
    mysql_state: MysqlState,
    redshift_state: RedshiftState,
    processed_files: List[String],           // file-level dedup blacklist
    metadata: WatermarkMeta) {

  def processedFileSet: Set[String] = processed_files.toSet

  /** Record a completed extract session: advance cursor, add cumulative
    * counters (ref simple_watermark_manager.py:120-184 cumulative semantics).
    * `sessionTag` marks the staged `session=` dir as COMMITTED — the one
    * atomic point where the cursor advance and the session's loadability
    * become visible together. */
  def afterExtractSession(lastTs: Option[String], lastId: Option[Long],
                          sessionRows: Long, sessionFiles: Long,
                          now: String,
                          sessionTag: Option[String] = None): Watermark =
    copy(
      mysql_state = mysql_state.copy(
        last_timestamp = lastTs.orElse(mysql_state.last_timestamp),
        last_id = lastId.orElse(mysql_state.last_id),
        status = "success", error = None,
        total_rows = mysql_state.total_rows + sessionRows,
        last_session_rows = sessionRows,
        s3_files_created = mysql_state.s3_files_created + sessionFiles,
        last_session_files = sessionFiles,
        last_updated = Some(now)),
      metadata = metadata.copy(
        last_session = sessionTag.orElse(metadata.last_session)))

  /** Staged-file loadability gate: files under a `session=<tag>` dir with a
    * tag NEWER than the last committed session belong to a crashed extract
    * whose cursor never advanced — loading them would duplicate the next
    * extract's rows. Files outside session dirs (manual staging) and legacy
    * watermarks (no last_session) always load. */
  def isSessionLoadable(path: String): Boolean =
    metadata.last_session match {
      case None => true
      case Some(committed) =>
        "session=(\\d+)".r.findFirstMatchIn(path) match {
          // a non-numeric committed tag (hand-edited / foreign writer)
          // must not throw out of every listing filter — and must fail
          // CLOSED: with the high-water unreadable, a session dir cannot
          // be proven committed, and loading it risks duplicates (the
          // exactly-once contract outranks availability here; the skip
          // surfaces as rows_behind in parity, not silence)
          case Some(m) =>
            committed.toLongOption.exists(m.group(1).toLong <= _)
          case None => true
        }
    }

  def markExtractInProgress(now: String): Watermark =
    copy(mysql_state = mysql_state.copy(status = "in_progress",
      last_updated = Some(now)))

  def markExtractFailed(err: String, now: String): Watermark =
    copy(mysql_state = mysql_state.copy(status = "failed", error = Some(err),
      last_updated = Some(now)))

  /** Record a completed load session: blacklist the loaded files (deduped,
    * ref :203-249) and add cumulative row counters (:186-277). */
  def afterLoadSession(loadedFiles: Seq[String], sessionRows: Long,
                       now: String): Watermark = {
    val fresh = loadedFiles.filterNot(processedFileSet)
    copy(
      redshift_state = redshift_state.copy(
        total_rows = redshift_state.total_rows + sessionRows,
        last_session_rows = sessionRows,
        status = "success", error = None,
        last_loaded_files = fresh.toList,
        last_updated = Some(now)),
      processed_files = processed_files ++ fresh)
  }

  def markLoadFailed(err: String, now: String): Watermark =
    copy(redshift_state = redshift_state.copy(status = "failed",
      error = Some(err), last_updated = Some(now)))

  /** Reset cursor while PRESERVING the processed-files blacklist
    * (ref simple_watermark_manager.py:387-406). */
  def resetPreservingFiles(now: String): Watermark =
    copy(
      mysql_state = MysqlState(last_updated = Some(now)),
      redshift_state = RedshiftState(last_updated = Some(now),
        // blacklist-derived counters survive reset in the reference: the
        // blacklisted files' rows are still IN the warehouse (they never
        // reload), so zeroing the counter would fail the count-parity gate
        // on every subsequent sync
        total_rows = redshift_state.total_rows),
      metadata = metadata.copy(manual_override = true))
}

object Watermark {
  implicit val formats: Formats = DefaultFormats

  val Version = "2.0"

  /** Default all-zero document (ref :465-499 `_create_default_watermark`).
    * `last_session = "0"` from birth: a FIRST extract that crashes mid-write
    * leaves its orphan session excluded too (no legacy grace window). */
  def default(tableName: String, cdcStrategy: String, now: String): Watermark =
    Watermark(
      version = Version,
      table_name = tableName,
      cdc_strategy = cdcStrategy,
      mysql_state = MysqlState(last_updated = Some(now)),
      redshift_state = RedshiftState(),
      processed_files = Nil,
      metadata = WatermarkMeta(created_at = now, last_session = Some("0")))

  def toJson(w: Watermark): String = Serialization.writePretty(w)

  def fromJson(json: String): Watermark =
    JsonMethods.parse(json).extract[Watermark]
}
