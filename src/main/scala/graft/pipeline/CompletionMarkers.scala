package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import graft.watermark.Watermark

/** Per-sync completion markers — the external-orchestrator contract
  * (ref src/cli/airflow_integration.py:154-219 `S3CompletionMarker`,
  * src/cli/completion_marker_utils.py): after every sync, each table gets a
  * small JSON artifact whose KEY encodes date + table + terminal status
  * (`<root>/<yyyyMMdd>/sync_<table>_<STATUS>.json`), so an Airflow-style
  * sensor can poll one deterministic path for "today's sync of table X
  * succeeded" without parsing anything; the body carries the
  * machine-readable sync facts (rows, files, watermark cursor, error) a
  * downstream job needs to gate on.
  *
  * Failure semantics mirror the reference: a failed table writes a
  * `_FAILED` marker (sensors watching `_SUCCESS` keep waiting, monitoring
  * can alert on the failure artifact), and a crash writes NOTHING — markers
  * are emitted strictly AFTER the per-table locks release, from the final
  * report, so a half-run can never signal completion. Writes go through a
  * temp-file + rename so a sensor never reads a torn marker. */
object CompletionMarkers {

  private val mapper = new ObjectMapper()

  /** Marker directory for one run date. */
  def dateDir(root: String, date: java.time.LocalDate): String =
    s"$root/${date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)}"

  private def writeJson(conf: Configuration, dir: String, name: String,
                        body: ObjectNode): String = {
    val fs = new Path(dir).getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    val tmp = new Path(dir, s".$name.tmp")
    val dst = new Path(dir, name)
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(body))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"marker rename failed: $tmp -> $dst")
    dst.toString
  }

  /** Write one table's marker from its final report + committed watermark.
    * Returns the marker path. */
  def writeTable(conf: Configuration, root: String, pipeline: String,
                 executionId: String, report: TableReport,
                 wm: Option[Watermark],
                 date: java.time.LocalDate = java.time.LocalDate.now(),
                 now: java.time.Instant = java.time.Instant.now()): String = {
    val status = if (report.ok) "SUCCESS" else "FAILED"
    val o = mapper.createObjectNode()
    o.put("table", report.table.scoped)
    o.put("pipeline", pipeline)
    o.put("status", status)
    o.put("execution_id", executionId)
    o.put("completion_time", now.toString)
    o.put("rows", report.rows)
    o.put("files",
      report.load.map(_.files).orElse(report.extract.map(_.files)).getOrElse(0L))
    o.put("seconds", report.seconds)
    report.error.foreach(o.put("error", _))
    wm.foreach { w =>
      val wo = o.putObject("watermark")
      w.mysql_state.last_id.foreach(wo.put("last_id", _))
      w.mysql_state.last_timestamp.foreach(wo.put("last_timestamp", _))
      wo.put("total_rows", w.redshift_state.total_rows)
    }
    writeJson(conf, dateDir(root, date),
      s"sync_${report.table.safeName}_$status.json", o)
  }

  /** Write the whole run's pipeline-level marker
    * (ref create_pipeline_marker, airflow_integration.py:190-219). */
  def writePipeline(conf: Configuration, root: String,
                    report: PipelineReport, executionId: String,
                    date: java.time.LocalDate = java.time.LocalDate.now(),
                    now: java.time.Instant = java.time.Instant.now()): String = {
    val status = if (report.allOk) "SUCCESS" else "FAILED"
    val o = mapper.createObjectNode()
    o.put("pipeline", report.pipeline)
    o.put("status", status)
    o.put("execution_id", executionId)
    o.put("completion_time", now.toString)
    o.put("tables_count", report.tables.size)
    o.put("total_rows", report.totalRows)
    o.put("seconds", report.seconds)
    val arr = o.putArray("tables")
    report.tables.foreach(t =>
      arr.add(s"${t.table.scoped}:${if (t.ok) "SUCCESS" else "FAILED"}"))
    val clean = report.pipeline.replaceAll("[^A-Za-z0-9_]", "_")
    writeJson(conf, dateDir(root, date), s"pipeline_${clean}_$status.json", o)
  }
}
