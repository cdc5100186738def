package graft.model

/** Core data model for the graft engine.
  *
  * Mirrors the reference's table addressing and per-table CDC configuration
  * (reference: src/core/configuration_manager.py:23-120 `TableConfig` /
  * `PipelineConfig`; scoped table names src/backup/base.py:891-912), re-expressed
  * as plain Scala ADTs that drive Catalyst predicates instead of SQL strings.
  */

/** A source table addressed as `[connection:]schema.table` ("scoped name").
  * Reference: src/backup/base.py:891-912 `_extract_mysql_table_name`;
  * scope required in v1.2.0 (src/core/flexible_schema_manager.py:65-79).
  */
final case class TableId(connection: String, schema: String, table: String) {
  /** Canonical scoped form `CONN:schema.table`. */
  def scoped: String = s"$connection:$schema.$table"
  /** Unscoped `schema.table`. */
  def qualified: String = s"$schema.$table"
  /** Filesystem/S3-safe name: `conn_schema_table` (lowercased, like the
    * reference's watermark key scoping, simple_watermark_manager.py:551-574).
    * When sanitization ALTERED the name, an md5 tag disambiguates it —
    * otherwise `s.order-items` and `s.order_items` would share one staging
    * dir and one warehouse directory, and either table's replace/merge swap
    * would destroy the other's data. Clean names keep their readable form. */
  def safeName: String =
    Names.taggedSanitize(s"${connection}_${schema}_$table")
}

/** THE filesystem-name sanitization convention — one definition for every
  * state-keyed name (staging/warehouse dirs via [[TableId.safeName]],
  * watermark/lock documents via `WatermarkStore.docPath`), so the
  * disambiguation rules cannot drift between the stores that must agree.
  *
  * NOTE: unifying on this convention RENAMED watermark documents written
  * before round 5 (they always carried a tag; clean names now don't) — a
  * deliberate one-time, pre-release break. A deployment with live state
  * would need a rename migration of `*_<md5>.json` docs, or its cursors
  * silently reset and the next sync re-extracts from scratch. */
object Names {
  /** Lowercase + sanitize to `[a-z0-9_]`. When sanitization ALTERED the
    * (lowercased) name, an 8-hex md5 tag of it disambiguates — otherwise
    * `s.order-items` and `s.order_items` would share one directory/document
    * and either table's swap or cursor write would destroy the other's
    * state. Clean names keep their readable, tag-free form. */
  def taggedSanitize(raw0: String): String = {
    val raw = raw0.toLowerCase
    val safe = raw.replaceAll("[^a-z0-9_]", "_")
    if (safe == raw) safe
    else {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(8)
      s"${safe}_$tag"
    }
  }
}

object TableId {
  /** Parse `[connection:]schema.table`; connection defaults to "default". */
  def parse(scoped: String): TableId = {
    val (conn, rest) = scoped.split(":", 2) match {
      case Array(c, r) => (c, r)
      case Array(r)    => ("default", r)
    }
    rest.split("\\.", 2) match {
      case Array(s, t) => TableId(conn, s, t)
      case Array(t)    => TableId(conn, "default", t)
    }
  }
}

/** CDC strategy kinds — the 5-way ADT mirroring the reference's strategy
  * registry (src/core/cdc_strategy_engine.py:99-130, factory :872-933). */
sealed trait CdcStrategyKind { def name: String }
object CdcStrategyKind {
  case object TimestampOnly extends CdcStrategyKind { val name = "timestamp_only" }
  case object Hybrid        extends CdcStrategyKind { val name = "hybrid" }
  case object IdOnly        extends CdcStrategyKind { val name = "id_only" }
  case object FullSync      extends CdcStrategyKind { val name = "full_sync" }
  case object CustomSql     extends CdcStrategyKind { val name = "custom_sql" }
  val all: Seq[CdcStrategyKind] = Seq(TimestampOnly, Hybrid, IdOnly, FullSync, CustomSql)
  def fromName(n: String): CdcStrategyKind =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown cdc strategy: $n"))
}

/** full_sync sub-modes (cdc_strategy_engine.py:581-768). In Spark, `paginate`
  * dissolves into partitioned scans; kept for config parity. */
sealed trait FullSyncMode { def name: String }
object FullSyncMode {
  case object Replace  extends FullSyncMode { val name = "replace" }
  case object Append   extends FullSyncMode { val name = "append" }
  case object Paginate extends FullSyncMode { val name = "paginate" }
  def fromName(n: String): FullSyncMode = n match {
    case "replace" => Replace
    case "append" => Append
    case "paginate" => Paginate
    case other => throw new IllegalArgumentException(s"unknown full_sync mode: $other")
  }
}

/** Per-table CDC configuration (configuration_manager.py:23-43 `TableConfig`). */
final case class CdcConfig(
    strategy: CdcStrategyKind,
    timestampColumn: Option[String] = None,   // cdc_timestamp_column
    idColumn: Option[String] = None,          // cdc_id_column
    ordering: Seq[String] = Nil,              // cdc_ordering (defaults derived)
    additionalWhere: Option[String] = None,   // ANDed static predicate (P6)
    customSql: Option[String] = None,         // custom_sql strategy template (S5)
    fullSyncMode: FullSyncMode = FullSyncMode.Replace,
    timestampIsUnixEpoch: Boolean = false,    // UNIX-ts int column (S1 variant)
    batchSize: Int = 10000,                   // rows per staged file (settings.py:153)
    maxRowsPerRun: Option[Long] = None        // chunk ceiling analog
) {
  def requiresTruncateBeforeLoad: Boolean =
    strategy == CdcStrategyKind.FullSync && fullSyncMode == FullSyncMode.Replace
}

/** Partition layout strategies for the staged Parquet sink
  * (s3_manager.py:129-223 `generate_s3_key`; selection base.py:382-397). */
sealed trait PartitionStrategy { def name: String }
object PartitionStrategy {
  /** `{prefix}/year=Y/month=M/day=D/hour=H/...` (s3_manager.py:179-188) */
  case object Datetime extends PartitionStrategy { val name = "datetime" }
  /** `{prefix}/table={t}/year=Y/month=M/day=D/...` (s3_manager.py:189-199) */
  case object ByTable extends PartitionStrategy { val name = "table" }
  /** `{prefix}/year=Y/month=M/table={t}/day=D/hour=H/...` (s3_manager.py:200-211) */
  case object Hybrid extends PartitionStrategy { val name = "hybrid" }
  def fromName(n: String): PartitionStrategy = n match {
    case "datetime" => Datetime
    case "table" => ByTable
    case "hybrid" => Hybrid
    case other => throw new IllegalArgumentException(s"unknown partition strategy: $other")
  }
}

/** Table role — 'fact' vs 'dimension' (configuration_manager.py:30
  * `TableConfig.table_type`). Dimensions are broadcast-joined and synced with
  * full_sync replace. */
sealed trait TableType
object TableType {
  case object Fact extends TableType
  case object Dimension extends TableType
}
