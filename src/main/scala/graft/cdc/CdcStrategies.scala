package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** The advancing cursor extracted from a batch: (last_timestamp, last_id). */
final case class Cursor(lastTimestamp: Option[String] = None,
                       lastId: Option[Long] = None)

/** A rendered incremental scan: predicate + ordering + optional row cap.
  * This is the Catalyst analog of the reference's generated SQL "IR"
  * (src/core/cdc_strategy_engine.py `build_query` implementations). The
  * predicate is pushed down by Catalyst to the Parquet/JDBC scan — the
  * reference had to hand-render WHERE clauses to get the same effect.
  */
final case class ScanSpec(predicate: Option[Column], orderBy: Seq[Column],
                          limit: Option[Long]) {
  def apply(df: DataFrame): DataFrame = {
    val filtered = predicate.map(df.filter).getOrElse(df)
    // ORDER BY + LIMIT only when a chunk cap is requested: an unbounded global
    // sort of a 100 TB scan would be a full range-shuffle for nothing — the
    // cursor is recovered with max(struct(ts,id)) instead (SURVEY §4 "sort for
    // resumability").
    // clamp, don't truncate: a Long cap above Int.MaxValue must mean
    // "effectively unbounded", not a silent 32-bit wrap (negative limits
    // throw; positive wraps silently cap the run)
    def cap(n: Long): Int = math.min(n, Int.MaxValue.toLong).toInt
    limit match {
      case Some(n) if orderBy.nonEmpty => filtered.orderBy(orderBy: _*).limit(cap(n))
      case Some(n) => filtered.limit(cap(n))
      case None => filtered
    }
  }
}

/** A CDC strategy: builds the scan predicate from the current cursor and
  * extracts the next cursor from a batch — the Scala analog of the reference's
  * abstract `CDCStrategy` (build_query / extract_watermark_data /
  * validate_table_schema, cdc_strategy_engine.py:147-177). */
sealed trait CdcStrategy {
  def config: CdcConfig

  /** Catalyst predicate selecting rows strictly after the cursor. */
  def scanSpec(cursor: Cursor): ScanSpec

  /** Columns that must exist on the source (validate_table_schema analog). */
  def requiredColumns: Seq[String]

  /** Extract the max cursor from a batch WITHOUT a global sort:
    * `max(struct(ts, id))` is a cheap partial-aggregatable reduction, unlike
    * the reference's ORDER BY ts,id LIMIT n per chunk (SURVEY §4). */
  def extractCursor(batch: DataFrame): Cursor

  /** Static extra predicate ANDed into every scan (P6, ref :253-259). */
  protected def additionalPred: Option[Column] =
    config.additionalWhere.map(w => expr(SqlGuard.validateCustomSqlFragment(w)))

  protected def andAll(preds: Seq[Column]): Option[Column] =
    preds.reduceOption(_ && _)

  /** Timestamp literal comparable against the source column. Handles the
    * UNIX-epoch-seconds variant (ref :224-251: `ts > UNIX_TIMESTAMP(:wm)`).
    * The non-epoch case stays a STRING literal so Catalyst's type coercion
    * casts it to the COLUMN's type (TIMESTAMP or TIMESTAMP_NTZ) — forcing
    * `to_timestamp` here would pin session-TZ TIMESTAMP and silently shift
    * predicates against NTZ columns in non-UTC sessions. */
  protected def tsLiteral(iso: String): Column =
    if (config.timestampIsUnixEpoch) unix_timestamp(to_timestamp(lit(iso)))
    else lit(iso)

  protected def tsColName: String =
    config.timestampColumn.getOrElse(
      throw new IllegalArgumentException("cdc_timestamp_column required"))
  protected def idColName: String =
    config.idColumn.getOrElse(
      throw new IllegalArgumentException("cdc_id_column required"))

  /** Chunk ordering: explicit `cdc_ordering` config wins; else the
    * strategy's natural (ts[,id]) order (ref configuration_manager.py:33
    * `cdc_ordering`). Only applied when a LIMIT requests a sorted chunk. */
  protected def orderCols(default: Seq[Column]): Seq[Column] =
    if (config.ordering.nonEmpty) config.ordering.map(col) else default

  protected def maxTsString(batch: DataFrame, c: String): Option[String] = {
    val raw =
      if (config.timestampIsUnixEpoch)
        batch.agg(date_format(to_timestamp(max(col(c))), "yyyy-MM-dd HH:mm:ss"))
      else batch.agg(date_format(max(col(c)), CdcStrategy.CursorTsFormat))
    Option(raw.head().getString(0))
  }

  /** max(struct(ts,id)) cursor reduction shared by the hybrid and custom-SQL
    * strategies: single-pass distributed, no sort, no collect of data rows.
    * Epoch-seconds BIGINT ts columns convert before formatting. */
  protected def maxTsIdCursor(batch: DataFrame, ts: String, id: String): Cursor = {
    val tsField = col("m").getField(ts)
    val tsString =
      if (config.timestampIsUnixEpoch)
        date_format(to_timestamp(tsField), "yyyy-MM-dd HH:mm:ss")
      else date_format(tsField, CdcStrategy.CursorTsFormat)
    val row = batch.agg(max(struct(col(ts), col(id))).as("m"))
      .select(tsString.as("ts"), col("m").getField(id).cast("long").as("id"))
      .head()
    if (row.isNullAt(0) && row.isNullAt(1)) Cursor()
    else Cursor(Option(row.getString(0)),
      if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }
}

/** S1 — timestamp-only incremental scan
  * (ref TimestampOnlyCDCStrategy, cdc_strategy_engine.py:188-294). */
final case class TimestampOnlyStrategy(config: CdcConfig) extends CdcStrategy {
  def requiredColumns: Seq[String] = Seq(tsColName)

  def scanSpec(cursor: Cursor): ScanSpec = {
    val preds = cursor.lastTimestamp.map(wm => col(tsColName) > tsLiteral(wm)).toSeq ++
      additionalPred
    ScanSpec(andAll(preds), orderCols(Seq(col(tsColName))), config.maxRowsPerRun)
  }

  def extractCursor(batch: DataFrame): Cursor =
    Cursor(lastTimestamp = maxTsString(batch, tsColName))
}

/** S2 — hybrid (ts,id) keyset scan: total order, resumable at equal timestamps
  * (ref cdc_strategy_engine.py:366-434; WHERE at :404-410).
  * Predicate: ts > wm OR (ts = wm AND id > lastId). */
final case class HybridStrategy(config: CdcConfig) extends CdcStrategy {
  def requiredColumns: Seq[String] = Seq(tsColName, idColName)

  def scanSpec(cursor: Cursor): ScanSpec = {
    val keyset = (cursor.lastTimestamp, cursor.lastId) match {
      case (Some(wm), Some(id)) =>
        Some(col(tsColName) > tsLiteral(wm) ||
          (col(tsColName) === tsLiteral(wm) && col(idColName) > lit(id)))
      case (Some(wm), None) => Some(col(tsColName) > tsLiteral(wm))
      case _ => None
    }
    ScanSpec(andAll(keyset.toSeq ++ additionalPred),
      orderCols(Seq(col(tsColName), col(idColName))), config.maxRowsPerRun)
  }

  def extractCursor(batch: DataFrame): Cursor =
    maxTsIdCursor(batch, tsColName, idColName)
}

/** S3 — id-only keyset scan for append-only tables
  * (ref cdc_strategy_engine.py:499-546). */
final case class IdOnlyStrategy(config: CdcConfig) extends CdcStrategy {
  def requiredColumns: Seq[String] = Seq(idColName)

  def scanSpec(cursor: Cursor): ScanSpec = {
    val preds = cursor.lastId.map(id => col(idColName) > lit(id)).toSeq ++ additionalPred
    ScanSpec(andAll(preds), orderCols(Seq(col(idColName))), config.maxRowsPerRun)
  }

  def extractCursor(batch: DataFrame): Cursor = {
    val row = batch.agg(max(col(idColName)).cast("long")).head()
    Cursor(lastId = if (row.isNullAt(0)) None else Some(row.getLong(0)))
  }
}

/** S4 — full sync (ref cdc_strategy_engine.py:581-768). `paginate` mode
  * dissolves into Spark's partitioned scan; `replace` signals target truncate.
  *
  * `maxRowsPerRun` is IGNORED here by design: the reference paginated
  * LIMIT/OFFSET chunks within one session until the table was exhausted;
  * Spark stages the whole snapshot in one distributed pass, so a per-run cap
  * would take an ARBITRARY n-row subset with a cursor that never advances —
  * every sync would re-stage (roughly) the same rows and an append-mode load
  * would duplicate them without ever completing the table. */
final case class FullSyncStrategy(config: CdcConfig) extends CdcStrategy {
  def requiredColumns: Seq[String] = Nil
  def scanSpec(cursor: Cursor): ScanSpec = ScanSpec(additionalPred, Nil, None)
  def extractCursor(batch: DataFrame): Cursor = Cursor()
}

/** S5 — custom SQL scan with the reference's guard rails
  * (cdc_strategy_engine.py:771-834; security :54-91). The rendered template
  * runs via `spark.sql` over a registered temp view. */
final case class CustomSqlStrategy(config: CdcConfig) extends CdcStrategy {
  def requiredColumns: Seq[String] = Nil
  def scanSpec(cursor: Cursor): ScanSpec = ScanSpec(None, Nil, None)

  /** Cursor from the CONFIGURED ts/id columns of the query's output (ref
    * extract_watermark_data for custom SQL, cdc_strategy_engine.py:822-834).
    * Without cursor columns, the template's `{last_timestamp}/{last_id}`
    * placeholders never advance — every sync would re-stage the same rows
    * and an append load would duplicate them, so configure at least one for
    * incremental templates. */
  def extractCursor(batch: DataFrame): Cursor =
    (config.timestampColumn, config.idColumn) match {
      case (Some(ts), Some(id)) => maxTsIdCursor(batch, ts, id)
      case (Some(ts), None) => Cursor(lastTimestamp = maxTsString(batch, ts))
      case (None, Some(id)) =>
        val row = batch.agg(max(col(id)).cast("long")).head()
        if (row.isNullAt(0)) Cursor() else Cursor(lastId = Some(row.getLong(0)))
      case _ => Cursor()
    }

  /** Run the guarded, rendered template. `viewName` must already be registered. */
  def run(spark: SparkSession, viewName: String, cursor: Cursor): DataFrame = {
    val template = config.customSql.getOrElse(
      throw new IllegalArgumentException("custom_sql template required"))
    val rendered = SqlGuard.renderCustomSql(template, viewName,
      cursor.lastTimestamp, cursor.lastId, config.maxRowsPerRun)
    spark.sql(rendered)
  }
}

object CdcStrategy {
  /** Cursor timestamps carry FULL microsecond precision: a source with
    * DATETIME(3)/(6) columns would otherwise have its cursor truncated to the
    * second and re-extract every row later in the same second on the next
    * session (duplicates into staging). Epoch-seconds sources keep plain
    * second format — that IS their precision. The string still parses as a
    * timestamp literal on the predicate side (Catalyst cast handles
    * fractional seconds), so scanSpec needs no change. */
  val CursorTsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Factory mirroring the reference's registry (cdc_strategy_engine.py:872-933). */
  def apply(config: CdcConfig): CdcStrategy = config.strategy match {
    case CdcStrategyKind.TimestampOnly => TimestampOnlyStrategy(config)
    case CdcStrategyKind.Hybrid        => HybridStrategy(config)
    case CdcStrategyKind.IdOnly        => IdOnlyStrategy(config)
    case CdcStrategyKind.FullSync      =>
      // the cap is dropped by design here (see FullSyncStrategy scaladoc) —
      // but a user who configured it deserves a signal, not silence
      config.maxRowsPerRun.foreach(n =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"max_rows_per_run=$n is ignored for full_sync tables: the " +
            "snapshot stages in one distributed pass (a per-run cap would " +
            "re-stage the same arbitrary subset forever)"))
      FullSyncStrategy(config)
    case CdcStrategyKind.CustomSql     => CustomSqlStrategy(config)
  }
}
