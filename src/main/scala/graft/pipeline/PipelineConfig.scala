package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.model._
import scala.jdk.CollectionConverters._

/** Pipeline-level processing knobs (ref configuration_manager.py:46-120
  * `PipelineConfig`; YAML `pipeline.processing`). */
final case class ProcessingSettings(
    strategy: String = "sequential",          // sequential | parallel
    batchSize: Int = 10000,
    timeoutMinutes: Int = 240,
    maxParallelTables: Int = 1,
    commitBatchFiles: Int = 64,               // blacklist-commit granularity
    maxFilesPerLoad: Option[Int] = None,      // newest-first backlog trim (O4)
    evolutionPolicy: String = "additive",     // additive | strict | align
    normalizeColumns: Boolean = false)        // P5 lowercase/digit-prefix renames

/** Staged-sink settings (YAML `pipeline.s3`; ref s3_manager.py:57-65
  * isolation_prefix namespace + partition strategy selection). */
final case class SinkSettings(
    isolationPrefix: String = "",
    partitionStrategy: PartitionStrategy = PartitionStrategy.ByTable,
    compression: String = "snappy")

/** One declarative data-quality rule (YAML `tables.<t>.expectations`) —
  * evaluated after every load in ONE aggregate pass over the target; any
  * violation fails the table's report (the reference's count-validation
  * idea generalized to column-level contracts). `distinct_min` uses the
  * HLL approximate distinct (deterministic, ~1% error — set thresholds
  * with margin); the rest are exact. */
final case class ExpectationSpec(
    column: Option[String],
    minValue: Option[Double] = None,           // min(column) >= this
    maxValue: Option[Double] = None,           // max(column) <= this
    nullFracMax: Option[Double] = None,        // null fraction <= this
    distinctMin: Option[Long] = None,          // approx distinct >= this
    rowCountMin: Option[Long] = None,          // table-level: rows >= this
    expression: Option[String] = None,         // row-level SQL predicate every
                                               // row must satisfy (cross-column
                                               // contracts); NULL = violation
    maxViolations: Long = 0L)                  // tolerated expression misses

/** One post-load derived-table operator (YAML `tables.<t>.post_ops`) — the
  * reference's post-load SQL stage as pipeline config: ROW_NUMBER dedup and
  * "latest status" views run as part of the sync, not as library calls
  * (settle_orders_download_and_sync.py:275-388, LATEST_STATUS_USAGE.sql:
  * 17-40); `scd2_apply`/`fold_aggregate` are their incremental
  * generalizations (history table / materialized rollup kept fresh per
  * sync). `target` names the derived warehouse table the op maintains. */
final case class PostOpSpec(
    op: String,                                // dedup_latest | latest_status
                                               // | scd2_apply | fold_aggregate
                                               // | zorder (in-place layout)
                                               // | neardup_labels (incremental
                                               //   MinHash cluster maintenance)
                                               // | fold_kmv_distinct
                                               // | fold_count_min
                                               // | fold_sample (deterministic
                                               //   sketch state, Sketches.*)
    target: String,                            // derived output table name
                                               // (zorder: the BASE table)
    keys: Seq[String] = Nil,
    tsColumn: Option[String] = None,
    idColumn: Option[String] = None,
    statusColumn: Option[String] = None,
    attrColumns: Seq[String] = Nil,
    sums: Seq[graft.operators.Relational.SumSpec] = Nil,
    textColumn: Option[String] = None,         // neardup_labels
    threshold: Option[Double] = None,          // neardup_labels jaccard cut
    maxBucketSize: Option[Int] = None,         // neardup_labels* hot-bucket
                                               // cap (default 1000); drops
                                               // surface on TableReport
    valueColumn: Option[String] = None,        // fold_kmv_distinct /
                                               // fold_count_min / fold_sample
    k: Option[Int] = None,                     // sketch size (state bound) /
                                               // epoch_shards nibbles /
                                               // fold_probe GD steps per sync
    epoch: Option[Int] = None,                 // epoch_shards seed
    vectorColumn: Option[String] = None,       // fold_probe feature vector
    weights: Seq[(String, Long)] = Nil,        // rebalance target mixture
    reference: Option[String] = None)          // dsir_select: warehouse table
                                               // (same schema) holding the
                                               // trusted target corpus

/** One configured table: scoped name + CDC config + optional rename
  * (YAML `tables.<schema.table>`; ref TableConfig, configuration_manager.py:23-43).
  * `tableType` drives DAG-style phase ordering (D7, ref
  * airflow_poc/dags/prod_to_dw_mysql_sync_hourly.py:385-604: dimension tables
  * full-sync BEFORE fact tables so fact-side joins never see stale dims). */
final case class TableSpec(
    name: String,                              // schema.table
    cdc: CdcConfig,
    connection: Option[String] = None,         // named entry in
                                               // pipeline.connections; None →
                                               // the pipeline's default source
    targetName: Option[String] = None,
    tableType: TableType = TableType.Fact,
    countCheck: Boolean = false,               // post-load parity gate (D7)
    sourceCountCheck: Boolean = false,         // source-vs-target count gate
                                               // (A4; snapshot/append-only
                                               // tables — updates break the
                                               // equality by design)
    mergeKeys: Seq[String] = Nil,              // non-empty → upsert load
                                               // (ref settle_orders DELETE+INSERT)
    mergeBuckets: Option[Int] = None,          // bucket-partitioned merge: only
                                               // buckets containing staged keys
                                               // are rewritten per increment
    postOps: Seq[PostOpSpec] = Nil,            // post-load derived tables
    expectations: Seq[ExpectationSpec] = Nil) { // post-load quality gate
  def tableId(connection: String): TableId = {
    val id = TableId.parse(s"$connection:$name")
    targetName.map(t => id.copy(table = t)).getOrElse(id)
  }

  /** THE `-t` filter rule, shared by the runner and every CLI verb: bare
    * `schema.table`, a bare-table suffix, or the connection-scoped form
    * `conn:schema.table` (the only way to address one of two same-named
    * tables on different connections). */
  def matches(filter: String): Boolean =
    name == filter || name.endsWith(s".$filter") ||
      connection.exists(c => s"$c:$name" == filter)

  /** Scoped display name (`conn:schema.table` when a connection is set). */
  def scopedName: String = connection.fold(name)(c => s"$c:$name")

  /** The ONE way to derive a table's id from its pipeline — the connection
    * component is the NAMED connection when the table declares one
    * (watermarks/staging/warehouse scope per connection, the reference's
    * `[connection:]schema.table` semantics), else the sanitized default
    * source. A call site hand-rolling this that drifted would silently fork
    * the table's watermark/staging/warehouse state. */
  def tableId(p: Pipeline): TableId = tableId(connection.getOrElse(p.connectionId))
}

/** One named source connection (YAML `pipeline.connections.<name>`): the
  * reference's multi-connection registry re-expressed as config — tables
  * address it by name, watermark/staging/warehouse state scopes under it
  * (connection_registry.py:378-449, 505-607; config/connections.yml). The
  * same url/dir + format knobs as the pipeline's default source. */
final case class ConnectionSpec(
    source: String,                            // jdbc: url or file dir
    sourceFormat: String = "parquet",
    sourceNanosAsLong: Boolean = false)

/** A full parsed pipeline (ref PipelineConfig + example
  * config/pipelines/us_dw_hybrid_v1_2.yml). */
final case class Pipeline(
    name: String,
    description: String,
    source: String,                            // jdbc: url or file dir
    sourceFormat: String = "parquet",          // parquet | json | csv (file dirs)
    sourceNanosAsLong: Boolean = false,        // TIMESTAMP(NANOS) parquet → ns longs
    target: String,
    defaultStrategy: CdcStrategyKind,
    processing: ProcessingSettings,
    sink: SinkSettings,
    tables: Seq[TableSpec],
    connections: Map[String, ConnectionSpec] = Map.empty) {

  /** Connection identity derived from the source (url/dir), sanitized for
    * watermark scoping. See [[TableSpec.tableId]]. */
  def connectionId: String = source.replaceAll("[^A-Za-z0-9_]", "_")
}

/** YAML pipeline loader: same document shape as the reference's
  * config/pipelines YAML files (configuration_manager.py:377-531), including
  * `${ENV_VAR}` / `${ENV_VAR:default}` interpolation (:443-531) and
  * template inheritance via a top-level `extends: <path>` key (:377-443 —
  * child keys deep-merge over the template's; objects merge recursively,
  * scalars and lists replace). Unknown keys are ignored (the reference
  * carries many monitoring/validation blocks that have no Spark analog). */
object PipelineConfig {

  // STRICT_DUPLICATE_DETECTION: Jackson's tree model silently collapses
  // duplicate mapping keys (last wins) BEFORE any semantic check can see
  // them — a typo like `weights: {en: 3, en: 1}` would ship the wrong
  // mixture and make every "duplicate X" validation downstream
  // unreachable from YAML. Rejecting at parse time is the config-file
  // strictness rule (fail at parse, not mid-sync).
  private val mapper = new ObjectMapper(new YAMLFactory().enable(
    com.fasterxml.jackson.core.JsonParser.Feature.STRICT_DUPLICATE_DETECTION))

  def fromFile(path: String, env: Map[String, String] = sys.env): Pipeline = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    fromString(raw, env,
      baseDir = Option(java.nio.file.Paths.get(path).toAbsolutePath.getParent)
        .map(_.toString))
  }

  def fromString(yaml: String, env: Map[String, String] = sys.env,
                 baseDir: Option[String] = None): Pipeline = {
    // interpolation runs on the PARSED, MERGED tree, not the raw text:
    //  - ${VAR} inside comments can't abort the load (comments don't parse),
    //  - a child's extends-override can replace a template key BEFORE its
    //    ${PROD_ONLY_VAR} is ever evaluated,
    //  - substituted values with YAML metacharacters can't restructure the
    //    document (there is no second text parse).
    val node = mapper.readTree(yaml)
    parse(interpolateTree(resolveExtends(node, baseDir, env, depth = 0), env))
  }

  /** Resolve the `extends:` chain: load the template (path relative to the
    * extending file), recurse for ITS `extends`, then deep-merge the child
    * over it. Depth-capped against cycles. */
  private def resolveExtends(node: JsonNode, baseDir: Option[String],
                             env: Map[String, String], depth: Int): JsonNode = {
    val ext = Option(node.get("extends")).filterNot(_.isNull).map(_.asText)
    ext match {
      case None => node
      case Some(rel0) =>
        if (depth >= 10) throw new IllegalArgumentException(
          s"extends chain deeper than 10 — inheritance cycle? (at $rel0)")
        val rel = interpolate(rel0, env) // env-dependent template paths
        val path = baseDir match {
          case Some(d) => java.nio.file.Paths.get(d).resolve(rel).toString
          case None => rel
        }
        val raw = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
        val parentDir = Option(
          java.nio.file.Paths.get(path).toAbsolutePath.getParent).map(_.toString)
        val parent = resolveExtends(
          mapper.readTree(raw), parentDir, env, depth + 1)
        val child = node.deepCopy[JsonNode]()
        child.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("extends")
        deepMerge(parent, child)
    }
  }

  /** Objects merge recursively; scalars/arrays in the child REPLACE the
    * parent's (a child overriding one table knob keeps the template's other
    * knobs for that table, but a child list like `cdc_ordering` replaces the
    * whole list — partial list merge is never what a config author means). */
  private[pipeline] def deepMerge(parent: JsonNode, child: JsonNode): JsonNode = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    (parent, child) match {
      case (p: ObjectNode, c: ObjectNode) =>
        val out = p.deepCopy[ObjectNode]()
        c.properties().asScala.foreach { e =>
          val k = e.getKey
          if (out.has(k) && out.get(k).isObject && e.getValue.isObject)
            out.set[JsonNode](k, deepMerge(out.get(k), e.getValue))
          else out.set[JsonNode](k, e.getValue.deepCopy[JsonNode]())
        }
        out
      case _ => child
    }
  }

  /** `${VAR}` or `${VAR:default}` → env value (ref env interpolation,
    * configuration_manager.py:443-531). Missing var with no default throws. */
  private[pipeline] def interpolate(text: String, env: Map[String, String]): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\\}".r.replaceAllIn(text, m => {
      val v = env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
        throw new IllegalArgumentException(
          s"environment variable ${m.group(1)} not set and no default given"))
      scala.util.matching.Regex.quoteReplacement(v)
    })

  /** Interpolate every STRING VALUE of a parsed config tree. */
  private[pipeline] def interpolateTree(node: JsonNode,
                                        env: Map[String, String]): JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
    node match {
      case o: ObjectNode =>
        val out = o.deepCopy[ObjectNode]()
        o.properties().asScala.foreach(e =>
          out.set[JsonNode](e.getKey, interpolateTree(e.getValue, env)))
        out
      case a: ArrayNode =>
        val out = a.deepCopy[ArrayNode]()
        (0 until a.size()).foreach(i =>
          out.set(i, interpolateTree(a.get(i), env)))
        out
      case t: TextNode => new TextNode(interpolate(t.asText(), env))
      case other => other
    }
  }

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n).flatMap(x => Option(x.get(field))).filterNot(_.isNull)

  private def str(n: JsonNode, field: String, default: String): String =
    opt(n, field).map(_.asText).getOrElse(default)

  /** A string list that ALSO accepts a scalar as a one-element list:
    * `merge_keys: "o_orderkey"` is a natural way to write one key, and
    * `elements()` on a scalar node silently yields Nil — which here would
    * silently demote a merge table to append mode (duplicates). */
  private def strOrList(n: JsonNode): Seq[String] =
    if (n.isTextual) Seq(n.asText)
    else n.elements().asScala.map(_.asText).toSeq

  private def parse(root: JsonNode): Pipeline = {
    val p = Option(root.get("pipeline")).getOrElse(
      throw new IllegalArgumentException("missing top-level 'pipeline' block"))

    val proc = opt(p, "processing").orNull
    val processing = ProcessingSettings(
      // strict: a typo'd strategy silently running sequential would be a
      // multi-hour slowdown with no error anywhere
      strategy = str(proc, "strategy", "sequential").trim.toLowerCase match {
        case s @ ("sequential" | "parallel") => s
        case other => throw new IllegalArgumentException(
          s"unknown processing.strategy '$other' (sequential | parallel)")
      },
      batchSize = opt(proc, "batch_size").map(_.asInt).getOrElse(10000),
      timeoutMinutes = opt(proc, "timeout_minutes").map(_.asInt).getOrElse(240),
      maxParallelTables = opt(proc, "max_parallel_tables").map(_.asInt).getOrElse(1),
      commitBatchFiles = opt(proc, "commit_batch_files").map(_.asInt).getOrElse(64),
      maxFilesPerLoad = opt(proc, "max_files_per_load").map(_.asInt),
      evolutionPolicy = str(proc, "evolution_policy", "additive"),
      normalizeColumns = opt(proc, "normalize_columns").exists(_.asBoolean))

    val s3 = opt(p, "s3").orNull
    val sink = SinkSettings(
      isolationPrefix = str(s3, "isolation_prefix", ""),
      partitionStrategy = PartitionStrategy.fromName(
        str(s3, "partition_strategy", "table")),
      compression = str(s3, "compression", "snappy"))

    val defaultStrategy = CdcStrategyKind.fromName(
      opt(p, "cdc_settings").flatMap(c => opt(c, "default_strategy"))
        .map(_.asText).getOrElse("full_sync"))

    // named connections (ref connection_registry.py:378-449): each entry is
    // a full source spec; tables opt in by `connection:` key or by the
    // reference's scoped-name form `conn:schema.table`
    val connections: Map[String, ConnectionSpec] =
      opt(p, "connections").map { c =>
        c.properties().asScala.map { e =>
          val name = e.getKey.trim
          if (!name.matches("[A-Za-z0-9_]+")) throw new IllegalArgumentException(
            s"connection name '$name' must match [A-Za-z0-9_]+ " +
              "(it scopes watermark/warehouse state)")
          val n = e.getValue
          val src = opt(n, "source").map(_.asText).getOrElse(
            throw new IllegalArgumentException(
              s"pipeline.connections.$name: missing 'source'"))
          name -> ConnectionSpec(src,
            sourceFormat = str(n, "source_format", "parquet"),
            sourceNanosAsLong = opt(n, "source_nanos_as_long").exists(_.asBoolean))
        }.toMap
      }.getOrElse(Map.empty)

    val tables = Option(root.get("tables")).map { t =>
      t.properties().asScala.toSeq.map { e =>
        parseTable(e.getKey, e.getValue, defaultStrategy, processing.batchSize)
      }
    }.getOrElse(Nil)

    // strict like every config enum: a typo'd connection silently falling
    // back to the default source would sync the WRONG DATABASE
    tables.flatMap(_.connection).distinct.foreach { c =>
      if (!connections.contains(c)) throw new IllegalArgumentException(
        s"table references unknown connection '$c' " +
          s"(declared: ${connections.keys.toSeq.sorted.mkString(", ") match {
            case "" => "none"; case s => s }})")
    }

    // neardup_labels is only sound over APPEND-ONLY increments the base
    // table fully contains: updates would leave stale band rows and merged
    // labels that can never split, and the loader's backlog trim
    // (max_files_per_load) loads fewer files than the fold folds — the
    // probe corpus would be missing folded docs' text and pairs would drop
    // silently. Reject the combinations at parse, per the strict-config
    // convention.
    for (op <- Seq("neardup_labels", "neardup_labels_edges", "simhash_labels",
           "embedding_neardup", "image_neardup_labels");
         t <- tables.filter(_.postOps.exists(_.op == op))) {
      def bad(msg: String) = throw new IllegalArgumentException(
        s"tables.${t.name}.post_ops.$op: $msg")
      if (t.cdc.strategy != CdcStrategyKind.IdOnly)
        bad(s"requires cdc_strategy id_only (append-only increments); " +
          s"'${t.cdc.strategy.name}' can restage or update already-folded " +
          "documents, leaving stale band rows and unmergeable labels")
      if (t.mergeKeys.nonEmpty)
        bad("incompatible with merge_keys (updates cannot be unfolded " +
          "from the label side-table)")
      if (processing.maxFilesPerLoad.isDefined)
        bad("incompatible with processing.max_files_per_load (the fold " +
          "tracks staged sessions; a trimmed load would leave folded " +
          "documents missing from the probe corpus)")
    }

    // fold_bm25 appends postings per increment under the same append-only
    // assumption: a restaged or UPDATED document would stack a second set
    // of postings/doclen rows for its id, silently inflating tf/df/N.
    // Same parse-time contract as neardup_labels (its band index has the
    // identical failure mode).
    for (op <- Seq("fold_bm25", "fold_bpe_tokens");
         t <- tables.filter(_.postOps.exists(_.op == op))) {
      def bad(msg: String) = throw new IllegalArgumentException(
        s"tables.${t.name}.post_ops.$op: $msg")
      if (t.cdc.strategy != CdcStrategyKind.IdOnly)
        bad(s"requires cdc_strategy id_only (append-only increments); " +
          s"'${t.cdc.strategy.name}' can restage or update already-indexed " +
          "documents, double-counting their rows")
      if (t.mergeKeys.nonEmpty)
        bad("incompatible with merge_keys (an updated document cannot be " +
          "unfolded from the appended state)")
    }

    // derived-table names must be globally unique: two post_ops (or a
    // post_op and a base table) sharing a warehouse name would silently
    // overwrite each other's data on every sync
    val sinkNames = tables.flatMap(t =>
      (t.targetName.getOrElse(t.name.split("\\.").last) +:
        t.postOps.filterNot(_.op == "zorder").map(_.target)))
    val dup = sinkNames.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"duplicate warehouse table name(s) across tables/post_ops: ${dup.mkString(", ")}")

    Pipeline(
      name = str(p, "name", "unnamed"),
      description = str(p, "description", ""),
      source = str(p, "source", "default"),
      sourceFormat = str(p, "source_format", "parquet"),
      sourceNanosAsLong = opt(p, "source_nanos_as_long").exists(_.asBoolean),
      target = str(p, "target", "default"),
      defaultStrategy = defaultStrategy,
      processing = processing,
      sink = sink,
      tables = tables,
      connections = connections)
  }

  private def parseTable(name0: String, n: JsonNode,
                         defaultStrategy: CdcStrategyKind,
                         pipelineBatch: Int): TableSpec = {
    // the reference's scoped-name addressing: a table KEY `conn:schema.table`
    // is shorthand for `connection: conn` (an explicit connection key must
    // agree — two different connections on one table is a config error)
    val (scopedConn, name) = name0.split(":", 2) match {
      case Array(c, rest) => (Some(c.trim), rest)
      case _ => (None, name0)
    }
    val declaredConn = opt(n, "connection").map(_.asText.trim).filter(_.nonEmpty)
    val connection = (scopedConn, declaredConn) match {
      case (Some(a), Some(b)) if a != b => throw new IllegalArgumentException(
        s"table '$name0' declares connection '$b' but its scoped name says '$a'")
      case (a, b) => a.orElse(b)
    }
    val strategy = opt(n, "cdc_strategy").map(s => CdcStrategyKind.fromName(s.asText))
      .getOrElse(defaultStrategy)
    // batch-size hierarchy: table.processing > pipeline > default
    // (ref tests/unit/test_batch_size_hierarchy.py semantics)
    val tableBatch = opt(n, "processing")
      .flatMap(pn => opt(pn, "batch_size")).map(_.asInt).getOrElse(pipelineBatch)
    val cdc = CdcConfig(
      strategy = strategy,
      timestampColumn = opt(n, "cdc_timestamp_column").map(_.asText),
      idColumn = opt(n, "cdc_id_column").map(_.asText),
      ordering = opt(n, "cdc_ordering").map(strOrList).getOrElse(Nil),
      additionalWhere = opt(n, "additional_where").map(_.asText),
      customSql = opt(n, "custom_sql").map(_.asText),
      fullSyncMode = opt(n, "full_sync_mode").map(m => FullSyncMode.fromName(m.asText))
        .getOrElse(FullSyncMode.Replace),
      timestampIsUnixEpoch = opt(n, "timestamp_is_unix_epoch").exists(_.asBoolean),
      batchSize = tableBatch,
      maxRowsPerRun = opt(n, "max_rows_per_run").map(_.asLong))
    // strict like every other config enum: a typo'd table_type silently
    // becoming Fact would break the dims-first DAG ordering with no error
    val ttype = opt(n, "table_type").map(_.asText.toLowerCase) match {
      case Some("dimension") => TableType.Dimension
      case Some("fact") | None => TableType.Fact
      case Some(other) => throw new IllegalArgumentException(
        s"unknown table_type '$other' (fact | dimension)")
    }
    val countCheck = opt(n, "validation")
      .flatMap(v => opt(v, "enable_count_check")).exists(_.asBoolean)
    val sourceCountCheck = opt(n, "validation")
      .flatMap(v => opt(v, "enable_source_count_check")).exists(_.asBoolean)
    val mergeKeys = opt(n, "merge_keys").map(strOrList).getOrElse(Nil)
    val mergeBuckets = opt(n, "merge_buckets").map(_.asInt)
    val postOps = opt(n, "post_ops").map(_.elements().asScala.toSeq
      .map(parsePostOp(name, _))).getOrElse(Nil)
    val expectations = opt(n, "expectations").map(_.elements().asScala.toSeq
      .map(parseExpectation(name, _))).getOrElse(Nil)
    TableSpec(name, cdc, connection, opt(n, "target_name").map(_.asText),
      ttype, countCheck, sourceCountCheck, mergeKeys, mergeBuckets, postOps,
      expectations)
  }

  /** Same parse-time strictness as post_ops: an expectation with no rule
    * (or a column rule without a column) must fail at config load. */
  private def parseExpectation(table: String, n: JsonNode): ExpectationSpec = {
    def bad(msg: String) = throw new IllegalArgumentException(
      s"tables.$table.expectations: $msg")
    val spec = ExpectationSpec(
      column = opt(n, "column").map(_.asText.trim).filter(_.nonEmpty),
      minValue = opt(n, "min").map(_.asDouble),
      maxValue = opt(n, "max").map(_.asDouble),
      nullFracMax = opt(n, "null_frac_max").map(_.asDouble),
      distinctMin = opt(n, "distinct_min").map(_.asLong),
      rowCountMin = opt(n, "row_count_min").map(_.asLong),
      expression = opt(n, "expression").map(_.asText.trim).filter(_.nonEmpty),
      maxViolations = opt(n, "max_violations").map(_.asLong).getOrElse(0L))
    val hasColRule = spec.minValue.isDefined || spec.maxValue.isDefined ||
      spec.nullFracMax.isDefined || spec.distinctMin.isDefined
    if (!hasColRule && spec.rowCountMin.isEmpty && spec.expression.isEmpty)
      bad("entry declares no rule " +
        "(min/max/null_frac_max/distinct_min/row_count_min/expression)")
    if (hasColRule && spec.column.isEmpty)
      bad("column rule (min/max/null_frac_max/distinct_min) requires 'column'")
    spec.nullFracMax.foreach(f =>
      if (f < 0.0 || f > 1.0) bad(s"null_frac_max $f outside [0,1]"))
    if (spec.maxViolations < 0) bad(s"max_violations ${spec.maxViolations} < 0")
    if (spec.maxViolations > 0 && spec.expression.isEmpty)
      bad("max_violations only applies to an 'expression' rule")
    spec
  }

  /** Strict per-op validation at PARSE time: a post_op missing its columns
    * failing only mid-sync (after extract+load committed) would be found
    * hours later — same strictness rule as the config enums. */
  private def parsePostOp(table: String, n: JsonNode): PostOpSpec = {
    def bad(msg: String) = throw new IllegalArgumentException(
      s"tables.$table.post_ops: $msg")
    val op = opt(n, "op").map(_.asText.trim.toLowerCase)
      .getOrElse(bad("entry missing 'op'"))
    val target = opt(n, "target").map(_.asText.trim).filter(_.nonEmpty)
      .getOrElse(if (op == "zorder") "" // rewrites the base table in place
                 else bad(s"'$op' missing 'target'"))
    val spec = PostOpSpec(op, target,
      keys = opt(n, "keys").map(strOrList).getOrElse(Nil),
      tsColumn = opt(n, "ts_column").map(_.asText),
      idColumn = opt(n, "id_column").map(_.asText),
      statusColumn = opt(n, "status_column").map(_.asText),
      attrColumns = opt(n, "attr_columns").map(strOrList).getOrElse(Nil),
      sums = opt(n, "sums").map(_.elements().asScala.toSeq.map { s =>
        graft.operators.Relational.SumSpec(
          out = opt(s, "out").map(_.asText).getOrElse(bad(s"'$op' sum missing 'out'")),
          in = opt(s, "in").map(_.asText).getOrElse(bad(s"'$op' sum missing 'in'")),
          scale = opt(s, "scale").map(_.asInt).getOrElse(2))
      }).getOrElse(Nil),
      textColumn = opt(n, "text_column").map(_.asText),
      threshold = opt(n, "threshold").map(_.asDouble),
      maxBucketSize = opt(n, "max_bucket_size").map(_.asInt),
      valueColumn = opt(n, "value_column").map(_.asText),
      k = opt(n, "k").map(_.asInt),
      epoch = opt(n, "epoch").map(_.asInt),
      vectorColumn = opt(n, "vector_column").map(_.asText),
      weights = opt(n, "weights").map(_.fields().asScala.toSeq
        .map(e => e.getKey -> e.getValue.asLong())).getOrElse(Nil),
      reference = opt(n, "reference").map(_.asText.trim).filter(_.nonEmpty))
    def need(cond: Boolean, what: String): Unit =
      if (!cond) bad(s"'$op' (target $target) requires $what")
    op match {
      case "dedup_latest" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.tsColumn.isDefined && spec.idColumn.isDefined,
          "'ts_column' and 'id_column'")
      case "latest_status" =>
        need(spec.keys.size == 1, "exactly one key in 'keys'")
        need(spec.statusColumn.isDefined && spec.tsColumn.isDefined &&
          spec.idColumn.isDefined, "'status_column', 'ts_column', 'id_column'")
      case "scd2_apply" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.tsColumn.isDefined, "'ts_column'")
        need(spec.attrColumns.nonEmpty, "'attr_columns'")
      case "fold_aggregate" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.sums.nonEmpty, "'sums'")
      case "zorder" =>
        need(spec.keys.nonEmpty, "'keys' (the clustering columns)")
      case "neardup_labels" | "neardup_labels_edges" =>
        need(spec.idColumn.isDefined && spec.textColumn.isDefined,
          "'id_column' and 'text_column'")
        spec.threshold.foreach(t =>
          if (t <= 0.0 || t > 1.0) bad(s"threshold $t outside (0,1]"))
        spec.maxBucketSize.foreach(m =>
          if (m <= 0) bad(s"max_bucket_size $m must be positive"))
      case "simhash_labels" =>
        need(spec.idColumn.isDefined && spec.textColumn.isDefined,
          "'id_column' and 'text_column'")
        spec.k.foreach(k =>
          if (k < 0 || k > 16) bad(s"k $k (max Hamming bits) outside [0,16]"))
      case "embedding_neardup" =>
        need(spec.idColumn.isDefined && spec.vectorColumn.isDefined,
          "'id_column' and 'vector_column'")
        need(spec.threshold.isDefined, "'threshold' (minimum cosine)")
        spec.threshold.foreach(t =>
          if (t <= -1.0 || t > 1.0) bad(s"threshold $t outside (-1,1]"))
      case "image_neardup_labels" =>
        need(spec.idColumn.isDefined && spec.valueColumn.isDefined,
          "'id_column' and 'value_column' (the binary payload column)")
        spec.k.foreach(k =>
          if (k < 0 || k > 3) bad(s"k $k (max Hamming bits) outside [0,3]" +
            " — the 4-band pigeonhole is exact only through 3"))
      case "fold_kmv_distinct" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.valueColumn.isDefined, "'value_column'")
        spec.k.foreach(k => if (k < 2) bad(s"k $k < 2"))
      case "fold_count_min" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.valueColumn.isDefined, "'value_column' (the item column)")
      case "fold_sample" =>
        need(spec.keys.nonEmpty, "'keys'")
        need(spec.idColumn.isDefined && spec.valueColumn.isDefined,
          "'id_column' (row-unique) and 'value_column'")
        spec.k.foreach(k => if (k < 1) bad(s"k $k < 1"))
      case "fold_bm25" =>
        need(spec.idColumn.isDefined && spec.valueColumn.isDefined,
          "'id_column' and 'value_column' (the text column)")
      case "fold_bpe_tokens" =>
        need(spec.idColumn.isDefined && spec.valueColumn.isDefined,
          "'id_column' and 'value_column' (the text column)")
        spec.k.foreach(k =>
          if (k < 1 || k > 65536) bad(s"k $k (BPE merges) outside [1,65536]"))
      case "epoch_shards" =>
        need(spec.idColumn.isDefined, "'id_column'")
        spec.k.foreach(k =>
          if (k < 1 || k > 4) bad(s"k $k (shard nibbles) outside [1,4]"))
      case "drift_gate" =>
        need(spec.keys.size == 1, "exactly one key (the category column)")
        need(spec.threshold.isDefined, "'threshold' (max allowed PSI)")
        spec.threshold.foreach(t =>
          if (t <= 0.0) bad(s"threshold $t must be positive"))
      case "fold_probe" =>
        need(spec.vectorColumn.isDefined && spec.valueColumn.isDefined &&
          spec.threshold.isDefined,
          "'vector_column', 'value_column' (label source) and 'threshold'" +
            " (label cut: y = value >= threshold)")
        spec.k.foreach(k =>
          if (k < 1 || k > 64) bad(s"k $k (GD steps per sync) outside [1,64]"))
      case "rebalance" =>
        need(spec.keys.size == 1, "exactly one key (the group column)")
        need(spec.idColumn.isDefined, "'id_column'")
        need(spec.weights.nonEmpty, "'weights' (group -> integer weight map)")
        if (spec.weights.exists(_._2 <= 0))
          bad("every rebalance weight must be positive")
        if (spec.weights.map(_._1).distinct.size != spec.weights.size)
          bad("duplicate group in rebalance weights")
      case "dsir_select" =>
        need(spec.idColumn.isDefined && spec.textColumn.isDefined,
          "'id_column' and 'text_column'")
        need(spec.reference.isDefined,
          "'reference' (the warehouse table holding the target corpus)")
        spec.k.foreach(k => if (k < 1) bad(s"k $k (selection size) < 1"))
      case "curriculum" =>
        need(spec.idColumn.isDefined && spec.valueColumn.isDefined,
          "'id_column' and 'value_column' (the difficulty score)")
        spec.k.foreach(k => if (k < 1) bad(s"k $k (shard count) < 1"))
      case "contamination_gate" =>
        need(spec.idColumn.isDefined && spec.textColumn.isDefined,
          "'id_column' and 'text_column'")
        need(spec.reference.isDefined,
          "'reference' (the warehouse table holding the benchmark)")
        need(spec.threshold.isDefined,
          "'threshold' (overlap fraction that fails the sync)")
        spec.threshold.foreach(t =>
          if (t <= 0.0 || t > 1.0) bad(s"threshold $t outside (0,1]"))
      case "data_card" =>
        need(spec.keys.size == 1, "exactly one key (the group column)")
        need(spec.textColumn.isDefined, "'text_column'")
      case "c4_clean" =>
        need(spec.idColumn.isDefined && spec.textColumn.isDefined,
          "'id_column' and 'text_column'")
        spec.k.foreach(k => if (k < 1) bad(s"k $k (min retained lines) < 1"))
      case "majority_vote" =>
        need(spec.keys.size == 3,
          "exactly three keys (the item, rater and label columns)")
      case "reliability_gate" =>
        need(spec.keys.size == 3,
          "exactly three keys (the item, rater and label columns)")
        need(spec.threshold.isDefined,
          "'threshold' (minimum Krippendorff alpha)")
        spec.threshold.foreach(t =>
          if (t < -1.0 || t > 1.0) bad(s"threshold $t outside [-1,1]"))
      case other => bad(s"unknown op '$other' (dedup_latest | latest_status" +
        " | scd2_apply | fold_aggregate | zorder | neardup_labels" +
        " | neardup_labels_edges | simhash_labels | embedding_neardup" +
        " | fold_kmv_distinct | fold_count_min | fold_sample | fold_bm25" +
        " | fold_bpe_tokens | epoch_shards | drift_gate | fold_probe" +
        " | rebalance | dsir_select | curriculum | contamination_gate" +
        " | reliability_gate | data_card | majority_vote | c4_clean" +
        " | image_neardup_labels)")
    }
    spec
  }
}
