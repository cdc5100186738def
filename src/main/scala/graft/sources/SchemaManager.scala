package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.operators.Relational
import scala.collection.concurrent.TrieMap

/** Schema-discovery cache with TTL (S7, ref flexible_schema_manager.py:32-38,
  * 606-621: per-table schema cache so repeated syncs don't re-hit
  * INFORMATION_SCHEMA). Driver-side, thread-safe (inter-table parallel mode
  * shares one cache). */
final class SchemaCache(ttlMs: Long = 3600 * 1000L,
                        clock: () => Long = () => System.currentTimeMillis()) {
  private final case class Entry(schema: StructType, fetchedAt: Long)
  private val cache = TrieMap.empty[String, Entry]

  /** Cached schema for `key`, refreshed via `fetch` when absent or expired. */
  def get(key: String)(fetch: => StructType): StructType = {
    val now = clock()
    cache.get(key) match {
      case Some(e) if now - e.fetchedAt < ttlMs => e.schema
      case _ =>
        val s = fetch
        cache.put(key, Entry(s, now))
        s
    }
  }

  def invalidate(key: String): Unit = cache.remove(key)
  def size: Int = cache.size
}

/** Schema-evolution policy for the load path (ref schema_migration.py:30-140:
  * additive columns merge in, destructive drift alerts/halts). */
sealed trait EvolutionPolicy
object EvolutionPolicy {
  /** New source columns are added to the target schema (NULL for old rows —
    * parquet union semantics); removed/retyped columns still fail. */
  case object AdditiveOnly extends EvolutionPolicy
  /** Any drift fails the session. */
  case object Strict extends EvolutionPolicy
  /** Staged data is forced into the existing target schema (extra columns
    * dropped, missing ones NULL) — the reference's alignment fallback. */
  case object AlignToTarget extends EvolutionPolicy

  /** Config-string form (YAML `processing.evolution_policy`). */
  def fromName(name: String): EvolutionPolicy = name.toLowerCase match {
    case "additive" | "additive_only" => AdditiveOnly
    case "strict"                     => Strict
    case "align" | "align_to_target"  => AlignToTarget
    case other => throw new IllegalArgumentException(
      s"unknown evolution_policy: '$other' (additive | strict | align)")
  }
}

final case class SchemaDriftException(diff: Relational.SchemaDiff)
    extends RuntimeException(
      s"schema drift: added=${diff.added.map(_.name).mkString(",")} " +
        s"removed=${diff.removed.map(_.name).mkString(",")} " +
        s"changed=${diff.changed.map(_._1.name).mkString(",")}")

object SchemaEvolution {

  /** Decide how a staged batch meets an existing target schema. Returns the
    * (possibly reshaped) staged DataFrame to write.
    *
    *  - no target yet → staged as-is (first load defines the schema)
    *  - identical → as-is
    *  - AdditiveOnly → new columns kept (target readers see NULLs for old
    *    files via mergeSchema); removed/retyped → SchemaDriftException
    *  - Strict → any diff → SchemaDriftException
    *  - AlignToTarget → project staged into the target schema
    */
  def apply(staged: DataFrame, targetSchema: Option[StructType],
            policy: EvolutionPolicy): DataFrame = targetSchema match {
    case None => staged
    case Some(t) =>
      val diff = Relational.diffSchemas(t, staged.schema)
      if (diff.added.isEmpty && diff.removed.isEmpty && diff.changed.isEmpty) staged
      else policy match {
        case EvolutionPolicy.Strict => throw SchemaDriftException(diff)
        case EvolutionPolicy.AdditiveOnly =>
          if (diff.removed.nonEmpty || diff.changed.nonEmpty)
            throw SchemaDriftException(diff)
          staged // additive: parquet mergeSchema handles the union on read
        case EvolutionPolicy.AlignToTarget =>
          Relational.alignToSchema(staged, t)
      }
  }
}

/** One INFORMATION_SCHEMA.COLUMNS row — the reference's discovery input
  * (flexible_schema_manager.py:151-168 selects exactly these fields from
  * MySQL). `columnType` is the full display type (`tinyint(1)`,
  * `bigint(20) unsigned`, `enum('a','b')`) — the field that carries the
  * MySQL-dialect quirks DATA_TYPE alone loses. */
final case class InfoSchemaColumn(columnName: String, dataType: String,
                                  columnType: String, isNullable: Boolean,
                                  ordinalPosition: Int,
                                  columnDefault: Option[String] = None,
                                  extra: String = "")

/** MySQL INFORMATION_SCHEMA rows → Spark schema + rename map + warehouse
  * DDL — the reference's discovery pipeline
  * (flexible_schema_manager.py:178-272, :494-543) as a PURE function, so
  * recorded fixtures of real MySQL catalogs replay through it without a
  * live server (and `JdbcSource.discoverSchemaInfoSchema` feeds it live).
  *
  * Dialect fidelity notes (each has a TypeMapperSpec/JdbcSpec case):
  *  - `tinyint(1)` → Boolean, even when unsigned (ref :240-245 keys on the
  *    display width, not the sign)
  *  - `bigint(20) unsigned` → signed Long (ref :227-230 forces signed for
  *    warehouse compat); `int unsigned`/`smallint unsigned` WIDEN instead
  *    (top half of their range fits the next signed type)
  *  - `decimal(20,6)` → precision capped at 18, scale preserved (ref :212-219)
  *  - zero-date COLUMN_DEFAULTs (`0000-00-00 00:00:00`) are metadata, not
  *    parsed timestamps — discovery must carry them untouched (reading the
  *    VALUES needs `zeroDateTimeBehavior=convertToNull` on the MySQL URL,
  *    a connection property, not a schema concern)
  *  - `enum('a','b')`/`set(...)` value lists parse away to string types
  *  - digit-leading / mixed-case names normalize with the rename map
  *    persisted via [[ColumnMapStore]] (ref :857-873)
  */
object InfoSchemaDiscovery {
  import graft.model.TypeMapper
  import org.apache.spark.sql.types.StructField

  /** Ordered (schema, original→normalized rename map). */
  def toSchema(cols: Seq[InfoSchemaColumn]): (StructType, Map[String, String]) = {
    val ordered = cols.sortBy(_.ordinalPosition)
    val (names, mapping) =
      TypeMapper.normalizeColumnNames(ordered.map(_.columnName))
    val fields = ordered.lazyZip(names).map { (c, n) =>
      StructField(n, TypeMapper.toSparkType(c.columnType), c.isNullable)
    }
    (StructType(fields.toSeq), mapping)
  }

  /** Warehouse (Redshift-dialect) column DDL lines, normalized names. */
  def warehouseColumnDdl(cols: Seq[InfoSchemaColumn]): Seq[String] = {
    val ordered = cols.sortBy(_.ordinalPosition)
    val (names, _) = TypeMapper.normalizeColumnNames(ordered.map(_.columnName))
    ordered.lazyZip(names).map { (c, n) =>
      val nn = if (c.isNullable) "" else " NOT NULL"
      s"$n ${TypeMapper.toWarehouseDdl(c.columnType)}$nn"
    }.toSeq
  }
}

/** Column-name mapping persistence (P5, ref column_mapper.py:57-84: the
  * normalize rename map is SAVED next to the target so reads/writes apply it
  * consistently across sessions). Stored as `_column_mapping.json` inside the
  * warehouse table directory — survives alongside the data it describes. */
object ColumnMapStore {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path
  import java.nio.charset.StandardCharsets

  private def path(tableDir: String) = new Path(tableDir, "_column_mapping.json")

  // real JSON (Jackson, already on the classpath for YAML configs) — the
  // previous hand-rolled writer escaped quotes in keys only, so a column
  // name with a backslash or a quoted VALUE produced JSON the regex loader
  // silently mis-parsed, dropping rename entries across sessions
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def save(tableDir: String, mapping: Map[String, String],
           conf: Configuration): Unit = {
    if (mapping.isEmpty) return
    val p = path(tableDir)
    val fs = p.getFileSystem(conf)
    val node = jsonMapper.createObjectNode()
    mapping.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val out = fs.create(p, true)
    try out.write(jsonMapper.writeValueAsBytes(node)) finally out.close()
  }

  def load(tableDir: String, conf: Configuration): Map[String, String] = {
    val p = path(tableDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
    val node = jsonMapper.readTree(json)
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** Apply a rename map to a DataFrame (original → normalized). */
  def apply(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.select(df.columns.map(c =>
      col(c).as(mapping.getOrElse(c, c))).toIndexedSeq: _*)

  /** Delete a persisted mapping (CLI `column-map clear`, ref
    * column_mapping_commands.py:85-104). Returns true when one existed. */
  def clear(tableDir: String, conf: Configuration): Boolean = {
    val p = path(tableDir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.delete(p, false)
  }
}
