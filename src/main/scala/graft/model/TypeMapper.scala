package graft.model

import org.apache.spark.sql.types._

/** Three-way type mapping MySQL → Spark `DataType` → warehouse (Redshift-dialect)
  * DDL, preserving the reference's semantics:
  * `FlexibleSchemaManager._map_mysql_to_pyarrow`
  * (src/core/flexible_schema_manager.py:206-272) and `_map_mysql_to_redshift`
  * (:494-543).
  *
  * Semantics preserved (SURVEY §1.2):
  *  - unsigned bigint forced signed (ref :227-230)
  *  - tinyint(1) → Boolean, other tinyint → Short ("better range", ref :240-245)
  *  - decimal precision capped at 18 for Spectrum compat (ref :212-219)
  *  - varchar gets a 2× safety buffer capped at 65535 in DDL (ref :499-504)
  *  - json/enum/set → string (ref :262-269)
  *  - column names lowercased; digit-leading names get `col_` prefix with the
  *    mapping persisted (ref :184-185, :857-873; src/core/column_mapper.py:44-84)
  */
object TypeMapper {

  /** Parsed MySQL column-type string, e.g. "decimal(20,6)" or "tinyint(1) unsigned". */
  final case class MySqlType(base: String, precision: Option[Int], scale: Option[Int],
                             unsigned: Boolean)

  private val TypeRe = """^\s*([a-zA-Z0-9_]+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?(.*)$""".r

  def parseMySqlType(raw: String): MySqlType = raw.toLowerCase match {
    case TypeRe(base, p, s, rest) =>
      MySqlType(base, Option(p).map(_.toInt), Option(s).map(_.toInt),
        rest != null && rest.contains("unsigned"))
    case other => MySqlType(other.trim, None, None, unsigned = false)
  }

  /** MySQL type string → Spark DataType (ref flexible_schema_manager.py:206-272). */
  def toSparkType(raw: String): DataType = {
    val t = parseMySqlType(raw)
    t.base match {
      case "varchar" | "char" => StringType
      case b if b.endsWith("text") => StringType
      case "bigint" => LongType // forced signed even when unsigned (ref :227-230)
      // unsigned int/smallint WIDEN — the top half of their range overflows
      // the signed Spark type (int unsigned 3e9 > Int.MaxValue would null
      // or throw on ingest)
      case "int" | "integer" | "mediumint" =>
        if (t.unsigned) LongType else IntegerType
      case "smallint" =>
        if (t.unsigned) IntegerType else ShortType
      case "tinyint" =>
        if (t.precision.contains(1)) BooleanType
        else ShortType // signed or unsigned: 0..255 and -128..127 both fit SHORT
      case "decimal" | "numeric" =>
        // precision capped at 18 (ref :212-219). Scale defaults: bare
        // `decimal` → the financial (15,4); `decimal(p)` → (p,0), matching
        // MySQL (a (p,4) default would shrink the integer range and null
        // large values)
        val p = math.min(t.precision.getOrElse(15), 18)
        val s = math.min(t.scale.getOrElse(
          if (t.precision.isDefined) 0 else 4), p)
        DecimalType(p, s)
      case "float" | "real" => FloatType
      case "double" => DoubleType
      case "datetime" | "timestamp" => TimestampType // µs native
      case "date" => DateType
      case "time" => StringType // no native TIME in Spark (SURVEY §1.2)
      case "json" => StringType
      case b if b.endsWith("blob") || b == "binary" || b == "varbinary" => BinaryType
      case "enum" | "set" => StringType
      case "bit" => if (t.precision.forall(_ <= 1)) BooleanType else LongType
      case "year" => IntegerType
      case _ => StringType // conservative default, mirrors ref's string fallback
    }
  }

  /** MySQL type string → Redshift-dialect DDL type (ref :494-543, defaults :577-604). */
  def toWarehouseDdl(raw: String): String = {
    val t = parseMySqlType(raw)
    t.base match {
      case "varchar" | "char" =>
        // 2× safety buffer capped at 65535 (ref :499-504)
        val len = math.min(t.precision.getOrElse(255) * 2, 65535)
        s"VARCHAR($len)"
      case b if b.endsWith("text") => "VARCHAR(65535)"
      case "bigint" => "BIGINT"
      case "int" | "integer" | "mediumint" =>
        if (t.unsigned) "BIGINT" else "INTEGER"
      case "smallint" => if (t.unsigned) "INTEGER" else "SMALLINT"
      case "tinyint" => if (t.precision.contains(1)) "BOOLEAN" else "SMALLINT"
      case "decimal" | "numeric" =>
        val p = math.min(t.precision.getOrElse(15), 18)
        val s = math.min(t.scale.getOrElse(
          if (t.precision.isDefined) 0 else 4), p)
        s"DECIMAL($p,$s)"
      case "float" | "real" | "double" => "FLOAT"
      case "datetime" | "timestamp" => "TIMESTAMP"
      case "date" => "DATE"
      case "time" => "TIME"
      case "json" => "VARCHAR(65535)"
      case b if b.endsWith("blob") => "VARCHAR(65535)" // ref :601
      case "enum" | "set" => "VARCHAR(255)" // ref :602-603
      case _ => "VARCHAR(65535)"
    }
  }

  /** Spark DataType → warehouse DDL (for schemas discovered from Parquet/JDBC). */
  def sparkToWarehouseDdl(dt: DataType): String = dt match {
    case StringType => "VARCHAR(65535)"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType | ByteType => "SMALLINT"
    case BooleanType => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${math.min(d.precision, 18)},${d.scale})"
    case FloatType | DoubleType => "FLOAT"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "VARCHAR(65535)"
    case _ => "VARCHAR(65535)"
  }

  /** Normalize a column name: lowercase + `col_` prefix for digit-leading names.
    * Returns (normalized, changed). Ref flexible_schema_manager.py:857-873 and
    * column_mapper.py:44-54. */
  def normalizeColumnName(name: String): (String, Boolean) = {
    val lower = name.toLowerCase
    val normalized = if (lower.nonEmpty && lower.head.isDigit) s"col_$lower" else lower
    (normalized, normalized != name)
  }

  /** Normalize all names in a schema; returns (newNames, mapping original→new
    * for the names that changed — persisted like column_mapper.py:57-84). */
  def normalizeColumnNames(names: Seq[String]): (Seq[String], Map[String, String]) = {
    val pairs = names.map(n => n -> normalizeColumnName(n)._1)
    (pairs.map(_._2), pairs.filter { case (o, n) => o != n }.toMap)
  }
}
