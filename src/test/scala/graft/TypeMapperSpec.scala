package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.model.TypeMapper

/** MySQL→Spark→warehouse type matrix (reference semantics, SURVEY §1.2 /
  * FIXTURES.md §B1). */
class TypeMapperSpec extends AnyFunSuite {

  test("mysql → spark type matrix") {
    val cases = Seq(
      "varchar(255)" -> StringType,
      "char(8)" -> StringType,
      "text" -> StringType,
      "longtext" -> StringType,
      "bigint" -> LongType,
      "bigint unsigned" -> LongType,        // forced signed
      "int" -> IntegerType,
      "mediumint" -> IntegerType,
      "smallint" -> ShortType,
      "tinyint(1)" -> BooleanType,          // boolean convention
      "tinyint" -> ShortType,
      "tinyint(3)" -> ShortType,
      "decimal(20,6)" -> DecimalType(18, 6), // precision capped at 18
      "decimal(10,2)" -> DecimalType(10, 2),
      "decimal" -> DecimalType(15, 4),       // financial default
      "float" -> FloatType,
      "double" -> DoubleType,
      "datetime" -> TimestampType,
      "timestamp" -> TimestampType,
      "date" -> DateType,
      "time" -> StringType,
      "json" -> StringType,
      "blob" -> BinaryType,
      "longblob" -> BinaryType,
      "varbinary(16)" -> BinaryType,
      "enum('a','b')" -> StringType,
      "bit(1)" -> BooleanType,
      "year" -> IntegerType,
      "geometry" -> StringType)              // conservative fallback
    cases.foreach { case (mysql, expected) =>
      assert(TypeMapper.toSparkType(mysql) == expected, s"for $mysql")
    }
  }

  test("mysql → warehouse DDL matrix") {
    val cases = Seq(
      "varchar(100)" -> "VARCHAR(200)",      // 2x safety buffer
      "varchar(40000)" -> "VARCHAR(65535)",  // capped
      "text" -> "VARCHAR(65535)",
      "tinyint(1)" -> "BOOLEAN",
      "tinyint" -> "SMALLINT",
      "decimal(20,6)" -> "DECIMAL(18,6)",
      "double" -> "FLOAT",
      "datetime" -> "TIMESTAMP",
      "enum('x')" -> "VARCHAR(255)",
      "blob" -> "VARCHAR(65535)")
    cases.foreach { case (mysql, expected) =>
      assert(TypeMapper.toWarehouseDdl(mysql) == expected, s"for $mysql")
    }
  }

  test("spark → warehouse DDL") {
    assert(TypeMapper.sparkToWarehouseDdl(DecimalType(22, 4)) == "DECIMAL(18,4)")
    assert(TypeMapper.sparkToWarehouseDdl(TimestampNTZType) == "TIMESTAMP")
    assert(TypeMapper.sparkToWarehouseDdl(BinaryType) == "VARCHAR(65535)")
  }

  test("parseMySqlType never throws on arbitrary strings (scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.asciiPrintableStr
    (1 to 200).foreach { i =>
      val s = gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      TypeMapper.parseMySqlType(s)   // must not throw
      TypeMapper.toSparkType(s)      // falls back to StringType
      TypeMapper.toWarehouseDdl(s)   // falls back to VARCHAR
    }
  }

  test("normalizeColumnName is idempotent") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.identifier
    (1 to 200).foreach { i =>
      val s = gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse("x")
      val (once, _) = TypeMapper.normalizeColumnName(s)
      val (twice, changed) = TypeMapper.normalizeColumnName(once)
      assert(twice == once)
      assert(!changed)
    }
  }

  test("column-name normalization: lowercase + digit-leading prefix") {
    assert(TypeMapper.normalizeColumnName("2ND_REF") == ("col_2nd_ref", true))
    assert(TypeMapper.normalizeColumnName("MixedCase") == ("mixedcase", true))
    assert(TypeMapper.normalizeColumnName("ok_name") == ("ok_name", false))
    val (names, mapping) = TypeMapper.normalizeColumnNames(Seq("A", "9lives", "ok"))
    assert(names == Seq("a", "col_9lives", "ok"))
    assert(mapping == Map("A" -> "a", "9lives" -> "col_9lives"))
  }

  test("unsigned widening and MySQL decimal scale defaults") {
    import org.apache.spark.sql.types._
    // unsigned int/smallint WIDEN (top half of the range overflows signed)
    assert(TypeMapper.toSparkType("int unsigned") == LongType)
    assert(TypeMapper.toSparkType("smallint unsigned") == IntegerType)
    assert(TypeMapper.toSparkType("int") == IntegerType)
    assert(TypeMapper.toWarehouseDdl("int unsigned") == "BIGINT")
    assert(TypeMapper.toWarehouseDdl("smallint unsigned") == "INTEGER")
    // decimal(p) means (p,0) in MySQL — a (p,4) default would shrink the
    // integer range and null values like 1234567890
    assert(TypeMapper.toSparkType("decimal(10)") == DecimalType(10, 0))
    assert(TypeMapper.toSparkType("decimal") == DecimalType(15, 4))
    assert(TypeMapper.toSparkType("decimal(12,2)") == DecimalType(12, 2))
    assert(TypeMapper.toWarehouseDdl("decimal(10)") == "DECIMAL(10,0)")
  }

  test("safeName disambiguates names that sanitize identically") {
    import graft.model.TableId
    val a = TableId("c", "s", "order-items").safeName
    val b = TableId("c", "s", "order_items").safeName
    assert(a != b, "distinct tables share one staging/warehouse directory")
    assert(b == "c_s_order_items") // clean names keep their readable form
    assert(a.startsWith("c_s_order_items_"))
  }
}
