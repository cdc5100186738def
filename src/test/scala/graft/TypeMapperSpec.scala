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
}
