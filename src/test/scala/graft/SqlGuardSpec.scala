package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.SqlGuard
import graft.model.SqlGuard.SqlGuardViolation

/** Accept/reject matrix for the SQL guard rails (ref
  * cdc_strategy_engine.py:26-91 security validation). */
class SqlGuardSpec extends AnyFunSuite {

  test("identifiers: valid accepted, injection rejected") {
    assert(SqlGuard.validateIdentifier("order_id") == "order_id")
    assert(SqlGuard.validateQualifiedIdentifier("db.schema.t") == "db.schema.t")
    intercept[SqlGuardViolation](SqlGuard.validateIdentifier("bad-name"))
    intercept[SqlGuardViolation](SqlGuard.validateIdentifier("a; drop table x"))
    intercept[SqlGuardViolation](SqlGuard.validateIdentifier("1leading"))
    intercept[SqlGuardViolation](SqlGuard.validateQualifiedIdentifier("a..b"))
  }

  test("string literal escaping doubles quotes and rejects control chars") {
    assert(SqlGuard.escapeStringLiteral("o'brien") == "'o''brien'")
    assert(SqlGuard.escapeStringLiteral("a\\b") == "'a\\\\b'")
    intercept[SqlGuardViolation](SqlGuard.escapeStringLiteral("a\u0000b"))
  }

  test("custom SQL: SELECT-only, no chaining, no comments, no mutation") {
    assert(SqlGuard.validateCustomSql("SELECT * FROM t").nonEmpty)
    assert(SqlGuard.validateCustomSql("WITH x AS (SELECT 1) SELECT * FROM x").nonEmpty)
    intercept[SqlGuardViolation](SqlGuard.validateCustomSql("DELETE FROM t"))
    intercept[SqlGuardViolation](SqlGuard.validateCustomSql("SELECT 1; DROP TABLE t"))
    intercept[SqlGuardViolation](SqlGuard.validateCustomSql("SELECT 1 -- hidden"))
    intercept[SqlGuardViolation](SqlGuard.validateCustomSql("SELECT 1 /* c */"))
    intercept[SqlGuardViolation](
      SqlGuard.validateCustomSql("SELECT * FROM t WHERE exec = 1"))
    intercept[SqlGuardViolation](SqlGuard.validateCustomSql("SELECT " + "x," * 6000 + "y"))
  }

  test("keyword blocklist is word-bounded (created_at does not trip on create)") {
    assert(SqlGuard.validateCustomSql("SELECT created_at, updated_at FROM t").nonEmpty)
    assert(SqlGuard.validateCustomSqlFragment("created_at > '2026-01-01'").nonEmpty)
  }

  test("predicate fragments: mutation/chaining rejected") {
    assert(SqlGuard.validateCustomSqlFragment("status = 'F' AND price > 10").nonEmpty)
    intercept[SqlGuardViolation](
      SqlGuard.validateCustomSqlFragment("1=1; drop table x"))
    intercept[SqlGuardViolation](
      SqlGuard.validateCustomSqlFragment("x = 1 or delete from t"))
  }

  test("template rendering substitutes validated placeholders") {
    val sql = SqlGuard.renderCustomSql(
      "SELECT * FROM {table_name} WHERE ts > {last_timestamp} AND id > {last_id}",
      "db.orders", Some("2026-01-01 00:00:00"), Some(7L), None)
    assert(sql == "SELECT * FROM db.orders WHERE ts > '2026-01-01 00:00:00' AND id > 7")
    intercept[SqlGuardViolation](SqlGuard.renderCustomSql(
      "SELECT * FROM {table_name}", "bad name!", None, None, None))
  }

  test("keywords inside string LITERALS are legitimate content") {
    assert(SqlGuard.validateCustomSql(
      "SELECT * FROM t WHERE note = 'please update later'").nonEmpty)
    assert(SqlGuard.validateCustomSqlFragment(
      "note = 'we can''t drop this client'").nonEmpty)
    // outside a literal the keyword still trips
    intercept[SqlGuardViolation](
      SqlGuard.validateCustomSql("SELECT * FROM t WHERE update = 1"))
  }

  test("{limit} clamps to INT (Spark LIMIT rejects BIGINT literals)") {
    val none = SqlGuard.renderCustomSql(
      "SELECT * FROM {table_name} LIMIT {limit}", "db.t", None, None, None)
    assert(none.endsWith(s"LIMIT ${Int.MaxValue}"))
    val big = SqlGuard.renderCustomSql(
      "SELECT * FROM {table_name} LIMIT {limit}", "db.t", None, None,
      Some(5000000000L))
    assert(big.endsWith(s"LIMIT ${Int.MaxValue}"))
    val small = SqlGuard.renderCustomSql(
      "SELECT * FROM {table_name} LIMIT {limit}", "db.t", None, None, Some(10L))
    assert(small.endsWith("LIMIT 10"))
  }
}
