package graft.model

/** Guard rails for user-supplied SQL fragments, ported in spirit from the
  * reference's custom-SQL security validation
  * (src/core/cdc_strategy_engine.py:26-91: identifier allowlist regex, value
  * escaping, SELECT-only + keyword blocklist + length cap for custom SQL).
  * Applied before any string reaches `spark.sql(...)` or `expr(...)`.
  */
object SqlGuard {

  val MaxCustomSqlLength = 10000 // ref cdc_strategy_engine.py custom SQL cap

  private val IdentifierRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val QualifiedIdentifierRe =
    "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*$".r

  /** Keyword blocklist for custom SQL (ref :54-91). */
  private val ForbiddenKeywords = Seq(
    "insert", "update", "delete", "drop", "create", "alter", "truncate",
    "grant", "revoke", "exec", "execute", "call", "merge", "replace into",
    "load data", "into outfile", "into dumpfile")

  final case class SqlGuardViolation(message: String)
      extends IllegalArgumentException(message)

  /** Validate a bare SQL identifier (column/table name). */
  def validateIdentifier(name: String): String = {
    if (IdentifierRe.findFirstIn(name).isEmpty)
      throw SqlGuardViolation(s"invalid SQL identifier: '$name'")
    name
  }

  /** Validate a possibly-qualified identifier (schema.table). */
  def validateQualifiedIdentifier(name: String): String = {
    if (QualifiedIdentifierRe.findFirstIn(name).isEmpty)
      throw SqlGuardViolation(s"invalid qualified identifier: '$name'")
    name
  }

  /** Escape a string literal for inclusion in SQL (single-quote doubling;
    * rejects control chars that have no business in a literal). */
  def escapeStringLiteral(v: String): String = {
    if (v.exists(c => c < ' ' && c != '\t'))
      throw SqlGuardViolation("control character in SQL literal")
    "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  /** Lowered text with single-quoted string literals blanked ('' doubling
    * included), so the keyword scan never fires on literal CONTENT — a
    * read-only query mentioning 'please update later' in a literal is
    * legitimate. The structural checks (chaining, comments) still run on
    * the full text: a ';' or '--' inside a literal stays forbidden, which
    * is conservative but safe. */
  private def lowerNoLiterals(text: String): String =
    text.toLowerCase.replaceAll("'(?:[^']|'')*'", "''")

  /** Validate a custom-SQL template: SELECT-only, bounded length, no mutating
    * keywords, no statement chaining, no comments (ref :54-91). */
  def validateCustomSql(sql: String): String = {
    val trimmed = sql.trim
    if (trimmed.length > MaxCustomSqlLength)
      throw SqlGuardViolation(s"custom SQL exceeds $MaxCustomSqlLength chars")
    val lower = trimmed.toLowerCase
    if (!(lower.startsWith("select") || lower.startsWith("with")))
      throw SqlGuardViolation("custom SQL must be SELECT-only")
    if (trimmed.contains(";"))
      throw SqlGuardViolation("statement chaining (';') not allowed")
    if (lower.contains("--") || lower.contains("/*"))
      throw SqlGuardViolation("SQL comments not allowed in custom SQL")
    val scannable = lowerNoLiterals(trimmed)
    ForbiddenKeywords.foreach { kw =>
      // word-boundary match so e.g. 'created_at' does not trip on 'create'
      val re = ("(?s).*\\b" + java.util.regex.Pattern.quote(kw) + "\\b.*").r
      if (re.findFirstIn(scannable).isDefined)
        throw SqlGuardViolation(s"forbidden keyword in custom SQL: '$kw'")
    }
    trimmed
  }

  /** Validate a bare predicate fragment (the `additional_where` config knob,
    * cdc_strategy_engine.py:253-259): no chaining, no comments, no mutating
    * keywords. Returns the fragment for use inside `expr(...)`. */
  def validateCustomSqlFragment(fragment: String): String = {
    val trimmed = fragment.trim
    if (trimmed.length > MaxCustomSqlLength)
      throw SqlGuardViolation("predicate fragment too long")
    if (trimmed.contains(";"))
      throw SqlGuardViolation("statement chaining (';') not allowed")
    if (trimmed.contains("--") || trimmed.contains("/*"))
      throw SqlGuardViolation("SQL comments not allowed")
    val scannable = lowerNoLiterals(trimmed)
    ForbiddenKeywords.foreach { kw =>
      val re = ("(?s).*\\b" + java.util.regex.Pattern.quote(kw) + "\\b.*").r
      if (re.findFirstIn(scannable).isDefined)
        throw SqlGuardViolation(s"forbidden keyword in predicate: '$kw'")
    }
    trimmed
  }

  /** Render a custom-SQL template, substituting the reference's placeholders
    * `{table_name} {last_timestamp} {last_id} {limit}`
    * (cdc_strategy_engine.py:810-821) with validated/escaped values. */
  def renderCustomSql(template: String, tableName: String,
                      lastTimestamp: Option[String], lastId: Option[Long],
                      limit: Option[Long]): String = {
    val validated = validateCustomSql(template)
    validated
      .replace("{table_name}", validateQualifiedIdentifier(tableName))
      .replace("{last_timestamp}",
        lastTimestamp.map(escapeStringLiteral).getOrElse("'1970-01-01 00:00:00'"))
      // -1, not 0: templates compare strictly (`id > {last_id}`), and id
      // sequences legitimately start at 0 — a 0 default silently drops the
      // first row of the first sync
      .replace("{last_id}", lastId.getOrElse(-1L).toString)
      // clamp: Spark's LIMIT requires an INT expression — an unclamped Long
      // renders a BIGINT literal and fails analysis on every run
      .replace("{limit}",
        math.min(limit.getOrElse(Int.MaxValue.toLong), Int.MaxValue.toLong).toString)
  }
}
