package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.ExpectationSpec

/** Declarative post-load data-quality gate (YAML `tables.<t>.expectations`):
  * the reference's count-validation idea generalized to column contracts.
  * Every rule across every expectation evaluates in ONE aggregate pass over
  * the table (one job, map-side partials — no per-rule scans), so the gate's
  * cost at 100 TB is one scan regardless of how many contracts it checks.
  * `distinct_min` uses approx_count_distinct (HLL: deterministic, ~1% rsd —
  * thresholds should carry margin); min/max/null-fraction/row-count and
  * row-level `expression` predicates (cross-column contracts; a NULL
  * predicate result is a violation — NULL is not TRUE) are exact.
  * Returns human-readable violation messages; empty = pass.
  */
object Expectations {

  def violations(df: DataFrame, specs: Seq[ExpectationSpec]): Seq[String] = {
    if (specs.isEmpty) return Nil
    val missing = specs.flatMap(_.column).distinct
      .filterNot(df.columns.contains)
      .map(c => s"expectation column '$c' not in table")
    if (missing.nonEmpty) return missing

    // min/max bounds are NUMERIC contracts: a non-numeric column can't
    // satisfy one, and under ANSI a string→double cast on the aggregate
    // would throw mid-job — refuse it as a named violation up front instead
    def numeric(c: String): Boolean = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }
    val nonNumeric = specs.zipWithIndex.flatMap { case (e, i) =>
      e.column.filter(c =>
        (e.minValue.isDefined || e.maxValue.isDefined) && !numeric(c))
        .map(c => i -> (s"$c: min/max bound declared on non-numeric column " +
          s"(${df.schema(c).dataType.simpleString})"))
    }.toMap
    // row-level expression contracts resolve against the schema up front:
    // an unresolvable or non-boolean predicate is a NAMED violation, not a
    // mid-job AnalysisException after extract+load already committed
    val exprBad = specs.zipWithIndex.flatMap { case (e, i) =>
      e.expression.flatMap { sql =>
        try {
          val dt = df.selectExpr(sql).schema.head.dataType
          if (dt != org.apache.spark.sql.types.BooleanType)
            Some(i -> s"expression '$sql' is ${dt.simpleString}, not boolean")
          else {
            // probe the EXACT shape the gate will run: a row-level contract
            // containing its own aggregate/window (`count(*) > 100` — the
            // row_count_min mistake) resolves under selectExpr but throws
            // nested-aggregate when embedded in the gate's single agg pass
            df.agg(sum(when(coalesce(expr(sql), lit(false)), 0L)
              .otherwise(1L))).queryExecution.assertAnalyzed()
            None
          }
        } catch {
          case ex: org.apache.spark.sql.AnalysisException =>
            Some(i -> (s"expression '$sql' does not resolve as a row-level " +
              s"predicate: ${ex.getMessage.linesIterator.next()}"))
        }
      }
    }.toMap

    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("__n"))
    specs.zipWithIndex.foreach { case (e, i) =>
      e.expression.foreach { sql =>
        // a row where the predicate is NULL is a violation: the contract
        // says "every row satisfies P", and NULL is not TRUE
        if (!exprBad.contains(i))
          aggs += sum(when(coalesce(expr(sql), lit(false)), 0L)
            .otherwise(1L)).as(s"__x_$i")
      }
      e.column.foreach { c =>
        val num = !nonNumeric.contains(i)
        if (e.minValue.isDefined && num)
          aggs += min(col(c)).cast("double").as(s"__min_$i")
        if (e.maxValue.isDefined && num)
          aggs += max(col(c)).cast("double").as(s"__max_$i")
        if (e.nullFracMax.isDefined)
          aggs += avg(col(c).isNull.cast("double")).as(s"__nf_$i")
        if (e.distinctMin.isDefined)
          aggs += approx_count_distinct(col(c), 0.01).as(s"__d_$i")
      }
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
    def d(name: String): Option[Double] = {
      val idx = row.fieldIndex(name)
      if (row.isNullAt(idx)) None else Some(row.getDouble(idx))
    }
    val n = row.getLong(row.fieldIndex("__n"))

    specs.zipWithIndex.flatMap { case (e, i) =>
      val c = e.column.getOrElse("")
      // a non-numeric column under a bound contract reported once, up front;
      // a NULL aggregate on a numeric column means ALL-NULL — neither can
      // satisfy a declared bound by vacuity, so both violate rather than pass
      def bound(kind: String, m: Double, slot: String)(
          cmp: Double => Boolean, sym: String): Option[String] =
        if (nonNumeric.contains(i)) None // reported via vType below
        else d(slot) match {
          // an EMPTY table is vacuously within any bound (emptiness is
          // row_count_min's contract, not min/max's); a NULL aggregate
          // over n>0 rows means the column is genuinely all-NULL
          case None if n > 0 => Some(
            s"$c: $kind bound declared but the column is all-NULL")
          case None => None
          case Some(v) if cmp(v) => Some(f"$c: $kind $v%.6g $sym $m%.6g")
          case _ => None
        }
      val vType = nonNumeric.get(i)
      val vMin = e.minValue.flatMap(m =>
        bound("min", m, s"__min_$i")(_ < m, "< required"))
      val vMax = e.maxValue.flatMap(m =>
        bound("max", m, s"__max_$i")(_ > m, "> allowed"))
      val vNull = e.nullFracMax.flatMap(m => d(s"__nf_$i").collect {
        case v if v > m => f"$c: null fraction $v%.4f > allowed $m%.4f" })
      val vDist = e.distinctMin.flatMap { m =>
        val idx = row.fieldIndex(s"__d_$i")
        val v = row.getLong(idx)
        if (v < m) Some(s"$c: ~$v distinct < required $m") else None
      }
      val vRows = e.rowCountMin.collect {
        case m if n < m => s"row count $n < required $m" }
      val vExprBad = exprBad.get(i)
      val vExpr = e.expression.filterNot(_ => exprBad.contains(i)).flatMap {
        sql =>
          val idx = row.fieldIndex(s"__x_$i")
          val v = if (row.isNullAt(idx)) 0L else row.getLong(idx)
          if (v > e.maxViolations) Some(
            s"expression '$sql': $v rows violate" +
              (if (e.maxViolations > 0) s" (> ${e.maxViolations} tolerated)"
               else "")) else None
      }
      Seq(vType, vMin, vMax, vNull, vDist, vRows, vExprBad, vExpr).flatten
    }
  }
}
