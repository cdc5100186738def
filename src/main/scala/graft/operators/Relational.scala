package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-load relational operators: the reference's hand-written SQL patterns
  * (ROW_NUMBER dedup, DELETE+INSERT merge, parity validation, latest-status
  * views) as native Spark operators. SURVEY §2.3-§2.5.
  */
object Relational {

  // --------------------------------------------------------------------------
  // P1/P2 — schema alignment projection
  // --------------------------------------------------------------------------

  /** Align `df` to `target`: reorder to target order, add missing columns as
    * typed NULLs, cast mismatched types, drop extras. Non-nullable strings get
    * "" instead of NULL (the reference's Redshift-compat rule,
    * s3_manager.py:803-825; alignment :705-845).
    *
    * One narrow projection — no shuffle, stays inside whole-stage codegen.
    */
  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    val existing = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val cols = target.fields.map { f =>
      existing.get(f.name.toLowerCase) match {
        case Some(src) =>
          val c = col(src.name).cast(f.dataType)
          val padded =
            if (f.dataType == StringType && !f.nullable) coalesce(c, lit(""))
            else c
          padded.as(f.name)
        case None =>
          // missing column → typed NULL ("" for non-nullable strings)
          val base =
            if (f.dataType == StringType && !f.nullable) lit("")
            else lit(null).cast(f.dataType)
          base.as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Schema drift report (added / removed / type-changed), the Spark analog of
    * `compare_schemas` (flexible_schema_manager.py:667-713). */
  final case class SchemaDiff(added: Seq[StructField], removed: Seq[StructField],
                              changed: Seq[(StructField, StructField)]) {
    def isCompatible: Boolean = removed.isEmpty && changed.isEmpty
  }

  def diffSchemas(old: StructType, next: StructType): SchemaDiff = {
    val o = old.fields.map(f => f.name.toLowerCase -> f).toMap
    val n = next.fields.map(f => f.name.toLowerCase -> f).toMap
    SchemaDiff(
      added = next.fields.toIndexedSeq.filterNot(f => o.contains(f.name.toLowerCase)),
      removed = old.fields.toIndexedSeq.filterNot(f => n.contains(f.name.toLowerCase)),
      changed = old.fields.toIndexedSeq.flatMap(f =>
        n.get(f.name.toLowerCase)
          .filter(_.dataType != f.dataType).map(f -> _)))
  }

  // --------------------------------------------------------------------------
  // J1/W1 — latest-per-key dedup
  // --------------------------------------------------------------------------

  /** Keep the latest row per key: `ROW_NUMBER() OVER (PARTITION BY keys ORDER
    * BY ordering DESC) = 1`. The reference does this with a self-join back on
    * id (settle_orders_download_and_sync.py:299-309); the window form avoids
    * the join entirely — one shuffle on the key, no second scan.
    *
    * Scale: the shuffle is on the dedup key, which is exactly the partitioning
    * a downstream merge wants, so the exchange is reusable. Skewed keys are the
    * caller's concern (salt first if one key holds >1 partition of rows).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Convenience: latest by (tsCol DESC, idCol DESC) — the reference's exact
    * ordering (ROW_NUMBER ... ORDER BY created_at DESC, id DESC). */
  def dedupLatestByTs(df: DataFrame, keys: Seq[String], tsCol: String,
                      idCol: String): DataFrame =
    dedupLatest(df, keys, Seq(col(tsCol).desc, col(idCol).desc))

  // --------------------------------------------------------------------------
  // J2 — merge (upsert): DELETE USING + INSERT as anti-join ∪ staged
  // --------------------------------------------------------------------------

  /** Merge staged rows into target by key: rows in target whose key appears in
    * staged are replaced; all staged rows inserted. Equivalent to the
    * reference's Redshift `DELETE ... USING staged; INSERT INTO ... SELECT *`
    * transaction (settle_orders_download_and_sync.py:326-388).
    *
    * Implementation: `target ANTI JOIN staged ON keys` ∪ staged. If staged is
    * small (a CDC increment usually is), Spark broadcasts the anti-join build
    * side automatically — no full shuffle of the 100 TB target.
    */
  def merge(target: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame = {
    val survivors = target.join(staged.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    // by-name union with missing-column tolerance: an additively-evolved
    // increment keeps its new columns (survivors read NULL) instead of having
    // them silently projected away; destructive drift is refused UPSTREAM by
    // the loader's SchemaEvolution gate
    survivors.unionByName(staged, allowMissingColumns = true)
  }

  // --------------------------------------------------------------------------
  // J3 — blacklist anti-join (file-level dedup)
  // --------------------------------------------------------------------------

  /** Exclude rows of already-processed files: `input_file_name()` against the
    * blacklist (ref gemini_redshift_loader.py:498-527). The blacklist is
    * driver-side (set lookup, O(1) per file like ref
    * simple_watermark_manager.py:231-249) when small; as a DataFrame anti-join
    * when it outgrows the driver. */
  def excludeProcessedFiles(df: DataFrame, processed: Set[String]): DataFrame =
    if (processed.isEmpty) df
    else df.filter(!input_file_name().isin(processed.toSeq: _*))

  // --------------------------------------------------------------------------
  // A4/A6 — parity validation aggregates
  // --------------------------------------------------------------------------

  /** COUNT / COUNT DISTINCT / MIN / MAX parity check between two relations
    * (ref settle_orders_download_and_sync.py:143-274). Returns (sourceStats,
    * targetStats) rows with identical schema for equality assertion.
    * At 100 TB use `approxDistinct = true` (HLL, no exact distinct shuffle). */
  def parityStats(df: DataFrame, keyCol: String, tsCol: String,
                  approxDistinct: Boolean = false): DataFrame = {
    val distinctAgg =
      if (approxDistinct) approx_count_distinct(col(keyCol)).as("distinct_keys")
      else countDistinct(col(keyCol)).as("distinct_keys")
    df.agg(
      count(lit(1)).as("row_count"),
      distinctAgg,
      min(col(keyCol)).as("min_key"),
      max(col(keyCol)).as("max_key"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"))
  }

  /** Per-column null counts in one pass (ref validation.py:138-350). */
  def nullStats(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(c =>
      sum(col(c).isNull.cast("long")).as(s"${c}_nulls")).toIndexedSeq: _*)

  /** One-pass data profile: per column — null count, approx distinct,
    * min/max (numeric/timestamp/string alike), and for NUMERIC columns
    * sketch-based p50/p95 — the engine's form of the reference's data-quality
    * report (validation.py:138-350). One wide aggregation, one job; approx
    * distinct is HLL and the percentiles are KLL-style `approx_percentile`,
    * so nothing sorts or shuffles exactly at 100 TB. Output: one row per
    * column (non-numeric columns carry NULL percentiles). */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val numeric = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        approx_count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")) ++
        (if (numeric(c)) Seq(
          approx_percentile(col(c).cast("double"), lit(0.5), lit(1000))
            .as(s"__p50_$c"),
          approx_percentile(col(c).cast("double"), lit(0.95), lit(1000))
            .as(s"__p95_$c"))
        else Nil)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into one row per column
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("row_count"),
        col(s"__nulls_$c").as("null_count"),
        col(s"__distinct_$c").as("approx_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        (if (numeric(c)) col(s"__p50_$c")
         else lit(null).cast("double")).as("approx_p50"),
        (if (numeric(c)) col(s"__p95_$c")
         else lit(null).cast("double")).as("approx_p95"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  // --------------------------------------------------------------------------
  // A5 — latest-status analytic view
  // --------------------------------------------------------------------------

  /** "Latest status" conditional-count view: dedup to latest per key, then
    * GROUP BY status with share-of-total (ref LATEST_STATUS_USAGE.sql:17-40).
    */
  def latestStatusSummary(df: DataFrame, key: String, statusCol: String,
                          tsCol: String, idCol: String): DataFrame = {
    val latest = dedupLatestByTs(df, Seq(key), tsCol, idCol)
    latest.groupBy(col(statusCol))
      .agg(count(lit(1)).as("cnt"))
      // integer counts divided once in double — bitwise-deterministic across
      // engines, unlike rounded floating sums
      .withColumn("share_pct",
        col("cnt") * lit(100.0) / sum(col("cnt")).over(Window.partitionBy()))
  }

  // --------------------------------------------------------------------------
  // Deterministic dataset split (training-data staple)
  // --------------------------------------------------------------------------

  /** Deterministic train/validation split keyed on a stable id: assignment is
    * `md5(key)` prefix vs a fraction threshold, so the same row lands in the
    * same split across runs, engines, partitionings, and data growth (new
    * rows never reshuffle existing assignments — unlike `randomSplit`, which
    * is seed- AND partitioning-dependent). md5 is chosen deliberately: every
    * engine computes the identical hex, so the split is reproducible outside
    * Spark. Narrow projection — no shuffle, stays in codegen. */
  /** The md5-prefix threshold shared by [[deterministicSplit]] and the
    * corpus samplers (`CorpusFunctions.sampleByGroup`): lowercase-hex md5
    * prefix compared lexicographically — equals numeric comparison because
    * the width is fixed. ONE definition: the samplers' growth-stability
    * guarantee depends on staying bit-identical with the splitter. */
  def md5Below(key: Column, fraction: Double): Column = {
    val t = math.round(fraction * 4294967296.0) // fraction of 2^32
    if (t >= 4294967296L) lit(true)
    else if (t <= 0L) lit(false)
    else substring(md5(key.cast("string").cast("binary")), 1, 8) < lit(f"$t%08x")
  }

  def deterministicSplit(df: DataFrame, keyCol: String, trainFraction: Double,
                         splitCol: String = "split"): DataFrame = {
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      "trainFraction must be in [0,1]")
    df.withColumn(splitCol,
      when(md5Below(col(keyCol), trainFraction), "train").otherwise("validation"))
  }

  // --------------------------------------------------------------------------
  // As-of join (operator Spark lacks natively)
  // --------------------------------------------------------------------------

  /** As-of join: attach to each left row the payload of the LATEST right row
    * with `rightTs <= leftTs` (or `<` when `strict`) in the same key group —
    * the point-in-time lookup every feature/training pipeline needs (latest
    * dimension snapshot, last signup before an event, price as of a trade).
    *
    * Formulation: ONE shuffle on the key. Both sides union into a single
    * relation ordered by (ts, side, rightOrder); a running
    * `last(payload-struct, ignoreNulls)` window then carries the most recent
    * right payload forward onto each left row. This is the scalable shape —
    * no per-row subquery, no range self-join, no broadcast requirement; cost
    * is one sort-shuffle of |L|+|R| rows like any windowed aggregation.
    *
    * Ties on the timestamp: among right rows sharing (keys, ts), the LAST by
    * `rightOrder` wins (pass an id column for determinism). The payload
    * travels as one struct, so all attached columns come from the SAME right
    * row even when some of its fields are null. Right rows with null ts are
    * dropped (no defined position in as-of time).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               rightOrder: Seq[String] = Nil,
               strict: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    // side ordering at equal ts decides inclusivity: right-before-left → the
    // same-ts right row is visible (<=); left-before-right → it is not (<)
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ats", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .withColumn("__pay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
      .withColumn("__ord", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightOrder.map(col): _*).schema.fields)))
    val r = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ats", col(rightTs))
      .withColumn("__side", lit(rightSide))
      .withColumn("__pay", struct(payload.map(col): _*))
      .withColumn("__ord", struct(rightOrder.map(col): _*))
      .select(keys.map(col) ++ Seq(col("__ats"), col("__side"),
        col("__pay"), col("__ord")): _*)
    // align: left keeps its own columns; right contributes only the carriers
    val lNorm = l.select((keys.map(col) ++ Seq(col("__ats"), col("__side"),
      col("__pay"), col("__ord")) ++
      leftCols.filterNot(keys.contains).map(col)): _*)
    val rNorm = leftCols.filterNot(keys.contains).foldLeft(r)(
      (d, c) => d.withColumn(c, lit(null).cast(l.schema(c).dataType)))
      .select(lNorm.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc, col("__side").asc,
        col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__pay").isNull)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__asof.$p").as(p)): _*)
  }

  // --------------------------------------------------------------------------
  // Bucketed range join (point-in-interval without a nested-loop plan)
  // --------------------------------------------------------------------------

  /** Range join: left rows whose `leftPoint` falls inside a right row's
    * `[rightLo, rightHi]` (inclusive). Spark plans a bare inequality join as
    * a broadcast-nested-loop — O(|L|·|R|) and undistributable when neither
    * side broadcasts. This operator BUCKETS the range instead: each right
    * interval explodes to the buckets it covers, each left point maps to one
    * bucket, and the join becomes an equi-join on (keys, bucket) + exact
    * filter — shuffle-partitionable like any hash join. Pick `bucketWidth`
    * near the typical interval length: cost scales with
    * |L| + Σ(interval_len/width) right replicas.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftPoint: String, rightLo: String, rightHi: String,
                bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket",
      floor(col(leftPoint) / bucketWidth).cast("long"))
    val rb = right.withColumn("__bucket", explode(sequence(
      floor(col(rightLo) / bucketWidth).cast("long"),
      floor(col(rightHi) / bucketWidth).cast("long"))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(leftPoint) >= col(rightLo) && col(leftPoint) <= col(rightHi))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (both sides carry [lo, hi] intervals): pairs
    * where `a` and `b` overlap (a.lo ≤ b.hi AND b.lo ≤ a.hi), optionally
    * within equi `keys`. Complements [[rangeJoin]] (point-in-interval).
    *
    * Scale: both sides explode to the fixed-width buckets they cover, the
    * join runs as an equi-join on (keys, bucket) + exact overlap filter,
    * and each overlapping pair is emitted EXACTLY ONCE without a distinct
    * pass: a pair is attributed to the first bucket both intervals cover —
    * `max(floor(a.lo/w), floor(b.lo/w))` — so the replicated copies in
    * later shared buckets drop out by construction. Pick `bucketWidth`
    * near the typical interval length (cost = Σ interval_len/width
    * replicas per side, same rule as [[rangeJoin]]). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftLo: String, leftHi: String,
                          rightLo: String, rightHi: String,
                          bucketWidth: Long,
                          keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(lo: String, hi: String) = explode(sequence(
      floor(col(lo) / bucketWidth).cast("long"),
      floor(col(hi) / bucketWidth).cast("long")))
    val lb = left.withColumn("__bucket", buckets(leftLo, leftHi))
    val rb = right.withColumn("__bucket", buckets(rightLo, rightHi))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col("__bucket") === greatest(
        floor(col(leftLo) / bucketWidth).cast("long"),
        floor(col(rightLo) / bucketWidth).cast("long")))
      .drop("__bucket")
  }

  // --------------------------------------------------------------------------
  // Incremental aggregate maintenance (materialized-view fold)
  // --------------------------------------------------------------------------

  /** Additive aggregate spec for [[foldAggregate]]: `out` state column =
    * running exact-decimal SUM of `in` (scale `scale`). */
  final case class SumSpec(out: String, in: String, scale: Int)

  /** Fold one increment into a per-group aggregate STATE — incremental
    * materialized-view maintenance. The state holds `n_rows` plus one
    * exact-decimal running sum per [[SumSpec]]; folding is associative and
    * commutative, so state after ANY chunking of the input equals the
    * direct aggregate over all rows (RelationalSpec property-tests random
    * chunkings; `q_incremental_rollup` oracle-checks a 3-chunk fold against
    * plain SQL).
    *
    * Scale: this is the CDC-pipeline answer to "keep a 100 TB rollup
    * fresh": each sync folds ONLY its increment (one scan + a
    * group-cardinality-sized merge) instead of rescanning history. Sums are
    * pinned to DECIMAL(38, scale) — the fixpoint of Spark's sum-of-decimal
    * widening — so the state schema is stable across arbitrarily many
    * folds and the arithmetic stays exact (order-independent) throughout.
    * Derived ratios (avg = sum/n) belong at read time, never in state.
    *
    * MAGNITUDE CONTRACT: increment values accumulate at DECIMAL(38, scale)
    * END TO END — the same fixpoint type as the state — so pre-aggregated
    * inputs (a rollup folding another rollup's sums, magnitudes near 10^17)
    * fold without any caller-side re-scaling. The overflow contract sits at
    * the one boundary that can actually overflow: under the engine's ANSI
    * default (Spark 4) a SUM exceeding 38−scale integer digits FAILS the
    * fold loudly (NUMERIC_VALUE_OUT_OF_RANGE — RelationalSpec pins this; a
    * session with `spark.sql.ansi.enabled=false` would instead NULL the
    * overflowed group's sum while `n_rows` still counts its rows).
    */
  def foldAggregate(prev: Option[DataFrame], increment: DataFrame,
                    keys: Seq[String], sums: Seq[SumSpec]): DataFrame = {
    def pin(c: Column, s: SumSpec): Column =
      c.cast(DecimalType(38, s.scale)).as(s.out)
    val incState = increment.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.map(s => pin(sum(col(s.in).cast(DecimalType(38, s.scale))), s)): _*)
    prev match {
      case None => incState
      case Some(p) =>
        p.unionByName(incState).groupBy(keys.map(col): _*)
          .agg(sum(col("n_rows")).as("n_rows"),
            sums.map(s => pin(sum(col(s.out)), s)): _*)
    }
  }

  /** Read-time projection of a [[foldAggregate]] state: emit the sums as
    * doubles (one canonical conversion point, matching the oracle rule of
    * exact-decimal aggregation with a final double cast). */
  def readAggState(state: DataFrame, sums: Seq[SumSpec]): DataFrame =
    state.select(state.columns.map {
      case c if sums.exists(_.out == c) => col(c).cast("double").as(c)
      case c => col(c)
    }.toIndexedSeq: _*)

  /** Incremental DISTINCT-COUNT maintenance via mergeable HLL sketches
    * (Apache DataSketches `HllSketch`, built into Spark ≥3.5): each fold
    * unions the increment's per-group sketch into the state sketch. The
    * non-additive aggregate COUNT(DISTINCT) becomes incrementally
    * maintainable because sketch union is associative and commutative —
    * the [[foldAggregate]] pattern extended beyond additive sums. State is
    * a few KB of sketch bytes per group regardless of history size: the
    * 100 TB answer to "how many distinct users ever?" without a rescan or
    * an exact-set state table. Estimates are NOT bit-identical across fold
    * orders (sketches transition list→set→HLL modes at merge-order-
    * dependent points) — the guarantee is the HLL error bound for ANY
    * chunking, which RelationalSpec asserts. */
  def foldDistinctSketch(prev: Option[DataFrame], increment: DataFrame,
                         keys: Seq[String], valueCol: String,
                         out: String = "sketch"): DataFrame = {
    val incState = increment.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as(out))
    prev match {
      case None => incState
      case Some(p) =>
        p.unionByName(incState).groupBy(keys.map(col): _*)
          .agg(hll_union_agg(col(out)).as(out))
    }
  }

  /** Read a [[foldDistinctSketch]] state: (keys, approx_distinct). */
  def readDistinctSketch(state: DataFrame, out: String = "sketch"): DataFrame =
    state.withColumn("approx_distinct", hll_sketch_estimate(col(out)))
      .drop(out)

  /** Fold an increment into per-group mergeable QUANTILE state (DataSketches
    * KLL, Karnin–Lang–Liberty 2016) — percentiles maintained without ever
    * rescanning history, completing the incremental-maintenance family next
    * to [[foldAggregate]] (sums/counts) and [[foldDistinctSketch]]
    * (distincts). Spark ships no KLL SQL surface, so this builds one:
    *
    * 1. a narrow `mapPartitions` pass reduces each partition to one KLL
    *    sketch per group it holds (the classic map-side partial aggregate —
    *    raw values never cross the exchange, only ~KB sketches per
    *    (partition × group));
    * 2. a binary [[graft.functions.KllMergeAgg]] Aggregator merges
    *    partition sketches per group. Deserialize-merge-serialize per input
    *    ROW is acceptable exactly because its rows are already
    *    partition-level sketches, never data rows.
    *
    * KLL compaction is randomized, so estimates are reproducible only
    * within the sketch's rank-error bound (ε ≈ 2.4%/√(k/200) at 99%
    * confidence) — the state is rows-only for cross-engine checks, like the
    * HLL fold; RelationalSpec bounds the error and proves chunking
    * invariance at the rank level. */
  def foldQuantileSketch(prev: Option[DataFrame], increment: DataFrame,
                         keys: Seq[String], valueCol: String,
                         out: String = "qsketch", k: Int = 200): DataFrame = {
    val merge = udaf(new graft.functions.KllMergeAgg(k))
    val partial = graft.functions.KllMergeAgg
      .partitionSketches(increment, keys, valueCol, out, k)
    val incState = partial.groupBy(keys.map(col): _*)
      .agg(merge(col(out)).as(out))
    prev match {
      case None => incState
      case Some(p) =>
        p.unionByName(incState).groupBy(keys.map(col): _*)
          .agg(merge(col(out)).as(out))
    }
  }

  /** Read a [[foldQuantileSketch]] state: (keys, q_<pct>…) — one column per
    * requested quantile, null for empty-sketch groups. The deserializing
    * reader is a plain function over state rows (group cardinality), never
    * over data rows. */
  def readQuantileSketch(state: DataFrame, quantiles: Seq[Double],
                         out: String = "qsketch"): DataFrame = {
    val read = udf((bytes: Array[Byte], q: Double) =>
      graft.functions.KllMergeAgg.quantile(bytes, q))
    quantiles.foldLeft(state) { (df, q) =>
      df.withColumn(s"q_${(q * 100).round}", read(col(out), lit(q)))
    }.drop(out)
  }

  // --------------------------------------------------------------------------
  // SCD Type-2 version history
  // --------------------------------------------------------------------------

  /** Apply one increment to a slowly-changing-dimension TYPE-2 history:
    * instead of overwriting changed rows (the merge path), every change
    * closes the key's open version (`valid_to` = the increment's effective
    * time) and opens a new one — the warehouse answer to "what did this row
    * look like when that training run snapshotted?".
    *
    * `history` columns: keys ++ attrCols ++ (valid_from, valid_to), open
    * versions have `valid_to` NULL. The increment is first reduced to its
    * LATEST state per key (by `tsCol`, then `orderCols` — intra-increment
    * transitions are invisible by design, like any snapshot-based fold).
    * Unchanged keys keep their open row (null-safe attr comparison); new
    * keys open their first version.
    *
    * Scale: the fold joins the OPEN slice (key cardinality) with the
    * increment's per-key latest (increment-key cardinality) — closed
    * history is carried through untouched, never joined, so cost is
    * independent of how deep the version history grows. */
  def scd2Apply(history: Option[DataFrame], increment: DataFrame,
                keys: Seq[String], tsCol: String, attrCols: Seq[String],
                orderCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: orderCols).map(col(_).desc): _*)
    val latest = increment
      .filter(col(tsCol).isNotNull)   // a null effective time cannot version
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select((keys ++ attrCols).map(col) :+ col(tsCol): _*)
    val opened = latest.select(
      (keys ++ attrCols).map(col) :+ col(tsCol).as("valid_from") :+
        lit(null).cast(latest.schema(tsCol).dataType).as("valid_to"): _*)
    history match {
      case None => opened
      case Some(h) =>
        val closed = h.filter(col("valid_to").isNotNull)
        val open = h.filter(col("valid_to").isNull)
          .withColumn("__o", lit(true))
        val inc = latest.withColumn("__i", lit(true))
          .withColumnRenamed(tsCol, "__its")
        val oAttr = attrCols.map(a => col(s"o.$a"))
        val iAttr = attrCols.map(a => col(s"i.$a"))
        val j = open.as("o").join(inc.as("i"), keys, "full_outer")
        // a change only versions when the increment is STRICTLY NEWER than
        // the open version: a late-arriving increment whose effective time
        // is at-or-before valid_from is stale information — closing the
        // open row with it would write an inverted interval
        // (valid_to < valid_from) and silently rewrite history backwards
        val changed = oAttr.zip(iAttr)
          .map { case (a, b) => !(a <=> b) }.reduce(_ || _) &&
          col("i.__its") > col("o.valid_from")
        val hCols = (valid_from: Column, valid_to: Column, attrs: Seq[Column]) =>
          keys.map(col) ++ attrs.zip(attrCols).map { case (c, n) => c.as(n) } ++
            Seq(valid_from.as("valid_from"), valid_to.as("valid_to"))
        val keptOpen = j.filter(col("i.__i").isNull)
          .select(hCols(col("o.valid_from"), col("o.valid_to"), oAttr): _*)
        val newKeys = j.filter(col("o.__o").isNull)
          .select(hCols(col("i.__its"), lit(null), iAttr): _*)
        val unchanged = j.filter(col("o.__o").isNotNull &&
          col("i.__i").isNotNull && !changed)
          .select(hCols(col("o.valid_from"), col("o.valid_to"), oAttr): _*)
        val nowClosed = j.filter(col("o.__o").isNotNull &&
          col("i.__i").isNotNull && changed)
          .select(hCols(col("o.valid_from"), col("i.__its"), oAttr): _*)
        val reopened = j.filter(col("o.__o").isNotNull &&
          col("i.__i").isNotNull && changed)
          .select(hCols(col("i.__its"), lit(null), iAttr): _*)
        Seq(keptOpen, newKeys, unchanged, nowClosed, reopened)
          .foldLeft(closed)(_ unionByName _)
    }
  }

  /** Point-in-time view of a [[scd2Apply]] history: the version of each key
    * valid at `asOf` (valid_from ≤ asOf < valid_to, open = ∞). */
  def scd2AsOf(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))

  /** Blocked fuzzy-duplicate pairs (classic entity-resolution blocking):
    * within each `blockExpr` bucket, the (id_a < id_b) pairs whose
    * `nameCol` edit distance is ≤ `maxDistance`. The block equi-join keeps
    * comparisons at O(Σ block²) instead of O(n²) — the same discipline as
    * the embedding near-dup paths — and the codegen'd levenshtein runs
    * only on co-blocked pairs. Pick the block key so true matches agree on
    * it (sorted-neighborhood key, phonetic code, a stable token). */
  def fuzzyMatchPairs(df: DataFrame, idCol: String, nameCol: String,
                      blockExpr: Column, maxDistance: Int): DataFrame = {
    val side = df.select(col(idCol), col(nameCol), blockExpr.as("__blk"))
    val a = side.select(col(idCol).as("id_a"),
      col(nameCol).as("__na"), col("__blk"))
    val b = side.select(col(idCol).as("id_b"),
      col(nameCol).as("__nb"), col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__na"), col("__nb")).cast("long"))
      .filter(col("dist") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Ordered funnel: per entity, the earliest stage-1 event, then the
    * earliest stage-2 event STRICTLY AFTER it, and so on — the canonical
    * product-analytics conversion funnel (out-of-order events don't
    * count). Returns one row per stage: (stage_idx, stage, n_entities).
    *
    * Scale: ONE scan of the fact table and ONE exchange, total. The scan
    * keeps only funnel-stage events (the IN filter pushes down), a
    * `pivot(stage).agg(collect_set(ts))` groups each entity's distinct
    * per-stage event times in a single map-side-combined aggregate, and the
    * strict-order frontier then folds per entity with array primitives
    * (`array_min(filter(ts_set, _ > prev))`). The earlier k-frontier chain
    * cost k filtered scans and k−1 shuffles — and, because frontier j's
    * plan embedded frontiers 1..j−1, re-derived stage subplans O(k²) times
    * unless exchange reuse kicked in.
    *
    * NOTE a plain `pivot.agg(min(ts))` would be WRONG here: an entity with
    * stage-2 events at t=1 and t=5 and stage 1 at t=2 converts via t=5,
    * but min(stage2)=1 fails the strict `> t1` test. The fold needs each
    * stage's distinct-time SET, not its minimum. Reducer memory is bounded
    * by one entity's distinct funnel-event times (the sessionization
    * bound); duplicates combine map-side. */
  def funnelCounts(events: DataFrame, entityCol: String, tsCol: String,
                   stageCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val tsCols = stages.indices.map(i => s"__s$i")
    // pivot emits the entity column first, then one column per value in the
    // declared order — toDF renames positionally to collision-free names
    val pivoted = events
      .filter(col(stageCol).isin(stages.map(_.asInstanceOf[Any]): _*))
      .select(col(entityCol).as("__e"), col(tsCol).as("__ts"),
        col(stageCol).as("__stage"))
      .groupBy(col("__e"))
      .pivot("__stage", stages)
      .agg(collect_set(col("__ts")))
      .toDF("__e" +: tsCols: _*)
    val withChain = tsCols.zipWithIndex.foldLeft(pivoted) {
      case (df, (c, 0)) => df.withColumn("__t0", array_min(col(c)))
      case (df, (c, i)) =>
        val prev = col(s"__t${i - 1}")
        df.withColumn(s"__t$i", array_min(filter(col(c), x => x > prev)))
    }
    // entities missing a stage pivot to NULL; the null cascades through
    // filter/array_min, so "reached stage i" is exactly __ti IS NOT NULL
    val countExprs = stages.indices.map(i =>
      coalesce(sum(when(col(s"__t$i").isNotNull, 1L)), lit(0L)).as(s"__n$i"))
    val counts = withChain.agg(countExprs.head, countExprs.tail: _*)
    counts
      .select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
        struct(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"),
          col(s"__n$i").as("n_entities"))
      }: _*)).as("__r"))
      .select(col("__r.stage_idx"), col("__r.stage"), col("__r.n_entities"))
  }

  /** Cohort retention: entities cohorted by the time bucket of their FIRST
    * event; for each (cohort, bucket offset ≥ 0) the count of cohort
    * members active in that bucket. Buckets are integer divisions of the
    * (numeric) time column — engine-exact, no calendar dependence.
    *
    * Scale: first-event and activity relations are both entity-cardinality
    * after their map-side-combined aggregates; the join and final count
    * shuffle entity-scale rows only. */
  def cohortRetention(events: DataFrame, entityCol: String, tsCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucket = (c: Column) => floor(c / bucketWidth).cast("long")
    val first = events.groupBy(col(entityCol))
      .agg(bucket(min(col(tsCol))).as("cohort_bucket"))
    val active = events
      .select(col(entityCol), bucket(col(tsCol)).as("__b")).distinct()
    first.join(active, Seq(entityCol))
      .groupBy(col("cohort_bucket"),
        (col("__b") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Sorted-neighborhood fuzzy pairs — the SCALE path for edit-distance
    * matching (Hernández & Stolfo 1995): sort by the name, compare each row
    * only with its next `windowSize` neighbors in sort order. O(n·w)
    * comparisons total where blocking can degenerate to O(block²) on a
    * coarse key; near-identical strings sort adjacently, so small windows
    * catch them. Pairs more than `windowSize` apart in sort order are
    * missed by definition — the standard trade, mirrored exactly by the
    * oracle (the pair set is a pure function of the global sort order,
    * independent of partitioning).
    *
    * Distributed shape: a RANGE-partitioned sort (never a single-task
    * window — a global `Window.orderBy` would funnel the corpus through one
    * task), `zipWithIndex` for global positions (one narrow pass), then the
    * bucketed [[rangeJoin]] turns "within w positions" into an equi-join.
    * Only (pos, id, name) ride any exchange. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, nameCol: String,
                          windowSize: Int, maxDistance: Int): DataFrame = {
    require(windowSize > 0 && maxDistance >= 0, "bad window/distance")
    val spark = df.sparkSession
    val slim = df.select(col(idCol), col(nameCol)).sort(col(nameCol), col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      slim.schema.fields :+ org.apache.spark.sql.types.StructField(
        "pos", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = spark.createDataFrame(
      slim.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
    val a = indexed.select(col(idCol).as("id_a"), col(nameCol).as("__na"),
      (col("pos") + 1).as("__lo"), (col("pos") + windowSize).as("__hi"))
    val b = indexed.select(col(idCol).as("id_b"), col(nameCol).as("__nb"),
      col("pos").as("__p"))
    rangeJoin(b, a, leftPoint = "__p", rightLo = "__lo", rightHi = "__hi",
      bucketWidth = windowSize)
      .withColumn("dist", levenshtein(col("__na"), col("__nb")).cast("long"))
      .filter(col("dist") <= maxDistance)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
  }

  /** Row-level DIFF between two snapshots of the same table — the audit
    * report behind every "what did this sync actually change" question:
    * per key, `change_type` ∈ added | removed | changed, with the names
    * of the differing columns (comma-joined, schema order) for changed
    * rows. Unchanged rows are omitted — at 100 TB the diff is the small
    * output, never the carrier of both snapshots. Null-safe comparison
    * (`<=>`), so null→value and value→null both count as changes.
    *
    * Scale: ONE full-outer shuffle join on the key columns; both sides
    * prune to keys + compared columns. Compared columns default to the
    * non-key intersection of both schemas. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs key columns")
    val explicit = compareCols.nonEmpty
    val cols =
      if (explicit) compareCols.filterNot(keys.contains)
      else oldDf.columns.filter(newDf.columns.contains)
        .filterNot(keys.contains).toSeq
    // an empty DEFAULT column set (the two schemas share only the keys —
    // e.g. after a rename map or schema evolution) would compare NOTHING
    // and report every common-key row "unchanged": a vacuous parity the
    // audit exists to prevent. Refuse loudly. An EXPLICIT compareCols that
    // reduces to the keys is the caller saying "presence-only" — honored:
    // the diff then reports added/removed rows and no changed ones.
    require(explicit || cols.nonEmpty,
      "snapshotDiff: the snapshots share no non-key columns to compare — " +
        "pass compareCols (e.g. the keys) if a presence-only diff is intended")
    val o = oldDf.select((keys ++ cols).map(col) :+ lit(1).as("__in_o"): _*)
      .withColumnsRenamed(cols.map(c => c -> s"__o_$c").toMap)
    val n = newDf.select((keys ++ cols).map(col) :+ lit(1).as("__in_n"): _*)
      .withColumnsRenamed(cols.map(c => c -> s"__n_$c").toMap)
    val changed =
      if (cols.isEmpty) lit("")
      else array_join(filter(
        array(cols.map(c => when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))
          .otherwise(lit(null).cast("string"))): _*),
        x => x.isNotNull), ",")
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_o").isNull, "added")
          .when(col("__in_n").isNull, "removed")
          .otherwise("changed"))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changed).otherwise(lit("")))
      .filter(col("change_type") =!= "changed" || col("changed_cols") =!= "")
      .select(keys.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }
}
