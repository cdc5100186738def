package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, mergeable sketch folds — the exactly-replayable siblings
  * of the randomized DataSketches folds in [[Relational]]
  * (`foldDistinctSketch` = HLL, `foldQuantileSketch` = KLL).
  *
  * Why a second family: HLL and KLL trade reproducibility for tighter
  * error at a given state size — their merge results depend on fold order
  * (HLL mode transitions) or on RNG (KLL compaction), so no cross-engine
  * oracle can exist by construction. The sketches here make the opposite
  * trade: every operation is a pure function of md5, so
  *
  *   1. state after ANY chunking of the input is BIT-IDENTICAL to the
  *      state from one direct pass (merge = set-union / integer-sum /
  *      bottom-k, all associative+commutative+idempotent where needed), and
  *   2. an independent engine (the DuckDB oracle) replays estimate values
  *      EXACTLY — these folds have full value oracles, not rows-only rows.
  *
  * All three keep the [[Relational.foldAggregate]] contract: each sync
  * folds ONLY its increment, state is bounded per group (k hashes / d×w
  * counters / k sample rows) regardless of history size, and exchanges
  * carry keys + 8-byte hashes, never payloads — the 100 TB incremental-
  * maintenance shape.
  *
  * Hash convention (shared with the SimHash oracle, LlmQueries
  * `q_dedup_simhash_neardup`): the first 15 hex chars of `md5(string)`
  * read base-16 — a uniform 60-bit non-negative integer that both Spark
  * (`conv`) and DuckDB (`CAST(concat('0x', …) AS BIGINT)`) produce
  * bit-identically.
  */
object Sketches {

  /** 2^60 — the hash-space size; exact in Double (one significant bit). */
  val HashSpace: Double = math.pow(2.0, 60)

  /** Uniform 60-bit hash of a column's string form (codegen'd builtins
    * only — md5/substring/conv; no UDF fence). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // --------------------------------------------------------------------------
  // KMV (bottom-k minimum values) distinct-count — Bar-Yossef et al. 2002
  // --------------------------------------------------------------------------

  /** Fold an increment into per-group KMV distinct-count state: the k
    * SMALLEST distinct 60-bit hashes of `valueCol` per group, as a sorted
    * array. Merge = union ∪ re-prune, so the state is a pure function of
    * the SET of values seen — chunk the input any way and the state is
    * bit-identical (SketchesSpec property-tests random chunkings; the
    * DuckDB oracle recomputes it from the full table in one pass).
    *
    * Scale: the increment reduces to distinct (keys, hash8B) before the
    * only exchange; the window prune runs under WindowGroupLimit (rank ≤ k
    * pushes into the sort) so no group materializes more than k rows past
    * the exchange; the merge re-expands ONLY the ≤k-element state arrays
    * (group-cardinality × k rows), never history.
    */
  def foldKmvDistinct(prev: Option[DataFrame], increment: DataFrame,
                      keys: Seq[String], valueCol: String,
                      k: Int = 256, out: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    // null values are ignored, matching COUNT(DISTINCT) semantics (and
    // avoiding engine-specific null-ordering in the bottom-k prune)
    val incH = increment
      .select(keys.map(col) :+ hash60(col(valueCol)).as("__h"): _*)
      .filter(col("__h").isNotNull)
      .distinct()
    val pool = prev match {
      case None => incH
      case Some(p) =>
        p.select(keys.map(col) :+ explode(col(out)).as("__h"): _*)
          .unionByName(incH).distinct()
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"))
    pool.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("__h"))).as(out))
  }

  /** Read a [[foldKmvDistinct]] state: (keys…, n_kept, kth_hash,
    * est_distinct). Below saturation the estimate is EXACT (= n_kept, the
    * count of distinct hashes retained); at saturation it is the classic
    * unbiased KMV estimator (k−1) / (h_k / 2^60), rounded to a long.
    * Relative error ≈ 1/√(k−2) (~6% at k=256). All arithmetic is one
    * double multiply + divide on exactly-representable inputs, so the
    * oracle reproduces the rounded value exactly. */
  def readKmvDistinct(state: DataFrame, k: Int = 256,
                      out: String = "kmv"): DataFrame = {
    val n = size(col(out)).cast("long")
    state
      .withColumn("n_kept", n)
      .withColumn("kth_hash",
        when(n >= k, element_at(col(out), k)).otherwise(lit(null).cast("long")))
      .withColumn("est_distinct",
        when(n < k, n).otherwise(
          round(lit((k - 1).toDouble * HashSpace) /
            col("kth_hash").cast("double")).cast("long")))
      .drop(out)
  }

  // --------------------------------------------------------------------------
  // Count-min sketch — Cormode & Muthukrishnan 2005
  // --------------------------------------------------------------------------

  /** Fold an increment into per-group count-min state: `depth` independent
    * hash rows × `width` counters, stored LONG-format as
    * (keys…, __j, __idx, cnt) rows — only counters that are actually
    * nonzero exist, and the merge is a plain integer sum, so folds commute
    * and the state equals a direct count of the full history exactly.
    * Row j's hash of item v is hash60("j_v") mod width.
    *
    * Scale: the increment aggregates to ≤ depth × min(distinct items,
    * width) rows per group BEFORE its exchange (map-side partial), the
    * merge touches counter rows only, and the state is bounded by
    * depth × width longs per group forever. This is the incremental
    * heavy-hitters answer: frequencies over all history at fixed state,
    * no rescan, overestimate-only error ≤ 2·N/width with prob 1−2^−depth.
    */
  def foldCountMin(prev: Option[DataFrame], increment: DataFrame,
                   keys: Seq[String], itemCol: String,
                   depth: Int = 4, width: Int = 1024,
                   cnt: String = "cnt"): DataFrame = {
    val incState = increment
      .select(keys.map(col) :+ col(itemCol).cast("string").as("__it"): _*)
      .filter(col("__it").isNotNull) // null items are ignored, like COUNT(col)
      .withColumn("__j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("__idx", cmsIdx(col("__j"), col("__it"), width))
      .drop("__it")
      .groupBy(keys.map(col) :+ col("__j") :+ col("__idx"): _*)
      .agg(count(lit(1)).as(cnt))
    prev match {
      case None => incState
      case Some(p) =>
        p.unionByName(incState)
          .groupBy(keys.map(col) :+ col("__j") :+ col("__idx"): _*)
          .agg(sum(col(cnt)).as(cnt))
    }
  }

  /** Counter index of item `it` (string form) in hash row `j`. */
  private def cmsIdx(j: Column, it: Column, width: Int): Column =
    pmod(hash60(concat(j.cast("string"), lit("_"), it)), lit(width.toLong))

  /** Point-estimate each candidate item's frequency from a [[foldCountMin]]
    * state: est = min over the depth rows of the item's counter (absent
    * counter = 0). `items` carries (keys…, itemCol); the join ships only
    * (keys, j, idx) probes against counter rows — candidate-scale, never
    * corpus-scale. Estimates NEVER undercount; collisions only inflate. */
  def estimateCountMin(state: DataFrame, items: DataFrame,
                       keys: Seq[String], itemCol: String,
                       depth: Int = 4, width: Int = 1024,
                       cnt: String = "cnt"): DataFrame = {
    val probes = items
      .select(keys.map(col) :+ col(itemCol): _*)
      .withColumn("__j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("__idx", cmsIdx(col("__j"), col(itemCol).cast("string"), width))
    probes.join(state, keys :+ "__j" :+ "__idx", "left")
      .withColumn(cnt, coalesce(col(cnt), lit(0L)))
      .groupBy(keys.map(col) :+ col(itemCol): _*)
      .agg(min(col(cnt)).as("est_count"))
  }

  /** Heavy hitters: the top-n candidates per group by count-min estimate,
    * deterministically tie-broken by item value. Rank is dense within a
    * group; the caller supplies the candidate set (typically the distinct
    * items of the current increment — the CMS answers "how often EVER",
    * the increment answers "seen lately", which is the standard pairing
    * that avoids tracking an unbounded candidate list). */
  def heavyHitters(state: DataFrame, candidates: DataFrame,
                   keys: Seq[String], itemCol: String, topN: Int,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    val est = estimateCountMin(state, candidates, keys, itemCol, depth, width)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("est_count").desc, col(itemCol))
    est.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
  }

  // --------------------------------------------------------------------------
  // Bottom-k uniform row sample → quantiles
  // --------------------------------------------------------------------------

  /** Fold an increment into a per-group UNIFORM ROW SAMPLE: the k rows
    * whose 60-bit hash of `idCol` (a row-unique key) is smallest, stored
    * as a sorted array of (h, v) structs. Bottom-k-by-hash of a union is
    * the bottom-k of the merged bottom-k's, so the sample — and every
    * statistic read from it — is bit-identical under any chunking, and
    * uniform over ALL history (each row keeps hash-rank forever; no
    * recency bias, unlike a naive reservoir under merges).
    *
    * Scale: the only exchange carries (keys, 8-byte hash, value); the
    * window prune runs under WindowGroupLimit; merges re-expand ≤k-element
    * arrays only.
    */
  def foldSampleState(prev: Option[DataFrame], increment: DataFrame,
                      keys: Seq[String], idCol: String, valueCol: String,
                      k: Int = 256, out: String = "samp"): DataFrame = {
    require(k >= 1, s"sample fold needs k >= 1, got $k")
    val incRows = increment.select(
      keys.map(col) :+ hash60(col(idCol)).as("__h")
        :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__h").isNotNull) // null row ids carry no sampling rank
    val pool = prev match {
      case None => incRows
      case Some(p) =>
        p.select(keys.map(col) :+ explode(col(out)).as("__e"): _*)
          .select(keys.map(col) :+ col("__e.h").as("__h")
            :+ col("__e.v").as("__v"): _*)
          .unionByName(incRows)
    }
    // deterministic total order even under (negligible) 60-bit hash ties
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__h"), col("__v"))
    pool.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__h").as("h"),
        col("__v").as("v")))).as(out))
  }

  /** Read quantiles from a [[foldSampleState]] state: for each requested
    * q, the sample value at 1-based index ⌊(n−1)·q⌋+1 of the ASCENDING
    * value sort — an exact element pick (no interpolation), so the oracle
    * reproduces it bit-for-bit. Rank error vs the true quantile is
    * ~1/√k (k=256 → ±6 percentile points at 95%); columns are named
    * q_<pct> like [[Relational.readQuantileSketch]]. */
  def readSampleQuantiles(state: DataFrame, quantiles: Seq[Double],
                          out: String = "samp"): DataFrame = {
    val vs = array_sort(transform(col(out), e => e.getField("v")))
    val withQ = quantiles.foldLeft(state) { (df, q) =>
      df.withColumn(s"q_${(q * 100).round}",
        element_at(vs,
          (floor((size(col(out)) - 1) * lit(q)) + 1).cast("int")))
    }
    withQ.withColumn("n_sample", size(col(out)).cast("long")).drop(out)
  }
}
