package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.exprs._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed scale-first:
  *
  *  - exact dedup = hash-groupBy (one shuffle on a 16-byte key, not the text);
  *  - MinHash/LSH near-dup = shingle → k minhashes → b bands → bucket join:
  *    candidate pairs come from same-bucket co-grouping, NEVER an N² cross
  *    join (Broder 1997; Leskovec/Rajaraman/Ullman ch.3);
  *  - SimHash near-dup = 64-bit signature + banded Hamming lookup
  *    (Charikar 2002, used by Google for web dedup);
  *  - verification (true Jaccard) runs only on the candidate set.
  */
object DedupFunctions {

  /** Wall-clock seconds of the most recent index-build-class work timed by
    * a caller (`q_dedup_cluster_incremental` stamps its base-corpus batch
    * clustering + band-index materialization here) — bench attribution so
    * the query's cost separates one-time index construction (amortized in
    * production: the band index and labels PERSIST across syncs) from the
    * per-increment probe+fold the operator actually charges per run. */
  @volatile var lastIndexBuildSec: Double = -1.0

  // --------------------------------------------------------------------------
  // Exact dedup
  // --------------------------------------------------------------------------

  /** Exact-duplicate groups by normalized-content fingerprint: one row per
    * distinct content, keeping the smallest id (deterministic canonical
    * representative). Shuffles only (fingerprint, id) — at 100 TB the text
    * column stays columnar-pruned out of the exchange. */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Dataset with exact duplicates removed (keeps min-id per content).
    * SINGLE-PASS: one scan, one shuffle (rows hashed by fingerprint, then
    * row_number keeps the min-id row per content). The previous
    * groups-then-semi-join form cost two full scans plus a second full-row
    * shuffle on the id join — strictly worse at any scale, since dedup must
    * move each surviving row through one exchange anyway. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    docs
      .withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** INCREMENTAL exact dedup — the shape a 100 TB pipeline actually runs:
    * dedup the new increment against the existing corpus WITHOUT rescanning
    * the corpus text. `existingFingerprints` is a maintained side table of
    * distinct content fingerprints (16 bytes per distinct doc — kept up to
    * date by appending each accepted increment's fingerprints); the increment
    * is deduped internally (min-id representative) and then anti-joined
    * against it. Cost per increment: one shuffle of the increment plus a
    * fingerprint-only join — the corpus payload is never touched. */
  def dropDuplicatesIncremental(incoming: DataFrame,
                                existingFingerprints: DataFrame,
                                idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    incoming
      .withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(existingFingerprints.select(col("fingerprint").as("__fp")).distinct(),
        Seq("__fp"), "left_anti")
      .drop("__fp", "__rn")
  }

  /** Convenience form deriving the fingerprint set from the existing corpus
    * (first run / no side table yet). Only (fingerprint) is shuffled from the
    * existing side — text stays columnar-pruned out. */
  def dropDuplicatesAgainst(existing: DataFrame, incoming: DataFrame,
                            idCol: String, textCol: String): DataFrame =
    dropDuplicatesIncremental(incoming,
      existing.select(
        TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint")),
      idCol, textCol)

  /** Maintain the fingerprint side table: append an ACCEPTED increment's
    * distinct content fingerprints so the next increment dedups against it
    * without ever touching the corpus. Append-idempotent — readers
    * distinct() — so a crashed append retried is harmless. */
  def appendFingerprints(accepted: DataFrame, textCol: String,
                         sideTablePath: String): Unit =
    accepted.select(TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .distinct()
      .write.mode("append").parquet(sideTablePath)

  /** Read the fingerprint side table (empty if not yet created). */
  def readFingerprints(spark: org.apache.spark.sql.SparkSession,
                       sideTablePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(sideTablePath)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.parquet(sideTablePath)
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("fingerprint", StringType))))
    }
  }

  // --------------------------------------------------------------------------
  // Shingles + MinHash
  // --------------------------------------------------------------------------

  /** Word n-gram shingle set (distinct) from an ALREADY-MATERIALIZED token
    * array column. Built from higher-order array functions — no UDF, no
    * explode of the corpus.
    *
    * `toks` must be a bound column (not an inline expression): it is
    * referenced inside the per-gram lambda, and common-subexpression
    * elimination does not reach into higher-order-function lambdas — an
    * inline tokenizer would re-run its regex chain once PER GRAM (measured
    * ~18s for 5k tiny docs at sf0.1; ~1s staged). */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    // slide a window of n over the token array
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array(concat_ws(" ", toks))))
  }

  /** Word n-gram shingle set of a text column. Convenience form — for hot
    * paths, stage `TextFunctions.tokens` in its own select and call
    * [[shinglesFromTokens]] (see scaladoc there). Tokenizing already
    * lowercases and splits on non-alphanumerics, so a separate
    * normalization pass would be redundant. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(TextFunctions.tokens(text), n)

  /** Distinct n-gram shingle HASHES straight from raw text — the candidate-
    * generation fast path ([[graft.functions.ShingleHashes]]): one byte scan,
    * no token/shingle strings. Use the string form [[shingles]] wherever the
    * actual shingle SETS are needed (exact Jaccard verification). */
  def shingleHashes(text: Column, n: Int): Column = shingle_hashes(text, n)

  /** k MinHash signature values from PRE-HASHED shingles: each shingle string
    * is hashed once (`xxhash64`) upstream; the j-th permutation re-mixes the
    * 8-byte value with seed j. One codegen'd pass over the hash array
    * ([[graft.functions.MinHashSig]]) computes all k minima — the previous k
    * separate `array_min(transform(...))` expressions traversed the array k
    * times with interpreted lambdas. Returns array<long> of length k. */
  def minhashSignatureFromHashes(hashedShingles: Column, k: Int): Column =
    minhash_sig(hashedShingles, k)

  /** k MinHash signature values of a shingle-set column (strings). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    minhashSignatureFromHashes(transform(shingleCol, s => xxhash64(s)), k)

  /** LSH banding: split a k-length signature into b bands of r = k/b values;
    * band bucket key = hash(band values). Docs sharing ANY band bucket are
    * candidate pairs. Probability a pair with Jaccard s collides:
    * 1 - (1 - s^r)^b — the classic S-curve. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(
        (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1))
          :+ lit(b): _*)
    }: _*)

  /** MinHash-LSH candidate pairs (idA < idB) with estimated and true Jaccard.
    *
    * Plan shape at scale: project signatures (narrow) → explode bands (×b) →
    * shuffle on (band, bucket) → self-co-group within buckets → distinct
    * pairs → verify true Jaccard on the candidate set only. The only wide op
    * is keyed by band bucket; huge buckets (degenerate content) are capped.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                            maxBucketSize: Int = 1000): DataFrame =
    // The banded construction is EXACTLY the persisted index's
    // ([[minhashBandIndex]]) — one definition, so batch and incremental
    // LSH can never drift apart.
    candidatePairsFromIndex(
      minhashBandIndex(docs, idCol, textCol, shingleN, k, bands),
      docs, idCol, textCol, shingleN, maxBucketSize)

  /** LSH candidate generation + exact verification from prebuilt band-index
    * rows — shared by [[minhashCandidatePairs]] (index over the whole
    * corpus) and [[minhashNearDupEdges]] (index restricted to content-class
    * reps). Only (doc_id, band, bucket) rides the wide exchange — the
    * shingle sets (roughly document-sized) are joined back AFTER the
    * candidate-id set is deduped, so the ×bands explode + distinct never
    * carry text payloads. Scratch-materialized: the index feeds BOTH the
    * hot-bucket census and the self-join probe; unmaterialized, the
    * shingle+minhash projection (the expensive pass) ran once per
    * consumer. */
  private def candidatePairsFromIndex(index: DataFrame, docs: DataFrame,
                                      idCol: String, textCol: String,
                                      shingleN: Int,
                                      maxBucketSize: Int,
                                      indexMaterialized: Boolean = false)
      : DataFrame = {
    // indexMaterialized = the caller already holds the index as a scratch
    // scan (the shared-index path below) — re-materializing would read and
    // rewrite the whole relation for nothing
    val bucketed =
      if (indexMaterialized) index
      else graft.util.Scratch.materialize(index, "band_index",
        compact = false)
    val counted = dropHotBucketsSurfaced(bucketed, maxBucketSize)
      .select(col("band"), col("bucket"), col("doc_id"))

    val a = counted.withColumnRenamed("doc_id", "id_a")
    val b = counted.withColumnRenamed("doc_id", "id_b")
    val candidateIds = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // exact verification only on the (small) candidate set. The candidate
    // relation is scratch-materialized first: ngramJaccard references its
    // `pairs` input twice (the main join chain AND the broadcast
    // needed-ids projection), so an unmaterialized candidate subtree ran
    // the banded self-join + distinct TWICE per call — measured at the
    // 100× bench point as two back-to-back jobs each reading the same
    // ~100 MB band exchange (~50 task-s of pure re-execution). The
    // materialized relation is pair-scale (ids only), far below the band
    // index this function already materializes.
    val candMat = graft.util.Scratch.materialize(candidateIds, "cand_ids")
    ngramJaccard(docs, candMat, idCol, textCol, shingleN)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Identical-content classes with sizes: (__fp, __rep = min id, __n) —
    * distinct-content scale, scratch-materialized. ONE fingerprint pass
    * serves everything downstream: the duplicate-free probe (max __n over
    * the scratch files is free), the star join and the rep index
    * restriction. The single-scan [[graft.functions.FingerprintNorm]]
    * keeps the pass cheap (the former two-regex chain made three of these
    * passes the dominant cost of the whole operator at the 100× bench
    * point). */
  private def contentClasses(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    graft.util.Scratch.materialize(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol),
          TextFunctions.fingerprintMd5(col(textCol)).as("__fp"))
        .groupBy(col("__fp"))
        .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__n")),
      "content_classes")

  /** Largest class size from a materialized [[contentClasses]] relation —
    * reads the scratch files, no recompute. The star-collapse machinery is
    * pure overhead when this is 1 (a duplicate-free corpus), so the edge
    * and full-pair forms consult it EAGERLY at plan-construction time (a
    * bounded Spark job — the hot-bucket-census pattern) and skip the
    * collapse when it buys nothing. */
  private def maxClassSize(classes: DataFrame): Long = {
    val row = classes.agg(max(col("__n"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Near-duplicate pairs above a Jaccard threshold via MinHash-LSH.
    *
    * The OUTPUT pair relation is quadratic where content repeats — m
    * identical copies of a boilerplate page owe C(m,2) pairs at Jaccard 1
    * — and that is the operator's contract ([[minhashNearDupEdges]] is the
    * component-equivalent linear form for closure consumers). But no
    * EXCHANGE is quadratic: identical-content classes collapse around
    * their min-id rep, only class representatives ride the LSH banding +
    * exact-Jaccard verification, and the full relation is GENERATED at
    * output time — within-class pairs from a class-keyed self-join (their
    * Jaccard is exactly 1: identical normalized text ⇒ identical shingle
    * sets), cross-class pairs by expanding each rep pair through both
    * classes' members (members share their reps' shingle sets
    * bit-for-bit, so the verified Jaccard carries over). The former plan
    * pushed every copy through the banded join — C(m,2) candidate rows
    * through the ×bands exchange and the pair distinct — and silently
    * LOST all pairs of over-`maxBucketSize` identical classes to the
    * hot-bucket cap; collapsed classes can no longer flood a bucket.
    * Duplicate-free corpora (class-size probe == 1, one cheap eager agg)
    * take the direct banding path with zero collapse overhead.
    *
    * NOTE plan construction runs bounded Spark jobs (the class-size probe,
    * the scratch materializations) — the returned plan is lazy but not
    * free to build, like every LSH operator here. */
  def minhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8): DataFrame = {
    val classes = contentClasses(docs, idCol, textCol)
    if (maxClassSize(classes) <= 1L)
      return minhashCandidatePairs(docs, idCol, textCol)
        .filter(col("jaccard") >= threshold)
    // members of DUPLICATED classes only — dup-mass scale, not corpus
    // scale (a mostly-distinct corpus keeps this tiny and its joins
    // broadcast under AQE; a boilerplate-heavy one is exactly where the
    // collapse pays). Scratch: feeds the within self-join (2 refs) and the
    // cross expansion (2 refs) — unmaterialized, each ref re-ran the
    // fingerprint pass.
    val dupMemb = graft.util.Scratch.materialize(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol),
          TextFunctions.fingerprintMd5(col(textCol)).as("__fp"))
        .join(classes.filter(col("__n") > 1)
          .select(col("__fp"), col("__rep")), Seq("__fp")),
      "dup_members")
    // within-class pairs (Jaccard exactly 1), generated; the lit(1.0)
    // threshold guard constant-folds away for every sane threshold ≤ 1
    val within = dupMemb.select(col("__fp"), col(idCol).as("id_a"))
      .join(dupMemb.select(col("__fp"), col(idCol).as("id_b")), Seq("__fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
      .filter(lit(1.0) >= lit(threshold))
    // rep-only LSH + verification; restriction on BAND rows (longs), not
    // the docs relation (see minhashNearDupEdges)
    val repIndex = minhashBandIndex(docs, idCol, textCol)
      .join(classes.select(col("__rep").as("doc_id")), Seq("doc_id"),
        "left_semi")
    val repPairs = candidatePairsFromIndex(repIndex, docs, idCol, textCol,
      shingleN = 3, maxBucketSize = 1000)
      .filter(col("jaccard") >= threshold)
    // cross-class expansion: a rep not in any dup class expands to itself
    // (LEFT join + coalesce), so only dup-class members ride the join
    val cross = repPairs
      .join(dupMemb.select(col("__rep").as("id_a"), col(idCol).as("__ma")),
        Seq("id_a"), "left")
      .join(dupMemb.select(col("__rep").as("id_b"), col(idCol).as("__mb")),
        Seq("id_b"), "left")
      .select(least(coalesce(col("__ma"), col("id_a")),
          coalesce(col("__mb"), col("id_b"))).as("id_a"),
        greatest(coalesce(col("__ma"), col("id_a")),
          coalesce(col("__mb"), col("id_b"))).as("id_b"), col("jaccard"))
    within.unionByName(cross)
  }

  /** Component-equivalent near-dup EDGES for cluster closure — the scale
    * path behind every pairs→components consumer ([[duplicateClusters]],
    * [[dropNearDuplicateClusters]], [[splitByCluster]],
    * [[keepBestPerCluster]], the cross-modal closure).
    *
    * [[minhashNearDuplicates]] emits the FULL pair relation: m identical
    * copies of one boilerplate page produce C(m,2) candidate AND output
    * pairs — quadratic exactly where a 100 TB web corpus repeats hardest
    * (one template with 10⁶ near-identical copies is the normal case, not
    * the degenerate one; the 10× bench point measured ~73× executor work
    * on ~10× input through the cross-modal closure). Keep the full form
    * for pair-level analytics; feed closures from THIS.
    *
    * Construction (the text analog of
    * [[graft.multimodal.Multimodal.imageNearDupEdges]]): every
    * identical-content class — exact-dedup fingerprint, i.e. identical
    * normalized text, hence identical token stream, shingle set and
    * Jaccard-1 to each other — collapses to a STAR around its min-id
    * representative, and only class REPRESENTATIVES enter the banded LSH
    * join + exact-Jaccard verification. Since every member shares its
    * rep's shingle set bit-for-bit, a member pairs with an outside vertex
    * iff its rep does: the edge set differs from the full pair relation,
    * but its transitive closure — the connected components — is
    * IDENTICAL, at (m−1) + candidate-scale edges instead of C(m,2).
    *
    * The shingle-emptiness gate (same predicate the band index applies)
    * runs BEFORE the collapse so degenerate docs that never enter banding
    * get no star edges either — the gate is a pure function of the
    * fingerprinted content, so it is class-uniform and cannot split a
    * class. Scale: one rowwise fingerprint pass, one (fingerprint, id)
    * window shuffle, then the LSH exchanges at DISTINCT-CONTENT scale —
    * and the TEXT COLUMN NEVER RIDES ANY EXCHANGE: the rep restriction is
    * applied to the BAND-INDEX rows (3 longs each, id-keyed semi-join),
    * not to the docs relation, because a docs⋉repIds semi-join broadcasts
    * at test scale but silently degrades to a text-shuffling sort-merge
    * join once the rep set outgrows the broadcast threshold (measured 4×
    * the full-pair form at the 100× bench point before this rewrite).
    * Members pay the rowwise shingle+minhash projection their band rows
    * then discard — linear, exchange-free, and strictly cheaper at scale
    * than moving their text. Returns (id_a, id_b), id_a < id_b. */
  def minhashNearDupEdges(docs: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.8, shingleN: Int = 3,
                          k: Int = 64, bands: Int = 16,
                          maxBucketSize: Int = 1000,
                          prebuiltIndex: Option[DataFrame] = None)
      : DataFrame = {
    // prebuiltIndex: an ALREADY-MATERIALIZED [[minhashBandIndex]] over
    // exactly `docs` with exactly these (shingleN, k, bands) — a caller
    // that also persists the index for an incremental probe
    // (`q_dedup_cluster_incremental`) passes it so the shingle+minhash
    // projection (the dominant pass of the whole operator) runs ONCE per
    // sync instead of once here and once for the persisted copy (measured
    // at the 100× bench point: two identical ~50 task-s / 60 MB index
    // builds per run).
    // ADAPTIVE collapse: on a duplicate-free corpus (class-size probe == 1,
    // read free off the classes scratch — see [[maxClassSize]]) the star
    // machinery buys nothing: there are no stars and every doc is its own
    // rep, so the edge set IS the unrestricted banded pair set. Skipping
    // the star join + index semi-join there removed a measured >2× steady
    // overhead on dup-free fixtures; duplicate-heavy behavior is unchanged
    // (DedupSpec pins edge-component equality).
    val classes = contentClasses(docs, idCol, textCol)
    if (maxClassSize(classes) <= 1L)
      return candidatePairsFromIndex(
        prebuiltIndex.getOrElse(
          minhashBandIndex(docs, idCol, textCol, shingleN, k, bands)),
        docs, idCol, textCol, shingleN, maxBucketSize,
        indexMaterialized = prebuiltIndex.isDefined)
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"))
    // banding-eligibility gate: ShingleHashes emits the empty-stream gram
    // for ANY non-null text (≥1 element always), so the band index's
    // size(hs)>0 filter excludes exactly the null-text rows — test that
    // directly instead of computing a full shingle scan per row just to
    // measure its emptiness (was ~30% of the 100× point's cpu). The class
    // relation ([[contentClasses]], scratch) is distinct-content scale and
    // feeds both the star join and the rep index restriction; the star
    // join's build side is the DUPLICATED classes only.
    val star = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        TextFunctions.fingerprintMd5(col(textCol)).as("__fp"))
      .join(classes.filter(col("__n") > 1), Seq("__fp"))
      .filter(col(idCol) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(idCol).as("id_b"))
    val repIndex = prebuiltIndex.getOrElse(
        minhashBandIndex(docs, idCol, textCol, shingleN, k, bands))
      .join(classes.select(col("__rep").as("doc_id")), Seq("doc_id"),
        "left_semi")
    val repPairs = candidatePairsFromIndex(repIndex, docs, idCol, textCol,
      shingleN, maxBucketSize)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"))
    star.unionByName(repPairs)
  }

  /** Content-class representatives of a corpus: (fingerprint, rep_id) with
    * rep_id = min id per identical-normalized-content class, restricted to
    * banding-eligible docs — the persisted side table the EDGE-form
    * incremental near-dup ([[minhashNearDupEdgesIncremental]]) probes.
    * 16 bytes + a long per DISTINCT content. Maintain by appending the
    * genuinely-new classes of each accepted increment. */
  def repFingerprints(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3): DataFrame =
    // banding eligibility ≡ non-null text (ShingleHashes emits ≥1 element
    // for any non-null input — see [[minhashNearDupEdges]])
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.fingerprintMd5(col(textCol))
        .as("fingerprint"))
      .groupBy(col("fingerprint")).agg(min(col(idCol)).as("rep_id"))

  /** Band index over a corpus's content-class REPRESENTATIVES only — the
    * index the edge-form incremental probes. A full-population index keeps
    * every copy of a boilerplate page in its buckets, so one matching
    * probe pairs with all m copies (the quadratic the star collapse
    * removes); the rep index holds one row-set per DISTINCT content. */
  def minhashRepBandIndex(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, k: Int = 64,
                          bands: Int = 16): DataFrame =
    // rep restriction on the BAND rows (longs), not the docs relation — a
    // docs semi-join would shuffle text once reps outgrow the broadcast
    // threshold (see [[minhashNearDupEdges]])
    minhashBandIndex(docs, idCol, textCol, shingleN, k, bands)
      .join(repFingerprints(docs, idCol, textCol, shingleN)
        .select(col("rep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")

  /** INCREMENTAL component-equivalent near-dup EDGES — the edge-form
    * ([[minhashNearDupEdges]]) analog of
    * [[minhashNearDuplicatesIncremental]], and the shape a per-sync 100 TB
    * dedup actually wants: every relation in the hot path is DISTINCT-
    * CONTENT scale, even when the increment or the corpus is mostly copies.
    *
    * The full-pair incremental is quadratic from both directions: m
    * identical docs in the increment each probe the same buckets, and a
    * full-population corpus index pairs one probe with every copy of a
    * boilerplate page. Here the increment first collapses by exact-dedup
    * fingerprint; classes whose content the corpus already KNOWS (a
    * fingerprint-side-table hit — content equality, so Jaccard 1 by
    * construction) emit one star edge per member to the CORPUS rep and
    * never touch the LSH machinery at all; genuinely-new classes star
    * around their increment rep, and only those new-content reps probe the
    * REP-COLLAPSED corpus index ([[minhashRepBandIndex]]). Connected
    * components over (persisted labels + these edges) equal batch
    * clustering of corpus ∪ increment (DedupSpec chains the fold;
    * `q_dedup_edges_incremental` replays the exact edge set in DuckDB).
    *
    * Per-sync cost: one rowwise fingerprint pass over the increment, one
    * fingerprint join against the side table, banding + verification for
    * NEW content only. The corpus text is touched only to verify candidate
    * rep pairs. Maintenance on accept: append the new classes'
    * (fingerprint, rep_id) rows and the new reps' band-index rows —
    * append-idempotent like every other side table here.
    *
    * `corpusRepFps` = (fingerprint, rep_id) from [[repFingerprints]];
    * `corpusRepIndex` = [[minhashRepBandIndex]] rows. Signature/band
    * parameters MUST match the ones the index was built with. Returns
    * (id_a, id_b), id_a < id_b. */
  def minhashNearDupEdgesIncremental(incoming: DataFrame, corpus: DataFrame,
                                     corpusRepFps: DataFrame,
                                     corpusRepIndex: DataFrame,
                                     idCol: String, textCol: String,
                                     threshold: Double = 0.8,
                                     shingleN: Int = 3, k: Int = 64,
                                     bands: Int = 16,
                                     maxBucketSize: Int = 1000,
                                     incomingRepIndex: Option[DataFrame] = None)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__fp"))
    val classed = incoming
      .filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("__fp"))
      .withColumn("__irep", min(col(idCol)).over(w))
    // CRASH-REPLAY HYGIENE: the neardup_labels_edges post-op appends
    // (fingerprint, rep_id) side-table rows BEFORE the label swap commits.
    // A crash between the two replays the same increment against a side
    // table that already contains ITS OWN fingerprints — keyed by increment
    // ids — which would tag genuinely-new content as 'known', skip the LSH
    // probe entirely, and silently lose that content's near-dup links to
    // the corpus forever (labels would diverge from batch). Restrict the
    // side table to rows whose rep_id exists in the COMMITTED corpus (an
    // id-only semi-join; the corpus text column is pruned out of the
    // exchange): replayed rows point at increment ids and drop out, so the
    // probe re-runs idempotently — duplicate side-table appends are already
    // tolerated by every reader. DedupSpec replays the crash window and
    // pins edge-set equality.
    val committedRepFps = corpusRepFps
      .join(corpus.select(col(idCol).as("rep_id")), Seq("rep_id"), "left_semi")
    // one scratch materialization: the classed relation feeds three
    // consumers (cross stars, new-class stars, new-rep ids) and its
    // upstream is the increment's fingerprint pass + side-table join
    val tagged = graft.util.Scratch.materialize(
      classed.join(
        committedRepFps.select(col("fingerprint").as("__fp"),
          col("rep_id").as("__crep")).distinct(),
        Seq("__fp"), "left"),
      "inc_edge_classes")
    // content the corpus knows: every member (including the increment's
    // would-be rep) attaches straight to the corpus rep — no banding
    val crossStar = tagged.filter(col("__crep").isNotNull)
      .filter(col(idCol) =!= col("__crep"))
      .select(least(col("__crep"), col(idCol)).as("id_a"),
        greatest(col("__crep"), col(idCol)).as("id_b"))
    val newClasses = tagged.filter(col("__crep").isNull)
    val incStar = newClasses.filter(col(idCol) =!= col("__irep"))
      .select(col("__irep").as("id_a"), col(idCol).as("id_b"))
    val newRepIds = newClasses.filter(col(idCol) === col("__irep"))
      .select(col(idCol).as("doc_id"))
    // new-content reps probe (corpus reps ∪ new reps). The rep restriction
    // applies to BAND-INDEX rows (longs, id-keyed semi-join), never to the
    // incoming docs relation — a docs semi-join would shuffle the text
    // column once the rep set outgrows the broadcast threshold (see
    // [[minhashNearDupEdges]]). Verification text comes from the full
    // populations (candidate ids broadcast inside ngramJaccard). A caller
    // that ALSO persists the new reps' band rows (the neardup_labels_edges
    // post-op) passes them in, so the most expensive projection
    // (shingle+minhash over the increment) runs once per sync — the index
    // MUST be exactly [[minhashBandIndex]] over this increment's
    // new-content reps.
    val probeIndex = incomingRepIndex.getOrElse(
      graft.util.Scratch.materialize(
        minhashBandIndex(incoming, idCol, textCol, shingleN, k, bands)
          .join(newRepIds, Seq("doc_id"), "left_semi"),
        "inc_rep_index", compact = false))
    val repPairs = minhashNearDuplicatesIncremental(incoming, corpus,
      corpusRepIndex, idCol, textCol, threshold, shingleN, k, bands,
      maxBucketSize, incomingIndex = Some(probeIndex))
      .select(col("id_a"), col("id_b"))
    // the three sets are disjoint by construction (members never appear in
    // repPairs; star targets are non-reps) — plain union, no dedup shuffle
    crossStar.unionByName(incStar).unionByName(repPairs)
  }

  /** Banded-signature LSH index rows for a document set: (doc_id, band,
    * bucket). Persist this next to the corpus (append each accepted
    * increment's rows) so later increments probe it via
    * [[minhashNearDuplicatesIncremental]] without ever re-shingling the
    * corpus — the near-dup analog of the exact-dedup fingerprint side table
    * ([[appendFingerprints]]). ~`bands` longs per document.
    *
    * Candidate generation never materializes token/shingle strings:
    * ShingleHashes scans the raw bytes once into distinct gram hashes and
    * MinHashSig folds them into the k signature minima — two codegen'd
    * expressions. STAGED selects keep `hs`/`sig` computed once per row
    * (CollapseProject leaves non-cheap exprs used >1× un-inlined; inlining
    * recomputed them k× — measured 30× slower end-to-end at sf0.1). */
  def minhashBandIndex(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, k: Int = 64,
                       bands: Int = 16): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), minhashSignatureFromHashes(col("hs"), k).as("sig"))
      .select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands, k / bands))
          .as(Seq("band", "bucket")))

  /** What a hot-bucket cap evaluation discarded: over-cap (band,bucket)
    * keys and the index rows inside them. Silent recall loss in a dedup is
    * the one failure a user cannot see from the output, so the cap is not
    * allowed to be invisible.
    *
    * Ownership model: every census APPENDS to a PER-THREAD log that the
    * caller drains with [[drainHotBucketDrops]] — correct because the LSH
    * operators evaluate their census EAGERLY at plan-construction time on
    * the calling thread (these public pair/edge APIs run bounded Spark
    * jobs while BUILDING the plan — the returned DataFrame is lazy, the
    * construction is not), so a composite operator that runs several
    * censuses (the edge-form incremental runs one per probe) yields one
    * record each instead of clobbering a shared slot, and concurrent runs
    * on one SparkSession can't interleave each other's records.
    * [[lastHotBucketDrops]] stays as the latest-census convenience view
    * (single-threaded monitoring only — under concurrency, drain the
    * thread log). Zero after a run = nothing dropped. */
  final case class HotBucketDrops(buckets: Long, indexRows: Long)
  @volatile var lastHotBucketDrops: HotBucketDrops = HotBucketDrops(0L, 0L)
  private val hotBucketLog =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[HotBucketDrops]] {
      override def initialValue()
          : scala.collection.mutable.ArrayBuffer[HotBucketDrops] =
        scala.collection.mutable.ArrayBuffer.empty
    }

  /** Drain THIS thread's accumulated census records (one per hot-bucket
    * evaluation since the last drain, oldest first) — the owned handle a
    * pipeline reads after building/running its dedup plan. */
  def drainHotBucketDrops(): Seq[HotBucketDrops] = {
    val b = hotBucketLog.get()
    val out = b.toSeq
    b.clear()
    out
  }

  /** Remove degenerate LSH buckets (boilerplate content all colliding):
    * without the cap, one hot bucket at 100 TB produces an O(m²) pair
    * explosion. After the identical-content star collapse
    * ([[minhashNearDupEdges]]) exact-duplicate classes are 1-row reps, so
    * a bucket that STILL trips the cap is a genuinely diverse collision
    * cloud — it is removed (the S-curve guarantee is per-pair, so losing
    * one band's bucket only matters for pairs colliding in no other band),
    * but never silently: the census is COLLECTED (bounded — at most
    * |index| / maxBucketSize keys), recorded in [[lastHotBucketDrops]],
    * and the anti-join runs against the collected keys as a local
    * relation, which also means the (expensive) index subtree is evaluated
    * once for the census instead of once per plan side. The census count
    * is a PARTIAL AGG (map-side combine), not a window count that would
    * full-sort every banded row just to read its bucket size. ONE
    * definition shared by the batch, incremental, and cosine-LSH paths. */
  /** TWO-PHASE census over an APPEND-maintained index (round 14, shared by
    * the MinHash and cosine-LSH incremental paths since round 15): the cap
    * must count DISTINCT index rows (crash-retried appends legitimately
    * duplicate rows, and raw duplicates would inflate bucket counts past
    * the cap and silently drop legitimate buckets), but a full
    * `distinct()` pays an extra exchange of the combined index on EVERY
    * sync to defend against duplicates that almost never exist. A RAW
    * count is always ≥ the distinct count, so a bucket under the cap raw
    * can never be hot: the cheap raw census (one partial-agg exchange)
    * names a hot-bucket SUPERSET, and the exact distinct recount runs only
    * over that superset's rows (broadcast semi-join). Hot set and census
    * record are IDENTICAL to the plain distinct census (DedupSpec pins the
    * duplicated-index 2×-inflation → recount-exonerates case). Logs
    * exactly ONE census record per call. */
  private[functions] def twoPhaseHotBucketKeys(
      all: DataFrame, maxBucketSize: Int): Option[DataFrame] =
    hotBucketKeysLocal(all, maxBucketSize) match {
      case None => None // raw under cap everywhere → distinct is too
      case Some(rawKeys) =>
        // the raw census above logged ITS drops record; the exact recount
        // below logs the real one — drop the superset's provisional entry
        // so callers draining the per-thread log see one record per probe
        val log = hotBucketLog.get()
        if (log.nonEmpty) log.remove(log.size - 1)
        hotBucketKeysLocal(
          all.join(broadcast(rawKeys), Seq("band", "bucket"), "left_semi")
            .distinct(),
          maxBucketSize,
          // already restricted to the raw-hot keys — a pre-sift scan here
          // would re-execute the semi-join + distinct once more for no
          // byte reduction
          presift = false)
    }

  /** MAP-SIDE PRE-SIFT (round 15, guide §2.3): the census aggregation's
    * exchange is nearly as large as the index itself — (band, bucket) keys
    * barely repeat inside one map partition, so partial aggregation cannot
    * reduce them (measured at the 100× bench point: a 92 MB census
    * exchange over a ~120 MB combined index, ~24 task-s per sync; the
    * batch-path census another 46 MB). But the census only needs buckets
    * OVER the cap, and those are findable without any exchange: by
    * pigeonhole, a bucket with more than `cap` rows across P partitions
    * has more than cap/P rows in SOME partition, so a per-partition local
    * count that emits keys with `localCount * P > cap` (exact integer
    * arithmetic) names a SUPERSET of the over-cap buckets — tiny, because
    * almost every bucket holds a handful of rows. The exact census then
    * aggregates only the superset's rows (broadcast semi-join); its hot
    * set is IDENTICAL to the full census (every over-cap key is in the
    * superset and all of its rows are counted). Empty superset ≡ empty
    * census — log the same (0, 0) record. `presift = false` keeps the
    * plain aggregation for subtrees that are already key-restricted (the
    * two-phase recount), where a pre-sift scan would re-execute the
    * restriction join for no reduction. */
  private[graft] def hotBucketKeysLocal(
      bucketed: DataFrame, maxBucketSize: Int,
      keyCols: Seq[String] = Seq("band", "bucket"),
      presift: Boolean = true): Option[DataFrame] = {
    if (!presift) exactCensusLocal(bucketed, maxBucketSize, keyCols)
    else {
      val keys = bucketed.select(keyCols.map(col): _*)
      val rdd = keys.rdd
      val p = rdd.getNumPartitions
      val cap = maxBucketSize.toLong
      val cand: Array[Seq[Any]] =
        if (p == 0) Array.empty
        else rdd.mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
          it.foreach { r =>
            val k = r.toSeq
            m.update(k, m.getOrElse(k, 0L) + 1L)
          }
          m.iterator.collect { case (k, n) if n * p > cap => k }
        }.collect().distinct
      if (cand.isEmpty) {
        // no partition saw any key over cap/P → no bucket can be over the
        // cap; identical record to what the full census would have logged
        val drops = HotBucketDrops(0L, 0L)
        lastHotBucketDrops = drops
        hotBucketLog.get() += drops
        None
      } else {
        val spark = bucketed.sparkSession
        val keySchema = org.apache.spark.sql.types.StructType(
          keyCols.map(n => bucketed.schema(n)))
        val candRows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(cand.map(
            org.apache.spark.sql.Row.fromSeq): _*)
        exactCensusLocal(
          bucketed.join(broadcast(spark.createDataFrame(candRows, keySchema)),
            keyCols, "left_semi"),
          maxBucketSize, keyCols)
      }
    }
  }

  private def exactCensusLocal(
      bucketed: DataFrame, maxBucketSize: Int,
      keyCols: Seq[String]): Option[DataFrame] = {
    val hotRows = bucketed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > maxBucketSize)
      .collect()
    val drops = HotBucketDrops(hotRows.length.toLong,
      hotRows.map(_.getLong(keyCols.length)).sum)
    lastHotBucketDrops = drops
    hotBucketLog.get() += drops
    if (hotRows.isEmpty) None
    else {
      val spark = bucketed.sparkSession
      val keySchema = org.apache.spark.sql.types.StructType(
        keyCols.map(n => bucketed.schema(n)))
      val keyRows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(hotRows.map(r =>
          org.apache.spark.sql.Row.fromSeq(keyCols.indices.map(r.get))): _*)
      // LocalRelation build side: no RDD, no persisted blocks (leak gate)
      Some(spark.createDataFrame(keyRows, keySchema))
    }
  }

  /** Monitoring relation for the cap: every over-cap (band, bucket) with
    * its size — the report row a curation pipeline persists next to its
    * dedup output so capped recall loss is reviewable, not archaeological.
    * Empty = the run dropped nothing. */
  def minhashHotBucketReport(docs: DataFrame, idCol: String, textCol: String,
                             shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                             maxBucketSize: Int = 1000): DataFrame =
    minhashBandIndex(docs, idCol, textCol, shingleN, k, bands)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)

  private[functions] def dropHotBucketsSurfaced(
      bucketed: DataFrame, maxBucketSize: Int,
      keyCols: Seq[String] = Seq("band", "bucket")): DataFrame =
    hotBucketKeysLocal(bucketed, maxBucketSize, keyCols) match {
      case None => bucketed
      case Some(hotDf) =>
        bucketed.join(broadcast(hotDf), keyCols, "left_anti")
    }

  /** INCREMENTAL MinHash-LSH near-dup — the 100 TB shape: find near-dup
    * pairs with at least one side in the `incoming` increment, probing the
    * corpus through its PERSISTED band index (`corpusIndex`, from
    * [[minhashBandIndex]]). The corpus is never re-shingled: its text is
    * touched only to verify the candidate ids (broadcast-semi-joined inside
    * [[ngramJaccard]]). Corpus-internal pairs are already known from past
    * runs and are excluded by construction — only incoming×(incoming ∪
    * corpus) pairs emerge. Signature/band parameters MUST match the ones
    * the index was built with. */
  def minhashNearDuplicatesIncremental(incoming: DataFrame, corpus: DataFrame,
                                       corpusIndex: DataFrame,
                                       idCol: String, textCol: String,
                                       threshold: Double = 0.8,
                                       shingleN: Int = 3, k: Int = 64,
                                       bands: Int = 16,
                                       maxBucketSize: Int = 1000,
                                       incomingIndex: Option[DataFrame] = None)
      : DataFrame = {
    // the increment's band rows feed THREE consumers (the combined count,
    // the probe side, the target side) — materialize the increment-scale
    // relation once instead of re-shingling the increment per consumer
    // (parquet scratch, not localCheckpoint: there is no safe point to
    // unpersist a checkpoint the returned plan still reads, so each call
    // leaked one RDD per sync — see [[graft.util.Scratch]]).
    // A caller that ALSO persists the increment's index (the neardup_labels
    // post-op) passes it in, so the most expensive projection in the path
    // (shingle+minhash over the increment) runs once per sync, not twice.
    val inc = incomingIndex.getOrElse(graft.util.Scratch.materialize(
      minhashBandIndex(incoming, idCol, textCol, shingleN, k, bands),
      "inc_band_index", compact = false))
    val all = corpusIndex.select(col("doc_id"), col("band"), col("bucket"))
      .unionByName(inc)
    // hot-bucket cap across the COMBINED population (a boilerplate bucket is
    // degenerate whether its members are old or new). The COUNT runs over
    // the DISTINCT index rows: the index is maintained by APPEND
    // (crash-retried appends legitimately duplicate rows, like the
    // fingerprint side table), and raw duplicates would inflate bucket
    // counts past maxBucketSize and silently drop legitimate buckets. The
    // join sides below stay RAW — duplicate rows there only produce
    // duplicate candidate pairs, which the final distinct() removes.
    // TWO-PHASE census (round-14): a RAW count is always ≥ the distinct
    // count, so a bucket under the cap raw can never be hot — the cheap
    // raw census (one partial-agg exchange) names a hot-bucket SUPERSET,
    // and the exact distinct recount runs only over that superset's rows
    // (broadcast semi-join). The former `all.distinct()` census paid a
    // full extra exchange of the combined index on EVERY sync to defend
    // against append-duplicates that almost never exist — measured at the
    // 100× bench point as ~30 task-s (a 92 MB second shuffle) per probe.
    // Hot set and census record are IDENTICAL either way (DedupSpec pins
    // the duplicated-index case: raw 2× inflation crosses the cap, the
    // recount exonerates the bucket).
    val hot = twoPhaseHotBucketKeys(all, maxBucketSize)
    // the empty-superset raw census already logged (0,0) — the exact
    // census would have recorded the same
    def dropHot(df: DataFrame): DataFrame = hot match {
      case None => df
      case Some(h) => df.join(broadcast(h), Seq("band", "bucket"), "left_anti")
    }
    val probe = dropHot(inc)
    val target = dropHot(all)
    val candidates = probe.withColumnRenamed("doc_id", "id_x")
      .join(target.withColumnRenamed("doc_id", "id_y"), Seq("band", "bucket"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    // materialized for the same reason as candidatePairsFromIndex's
    // candidate set: ngramJaccard reads `pairs` twice (needed-ids
    // broadcast + main chain), and the probe⋈target band join is the
    // expensive subtree of the whole sync
    val candMat = graft.util.Scratch.materialize(candidates, "inc_cand_ids")
    ngramJaccard(corpus.unionByName(incoming), candMat, idCol, textCol, shingleN)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --------------------------------------------------------------------------
  // Near-duplicate clustering (pairs → connected components)
  // --------------------------------------------------------------------------

  /** Connected components over a near-duplicate PAIR graph: every member of
    * a cluster is labeled with the cluster's MIN id (its representative).
    * Pairwise dedup alone under-removes chains (A~B, B~C but A≁C directly);
    * clustering is the step every real pipeline runs after LSH.
    *
    * Distributed min-label propagation with POINTER JUMPING: each round
    * takes `label := min(label, neighbors' labels, label(label))` — the
    * label-of-label hop doubles propagation distance, so convergence is
    * O(log diameter) rounds, not O(diameter) (a 1M-doc boilerplate chain
    * converges in ~20 rounds instead of 1M). All data is CANDIDATE-scale
    * (the pair graph), never corpus-scale; each round is localCheckpoint'ed
    * so lineage stays bounded. Throws rather than returning unconverged
    * (silently wrong) labels if `maxIters` is exhausted — unreachable below
    * diameter 2^25. Returns (id, cluster). */
  /** Pair count at or below which components close on the DRIVER with a
    * plain union-find over the (already-checkpointed) pair rows instead of
    * distributed label propagation. Each propagation round costs 3 joins +
    * a count job, and the typical closure input — an increment's contracted
    * pair graph, a steady corpus's near-dup pairs — is thousands of rows,
    * where ~15 fixed-overhead Spark jobs dwarf the actual work (the fold
    * path showed up as the top steady cost for exactly this reason). 200k
    * pairs ≈ 3 MB on the driver; the result returns as a LocalRelation
    * (labels are node-scale), which downstream corpus joins then BROADCAST
    * — strictly better than a shuffled label join at every scale where the
    * driver path is taken. Var so tests can force the distributed path.
    *
    * Round 14: raised 200k → 2M. The crossmodal closure at the 100× bench
    * point carries a ~300k-pair graph — just over the old cap — and paid
    * ~10 s of pure driver latency in propagation rounds (dozens of tiny
    * jobs at fixed scheduling cost) for work a driver union-find finishes
    * in well under a second. 2M pairs collect as ~32 MB of longs (~200 MB
    * transient with Row boxing) — comfortable on the 8 GB default driver
    * heap, and the labels still return as a broadcastable LocalRelation.
    * Graphs past 2M keep the distributed path unchanged. */
  private[graft] var driverUnionFindMaxPairs: Long = 2L * 1000 * 1000

  /** Driver-side min-label union-find over collected (long, long) pairs. */
  private def unionFindLabels(rows: Array[org.apache.spark.sql.Row])
      : Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    // second pass: with unions keyed max→min, every root IS its
    // component's min id — label each node by its root
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val seen = new java.util.HashSet[Long]()
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1)).foreach { n =>
        if (seen.add(n)) out += ((n, find(n)))
      }
    }
    out.toSeq
  }

  def duplicateClusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // materialize the pair relation ONCE before the symmetrize union: both
    // union branches read the (pair-scale) checkpoint instead of each
    // re-running the whole upstream candidate pipeline (LSH banding +
    // jaccard verification — measured ~2× the family's pair-gen cost).
    // Null-id pairs are dropped HERE so both physical paths below agree:
    // the driver union-find has no null node, and letting the distributed
    // label propagation see them would produce labels the driver path
    // doesn't — output must be a function of the input, not of which side
    // of the pair-count threshold it landed on. (No in-repo pair producer
    // emits null ids; this pins the contract for external callers.)
    val p0 = pairs.select(col("id_a"), col("id_b"))
      .filter(col("id_a").isNotNull && col("id_b").isNotNull)
      .localCheckpoint(true)
    // ADAPTIVE: bounded pair sets close on the driver (see
    // [[driverUnionFindMaxPairs]]); the count is a cheap job over the
    // checkpoint's local blocks. Long ids only — other id types keep the
    // distributed path (correct at any type).
    val idType = p0.schema("id_a").dataType
    if (idType == org.apache.spark.sql.types.LongType &&
        p0.schema("id_b").dataType == idType) {
      val nPairs = p0.count()
      if (nPairs <= driverUnionFindMaxPairs) {
        val labels = unionFindLabels(
          p0.collect().filter(r => !r.isNullAt(0) && !r.isNullAt(1)))
        org.apache.spark.sql.GraftShim.checkpointRdd(p0)
          .foreach(_.unpersist(blocking = false))
        val spark = pairs.sparkSession
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("cluster", idType)))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(labels.map(l =>
            org.apache.spark.sql.Row(l._1, l._2)): _*)
        // LocalRelation: no RDD, no persisted blocks (leak gate), and the
        // node-scale label relation BROADCASTS into downstream corpus joins
        return spark.createDataFrame(rows, schema)
      }
    }
    val edges = p0
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p0.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // p0's blocks are dead once edges' checkpoint exists
    org.apache.spark.sql.GraftShim.checkpointRdd(p0)
      .foreach(_.unpersist(blocking = false))
    // init fuses the first propagation round: label = min(self, neighbors)
    // straight off the edge list (one groupBy instead of a join round)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mindst"))
      .select(col("id"), least(col("id"), col("mindst")).as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("ncluster"))
      // label-of-label: every cluster value is itself a node id, so the
      // self-join matches every row; LEFT join so a (never-expected) miss
      // can only skip the hop for that row, not drop the row
      val hop = labels
        .join(labels.select(col("id").as("cluster"), col("cluster").as("hcluster")),
          Seq("cluster"), "left")
        .select(col("id"), col("hcluster"))
      // LAZY checkpoint: the convergence count below materializes it, so
      // each round costs ONE job (update + changed-count fused), and the
      // next round's joins read the truncated-lineage checkpoint.
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .join(hop, Seq("id"), "left")
        .select(col("id"), col("cluster"),
          least(col("cluster"),
            coalesce(col("ncluster"), col("cluster")),
            coalesce(col("hcluster"), col("cluster"))).as("next"))
        .localCheckpoint(false)
      converged = updated.filter(col("next") < col("cluster")).count() == 0
      // the superseded iteration's checkpoint blocks are dead the moment the
      // new checkpoint materializes (its lineage is truncated) — unpersist
      // eagerly, or a long session leaks one RDD per round until the
      // ContextCleaner happens by (round 5's creeping-slowdown signature)
      org.apache.spark.sql.GraftShim.checkpointRdd(labels)
        .foreach(_.unpersist(blocking = false))
      labels = updated.select(col("id"), col("next").as("cluster"))
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters: not converged after $maxIters rounds " +
        "(component diameter > 2^25?)")
    // TERMINAL materialization goes to parquet scratch, not a checkpoint:
    // returning the checkpointed relation leaked its blocks for the
    // session's lifetime (callers consume it lazily — there is no safe
    // unpersist point after return). With the result on scratch, BOTH loop
    // checkpoints die here and a run leaves zero persisted RDDs behind
    // (DedupSpec asserts it; bench leaked_rdds gates on it).
    val out = graft.util.Scratch.materialize(labels, "cluster_labels")
    org.apache.spark.sql.GraftShim.checkpointRdd(labels)
      .foreach(_.unpersist(blocking = false))
    org.apache.spark.sql.GraftShim.checkpointRdd(edges)
      .foreach(_.unpersist(blocking = false))
    out
  }

  /** Incrementally MAINTAIN a persisted cluster-label table — the label
    * analog of the band index ([[minhashBandIndex]]): persist the (id,
    * cluster) relation this returns, and each sync folds ONLY the pairs its
    * increment's band-probe produced ([[minhashNearDuplicatesIncremental]])
    * instead of re-propagating the full corpus pair graph (round 6's one
    * remaining rebuild-the-world step).
    *
    * The fold is a union-find merge of the TOUCHED components: each new
    * pair endpoint CONTRACTS to its current component representative (its
    * persisted label; unlabeled ids — new docs, previously pairless docs —
    * stand for themselves), min-label propagation runs over that contracted
    * graph alone, and the label table takes one broadcast-sized relabel
    * join (old cluster → merged cluster) plus the new nodes' rows. Because
    * every persisted label IS its component's min id, the contracted
    * propagation's min equals the global min — chain-folded labels are
    * EXACTLY the batch [[duplicateClusters]] labels (DedupSpec chains two
    * increments against batch; `q_dedup_cluster_incremental` oracles the
    * fold against DuckDB's recursive closure of the full pair set).
    *
    * Scale: new-pair scale + touched-component scale, never corpus scale —
    * the label table is read twice (the broadcast relabel join, and an
    * id-only anti-join finding genuinely new nodes; PlanSpec pins that no
    * exchange carries more than id/cluster longs), and the corpus text not
    * at all. */
  def foldClusterLabels(prevLabels: Option[DataFrame], newPairs: DataFrame,
                        maxIters: Int = 25): DataFrame = prevLabels match {
    case None => duplicateClusters(newPairs, maxIters)
    case Some(labels0) =>
      val labels = labels0.select(col("id"), col("cluster"))
      val contracted = newPairs
        .select(col("id_a"), col("id_b"))
        .join(labels.select(col("id").as("id_a"), col("cluster").as("__ca")),
          Seq("id_a"), "left")
        .join(labels.select(col("id").as("id_b"), col("cluster").as("__cb")),
          Seq("id_b"), "left")
        .select(coalesce(col("__ca"), col("id_a")).as("id_a"),
          coalesce(col("__cb"), col("id_b")).as("id_b"))
        // a pair internal to one existing component contracts away — it
        // can change no label and must not pay a propagation round
        .filter(col("id_a") =!= col("id_b"))
      val repLabels = duplicateClusters(contracted, maxIters)
      // old cluster id → merged cluster id (both sides component-scale)
      val relabel = repLabels
        .select(col("id").as("cluster"), col("cluster").as("__newc"))
      val rewritten = labels.join(relabel, Seq("cluster"), "left")
        .select(col("id"), coalesce(col("__newc"), col("cluster")).as("cluster"))
      // contracted-graph nodes with no existing label row = genuinely new
      // members (incoming docs, previously pairless docs)
      val newRows = repLabels
        .join(labels.select(col("id")), Seq("id"), "left_anti")
      rewritten.unionByName(newRows)
  }

  /** Keep ONE representative (min id) per near-duplicate CLUSTER: docs in no
    * pair survive untouched; docs in a cluster survive only as its min id.
    * No broadcast hint on the drop set: a heavily-duplicated corpus makes it
    * corpus-scale, where a forced broadcast OOMs — AQE still turns the join
    * into a broadcast at runtime whenever the set is actually small. */
  def dropNearDuplicateClusters(docs: DataFrame, pairs: DataFrame,
                                idCol: String): DataFrame = {
    val nonRepresentatives = duplicateClusters(pairs)
      .filter(col("cluster") =!= col("id"))
      .select(col("id"))
    docs.join(nonRepresentatives,
      docs(idCol) === nonRepresentatives("id"), "left_anti")
  }

  /** Keep the BEST-quality representative per near-duplicate cluster —
    * the quality-aware alternative to [[dropNearDuplicateClusters]]'s
    * min-id convention: within a cluster the max `scoreCol` survives, ties
    * broken by min id. The standard curation choice when near-copies
    * differ in extraction quality (keep the cleanest copy, not the
    * arbitrary first one). Docs in no pair survive untouched.
    *
    * Scale: labels are CANDIDATE-scale; the unclustered branch is one left
    * join with NO corpus shuffle (the label side broadcasts under AQE),
    * and only cluster MEMBERS — a tiny fraction of a healthy corpus — pay
    * the within-cluster rank. */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
                         scoreCol: Column): DataFrame = {
    val labels = duplicateClusters(pairs).withColumnRenamed("id", "__cid")
    val keyed = docs.join(labels, docs(idCol) === labels("__cid"), "left")
      .drop("__cid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(scoreCol.desc, col(idCol).asc)
    keyed.filter(col("cluster").isNull).drop("cluster")
      .unionByName(keyed.filter(col("cluster").isNotNull)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn", "cluster"))
  }

  /** Leakage-aware train/validation split: every document inherits the
    * split of its near-duplicate CLUSTER representative, so two near-copies
    * can never land on opposite sides (per-doc hash splitting leaks eval
    * content into training whenever a near-dup pair straddles the
    * boundary). `pairs` is a near-dup pair relation (e.g. from
    * [[minhashNearDuplicates]]); docs in no pair split on their own id.
    * Emits the input plus (split_key, split).
    *
    * Scale: cluster labels are CANDIDATE-scale ([[duplicateClusters]]); the
    * corpus takes one left join against them and a narrow hash projection —
    * the split itself never shuffles the corpus. */
  def splitByCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
                     trainFraction: Double): DataFrame = {
    val labels = duplicateClusters(pairs)
      .withColumnRenamed("id", "__cid")
    val keyed = docs
      .join(labels, docs(idCol) === labels("__cid"), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
      .drop("__cid", "cluster")
    graft.operators.Relational.deterministicSplit(keyed, "split_key", trainFraction)
  }

  // --------------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------------

  /** 64-bit SimHash signature per doc (custom codegen'd expression). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      simhash64(TextFunctions.tokens(col(textCol))).as("simhash"))

  /** Banded SimHash index rows for a document set: (doc_id, simhash, band,
    * band_val) — 64 bits split into (maxHamming+1) bands, so by pigeonhole
    * any pair within maxHamming bits agrees exactly on ≥1 band. Persist
    * this next to the corpus (append each accepted increment's rows) and
    * later increments probe it via [[simhashNearDuplicatesIncremental]]
    * without re-tokenizing the corpus — the SimHash analog of
    * [[minhashBandIndex]]. The signature rides along (8 bytes/row) so the
    * probe verifies Hamming distance from the index alone: the corpus TEXT
    * is never touched again. ONE banding definition shared by the batch
    * and incremental paths — they cannot drift apart. */
  def simhashBandIndex(docs: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 3): DataFrame =
    simhashBandRows(simhashSignatures(docs, idCol, textCol), maxHamming)

  /** Band rows from an EXISTING (doc_id, simhash) relation — one banding
    * definition shared by [[simhashBandIndex]] and the edge form's
    * rep-only banding ([[simhashNearDupEdges]]). */
  private def simhashBandRows(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands
    sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until bands).map { b =>
        // band b = bits [b*width, (b+1)*width); last band absorbs the remainder
        val w = if (b == bands - 1) 64 - b * width else width
        shiftrightunsigned(col("simhash"), b * width)
          .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)).as(Seq("band", "band_val")))
  }

  private def simhashPairsFromBands(banded: DataFrame,
                                    maxHamming: Int): DataFrame = {
    val a = banded.select(col("band"), col("band_val"),
      col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dup pairs within `maxHamming` bits, via banded lookup —
    * EXACT by pigeonhole (≥1 identical band per qualifying pair), so the
    * banded join is the complete answer, not a sample. */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3): DataFrame =
    simhashPairsFromBands(simhashBandIndex(docs, idCol, textCol, maxHamming),
      maxHamming)

  /** Component-equivalent SimHash near-dup EDGES — the [[minhashNearDupEdges]]
    * pattern on the signature axis, and EXACTLY component-equal rather than
    * merely closure-equal: the pair predicate (Hamming ≤ maxHamming) is a
    * pure function of the two signatures, so an identical-signature class
    * collapses losslessly — every member relates to an outside vertex iff
    * its rep does, bit for bit. m copies of a page (identical signature by
    * construction) emit m−1 star edges at Hamming 0 instead of C(m,2)
    * pairs, and only DISTINCT signatures enter the banded join — the join's
    * quadratic term shrinks from copy-cardinality to signature-cardinality.
    * Returns (id_a, id_b, hamming); star edges carry hamming 0. */
  def simhashNearDupEdges(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one tokenize+simhash pass (scratch): the signature relation feeds the
    // class window twice and the rep banding once
    val sigs = graft.util.Scratch.materialize(
      simhashSignatures(docs, idCol, textCol), "simhash_sigs",
      compact = false)
    val w = Window.partitionBy(col("simhash"))
    val withRep = sigs.withColumn("__rep", min(col("doc_id")).over(w))
    val star = withRep.filter(col("doc_id") =!= col("__rep"))
      .select(col("__rep").as("id_a"), col("doc_id").as("id_b"),
        lit(0L).as("hamming"))
    val reps = withRep.filter(col("doc_id") === col("__rep"))
      .select(col("doc_id"), col("simhash"))
    star.unionByName(simhashPairsFromBands(
      simhashBandRows(reps, maxHamming), maxHamming))
  }

  /** INCREMENTAL SimHash near-dup — the 100 TB shape: pairs within
    * `maxHamming` bits with at least one side in `incoming`, probing the
    * corpus through its PERSISTED band index (`corpusIndex`, from
    * [[simhashBandIndex]] — which carries the signatures, so unlike the
    * MinHash path no corpus relation is needed at all: verification is
    * pure signature arithmetic). Exact for the incoming×(incoming∪corpus)
    * pair set by the same pigeonhole argument as the batch path;
    * corpus-internal pairs are already known from past runs and excluded
    * by construction. `maxHamming` MUST match the index's. Cost per
    * increment: one tokenize+band pass over the increment plus a band-
    * keyed join of (8-byte key, 8-byte signature) rows. */
  def simhashNearDuplicatesIncremental(incoming: DataFrame,
                                       corpusIndex: DataFrame,
                                       idCol: String, textCol: String,
                                       maxHamming: Int = 3,
                                       incomingIndex: Option[DataFrame] = None)
      : DataFrame = {
    // increment bands feed both join sides — materialize once (scratch,
    // not checkpoint: the returned plan reads it lazily; see Scratch)
    val inc = incomingIndex.getOrElse(graft.util.Scratch.materialize(
      simhashBandIndex(incoming, idCol, textCol, maxHamming),
      "inc_simhash_index", compact = false))
    val all = corpusIndex
      .select(col("doc_id"), col("simhash"), col("band"), col("band_val"))
      .unionByName(inc)
    val probe = inc.select(col("band"), col("band_val"),
      col("doc_id").as("id_x"), col("simhash").as("sim_x"))
    val target = all.select(col("band"), col("band_val"),
      col("doc_id").as("id_y"), col("simhash").as("sim_y"))
    probe.join(target, Seq("band", "band_val"))
      .filter(col("id_x") =!= col("id_y"))
      // canonicalize before distinct: a pair found from both sides (both
      // ids incoming) or in several bands collapses to one row
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        hamming64(col("sim_x"), col("sim_y")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** One-relation SimHash dedup STATE fold for the streaming twin of the
    * `simhash_labels` post-op: the persisted state carries both the band
    * index (kind 'b': doc_id, simhash, band, band_val) and the incremental
    * cluster labels (kind 'l': doc_id, cluster) as a discriminated union —
    * the same shape trick as the BM25 index fold, so one atomic state swap
    * covers index + labels together (no torn crash window between them;
    * the YAML post-op orders two separate writes instead and tolerates the
    * replay). Each fold probes the batch against the prior bands
    * ([[simhashNearDuplicatesIncremental]] — pigeonhole-exact), folds the
    * new pairs into the labels, and appends the batch's band rows; chained
    * folds therefore label exactly like batch clustering of everything
    * folded, the `simhash_labels` argument verbatim.
    *
    * Scale: state is index-scale (bands+1 rows of 8-byte values per doc +
    * one label row per clustered doc); the batch tokenizes once; exchanges
    * carry longs only. */
  def foldSimhashState(prev: Option[DataFrame], batch: DataFrame,
                       idCol: String, textCol: String,
                       maxHamming: Int = 3): DataFrame = {
    val inc = batch.select(col(idCol), col(textCol))
    val incIndex = graft.util.Scratch.materialize(
      simhashBandIndex(inc, idCol, textCol, maxHamming),
      "fold_simhash_index", compact = false)
    val idType = incIndex.schema("doc_id").dataType
    val (prevBands, prevLabels) = prev match {
      case Some(st) => (
        st.filter(col("kind") === "b")
          .select(col("doc_id"), col("simhash"), col("band"), col("band_val")),
        Some(st.filter(col("kind") === "l")
          .select(col("doc_id").as("id"), col("cluster"))))
      case None => (incIndex.limit(0), None)
    }
    val newPairs = simhashNearDuplicatesIncremental(inc, prevBands, idCol,
      textCol, maxHamming, incomingIndex = Some(incIndex))
      .select(col("id_a"), col("id_b"))
    val labels = foldClusterLabels(prevLabels, newPairs)
    prevBands.unionByName(incIndex)
      .select(lit("b").as("kind"), col("doc_id"), col("simhash"),
        col("band"), col("band_val"), lit(null).cast(idType).as("cluster"))
      .unionByName(labels.select(lit("l").as("kind"),
        col("id").as("doc_id"), lit(null).cast("long").as("simhash"),
        lit(null).cast("int").as("band"), lit(null).cast("long").as("band_val"),
        col("cluster")))
  }

  // --------------------------------------------------------------------------
  // n-gram Jaccard (exact, for candidate verification or small relations)
  // --------------------------------------------------------------------------

  /** Exact pairwise n-gram Jaccard for the given id pairs (a verification
    * primitive — feed it LSH candidates, not the full corpus). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    // shingle ONLY the docs that appear in a candidate pair — at corpus scale
    // the candidate set is orders of magnitude smaller than the corpus, and
    // shingling is the expensive projection. The id set is BROADCAST so the
    // corpus text never shuffles for the semi-join (a plain semi-join's
    // initial plan shuffles (id, text) on id — the exact payload-through-
    // exchange this pipeline is designed to avoid; PlanSpec asserts it).
    // One explode, not a union of two selects: the pairs subtree (the whole
    // candidate pipeline) is expensive and must evaluate once here, not twice.
    val neededIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("jid")).distinct()
    val sh = docs
      .join(broadcast(neededIds), col(idCol) === col("jid"), "left_semi")
      .select(col(idCol).as("jid"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("jid"), shinglesFromTokens(col("toks"), n).as("jsh"))
    pairs
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("jsh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("jsh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .drop("sh_a", "sh_b")
  }

  // --------------------------------------------------------------------------
  // Span-level verbatim dedup (the suffix-array analog)
  // --------------------------------------------------------------------------

  /** (doc_id, pos, window-hash) for every `window`-token sliding window of
    * every doc — the distributable stand-in for a corpus suffix array
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better": remove verbatim cross-document repeats, not just whole-doc
    * dups). Only the 32-char md5 and two longs ride any downstream exchange;
    * the window TEXT never leaves the map side. */
  private def slidingWindowHashes(docs: DataFrame, idCol: String,
                                  textCol: String, window: Int): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= window)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - window),
          p => md5(concat_ws(" ", slice(col("__toks"), p + 1, lit(window))))))
          .as(Seq("pos", "whash")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("whash"))

  /** Cheap 64-bit window hashes, values only — the frequency-prefilter pass
    * input (no md5 string, no id/pos: the exchange rows are 16 bytes).
    * [[graft.functions.TokenWindowHashes]] rolls them numerically — the
    * former string form (`xxhash64(concat_ws(slice(...)))` per window)
    * allocated ~window× the corpus text per pass and put GC at 9% of
    * executor time at the 100× bench point. */
  private def slidingWindowHash64s(docs: DataFrame, textCol: String,
                                   window: Int): DataFrame =
    docs
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= window)
      .select(explode(token_window_hashes(col("__toks"), window)).as("h64"))

  /** Above this many repeated hashes the driver-side Bloom filter stops
    * paying for itself (it would broadcast tens of MB to save an exchange
    * the corpus is going to pay anyway on such a degenerate input). */
  private val MaxBloomRepeatedHashes = 8L * 1000 * 1000

  /** Engage the span-dedup frequency prefilter above this much input (plan
    * statistics, no job): below it the direct distinct-doc count finishes
    * before the prefilter's extra corpus pass pays for itself (measured 4×
    * at sf0.1's 0.6 MB); above it the corpus-wide (md5, doc, pos) STRING
    * exchange IS the bill, and trading it for a 16-byte numeric count pass
    * wins. 32 MB, not the former 1 GB: the round-9 100× scale point caught
    * the direct plan going super-linear at ~47 MB of input (17× wall for
    * 10× data, 2.4 GB of spill through the string exchange) while the
    * prefiltered plan stays linear — the window count grows ~80× but the
    * Bloom-gated exchange carries only true repeats. */
  private val SpanPrefilterMinInputBytes = BigInt(1L << 25)

  /** The (id, pos, whash) windows that belong to a hash occurring in ≥2
    * DISTINCT documents — exactly.
    *
    * Two plans, same result (DedupSpec asserts equivalence):
    *  - DIRECT (small inputs): distinct (whash, doc) pairs → count ≥2 —
    *    one string exchange, no extra pass.
    *  - PREFILTERED (large inputs, mirrors
    *    [[CorpusFunctions.contaminationScoresBloom]]): singleton window
    *    hashes — the overwhelming majority of a healthy corpus — must not
    *    ride the distinct-doc-count exchange as (32-char md5, doc) string
    *    pairs. Pass 1 counts total occurrences per 64-BIT hash: a numeric,
    *    map-side-combinable exchange of 16-byte rows. The sparse survivors
    *    (any hash seen ≥2 times anywhere — a superset of cross-doc repeats)
    *    fold into a driver Bloom filter that gates the window stream INSIDE
    *    codegen — md5 is only computed for Bloom survivors — so only
    *    candidate windows reach the exact distinct-doc count. 64-bit
    *    collisions and same-doc repeats are ghosts the exact verify kills;
    *    degenerate all-repeated corpora fall back to the direct plan.
    *
    * `prefilter`: None = adaptive on plan-statistics input size;
    * Some(x) forces the choice (tests, known-shape pipelines). */
  private def crossDocRepeatedHits(docs: DataFrame, idCol: String,
                                   textCol: String, window: Int,
                                   prefilter: Option[Boolean]): DataFrame = {
    val wins = slidingWindowHashes(docs, idCol, textCol, window)
    val engage = prefilter.getOrElse {
      val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      // relations without computed stats (JDBC and other non-file sources)
      // report spark.sql.defaultSizeInBytes — Long.MaxValue by default — as
      // a broadcast-suppressing sentinel, not a size. Trusting it would
      // engage the extra corpus-wide count pass on arbitrarily small
      // inputs; treat it as UNKNOWN and take the direct plan (callers that
      // know their non-file input is huge pass prefilter = Some(true)).
      val unknown = bytes >=
        org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes
      !unknown && bytes > SpanPrefilterMinInputBytes
    }
    if (!engage)
      return wins.join(
        wins.select(col("whash"), col(idCol)).distinct()
          .groupBy(col("whash")).agg(count(lit(1)).as("__nd"))
          .filter(col("__nd") >= 2).select(col("whash")),
        Seq("whash"), "left_semi")
    // the sparse survivor set feeds TWO driver actions (count + Bloom
    // build) — persist it so the corpus-wide h64 pass runs once, not twice
    val repeated64 = slidingWindowHash64s(docs, textCol, window)
      .groupBy(col("h64")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("h64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRep = repeated64.count()
    val candidates = try {
      if (nRep == 0) wins.limit(0)
      else if (nRep > MaxBloomRepeatedHashes) wins
      else {
        val bf = repeated64.stat.bloomFilter("h64", nRep, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        val mightContain = (h64: org.apache.spark.sql.Column) =>
          org.apache.spark.sql.GraftShim.column(
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
              org.apache.spark.sql.catalyst.expressions.Literal(
                bos.toByteArray, org.apache.spark.sql.types.BinaryType),
              org.apache.spark.sql.GraftShim.expression(h64)))
        // gate on the NUMERIC rolling window hash — the same expression the
        // filter was built from — so neither the window STRING nor its md5
        // is materialized for anything but Bloom survivors (in a healthy
        // corpus that is almost every window skipped: the former
        // build-string-then-gate form was the dominant allocation source)
        docs
          .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
          .filter(size(col("__toks")) >= window)
          .select(col(idCol), col("__toks"),
            posexplode(token_window_hashes(col("__toks"), window))
              .as(Seq("pos", "h64")))
          .filter(mightContain(col("h64")))
          .select(col(idCol), col("pos").cast("long").as("pos"),
            md5(concat_ws(" ",
              slice(col("__toks"), col("pos") + 1, lit(window)))).as("whash"))
      }
    } finally repeated64.unpersist(blocking = false)
    // exact distinct-doc count over the candidate set only
    val repeatedExact = candidates.select(col("whash"), col(idCol)).distinct()
      .groupBy(col("whash")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2).select(col("whash"))
    candidates.join(repeatedExact, Seq("whash"), "left_semi")
  }

  /** Per-document statistics of cross-document VERBATIM repeats: for each doc
    * with at least one `window`-token span that also appears verbatim in
    * another doc, report total windows, repeated windows, maximal merged
    * spans, and the token count those spans cover. This is the measurement
    * half of span-level dedup — the corpus-health number a curation run
    * checks before deciding to scrub.
    *
    * Scale: #windows ≈ corpus token count — the same asymptotic bill a
    * suffix array pays, but embarrassingly parallel. Above the adaptive
    * input-size threshold the corpus-wide exchange is the frequency-
    * prefilter COUNT pass of [[crossDocRepeatedHits]]: 16-byte numeric rows
    * with map-side combine; md5 windows and (doc, pos) pairs shuffle only
    * for Bloom-surviving candidates. Span merging is one window function
    * over each doc's HIT positions only (repeated windows are sparse in a
    * healthy corpus).
    */
  def repeatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
                        window: Int = 8,
                        prefilter: Option[Boolean] = None): DataFrame = {
    require(window > 0, "window must be positive")
    import org.apache.spark.sql.expressions.Window
    val hits = crossDocRepeatedHits(docs, idCol, textCol, window, prefilter)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // a hit at pos merges into the previous span when it starts within
    // `window` tokens of it (overlap or adjacency)
    val spans = hits
      .withColumn("__new", when(col("pos") - lag(col("pos"), 1).over(byDoc)
        <= window, lit(0)).otherwise(lit(1)))
      .withColumn("__span", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__span"))
      .agg(count(lit(1)).as("__n"),
        (max(col("pos")) - min(col("pos")) + window).as("__cov"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_repeated_windows"),
        count(lit(1)).as("n_spans"),
        sum(col("__cov")).as("covered_tokens"))
    // n_windows is arithmetic on the token count — a tokenize-only
    // projection, NOT a third pass through the per-window md5 pipeline
    // (the hashing subtree already evaluates twice: the repeated-hash
    // build side and the probe side)
    val total = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= window)
      .select(col(idCol),
        (size(col("__toks")) - window + 1).cast("long").as("n_windows"))
    spans.join(total, Seq(idCol))
      .select(col(idCol), col("n_windows"), col("n_repeated_windows"),
        col("n_spans"), col("covered_tokens"))
  }

  /** The scrub half: remove every cross-document repeated span from every
    * document, keeping the (tokenizer-normalized) remainder. Docs without
    * repeats pass through with their full token stream; a doc whose tokens
    * are ALL covered survives as an empty string (the caller filters on
    * `n_tokens_kept` if it wants them gone — dropping is a policy choice).
    *
    * The repeated-start positions come back to each doc as one
    * `collect_list` array (bounded by the doc's own length), and the cut is
    * a codegen'd array filter — no per-token join. */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                         window: Int = 8,
                         prefilter: Option[Boolean] = None): DataFrame = {
    require(window > 0, "window must be positive")
    val hits = crossDocRepeatedHits(docs, idCol, textCol, window, prefilter)
    scrubHitWindows(docs, hits, idCol, textCol, window)
  }

  /** Cut every window in `hits` (doc_id, pos) out of its document, keeping
    * the tokenizer-normalized remainder for ALL docs. Shared by
    * [[scrubRepeatedSpans]] (hits = cross-doc repeats) and
    * [[scrubContaminatedSpans]] (hits = benchmark overlaps). */
  private def scrubHitWindows(docs: DataFrame, hits: DataFrame, idCol: String,
                              textCol: String, window: Int): DataFrame = {
    val starts = hits
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("__starts"))
    docs
      .join(starts, Seq(idCol), "left")
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"),
        coalesce(col("__starts"), array().cast("array<long>")).as("__starts"))
      // keep the token at 0-based index i unless some hit window starting
      // at s covers it: s <= i < s+window
      .select(col(idCol),
        filter(col("__toks"), (t, i) => !exists(col("__starts"),
          s => s <= i && i < s + window)).as("__kept"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as("clean_text"),
        size(col("__kept")).cast("long").as("n_tokens_kept"))
  }

  /** SURGICAL benchmark decontamination: cut the exact spans a document
    * shares verbatim with the benchmark set, keeping the rest of the doc —
    * the span-level complement of `CorpusFunctions.dropContaminated`
    * (which drops whole documents over an overlap threshold). Standard
    * eval-hygiene practice when benchmark sentences are quoted inside
    * otherwise-good documents: dropping the doc wastes its clean tokens,
    * keeping it verbatim leaks the benchmark.
    *
    * Plan shape: the corpus windows once ([[slidingWindowHashes]]); the
    * benchmark's DISTINCT window hashes form the (much smaller) build side
    * of a semi-join, so only 32-char hashes and (doc, pos) longs ride any
    * exchange — corpus text never shuffles. */
  def scrubContaminatedSpans(docs: DataFrame, benchmark: DataFrame,
                             idCol: String, textCol: String,
                             window: Int = 8): DataFrame = {
    require(window > 0, "window must be positive")
    val benchHashes = slidingWindowHashes(
      benchmark.select(lit(0L).as(idCol), col(textCol)), idCol, textCol, window)
      .select(col("whash")).distinct()
    val hits = slidingWindowHashes(docs, idCol, textCol, window)
      .join(benchHashes, Seq("whash"), "left_semi")
    scrubHitWindows(docs, hits, idCol, textCol, window)
  }
}
