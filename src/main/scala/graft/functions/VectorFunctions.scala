package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an IVF (inverted-file)
  * variant as the 100 TB scale path. Dot products are built from
  * `zip_with`/`aggregate` higher-order functions — no UDF, vectors never leave
  * Tungsten rows.
  */
object VectorFunctions {

  /** Dot product of two array<float|double> columns (accumulated in double).
    * A single codegen'd pass ([[graft.functions.DotProd]]) — the
    * `aggregate(zip_with(...))` composition it replaces evaluated interpreted
    * lambdas per element and built an intermediate products array. */
  def dot(a: Column, b: Column): Column = graft.functions.exprs.dot_prod(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: one fused codegen'd pass over both arrays
    * ([[graft.functions.CosineSim]]); bit-identical to
    * `dot(a,b)/(norm(a)*norm(b))` (same accumulation order) at a third of
    * the array traffic. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.exprs.cosine_sim(a, b)

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Plan: broadcast the (small) query set against the corpus
    * — a broadcast nested-loop with a narrow projection, then a per-query
    * top-k window. The corpus is scanned ONCE regardless of query count; at
    * 100 TB this is the map-side-only pattern (no corpus shuffle except the
    * final per-query k-row top-k). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id",
                     excludeSelf: Boolean = true): DataFrame =
    broadcastScanTopK(corpus, queries, k, idCol, vecCol, queryIdCol,
      excludeSelf, band = None)

  /** The ONE broadcast-query corpus scan behind [[bruteForceTopK]] and
    * [[hardNegatives]]: scan the corpus once against the broadcast query
    * set, optionally keep only cosines in [lo, hi), rank per query. */
  private def broadcastScanTopK(corpus: DataFrame, queries: DataFrame,
                                k: Int, idCol: String, vecCol: String,
                                queryIdCol: String, excludeSelf: Boolean,
                                band: Option[(Double, Double)]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = broadcast(queries.select(col(queryIdCol),
      col(vecCol).as("__qvec")))
    // excludeSelf drops the id-equal pair — correct when the queries ARE
    // corpus rows (self-similarity search); set false when query ids live in
    // a DIFFERENT id space, or an unrelated corpus vector that happens to
    // share the number would silently vanish from its top-k
    val joinCond = if (excludeSelf) col(queryIdCol) =!= col(idCol) else lit(true)
    val scored0 = corpus.select(col(idCol), col(vecCol))
      .join(q, joinCond)
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val scored = band.fold(scored0) { case (lo, hi) =>
      scored0.filter(col("cosine") >= lo && col("cosine") < hi) }
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("cosine"))
  }

  /** Per-DIMENSION embedding statistics — the embedding-health report run
    * before trusting a vector corpus (collapsed dimensions → mean ≈ const
    * with near-zero variance; scale drift across embedding-model versions
    * → shifted min/max; a dead projection head → one dim's variance
    * dwarfing the rest). Components are quantized ONCE to the 1e-6
    * integer grid (the [[lloydKmeansExact]] exactness convention), so n /
    * sums are exact integers and mean/variance/extremes are deterministic
    * IEEE arithmetic over them — fully oracle-replayable.
    *
    * Scale: one posexplode + a partial-aggregated groupBy(dim) — the
    * exchange carries dim-cardinality partial sums, never vectors; output
    * is dim rows. Null, width-mismatched, or null-COMPONENT vectors are
    * dropped whole (the [[randomProjection]] convention — a partly-null
    * vector is exactly the corruption this report exists to flag, so it
    * must not be silently averaged into n while the sums skip it). */
  /** The reference vector width of a corpus: the MAJORITY width, ties to
    * the wider — 0 for empty/all-null input. ONE definition for every
    * operator that probes a width before filtering to it: a first-row
    * probe would make results depend on scan order whenever a corrupt
    * minority width is present. */
  /** Deterministic Rademacher plane sign: +1 when the first hex digit of
    * md5("p_d") is below 8, else −1 — mirrored literally by the DuckDB
    * oracles as substr(md5(p || '_' || d), 1, 1) against '01234567'. ONE
    * definition shared by the JL projection and the cosine-LSH banding so
    * the oracle SQL can never desynchronize from half of it. */
  private def rademacherSign(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${p}_${d}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((hex(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  private def majorityDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("__d"))
      .filter(col("__d") > 0)
      .groupBy(col("__d")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__d").desc).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)

  def embeddingDimStats(df: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dim = majorityDim(df, vecCol)
    val quantized = df
      .filter(size(col(vecCol)) === dim &&
        !exists(col(vecCol), x => x.isNull))
      .select(posexplode(transform(col(vecCol),
        x => round(x.cast("double") * lit(1000000.0)).cast("long")))
        .as(Seq("dim", "v")))
    quantized
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("__s"),
        sum((col("v") * col("v")).cast(dec)).as("__ss"),
        min(col("v")).as("__mn"), max(col("v")).as("__mx"))
      // mean = (s/1e6)/n, var = (ss/1e12)/n − mean² — parenthesization is
      // the cross-engine contract (each op is one IEEE step over values
      // both engines derive from the same exact integers)
      .select(col("dim"), col("n"),
        (col("__s").cast("double") / lit(1000000.0) /
          col("n").cast("double")).as("mean"),
        ((col("__ss").cast("double") / lit(1000000000000.0) /
          col("n").cast("double")) -
          (col("__s").cast("double") / lit(1000000.0) /
            col("n").cast("double")) *
          (col("__s").cast("double") / lit(1000000.0) /
            col("n").cast("double"))).as("variance"),
        (col("__mn").cast("double") / lit(1000000.0)).as("min_v"),
        (col("__mx").cast("double") / lit(1000000.0)).as("max_v"))
  }

  /** Johnson–Lindenstrauss random projection: reduce `vecCol` from its
    * native dimension to `outDim` with a DETERMINISTIC Rademacher matrix
    * (entries ±1/√outDim derived from md5, the same plane rule as
    * [[cosineNearDuplicatesLsh]]) — the standard pre-step before clustering
    * or ANN when the native embedding width makes per-row arithmetic the
    * bottleneck (768-d → 64-d cuts every downstream cosine 12×, preserving
    * pairwise distances to 1±ε by the JL lemma with database-friendly ±1
    * entries, Achlioptas 2003).
    *
    * Scale: a pure rowwise projection — the matrix rides the plan as ONE
    * literal array<array<double>>, each output component is a single fused
    * [[graft.functions.DotProd]] pass, and the operator introduces ZERO
    * shuffles; at 100 TB it pipelines inside whole-stage codegen over the
    * scan. Determinism makes the projection engine-portable (full value
    * oracle) and re-runnable: growing the corpus never changes an existing
    * row's reduced vector, so persisted downstream indexes stay valid.
    */
  def randomProjection(df: DataFrame, outDim: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       outCol: String = "reduced"): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val dim = majorityDim(df, vecCol)
    if (dim == 0) // empty input (or all-null vectors): nothing to project
      return df.select(col(idCol),
        typedlit(Seq.empty[Double]).as(outCol)).limit(0)
    val planes: Seq[Seq[Double]] =
      (0 until outDim).map(p => (0 until dim).map(d => rademacherSign(p, d)))
    // √outDim of a positive integer is correctly-rounded IEEE in both
    // engines, so component values replay bit-for-bit in the oracle
    val scale = sqrt(lit(outDim.toDouble))
    // rows whose vector is NULL, a DIFFERENT width (mixed upstream
    // embedding models), or carries NULL components would silently
    // project to all-NULL components (DotProd's null contract) — drop
    // them instead, the decode-ops convention (same predicate as
    // embeddingDimStats)
    df.filter(size(col(vecCol)) === dim &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol),
        transform(typedlit(planes), pl => dot(col(vecCol), pl) / scale)
          .as(outCol))
  }

  /** Hard-negative mining for contrastive training: per query, the k MOST
    * similar corpus vectors whose cosine falls in [simLo, simHi) — close
    * enough to be informative negatives, strictly below the near-duplicate
    * band where a "negative" would actually be a positive (the standard
    * dense-retrieval negative-sampling rule, cf. Karpukhin 2020 / SNCSE).
    *
    * Scale: same map-side-only shape as [[bruteForceTopK]] — broadcast the
    * query set, scan the corpus ONCE, but the band filter prunes rows
    * BEFORE the per-query top-k window, so the rank exchange carries only
    * in-band candidates (for a tight band, a tiny fraction of the corpus)
    * rather than every (query, corpus) score. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    simLo: Double, simHi: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    queryIdCol: String = "query_id",
                    excludeSelf: Boolean = true): DataFrame = {
    require(simLo < simHi, s"band must be non-empty: [$simLo, $simHi)")
    broadcastScanTopK(corpus, queries, k, idCol, vecCol, queryIdCol,
      excludeSelf, band = Some((simLo, simHi)))
  }

  /** Contrastive training triplets: per anchor, the single best POSITIVE
    * (nearest neighbor with cosine ≥ posMin — same-content evidence) paired
    * with its k hard NEGATIVES from the [negLo, negHi) band. The
    * dense-retrieval training-set builder (anchor, positive, hard-negative
    * rows ready for an InfoNCE/triplet loss); anchors with no qualifying
    * positive drop out — a triplet without a positive teaches nothing.
    *
    * Scale: two band-filtered passes of the SAME broadcast-query corpus
    * scan ([[broadcastScanTopK]]) + one join keyed on the (tiny) anchor
    * set. Corpus text/vectors never shuffle. */
  def contrastiveTriplets(corpus: DataFrame, anchors: DataFrame, k: Int,
                          posMin: Double, negLo: Double, negHi: Double,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          queryIdCol: String = "query_id",
                          excludeSelf: Boolean = true): DataFrame = {
    require(negLo < negHi, s"negative band [$negLo, $negHi) is empty")
    require(posMin <= 1.0, s"posMin $posMin > 1 admits no positive")
    require(negHi <= posMin,
      s"negative band [$negLo, $negHi) must sit below posMin $posMin " +
        "(an overlap would let one neighbor be both positive and negative)")
    val pos = broadcastScanTopK(corpus, anchors, k = 1, idCol, vecCol,
      queryIdCol, excludeSelf, band = Some((posMin, 1.0000001)))
      .select(col(queryIdCol), col("neighbor_id").as("pos_id"),
        col("cosine").as("pos_cos"))
    val neg = broadcastScanTopK(corpus, anchors, k, idCol, vecCol,
      queryIdCol, excludeSelf, band = Some((negLo, negHi)))
      .select(col(queryIdCol), col("neighbor_id").as("neg_id"),
        col("rank").as("neg_rank"), col("cosine").as("neg_cos"))
    pos.join(neg, Seq(queryIdCol))
  }

  // --------------------------------------------------------------------------
  // IVF — inverted-file index (the scale path)
  // --------------------------------------------------------------------------

  /** IVF index state: centroid vectors + corpus partitioned by nearest
    * centroid. Train = one k-means-style assignment pass over a deterministic
    * sample (no iterative driver loop — "good enough" coarse quantizer;
    * cf. FAISS IVF-Flat). */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Wall-clock seconds of the most recent [[buildIvf]] KMeans fit — bench
    * instrumentation so `q_ann_ivf_topk` cost can be attributed to training
    * vs probe (the query's wall time has drifted between rounds; this
    * separates coarse-quantizer training variance from plan regressions). */
  @volatile var lastTrainSec: Double = -1.0

  /** Wall-clock seconds of the most recent [[trainPq]] fit / [[writePq]]
    * codes materialization — same bench-attribution purpose as
    * [[lastTrainSec]]: `q_ann_pq_topk` runs train→encode→persist→probe
    * end-to-end, and without these its wall time is unattributable. */
  @volatile var lastPqTrainSec: Double = -1.0
  @volatile var lastPqEncodeSec: Double = -1.0

  /** Nearest-centroid id: a single `aggregate` fold over ONE literal array of
    * (cid, vec) structs — O(nlist) data in a single Literal node, O(1)
    * expression-tree depth, each cosine computed once. (The previous
    * formulation — an O(nlist)-deep `when`-chain with every cosine computed
    * twice — blows up codegen at nlist ≥ ~1k.) */
  private def nearestCentroid(vec: Column, centroids: Seq[(Int, Seq[Float])]): Column =
    // float→double widening is exact, so the double fold is bit-identical
    nearestCentroidD(vec, centroids.map { case (i, v) =>
      (i, v.map(_.toDouble)) })

  /** Build an IVF index: train `nlist` coarse-quantizer centroids with Spark
    * ML KMeans (cosine distance, bounded iterations — distributed Lloyd, the
    * FAISS IVF training analog), then assign each corpus vector with one
    * narrow projection against the broadcast centroid literal.
    *
    * Scale: training NEVER sees the full corpus — a coarse quantizer needs a
    * bounded sample (FAISS guidance is tens-to-hundreds of points per
    * centroid; `maxTrainPoints` defaults to 256×nlist capped at 256k), and
    * the sample is coalesced to partitions sized to the POINT COUNT so each
    * Lloyd pass costs a handful of tasks instead of a full-width job over
    * near-empty partitions. The centroid set (nlist × dim doubles) is
    * driver/broadcast-sized by design. For a persisted index, write
    * `assigned` partitioned BY centroid_id so queries prune to nprobe cells. */
  def buildIvf(corpus: DataFrame, nlist: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               maxIter: Int = 10, trainFraction: Double = 1.0,
               maxTrainPoints: Option[Int] = None): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train0 = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val cap = maxTrainPoints.getOrElse(math.min(256 * nlist, 262144)).toLong
    val total = train0.count()
    val frac = math.min(trainFraction,
      if (total > cap) cap.toDouble / total else 1.0)
    val sampled = if (frac < 1.0)
      train0.sample(withReplacement = false, frac, seed = 42L) else train0
    val expectedPoints = math.max(1L, (total * frac).toLong)
    val parts = math.max(1L, expectedPoints / 16384L).toInt
    val train = sampled.coalesce(parts).cache()
    val t0 = System.nanoTime()
    val model =
      try new KMeans()
        .setK(nlist).setSeed(42L).setMaxIter(maxIter)
        .setDistanceMeasure("cosine")
        .fit(train)
      finally {
        train.unpersist()
        lastTrainSec = (System.nanoTime() - t0) / 1e9
      }
    val centroids: Seq[(Int, Seq[Float])] = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq.map(_.toFloat)) }.toSeq
    indexFromCentroids(corpus, centroids, vecCol)
  }

  /** Assemble an [[IvfIndex]] from explicit centroids: the centroid table
    * plus one nearest-centroid assignment pass over the corpus. */
  private def indexFromCentroids(corpus: DataFrame,
                                 centroids: Seq[(Int, Seq[Float])],
                                 vecCol: String): IvfIndex = {
    val centroidsDf = corpus.sparkSession.createDataFrame(
      centroids.map { case (i, v) => org.apache.spark.sql.Row(i, v) }.toList.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(vecCol,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val assigned = corpus.withColumn("centroid_id",
      nearestCentroid(col(vecCol), centroids))
    IvfIndex(centroidsDf, assigned)
  }

  /** Argmax-cosine assignment against DOUBLE centroids — the
    * [[nearestCentroid]] fold with the precision [[lloydKmeansExact]]'s
    * 1e-6-grid centroids need (floats would re-round them). */
  private def nearestCentroidD(vec: Column,
                               centroids: Seq[(Int, Seq[Double])]): Column = {
    val centLit = typedlit(centroids)
    aggregate(centLit,
      struct(lit(-1).as("cid"), lit(-2.0).as("sim")),
      (acc, c) => {
        val s = cosine(vec, c.getField("_2"))
        when(s > acc.getField("sim"),
          struct(c.getField("_1").as("cid"), s.as("sim"))).otherwise(acc)
      },
      acc => acc.getField("cid"))
  }

  /** Result of [[lloydKmeansExact]]: per-cluster fixed-point centroids
    * (scale 1e-6: real value = cq/1e6) and the final assignment (the one
    * that produced those centroids). */
  final case class LloydResult(centroidsQ: IndexedSeq[Array[Long]],
                               assigned: DataFrame)

  /** Retrieval-quality evaluation of one ranking against a reference
    * ranking — the in-engine recall/MRR/nDCG report every ANN deployment
    * runs before trusting an index (the spec-only recall checks, promoted
    * to a first-class operator): per query, `hits` = overlap of the
    * system's list with the reference list, `recall` = hits/|reference|,
    * `rr` = 1/rank of the first reference item in the system list (0 if
    * absent), `dcg` = Σ over hits of 1/log₂(rank+1), and `ndcg` = dcg
    * normalized by the ideal DCG of ALL |reference| items in the top
    * positions. Normalizing by the full reference (not min(|ref|,
    * |system|)) is deliberate: an ideal truncated at the system's own
    * list length would REWARD returning fewer results (one hit at rank 1
    * in a 1-row list would score a perfect 1.0), making the metric
    * gameable by truncation — here a short list simply cannot reach the
    * ideal. recall/rr are quotients of exact integers; each DCG gain
    * rounds to a 6-decimal DECIMAL before the exact sum (the LM-score
    * technique), so dcg and the ndcg quotient replay bit-for-bit
    * cross-engine.
    *
    * Scale: operates on already-top-k candidate LISTS (query-count-scale
    * relations); one semi-join + three aggregations (the ideal-DCG
    * explode is ≤ k rows per query), the corpora behind the rankings are
    * never touched. */
  def rankingEval(system: DataFrame, reference: DataFrame,
                  queryCol: String = "query_id",
                  idCol: String = "neighbor_id",
                  rankCol: String = "rank"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    def gainOf(pos: Column): Column =
      round(lit(1.0) / log2(pos.cast("double") + 1.0), 6).cast(dec)
    val ref = reference.select(col(queryCol), col(idCol))
    val refN = ref.groupBy(col(queryCol)).agg(count(lit(1)).as("n_ref"))
    val hits = system.join(ref, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("hits"), min(col(rankCol)).as("__fr"),
        sum(gainOf(col(rankCol))).as("__dcg"))
    // ideal DCG: all n_ref items in the top positions (n_ref >= 1 by
    // construction of refN, so the sequence is never degenerate)
    val idcg = refN
      .select(col(queryCol),
        explode(sequence(lit(1L), col("n_ref"))).as("__i"))
      .groupBy(col(queryCol)).agg(sum(gainOf(col("__i"))).as("__idcg"))
    refN.join(hits, Seq(queryCol), "left")
      .join(idcg, Seq(queryCol))
      .select(col(queryCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("n_ref"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_ref").cast("double")).as("recall"),
        when(col("__fr").isNotNull,
          lit(1.0) / col("__fr").cast("double")).otherwise(lit(0.0)).as("rr"),
        coalesce(col("__dcg").cast("double"), lit(0.0)).as("dcg"),
        (coalesce(col("__dcg"), lit(0).cast(dec)).cast("double") /
          col("__idcg").cast("double")).as("ndcg"))
  }

  /** Deterministic Lloyd K-MEANS whose every round replays EXACTLY in
    * another engine — the constructive refutation of "Lloyd centroid
    * averages accumulate in engine-specific order": seeded init (md5-
    * smallest k vectors, the repo's sampling convention), argmax-cosine
    * assignment with ties toward the lower cluster id, and a centroid
    * update that never touches order-sensitive float accumulation —
    * member components are quantized ONCE to the 1e-6 integer grid, each
    * per-(cluster,dim) sum is an exact integer, and the new centroid is
    * the half-away-rounded integer division sum/|cluster| (empty clusters
    * keep their centroid). Training is a pure function of the input SET
    * (repartition-invariant, VectorSpec) and `q_kmeans_lloyd` replays all
    * rounds in DuckDB bit-for-bit. The 1e-6 centroid grid costs ~1e-6
    * relative placement error per round — noise next to Lloyd's own local
    * optimum, and the price of exactness.
    *
    * Distributed shape per round (the textbook one): centroids ride the
    * plan as a k×dim literal, assignment is rowwise (zero shuffle), the
    * update is one groupBy(cluster, dim) partial-agg exchange of k·dim
    * rows per partition, and the driver touches k·dim integer sums —
    * same index-build class as IVF/PQ training. */
  def lloydKmeansExact(corpus: DataFrame, k: Int, iters: Int = 3,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): LloydResult = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters must be >= 1")
    val base = corpus.select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__v"),
        transform(col(vecCol),
          x => round(x.cast("double") * lit(1e6)).cast("long")).as("__xq"))
      .persist()
    try {
      val init = base.orderBy(md5(col(idCol).cast("string")), col(idCol))
        .limit(k).select(col("__xq")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(init.nonEmpty, "empty corpus")
      val dim = init.head.length
      // a null or dimension-mismatched vector would assign to no centroid
      // (cosine null → the fold's -1 sentinel) and corrupt the update —
      // refuse loudly up front instead
      val bad = base.filter(col("__v").isNull || size(col("__v")) =!= dim)
        .count()
      require(bad == 0,
        s"$bad corpus rows have null or non-$dim-dimensional vectors")
      var cents: Array[Array[Long]] = init
      var assigned: DataFrame = null
      for (_ <- 1 to iters) {
        val centD: Seq[(Int, Seq[Double])] = cents.toSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq.map(_ / 1e6)) }
        assigned = base.withColumn("cluster",
          nearestCentroidD(col("__v"), centD))
        val next = cents.map(_.clone())
        assigned
          .select(col("cluster"), posexplode(col("__xq")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
          .foreach { r =>
            val (cl, d) = (r.getInt(0), r.getInt(1))
            require(cl >= 0 && cl < k,
              s"row assigned to no centroid (cluster $cl) — null cosine?")
            val (s, n) = (r.getLong(2), r.getLong(3))
            val mag = (math.abs(s) + n / 2) / n // floor of positives = exact
            next(cl)(d) = if (s >= 0) mag else -mag
          }
        cents = next
      }
      LloydResult(cents.toIndexedSeq,
        assigned.select(col(idCol), col("cluster")))
    } finally base.unpersist()
  }

  /** Deterministic corpus-seeded coarse quantizer: the `nlist` corpus
    * vectors with the smallest `md5(cast(id as string))` ARE the centroids
    * (the repo's engine-portable sampling convention, cf. [[assignLeaders]]),
    * in md5 order so ties in the assignment fold break toward the lower
    * centroid id. A FAISS-style "caller-supplied coarse quantizer": no Lloyd
    * rounds means training is one TakeOrdered (k rows to the driver) and the
    * whole pipeline — selection, assignment argmax, probe — is
    * IEEE-replayable in another engine, so the driver query carries a FULL
    * value oracle. (Spark ML KMeans Lloyd rounds are not replayable — their
    * centroid averages accumulate in engine-specific order; when replayable
    * Lloyd is wanted, [[lloydKmeansExact]] quantizes the accumulation and
    * IS oracle-matched.) Recall trade vs the KMeans quantizer is measured
    * in VectorSpec. */
  def buildIvfSeeded(corpus: DataFrame, nlist: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): IvfIndex = {
    val t0 = System.nanoTime()
    val rows = corpus.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist).select(col(vecCol)).collect()
    require(rows.nonEmpty, "empty corpus")
    val centroids: Seq[(Int, Seq[Float])] = rows.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0)) }.toSeq
    lastTrainSec = (System.nanoTime() - t0) / 1e9
    indexFromCentroids(corpus, centroids, vecCol)
  }

  /** Persist an IVF index: the assigned corpus written PARTITIONED BY
    * centroid_id (so a probe reads only its nprobe cell directories —
    * partition pruning proven in VectorSpec) plus the centroid table. */
  def writeIvf(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("centroid_id").parquet(s"$path/cells")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reload a persisted IVF index. */
  def readIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      centroids = spark.read.parquet(s"$path/centroids"),
      assigned = spark.read.parquet(s"$path/cells"))

  /** Assign an increment against an EXISTING index's centroids (the
    * index's layout contract — fixed, like [[pickLeaders]]' fixed leader
    * sets): one broadcast-literal pass over the increment only. Returns the
    * increment's cell rows. */
  def assignIvf(index: IvfIndex, incoming: DataFrame,
                vecCol: String = "embedding"): DataFrame = {
    // sort by centroid id after the collect: nearestCentroid breaks
    // exact-cosine ties by LITERAL POSITION, and a reloaded centroid
    // table's row order is whatever the parquet split produced — unsorted,
    // a tie between duplicate seed vectors could assign differently than
    // the original build (and than the oracle's `centroid_id ASC` rule)
    val centroids = index.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    incoming.withColumn("centroid_id",
      nearestCentroid(col(vecCol), centroids))
  }

  /** INCREMENTAL IVF maintenance — the persisted-index analog of the band
    * index / label side-table folds: new vectors assign against the
    * existing centroids and APPEND into their cell partitions; the corpus
    * is never re-assigned, untouched cells are never rewritten, and a
    * probe of the grown index equals a probe of an index built whole with
    * the same centroids (VectorSpec). Centroid drift under a changing
    * distribution is the fixed-quantizer trade — re-train + rewrite when
    * recall SLOs say so. */
  def appendIvf(spark: org.apache.spark.sql.SparkSession, path: String,
                incoming: DataFrame, vecCol: String = "embedding"): Unit = {
    val idx = IvfIndex(
      centroids = spark.read.parquet(s"$path/centroids"),
      assigned = spark.emptyDataFrame)
    assignIvf(idx, incoming, vecCol)
      .write.mode("append").partitionBy("centroid_id").parquet(s"$path/cells")
  }

  /** IVF top-k: probe only the `nprobe` nearest centroid cells per query, then
    * exact cosine within the probed cells. At scale: corpus pre-partitioned
    * (and persistable, partitioned BY centroid_id on disk → partition pruning
    * turns each query into a few-cell read instead of a full scan). */
  def ivfTopK(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id",
              excludeSelf: Boolean = true): DataFrame = {
    val centroids = index.centroids.collect().map(r =>
      (r.getInt(0), r.getSeq[Float](1))).toSeq
    // per query: scores to every centroid → keep nprobe best cells.
    // One typedlit literal exploded to rows, ONE cosine expression evaluated
    // per (query, centroid) row — not nlist cosine expression nodes.
    val qCells = queries.select(col(queryIdCol), col(vecCol).as("__qvec"))
      .select(col(queryIdCol), col("__qvec"), explode(typedlit(centroids)).as("c"))
      .select(col(queryIdCol), col("__qvec"),
        col("c._1").as("centroid_id"),
        cosine(col("__qvec"), col("c._2")).as("csim"))
    val wCell = Window.partitionBy(col(queryIdCol))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probed = qCells.withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= nprobe)
      .select(col(queryIdCol), col("__qvec"), col("centroid_id"))

    val scored = index.assigned
      .join(broadcast(probed), Seq("centroid_id"))
      // see bruteForceTopK: only drop id-equal pairs when the ids share a space
      .filter(if (excludeSelf) col(queryIdCol) =!= col(idCol) else lit(true))
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  // --------------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011) — compressed-code ANN
  // --------------------------------------------------------------------------

  /** Trained PQ codebooks: `m` subspaces of `subDim` dims; per subspace a
    * list of (code, centroid, ||centroid||²). Vectors are unit-normalized
    * before quantization, so the reconstructed inner product approximates
    * cosine. */
  final case class PqModel(m: Int, subDim: Int,
                           codebooks: Seq[Seq[(Int, Seq[Float], Double)]])

  /** Unit-normalize an array<float|double> column (zero vectors pass
    * through unscaled rather than dividing by zero). */
  private def unitNorm(vec: Column): Column = {
    val n = norm(vec)
    when(n > 0, transform(vec, x => x.cast("double") / n))
      .otherwise(transform(vec, x => x.cast("double")))
  }

  /** Train PQ codebooks: KMeans (euclidean — PQ quantizes subvectors by L2)
    * per subspace over a bounded deterministic sample of unit-normalized
    * vectors. Like [[buildIvf]]: training never sees the full corpus, the
    * model is driver-sized by design (m × k × subDim floats). */
  def trainPq(corpus: DataFrame, m: Int = 8, k: Int = 16,
              vecCol: String = "embedding", maxIter: Int = 10,
              maxTrainPoints: Int = 65536): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // MAJORITY width, not a first-row probe: a leading null embedding
    // would NPE, and on mixed-width corpora the chosen dim (hence every
    // subspace slice) would depend on scan order — the exact hazard
    // majorityDim exists for
    val dim = majorityDim(corpus, vecCol)
    if (dim == 0) throw new IllegalArgumentException("empty corpus")
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val tTrain0 = System.nanoTime()
    // train on majority-width, component-complete vectors only (the same
    // eligibility the encode side enforces; stragglers would NPE the
    // KMeans assembler or skew a subspace with nulls)
    val eligible = corpus.filter(size(col(vecCol)) === dim &&
      !exists(col(vecCol), x => x.isNull))
    val total = eligible.count()
    val frac = if (total > maxTrainPoints) maxTrainPoints.toDouble / total else 1.0
    val base = eligible.select(unitNorm(col(vecCol)).as("__u"))
    val sampled = (if (frac < 1.0)
      base.sample(withReplacement = false, frac, seed = 42L) else base)
      .coalesce(math.max(1, (total * frac / 16384L).toInt)).cache()
    try {
      // the m sub-quantizer fits are independent Spark jobs over the same
      // cached sample — run them concurrently (job submission is
      // thread-safe) instead of paying m sequential job latencies
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val books = Await.result(Future.sequence((0 until m).map { j =>
        Future {
          val sub = sampled.select(array_to_vector(
            slice(col("__u"), j * subDim + 1, subDim)).as("features"))
          // random init (seeded): k-means|| costs several extra distributed
          // rounds PER SUB-QUANTIZER for little gain at PQ's tiny k — the
          // standard PQ training choice
          val model = new KMeans().setK(k).setSeed(42L + j).setMaxIter(maxIter)
            .setInitMode("random")
            .fit(sub)
          model.clusterCenters.zipWithIndex.map { case (c, i) =>
            val arr = c.toArray
            (i, arr.toSeq.map(_.toFloat), arr.map(x => x * x).sum)
          }.toSeq
        }
      }), Duration.Inf)
      lastPqTrainSec = (System.nanoTime() - tTrain0) / 1e9
      PqModel(m, subDim, books)
    } finally { sampled.unpersist(); () }
  }

  /** Deterministic corpus-seeded PQ codebooks: the `k` vectors with the
    * smallest `md5(cast(id as string))` are unit-normalized and sliced into
    * the `m` sub-codebooks (code = position in md5 order). Like
    * [[buildIvfSeeded]], this trades Lloyd refinement for full cross-engine
    * replayability — every arithmetic step (the 1/√n² reciprocal-multiply
    * normalization mirroring [[encodePq]], the float rounding of stored
    * centroids, the ‖c‖² sums) is IEEE-deterministic, so the PQ
    * encode→ADC→rerank pipeline carries a full value oracle. Approximation
    * quality vs KMeans-trained codebooks is measured in VectorSpec. */
  def trainPqSeeded(corpus: DataFrame, m: Int = 8, k: Int = 16,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): PqModel = {
    val t0 = System.nanoTime()
    val rows = corpus.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("__v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    // EXACTLY encodePq's normalization: multiply by the reciprocal of the
    // norm (one extra rounding vs dividing — the oracle replays this form)
    val units = rows.map { v =>
      var n2 = 0.0
      var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
      v.map(_ * inv)
    }
    val books = (0 until m).map { j =>
      units.zipWithIndex.map { case (u, i) =>
        val sub = u.slice(j * subDim, (j + 1) * subDim).map(_.toFloat)
        (i, sub.toSeq, sub.map(x => x.toDouble * x.toDouble).sum)
      }.toSeq
    }
    lastPqTrainSec = (System.nanoTime() - t0) / 1e9
    PqModel(m, subDim, books)
  }

  /** Encode the corpus: each vector becomes `m` small codes (nearest
    * codebook centroid per subspace, argmin ‖x−c‖² = argmax 2·x·c − ‖c‖²).
    * The codes column is the PERSISTED index: m bytes of information per
    * vector instead of dim floats (32× compression at dim=64/m=8) — at
    * 100 TB the ANN scan reads codes only; raw vectors are touched just
    * for the rerank candidates.
    *
    * Implemented as a tight per-partition loop against the driver-side
    * model (the FAISS encode shape) rather than a fold-over-literal
    * expression: lambda-bound subtrees re-evaluate per fold STEP, so the
    * expression form recomputed the full-vector normalization m×k times
    * per row (measured ~6 ms/row — three orders over the loop). */
  def encodePq(model: PqModel, corpus: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // codebooks as primitive arrays for the hot loop
    val books: Array[Array[Array[Double]]] = model.codebooks.map(
      _.sortBy(_._1).map(_._2.map(_.toDouble).toArray).toArray).toArray
    val cc: Array[Array[Double]] = model.codebooks.map(
      _.sortBy(_._1).map(_._3).toArray).toArray
    val (m, subDim) = (model.m, model.subDim)
    // eligibility before the typed map: a null id breaks the non-nullable
    // tuple encoder and a null/short vector NPEs the per-partition loop —
    // stragglers drop (the randomProjection convention), they don't kill
    // the whole encode job
    corpus.filter(col(idCol).isNotNull &&
        size(col(vecCol)) === m * subDim &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .as[(Long, Array[Double])]
      .mapPartitions(it => it.map { case (id, v) =>
        var n2 = 0.0
        var i = 0
        while (i < v.length) { n2 += v(i) * v(i); i += 1 }
        val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
        val codes = new Array[Int](m)
        var j = 0
        while (j < m) {
          val book = books(j)
          var best = -1; var bestS = Double.MinValue
          var c = 0
          while (c < book.length) {
            val cent = book(c)
            var d = 0.0
            var t = 0
            while (t < subDim) {
              d += v(j * subDim + t) * inv * cent(t); t += 1
            }
            val s = 2 * d - cc(j)(c)
            if (s > bestS) { bestS = s; best = c }
            c += 1
          }
          codes(j) = best; j += 1
        }
        (id, codes)
      })
      .toDF(idCol, "codes")
  }

  /** Persist a PQ index: the codes table plus a flat codebook relation.
    * Probe the PERSISTED codes, not the in-memory encode composition: the
    * scan then reads m small codes per vector (the whole point), and the
    * plan cannot re-inline the m-fold encode expression into the scoring
    * projection (Catalyst's CollapseProject duplicates it per lookup —
    * measured 25× on the fully-lazy composition). */
  def writePq(model: PqModel, codes: DataFrame, path: String): Unit = {
    val t0 = System.nanoTime()
    codes.write.mode("overwrite").parquet(s"$path/codes")
    // the codes write is where the (lazy) encode actually executes — this
    // is the honest "encode cost" cut for bench attribution
    lastPqEncodeSec = (System.nanoTime() - t0) / 1e9
    val sp = codes.sparkSession
    import sp.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.map { case (c, v, c2) => (j, c, v, c2, model.m, model.subDim) }
    }.toDF("j", "code", "centroid", "c2", "m", "sub_dim")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reload a persisted PQ index. */
  def readPq(spark: org.apache.spark.sql.SparkSession,
             path: String): (PqModel, DataFrame) = {
    val cb = spark.read.parquet(s"$path/codebooks").collect()
    require(cb.nonEmpty, s"empty PQ codebook at $path")
    val m = cb.head.getAs[Int]("m")
    val subDim = cb.head.getAs[Int]("sub_dim")
    val books = cb.groupBy(_.getAs[Int]("j")).toSeq.sortBy(_._1).map {
      case (_, rows) => rows.sortBy(_.getAs[Int]("code")).toSeq.map(r =>
        (r.getAs[Int]("code"), r.getSeq[Float](2), r.getAs[Double]("c2")))
    }
    (PqModel(m, subDim, books), spark.read.parquet(s"$path/codes"))
  }

  /** INCREMENTAL PQ maintenance — [[appendIvf]]'s analog for the
    * compressed index: new vectors encode under the PERSISTED codebooks
    * (the fixed-quantizer contract) and their code rows APPEND into the
    * codes table; existing code files are never rewritten, the corpus is
    * never re-encoded, and a probe of the grown index equals a probe of
    * an index encoded whole under the same model (VectorSpec;
    * `q_ann_pq_incremental` carries the full cross-engine oracle).
    * Codebook drift under a shifting distribution is the same
    * re-train-when-recall-SLOs-say-so trade as IVF's fixed centroids. */
  def appendPq(spark: org.apache.spark.sql.SparkSession, path: String,
               incoming: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): Unit = {
    val (model, _) = readPq(spark, path)
    encodePq(model, incoming, idCol, vecCol)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** PQ top-k with asymmetric distance + exact rerank (the production ADC
    * pattern): per query a lookup table lut[j][c] = q̂_j · c_{j,c} is built
    * DRIVER-side (m × k doubles — the query set is driver-sized by
    * contract, same as [[bruteForceTopK]]'s broadcast); the corpus scan
    * scores each row by summing m table lookups over its codes (no float
    * vector touched), keeps `rerankDepth` approximate candidates per
    * query, then reranks exactly on the candidates' raw vectors.
    *
    * The LUT rides an executor BROADCAST, scored by a primitive-loop
    * kernel — one Q×m×k copy fetched per executor. The earlier plan-literal
    * form (`typedlit` + nested element_at) re-serialized the whole LUT
    * with EVERY task and re-walked three levels of boxed Seqs per code:
    * linear-in-Q cost in exactly the place batch ANN (thousands of
    * queries) scales Q. Same model-apply-kernel rule as [[encodePq]]. */
  def pqTopK(model: PqModel, codes: DataFrame, corpus: DataFrame,
             queries: DataFrame, k: Int, rerankDepth: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id",
             excludeSelf: Boolean = true): DataFrame = {
    // cast the id like every sibling op (bruteForce/ivf/sq take any
    // integral id type; an uncast getLong ClassCastExceptions on int ids)
    val qRows = queries
      .select(col(queryIdCol).cast("long"), unitNorm(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // lut(qi)(j)(c) = q̂_j · centroid_{j,c} — primitive arrays end to end
    val luts: Array[Array[Array[Double]]] = qRows.map { case (_, qv) =>
      Array.tabulate(model.m) { j =>
        val qSub = qv.slice(j * model.subDim, (j + 1) * model.subDim).toArray
        model.codebooks(j).sortBy(_._1).map { case (_, c, _) =>
          var s = 0.0
          var t = 0
          while (t < qSub.length) { s += qSub(t) * c(t); t += 1 }
          s
        }.toArray
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val lutBc = spark.sparkContext.broadcast(luts)
    val adcScore = udf { (qi: Int, codes: Seq[Int]) =>
      val lut = lutBc.value(qi)
      var s = 0.0
      var j = 0
      while (j < lut.length) { s += lut(j)(codes(j)); j += 1 }
      s
    }
    val qDf = broadcast(qRows.zipWithIndex
      .map { case ((qid, _), i) => (qid, i) }.toSeq.toDF(queryIdCol, "__qi"))
    val joinCond = if (excludeSelf) col(queryIdCol) =!= col(idCol) else lit(true)
    val approx = codes.join(qDf, joinCond)
      .withColumn("__score", adcScore(col("__qi"), col("codes")))
    val wA = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__score").desc, col(idCol).asc)
    val candidates = approx
      .withColumn("__ar", row_number().over(wA))
      .filter(col("__ar") <= rerankDepth)
      .select(col(queryIdCol), col(idCol))
    // exact rerank on candidates only
    val qVecs = broadcast(queries.select(col(queryIdCol),
      col(vecCol).as("__qvec")))
    val wE = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    candidates
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(qVecs, Seq(queryIdCol))
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  // --------------------------------------------------------------------------
  // Scalar quantization (int8) — the exact-arithmetic compression point
  // --------------------------------------------------------------------------

  /** Per-dimension symmetric int8 scales: s_d = max|x_d| / 127 over the
    * corpus — ONE narrow posexplode pass, `dim` doubles to the driver.
    * This is the 4× point on the ANN compression spectrum (PQ is the 32×
    * point), and unlike PQ's KMeans the whole path is IEEE-deterministic:
    * train, encode and ADC scoring reproduce bit-exactly in any engine, so
    * the driver query carries a FULL value oracle — the only compressed-ANN
    * path that can. */
  def trainSq(corpus: DataFrame, vecCol: String = "embedding"): Array[Double] = {
    val rows = corpus.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d")).agg(max(abs(col("x").cast("double"))).as("m"))
      .collect()
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    val scales = new Array[Double](dim)
    // dead dimension (all zeros): any positive scale maps 0 → code 0; the
    // 1e-30 floor is mirrored LITERALLY by the oracle SQL
    rows.foreach(r =>
      scales(r.getInt(0)) = math.max(r.getDouble(1) / 127.0, 1e-30))
    scales
  }

  /** Encode to int8 codes: q_d = clamp(floor(x_d/s_d + 0.5), −127, 127),
    * stored as `array<tinyint>` — 1 byte per dimension, 4× down from
    * float32; the ANN scan then reads codes only. floor(+0.5) instead of
    * round(): round's half-tie rule is the one place engines disagree,
    * floor is IEEE-identical everywhere. */
  def encodeSq(corpus: DataFrame, scales: Array[Double],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val sLit = typedlit(scales.toSeq)
    corpus.select(col(idCol),
      transform(col(vecCol), (x, i) =>
        greatest(lit(-127), least(lit(127),
          floor(x.cast("double") / element_at(sLit, i + lit(1)) + lit(0.5))
            .cast("int"))).cast("byte")).as("codes"))
  }

  /** Int8 ADC top-k: the integer dot product of code vectors ranks
    * neighbors (exact in double — |score| ≤ dim·127²), query codes ride a
    * broadcast, ties break on id. Same contract as [[bruteForceTopK]] but
    * the scan touches 1 byte/dim instead of 4. */
  def sqTopK(codes: DataFrame, queryCodes: DataFrame, k: Int,
             idCol: String = "vec_id", queryIdCol: String = "query_id",
             excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queryCodes.select(col(queryIdCol), col("codes").as("__qc")))
    val joinCond = if (excludeSelf) col(queryIdCol) =!= col(idCol) else lit(true)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    codes.join(q, joinCond)
      .withColumn("score", dot(col("codes"), col("__qc")).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("rank"),
        col("score"))
  }

  // --------------------------------------------------------------------------
  // Embedding-cosine near-duplicate pairs
  // --------------------------------------------------------------------------

  /** EXACT cosine near-dup pairs (id_a < id_b, cosine >= threshold) via a
    * blocked self-join. O(n²) dot products — the verification baseline and
    * the oracle-checkable form. For the corpus-scale path use
    * [[cosineNearDuplicatesLsh]]. Normalized vectors are staged ONCE per side
    * so the inner loop is a single dot product. */
  /** Optional `blockCol`: classic blocked pairwise dedup — only pairs that
    * agree on the blocking key are compared, turning O(n²) into
    * O(Σ block²). */
  def cosineNearDuplicates(corpus: DataFrame, threshold: Double,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           blockCol: Option[String] = None): DataFrame = {
    val normed = corpus
      .select(col(idCol) +: blockCol.map(col).toSeq :+
        transform(col(vecCol), x => x.cast("double")).as("__v"): _*)
      .withColumn("__n", norm(col("__v")))
      // one transform, not zip_with over an array_repeat of the norm (that
      // materialized an n-element array per row just to divide); division
      // values — including the zero-norm NaN the oracle mirrors — are
      // identical
      .withColumn("__u", transform(col("__v"), x => x / col("__n")))
      .drop("__v", "__n")
    val a = normed.select(col(idCol).as("id_a") +:
      blockCol.map(c => col(c).as("__blk")).toSeq :+ col("__u").as("__ua"): _*)
    val b = normed.select(col(idCol).as("id_b") +:
      blockCol.map(c => col(c).as("__blk")).toSeq :+ col("__u").as("__ub"): _*)
    val joined = blockCol match {
      case Some(_) => a.join(b, Seq("__blk")).filter(col("id_a") < col("id_b"))
      case None => a.join(b, col("id_a") < col("id_b"))
    }
    joined
      .withColumn("cosine", dot(col("__ua"), col("__ub")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Scale path: random-hyperplane LSH (Charikar 2002). Each vector gets a
    * `bands × rowsPerBand`-bit signature (sign of dot with deterministic
    * pseudo-random planes); vectors sharing ANY band's bit-pattern become
    * candidates; exact cosine verifies. Only (id, band, bucket) rides the
    * wide exchange — the same payload discipline as the MinHash pipeline.
    * Detection prob for cosine s: 1-(1-p^r)^b with p = 1 - arccos(s)/π.
    *
    * Planes are RADEMACHER (±1 entries), derived from `md5("<plane>_<dim>")`
    * — sign projections preserve angles like gaussian ones (Achlioptas 2001
    * database-friendly projections; Charikar's analysis needs only symmetry)
    * and, unlike a seeded Gaussian stream, the derivation replays in any
    * engine with an md5 function — which gives this approximate operator a
    * FULL value oracle. */
  /** Banded random-hyperplane index rows for a vector set: (doc_id, band,
    * bucket). Persist this next to the corpus (append each accepted
    * increment's rows) so later increments probe it via
    * [[cosineNearDuplicatesLshIncremental]] without re-projecting the
    * corpus — the embedding analog of
    * [[DedupFunctions.minhashBandIndex]]. Bucket membership is a pure
    * function of the vector (the planes are md5-derived constants), so
    * index rows built at different times always agree. Vectors indexed
    * together MUST share a dimension ([[majorityDim]] picks the modal one;
    * stragglers drop — the same contract as the batch path). */
  def cosineLshBandIndex(corpus: DataFrame, bands: Int = 8,
                         rowsPerBand: Int = 4, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    // an empty increment (or an all-null embedding column) must yield an
    // empty index, not a driver exception on head()
    val dim = majorityDim(corpus, vecCol)
    if (dim == 0) {
      val s = corpus.sparkSession
      import org.apache.spark.sql.types._
      val idT = corpus.schema(idCol).dataType
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", idT), StructField("band", IntegerType),
          StructField("bucket", LongType))))
    }
    val planes: Seq[Seq[Double]] =
      (0 until bands * rowsPerBand).map(p =>
        (0 until dim).map(d => rademacherSign(p, d)))

    // one literal array<array<double>> of planes; per-row sig = sign bit per
    // plane (single transform over the literal — one dot per plane per row)
    val planesLit = typedlit(planes)
    val sigBits = transform(planesLit,
      plane => when(dot(col(vecCol), plane) > 0, 1L).otherwise(0L))

    corpus
      // stragglers (null vectors, mismatched widths, null components)
      // DROP, per the documented contract — otherwise dot() nulls them
      // into an all-zero signature and they pile into (band, 0): above
      // the cap that bucket is discarded (taking legitimate all-zero
      // signatures' pairs with it), below it they generate O(n²) garbage
      // candidates per band
      .filter(size(col(vecCol)) === dim &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol).as("doc_id"), col(vecCol))
      .select(col("doc_id"), sigBits.as("bits"))
      .select(col("doc_id"), posexplode(
        array((0 until bands).map { bIdx =>
          // pack this band's rowsPerBand bits into one long
          (0 until rowsPerBand).map(r =>
            element_at(col("bits"), bIdx * rowsPerBand + r + 1) *
              lit(1L << r)).reduce(_ + _)
        }: _*)).as(Seq("band", "bucket")))
      .select(col("doc_id"), col("band"), col("bucket"))
  }

  def cosineNearDuplicatesLsh(corpus: DataFrame, threshold: Double,
                              bands: Int = 8, rowsPerBand: Int = 4,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              maxBucketSize: Int = 10000): DataFrame = {
    // scratch: the index feeds the hot-bucket census and the self-join —
    // unmaterialized, the plane projection ran once per consumer
    val banded = graft.util.Scratch.materialize(
      cosineLshBandIndex(corpus, bands, rowsPerBand, idCol, vecCol),
      "cos_band_index", compact = false)

    // hot-bucket cap — the ONE shared surfaced-census + anti-join helper
    // (same rewrite as the MinHash path; drops recorded, never silent)
    val counted = DedupFunctions.dropHotBucketsSurfaced(banded, maxBucketSize)
      .select(col("band"), col("bucket"), col("doc_id"))

    val a2 = counted.withColumnRenamed("doc_id", "id_a")
    val b2 = counted.withColumnRenamed("doc_id", "id_b")
    val candidates = a2.join(b2, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // exact cosine verification on the candidate set only. No explicit
    // broadcast hints here: the candidate subtree feeds BOTH lookups, and a
    // hint forces it to re-evaluate per build side (measured 2× the whole
    // query at sf0.1); AQE's runtime stats broadcast the small side anyway
    // once the candidate shuffle has materialized.
    val vecs = corpus.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** INCREMENTAL embedding near-dup — the 100 TB shape: cosine pairs at/
    * above `threshold` with at least one side in `incoming`, probing the
    * corpus through its PERSISTED band index (`corpusIndex`, from
    * [[cosineLshBandIndex]]). The corpus embeddings are touched only to
    * verify candidate ids (two id-keyed lookups); its vectors are never
    * re-projected against the planes. Candidate generation matches the
    * batch path's exactly (same plane constants, same hot-bucket cap over
    * the COMBINED population, counted on distinct index rows because the
    * index is append-maintained and crash-retried appends duplicate rows) —
    * so incremental output equals the batch pair set restricted to pairs
    * with an incoming side. Band parameters MUST match the index's. */
  def cosineNearDuplicatesLshIncremental(incoming: DataFrame,
                                         corpus: DataFrame,
                                         corpusIndex: DataFrame,
                                         threshold: Double,
                                         bands: Int = 8, rowsPerBand: Int = 4,
                                         idCol: String = "vec_id",
                                         vecCol: String = "embedding",
                                         maxBucketSize: Int = 10000,
                                         incomingIndex: Option[DataFrame] = None)
      : DataFrame = {
    // increment band rows feed three consumers (combined count, probe,
    // target) — materialize once (scratch: zero persisted-RDD footprint)
    val inc = incomingIndex.getOrElse(graft.util.Scratch.materialize(
      cosineLshBandIndex(incoming, bands, rowsPerBand, idCol, vecCol),
      "inc_cos_index", compact = false))
    val all = corpusIndex.select(col("doc_id"), col("band"), col("bucket"))
      .unionByName(inc)
    // two-phase census (round 15, the MinHash-incremental rewrite carried
    // over): raw count names a hot-bucket superset, exact distinct recount
    // only over the superset's rows — kills the full `distinct()` exchange
    // of the combined index the former census paid on every sync
    val hot = DedupFunctions.twoPhaseHotBucketKeys(all, maxBucketSize)
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
    // exact cosine verification needs both populations' vectors (a pair
    // can be increment-internal or increment×corpus)
    val vecs = corpus.select(col(idCol), col(vecCol))
      .unionByName(incoming.select(col(idCol), col(vecCol)))
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Element-wise MEAN embedding per group — class/domain centroids (the
    * seed for IVF training, drift monitoring, per-source semantic
    * summaries). Returns (group, centroid: Array[Double]).
    *
    * Scale: posexplode fans each row out to `dim` (group, pos, v) triples,
    * but partial aggregation collapses them to (groups × dim) partial sums
    * PER TASK before the exchange — the shuffle carries group-count × dim
    * rows, not corpus × dim. Final assembly sorts each group's dim means
    * back into an array (second, group-count-sized shuffle).
    */
  def meanEmbeddingByGroup(df: DataFrame, groupCol: String,
                           vecCol: String = "embedding"): DataFrame =
    df
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("v")).as("mean_v"))
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean_v")))),
        s => s.getField("mean_v")).as("centroid"))

  // --------------------------------------------------------------------------
  // Semantic deduplication (SemDeDup, Abbas et al. 2023)
  // --------------------------------------------------------------------------

  /** Assign every vector to its nearest LEADER by cosine (ties → min leader
    * id). Leaders are the `kLeaders` vectors with the smallest
    * `md5(cast(id as string))` — a deterministic, engine-portable pick (the
    * repo's split/sampling convention), unlike KMeans centroids whose random
    * init DuckDB cannot replay. One-pass assignment, NO iteration: this is
    * the clustering stage of semantic dedup, where cluster quality only
    * gates how much all-pairs work survives, not correctness.
    *
    * Scale: leaders are TakeOrdered'd (k rows, never a full sort) and ride a
    * broadcast; assignment is a map-side broadcast join fanning each row to
    * k candidates, and partial `max_by` collapses them back to one row per
    * vector BEFORE the exchange — the shuffle carries n rows, not n×k.
    * Returns the input plus `leader_id`. */
  def assignLeaders(corpus: DataFrame, kLeaders: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame =
    assignToLeaders(corpus, pickLeaders(corpus, kLeaders, idCol, vecCol),
      idCol, vecCol)

  /** The deterministic leader pick [[assignLeaders]] uses, exposed so a
    * pipeline can PERSIST the leader set and keep it FIXED across
    * increments ([[semanticDedupIncremental]]): k rows
    * (`__leader_id`, `__lvec`), smallest md5(id) first. */
  def pickLeaders(corpus: DataFrame, kLeaders: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    corpus.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(kLeaders)
      .select(col(idCol).as("__leader_id"), col(vecCol).as("__lvec"))

  /** Assign every vector of `df` to its nearest leader from an EXPLICIT
    * leader set (broadcast; ties → min leader id) — one map-side pass over
    * `df` only. Returns `df` plus `leader_id`. */
  def assignToLeaders(df: DataFrame, leaders: DataFrame,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val best = df.select(col(idCol), col(vecCol))
      .join(broadcast(leaders), lit(true))
      .withColumn("__cos", cosine(col(vecCol), col("__lvec")))
      .groupBy(col(idCol))
      .agg(max_by(col("__leader_id"),
        struct(col("__cos"), negate(col("__leader_id")))).as("leader_id"))
    df.join(best, idCol)
  }

  /** SemDeDup (Abbas et al. 2023): cluster embeddings, compare pairs ONLY
    * within a cluster, keep one representative (min id) per near-duplicate
    * connected component. The 100 TB shape for embedding-space dedup:
    * [[assignLeaders]] bounds pairwise work to O(Σ cluster²) instead of
    * O(n²), exact cosine decides inside each cluster, and the component
    * closure reuses [[graft.functions.DedupFunctions.duplicateClusters]]'s
    * candidate-scale label propagation. Cross-cluster near-dups are missed
    * by construction — the SemDeDup trade, recall bought back by raising
    * `kLeaders` quality (finer clusters → smaller blocks → cheaper pairs,
    * but more boundary misses).
    *
    * Deterministic end-to-end (md5 leaders, exact cosine, min-id reps), so
    * the whole pipeline carries a full value oracle. Returns surviving rows
    * of `corpus` unchanged. */
  def semanticDedup(corpus: DataFrame, kLeaders: Int, threshold: Double,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val assigned = assignLeaders(corpus, kLeaders, idCol, vecCol)
    val pairs = cosineNearDuplicates(assigned, threshold, idCol, vecCol,
      blockCol = Some("leader_id"))
    DedupFunctions.dropNearDuplicateClusters(corpus, pairs, idCol)
  }

  /** INCREMENTAL SemDeDup — the 100 TB maintenance shape: leaders are
    * PERSISTED and FIXED ([[pickLeaders]] once, at bootstrap), the corpus
    * keeps its persisted `leader_id` assignment and cluster-label
    * side-table, and each increment pays only (a) one broadcast
    * assignment pass over ITS OWN rows, (b) exact cosine against the
    * members of the leader blocks it lands in (semi-join — blocks without
    * incoming rows are never read), and (c) a contracted label fold
    * ([[graft.functions.DedupFunctions.foldClusterLabels]]). The corpus is
    * never re-assigned and its internal pairs never recomputed.
    *
    * Equality contract: chain-folded labels equal the BATCH clustering
    * computed with the same fixed leader set (fixed leaders are the
    * incremental trade — a batch re-run would re-pick leaders over the
    * grown corpus and draw different block boundaries). Deterministic end
    * to end, so the driver query carries a full value oracle.
    *
    * `corpusAssigned` must carry `leader_id` (from a previous
    * [[assignToLeaders]]); returns the updated (id, cluster) label table.
    */
  def semanticDedupIncremental(corpusAssigned: DataFrame, incoming: DataFrame,
                               leaders: DataFrame,
                               prevLabels: Option[DataFrame],
                               threshold: Double,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    val incAssigned = assignToLeaders(incoming, leaders, idCol, vecCol)
    val a = incAssigned.select(col("leader_id"), col(idCol).as("id_x"),
      col(vecCol).as("__vx"))
    val b = corpusAssigned.unionByName(incAssigned, allowMissingColumns = true)
      .select(col("leader_id"), col(idCol).as("id_y"), col(vecCol).as("__vy"))
    // incoming × (corpus ∪ incoming) within the same leader block; the
    // least/greatest + distinct collapses the doubled incoming-internal
    // pairs (seen once from each side)
    val newPairs = a.join(b, Seq("leader_id"))
      .filter(col("id_x") =!= col("id_y"))
      .withColumn("__cos", cosine(col("__vx"), col("__vy")))
      .filter(col("__cos") >= threshold)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    DedupFunctions.foldClusterLabels(prevLabels, newPairs)
  }

  // --------------------------------------------------------------------------
  // Diversity-aware selection: MMR rerank + greedy k-center coreset
  // --------------------------------------------------------------------------

  /** Exact replica of the [[graft.functions.Expressions.CosineSim]] fold
    * (sequential double accumulation, ab/(√aa·√bb)) for group-local greedy
    * loops — keeps selection decisions bit-identical to the Expression path
    * and to DuckDB's `list_cosine_similarity`. */
  private def cosineLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i); val y = b(i)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998): from
    * each query's candidate list, greedily select `k` items maximizing
    * `λ·rel − (1−λ)·max_sim_to_already_selected` — the diversity-aware
    * final stage after BM25 / ANN / RRF retrieval, and the standard
    * redundancy guard when sampling few-shot or training examples from a
    * near-dup-heavy pool. The first pick scores `λ·rel` (empty-selection
    * similarity term is 0). Ties break on candidate id ascending; every
    * arithmetic step is deterministic double math on the [[cosineLocal]]
    * contract, so a SQL oracle replays selections and scores exactly.
    *
    * Scale: the greedy is inherently sequential in k but LOCAL to each
    * query group — `flatMapGroups` distributes queries across executors,
    * and each group holds only its own top-N candidate vectors (rerank
    * input, bounded upstream), so the exchange carries candidate-scale
    * payloads, never the corpus. O(k·N) similarity evaluations per query.
    */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double,
                queryIdCol: String = "query_id", idCol: String = "cand_id",
                relCol: String = "rel",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"mmrRerank needs k >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda outside [0,1]")
    val s = candidates.sparkSession
    import s.implicits._
    val ds = candidates
      .filter(col(vecCol).isNotNull && col(relCol).isNotNull)
      .select(
        col(queryIdCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Long, Double, Seq[Double])]
    ds.groupByKey(_._1).flatMapGroups { (q, it) =>
      val cands = it.toArray.sortBy(_._2) // id-sorted: stable tiebreaks
      val n = cands.length
      val chosen = new Array[Boolean](n)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double)]
      var step = 1
      while (step <= math.min(k, n)) {
        var bestIdx = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!chosen(i)) {
            val c = cands(i)
            // NaN sims (zero-norm vectors) are SKIPPED, not latched: one
            // degenerate selected vector must not poison every later
            // score (maxSim stays at the 0.0 neutral element instead)
            var maxSim = 0.0
            var first = true
            selected.foreach { j =>
              val sim = cosineLocal(c._4, cands(j)._4)
              if (!sim.isNaN && (first || sim > maxSim)) {
                maxSim = sim; first = false
              }
            }
            val score =
              if (selected.isEmpty) lambda * c._3
              else lambda * c._3 - (1.0 - lambda) * maxSim
            // strict > under id-ascending iteration = smallest id on ties
            if (score > bestScore) { bestScore = score; bestIdx = i }
          }
          i += 1
        }
        if (bestIdx < 0) { // all remaining scores NaN (degenerate vectors)
          step = math.min(k, n) + 1
        } else {
          chosen(bestIdx) = true
          selected += bestIdx
          out += ((q, cands(bestIdx)._2, step.toLong, bestScore))
          step += 1
        }
      }
      out.iterator
    }.toDF(queryIdCol, "selected_id", "sel_rank", "mmr_score")
  }

  /** Greedy k-center (farthest-point traversal, Gonzalez 1985) over an
    * embedding corpus: start from the smallest id, then repeatedly pick the
    * point LEAST similar to every center chosen so far (argmin of max
    * cosine, ties on id ascending) — the classic coreset / diverse-seed
    * selection for active learning and dataset distillation, with the
    * 2-approximation cover guarantee. Returns (center_id, sel_rank,
    * max_cos) where max_cos is the selected point's similarity to the
    * nearest prior center (1 − covering radius at that step; the first
    * row's is −1, it has no prior center).
    *
    * Scale: round t is ONE full scan computing each point's max-cosine to
    * the t−1 current centers via a single literal-array `aggregate` fold
    * (the [[nearestCentroid]] pattern — O(1) expression depth), then a
    * TakeOrdered(1) argmin; only the 1-row winner is collected per round.
    * O(k) scans total, no growing lineage, no driver-side corpus. */
  def kcenterSelect(corpus: DataFrame, k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"kcenterSelect needs k >= 1, got $k")
    val s = corpus.sparkSession
    val pts = corpus
      .filter(col(vecCol).isNotNull) // null vectors can't anchor coverage
      .select(col(idCol).cast("long").as("__id"),
        transform(col(vecCol), x => x.cast("float")).as("__v"))
    val first = pts.orderBy(col("__id")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("kcenterSelect: empty corpus"))
    var centers = Vector[(Long, Seq[Float])](
      (first.getLong(0), first.getSeq[Float](1)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    out += ((centers.head._1, 1L, -1.0))
    var step = 2
    while (step <= k) {
      val centLit = typedlit(centers.map(_._2))
      val maxCos = aggregate(centLit, lit(-2.0),
        (acc, c) => greatest(acc, cosine(col("__v"), c)))
      val winner = pts
        .filter(!col("__id").isin(centers.map(_._1): _*))
        .withColumn("__mc", maxCos)
        .orderBy(col("__mc").asc, col("__id").asc)
        .limit(1).collect().headOption
      winner match {
        case None => step = k + 1 // corpus exhausted
        case Some(w) =>
          centers = centers :+ ((w.getLong(0), w.getSeq[Float](1)))
          out += ((w.getLong(0), step.toLong, w.getDouble(2)))
          step += 1
      }
    }
    import s.implicits._
    out.toSeq.toDF("center_id", "sel_rank", "max_cos")
  }

  private implicit class ListOps[T](l: List[T]) {
    def asJava: java.util.List[T] = {
      val out = new java.util.ArrayList[T](l.size)
      l.foreach(out.add)
      out
    }
  }
}
