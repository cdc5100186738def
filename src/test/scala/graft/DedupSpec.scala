package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DedupFunctions

/** Invariant coverage for the hash-seeded dedup operators the DuckDB oracle
  * can't reproduce (SimHash), plus sanity on the MinHash pipeline. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
      (4L, "completely different content about spark catalyst optimizer rules"),
      (5L, "Completely DIFFERENT content; about spark catalyst optimizer rules!") // dup of 4 after normalization
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups by normalized content, keeps min id") {
    val groups = DedupFunctions.exactDuplicateGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 2L), (3L, 1L), (4L, 2L)))
    val kept = DedupFunctions.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("incremental dedup: side-table fingerprints gate the increment") {
    val s = spark; import s.implicits._
    // maintained fingerprint table = corpus state after accepting docs 1 & 4
    val sideTable = DedupFunctions.exactDuplicateGroups(
      docs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text")
      .select(col("fingerprint"))
    val increment = docs.filter(col("doc_id") > 1) // 2..5
    val kept = DedupFunctions.dropDuplicatesIncremental(
      increment, sideTable, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 = dup of corpus doc 1; 5 = dup of corpus doc 4 (after normalization);
    // 3 is genuinely new → only 3 survives
    assert(kept == Set(3L))
    // empty side table degenerates to plain within-increment dedup
    val bootstrapped = DedupFunctions.dropDuplicatesAgainst(
      docs.limit(0), increment, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bootstrapped == Set(2L, 3L, 4L)) // min-id per content within 2..5
  }

  test("incremental dedup workflow: side table maintained across increments") {
    val s = spark; import s.implicits._
    val side = tmpDir("fpside") + "/fingerprints"
    // increment 1 bootstraps against an empty side table
    val inc1 = docs.filter(col("doc_id") <= 2) // 1 + its exact dup 2
    val kept1 = DedupFunctions.dropDuplicatesIncremental(inc1,
      DedupFunctions.readFingerprints(spark, side), "doc_id", "text")
    assert(kept1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    DedupFunctions.appendFingerprints(kept1, "text", side)
    // increment 2: doc 3 is new, doc 5's content is new (4 not yet seen)
    val inc2 = docs.filter(col("doc_id").isin(3L, 5L))
    val kept2 = DedupFunctions.dropDuplicatesIncremental(inc2,
      DedupFunctions.readFingerprints(spark, side), "doc_id", "text")
    assert(kept2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L, 5L))
    DedupFunctions.appendFingerprints(kept2, "text", side)
    // increment 3: doc 4 normalizes to doc 5's accepted content → rejected
    val inc3 = docs.filter(col("doc_id") === 4)
    val kept3 = DedupFunctions.dropDuplicatesIncremental(inc3,
      DedupFunctions.readFingerprints(spark, side), "doc_id", "text")
    assert(kept3.count() == 0, "side table failed to gate a later increment")
  }

  test("minhash LSH finds exact and near duplicates with correct jaccard") {
    val pairs = DedupFunctions.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((1L, 2L)).contains(1.0))          // exact dup
    assert(pairs.get((4L, 5L)).contains(1.0))          // dup after normalization
    assert(pairs.get((1L, 3L)).exists(j => j > 0.6 && j < 1.0)) // near dup
    // pairs are canonical (id_a < id_b) and unique
    pairs.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("simhash signatures: identical docs collide, near dups within hamming 3") {
    val sigs = DedupFunctions.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L)) // identical text → identical signature
    val near = DedupFunctions.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue()))
    val pairSet = near.map(t => (t._1, t._2)).toSet
    assert(pairSet.contains((1L, 2L)))
    near.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
  }

  test("incremental simhash probe == batch pairs restricted to incoming side") {
    // split the fixture corpus; the persisted-index probe must find
    // EXACTLY the batch pair set minus corpus-internal pairs (pigeonhole
    // exactness carries over: the probe side is the increment's bands)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val idx = DedupFunctions.simhashBandIndex(corpus, "doc_id", "text")
    val got = DedupFunctions.simhashNearDuplicatesIncremental(
      incoming, idx, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
    val want = DedupFunctions.simhashNearDuplicates(docs, "doc_id", "text",
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue()))
      .filter { case (a, b, _) => a % 2 == 1 || b % 2 == 1 }.toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must exercise at least one incoming pair")
    // idempotent wrt duplicated index rows (append-maintained side table
    // replayed after a crash): duplicates change nothing
    val got2 = DedupFunctions.simhashNearDuplicatesIncremental(
      incoming, idx.unionAll(idx.limit(2)), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
    assert(got2 == want)
  }

  test("threshold monotonicity: higher threshold yields a subset") {
    val lo = DedupFunctions.minhashNearDuplicates(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = DedupFunctions.minhashNearDuplicates(docs, "doc_id", "text", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi.subsetOf(lo))
  }

  test("LSH bucket cap suppresses degenerate all-same-content explosions") {
    val s = spark
    import s.implicits._
    val degenerate = (1L to 30L).map(i => (i, "same text everywhere here"))
      .toDF("doc_id", "text")
    val capped = DedupFunctions.minhashCandidatePairs(degenerate, "doc_id", "text",
      maxBucketSize = 10)
    assert(capped.count() == 0) // every bucket over cap → dropped
    // ...but never SILENTLY: the census records what the cap discarded
    // (30 identical docs × 16 bands = 16 over-cap buckets of 30 rows)
    val drops = DedupFunctions.lastHotBucketDrops
    assert(drops.buckets == 16L, s"expected 16 dropped buckets, got $drops")
    assert(drops.indexRows == 16L * 30, s"expected 480 dropped rows, got $drops")
    // an uncapped run resets the census to zero
    DedupFunctions.minhashCandidatePairs(docs, "doc_id", "text").count()
    assert(DedupFunctions.lastHotBucketDrops ==
      DedupFunctions.HotBucketDrops(0L, 0L))
    // the per-thread log is the OWNED handle: both censuses above
    // accumulated (capped then clean), a drain empties it
    val log = DedupFunctions.drainHotBucketDrops()
    assert(log.size >= 2 &&
      log.contains(DedupFunctions.HotBucketDrops(16L, 480L)) &&
      log.last == DedupFunctions.HotBucketDrops(0L, 0L))
    assert(DedupFunctions.drainHotBucketDrops().isEmpty)
  }

  test("census pre-sift finds thinly-spread hot buckets (pigeonhole bound)") {
    val s = spark
    import s.implicits._
    // A hot bucket whose rows are SPREAD across partitions so no single
    // partition's local count exceeds the cap — the pre-sift must still
    // name it (localCount * P > cap by pigeonhole), and the exact recount
    // must produce the identical hot set and census record as the plain
    // full aggregation.
    val cap = 3
    val rows = (
      (1L to 5L).map(i => (0, 100L, i)) ++   // hot: 5 rows > cap
      (1L to 3L).map(i => (1, 200L, i)) ++   // exactly cap → NOT hot
      Seq((2, 300L, 1L))                     // singleton
    )
    val df = rows.toDF("band", "bucket", "doc_id").repartition(2)
    val sifted = DedupFunctions.hotBucketKeysLocal(df, cap)
    val siftDrops = DedupFunctions.lastHotBucketDrops
    val plain = DedupFunctions.hotBucketKeysLocal(df, cap, presift = false)
    val plainDrops = DedupFunctions.lastHotBucketDrops
    def keys(o: Option[org.apache.spark.sql.DataFrame]) =
      o.map(_.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
        .getOrElse(Set.empty)
    assert(keys(sifted) == Set((0, 100L)), s"hot set: ${keys(sifted)}")
    assert(keys(sifted) == keys(plain))
    assert(siftDrops == plainDrops &&
      siftDrops == DedupFunctions.HotBucketDrops(1L, 5L))
    // a frame with NO hot buckets short-circuits after the sift but logs
    // the same empty census record the full aggregation would have
    val cold = DedupFunctions.hotBucketKeysLocal(df, 5)
    assert(cold.isEmpty)
    assert(DedupFunctions.lastHotBucketDrops ==
      DedupFunctions.HotBucketDrops(0L, 0L))
    DedupFunctions.drainHotBucketDrops()
    ()
  }

  test("near-dup edges: star collapse is component-equivalent to full pairs") {
    val s = spark
    import s.implicits._
    // 6 copies of page A (ids 1-6), 2 copies of a NEAR-dup of A (7-8: one
    // changed word), 3 copies of unrelated page B (11-13), a singleton (20)
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val a2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val b = "completely different content about spark catalyst optimizer rules " +
      "and adaptive execution at scale"
    val corpus = ((1L to 6L).map(i => (i, a)) ++ Seq((7L, a2), (8L, a2)) ++
      (11L to 13L).map(i => (i, b)) :+ (20L, "a standalone page about nothing else"))
      .toDF("doc_id", "text")
    val thr = 0.5
    val full = DedupFunctions.minhashNearDuplicates(corpus, "doc_id", "text", thr)
    val edges = DedupFunctions.minhashNearDupEdges(corpus, "doc_id", "text", thr)
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // linear in class size: class {1..6} contributes 5 star edges (not 15),
    // class {7,8} one, class {11..13} two, plus rep pairs — here (1,7)
    edgeSet.foreach { case (x, y) => assert(x < y) }
    assert(edgeSet.count(_._1 == 1L) >= 5)
    assert(edges.count() < full.count(),
      "edge relation must be smaller than the C(m,2) pair relation")
    // the closures agree EXACTLY
    val byFull = DedupFunctions.duplicateClusters(full)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byEdges = DedupFunctions.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFull == byEdges)
    assert(byEdges.view.filterKeys(Set(1L, 5L, 7L)).values.toSet == Set(1L),
      "near-dup chain A-copies ↔ A' must close into one component")
    assert(byEdges(12L) == 11L && !byEdges.contains(20L))
  }

  test("simhash near-dup edges: signature classes collapse, components equal") {
    val s = spark
    import s.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val a2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val b = "completely different content about spark catalyst optimizer rules"
    val corpus = ((1L to 5L).map(i => (i, a)) ++ Seq((6L, a2)) ++
      (11L to 12L).map(i => (i, b))).toDF("doc_id", "text")
    val full = DedupFunctions.simhashNearDuplicates(corpus, "doc_id", "text", 3)
    val edges = DedupFunctions.simhashNearDupEdges(corpus, "doc_id", "text", 3)
    val es = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the 5-copy class of A emits 4 star edges at hamming 0, not C(5,2)
    assert(es.count { case (x, _, h) => x == 1L && h == 0L } >= 4)
    assert(edges.count() < full.count())
    val byFull = DedupFunctions.duplicateClusters(full.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byEdges = DedupFunctions.duplicateClusters(edges.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFull == byEdges)
  }

  test("video near-dup edges: identical-frame-set classes collapse, components equal") {
    val s = spark
    import s.implicits._
    // videos as frame-signature relations: A-class {1,2,3} identical sets
    // (a re-upload class), B {10} shares 2 of A's frames (trimmed copy),
    // C {20,21} identical sets sharing nothing with A/B, D {30} a
    // single-frame video (below minShared: pairs with nothing)
    def f(i: Long) = (16L, 16L, 100L + i, 200L + i, 300L + i)
    val rows =
      (for (d <- Seq(1L, 2L, 3L); i <- Seq(0L, 1L, 2L)) yield (d, f(i))) ++
      (for (i <- Seq(0L, 1L, 9L)) yield (10L, f(i))) ++
      (for (d <- Seq(20L, 21L); i <- Seq(5L, 6L)) yield (d, f(i))) :+
      ((30L, f(0L)))
    val sigs = rows.map { case (d, (w, h, y, cb, cr)) => (d, 0L, w, h, y, cb, cr) }
      .toDF("doc_id", "frame_idx", "width", "height", "y_sig", "cb_sig", "cr_sig")
    val full = graft.multimodal.Multimodal.videoNearDuplicates(sigs, 2)
    val edges = graft.multimodal.Multimodal.videoNearDupEdges(sigs, 2)
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // A collapses to 2 star edges (not C(3,2)=3 pairs) + the rep pair to B
    assert(es == Set((1L, 2L), (1L, 3L), (1L, 10L), (20L, 21L)))
    val byFull = graft.functions.DedupFunctions.duplicateClusters(
      full.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byEdges = graft.functions.DedupFunctions.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFull == byEdges)
    assert(!byEdges.contains(30L), "single-frame video must pair with nothing")
    // content fingerprints: equal sets collide, different sets do not
    val fps = graft.multimodal.Multimodal.videoContentFingerprints(sigs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fps(1L) == fps(2L) && fps(20L) == fps(21L) && fps(1L) != fps(10L))
    // BOTH rep-pair plans are exact: the inline profile join (default) and
    // the rep-level pair aggregation (forced by a zero cell threshold) must
    // produce the identical full pair relation, n_shared included
    val byProfile = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val savedCells = graft.multimodal.Multimodal.ProfileJoinMaxCells
    try {
      graft.multimodal.Multimodal.ProfileJoinMaxCells = 0L
      val byAgg = graft.multimodal.Multimodal.videoNearDuplicates(sigs, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(byProfile == byAgg,
        s"profile-join and rep-aggregation plans diverged: $byProfile vs $byAgg")
      val edgesAgg = graft.multimodal.Multimodal.videoNearDupEdges(sigs, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(edgesAgg == es)
    } finally graft.multimodal.Multimodal.ProfileJoinMaxCells = savedCells
  }

  test("audio near-dup edges: identical-fingerprint classes collapse, components equal") {
    val s = spark
    import s.implicits._
    // (id, n_frames, afp): {1,2,3} identical clips, {4} 1 bit away from
    // them (re-encode wobble), {10,11} identical unrelated clips, {20} a
    // different-length clip whose fingerprint coincides with 1's (the
    // length gate must keep it unpaired)
    val hashes = Seq(
      (1L, 400L, 0x0f0fL), (2L, 400L, 0x0f0fL), (3L, 400L, 0x0f0fL),
      (4L, 400L, 0x0f0eL),
      (10L, 500L, 0x1234L), (11L, 500L, 0x1234L),
      (20L, 480L, 0x0f0fL)
    ).toDF("doc_id", "n_frames", "afp")
    val full = graft.multimodal.Multimodal.audioNearDuplicates(hashes, 1)
    val edges = graft.multimodal.Multimodal.audioNearDupEdges(hashes, 1)
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)))
    val byFull = graft.functions.DedupFunctions.duplicateClusters(
      full.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byEdges = graft.functions.DedupFunctions.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFull == byEdges)
    assert(!byEdges.contains(20L), "length gate must keep 20 unpaired")
  }

  test("incremental near-dup edges: fold over side tables equals batch clustering") {
    val s = spark
    import s.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val a2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val b = "completely different content about spark catalyst optimizer rules " +
      "and adaptive execution at scale"
    val c = "a third topic on watermark stores and exactly once loading spark"
    // corpus: A-copies (2,4), A' (6), B (8); increment: A-copy (1: known
    // content, smaller id than the corpus rep), A' copy (3), B copy (5),
    // new content C (7, 9 = two copies), singleton near-dup of C? none
    val corpus = Seq((2L, a), (4L, a), (6L, a2), (8L, b)).toDF("doc_id", "text")
    val inc = Seq((1L, a), (3L, a2), (5L, b), (7L, c), (9L, c))
      .toDF("doc_id", "text")
    val thr = 0.5
    val repFps = DedupFunctions.repFingerprints(corpus, "doc_id", "text")
    val repIdx = DedupFunctions.minhashRepBandIndex(corpus, "doc_id", "text")
    val edges = DedupFunctions.minhashNearDupEdgesIncremental(
      inc, corpus, repFps, repIdx, "doc_id", "text", thr)
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // known content goes straight to the CORPUS rep (no banding): 1→2,
    // 3→6, 5→8; new class C stars 9 around 7; no rep pair for C (unrelated)
    assert(edgeSet.contains((1L, 2L)) && edgeSet.contains((3L, 6L)) &&
      edgeSet.contains((5L, 8L)) && edgeSet.contains((7L, 9L)))
    assert(!edgeSet.exists { case (x, y) => Set(x, y) == Set(7L, 8L) })
    // fold into the persisted corpus labels == batch clustering of the
    // union (the contract every closure consumer relies on)
    val baseLabels = DedupFunctions.foldClusterLabels(None,
      DedupFunctions.minhashNearDupEdges(corpus, "doc_id", "text", thr))
    val folded = DedupFunctions.foldClusterLabels(Some(baseLabels), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = DedupFunctions.duplicateClusters(
      DedupFunctions.minhashNearDuplicates(corpus.unionByName(inc),
        "doc_id", "text", thr))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == batch)
    // the A ∪ A' chain must label by the INCREMENT's smaller id after fold
    assert(batch(4L) == 1L && batch(6L) == 1L && batch(9L) == 7L)
  }

  test("incremental near-dup edges: crash-replay with appended side tables converges") {
    val s = spark
    import s.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val a2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val b = "completely different content about spark catalyst optimizer rules " +
      "and adaptive execution at scale"
    val c = "a third topic on watermark stores and exactly once loading spark"
    val c2 = "a third topic on watermark stores and exactly once loading data"
    // corpus carries a near-dup (NOT identical) neighbor of the increment's
    // new content C — the link a replay must NOT lose: it is only found by
    // the LSH probe, never by a fingerprint hit
    val corpus = Seq((2L, a), (4L, a), (6L, a2), (8L, b), (10L, c2))
      .toDF("doc_id", "text")
    val inc = Seq((1L, a), (3L, a2), (5L, b), (7L, c), (9L, c))
      .toDF("doc_id", "text")
    val thr = 0.5
    val repFps = DedupFunctions.repFingerprints(corpus, "doc_id", "text")
    val repIdx = DedupFunctions.minhashRepBandIndex(corpus, "doc_id", "text")
    def edgeSet(fps: org.apache.spark.sql.DataFrame,
                idx: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      DedupFunctions.minhashNearDupEdgesIncremental(
        inc, corpus, fps, idx, "doc_id", "text", thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clean = edgeSet(repFps, repIdx)
    assert(clean.contains((7L, 10L)) || clean.contains((7L, 9L))) // sanity
    // the neardup_labels_edges crash window: the post-op appended the
    // increment's new-content classes and their reps' band rows, then died
    // BEFORE the label swap — the replay sees a side table that already
    // contains the increment's own fingerprints, keyed by increment ids.
    // Without the committed-corpus restriction the new class C would come
    // back tagged 'known' (its corpus rep = its own increment id), the LSH
    // probe would be skipped, and the genuine near-dup link 7–10 silently
    // lost forever.
    val incFps = DedupFunctions.repFingerprints(inc, "doc_id", "text")
      .join(repFps.select($"fingerprint"), Seq("fingerprint"), "left_anti")
    val staleFps = repFps.unionByName(incFps)
    val incRepIdx = DedupFunctions.minhashBandIndex(inc, "doc_id", "text")
      .join(incFps.select($"rep_id".as("doc_id")), Seq("doc_id"), "left_semi")
    val staleIdx = repIdx.unionByName(incRepIdx)
    val replay = edgeSet(staleFps, staleIdx)
    assert(replay == clean)
    assert(replay.exists { case (x, y) => Set(x, y) == Set(7L, 10L) })
  }

  test("near-dup edges: empty-content class matches the full relation") {
    val s = spark
    import s.implicits._
    // empty docs carry the single empty-stream shingle by design (mirrors
    // the oracle's [''] set), so they are J=1 dups of each other in the
    // FULL relation — the edge form must agree, via a star edge, not drop
    // the class (component equivalence includes the degenerate class)
    val corpus = Seq((1L, ""), (2L, ""), (3L, "real content page one here"),
      (4L, "real content page one here")).toDF("doc_id", "text")
    val edgeSet = DedupFunctions.minhashNearDupEdges(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullSet = DedupFunctions.minhashNearDuplicates(corpus, "doc_id", "text", 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet == Set((1L, 2L), (3L, 4L)))
    assert(fullSet == edgeSet) // singleton-free fixture: forms coincide
  }

  test("incremental minhash: increment probes the corpus index, corpus pairs excluded") {
    val s = spark
    import s.implicits._
    // corpus: 10, 12 are near-dups of each other (corpus-internal — must NOT
    // re-emerge); increment doc 21 is a near-dup of corpus doc 10, increment
    // docs 21/23 are exact dups of each other.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (10L, s"$base today"), (12L, s"$base today"),
      (14L, "entirely unrelated corpus content about catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (21L, s"$base tonight"), (23L, s"$base tonight"),
      (25L, "fresh novel increment content with no duplicates anywhere")
    ).toDF("doc_id", "text")
    val idx = DedupFunctions.minhashBandIndex(corpus, "doc_id", "text")
    val pairs = DedupFunctions.minhashNearDuplicatesIncremental(
      incoming, corpus, idx, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((21L, 23L)))            // within-increment
    assert(pairs.contains((10L, 21L)) || pairs.contains((10L, 23L))) // cross
    assert(!pairs.contains((10L, 12L)))           // corpus-internal excluded
    pairs.foreach { case (a, b) =>
      assert(a >= 21L || b >= 21L, s"pair ($a,$b) touches no increment doc") }

    // append-idempotence: a crash-retried index append duplicates rows; the
    // probe must distinct() them or inflated bucket counts cross the hot
    // cap and silently drop pairs. Cap 4 fits the real population (docs
    // 10,12,21,23 share buckets) — only RAW duplicate rows would cross it.
    val dupIdx = idx.unionByName(idx)
    val pairsDup = DedupFunctions.minhashNearDuplicatesIncremental(
      incoming, corpus, dupIdx, "doc_id", "text", threshold = 0.5,
      maxBucketSize = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsDup == pairs,
      s"duplicated index rows changed the result: $pairs vs $pairsDup")
  }

  test("foldClusterLabels: contracted merge equals batch, incl. component bridging") {
    val s = spark
    import s.implicits._
    // base state: two separate components {1,2} and {4,5}
    val basePairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val l0 = DedupFunctions.foldClusterLabels(None, basePairs)
    assert(l0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L)))
    // increment doc 3 BRIDGES them: (2,3) and (3,4) must merge both old
    // components into one — the fold's hard path (old cluster 4 relabels
    // to 1 through the contracted graph, not just new rows appended)
    val incPairs = Seq((2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val l1 = DedupFunctions.foldClusterLabels(Some(l0), incPairs)
    val batch = DedupFunctions.duplicateClusters(
      basePairs.unionByName(incPairs))
    assert(l1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(l1.filter(col("cluster") =!= 1L).isEmpty, "bridge did not merge")
    // a new MIN id arriving re-labels the whole component it joins
    val l2 = DedupFunctions.foldClusterLabels(Some(l1),
      Seq((0L, 5L)).toDF("id_a", "id_b"))
    assert(l2.collect().map(_.getLong(1)).toSet == Set(0L))
    assert(l2.count() == 6)
    // pairs internal to one existing component are a no-op fold
    val l3 = DedupFunctions.foldClusterLabels(Some(l2),
      Seq((1L, 4L)).toDF("id_a", "id_b"))
    assert(l3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      l2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("foldClusterLabels: two-increment minhash chain equals batch clustering") {
    val s = spark
    import s.implicits._
    // three near-dup families spread across base + two increments, so
    // cross-increment pairs exist at every fold
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def part(m: Int) = all.filter(col("doc_id") % 3 === m)
    val (base, inc1, inc2) = (part(0), part(1), part(2))
    val thr = 0.9

    val l0 = DedupFunctions.foldClusterLabels(None,
      DedupFunctions.minhashNearDuplicates(base, "doc_id", "text", thr))
    val idx0 = DedupFunctions.minhashBandIndex(base, "doc_id", "text")
    val p1 = DedupFunctions.minhashNearDuplicatesIncremental(
      inc1, base, idx0, "doc_id", "text", threshold = thr)
    val l1 = DedupFunctions.foldClusterLabels(Some(l0), p1)
    val idx1 = idx0.unionByName(
      DedupFunctions.minhashBandIndex(inc1, "doc_id", "text"))
    val p2 = DedupFunctions.minhashNearDuplicatesIncremental(
      inc2, base.unionByName(inc1), idx1, "doc_id", "text", threshold = thr)
    val l2 = DedupFunctions.foldClusterLabels(Some(l1), p2)

    val batch = DedupFunctions.duplicateClusters(
      DedupFunctions.minhashNearDuplicates(all, "doc_id", "text", thr))
    val got = l2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"chain-folded labels diverge from batch: extra=${got -- want} missing=${want -- got}")
  }

  test("splitByCluster: near-dup clusters never straddle the split") {
    val s = spark
    import s.implicits._
    val docsDf = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain clusters {1..4}, {10,11}, plus scattered singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = DedupFunctions.splitByCluster(docsDf, pairs, "doc_id", 0.8)
      .select("doc_id", "split_key", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    assert(Set(1L, 2L, 3L, 4L).map(byDoc).size == 1) // one side only
    assert(Set(10L, 11L).map(byDoc).size == 1)
    // cluster members share the representative key; singletons keep their id
    out.foreach { case (id, key, _) =>
      if (id <= 4) assert(key == 1L)
      else if (id == 10 || id == 11) assert(key == 10L)
      else assert(key == id)
    }
    // both splits are populated at this size
    assert(out.map(_._3).toSet == Set("train", "validation"))
  }

  test("duplicateClusters matches union-find on random pair graphs") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // min-id representative == union-by-min root
      nodes.map(v => v -> find(v)).toMap
    }

    val gen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield pairs.distinct

    // BOTH physical paths must match the reference: the adaptive driver
    // union-find (default threshold) and the distributed pointer-jumping
    // propagation (threshold forced to 0)
    val saved = DedupFunctions.driverUnionFindMaxPairs
    try {
      for (threshold <- Seq(saved, 0L)) {
        DedupFunctions.driverUnionFindMaxPairs = threshold
        for (seed <- 1 to 5) {
          val pairs = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
          val expected = unionFind(0, pairs)
          val got = DedupFunctions.duplicateClusters(
            pairs.toDF("id_a", "id_b"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          assert(got == expected, s"threshold=$threshold seed=$seed pairs=$pairs")
        }
      }
    } finally DedupFunctions.driverUnionFindMaxPairs = saved
  }

  test("duplicateClusters closes pair chains transitively (min-id labels)") {
    val s = spark
    import s.implicits._
    // two components: {1,2,3,4} as a chain 1-2, 2-3, 3-4 (1≁3, 1≁4 directly)
    // and {7,8}; node 9 appears in no pair.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("id_a", "id_b")
    val labels = DedupFunctions.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L))

    val corpus = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L)
      .toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
    val kept = DedupFunctions.dropNearDuplicateClusters(corpus, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // one representative per component + the unpaired doc
    assert(kept == Set(1L, 7L, 9L))
  }

  test("cluster operators leave zero persisted RDDs behind (no leaks)") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val docs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L)
      .toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    // batch clustering, an incremental fold, AND the incremental LSH probe
    // (every path that materializes intermediates): each must clean up its
    // own checkpoints once its result is materialized — the bench's
    // leaked_rdds gate asserts the same invariant per query.
    DedupFunctions.duplicateClusters(pairs).count()
    val l0 = DedupFunctions.foldClusterLabels(None, pairs)
    DedupFunctions.foldClusterLabels(Some(l0),
      Seq((3L, 4L)).toDF("id_a", "id_b")).count()
    DedupFunctions.minhashNearDuplicatesIncremental(
      docs.filter($"doc_id" % 2 === 1), docs.filter($"doc_id" % 2 === 0),
      DedupFunctions.minhashBandIndex(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text"),
      "doc_id", "text", threshold = 0.9).count()
    val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("keepBestPerCluster: max score survives, ties break to min id") {
    val s = spark
    import s.implicits._
    // components {1,2,3,4} and {7,8}; 9 unpaired. Scores pick 3 from the
    // first (strictly best) and 7 from the second (tie with 8 → min id).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("id_a", "id_b")
    val corpus = Seq((1L, 10.0), (2L, 30.0), (3L, 99.0), (4L, 50.0),
      (7L, 5.0), (8L, 5.0), (9L, 0.0)).toDF("doc_id", "quality")
    val kept = DedupFunctions.keepBestPerCluster(
      corpus, pairs, "doc_id", col("quality"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L, 9L), s"kept: $kept")
    // schema preserved, no helper columns leak
    assert(DedupFunctions.keepBestPerCluster(
      corpus, pairs, "doc_id", col("quality")).columns.toSeq ==
      Seq("doc_id", "quality"))
  }

  test("repeated spans: cross-doc verbatim windows merge and scrub exactly") {
    val s = spark
    import s.implicits._
    // a1..a8 is an 8-token span shared VERBATIM by docs 1 and 2 at different
    // offsets; doc 3 has no 8-window in common with anyone; doc 4 is shorter
    // than the window; docs 5 and 6 are identical 10-token docs (fully
    // covered by their three repeated windows)
    val shared = (1 to 8).map("a" + _).mkString(" ")
    val corpus = Seq(
      (1L, s"p1 p2 p3 $shared q1 q2"),
      (2L, s"$shared r1 r2 r3 r4 r5"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (4L, "short doc"),
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (6L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    ).toDF("doc_id", "text")

    val stats = DedupFunctions.repeatedSpanStats(corpus, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 6 windows total (13 tokens), exactly 1 repeated (the shared
    // span), 1 merged span covering its 8 tokens
    assert(stats(1L) == ((6L, 1L, 1L, 8L)))
    assert(stats(2L) == ((6L, 1L, 1L, 8L)))
    // docs 5/6: all 3 windows repeated, merging into ONE span of 10 tokens
    assert(stats(5L) == ((3L, 3L, 1L, 10L)))
    assert(stats(6L) == ((3L, 3L, 1L, 10L)))
    // untouched docs never appear
    assert(!stats.contains(3L) && !stats.contains(4L))

    val clean = DedupFunctions.scrubRepeatedSpans(corpus, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(clean(1L) == (("p1 p2 p3 q1 q2", 5L)))
    assert(clean(2L) == (("r1 r2 r3 r4 r5", 5L)))
    // all docs pass through, normalized; full-coverage docs survive empty
    assert(clean(3L) == (("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", 10L)))
    assert(clean(4L) == (("short doc", 2L)))
    assert(clean(5L) == (("", 0L)))
    assert(clean(6L) == (("", 0L)))
  }

  test("scrubContaminatedSpans cuts benchmark overlaps, keeps clean text") {
    val s = spark
    import s.implicits._
    val leak = (1 to 8).map("b" + _).mkString(" ") // a benchmark sentence
    val corpus = Seq(
      (1L, s"intro words here $leak closing words"),   // quotes the benchmark
      (2L, "completely clean document with no overlap at all"),
      (3L, leak)                                       // IS the benchmark text
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"$leak and more benchmark content"))
      .toDF("doc_id", "text")
    val out = DedupFunctions.scrubContaminatedSpans(corpus, bench,
      "doc_id", "text", window = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("intro words here closing words", 5L)))
    assert(out(2L) == (("completely clean document with no overlap at all", 8L)))
    assert(out(3L) == (("", 0L))) // fully contaminated doc survives empty
  }

  test("span dedup: Bloom-prefiltered plan is result-identical to the direct plan") {
    // the adaptive prefilter (engaged on big inputs) must be a pure plan
    // choice: forced-on and forced-off runs agree row-for-row on a corpus
    // with dense accidental repeats (the exact-verify must kill both FPP
    // ghosts and same-doc-only repeats)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = ((1L to 150L).map { id =>
      val len = 2 + rnd.nextInt(24)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (999L, "x1 x2 x3 x1 x2 x3 x1 x2 x3 x1 x2 x3")) // same-doc-only repeats
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val window = 4
    val direct = DedupFunctions.repeatedSpanStats(
      corpus, "doc_id", "text", window, prefilter = Some(false))
    val bloom = DedupFunctions.repeatedSpanStats(
      corpus, "doc_id", "text", window, prefilter = Some(true))
    assert(direct.count() > 0, "vacuous fixture")
    assert(rows(direct) == rows(bloom))
    assert(rows(DedupFunctions.scrubRepeatedSpans(
      corpus, "doc_id", "text", window, prefilter = Some(false))) ==
      rows(DedupFunctions.scrubRepeatedSpans(
        corpus, "doc_id", "text", window, prefilter = Some(true))))
    // the doc with only SAME-doc repeats must not appear in either
    assert(!rows(direct).exists(_.head == 999L))
  }

  test("span stats and scrub agree: covered + kept == total, per doc") {
    val s = spark
    import s.implicits._
    // randomized corpus over a 12-word vocabulary: plenty of accidental
    // cross-doc 4-windows. Deterministic seed — reproducible on failure.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (1L to 120L).map { id =>
      val len = 2 + rnd.nextInt(30)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val window = 4
    val totals = corpus
      .select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stats = DedupFunctions.repeatedSpanStats(corpus, "doc_id", "text", window)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap // covered_tokens
    val kept = DedupFunctions.scrubRepeatedSpans(corpus, "doc_id", "text", window)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // n_tokens_kept
    assert(stats.nonEmpty, "seeded corpus produced no repeated spans — vacuous")
    assert(kept.keySet == totals.keySet, "scrub must pass every doc through")
    totals.foreach { case (id, n) =>
      val covered = stats.getOrElse(id, 0L)
      assert(covered + kept(id) == n,
        s"doc $id: covered=$covered kept=${kept(id)} total=$n")
    }
  }

  test("cross-source pair union closes into ONE cluster across the bridge") {
    // the q_crossmodal_dedup composition: a text near-dup (1,2) and an
    // image near-dup (2,3) from DIFFERENT detectors must land all three
    // docs in one component — per-modality clustering cannot express this
    val s = spark
    import s.implicits._
    val textPairs = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val imgPairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val labels = graft.functions.DedupFunctions.foldClusterLabels(None,
      textPairs.unionByName(imgPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
