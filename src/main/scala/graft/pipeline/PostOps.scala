package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.Extractor
import graft.load.Loader
import graft.model.TableId
import graft.operators.Relational

/** Post-load derived-table stage (YAML `post_ops`) — the reference runs its
  * ROW_NUMBER dedup and "latest status" views as SQL inside every sync
  * (settle_orders_download_and_sync.py:275-388, LATEST_STATUS_USAGE.sql:
  * 17-40); here each op maintains a derived warehouse table right after the
  * base table's load, inside the same table session lock.
  *
  * Two execution shapes:
  *  - VIEW ops (`dedup_latest`, `latest_status`): full recompute from the
  *    base table, atomically swapped in — idempotent by construction.
  *  - FOLD ops (`scd2_apply`, `fold_aggregate`): incremental — fold ONLY the
  *    staged sessions not yet folded, tracked by a session-tag cursor
  *    committed atomically WITH the derived data ([[Loader.replaceDerived]]).
  *    Crash before the swap → cursor unmoved → the next sync refolds the
  *    same sessions (convergent); crash after → sessions are skipped
  *    (exactly-once). A re-run with no new sessions is a no-op.
  *
  * Scale: view ops cost one scan of the base table per sync (the
  * reference's post-SQL rebuilds its views the same way); fold ops cost one
  * scan of the INCREMENT plus a state-cardinality merge — history-depth- and
  * corpus-size-independent, which is the point of having them.
  */
object PostOps {

  def run(spark: SparkSession, spec: TableSpec, id: TableId,
          extractor: Extractor, loader: Loader): Unit =
    spec.postOps.foreach(runOne(spark, spec, id, _, extractor, loader))

  private def runOne(spark: SparkSession, spec: TableSpec, id: TableId,
                     po: PostOpSpec, extractor: Extractor,
                     loader: Loader): Unit = {
    val derivedId = id.copy(table = po.target)
    po.op match {
      case "dedup_latest" =>
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId, Relational.dedupLatestByTs(
          base, po.keys, po.tsColumn.get, po.idColumn.get))
        ()
      case "latest_status" =>
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId, Relational.latestStatusSummary(
          base, po.keys.head, po.statusColumn.get, po.tsColumn.get,
          po.idColumn.get))
        ()
      case "majority_vote" =>
        // aggregated annotation labels (VIEW shape): the derived table is
        // the per-item majority label + agreement over the current
        // warehouse state — the consumable an RLHF/label pipeline reads,
        // refreshed by every sync (pair with reliability_gate to refuse
        // noisy batches before they reach this view)
        val base = requireBase(spark, loader, id, po)
        val Seq(itemV, raterV, labelV) = po.keys
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.majorityVote(
            base, itemV, raterV, labelV))
        ()
      case "data_card" =>
        // the dataset-release report recomputed per sync (VIEW shape):
        // the derived table holds the corpus's tall (metric, value) data
        // card over the current warehouse state, so the release numbers
        // ride every sync instead of a manual audit job
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.dataCard(
            base, po.textColumn.get, po.keys.head))
        ()
      case "c4_clean" =>
        // C4 page cleanup (VIEW shape): the derived table holds each doc's
        // line-filter counts, the page verdict, and the cleaned text over
        // the current warehouse state — downstream stages read
        // `WHERE kept_doc` instead of re-running the filter
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId,
          graft.functions.TextFunctions.c4Clean(base, po.idColumn.get,
            po.textColumn.get, minSentences = po.k.getOrElse(3)))
        ()
      case "scd2_apply" =>
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => Relational.scd2Apply(
            prev, inc, po.keys, po.tsColumn.get, po.attrColumns))
      case "fold_aggregate" =>
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => Relational.foldAggregate(prev, inc, po.keys, po.sums))
      // deterministic sketch folds (graft.operators.Sketches): bounded
      // per-group state maintained per sync, bit-identical to a one-pass
      // build over everything synced so far (exact merge invariance), read
      // back through Sketches.read* at query time
      case "fold_kmv_distinct" =>
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.operators.Sketches.foldKmvDistinct(
            prev, inc, po.keys, po.valueColumn.get, po.k.getOrElse(256)))
      case "fold_count_min" =>
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.operators.Sketches.foldCountMin(
            prev, inc, po.keys, po.valueColumn.get))
      case "fold_sample" =>
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.operators.Sketches.foldSampleState(
            prev, inc, po.keys, po.idColumn.get, po.valueColumn.get,
            po.k.getOrElse(256)))
      case "fold_bm25" =>
        // persisted BM25 inverted index (postings + doc lengths), appended
        // per sync — read back with CorpusFunctions.bm25FromIndex. Same
        // new-docs-only contract as neardup_labels' band index.
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.functions.CorpusFunctions.foldBm25Index(
            prev, inc, po.idColumn.get, po.valueColumn.get))
      case "fold_bpe_tokens" =>
        // incremental pre-tokenization: the FIRST sync trains the BPE
        // merges on its increment and freezes them; later syncs encode
        // under the frozen vocabulary and append per-doc counts — token
        // counts stay comparable across the whole corpus lifetime. Read
        // back with BpeFunctions.bpeTokensFromState / bpeMergesFromState.
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.functions.BpeFunctions.foldBpeTokens(
            prev, inc, po.idColumn.get, po.valueColumn.get,
            po.k.getOrElse(8)))
      case "drift_gate" =>
        // per-sync distribution-drift QUALITY GATE: the derived table is
        // the persisted category-count mix of everything folded so far;
        // each increment's mix is PSI-checked against it BEFORE folding.
        // A breach throws → the table reports failure and the fold cursor
        // stays put, so the offending increment is re-gated (not silently
        // folded) on every retry until an operator intervenes. First sync
        // has no state → no gate (it DEFINES the baseline mix).
        val catCol = po.keys.head
        val thr = po.threshold.get
        foldIncremental(spark, id, derivedId, extractor, loader)(
          (prev, inc) => graft.functions.CorpusFunctions.driftGateFold(
            prev, inc, catCol, thr, what = s"${id.table}.$catCol"))
      case "fold_probe" =>
        // ONLINE-LEARNED linear probe as pipeline state: each sync takes k
        // exact-integer GD steps on ITS increment, warm-started from the
        // persisted weights (graft.functions.LearnFunctions scaladoc). The
        // state is the (dim, wq) weight table; the fold cursor makes the
        // step sequence exactly-once, so the weights are a pure function
        // of the ordered increment sequence (crash replay retrains the
        // same increment from the same warm start — convergent). Labels
        // derive in-engine: y = [value_column >= threshold].
        val vecCol = po.vectorColumn.get
        val valCol = po.valueColumn.get
        val thr = po.threshold.get
        val steps = po.k.getOrElse(4)
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc) =>
          import org.apache.spark.sql.functions.{col, lit, when}
          val staged = inc.select(
            graft.functions.LearnFunctions.quantize(col(vecCol)).as("__xq"),
            when(col(valCol).cast("double") >= thr, 1L).otherwise(0L)
              .as("__y"))
          if (staged.isEmpty) {
            // an empty staged session (idle re-sync) takes no GD steps
            import spark.implicits._
            prev.getOrElse(Seq.empty[(Int, java.math.BigDecimal)]
              .toDF("dim", "wq")
              .select(col("dim"),
                col("wq").cast(org.apache.spark.sql.types.DecimalType(38, 0))
                  .as("wq")))
          } else {
            val w0 = prev.map(_.collect()
              .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
              .toMap).filter(_.nonEmpty)
              .map(m => Array.tabulate(m.size)(m(_)))
            val w1 = graft.functions.LearnFunctions.trainLinearProbe(
              staged, "__xq", "__y", iters = steps, initWeights = w0)
            import spark.implicits._
            w1.zipWithIndex
              .map { case (wq, d) =>
                (d, new java.math.BigDecimal(wq.bigInteger)) }
              .toSeq.toDF("dim", "wq")
              .select(col("dim"),
                col("wq").cast(org.apache.spark.sql.types.DecimalType(38, 0))
                  .as("wq"))
          }
        }
      case "rebalance" =>
        // explicit-target mixture carve-out (VIEW shape): the derived table
        // is the corpus downsampled to the configured integer-weight
        // mixture (CorpusFunctions.rebalanceToMixture) — recomputed from
        // the base per sync and atomically swapped, so quotas track corpus
        // growth while the md5 pick order keeps the selection stable
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.rebalanceToMixture(
            base, po.keys.head, po.weights, po.idColumn.get))
        ()
      case "dsir_select" =>
        // DSIR importance selection (VIEW shape): the derived table is the
        // top-k base-table documents whose hashed-n-gram distribution
        // looks most like the `reference` warehouse table (a trusted seed
        // set — possibly itself a derived table of an EARLIER post_op on
        // this table; post_ops run in YAML order, so chaining
        // rebalance → dsir_select works). Recomputed per sync: both
        // distributions collapse to 256-row broadcasts, so the recompute
        // costs one corpus scan — the same bill as every other view op.
        val base = requireBase(spark, loader, id, po)
        val refId = id.copy(table = po.reference.get)
        val targetCorpus = loader.readTarget(spark, refId).getOrElse(
          throw new IllegalStateException(
            s"post_op 'dsir_select' (target ${po.target}): reference " +
              s"table ${refId.scoped} has never been loaded"))
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.dsirSelect(
            base, targetCorpus, po.idColumn.get, po.textColumn.get,
            po.k.getOrElse(100)))
        ()
      case "contamination_gate" =>
        // per-sync benchmark-leakage QUALITY GATE (the drift_gate pattern
        // applied to decontamination): each increment's docs are shingle-
        // scored against the `reference` benchmark table BEFORE folding;
        // any doc at/above `threshold` overlap throws — the table reports
        // failure with the fold cursor unmoved, so the offending increment
        // is re-gated on every retry. Clean increments append their sparse
        // contamination rows (overlap ≥ min_overlap... here: > 0) to the
        // derived report, so the cumulative audit rides the same state.
        val thr = po.threshold.get
        val refId2 = id.copy(table = po.reference.get)
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc) =>
          import org.apache.spark.sql.functions.{col, max => fmax}
          val bench = loader.readTarget(spark, refId2).getOrElse(
            throw new IllegalStateException(
              s"post_op 'contamination_gate' (target ${po.target}): " +
                s"benchmark table ${refId2.scoped} has never been loaded"))
          // scratch-materialize the sparse matrix ONCE: the worst-overlap
          // probe and the report persist both read the files instead of
          // re-shingling the increment. Scratch, not localCheckpoint —
          // when the gate THROWS below, a checkpoint's blocks leaked on
          // executors and accumulated on every retry of the failing
          // increment; scratch files are disk-bounded and swept at exit.
          val m = graft.util.Scratch.materialize(
            graft.functions.CorpusFunctions.contaminationMatrix(
              inc, bench.select(org.apache.spark.sql.functions
                .lit(po.reference.get).as("benchmark"),
                col(po.textColumn.get)),
              po.idColumn.get, po.textColumn.get, "benchmark"),
            "contamination_matrix")
          val worstRow = m.agg(fmax(col("overlap"))).head()
          val worst = if (worstRow.isNullAt(0)) 0.0 else worstRow.getDouble(0)
          if (worst >= thr) throw new IllegalStateException(
            f"contamination_gate ${id.table}: increment doc overlaps " +
              f"benchmark ${po.reference.get} at $worst%.3f >= $thr — " +
              "decontaminate the increment before syncing")
          prev.fold(m)(p => p.unionByName(m))
        }
      case "reliability_gate" =>
        // annotation-reliability QUALITY GATE (the drift_gate pattern
        // applied to label collection): each increment's ratings must
        // reach `threshold` Krippendorff alpha BEFORE folding; a
        // below-threshold batch fails the table with the fold cursor
        // unmoved, so the same batch is re-gated on every retry. Passing
        // increments append their one-row reliability report to the
        // derived audit table. An increment with no pairable items has no
        // alpha (NULL report) and passes vacuously.
        val minAlpha = po.threshold.get
        val Seq(itemC, raterC, labelC) = po.keys
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc) =>
          graft.functions.CorpusFunctions.reliabilityGateFold(
            prev, inc, itemC, raterC, labelC, minAlpha, id.table)
        }
      case "curriculum" =>
        // score-ordered curriculum shard layout (VIEW shape): the derived
        // table addresses every doc with (shard, pos) contiguous
        // difficulty bands over `value_column` ascending (easiest first;
        // store a negated score for fluency-style metrics). Recomputed
        // per sync so the bands track corpus growth.
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.curriculumShards(
            base, po.idColumn.get, po.valueColumn.get,
            po.k.getOrElse(16)))
        ()
      case "epoch_shards" =>
        // deterministic training-serving shard layout (VIEW shape): the
        // derived table is each row's (id, shard, pos) address for the
        // configured epoch — a pure function of (epoch, id), so the
        // recompute-per-sync is idempotent and bumping `epoch` in the YAML
        // re-deals the layout on the next sync
        val base = requireBase(spark, loader, id, po)
        loader.replaceDerived(spark, derivedId,
          graft.functions.CorpusFunctions.epochShards(
            base, po.idColumn.get, po.epoch.getOrElse(0),
            po.k.getOrElse(1)))
        ()
      case "zorder" =>
        // in-place layout rewrite of the BASE table (crash-safe swap, row
        // parity verified) — idempotent, so a replayed sync just re-sorts
        loader.rewriteLayoutZorder(spark, id, po.keys)
        ()
      case "neardup_labels" =>
        // incremental MinHash near-dup CLUSTER maintenance as pipeline
        // config: the derived table is the (id, cluster) label relation,
        // equal to batch clustering of everything loaded so far while each
        // sync pays only its increment — band-probe pair generation against
        // the persisted band index
        // (DedupFunctions.minhashNearDuplicatesIncremental) + contracted
        // label fold (foldClusterLabels). The band index lives in a hidden
        // sibling of the label table (the tombstone side-table convention)
        // and is APPEND-maintained; a replayed session appends duplicate
        // band rows (tolerated — the probe distincts them) and refolds the
        // same pairs (a no-op fold), so the whole op is crash-convergent
        // under the fold cursor's exactly-once rules.
        //
        // Equality caveat (inherent to capped LSH): batch-equality is
        // relative to each sync's hot-bucket populations. A (band,bucket)
        // crossing maxBucketSize as the corpus grows is DROPPED going
        // forward, but pairs folded while it was small persist — labels
        // are monotone (dedup decisions never un-happen), so a from-scratch
        // batch run over the grown corpus can label strictly less. The
        // append-only/no-update contract itself is enforced at config
        // parse (id_only strategy, no merge_keys, no backlog trim).
        val idc = po.idColumn.get
        val txt = po.textColumn.get
        val thr = po.threshold.getOrElse(0.9)
        val bandsPath = loader.targetPath(derivedId) + ".__bands"
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc0) =>
          import org.apache.spark.sql.functions.col
          val inc = inc0.select(col(idc), col(txt))
          // the base table loaded BEFORE post-ops run, so the increment is
          // already in it — the probe corpus is everything else
          val corpus = requireBase(spark, loader, id, po)
            .select(col(idc), col(txt))
            .join(inc.select(col(idc)), Seq(idc), "left_anti")
          val fs = new org.apache.hadoop.fs.Path(bandsPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val corpusIndex =
            if (fs.exists(new org.apache.hadoop.fs.Path(bandsPath)))
              spark.read.parquet(bandsPath)
            else // first sync: empty index with the right schema
              graft.functions.DedupFunctions.minhashBandIndex(
                corpus.limit(0), idc, txt)
          // ONE shingle+minhash pass over the increment serves both the
          // probe and the persisted-index append (scratch, not a
          // checkpoint: the fold result still references it after this
          // lambda returns, so a checkpoint had no unpersist point and
          // leaked one RDD per sync)
          val incIndex = graft.util.Scratch.materialize(
            graft.functions.DedupFunctions.minhashBandIndex(inc, idc, txt),
            "sync_band_index")
          val newPairs = graft.functions.DedupFunctions
            .minhashNearDuplicatesIncremental(inc, corpus, corpusIndex,
              idc, txt, threshold = thr,
              maxBucketSize = po.maxBucketSize.getOrElse(1000),
              incomingIndex = Some(incIndex))
          // maintain the index FIRST: a crash between the append and the
          // label swap replays with duplicate band rows (harmless) rather
          // than with an index missing this session's documents
          incIndex.write.mode("append").parquet(bandsPath)
          graft.functions.DedupFunctions.foldClusterLabels(prev, newPairs)
        }
      case "neardup_labels_edges" =>
        // the EDGE-FORM twin of neardup_labels — per-sync cost at
        // DISTINCT-CONTENT scale: the increment collapses by exact
        // fingerprint against a persisted (fingerprint, rep_id) side
        // table, content the corpus already knows star-joins its corpus
        // rep with NO banding, and only genuinely-new content probes a
        // REP-COLLAPSED band index. Same crash/append-only/hot-bucket
        // contracts as neardup_labels; the label relation folds to the
        // same clusters (stars are component-equivalent to the full pair
        // relation — DedupSpec chains the fold against batch).
        val idc = po.idColumn.get
        val txt = po.textColumn.get
        val thr = po.threshold.getOrElse(0.9)
        val fpsPath = loader.targetPath(derivedId) + ".__repfps"
        val bandsPath = loader.targetPath(derivedId) + ".__repbands"
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc0) =>
          import org.apache.spark.sql.functions.col
          val inc = inc0.select(col(idc), col(txt))
          val corpus = requireBase(spark, loader, id, po)
            .select(col(idc), col(txt))
            .join(inc.select(col(idc)), Seq(idc), "left_anti")
          val fs = new org.apache.hadoop.fs.Path(fpsPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          def orEmpty(path: String, empty: => org.apache.spark.sql.DataFrame) =
            if (fs.exists(new org.apache.hadoop.fs.Path(path)))
              spark.read.parquet(path)
            else empty
          val D = graft.functions.DedupFunctions
          // CRASH-REPLAY: restrict the side table to reps the COMMITTED
          // corpus actually contains BEFORE deriving novelty. A crash
          // between the side-table appends below and the label swap
          // replays against a table already holding THIS increment's
          // fingerprints (keyed by increment ids) — deriving newFps from
          // the raw table would come back empty, the probe index passed
          // to the incremental would be empty, and the increment's
          // genuine near-dup links to the corpus would be silently lost
          // (the same restriction minhashNearDupEdgesIncremental applies
          // internally — it must ALSO gate the caller-supplied probe
          // index, or the internal fix is bypassed). PipelineSpec replays
          // the crash window end-to-end through this post-op.
          val corpusRepFps = orEmpty(fpsPath,
            D.repFingerprints(corpus.limit(0), idc, txt))
            .join(corpus.select(col(idc).as("rep_id")), Seq("rep_id"),
              "left_semi")
          val corpusRepIndex = orEmpty(bandsPath,
            D.minhashBandIndex(corpus.limit(0), idc, txt))
          // the increment's NEW-content classes and their reps' band rows
          // feed both the probe and the side-table appends — computed once
          // (scratch; the returned fold still reads lazily)
          val newFps = graft.util.Scratch.materialize(
            D.repFingerprints(inc, idc, txt)
              .join(corpusRepFps.select(col("fingerprint")),
                Seq("fingerprint"), "left_anti"),
            "sync_new_fps")
          // rep restriction on the BAND rows (longs), never a docs
          // semi-join that would shuffle the increment's text at scale
          val newRepIndex = graft.util.Scratch.materialize(
            D.minhashBandIndex(inc, idc, txt)
              .join(newFps.select(col("rep_id").as("doc_id")),
                Seq("doc_id"), "left_semi"),
            "sync_rep_band")
          val edges = D.minhashNearDupEdgesIncremental(inc, corpus,
            corpusRepFps, corpusRepIndex, idc, txt, threshold = thr,
            maxBucketSize = po.maxBucketSize.getOrElse(1000),
            incomingRepIndex = Some(newRepIndex))
          // side tables FIRST (the neardup_labels crash ordering): a crash
          // between appends and the label swap replays with duplicate
          // rows (tolerated — readers distinct) rather than an index
          // missing this session's content
          newFps.write.mode("append").parquet(fpsPath)
          newRepIndex.write.mode("append").parquet(bandsPath)
          D.foldClusterLabels(prev, edges)
        }
      case "simhash_labels" =>
        // the SimHash twin of neardup_labels: incremental whole-page
        // near-dup cluster maintenance under a persisted SIGNATURE band
        // index. Cheaper per sync than MinHash (no shingle sets, no exact-
        // Jaccard verify joins — Hamming distance is pure signature
        // arithmetic from index rows), at SimHash's coarser granularity.
        // Exact by pigeonhole, so chained folds equal batch clustering of
        // everything loaded (the same argument as neardup_labels, WITHOUT
        // its hot-bucket caveat — this path has no cap). Same append-only
        // contract, enforced at parse.
        val idc = po.idColumn.get
        val txt = po.textColumn.get
        val maxH = po.k.getOrElse(3)
        val bandsPath = loader.targetPath(derivedId) + ".__simbands"
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc0) =>
          import org.apache.spark.sql.functions.col
          val inc = inc0.select(col(idc), col(txt))
          val fs = new org.apache.hadoop.fs.Path(bandsPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val corpusIndex =
            if (fs.exists(new org.apache.hadoop.fs.Path(bandsPath)))
              spark.read.parquet(bandsPath)
            else // first sync: empty index with the right schema
              graft.functions.DedupFunctions.simhashBandIndex(
                inc.limit(0), idc, txt, maxH)
          // ONE tokenize+band pass over the increment serves both the
          // probe and the persisted-index append
          val incIndex = graft.util.Scratch.materialize(
            graft.functions.DedupFunctions.simhashBandIndex(
              inc, idc, txt, maxH), "sync_simhash_index")
          val newPairs = graft.functions.DedupFunctions
            .simhashNearDuplicatesIncremental(inc, corpusIndex, idc, txt,
              maxH, incomingIndex = Some(incIndex))
            .select(col("id_a"), col("id_b"))
          // index append FIRST (crash-replay duplicates band rows, which
          // the probe tolerates; the reverse order loses documents)
          incIndex.write.mode("append").parquet(bandsPath)
          graft.functions.DedupFunctions.foldClusterLabels(prev, newPairs)
        }
      case "image_neardup_labels" =>
        // the IMAGE twin of simhash_labels: incremental perceptual near-dup
        // cluster maintenance under a persisted (id, dims, dhash) hash
        // table. Each sync decodes ONLY its increment's images (the corpus
        // is never re-decoded — the hash table carries everything the
        // banded Hamming probe needs), probes by pigeonhole-exact banding,
        // folds new pairs into the labels, and appends the increment's
        // hash rows. Same append-only contract, enforced at parse.
        val idc = po.idColumn.get
        val payc = po.valueColumn.get
        val maxH = po.k.getOrElse(2)
        val hashesPath = loader.targetPath(derivedId) + ".__imghashes"
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc0) =>
          import org.apache.spark.sql.functions.col
          val inc = inc0.select(col(idc), col(payc).as("payload"))
          val fs = new org.apache.hadoop.fs.Path(hashesPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val corpusHashes =
            if (fs.exists(new org.apache.hadoop.fs.Path(hashesPath)))
              spark.read.parquet(hashesPath)
            else // first sync: empty hash table with the right schema
              graft.multimodal.Multimodal.imagePerceptualHashes(
                spark, inc.limit(0), idc)
          // ONE decode pass over the increment serves both the probe and
          // the persisted-table append
          val incHashes = graft.util.Scratch.materialize(
            graft.multimodal.Multimodal.imagePerceptualHashes(
              spark, inc, idc), "sync_img_hashes")
          val newPairs = graft.multimodal.Multimodal
            .imageNearDuplicatesIncremental(incHashes, corpusHashes,
              maxH, idc)
            .select(col("id_a"), col("id_b"))
          // hash append FIRST (crash-replay duplicates hash rows, which
          // the probe tolerates; the reverse order loses images)
          incHashes.write.mode("append").parquet(hashesPath)
          graft.functions.DedupFunctions.foldClusterLabels(prev, newPairs)
        }
      case "embedding_neardup" =>
        // the EMBEDDING twin: incremental semantic near-dup cluster
        // maintenance under a persisted random-hyperplane band index.
        // Bucket membership is a pure function of the vector (md5-derived
        // plane constants), so each sync's probe equals the batch candidate
        // set restricted to incoming-side pairs; exact cosine verifies
        // against the loaded corpus vectors. Same append-only contract and
        // hot-bucket caveat as neardup_labels.
        val idc = po.idColumn.get
        val vecc = po.vectorColumn.get
        val thr = po.threshold.get
        val bandsPath = loader.targetPath(derivedId) + ".__cosbands"
        foldIncremental(spark, id, derivedId, extractor, loader) { (prev, inc0) =>
          import org.apache.spark.sql.functions.col
          val inc = inc0.select(col(idc), col(vecc))
          val corpus = requireBase(spark, loader, id, po)
            .select(col(idc), col(vecc))
            .join(inc.select(col(idc)), Seq(idc), "left_anti")
          val fs = new org.apache.hadoop.fs.Path(bandsPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val corpusIndex =
            if (fs.exists(new org.apache.hadoop.fs.Path(bandsPath)))
              spark.read.parquet(bandsPath)
            else
              graft.functions.VectorFunctions.cosineLshBandIndex(
                inc.limit(0), idCol = idc, vecCol = vecc)
          val incIndex = graft.util.Scratch.materialize(
            graft.functions.VectorFunctions.cosineLshBandIndex(
              inc, idCol = idc, vecCol = vecc), "sync_cos_index")
          val newPairs = graft.functions.VectorFunctions
            .cosineNearDuplicatesLshIncremental(inc, corpus, corpusIndex,
              threshold = thr, idCol = idc, vecCol = vecc,
              incomingIndex = Some(incIndex))
            .select(col("id_a"), col("id_b"))
          incIndex.write.mode("append").parquet(bandsPath)
          graft.functions.DedupFunctions.foldClusterLabels(prev, newPairs)
        }
      case other => // unreachable: PipelineConfig validates at parse time
        throw new IllegalArgumentException(s"unknown post_op '$other'")
    }
  }

  private def requireBase(spark: SparkSession, loader: Loader, id: TableId,
                          po: PostOpSpec): DataFrame =
    loader.readTarget(spark, id).getOrElse(throw new IllegalStateException(
      s"post_op '${po.op}' (target ${po.target}): base table " +
        s"${id.scoped} has never been loaded"))

  /** Fold the staged sessions in `(folded_through, committed]` into the
    * derived state. Session tags come from the extractor's staging layout
    * (`session=<tag>` dirs); only sessions at or below the watermark's
    * committed high-water are eligible (the same loadability rule the
    * loader applies — an uncommitted crashed session must not enter state
    * that survives its cleanup). */
  private def foldIncremental(spark: SparkSession, id: TableId,
                              derivedId: TableId, extractor: Extractor,
                              loader: Loader)(
      fold: (Option[DataFrame], DataFrame) => DataFrame): Unit = {
    val committedOpt = extractor.store.get(id.scoped)
      .flatMap(_.metadata.last_session).flatMap(_.toLongOption)
    if (committedOpt.isEmpty) return // never extracted: nothing to fold
    val committed = committedOpt.get
    // converge a crashed swap FIRST (we hold the table lock): the cursor
    // alone survives in the backup, but the fold also reads the derived
    // DATA — without recovery a mid-swap crash reads prev=None against an
    // advanced cursor and silently rebuilds from nothing
    loader.recoverDerived(spark, derivedId)
    val foldedThrough = loader.readDerivedState(spark, derivedId)
      .flatMap(parseFoldedThrough).getOrElse(-1L)
    if (committed <= foldedThrough) return // no new sessions: no-op re-run
    val conf = spark.sparkContext.hadoopConfiguration
    val stagingDir = new org.apache.hadoop.fs.Path(extractor.stagingDir(id))
    val fs = stagingDir.getFileSystem(conf)
    val sessionDirs =
      if (!fs.exists(stagingDir)) Nil
      else fs.listStatus(stagingDir).toSeq.map(_.getPath)
        .filter { p =>
          p.getName.startsWith("session=") &&
            p.getName.stripPrefix("session=").toLongOption
              .exists(t => t > foldedThrough && t <= committed)
        }
    // leaf FILES, not the dir: datetime/hybrid layouts carry derived
    // partition columns in the directory structure that must not enter the
    // fold schema (the loader reads staged leaves the same way)
    val files = sessionDirs.flatMap(d =>
      graft.util.FsListing.parquetFilesMeta(d.toString, conf).map(_._1))
    val state = s"""{"folded_through":"$committed"}"""
    if (files.isEmpty) {
      // 0-row sessions still advance the cursor when state already exists
      // (cheap rewrite of existing state); with no state yet there is
      // nothing to write and the next sync re-evaluates harmlessly
      loader.readTarget(spark, derivedId).foreach(prev =>
        loader.replaceDerived(spark, derivedId, prev, Some(state)))
      return
    }
    val inc = spark.read.parquet(files: _*)
    val out = fold(loader.readTarget(spark, derivedId), inc)
    loader.replaceDerived(spark, derivedId, out, Some(state))
    ()
  }

  private def parseFoldedThrough(json: String): Option[Long] =
    "\"folded_through\"\\s*:\\s*\"(\\d+)\"".r
      .findFirstMatchIn(json).flatMap(_.group(1).toLongOption)
}
