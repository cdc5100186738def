package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown reaching the scan, map-side partial aggregation,
  * broadcast dimensions, column pruning) must survive refactors. */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def executedString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collectLeaves().flatMap(_.collect {
      case s: FileSourceScanExec => s
    })

  /** Unwrap the AQE wrapper: `collect` does NOT descend into
    * AdaptiveSparkPlanExec (its children are Nil), so matching physical
    * nodes on the raw executedPlan finds nothing and assertions go vacuous. */
  private def physical(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("hybrid keyset predicate pushes down to the parquet scan") {
    val scan = scans(q("q_cdc_hybrid_scan")).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("Or(GreaterThan(o_orderdate"),
      s"keyset OR not pushed: $pushed")
    assert(pushed.contains("GreaterThan(o_orderkey,750)"))
  }

  test("q1 aggregation is two-phase (map-side partial before the exchange)") {
    val plan = executedString(q("q1_pricing_summary"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "missing partial+final HashAggregate pair")
    assert("Exchange".r.findAllIn(plan).size == 1,
      "q1 should shuffle exactly once (group-by exchange)")
  }

  test("star join broadcasts the dimension tables") {
    val plan = executedString(q("q_star_join_revenue"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "nation/region should broadcast")
  }

  test("projection prunes the parquet read schema") {
    // q_cdc_id_scan selects 3 columns of events — the scan must not read more
    val scan = scans(q("q_cdc_id_scan")).head
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("event_id") && readSchema.contains("event_type"))
    assert(!readSchema.contains("value"), s"unpruned scan: $readSchema")
    assert(!readSchema.contains("ts"), s"unpruned scan: $readSchema")
  }

  test("zorderBy costs exactly one range exchange; expressions codegen") {
    val df = graft.operators.Layout.zorderBy(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      Seq("l_partkey", "l_suppkey"), bitsPerDim = 8, outPartitions = Some(4))
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1,
      s"z-order should cost ONE range exchange, found ${exchanges.size}")
    assert(exchanges.head.outputPartitioning.getClass.getSimpleName
      .contains("RangePartitioning"),
      s"expected a range exchange, got ${exchanges.head.outputPartitioning}")
    // (RangeBucket/ZValue codegen==interpreted parity lives in LayoutSpec)
  }

  test("minhash candidate generation shuffles only ids and band keys") {
    val df = graft.functions.DedupFunctions.minhashCandidatePairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges found — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("sh") && !cols.contains("hs"),
        s"payload column rides an exchange: $cols")
    }
  }

  test("near-dup edges: star collapse and rep LSH shuffle no text payloads") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.DedupFunctions.minhashNearDupEdges(
      docs, "doc_id", "text", 0.9)
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges found — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("sh") && !cols.contains("hs"),
        s"payload column rides an exchange: $cols")
    }
  }

  test("full-pair near-dup class expansion shuffles no text on dup-heavy input") {
    // the rep-expanded full form: duplicate-heavy input forces the collapse
    // path (class probe > 1), whose within-class self-join and cross-class
    // member expansion must exchange ids + fingerprints only — the C(m,2)
    // OUTPUT is the contract, but no exchange may carry text/shingles
    import org.apache.spark.sql.functions.{col, concat, lit}
    val docs = spark.range(0, 120).select(col("id").as("doc_id"),
      concat(lit("repeated boilerplate page body number "),
        (col("id") % 10).cast("string")).as("text"))
    val df = graft.functions.DedupFunctions.minhashNearDuplicates(
      docs, "doc_id", "text", 0.9)
    df.count() // the expansion path must actually execute
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges found — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(!cols.contains("text") && !cols.contains("sh") && !cols.contains("hs"),
        s"payload column rides an exchange: $cols")
    }
  }

  test("incremental near-dup edges: exchanges carry ids/fingerprints, no text") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
    val df = graft.functions.DedupFunctions.minhashNearDupEdgesIncremental(
      inc, corpus,
      graft.functions.DedupFunctions.repFingerprints(corpus, "doc_id", "text"),
      graft.functions.DedupFunctions.minhashRepBandIndex(corpus, "doc_id", "text"),
      "doc_id", "text", 0.9)
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges found — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("sh") && !cols.contains("hs"),
        s"payload column rides an exchange: $cols")
    }
  }

  test("KMV distinct fold shuffles only keys and 8-byte hashes, never values") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val st = graft.operators.Sketches.foldKmvDistinct(
      None, docs, Seq("lang"), "text", k = 64)
    val exchanges = physical(st).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges found — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text"),
        s"value payload rides a KMV exchange: $cols")
    }
  }

  test("incremental dedup ships only fingerprints from the existing corpus") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.DedupFunctions.dropDuplicatesAgainst(
      existing = docs.filter(col("doc_id") % 2 === 0),
      incoming = docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    // the existing-corpus side must contribute an exchange (shuffle OR
    // broadcast — Spark picks broadcast when the fingerprint set is small)
    // whose output is the fingerprint column ALONE: the corpus ships 16
    // bytes/doc into the anti-join, never its text. The increment's own
    // exchange legitimately carries its rows — they are the output.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val fromExisting = physical(df).collect {
      case e: ShuffleExchangeExec
        if e.output.nonEmpty && e.output.map(_.name).forall(_.startsWith("__fp")) => e
      case b: BroadcastExchangeExec
        if b.output.nonEmpty && b.output.map(_.name).forall(_.startsWith("__fp")) => b
    }
    assert(fromExisting.nonEmpty,
      "no fingerprint-only exchange found for the existing corpus side:\n" +
        physical(df).toString.take(1500))
  }

  test("staged datetime/hybrid layouts prune the scan to the filtered dirs") {
    // the reference probed S3 prefixes by hand (gemini_redshift_loader.py:
    // 411-447); its replacement is Spark partition pruning over the Hive-style
    // staging layout — prove the plan carries PartitionFilters and reads ONLY
    // the matching year=/month= directories
    import org.apache.spark.sql.functions.{col, year, month}
    import graft.cdc._
    import graft.extract.Extractor
    import graft.model._
    import graft.watermark.WatermarkStore
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val hybridCfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("o_orderdate"), idColumn = Some("o_orderkey"))
    val id = TableId("t", "fx", "orders")
    for (strat <- Seq(PartitionStrategy.Datetime, PartitionStrategy.Hybrid)) {
      val root = tmpDir(s"prune_${strat.getClass.getSimpleName}")
      val store = new WatermarkStore(s"$root/wm")
      val ex = new Extractor(store, s"$root/staging", strat)
      ex.extract(spark, id, orders, hybridCfg)
      val staged = spark.read.parquet(ex.stagingDir(id) + "/session=*")
      val pruned = staged.filter(col("year") === 1997 && col("month") === 3)
      // semantics unchanged by the layout
      assert(pruned.count() == orders.filter(
        year(col("o_orderdate")) === 1997 && month(col("o_orderdate")) === 3)
        .count(), s"$strat row count")
      // the plan prunes: partition filters present, and the scan's file list
      // is exactly the files under year=1997/month=03 dirs
      val scan = scans(pruned).head
      val pf = scan.partitionFilters.map(_.toString).mkString(" ")
      assert(pf.contains("year") && pf.contains("month"),
        s"$strat missing PartitionFilters: $pf")
      val scanned = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
      val allFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$root/staging"))
        .filter(p => p.toString.endsWith(".parquet")).count().toInt
      val expectFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$root/staging"))
        .filter(p => p.toString.endsWith(".parquet") &&
          p.toString.contains("year=1997") && p.toString.contains("/month=03"))
        .count().toInt
      assert(scanned == expectFiles, s"$strat scanned=$scanned expected=$expectFiles")
      assert(scanned < allFiles, s"$strat did not prune ($scanned of $allFiles)")
    }
  }

  test("asofJoin shuffles exactly once (the union+window formulation)") {
    import org.apache.spark.sql.functions.{col, expr}
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), graft.util.TimeCols.epochUs("ts").as("ts_us"))
    val signups = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "signup")
      .select(col("user_id"), graft.util.TimeCols.epochUs("ts").as("sts_us"),
        col("event_id").as("signup_id"))
    val joined = graft.operators.Relational.asofJoin(ev, signups, Seq("user_id"),
      "ts_us", "sts_us", payload = Seq("signup_id"),
      rightOrder = Seq("signup_id"))
    val plan = executedString(joined)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"asofJoin should cost ONE shuffle, found $exchanges:\n${plan.take(1500)}")
  }

  test("top-k is TakeOrdered, not a global sort") {
    val plan = executedString(q("q_topk_customers"))
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT+ORDER BY should be top-k, not full sort")
  }

  test("zipfFit ranks over the TakeOrdered top-R rows, never the vocabulary") {
    val plan = executedString(q("q_zipf_fit"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-R cut should be TakeOrdered, not a vocabulary-wide sort:\n$plan")
    // the single-partition rank window must sit ABOVE the top-R cut: a
    // Window before TakeOrdered would funnel the whole vocab through one
    // partition
    val winIdx = plan.indexOf("Window")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && takeIdx > winIdx,
      s"rank Window should consume the TakeOrdered result (window at " +
        s"$winIdx, takeOrdered at $takeIdx):\n${plan.take(1500)}")
  }

  test("per-group quality top-k pre-prunes before the exchange (WindowGroupLimit)") {
    val plan = executedString(q("q_quality_topk"))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter should push a WindowGroupLimit below the shuffle:\n$plan")
  }

  test("bm25: query terms broadcast, corpus vocab cut pre-agg, top-k pre-pruned") {
    val plan = executedString(q("q_bm25_topk"))
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term set should broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k should pre-prune map-side:\n$plan")
    // the (doc, term) aggregation must sit ABOVE the broadcast term
    // semi-join: the exchange then carries only query-term hits, never the
    // corpus vocabulary
    val aggIdx = plan.indexOf("HashAggregate")
    val bhjIdx = plan.indexOf("BroadcastHashJoin")
    assert(aggIdx >= 0 && bhjIdx >= 0)
  }

  test("decontamination joins the benchmark set by broadcast, never sort-merge") {
    val plan = executedString(q("q_decontaminate"))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingle set should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the benchmark join:\n$plan")
  }

  test("stratified sampling and chunking are shuffle-free narrow plans") {
    for (name <- Seq("q_sample_stratified", "q_chunk_documents")) {
      val plan = executedString(q(name))
      assert(!plan.contains("Exchange"),
        s"$name should be a narrow scan->project->filter plan, found Exchange:\n$plan")
    }
  }

  test("recursive-EMA shape is one single-pass plan (no UnionLoop)") {
    // round 14: the recurrence runs as an aggregate() higher-order fold
    // over the collected month spine — ONE plan, one orders scan, no
    // per-iteration UnionLoop round-trips (r13 measured 2.9 s wall for
    // 1.8 exec-s of pure driver latency on a 12-row output)
    val df = q("q_sql_recursive_ema")
    val nScans = physical(df).collect {
      case s: FileSourceScanExec => s
    }.size
    assert(nScans == 1, "exactly one orders scan feeds the fold")
    val plan = physical(df).toString
    assert(!plan.contains("UnionLoop"),
      s"the EMA must fold in-plan, not recurse per-iteration:\n$plan")
  }

  test("hard negatives: band filter prunes below the rank window") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = graft.functions.VectorFunctions.hardNegatives(
      emb, emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k = 5, simLo = 0.05, simHi = 0.45)
    val windows = physical(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "no Window operator — assertion vacuous")
    // the band predicate fuses all the way into the broadcast join's
    // condition (below even the partial WindowGroupLimit), so no corpus
    // row outside [lo, hi) ever reaches the rank exchange
    val sub = windows.head.child.toString
    assert(sub.contains("cosine_sim") && sub.contains(">= 0.05") &&
      sub.contains("< 0.45"),
      s"cosine band must prune BELOW the per-query rank exchange:\n$sub")
    assert(sub.contains("WindowGroupLimit"),
      "literal k must pre-prune map-side (WindowGroupLimit)")
  }

  test("preference pairs pre-prune BOTH rank ends (WindowGroupLimit x2)") {
    val plan = executedString(q("q_preference_pairs"))
    // two literal-capped row_number windows (best-first and worst-first)
    // must each carry a WindowGroupLimit pre-prune: partial+final per end
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 4,
      s"both rank ends must pre-prune map-side:\n${plan.take(1200)}")
  }

  test("JL random projection is a shuffle-free rowwise plan") {
    val plan = executedString(q("q_jl_project"))
    assert(!plan.contains("Exchange"),
      s"randomProjection must pipeline inside the scan stage, found Exchange:\n$plan")
  }

  test("mixture rebalance: payload never shuffles, thresholds broadcast") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.CorpusFunctions.rebalanceToMixture(docs, "lang",
      Seq("en" -> 5L, "es" -> 2L, "fr" -> 2L, "zh" -> 1L), idCol = "doc_id")
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text"),
        s"document payload rides an exchange: $cols")
    }
    assert(!executedString(df).contains("SortMergeJoin"),
      "threshold join must broadcast, never sort-merge")
  }

  test("exactly-N sample is TakeOrdered, never a global sort") {
    val plan = executedString(q("q_sample_exact_n"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"hash-order LIMIT should be top-k, not full sort:\n$plan")
  }

  test("sequence packing costs one shuffle (the group-stream exchange)") {
    val plan = executedString(q("q_pack_sequences"))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"packSequences should shuffle once on the stream key, found $exchanges:\n${plan.take(1500)}")
  }

  test("span dedup shuffles hashes and positions, never token payloads") {
    for (pf <- Seq(Some(false), Some(true))) {
      val df = graft.functions.DedupFunctions.repeatedSpanStats(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 8,
        prefilter = pf)
      val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
      exchanges.foreach { e =>
        val cols = e.child.output.map(_.name).toSet
        assert(!cols.contains("text") && !cols.contains("__toks") &&
          !cols.contains("__win"),
          s"token payload rides an exchange (prefilter=$pf): $cols")
      }
      // the frequency prefilter must gate the window stream in codegen:
      // singleton hashes die BEFORE any (whash, doc) exchange, so the only
      // corpus-wide exchange carries 64-bit counts
      assert(executedString(df).contains("might_contain") == pf.get,
        s"prefilter=$pf but plan disagrees on the Bloom gate")
    }
  }

  test("incremental simhash probe: exchanges carry longs only, never text") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = graft.functions.DedupFunctions.simhashBandIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val df = graft.functions.DedupFunctions.simhashNearDuplicatesIncremental(
      docs.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text",
      incomingIndex = Some(idx.limit(0).unionByName(
        graft.functions.DedupFunctions.simhashBandIndex(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text"))))
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("__toks"),
        s"text payload rides an exchange: $cols")
    }
  }

  test("incremental cosine-LSH probe: no embedding arrays on candidate exchanges") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val idx = graft.functions.VectorFunctions.cosineLshBandIndex(corpus)
    val df = graft.functions.VectorFunctions.cosineNearDuplicatesLshIncremental(
      emb.filter(col("vec_id") % 2 === 1), corpus, idx, threshold = 0.5,
      incomingIndex = Some(graft.functions.VectorFunctions.cosineLshBandIndex(
        emb.filter(col("vec_id") % 2 === 1))))
    val plan = physical(df)
    // candidate generation must never put an embedding array on a banded
    // exchange — vectors appear solely in the final id-keyed verify. (At
    // fixture scale the planner may BROADCAST the banded join outright —
    // equally payload-free — so the check covers whatever banded exchanges
    // exist rather than requiring one.)
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
    exchanges.filter(
      _.child.output.exists(a => a.name == "band" || a.name == "bucket"))
      .foreach { e =>
        val names = e.child.output.map(_.name).toSet
        assert(!names.contains("embedding") && !names.exists(_.startsWith("__v")),
          s"embedding payload rides a candidate exchange: $names")
      }
    // the hot-bucket cap is a COLLECTED census (surfaced, never silent):
    // building the plan above must have run it, and at fixture scale it
    // must report zero drops
    assert(graft.functions.DedupFunctions.lastHotBucketDrops ==
      graft.functions.DedupFunctions.HotBucketDrops(0L, 0L),
      "census did not run clean at fixture scale")
  }

  test("span decontamination shuffles hashes and positions, never token payloads") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.DedupFunctions.scrubContaminatedSpans(
      docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", 8)
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("__toks"),
        s"token payload rides an exchange: $cols")
    }
  }

  test("rollup/cube aggregate in two phases over a single exchange") {
    // Expand feeds the partial aggregate, so the grouping-set expansion is
    // map-side — the exchange carries pre-aggregated rows for ALL levels
    for (name <- Seq("q_agg_rollup", "q_agg_cube")) {
      val plan = executedString(q(name))
      assert(plan.contains("Expand"), s"$name missing grouping-set Expand")
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$name missing partial+final HashAggregate pair")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"$name should shuffle exactly once:\n${plan.take(1500)}")
    }
  }

  test("pivot with explicit values is one aggregate pass, no discovery scan") {
    val df = q("q_pivot_status")
    val nScans = physical(df).collect { case s: FileSourceScanExec => s }.size
    assert(nScans == 1,
      "explicit pivot values must not add a distinct-discovery scan")
    // Spark plans pivot as count-agg → pivotfirst-agg (two exchanges), but
    // BOTH exchanges sit above a partial HashAggregate: only pre-aggregated
    // (group, status) rows ride the wire, never input rows
    val exchanges = physical(df).collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "no exchanges — assertion would be vacuous")
    exchanges.foreach { e =>
      assert(e.child.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec],
        s"pivot exchange input is not pre-aggregated: ${e.child.getClass.getSimpleName}")
    }
  }

  test("lag/lead/ntile share one Window operator over one exchange") {
    val plan = executedString(q("q_window_lag_lead"))
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"same partitioning+ordering should reuse one exchange:\n${plan.take(1500)}")
    assert("Window".r.findAllIn(plan).size == 1,
      s"all four functions share a frame — expected a single Window operator:\n${plan.take(1500)}")
  }

  test("Q5-shape multi-join broadcasts the bounded dims, shuffles the facts") {
    val plan = executedString(q("q5_local_supplier_revenue"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation/region should broadcast:\n${plan.take(2000)}")
  }

  test("Q10 top-20 is TakeOrdered over a pushed-down returnflag scan") {
    val df = q("q10_returned_items")
    val plan = executedString(df)
    assert(plan.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT should be top-k, not a global sort")
    val liScan = physical(df).collect { case s: FileSourceScanExec => s }
      .find(_.metadata("Location").contains("lineitem")).get
    assert(liScan.metadata("PushedFilters").contains("EqualTo(l_returnflag,R)"),
      s"returnflag not pushed: ${liScan.metadata("PushedFilters")}")
  }

  test("Q2-shape correlated scalar MIN decorrelates to aggregate + join") {
    val plan = executedString(q("q2_min_cost_supplier"))
    // RewriteCorrelatedScalarSubquery must leave NO subquery node behind:
    // the per-part MIN becomes a grouped aggregate joined back on
    // (partkey, min-price) — per-row subquery execution would be O(parts ×
    // lineitem) at scale
    assert(!plan.contains("Subquery"),
      "correlated scalar subquery survived to the physical plan")
    assert(plan.contains("functions=[min(l_extendedprice"),
      "expected the decorrelated per-part MIN aggregate")
    assert("Join".r.findAllIn(plan).size >= 4,
      "expected the subquery to appear as a join against the aggregate")
  }

  test("Q21-shape EXISTS/NOT EXISTS decorrelate to semi/anti self-joins") {
    val plan = executedString(q("q21_waiting_supplier"))
    assert(!plan.contains("Subquery"),
      "predicate subquery survived to the physical plan")
    assert(plan.contains("LeftSemi"), "EXISTS should become a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS should become an anti join")
    // the lateness predicate rides the anti join as its condition — the
    // decorrelated form keeps the non-equi part out of a per-row loop
    assert(plan.contains("l_shipdate") && plan.contains("LeftAnti"),
      "ship-date lateness predicate should ride the anti join")
  }

  test("Q19-shape disjunction keeps the equi hash join, never a nested loop") {
    val plan = executedString(q("q19_disjunctive_revenue"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "the common p_partkey = l_partkey conjunct must stay an equi join")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "expected a hash/merge equi join with the OR as residual condition")
  }

  test("per-source cap pre-prunes map-side (WindowGroupLimit)") {
    val plan = executedString(q("q_source_caps"))
    assert(plan.contains("WindowGroupLimit"),
      "rank filter should prune to the local cap before the exchange")
  }

  test("Q6-shape: every predicate reaches the parquet scan") {
    val df = q("q6_forecast_revenue")
    // AQE wraps the agg plan — unwrap before collecting the scan
    val scan = physical(df).collectLeaves().flatMap(_.collect {
      case s: FileSourceScanExec => s
    }).head
    val pushed = scan.metadata("PushedFilters")
    for (p <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(p), s"$p not pushed: $pushed")
    // one scan + partial/final agg — nothing else
    val plan = executedString(df)
    assert(!plan.contains("Join") &&
      "HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("Q16-shape: NOT IN becomes an anti join, never a per-row subquery") {
    val plan = executedString(q("q16_supplier_diversity"))
    assert(plan.contains("LeftAnti"), "NOT IN should decorrelate to anti join")
    assert(!plan.contains("InSubquery"), "per-row IN subquery survived")
  }

  test("round-5 operators keep their scale shapes (funnel/overlap/fold)") {
    // funnel: ONE scan of the fact table (stage-IN filter pushed), one
    // entity exchange + the single-row count exchange — never k rescans
    val funnel = q("q_funnel")
    val fPlan = physical(funnel)
    val fScans = fPlan.collectLeaves().flatMap(_.collect {
      case s: FileSourceScanExec => s
    })
    assert(fScans.size == 1,
      s"funnel must scan events exactly once, saw ${fScans.size} scans")
    assert(fScans.head.metadata("PushedFilters").contains("event_type"),
      "funnel stage-IN filter must push to the events scan")
    val fShuffles = fPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(fShuffles.size <= 2,
      s"funnel should shuffle once (plus the 1-row count), saw ${fShuffles.size}")
    // interval-overlap join: equi hash/merge join on buckets, no nested loop
    val overlap = executedString(q("q_session_overlap"))
    assert(!overlap.contains("BroadcastNestedLoopJoin") &&
      !overlap.contains("CartesianProduct"),
      "interval overlap must stay a bucketed equi join")
    // incremental fold: partial + final aggregate pairs (map-side combine)
    val fold = executedString(q("q_incremental_rollup"))
    assert(fold.contains("partial_count") || fold.contains("partial_sum"),
      "fold increments must partial-aggregate before the exchange")
  }

  test("cluster-label fold ships only id/cluster longs, never payloads") {
    // foldClusterLabels is the incremental-maintenance hot path: its whole
    // data flow must stay at pair/component scale — every exchange in the
    // folded-labels plan carries id/cluster columns only (16 bytes/row),
    // no text, no vectors, no upstream candidate-pipeline payloads
    val s = spark; import s.implicits._
    val l0 = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L)).toDF("id", "cluster")
    val pairs = Seq((2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val folded = graft.functions.DedupFunctions.foldClusterLabels(Some(l0), pairs)
    folded.count() // materialize through AQE so the final plan is real
    val exchanges = physical(folded).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val allowed = Set("id", "cluster", "id_a", "id_b", "__ca", "__cb", "__newc")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(cols.subsetOf(allowed),
        s"non-label column rides the fold exchange: $cols")
    }
  }

  test("media near-dup family: no payload bytes ride any exchange") {
    // the audio/video near-dup joins and the incremental image probe must
    // shuffle ids + hashes/signatures only — decoded media stays in the
    // decode task, and the binary `payload` column must be pruned before
    // the first exchange (a payload-bearing shuffle at 100 TB IS the query)
    import graft.multimodal.Multimodal
    val docs = spark.range(0, 60).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"))
    def assertNoPayload(df: DataFrame, what: String): Unit = {
      df.count()
      val exchanges = physical(df).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, s"$what: no exchanges — vacuous assertion")
      exchanges.foreach { e =>
        val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
        assert(!cols.contains("payload") && !cols.contains("text"),
          s"$what: payload rides an exchange: $cols")
      }
    }
    assertNoPayload(Multimodal.audioNearDuplicates(
      Multimodal.audioPerceptualHashes(spark,
        Multimodal.withFixtureAudioDups(spark, docs)), maxHamming = 1),
      "audioNearDuplicates")
    assertNoPayload(Multimodal.videoNearDuplicates(
      Multimodal.videoFrameSignatures(spark,
        Multimodal.withFixtureVideoDups(spark, docs)), minShared = 2),
      "videoNearDuplicates")
    val hashes = Multimodal.imagePerceptualHashes(spark,
      Multimodal.withFixtureMedia(spark, docs))
    assertNoPayload(Multimodal.imageNearDuplicatesIncremental(
      hashes.filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 2),
      hashes.filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0),
      maxHamming = 2), "imageNearDuplicatesIncremental")
  }

  test("c4Clean is a pure rowwise projection: zero exchanges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.TextFunctions.c4Clean(docs)
    df.count()
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"line filtering must pipeline in the scan stage: ${exchanges.size}")
  }

  test("epochShards: one shard-keyed exchange, no global order, no text payload") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.CorpusFunctions.epochShards(docs, "doc_id", 3)
    df.count()
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1,
      s"shard layout should shuffle exactly once, got ${exchanges.size}")
    val part = exchanges.head.outputPartitioning.toString
    assert(part.contains("shard") && !part.contains("SinglePartition"),
      s"exchange must partition by shard, got $part")
    // the exchange carries (id, key, shard) — never document text
    val cols = exchanges.head.child.output.map(_.name.takeWhile(_ != '#')).toSet
    assert(!cols.contains("text"), s"text rides the shard exchange: $cols")
  }

  test("knLogProbScores: LM exchanges carry pair keys and counts, no text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.CorpusFunctions.knLogProbScores(
      docs, "doc_id", "text")
    df.count()
    val exchanges = physical(df).collect { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(!cols.contains("text") && !cols.contains("__toks"),
        s"document payload rides an LM exchange: $cols")
    }
    // the pair-total is a 1-row broadcast, not a global window over pairs
    assert(physical(df).toString.contains("BroadcastExchange"),
      "n1tot must broadcast")
  }

  test("ngramCommonness: exchanges carry hashes and ids, never text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.CorpusFunctions.ngramCommonness(
      docs, "doc_id", "text")
    df.count()
    physical(df).collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(!cols.contains("text") && !cols.contains("hs"),
        s"document payload rides a commonness exchange: $cols")
    }
  }

  test("sourceOverlapMatrix: exchanges carry (group, hash), never text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.functions.CorpusFunctions.sourceOverlapMatrix(
      docs, "source", "text")
    df.count()
    physical(df).collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(!cols.contains("text") && !cols.contains("hs"),
        s"document payload rides an overlap exchange: $cols")
    }
  }

  test("dsirSelect: ratio broadcasts, top-k is TakeOrdered, no text rides") {
    // pin the INTERNAL lazy plan (the public operator is eager: it
    // persists the one-scan feature relation, materializes the k rows
    // and releases the cache before returning a local relation)
    import org.apache.spark.sql.functions.{col, expr, count, lit}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val half = expr("CAST(substring(source, 4) AS INT)")
    val C = graft.functions.CorpusFunctions
    val cfb = C.dsirFeatures(docs.filter(half >= 2), Seq(col("doc_id")),
        "text", nibbles = 2)
      .groupBy(col("doc_id"), col("__b")).agg(count(lit(1)).as("__cf"))
    val df = C.dsirTopPlan(cfb,
      C.dsirFeatures(docs.filter(half < 2), Nil, "text", nibbles = 2),
      "doc_id", k = 50, buckets = 256L)
    df.count()
    val plan = physical(df)
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val cols = e.child.output.map(_.name.takeWhile(_ != '#')).toSet
      assert(!cols.contains("text") && !cols.contains("__toks"),
        s"document payload rides a DSIR exchange: $cols")
    }
    val ps = plan.toString
    assert(ps.contains("BroadcastExchange"),
      "the bucket log-ratio table must broadcast")
    assert(ps.contains("TakeOrderedAndProject"),
      "top-k selection must be TakeOrdered, not a global sort")
    // the eager public wrapper leaves no cached relation behind
    val before = spark.sparkContext.getPersistentRDDs.size
    C.dsirSelect(docs.filter(half >= 2), docs.filter(half < 2),
      "doc_id", "text", k = 10)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "dsirSelect leaked a persisted relation")
  }

  test("probe scoring is rowwise: zero exchanges under literal weights") {
    import graft.functions.LearnFunctions
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        LearnFunctions.quantize(
          org.apache.spark.sql.functions.col("embedding")).as("xq"))
    val w = Array.fill[BigInt](65)(BigInt(1000))
    val scored = LearnFunctions.scoreLinearProbe(base, "vec_id", "xq", w)
    scored.count()
    val exchanges = physical(scored).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"scoring must not shuffle, found ${exchanges.size} exchanges")
  }

  test("prSweep: histogram partial-aggregates; thresholds broadcast") {
    import graft.functions.LearnFunctions
    val s = spark; import s.implicits._
    val scored = (1L to 1000L)
      .map(i => (i, i % 2, (i * 4000000000000L) % 4000000000000001L))
      .toDF("vec_id", "y", "p_num")
    val df = LearnFunctions.prSweep(scored, "y")
    df.count()
    val plan = physical(df).toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "histogram must partial-aggregate map-side")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "threshold table should broadcast, never shuffle the histogram")
  }

  test("exact-Lloyd assignment is rowwise: zero exchanges per round scan") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val res = graft.functions.VectorFunctions.lloydKmeansExact(
      emb, k = 4, iters = 1)
    res.assigned.count()
    val exchanges = physical(res.assigned).collect {
      case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      "assignment must be a rowwise projection against centroid literals")
  }

  test("Q22-shape: anti join for NOT EXISTS, scalar subqueries execute once") {
    val df = q("q22_idle_customers")
    val plan = executedString(df)
    assert(plan.contains("LeftAnti"),
      "NOT EXISTS against orders should become an anti join")
    // the two UNcorrelated scalars (count, sum) are legal once-executed
    // subqueries — and Spark merges them into ONE shared aggregate pass
    // (mergedValue); what must NOT appear is any correlated leftover
    assert(plan.contains("mergedValue"),
      "the two scalar aggregates should merge into one subquery pass")
  }
}
