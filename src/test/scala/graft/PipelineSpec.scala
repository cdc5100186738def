package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model._
import graft.pipeline._

/** Pipeline config parsing + end-to-end 3-table sync on fixtures
  * (VERDICT round-1 item #6). */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private val yaml =
    s"""pipeline:
       |  name: "fixtures_sync"
       |  description: "3-table fixture pipeline"
       |  source: "$sfDir"
       |  target: "warehouse"
       |  processing:
       |    strategy: "sequential"
       |    batch_size: 50000
       |    max_parallel_tables: 1
       |  s3:
       |    isolation_prefix: "fx/"
       |    partition_strategy: "table"
       |  cdc_settings:
       |    default_strategy: "full_sync"
       |tables:
       |  fx.orders:
       |    cdc_strategy: "hybrid"
       |    cdc_timestamp_column: "o_orderdate"
       |    cdc_id_column: "o_orderkey"
       |    processing:
       |      batch_size: 100000
       |  fx.events:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "event_id"
       |  fx.region:
       |    cdc_strategy: "full_sync"
       |""".stripMargin

  test("YAML parsing: pipeline block, table specs, batch-size hierarchy") {
    val p = PipelineConfig.fromString(yaml)
    assert(p.name == "fixtures_sync")
    assert(p.processing.batchSize == 50000)
    assert(p.sink.isolationPrefix == "fx/")
    assert(p.defaultStrategy == CdcStrategyKind.FullSync)
    assert(p.tables.size == 3)
    val orders = p.tables.find(_.name == "fx.orders").get
    assert(orders.cdc.strategy == CdcStrategyKind.Hybrid)
    assert(orders.cdc.timestampColumn.contains("o_orderdate"))
    assert(orders.cdc.batchSize == 100000)          // table override wins
    val events = p.tables.find(_.name == "fx.events").get
    assert(events.cdc.batchSize == 50000)           // pipeline default
    assert(events.cdc.strategy == CdcStrategyKind.IdOnly)
  }

  test("template inheritance: child overrides one knob, inherits the rest") {
    val dir = tmpDir("cfg_inherit")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "template.yml"), yaml)
    val child =
      s"""extends: template.yml
         |pipeline:
         |  name: "prod_sync"
         |  processing:
         |    max_parallel_tables: 4
         |tables:
         |  fx.orders:
         |    processing:
         |      batch_size: 999
         |""".stripMargin
    val childPath = java.nio.file.Paths.get(dir, "prod.yml")
    java.nio.file.Files.writeString(childPath, child)
    val p = PipelineConfig.fromFile(childPath.toString)
    // overridden
    assert(p.name == "prod_sync")
    assert(p.processing.maxParallelTables == 4)
    assert(p.tables.find(_.name == "fx.orders").get.cdc.batchSize == 999)
    // inherited from the template
    assert(p.processing.batchSize == 50000)
    assert(p.sink.isolationPrefix == "fx/")
    assert(p.tables.size == 3)
    val orders = p.tables.find(_.name == "fx.orders").get
    assert(orders.cdc.strategy == CdcStrategyKind.Hybrid)   // kept despite the
    assert(orders.cdc.idColumn.contains("o_orderkey"))      // batch override
    assert(p.tables.find(_.name == "fx.events").get.cdc.strategy ==
      CdcStrategyKind.IdOnly)
    // chains: grandchild extends child extends template
    val grandchild = "extends: prod.yml\npipeline:\n  name: \"gc\"\n"
    val gcPath = java.nio.file.Paths.get(dir, "gc.yml")
    java.nio.file.Files.writeString(gcPath, grandchild)
    val gc = PipelineConfig.fromFile(gcPath.toString)
    assert(gc.name == "gc" && gc.processing.maxParallelTables == 4 &&
      gc.processing.batchSize == 50000)
    // cycle is refused, not an infinite loop
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.yml"),
      "extends: b.yml\npipeline:\n  name: a\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.yml"),
      "extends: a.yml\npipeline:\n  name: b\n")
    intercept[IllegalArgumentException] {
      PipelineConfig.fromFile(s"$dir/a.yml")
    }
  }

  test("duplicate YAML mapping keys are rejected at parse time") {
    // Jackson's tree model would otherwise collapse duplicates (last
    // wins) BEFORE any semantic validation can see them — a typo like
    // {en: 3, en: 1} would silently ship the wrong rebalance mixture
    val dup =
      """pipeline:
        |  name: "dup"
        |  source: "s"
        |tables:
        |  fx.docs:
        |    cdc_strategy: "full_sync"
        |    post_ops:
        |      - op: "rebalance"
        |        target: "docs_mix"
        |        keys: ["lang"]
        |        id_column: "doc_id"
        |        weights: {en: 3, en: 1}
        |""".stripMargin
    val e = intercept[Exception] { PipelineConfig.fromString(dup) }
    assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    // ...and anywhere else in the document, not just weights maps
    val dupTable =
      """pipeline:
        |  name: "dup2"
        |  source: "s"
        |  processing:
        |    batch_size: 1
        |    batch_size: 2
        |""".stripMargin
    val e2 = intercept[Exception] { PipelineConfig.fromString(dupTable) }
    assert(e2.getMessage.toLowerCase.contains("duplicate"), e2.getMessage)
  }

  test("env interpolation substitutes values and honors defaults") {
    val y = "pipeline:\n  name: \"${GRAFT_TEST_NAME:fallback}\"\n  source: \"s\""
    assert(PipelineConfig.fromString(y, Map.empty).name == "fallback")
    assert(PipelineConfig.fromString(y, Map("GRAFT_TEST_NAME" -> "live")).name == "live")
    val missing = "pipeline:\n  name: \"${GRAFT_NO_SUCH_VAR}\""
    intercept[IllegalArgumentException](PipelineConfig.fromString(missing, Map.empty))
  }

  test("the shipped example pipeline parses and syncs end-to-end") {
    // config/pipelines/example_fixtures.yml is user-facing documentation —
    // it must stay runnable: multi-connection tables, expectations, and
    // every showcased post_op (neardup_labels + the four fold ops)
    val p = PipelineConfig.fromFile("config/pipelines/example_fixtures.yml")
    assert(p.tables.exists(_.postOps.map(_.op).toSet ==
      Set("neardup_labels", "fold_bm25", "epoch_shards", "drift_gate",
        "fold_kmv_distinct", "fold_count_min", "fold_sample", "rebalance",
        "fold_bpe_tokens", "dsir_select", "curriculum", "data_card")))
    assert(p.tables.exists(_.postOps.map(_.op).toSet == Set("fold_probe")))
    val runner = new PipelineRunner(spark, tmpDir("example_cfg"))
    val r = runner.sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val docsId = p.tables.find(_.name == "fx.documents").get.tableId(p)
    for (t <- Seq("doc_clusters", "doc_bm25_index", "doc_lang_distinct",
        "doc_source_counts", "doc_len_sample", "doc_mixture",
        "doc_dsir_picks", "doc_curriculum"))
      assert(loader.readTarget(spark, docsId.copy(table = t)).nonEmpty,
        s"derived table $t missing after the example sync")
    // the chained dsir_select equals the direct operator over the same
    // base + reference tables (post_ops ran in YAML order)
    val base = loader.readTarget(spark, docsId).get
    val mix = loader.readTarget(spark, docsId.copy(table = "doc_mixture")).get
    val picks = loader.readTarget(
      spark, docsId.copy(table = "doc_dsir_picks")).get
    val expect = graft.functions.CorpusFunctions.dsirSelect(
      base, mix, "doc_id", "text", k = 50)
    assert(picks.count() == 50)
    assert(picks.select("doc_id", "rank")
      .exceptAll(expect.select("doc_id", "rank")).isEmpty,
      "piped dsir_select deviates from the direct operator")
  }

  test("3-table sequential sync loads every table; counts match source") {
    val p = PipelineConfig.fromString(yaml)
    val work = tmpDir("pipe")
    val runner = new PipelineRunner(spark, work)
    val report = runner.sync(p)
    assert(report.allOk, report.tables.flatMap(_.error).mkString(";"))
    assert(report.tables.size == 3)
    val (_, _, loader) = runner.rigFor(p)
    val expect = Map(
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet").count(),
      "events" -> spark.read.parquet(s"$sfDir/events.parquet").count(),
      "region" -> spark.read.parquet(s"$sfDir/region.parquet").count())
    expect.foreach { case (t, n) =>
      val id = p.tables.find(_.name == s"fx.$t").get
        .tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
      assert(loader.readTarget(spark, id).get.count() == n, s"table $t")
    }
  }

  test("incremental second sync picks up nothing new (cursor advanced)") {
    val p = PipelineConfig.fromString(yaml)
    val work = tmpDir("pipe2")
    val runner = new PipelineRunner(spark, work)
    assert(runner.sync(p).allOk)
    val second = runner.sync(p, tableFilter = Some("events"))
    assert(second.allOk)
    assert(second.totalRows == 0) // id_only cursor: no new rows
    // target row count unchanged (no duplicate append)
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.find(_.name == "fx.events").get
      .tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    assert(loader.readTarget(spark, id).get.count() ==
      spark.read.parquet(s"$sfDir/events.parquet").count())
  }

  test("post_ops views: dedup_latest + latest_status maintained by the sync") {
    val y =
      s"""pipeline:
         |  name: "postops_views"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.orders:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: dedup_latest
         |        target: orders_latest
         |        keys: [o_custkey]
         |        ts_column: o_orderdate
         |        id_column: o_orderkey
         |      - op: latest_status
         |        target: orders_status
         |        keys: o_custkey
         |        status_column: o_orderstatus
         |        ts_column: o_orderdate
         |        id_column: o_orderkey
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("postops_v"))
    val r = runner.sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    val base = loader.readTarget(spark, baseId).get
    // derived tables must equal the direct operator application
    val latest = loader.readTarget(spark, baseId.copy(table = "orders_latest")).get
    val expectLatest = graft.operators.Relational.dedupLatestByTs(
      base, Seq("o_custkey"), "o_orderdate", "o_orderkey")
    assert(latest.count() == expectLatest.count() &&
      latest.exceptAll(expectLatest).isEmpty &&
      expectLatest.exceptAll(latest).isEmpty)
    val status = loader.readTarget(spark, baseId.copy(table = "orders_status")).get
    val expectStatus = graft.operators.Relational.latestStatusSummary(
      base, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    assert(status.collect().map(_.toSeq).toSet ==
      expectStatus.collect().map(_.toSeq).toSet)
  }

  test("post_ops data_card: release report view equals the direct " +
    "operator, validation strict") {
    val y =
      s"""pipeline:
         |  name: "postops_card"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.documents:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: data_card
         |        target: documents_card
         |        keys: [lang]
         |        text_column: text
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("postops_card"))
    val r = runner.sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    val base = loader.readTarget(spark, baseId).get
    val card = loader.readTarget(
      spark, baseId.copy(table = "documents_card")).get
    val expect = graft.functions.CorpusFunctions.dataCard(
      base, "text", "lang")
    assert(card.collect().map(_.toSeq).toSet ==
      expect.collect().map(_.toSeq).toSet)
    assert(card.count() > 0)
    // parse strictness: group key and text column required
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        keys: [lang]\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        text_column: text\n", "")))
  }

  test("post_ops rebalance: mixture view equals the direct carve-out, " +
      "validation strict") {
    val y =
      s"""pipeline:
         |  name: "postops_rebalance"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.documents:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: rebalance
         |        target: documents_mixed
         |        keys: [lang]
         |        id_column: doc_id
         |        weights: {en: 3, es: 1, fr: 1}
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    assert(p.tables.head.postOps.head.weights ==
      Seq("en" -> 3L, "es" -> 1L, "fr" -> 1L))
    val runner = new PipelineRunner(spark, tmpDir("postops_rb"))
    val r = runner.sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    val base = loader.readTarget(spark, baseId).get
    val mixed = loader.readTarget(
      spark, baseId.copy(table = "documents_mixed")).get
    val expect = graft.functions.CorpusFunctions.rebalanceToMixture(
      base, "lang", Seq("en" -> 3L, "es" -> 1L, "fr" -> 1L), "doc_id")
    assert(mixed.count() == expect.count() && mixed.count() > 0)
    assert(mixed.select("doc_id").exceptAll(expect.select("doc_id")).isEmpty)
    // achieved mixture honors the exact integer quotas
    val n = mixed.groupBy("lang").count().collect()
      .map(rr => rr.getString(0) -> rr.getLong(1)).toMap
    assert(n.keySet == Set("en", "es", "fr"), n.toString)
    assert(n("es") == n("fr"), "equal weights must yield equal quotas")
    // idempotent: a re-sync recomputes the same view (materialize the ids
    // BEFORE the swap — the old DataFrame's files are replaced by it)
    val ids1 = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(runner.sync(p).allOk)
    val ids2 = loader.readTarget(
      spark, baseId.copy(table = "documents_mixed")).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids2 == ids1)
    // parse-time strictness: weights required, positive, single group key
    def rb(extra: String) = PipelineConfig.fromString(
      s"""pipeline:
         |  name: "x"
         |  source: "s"
         |tables:
         |  fx.t:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: rebalance
         |        target: t_mixed
         |$extra
         |""".stripMargin)
    intercept[IllegalArgumentException](rb(
      "        keys: [lang]\n        id_column: doc_id"))
    intercept[IllegalArgumentException](rb(
      "        keys: [lang]\n        id_column: doc_id\n" +
        "        weights: {en: 0}"))
    intercept[IllegalArgumentException](rb(
      "        keys: [lang, src]\n        id_column: doc_id\n" +
        "        weights: {en: 1}"))
  }

  test("post_ops dsir_select: parse-time strictness") {
    def ds(extra: String) = PipelineConfig.fromString(
      s"""pipeline:
         |  name: "x"
         |  source: "s"
         |tables:
         |  fx.t:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: dsir_select
         |        target: t_picks
         |$extra
         |""".stripMargin)
    // missing reference / missing columns / non-positive k all refuse
    intercept[IllegalArgumentException](ds(
      "        id_column: doc_id\n        text_column: text"))
    intercept[IllegalArgumentException](ds(
      "        reference: seed\n        id_column: doc_id"))
    intercept[IllegalArgumentException](ds(
      "        reference: seed\n        id_column: doc_id\n" +
        "        text_column: text\n        k: 0"))
    val ok = ds("        reference: seed\n        id_column: doc_id\n" +
      "        text_column: text\n        k: 25")
    assert(ok.tables.head.postOps.head.reference.contains("seed"))
  }

  test("post_ops curriculum: shard view equals the direct layout; strict") {
    val y =
      s"""pipeline:
         |  name: "postops_curriculum"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.documents:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: curriculum
         |        target: doc_curriculum
         |        id_column: doc_id
         |        value_column: n_chars
         |        k: 8
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("postops_cur"))
    assert(runner.sync(p).allOk)
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    val base = loader.readTarget(spark, baseId).get
    val cur = loader.readTarget(
      spark, baseId.copy(table = "doc_curriculum")).get
    val expect = graft.functions.CorpusFunctions.curriculumShards(
      base, "doc_id", "n_chars", shards = 8)
    assert(cur.count() == base.count())
    assert(cur.exceptAll(expect).isEmpty,
      "piped curriculum deviates from the direct layout")
    // strictness: missing score column / bad shard count refuse at parse
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        value_column: n_chars\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("k: 8", "k: 0")))
  }

  test("post_ops contamination_gate: clean syncs pass and accumulate the " +
    "report; a leaked increment fails and is re-gated") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("cgate_src")
    val benchText = "the quick brown fox jumps over the lazy dog"
    Seq((1L, benchText)).toDF("bench_id", "text")
      .write.parquet(s"$srcDir/bench.parquet")
    def writeDocs(rows: Seq[(Long, String)], mode: String): Unit =
      rows.toDF("doc_id", "text").write.mode(mode)
        .parquet(s"$srcDir/docs.parquet")
    writeDocs(Seq((1L, "a perfectly clean document about trains"),
      (2L, "another clean one about boats and rivers")), "errorifexists")
    val y =
      s"""pipeline:
         |  name: "cgate"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.bench:
         |    cdc_strategy: "full_sync"
         |    table_type: "dimension"
         |  fx.docs:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "doc_id"
         |    post_ops:
         |      - op: contamination_gate
         |        target: docs_contamination
         |        reference: bench
         |        id_column: doc_id
         |        text_column: text
         |        threshold: 0.8
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("cgate_wh"))
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val docsId = p.tables.find(_.name == "fx.docs").get.tableId(p)
    val repId = docsId.copy(table = "docs_contamination")
    // clean corpus → empty (or not-yet-written) report
    assert(loader.readTarget(spark, repId).forall(_.count() == 0))
    // a PARTIAL overlap below the threshold passes and is RECORDED
    writeDocs(Seq((3L, "the quick brown fox sails calm seas tonight")),
      "append")
    val rp = runner.sync(p)
    assert(rp.allOk, rp.tables.flatMap(_.error).mkString(";"))
    val recorded = loader.readTarget(spark, repId).get.collect()
    assert(recorded.length == 1 && recorded.head.getLong(0) == 3L)
    assert(recorded.head.getAs[Double]("overlap") < 0.8)
    // a verbatim benchmark leak arrives → the docs table FAILS the sync
    writeDocs(Seq((4L, benchText)), "append")
    val r2 = runner.sync(p)
    assert(r2.tables.flatMap(_.error).exists(_.contains("contamination_gate")),
      s"expected gate failure, got ${r2.tables.flatMap(_.error)}")
    // the report state is untouched and the RETRY re-gates the same
    // increment (fold cursor unmoved)
    assert(loader.readTarget(spark, repId).get.count() == 1)
    assert(runner.sync(p).tables.flatMap(_.error)
      .exists(_.contains("contamination_gate")))
    // parse strictness: reference/threshold required, threshold in (0,1]
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        reference: bench\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("threshold: 0.8", "threshold: 1.5")))
  }

  test("post_ops reliability_gate: agreeing batch passes and records its " +
    "report; a noisy batch fails and is re-gated") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("rgate_src")
    def writeRatings(rows: Seq[(Long, Long, Long, String)],
                     mode: String): Unit =
      rows.toDF("rating_id", "item", "rater", "label")
        .write.mode(mode).parquet(s"$srcDir/ratings.parquet")
    // batch 1: 4 items x 3 raters, perfect agreement, two categories
    // across items -> alpha = 1
    writeRatings(for {
      item <- 1L to 4L; rater <- 1L to 3L
    } yield (item * 10 + rater, item, rater, s"l${item % 2}"),
      "errorifexists")
    val y =
      s"""pipeline:
         |  name: "rgate"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.ratings:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "rating_id"
         |    post_ops:
         |      - op: reliability_gate
         |        target: ratings_reliability
         |        keys: [item, rater, label]
         |        threshold: 0.5
         |      - op: majority_vote
         |        target: ratings_majority
         |        keys: [item, rater, label]
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("rgate_wh"))
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val repId = p.tables.head.tableId(p).copy(table = "ratings_reliability")
    val rep1 = loader.readTarget(spark, repId).get.collect()
    assert(rep1.length == 1 && rep1.head.getAs[Double]("alpha") == 1.0)
    assert(rep1.head.getAs[Long]("batch_seq") == 1L)
    // the majority_vote VIEW equals the direct operator over the base
    val mvId = p.tables.head.tableId(p).copy(table = "ratings_majority")
    val mv = loader.readTarget(spark, mvId).get
    val mvExpect = graft.functions.CorpusFunctions.majorityVote(
      loader.readTarget(spark, p.tables.head.tableId(p)).get,
      "item", "rater", "label")
    assert(mv.collect().map(_.toSeq).toSet ==
      mvExpect.collect().map(_.toSeq).toSet)
    assert(mv.count() == 4)
    // batch 2: 6 items, 2 raters each, systematic 1-1 splits -> alpha
    // well below 0.5 -> the sync FAILS with the fold cursor unmoved
    writeRatings((101L to 106L).flatMap(i => Seq(
      (i * 10 + 1, i, 1L, "A"), (i * 10 + 2, i, 2L, "B"))), "append")
    val r2 = runner.sync(p)
    assert(r2.tables.flatMap(_.error).exists(_.contains("reliability_gate")),
      s"expected gate failure, got ${r2.tables.flatMap(_.error)}")
    assert(loader.readTarget(spark, repId).get.count() == 1)
    // retry re-gates the SAME increment
    assert(runner.sync(p).tables.flatMap(_.error)
      .exists(_.contains("reliability_gate")))
    // parse strictness: exactly three keys (both 3-key ops); threshold
    // required + in range
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("keys: [item, rater, label]", "keys: [item, rater]")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        threshold: 0.5\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("threshold: 0.5", "threshold: 1.5")))
  }

  test("post_ops c4_clean: view equals the direct operator, parse strictness") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("c4_src")
    val good = "This sentence carries enough words to be retained today.\n" +
      "Another proper sentence closes with a question mark here, right?\n" +
      "A third full sentence ends the page with a bang!"
    Seq((1L, good), (2L, good + "\nif (x) { return; }"),
      (3L, "short\nlines\nonly"))
      .toDF("doc_id", "text")
      .write.parquet(s"$srcDir/pages.parquet")
    val y =
      s"""pipeline:
         |  name: "c4"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.pages:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "doc_id"
         |    post_ops:
         |      - op: c4_clean
         |        target: pages_clean
         |        id_column: doc_id
         |        text_column: text
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("c4_wh"))
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val cleanId = p.tables.head.tableId(p).copy(table = "pages_clean")
    val view = loader.readTarget(spark, cleanId).get
    val expect = graft.functions.TextFunctions.c4Clean(
      loader.readTarget(spark, p.tables.head.tableId(p)).get)
    assert(view.collect().map(_.toSeq).toSet ==
      expect.collect().map(_.toSeq).toSet)
    // the verdicts themselves: doc 1 kept, 2 killed by the brace, 3 by lines
    val kept = view.collect().map(r => r.getLong(0) ->
      r.getAs[Boolean]("kept_doc")).toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> false))
    // parse strictness: id/text columns required, k >= 1
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        text_column: text\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("text_column: text", "text_column: text\n        k: 0")))
  }

  test("post_ops drift_gate: baseline sync passes, shifted increment fails") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("drift_src")
    def writeRows(rows: Seq[(Long, String)], mode: String): Unit =
      rows.toDF("event_id", "cat")
        .write.mode(mode).parquet(s"$srcDir/facts.parquet")
    writeRows((1L to 50L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")), "errorifexists")
    val y =
      s"""pipeline:
         |  name: "drift"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.facts:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |    post_ops:
         |      - op: drift_gate
         |        target: facts_mix
         |        keys: [cat]
         |        threshold: 0.25
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("drift_wh"))
    // first sync defines the baseline mix, no gate
    assert(runner.sync(p).allOk)
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    def mix() = loader.readTarget(spark, baseId.copy(table = "facts_mix")).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix() == Map("a" -> 25L, "b" -> 25L))
    // same-mix increment passes and folds into the state
    writeRows((51L to 70L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")), "append")
    assert(runner.sync(p).allOk)
    assert(mix() == Map("a" -> 35L, "b" -> 35L))
    // a shifted increment (all-new category) breaches the PSI gate: the
    // table FAILS and the persisted mix stays put (cursor unmoved)
    writeRows((71L to 110L).map(i => (i, "z")), "append")
    val r3 = runner.sync(p)
    assert(!r3.allOk, "shifted increment passed the drift gate")
    assert(r3.tables.flatMap(_.error).exists(_.contains("drift_gate")),
      s"error was: ${r3.tables.flatMap(_.error)}")
    assert(mix() == Map("a" -> 35L, "b" -> 35L), "breached fold mutated state")
  }

  test("post_ops fold_probe: online weights equal sequential warm-started training") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("probe_src")
    def rows(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, Seq.tabulate(8)(d => (((i * 7 + d) % 13) - 6) / 10.0f),
        i % 10))
    def writeRows(r: Seq[(Long, Seq[Float], Int)], mode: String): Unit =
      r.toDF("vec_id", "embedding", "label")
        .write.mode(mode).parquet(s"$srcDir/vecs.parquet")
    writeRows(rows(0, 40), "errorifexists")
    val y =
      s"""pipeline:
         |  name: "probefold"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.vecs:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "vec_id"
         |    post_ops:
         |      - op: fold_probe
         |        target: vecs_probe
         |        vector_column: embedding
         |        value_column: label
         |        threshold: 5
         |        k: 3
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("probe_wh"))
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    def state() = loader.readTarget(spark, baseId.copy(table = "vecs_probe"))
      .get.collect()
      .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    import graft.functions.LearnFunctions
    def staged(r: Seq[(Long, Seq[Float], Int)]) =
      r.toDF("vec_id", "embedding", "label").select(
        LearnFunctions.quantize(col("embedding")).as("xq"),
        when(col("label") >= 5, 1L).otherwise(0L).as("y"))
    val w1 = LearnFunctions.trainLinearProbe(staged(rows(0, 40)), "xq", "y",
      iters = 3)
    val s1 = state()
    assert(s1.size == 9 && w1.zipWithIndex.forall { case (w, d) => s1(d) == w })
    assert(w1.exists(_ != 0), "first sync trained nothing")
    // second increment: the pipeline warm-starts from the persisted weights
    writeRows(rows(40, 70), "append")
    assert(runner.sync(p).allOk)
    val w2 = LearnFunctions.trainLinearProbe(staged(rows(40, 70)), "xq", "y",
      iters = 3, initWeights = Some(w1))
    val s2 = state()
    assert(w2.zipWithIndex.forall { case (w, d) => s2(d) == w },
      "folded weights diverge from sequential warm-started training")
    // idle re-sync: no new sessions, weights untouched (exactly-once)
    val r3 = runner.sync(p)
    assert(r3.allOk, r3.tables.flatMap(_.error).mkString(";"))
    assert(state() == s2)
  }

  test("post_ops epoch_shards: shard layout maintained, epoch bump re-deals") {
    def yml(epoch: Int) =
      s"""pipeline:
         |  name: "postops_shards"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.documents:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: epoch_shards
         |        target: documents_shards
         |        id_column: doc_id
         |        epoch: $epoch
         |""".stripMargin
    val wh = tmpDir("postops_es")
    val p0 = PipelineConfig.fromString(yml(0))
    val runner = new PipelineRunner(spark, wh)
    assert(runner.sync(p0).allOk)
    val (_, _, loader) = runner.rigFor(p0)
    val baseId = p0.tables.head.tableId(p0)
    val base = loader.readTarget(spark, baseId).get
    val nBase = base.count()
    // materialize before the re-sync below swaps the underlying files
    val sh0 = loader.readTarget(spark,
      baseId.copy(table = "documents_shards")).get
      .collect().map(_.toSeq).toSet
    // layout equals the direct operator application on the loaded base
    val expect = graft.functions.CorpusFunctions.epochShards(
      base, "doc_id", epoch = 0).collect().map(_.toSeq).toSet
    assert(sh0.size == nBase && sh0 == expect)
    // bumping the epoch in config re-deals the layout on the next sync
    assert(new PipelineRunner(spark, wh).sync(PipelineConfig.fromString(yml(1))).allOk)
    val sh1 = loader.readTarget(spark,
      baseId.copy(table = "documents_shards")).get
      .collect().map(_.toSeq).toSet
    assert(sh1.size == nBase)
    assert(sh1 != sh0, "epoch bump did not re-deal")
  }

  test("expectations: one-pass quality gate passes, fails, and validates") {
    def yml(rules: String) =
      s"""pipeline:
         |  name: "expect"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.orders:
         |    cdc_strategy: "full_sync"
         |    expectations:
         |$rules
         |""".stripMargin
    // contracts the orders fixture satisfies
    val good = PipelineConfig.fromString(yml(
      """      - column: o_totalprice
        |        min: 0
        |        null_frac_max: 0.0
        |      - column: o_orderkey
        |        distinct_min: 100
        |      - row_count_min: 10""".stripMargin))
    val r1 = new PipelineRunner(spark, tmpDir("exp_ok")).sync(good)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))

    // an impossible contract fails the TABLE with a named violation
    val bad = PipelineConfig.fromString(yml(
      """      - column: o_totalprice
        |        min: 1.0e12""".stripMargin))
    val r2 = new PipelineRunner(spark, tmpDir("exp_bad")).sync(bad)
    assert(!r2.allOk)
    assert(r2.tables.head.error.exists(_.contains("o_totalprice")), r2.tables.head.error)

    // a contract on a missing column reports, never crashes
    val miss = PipelineConfig.fromString(yml(
      """      - column: no_such_col
        |        min: 0""".stripMargin))
    val r3 = new PipelineRunner(spark, tmpDir("exp_miss")).sync(miss)
    assert(!r3.allOk)
    assert(r3.tables.head.error.exists(_.contains("no_such_col")))

    // parse-time strictness: no rule / column rule without column
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(yml("      - column: o_totalprice"))
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(yml("      - min: 0"))
    }

    // a min/max contract over an all-null or non-numeric column must report
    // a violation, not pass by vacuity (the NULL aggregate is not evidence
    // the bound holds)
    import org.apache.spark.sql.functions.{lit, col}
    val allNull = spark.range(10)
      .select(col("id"), lit(null).cast("double").as("v"), lit("x").as("s"))
    val vNull = graft.operators.Expectations.violations(allNull,
      Seq(graft.pipeline.ExpectationSpec(column = Some("v"),
        minValue = Some(0.0))))
    assert(vNull.exists(_.contains("all-NULL")), vNull.mkString(";"))
    val vStr = graft.operators.Expectations.violations(allNull,
      Seq(graft.pipeline.ExpectationSpec(column = Some("s"),
        maxValue = Some(100.0))))
    assert(vStr.exists(_.contains("non-numeric")), vStr.mkString(";"))

    // row-level expression contracts (cross-column): pass, count-tolerate,
    // NULL-is-violation, unresolvable/non-boolean named up front
    import org.apache.spark.sql.functions.when
    val rows = spark.range(10).select(col("id"),
      when(col("id") === 7, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("dbl"))
    def xp(sql: String, tol: Long = 0) = graft.pipeline.ExpectationSpec(
      column = None, expression = Some(sql), maxViolations = tol)
    assert(graft.operators.Expectations.violations(rows,
      Seq(xp("dbl = id * 2 OR id = 7"))).isEmpty)
    // id=7's NULL predicate is a violation (NULL is not TRUE)
    val vX = graft.operators.Expectations.violations(rows,
      Seq(xp("dbl = id * 2")))
    assert(vX.exists(_.contains("1 rows violate")), vX.mkString(";"))
    // ...but tolerated under max_violations
    assert(graft.operators.Expectations.violations(rows,
      Seq(xp("dbl = id * 2", tol = 1))).isEmpty)
    val vBadRef = graft.operators.Expectations.violations(rows,
      Seq(xp("no_col > 0")))
    assert(vBadRef.exists(_.contains("does not resolve")), vBadRef.mkString(";"))
    val vNotBool = graft.operators.Expectations.violations(rows,
      Seq(xp("id + 1")))
    assert(vNotBool.exists(_.contains("not boolean")), vNotBool.mkString(";"))
    // an aggregate smuggled into a row-level contract (the row_count_min
    // mistake) is a NAMED violation, not a nested-aggregate crash mid-gate
    val vAgg = graft.operators.Expectations.violations(rows,
      Seq(xp("count(*) > 100")))
    assert(vAgg.exists(_.contains("row-level")), vAgg.mkString(";"))
    // YAML reach + parse strictness for the expression form
    val exprCfg = PipelineConfig.fromString(yml(
      """      - expression: "o_totalprice >= 0 AND o_orderkey IS NOT NULL""""
        .stripMargin))
    assert(exprCfg.tables.head.expectations.head.expression.isDefined)
    intercept[IllegalArgumentException] { // max_violations without expression
      PipelineConfig.fromString(yml(
        """      - row_count_min: 1
          |        max_violations: 5""".stripMargin))
    }
  }

  test("post_ops zorder: in-place layout rewrite, content-exact, idempotent") {
    val y =
      s"""pipeline:
         |  name: "postops_zorder"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.lineitem:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |      - op: zorder
         |        keys: [l_partkey, l_suppkey]
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("postops_z"))
    val r = runner.sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    val got = loader.readTarget(spark, baseId).get
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(got.count() == src.count())
    assert(got.select("l_orderkey", "l_linenumber").exceptAll(
      src.select("l_orderkey", "l_linenumber")).isEmpty)
    // idempotent: a second sync (replace + re-sort) converges to the same
    val r2 = runner.sync(p)
    assert(r2.allOk)
    assert(loader.readTarget(spark, baseId).get.count() == src.count())
    // validation: zorder without keys is rejected at parse time
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(
        s"""pipeline:
           |  name: "bad"
           |  source: "$sfDir"
           |  target: "warehouse"
           |tables:
           |  fx.lineitem:
           |    cdc_strategy: "full_sync"
           |    post_ops:
           |      - op: zorder
           |""".stripMargin)
    }
  }

  test("post_ops folds: scd2 history and rollup stay fresh, exactly once") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("postops_src")
    def writeRows(rows: Seq[(Long, Long, String, Double)], mode: String): Unit =
      rows.toDF("event_id", "k", "status", "amount")
        .write.mode(mode).parquet(s"$srcDir/facts.parquet")
    val inc1 = Seq((1L, 1L, "open", 10.0), (2L, 2L, "open", 5.0),
      (3L, 1L, "open", 2.5))
    writeRows(inc1, "errorifexists")
    val y =
      s"""pipeline:
         |  name: "postops_folds"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.facts:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |    post_ops:
         |      - op: fold_aggregate
         |        target: facts_rollup
         |        keys: [k]
         |        sums:
         |          - {out: sum_amount, in: amount, scale: 2}
         |      - op: scd2_apply
         |        target: facts_history
         |        keys: [k]
         |        ts_column: event_id
         |        attr_columns: [status]
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("postops_f"))
    assert(runner.sync(p).allOk)
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    def rollup() = loader.readTarget(spark, baseId.copy(table = "facts_rollup"))
      .get.collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[java.math.BigDecimal]("sum_amount")
          .doubleValue))).toMap
    assert(rollup() == Map(1L -> ((2L, 12.5)), 2L -> ((1L, 5.0))))
    // increment: k=1 changes status (new history version), more amounts
    writeRows(Seq((4L, 1L, "done", 1.5), (5L, 3L, "open", 7.0)), "append")
    assert(runner.sync(p).allOk)
    assert(rollup() == Map(1L -> ((3L, 14.0)), 2L -> ((1L, 5.0)),
      3L -> ((1L, 7.0))))
    val hist = loader.readTarget(spark, baseId.copy(table = "facts_history")).get
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("status"),
        r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to"))))
      .toSet
    assert(hist == Set(
      (1L, "open", 3L, Some(java.lang.Long.valueOf(4L))), // closed by the change
      (1L, "done", 4L, None),
      (2L, "open", 2L, None),
      (3L, "open", 5L, None)), s"history was: $hist")
    // third sync, NO new rows: folds must be exactly-once no-ops
    assert(runner.sync(p).allOk)
    assert(rollup() == Map(1L -> ((3L, 14.0)), 2L -> ((1L, 5.0)),
      3L -> ((1L, 7.0))), "re-run must not double-fold")
  }

  test("post_ops sketch folds: state bit-identical to a one-pass build across syncs") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("sketch_src")
    def rows(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, s"t${i % 3}", (i * 7) % 40, (i % 100) / 2.0,
        s"alpha w${i % 9} beta w${i % 5}"))
    def write(lo: Long, hi: Long, mode: String): Unit =
      rows(lo, hi).toDF("event_id", "etype", "uid", "amt", "words")
        .write.mode(mode).parquet(s"$srcDir/ev.parquet")
    write(1, 300, "errorifexists")
    val y =
      s"""pipeline:
         |  name: "sketch_folds"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.ev:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |    post_ops:
         |      - op: fold_kmv_distinct
         |        target: ev_kmv
         |        keys: [etype]
         |        value_column: uid
         |        k: 16
         |      - op: fold_count_min
         |        target: ev_cms
         |        keys: [etype]
         |        value_column: uid
         |      - op: fold_sample
         |        target: ev_sample
         |        keys: [etype]
         |        id_column: event_id
         |        value_column: amt
         |        k: 32
         |      - op: fold_bm25
         |        target: ev_bm25
         |        id_column: event_id
         |        value_column: words
         |      - op: fold_bpe_tokens
         |        target: ev_bpe
         |        id_column: event_id
         |        value_column: words
         |        k: 4
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("sketch_wh"))
    assert(runner.sync(p).allOk)
    write(301, 500, "append")
    assert(runner.sync(p).allOk)
    val (_, _, loader) = runner.rigFor(p)
    val baseId = p.tables.head.tableId(p)
    import graft.operators.Sketches
    val all = rows(1, 500).toDF("event_id", "etype", "uid", "amt", "words")
    // every sketch state after two incremental syncs must equal the state
    // of ONE direct fold over the full source — exact merge invariance on
    // the pipeline surface, not just the operator surface
    def state(t: String) = loader.readTarget(spark, baseId.copy(table = t)).get
    val kmvGot = state("ev_kmv").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val kmvWant = Sketches.foldKmvDistinct(None, all, Seq("etype"), "uid",
      k = 16).collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(kmvGot == kmvWant)
    val cmsGot = state("ev_cms").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val cmsWant = Sketches.foldCountMin(None, all, Seq("etype"), "uid")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(cmsGot == cmsWant)
    val qGot = Sketches.readSampleQuantiles(state("ev_sample"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("q_50")).toMap
    val qWant = Sketches.readSampleQuantiles(
      Sketches.foldSampleState(None, all, Seq("etype"), "event_id", "amt",
        k = 32), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("q_50")).toMap
    assert(qGot == qWant)
    // the folded BM25 index equals a one-pass build, and scoring from it
    // equals batch BM25 over the full source
    import graft.functions.CorpusFunctions
    val probes = Seq((1L, "w3 w4"))
    def score(ix: org.apache.spark.sql.DataFrame) =
      CorpusFunctions.bm25FromIndex(ix, probes, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(4)))
        .sortBy(_._4).toSeq
    assert(score(state("ev_bm25")) ==
      score(CorpusFunctions.foldBm25Index(None, all, "event_id", "words")))
    // the BPE fold froze its merges on sync 1 and appended sync 2's doc
    // rows under them: state == one batch encode of ALL rows under the
    // frozen merge table
    import graft.functions.BpeFunctions
    val bpeState = state("ev_bpe")
    val frozen = BpeFunctions.bpeMergesFromState(bpeState)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(frozen == BpeFunctions.trainBpe(
      rows(1, 300).toDF("event_id", "etype", "uid", "amt", "words"),
      "words", 4).map(m => (m.left, m.right)),
      "merges must come from sync 1's increment alone")
    val bpeGot = BpeFunctions.bpeTokensFromState(bpeState).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bpeWant = BpeFunctions.encodeBpe(all, "event_id", "words", frozen)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bpeGot == bpeWant)
    // no new rows → exactly-once no-op
    assert(runner.sync(p).allOk)
    assert(state("ev_kmv").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap == kmvWant)
    // parse-time validation: fold_sample without id_column is rejected
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(y.replace("        id_column: event_id\n", ""))
    }
    // fold_bm25 carries the append-only contract: an updating strategy
    // (or merge_keys) would double-count restaged documents' postings
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(
        y.replace("cdc_strategy: \"id_only\"", "cdc_strategy: \"full_sync\"")
          .replace("    cdc_id_column: \"event_id\"\n", ""))
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.fromString(y.replace("    post_ops:",
        "    merge_keys: [event_id]\n    post_ops:"))
    }
  }

  test("post_ops neardup_labels: label table tracks batch clustering across syncs") {
    // the incremental dedup story wired into the PIPELINE surface: a
    // growing documents source syncs twice; after each sync the derived
    // label table must equal BATCH clustering of everything loaded so far,
    // while each sync's fold only band-probes its own increment
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val srcDir = tmpDir("ndsrc")
    docs.filter(col("doc_id") < 250).write.mode("overwrite")
      .parquet(s"$srcDir/documents.parquet")
    val y = s"""pipeline:
       |  name: "ndlabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: neardup_labels
       |        target: doc_clusters
       |        id_column: doc_id
       |        text_column: text
       |        threshold: 0.9
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val work = tmpDir("ndwork")
    val runner = new PipelineRunner(spark, work)
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "doc_clusters")
    def labelSet() = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchSet(upTo: Long) = graft.functions.DedupFunctions
      .duplicateClusters(graft.functions.DedupFunctions.minhashNearDuplicates(
        docs.filter(col("doc_id") < upTo), "doc_id", "text", threshold = 0.9))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    assert(labelSet() == batchSet(250L))
    // the source grows; the second sync folds only doc_id >= 250
    docs.write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    val r2 = runner.sync(p)
    assert(r2.allOk && r2.totalRows == docs.filter(col("doc_id") >= 250).count())
    assert(labelSet() == batchSet(100000L),
      "chained label folds diverged from batch clustering")
    // idle re-sync leaves the labels untouched (fold cursor no-op)
    val before = labelSet()
    assert(runner.sync(p).allOk)
    assert(labelSet() == before)

    // right-to-be-forgotten reaches the DERIVED state: forget scrubs the
    // doc's label row and its content-derived band hashes, preserving the
    // fold cursor so an idle re-sync cannot refold history and resurrect
    val victim = before.head._1
    val ymlPath = java.nio.file.Paths.get(tmpDir("ndcfg"), "nd.yml")
    java.nio.file.Files.writeString(ymlPath, y)
    assert(graft.Cli.run(Array("forget", "-t", "fx.documents",
      "--values", victim.toString, "--key-column", "doc_id",
      "-c", ymlPath.toString, "--work-dir", work)) == 0)
    assert(!labelSet().exists(_._1 == victim), "label row survived forget")
    val bands = spark.read.parquet(
      loader.targetPath(labelsId) + ".__bands")
    assert(bands.filter(col("doc_id") === victim).isEmpty,
      "band hashes survived forget")
    assert(runner.sync(p).allOk) // idle: cursor intact, no refold
    assert(!labelSet().exists(_._1 == victim),
      "idle re-sync resurrected the forgotten doc's label")
  }

  test("neardup_labels hot-bucket drops surface on the TableReport") {
    // silent recall loss made visible end-to-end: a cap of 1 drops every
    // shared (band,bucket), and the sync REPORT — not a global mutable —
    // carries what was discarded (the max_bucket_size knob + the drained
    // per-thread census). The default cap on the same data drops nothing.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def yaml(srcDir: String, cap: String) = s"""pipeline:
       |  name: "ndcap"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: neardup_labels
       |        target: doc_clusters
       |        id_column: doc_id
       |        text_column: text
       |        threshold: 0.9
       |$cap
       |""".stripMargin
    val srcDir = tmpDir("ndcapsrc")
    docs.filter(col("doc_id") < 250).write.mode("overwrite")
      .parquet(s"$srcDir/documents.parquet")
    val r1 = new PipelineRunner(spark, tmpDir("ndcapwork1"))
      .sync(PipelineConfig.fromString(
        yaml(srcDir, "        max_bucket_size: 1")))
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val drops1 = r1.tables.head.hotBucketDrops
    assert(drops1.exists(_.indexRows > 0),
      s"cap=1 on 250 banded docs must report dropped index rows, got $drops1")
    // default cap: census still ran (report is Some), nothing dropped
    val r2 = new PipelineRunner(spark, tmpDir("ndcapwork2"))
      .sync(PipelineConfig.fromString(yaml(srcDir, "")))
    assert(r2.allOk, r2.tables.flatMap(_.error).mkString(";"))
    val drops2 = r2.tables.head.hotBucketDrops
    assert(drops2.isDefined && drops2.forall(_.indexRows == 0L),
      s"default cap should census zero drops, got $drops2")
    // knob validation: a non-positive cap is a config error
    val bad = intercept[IllegalArgumentException](PipelineConfig.fromString(
      yaml(srcDir, "        max_bucket_size: 0")))
    assert(bad.getMessage.contains("max_bucket_size"))
  }

  test("post_ops neardup_labels_edges: rep-scale folds track batch clustering") {
    // the edge-form twin: same pipeline surface and batch-equality
    // contract as neardup_labels, but per-sync work is distinct-content
    // scale (fingerprint side table + rep-collapsed band index)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val srcDir = tmpDir("ndesrc")
    docs.filter(col("doc_id") < 250).write.mode("overwrite")
      .parquet(s"$srcDir/documents.parquet")
    val y = s"""pipeline:
       |  name: "ndelabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: neardup_labels_edges
       |        target: doc_eclusters
       |        id_column: doc_id
       |        text_column: text
       |        threshold: 0.9
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val work = tmpDir("ndework")
    val runner = new PipelineRunner(spark, work)
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "doc_eclusters")
    def labelSet() = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchSet(upTo: Long) = graft.functions.DedupFunctions
      .duplicateClusters(graft.functions.DedupFunctions.minhashNearDuplicates(
        docs.filter(col("doc_id") < upTo), "doc_id", "text", threshold = 0.9))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    assert(labelSet() == batchSet(250L))
    // side tables exist and are REP-scale: distinct fingerprints, and the
    // band index holds rows for reps only (strictly fewer docs than rows
    // loaded whenever any content repeats)
    val fps = spark.read.parquet(loader.targetPath(labelsId) + ".__repfps")
    val repBands = spark.read.parquet(loader.targetPath(labelsId) + ".__repbands")
    assert(fps.select("fingerprint").distinct().count() == fps.count())
    assert(repBands.select("doc_id").distinct().count() <=
      fps.count())
    docs.write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    val r2 = runner.sync(p)
    assert(r2.allOk && r2.totalRows == docs.filter(col("doc_id") >= 250).count())
    assert(labelSet() == batchSet(100000L),
      "chained edge folds diverged from batch clustering")
    // idle re-sync: fold cursor no-op
    val before = labelSet()
    assert(runner.sync(p).allOk)
    assert(labelSet() == before)

    // forget reaches BOTH side tables (band rows by doc_id, content-class
    // rep rows by rep_id) and the label row, preserving the cursor
    val victim = before.head._1
    val ymlPath = java.nio.file.Paths.get(tmpDir("ndecfg"), "nde.yml")
    java.nio.file.Files.writeString(ymlPath, y)
    assert(graft.Cli.run(Array("forget", "-t", "fx.documents",
      "--values", victim.toString, "--key-column", "doc_id",
      "-c", ymlPath.toString, "--work-dir", work)) == 0)
    assert(!labelSet().exists(_._1 == victim), "label row survived forget")
    assert(spark.read.parquet(loader.targetPath(labelsId) + ".__repbands")
      .filter(col("doc_id") === victim).isEmpty, "band rows survived forget")
    assert(spark.read.parquet(loader.targetPath(labelsId) + ".__repfps")
      .filter(col("rep_id") === victim).isEmpty, "rep fps survived forget")
    assert(runner.sync(p).allOk)
    assert(!labelSet().exists(_._1 == victim),
      "idle re-sync resurrected the forgotten doc's label")
  }

  test("neardup_labels_edges: crash between side-table appends and label swap replays convergently") {
    // the crash window END-TO-END through the post-op: a sync appends its
    // new-content (fingerprint, rep_id) rows and rep band rows, then dies
    // before the label swap. The replay derives novelty from a side table
    // that already contains ITS OWN fingerprints — unless novelty is gated
    // on reps the COMMITTED corpus contains, the replayed increment's
    // genuinely-new content is tagged 'known', the probe index comes back
    // empty, and its near-dup (non-identical) links to the corpus are
    // silently lost forever. Doc 14/15 (content c) vs doc 5 (c2) is
    // exactly such a link: LSH-only, never a fingerprint hit.
    val s = spark
    import s.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val a2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val b = "completely different content about spark catalyst optimizer " +
      "rules and adaptive execution at scale"
    val c = "a third topic on watermark stores and exactly once loading spark"
    val c2 = "a third topic on watermark stores and exactly once loading data"
    val corpusRows = Seq((1L, a), (2L, a), (3L, a2), (4L, b), (5L, c2))
    val incRows = Seq((11L, a), (12L, a2), (13L, b), (14L, c), (15L, c))
    val all = (corpusRows ++ incRows).toDF("doc_id", "text")
    val srcDir = tmpDir("ndcrashsrc")
    corpusRows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$srcDir/documents.parquet")
    val y = s"""pipeline:
       |  name: "ndcrash"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: neardup_labels_edges
       |        target: doc_crclusters
       |        id_column: doc_id
       |        text_column: text
       |        threshold: 0.5
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("ndcrashwork"))
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "doc_crclusters")
    assert(runner.sync(p).allOk)
    // plant the crash residue: exactly the rows the doomed sync appended
    // before dying — its new-content class (c, rep 14) and 14's band rows,
    // derived against the PRE-crash side table like the post-op did
    val D = graft.functions.DedupFunctions
    val incDf = incRows.toDF("doc_id", "text")
    val fpsPath = loader.targetPath(labelsId) + ".__repfps"
    val bandsPath = loader.targetPath(labelsId) + ".__repbands"
    val staleNewFps = D.repFingerprints(incDf, "doc_id", "text")
      .join(spark.read.parquet(fpsPath).select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
      .localCheckpoint(true)
    assert(staleNewFps.count() == 1) // the c class, keyed by increment id 14
    staleNewFps.write.mode("append").parquet(fpsPath)
    D.minhashBandIndex(incDf, "doc_id", "text")
      .join(staleNewFps.select(col("rep_id").as("doc_id")), Seq("doc_id"),
        "left_semi")
      .write.mode("append").parquet(bandsPath)
    // replay: the source now carries the increment; the fold cursor never
    // advanced, so the sync re-extracts and refolds ids 11-15
    all.write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    assert(runner.sync(p).allOk)
    val labels = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = D.duplicateClusters(D.minhashNearDuplicates(
        all, "doc_id", "text", threshold = 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == batch,
      s"replayed fold diverged from batch: $labels vs $batch")
    assert(labels.get(14L).exists(cl => labels.get(5L).contains(cl)),
      "the replayed increment's LSH-only corpus link (14~5) was lost")
  }

  test("forget: scrubbing an edge-form class REP re-elects the min surviving member") {
    val s = spark
    import s.implicits._
    // 3 identical docs (1,2,3) + a distinct one (9): doc 1 is the content
    // class rep carried by the __repfps/__repbands side tables
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "completely different content about catalyst optimizer rules here"
    val srcDir = tmpDir("fresrc")
    Seq((1L, a), (2L, a), (3L, a), (9L, b)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    val y = s"""pipeline:
       |  name: "frelabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: neardup_labels_edges
       |        target: doc_fclusters
       |        id_column: doc_id
       |        text_column: text
       |        threshold: 0.9
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val work = tmpDir("frework")
    val runner = new PipelineRunner(spark, work)
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "doc_fclusters")
    assert(runner.sync(p).allOk)
    // forget the REP: without re-election the whole class is orphaned —
    // survivors' band rows were never in the rep-collapsed index, so
    // future identical content could never link to them again
    val ymlPath = java.nio.file.Paths.get(tmpDir("frecfg"), "fre.yml")
    java.nio.file.Files.writeString(ymlPath, y)
    assert(graft.Cli.run(Array("forget", "-t", "fx.documents",
      "--values", "1", "--key-column", "doc_id",
      "-c", ymlPath.toString, "--work-dir", work)) == 0)
    val fps = spark.read.parquet(loader.targetPath(labelsId) + ".__repfps")
    assert(fps.filter(col("rep_id") === 1L).isEmpty, "doomed rep row survived")
    assert(fps.filter(col("rep_id") === 2L).count() == 1L,
      "min surviving member was not re-elected as class rep")
    assert(spark.read.parquet(loader.targetPath(labelsId) + ".__repbands")
      .filter(col("doc_id") === 2L).count() > 0L,
      "re-elected rep has no band-index rows")
    // the recall contract end-to-end: a NEW identical doc arriving after
    // the forget must still link to the surviving class members
    Seq((1L, a), (2L, a), (3L, a), (9L, b), (11L, a)).toDF("doc_id", "text")
      .filter(col("doc_id") =!= 1L) // 1 is tombstoned; ship the increment
      .write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    assert(runner.sync(p).allOk)
    val labels = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.contains(11L) && labels(11L) == labels(2L),
      s"new identical content failed to rejoin the surviving class: $labels")
  }

  test("post_ops simhash_labels: chained folds equal batch simhash clustering") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val srcDir = tmpDir("shsrc")
    docs.filter(col("doc_id") < 250).write.mode("overwrite")
      .parquet(s"$srcDir/documents.parquet")
    val y = s"""pipeline:
       |  name: "shlabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.documents:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "doc_id"
       |    post_ops:
       |      - op: simhash_labels
       |        target: doc_shclusters
       |        id_column: doc_id
       |        text_column: text
       |        k: 3
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("shwork"))
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "doc_shclusters")
    def labelSet() = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchSet(upTo: Long) = graft.functions.DedupFunctions
      .duplicateClusters(graft.functions.DedupFunctions.simhashNearDuplicates(
        docs.filter(col("doc_id") < upTo), "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(runner.sync(p).allOk)
    assert(labelSet() == batchSet(250L))
    docs.write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    assert(runner.sync(p).allOk)
    assert(labelSet() == batchSet(100000L),
      "chained simhash label folds diverged from batch clustering")
    // idle re-sync: fold cursor no-op
    val before = labelSet()
    assert(runner.sync(p).allOk)
    assert(labelSet() == before)
  }

  test("post_ops embedding_neardup: chained folds equal batch cosine clustering") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val srcDir = tmpDir("ensrc")
    emb.filter(col("vec_id") < 40).write.mode("overwrite")
      .parquet(s"$srcDir/embeddings.parquet")
    val y = s"""pipeline:
       |  name: "enlabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.embeddings:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "vec_id"
       |    post_ops:
       |      - op: embedding_neardup
       |        target: vec_clusters
       |        id_column: vec_id
       |        vector_column: embedding
       |        threshold: 0.5
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("enwork"))
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "vec_clusters")
    def labelSet() = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchSet(upTo: Long) = graft.functions.DedupFunctions
      .duplicateClusters(graft.functions.VectorFunctions
        .cosineNearDuplicatesLsh(emb.filter(col("vec_id") < upTo),
          threshold = 0.5)
        .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(runner.sync(p).allOk)
    assert(labelSet() == batchSet(40L))
    emb.write.mode("overwrite").parquet(s"$srcDir/embeddings.parquet")
    assert(runner.sync(p).allOk)
    assert(labelSet() == batchSet(100000L),
      "chained embedding label folds diverged from batch clustering")
  }

  test("post_ops image_neardup_labels: chained folds equal batch clustering") {
    val s = spark; import s.implicits._
    def png(px: Array[Array[Int]]): Array[Byte] = {
      val h = px.length; val w = px(0).length
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (px(y)(x) << 16) | (px(y)(x) << 8) | px(y)(x))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val base = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80),
      Array(90, 100, 110, 120))
    val flip = base.map(_.clone()); flip(0)(1) = 5 // one gradient sign flips
    val otherDims = Array(Array(10, 20, 30, 40, 50), Array(50, 60, 70, 80, 90),
      Array(90, 100, 110, 120, 130))
    val srcDir = tmpDir("imgsrc")
    def writeImgs(rows: Seq[(Long, Array[Byte])], mode: String): Unit =
      rows.toDF("img_id", "payload")
        .write.mode(mode).parquet(s"$srcDir/images.parquet")
    // batch 1: two identical images + one with different dims
    writeImgs(Seq((1L, png(base)), (2L, png(base)), (3L, png(otherDims))),
      "errorifexists")
    val y = s"""pipeline:
       |  name: "imglabels"
       |  source: "$srcDir"
       |  target: "warehouse"
       |tables:
       |  fx.images:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "img_id"
       |    post_ops:
       |      - op: image_neardup_labels
       |        target: img_clusters
       |        id_column: img_id
       |        value_column: payload
       |        k: 2
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("imgwork"))
    val (_, _, loader) = runner.rigFor(p)
    val labelsId = p.tables.head.tableId(p).copy(table = "img_clusters")
    def labelSet() = loader.readTarget(spark, labelsId).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchSet() = {
      val all = loader.readTarget(spark, p.tables.head.tableId(p)).get
        .select(col("img_id"), col("payload"))
      graft.functions.DedupFunctions.duplicateClusters(
        graft.multimodal.Multimodal.imageNearDuplicates(
          graft.multimodal.Multimodal.imagePerceptualHashes(
            spark, all, "img_id"), maxHamming = 2, "img_id")
          .select(col("id_a"), col("id_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(runner.sync(p).allOk)
    assert(labelSet() == Set((1L, 1L), (2L, 1L)), s"got ${labelSet()}")
    assert(labelSet() == batchSet())
    // batch 2: a 1-bit near-dup of the cluster + another unrelated shape —
    // only NEW images are decoded, probed via the persisted hash table
    writeImgs(Seq((4L, png(flip)), (5L, png(otherDims.map(_.map(255 - _))))),
      "append")
    assert(runner.sync(p).allOk)
    assert(labelSet() == batchSet(),
      "chained image label folds diverged from batch clustering")
    assert(labelSet().contains((4L, 1L)),
      s"the near-dup must join the existing cluster: ${labelSet()}")
    // idle re-sync: fold cursor no-op
    val before = labelSet()
    assert(runner.sync(p).allOk)
    assert(labelSet() == before)
    // parse strictness: value_column required, k bounded, append-only only
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("        value_column: payload\n", "")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("k: 2", "k: 9")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      y.replace("cdc_strategy: \"id_only\"", "cdc_strategy: \"full_sync\"")))
  }

  test("simhash_labels / embedding_neardup parse strictness") {
    def yml(op: String, extra: String, strategy: String = "id_only") =
      s"""pipeline:
         |  name: "strict"
         |  source: "/tmp/x"
         |  target: "warehouse"
         |tables:
         |  fx.t:
         |    cdc_strategy: "$strategy"
         |    cdc_id_column: "id"
         |    post_ops:
         |      - op: $op
         |        target: d
         |$extra""".stripMargin
    // missing required fields
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yml("simhash_labels", "        id_column: id\n")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yml("embedding_neardup",
        "        id_column: id\n        vector_column: v\n"))) // no threshold
    // bound violations
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yml("simhash_labels",
        "        id_column: id\n        text_column: t\n        k: 99\n")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yml("embedding_neardup",
        "        id_column: id\n        vector_column: v\n" +
          "        threshold: 1.5\n")))
    // append-only contract: non-id_only strategies refused at parse
    val e = intercept[IllegalArgumentException](PipelineConfig.fromString(
      yml("simhash_labels",
        "        id_column: id\n        text_column: t\n",
        strategy = "full_sync")))
    assert(e.getMessage.contains("id_only"), e.getMessage)
    // valid configs parse
    PipelineConfig.fromString(yml("simhash_labels",
      "        id_column: id\n        text_column: t\n"))
    PipelineConfig.fromString(yml("embedding_neardup",
      "        id_column: id\n        vector_column: v\n" +
        "        threshold: 0.8\n"))
    ()
  }

  test("expectations gate holds back post_ops on a violating sync") {
    // a violating increment must not advance derived state whose fold
    // cursors make the advance irreversible — the quality gate actually
    // gates; the next PASSING sync recomputes/refolds normally
    def yml(minRows: Long) = s"""pipeline:
       |  name: "gatepo"
       |  source: "$sfDir"
       |  target: "warehouse"
       |tables:
       |  fx.orders:
       |    cdc_strategy: "full_sync"
       |    expectations:
       |      - row_count_min: $minRows
       |    post_ops:
       |      - op: dedup_latest
       |        target: orders_latest
       |        keys: [o_custkey]
       |        ts_column: o_orderdate
       |        id_column: o_orderkey
       |""".stripMargin
    val work = tmpDir("gatepo")
    val runner = new PipelineRunner(spark, work)
    val bad = PipelineConfig.fromString(yml(10000000L))
    val r1 = runner.sync(bad)
    assert(!r1.allOk)
    val (_, _, loader) = runner.rigFor(bad)
    val dId = bad.tables.head.tableId(bad).copy(table = "orders_latest")
    assert(loader.readTarget(spark, dId).isEmpty,
      "post_op ran despite a failed expectations gate")
    val good = PipelineConfig.fromString(yml(10L))
    assert(runner.sync(good).allOk)
    assert(loader.readTarget(spark, dId).nonEmpty)
  }

  test("post_ops config: strict validation at parse time") {
    def parse(postOps: String) = PipelineConfig.fromString(
      s"""pipeline:
         |  name: "x"
         |  source: "s"
         |tables:
         |  fx.t:
         |    cdc_strategy: "full_sync"
         |    post_ops:
         |$postOps
         |""".stripMargin)
    intercept[IllegalArgumentException](parse(
      "      - op: frobnicate\n        target: t2"))
    intercept[IllegalArgumentException](parse(
      "      - op: dedup_latest\n        target: t2"))         // missing cols
    intercept[IllegalArgumentException](parse(
      "      - op: fold_aggregate\n        target: t2\n        keys: [k]"))
    // duplicate sink name across table + post_op
    intercept[IllegalArgumentException](parse(
      "      - op: dedup_latest\n        target: t\n        keys: [k]\n" +
        "        ts_column: ts\n        id_column: id"))
    // a valid one parses
    val ok = parse(
      "      - op: dedup_latest\n        target: t_latest\n        keys: [k]\n" +
        "        ts_column: ts\n        id_column: id")
    assert(ok.tables.head.postOps.head.target == "t_latest")

    // neardup_labels enforces its append-only contract at parse: the fold
    // is irreversible, so strategies that restage/update, merge tables,
    // and the loader's backlog trim are all rejected loudly
    def ndYml(strategy: String, extra: String = "",
              processing: String = ""): String =
      s"""pipeline:
         |  name: "x"
         |  source: "s"
         |$processing
         |tables:
         |  fx.docs:
         |    cdc_strategy: "$strategy"
         |    cdc_id_column: "doc_id"
         |$extra
         |    post_ops:
         |      - op: neardup_labels
         |        target: clusters
         |        id_column: doc_id
         |        text_column: text
         |""".stripMargin
    assert(PipelineConfig.fromString(ndYml("id_only"))
      .tables.head.postOps.head.op == "neardup_labels")
    intercept[IllegalArgumentException](
      PipelineConfig.fromString(ndYml("full_sync")))
    intercept[IllegalArgumentException](
      PipelineConfig.fromString(ndYml("id_only",
        extra = "    merge_keys: [doc_id]")))
    intercept[IllegalArgumentException](
      PipelineConfig.fromString(ndYml("id_only",
        processing = "  processing:\n    max_files_per_load: 10")))
  }

  test("ceiling guard: rows arriving after session start don't extend the extract") {
    // the reference snapshots MAX(id) at sync start so a writer racing the
    // extract can't extend the session indefinitely (row_based.py:278-292);
    // here the "late" rows land between the ceiling snapshot and the scan
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("ceil_src")
    def writeRows(lo: Long, hi: Long, mode: String): Unit =
      (lo to hi).toDF("event_id").withColumn("v", col("event_id") * 2)
        .write.mode(mode).parquet(s"$srcDir/cevents.parquet")
    writeRows(1, 20, "errorifexists")
    val y =
      s"""pipeline:
         |  name: "ceil_sync"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.cevents:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("ceil_work"))
    val inner = new FileCatalog(srcDir)
    val racing = new SourceCatalog {
      def table(sp: org.apache.spark.sql.SparkSession, spec: TableSpec,
                cursor: graft.cdc.Cursor): org.apache.spark.sql.DataFrame =
        inner.table(sp, spec, cursor)
      override def snapshotCeiling(sp: org.apache.spark.sql.SparkSession,
                                   spec: TableSpec): Option[Long] = {
        val c = inner.snapshotCeiling(sp, spec)
        writeRows(21, 30, "append") // arrives "mid-extract"
        c
      }
    }
    assert(runner.sync(p, catalog = Some(racing)).allOk)
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.head.tableId(p)
    val t1 = loader.readTarget(spark, id).get
    assert(t1.count() == 20, "late rows must not extend the running session")
    assert(t1.agg(max(col("event_id"))).head().getLong(0) == 20L)
    // the NEXT session picks up exactly the late rows — none lost, none duplicated
    val r2 = runner.sync(p)
    assert(r2.allOk && r2.totalRows == 10, s"second sync rows: ${r2.totalRows}")
    assert(loader.readTarget(spark, id).get.count() == 30)
  }

  test("parallel mode produces the same result as sequential") {
    val p0 = PipelineConfig.fromString(yaml)
    val p = p0.copy(processing = p0.processing.copy(maxParallelTables = 3))
    val work = tmpDir("pipe3")
    val runner = new PipelineRunner(spark, work)
    val report = runner.sync(p)
    assert(report.allOk, report.tables.flatMap(_.error).mkString(";"))
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.find(_.name == "fx.orders").get
      .tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    assert(loader.readTarget(spark, id).get.count() ==
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("dimension tables run before fact tables (DAG phase ordering)") {
    val y = yaml
      .replace("  fx.region:\n    cdc_strategy: \"full_sync\"",
        "  fx.region:\n    cdc_strategy: \"full_sync\"\n    table_type: \"dimension\"")
    val p = PipelineConfig.fromString(y)
    assert(p.tables.find(_.name == "fx.region").get.tableType ==
      graft.model.TableType.Dimension)
    val runner = new PipelineRunner(spark, tmpDir("pipe5"))
    val report = runner.sync(p)
    assert(report.allOk)
    // region (the only dimension) must be the FIRST report row
    assert(report.tables.head.table.table == "region")
  }

  test("merge-mode sync upserts by key instead of appending") {
    // hybrid CDC on orders with merge_keys: re-extracting overlapping rows
    // must UPSERT (no duplicate keys in the warehouse)
    val y = yaml.replace(
      "    cdc_id_column: \"o_orderkey\"",
      "    cdc_id_column: \"o_orderkey\"\n    merge_keys: [\"o_orderkey\"]")
    val p = PipelineConfig.fromString(y)
    assert(p.tables.find(_.name == "fx.orders").get.mergeKeys == Seq("o_orderkey"))
    val work = tmpDir("pipemerge")
    val runner = new PipelineRunner(spark, work)
    val r1 = runner.sync(p, tableFilter = Some("orders"))
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (store, _, loader) = runner.rigFor(p)
    val id = p.tables.find(_.name == "fx.orders").get
      .tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    val n = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(loader.readTarget(spark, id).get.count() == n)
    // force a re-extract of everything: reset cursor but keep file blacklist
    // empty by resetting the whole watermark doc
    store.reset(id.scoped)
    val r2 = runner.sync(p, tableFilter = Some("orders"))
    assert(r2.allOk)
    val target = loader.readTarget(spark, id).get
    assert(target.count() == n)  // upserted, not doubled
    assert(target.groupBy("o_orderkey").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("merge_buckets YAML key routes pipeline merges through the bucketed path") {
    // the scale-correct merge (rewrite only buckets containing staged keys)
    // must be reachable from the product surface: a YAML pipeline with
    // merge_keys + merge_buckets syncs twice, and buckets untouched by the
    // second increment keep byte-identical files (never rewritten)
    val y =
      s"""pipeline:
         |  name: "bucketed_sync"
         |  source: "$sfDir"
         |  target: "warehouse"
         |  s3:
         |    isolation_prefix: "fx/"
         |    partition_strategy: "table"
         |tables:
         |  fx.orders:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "o_orderkey"
         |    merge_keys: ["o_orderkey"]
         |    merge_buckets: 8
         |    validation:
         |      enable_count_check: true   # must be SKIPPED for merge tables:
         |                                 # the cumulative counter counts
         |                                 # update rows the merge dedups
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val spec = p.tables.find(_.name == "fx.orders").get
    assert(spec.mergeKeys == Seq("o_orderkey") && spec.mergeBuckets.contains(8))
    val work = tmpDir("pipebuckets")
    val runner = new PipelineRunner(spark, work)
    val r1 = runner.sync(p, tableFilter = Some("orders"))
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (store, _, loader) = runner.rigFor(p)
    val id = spec.tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    val n = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(loader.readTarget(spark, id).get.count() == n)
    // target is laid out bucketed — proof the pipeline reached mergeIntoBucketed
    val targetDir = new java.io.File(loader.targetPath(id))
    def bucketFiles(): Map[String, Map[String, (Long, Long)]] =
      targetDir.listFiles().filter(_.getName.startsWith("__gbucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
        }.toMap
    val before = bucketFiles()
    assert(before.nonEmpty, "pipeline merge did not produce a bucketed layout")

    // second increment: re-extract ONE key's worth of rows (cursor rewound
    // just below the max id) → only that key's bucket may be rewritten
    val maxId = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(max("o_orderkey")).head().getLong(0)
    store.setManual(id.scoped, None, Some(maxId - 1))
    val r2 = runner.sync(p, tableFilter = Some("orders"))
    assert(r2.allOk, r2.tables.flatMap(_.error).mkString(";"))
    assert(loader.readTarget(spark, id).get.count() == n) // upserted, not appended
    val after = bucketFiles()
    val rewritten = before.keys.filter(b => after.get(b) != before.get(b)).toSet
    // the increment is a single key → at most ONE bucket may change
    assert(rewritten.size <= 1,
      s"increment of one key rewrote ${rewritten.size} buckets: $rewritten")
    // the untouched buckets are byte-identical (same names, sizes, mtimes)
    (before.keys.toSet -- rewritten).foreach { b =>
      assert(after(b) == before(b), s"bucket $b was rewritten")
    }
  }

  test("count-parity gate passes on a clean sync and is reported") {
    val y = yaml.replace(
      "  fx.events:\n    cdc_strategy: \"id_only\"\n    cdc_id_column: \"event_id\"",
      "  fx.events:\n    cdc_strategy: \"id_only\"\n    cdc_id_column: \"event_id\"\n" +
        "    validation:\n      enable_count_check: true")
    val p = PipelineConfig.fromString(y)
    assert(p.tables.find(_.name == "fx.events").get.countCheck)
    val runner = new PipelineRunner(spark, tmpDir("pipe6"))
    val report = runner.sync(p, tableFilter = Some("events"))
    assert(report.allOk)
    assert(report.tables.head.parityOk.contains(true))
  }

  test("evolution_policy YAML key gates schema drift through the sync path") {
    // a mutable source dir: second sync sees a WIDENED schema
    val srcDir = tmpDir("evsrc")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    events.filter(col("event_id") <= 300)
      .write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    def pipelineWith(policy: String) = PipelineConfig.fromString(
      s"""pipeline:
         |  name: "ev_$policy"
         |  source: "$srcDir"
         |  target: "warehouse"
         |  processing:
         |    evolution_policy: "$policy"
         |tables:
         |  fx.events:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |""".stripMargin)
    for (policy <- Seq("strict", "additive")) {
      val runner = new PipelineRunner(spark, tmpDir(s"evwork_$policy"),
        maxAttempts = 1)
      val p = pipelineWith(policy)
      assert(runner.sync(p).allOk)
      // widen the source schema; new rows only (cursor skips the old ones)
      events.filter(col("event_id") > 300)
        .withColumn("extra_col", lit("x"))
        .write.mode("overwrite").parquet(s"$srcDir/events.parquet")
      val r2 = runner.sync(p)
      if (policy == "strict") {
        assert(!r2.allOk, "strict policy accepted drifted schema")
        assert(r2.tables.head.error.exists(_.contains("schema drift")))
      } else {
        assert(r2.allOk, r2.tables.flatMap(_.error).mkString(";"))
      }
      // restore the source for the next loop iteration
      events.filter(col("event_id") <= 300)
        .write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    }
  }

  test("source_format YAML key syncs ORC, JSONL and CSV sources") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val n = events.count()
    for (fmt <- Seq("orc", "json", "csv")) {
      val srcDir = tmpDir(s"fmt_$fmt")
      fmt match {
        case "orc" => events.write.mode("overwrite").orc(s"$srcDir/events.orc")
        case "json" => events.write.mode("overwrite").json(s"$srcDir/events.json")
        case "csv" => events.write.mode("overwrite").option("header", "true")
          .csv(s"$srcDir/events.csv")
      }
      val p = PipelineConfig.fromString(
        s"""pipeline:
           |  name: "fmt_$fmt"
           |  source: "$srcDir"
           |  source_format: "$fmt"
           |  target: "warehouse"
           |tables:
           |  fx.events:
           |    cdc_strategy: "id_only"
           |    cdc_id_column: "event_id"
           |""".stripMargin)
      val runner = new PipelineRunner(spark, tmpDir(s"fmtwork_$fmt"))
      val r = runner.sync(p)
      assert(r.allOk, s"$fmt: ${r.tables.flatMap(_.error).mkString(";")}")
      assert(r.totalRows == n, s"$fmt lost rows")
      // incremental semantics hold regardless of source format
      assert(runner.sync(p).totalRows == 0, s"$fmt cursor did not advance")
    }
  }

  test("source count gate: metadata-only counts pass clean syncs, catch divergence") {
    val y =
      s"""pipeline:
         |  name: "srccount"
         |  source: "$sfDir"
         |  target: "warehouse"
         |tables:
         |  fx.region:
         |    cdc_strategy: "full_sync"
         |    validation:
         |      enable_source_count_check: true
         |""".stripMargin
    val p = PipelineConfig.fromString(y)
    assert(p.tables.head.sourceCountCheck)
    val runner = new PipelineRunner(spark, tmpDir("srccount"))
    val clean = runner.sync(p)
    assert(clean.allOk && clean.tables.head.parityOk.contains(true))
    // a catalog whose source count diverges from the loaded target must
    // fail the gate (stands in for rows changing between scan and count)
    val inner = new FileCatalog(sfDir)
    val lying = new SourceCatalog {
      def table(sp: org.apache.spark.sql.SparkSession, spec: TableSpec,
                cursor: graft.cdc.Cursor): org.apache.spark.sql.DataFrame =
        inner.table(sp, spec, cursor)
      override def sourceRowCount(sp: org.apache.spark.sql.SparkSession,
                                  spec: TableSpec): Long =
        inner.sourceRowCount(sp, spec) + 1
    }
    val bad = runner.sync(p, catalog = Some(lying))
    assert(!bad.allOk && bad.tables.head.parityOk.contains(false))
  }

  test("s3.compression YAML key reaches the staged and warehouse files") {
    val y = yaml.replace("partition_strategy: \"table\"",
      "partition_strategy: \"table\"\n    compression: \"zstd\"")
    val p = PipelineConfig.fromString(y)
    assert(p.sink.compression == "zstd")
    val work = tmpDir("pipezstd")
    val runner = new PipelineRunner(spark, work)
    val report = runner.sync(p, tableFilter = Some("region"))
    assert(report.allOk, report.tables.flatMap(_.error).mkString(";"))
    import scala.jdk.CollectionConverters._
    def parquets(dir: String): Seq[String] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    val staged = parquets(s"$work/fx/staging")
    val warehouse = parquets(s"$work/fx/warehouse")
    assert(staged.nonEmpty && staged.forall(_.contains(".zstd.")),
      s"staged not zstd: ${staged.take(2)}")
    assert(warehouse.nonEmpty && warehouse.forall(_.contains(".zstd.")),
      s"warehouse not zstd: ${warehouse.take(2)}")
  }

  test("CLI export: shard layout materializes in pos order; strict args") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("export_cli_src")
    (1L to 200L).map(i => (i, s"text_$i", i * 13 % 97))
      .toDF("doc_id", "text", "score")
      .write.parquet(s"$srcDir/docs.parquet")
    // a second table whose ids are DISJOINT from the layout's (the
    // wrong-layout misuse case)
    (1001L to 1010L).map(i => (i, s"other_$i", i % 7))
      .toDF("doc_id", "text", "score")
      .write.parquet(s"$srcDir/other.parquet")
    val ymlPath = java.nio.file.Paths.get(tmpDir("export_cli_cfg"), "p.yml")
    java.nio.file.Files.writeString(ymlPath,
      s"""pipeline:
         |  name: "exportcli"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.other:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "doc_id"
         |  fx.docs:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "doc_id"
         |    post_ops:
         |      - op: curriculum
         |        target: docs_cur
         |        id_column: doc_id
         |        value_column: score
         |        k: 4
         |""".stripMargin)
    val work = tmpDir("export_cli_wh")
    def cli(args: String*): Int =
      graft.Cli.run((args ++ Seq("-c", ymlPath.toString,
        "--work-dir", work)).toArray)
    assert(cli("sync") == 0)
    val out = tmpDir("export_cli_out") + "/shards"
    assert(cli("export", "-t", "fx.docs", "--layout", "docs_cur",
      "--out", out) == 0)
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    // every shard dir exists and carries its band
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == 4, dirs.map(_.getName).mkString(","))
    // missing args are usage errors (exit 2), not stack traces
    assert(cli("export", "-t", "fx.docs") == 2)
    assert(cli("export", "-t", "fx.docs", "--layout", "docs_cur") == 2)
    // unknown layout table exits cleanly too
    assert(cli("export", "-t", "fx.docs",
      "--layout", "nope", "--out", out + "2") == 2)
    // an export whose ids are disjoint from the layout writes 0 rows:
    // a clean usage error (exit 2), not a schema-inference stack trace
    assert(cli("export", "-t", "fx.other", "--layout", "docs_cur",
      "--out", tmpDir("export_cli_empty") + "/shards") == 2)
  }

  test("CLI diff: parity exits 0, divergence is counted and exits 1") {
    val s = spark
    import s.implicits._
    val srcDir = tmpDir("diff_cli_src")
    def writeRows(rows: Seq[(Long, String, Double)], mode: String): Unit =
      rows.toDF("event_id", "cat", "v")
        .write.mode(mode).parquet(s"$srcDir/facts.parquet")
    writeRows(Seq((1L, "a", 10.0), (2L, "b", 20.0)), "errorifexists")
    val ymlPath = java.nio.file.Paths.get(tmpDir("diff_cli_cfg"), "p.yml")
    java.nio.file.Files.writeString(ymlPath,
      s"""pipeline:
         |  name: "diffcli"
         |  source: "$srcDir"
         |  target: "warehouse"
         |tables:
         |  fx.facts:
         |    cdc_strategy: "id_only"
         |    cdc_id_column: "event_id"
         |""".stripMargin)
    val work = tmpDir("diff_cli_wh")
    def cli(args: String*): Int =
      graft.Cli.run((args ++ Seq("-c", ymlPath.toString,
        "--work-dir", work)).toArray)
    assert(cli("sync") == 0)
    assert(cli("diff", "-t", "fx.facts") == 0) // in parity after the sync
    // a new source row not yet synced → source-only divergence, exit 1
    writeRows(Seq((3L, "c", 30.0)), "append")
    assert(cli("diff", "-t", "fx.facts") == 1)
    // draining the increment restores parity
    assert(cli("sync") == 0)
    assert(cli("diff", "-t", "fx.facts") == 0)
  }

  test("CLI verb battery: sync/status/backup/load/watermark/unlock/s3clean") {
    val work = tmpDir("cliverbs")
    val ymlPath = java.nio.file.Paths.get(tmpDir("clicfg"), "p.yml")
    java.nio.file.Files.writeString(ymlPath, yaml)
    def cli(args: String*): Int =
      graft.Cli.run((args ++ Seq("-c", ymlPath.toString,
        "--work-dir", work)).toArray)
    // plan preview executes nothing
    assert(cli("sync", "--dry-run") == 0)
    assert(!new java.io.File(s"$work/fx/warehouse").exists())
    // extract-only, then load drains the staged files
    assert(cli("backup", "-t", "fx.region") == 0)
    assert(cli("load", "-t", "fx.region") == 0)
    // full sync of the rest
    assert(cli("sync") == 0)
    assert(cli("status") == 0)
    // watermark get/set/reset round-trip through the CLI
    assert(cli("watermark", "get", "-t", "fx.events") == 0)
    assert(cli("watermark", "set", "-t", "fx.events", "--id", "42") == 0)
    assert(cli("watermark", "reset", "-t", "fx.events") == 0)
    assert(cli("watermark", "get") == 2)          // -t is mandatory
    // merge verb upserts staged files by the configured id column, THROUGH
    // the blacklist-filtered mergeLoad path: after the sync above every
    // staged file is processed, so the verb must be a no-op — the raw
    // whole-staging-dir merge it used to run would resurrect every stale
    // version of every key as duplicate rows
    val p0 = PipelineConfig.fromString(yaml)
    val ordersSpec = p0.tables.find(_.name == "fx.orders").get
    val ordersId = ordersSpec.tableId(p0.source.replaceAll("[^A-Za-z0-9_]", "_"))
    val runner0 = new PipelineRunner(spark, work)
    val (_, _, loader0) = runner0.rigFor(p0)
    val ordersBefore = loader0.readTarget(spark, ordersId).get.count()
    assert(cli("merge", "-t", "fx.orders") == 0)
    assert(loader0.readTarget(spark, ordersId).get.count() == ordersBefore,
      "merge verb over fully-processed staging must not change the target")
    // negative option values parse as values, not flags
    assert(cli("watermark", "set", "-t", "fx.events", "--id", "-1") == 0)
    // non-numeric option → usage error, not a stack trace
    assert(cli("sync", "--parallel", "abc") == 2)
    // unlock: nothing held → exit 1; --force on nothing → still 1
    assert(cli("unlock", "-t", "fx.events") == 1)
    assert(cli("unlock", "-t", "fx.events", "--force") == 1)
    // compact the synced table (tiny → no-op or collapse, either exits 0)
    assert(cli("compact", "-t", "fx.region") == 0)
    // forget: delete + tombstone two order keys through the CLI
    val forgetBefore = loader0.readTarget(spark, ordersId).get.count()
    assert(cli("forget", "-t", "fx.orders", "--values", "1,2",
      "--key-column", "o_orderkey") == 0)
    val afterForget = loader0.readTarget(spark, ordersId).get
    assert(afterForget.filter(col("o_orderkey").isin(1L, 2L)).isEmpty)
    assert(afterForget.count() == forgetBefore - 2)
    assert(cli("forget", "-t", "fx.orders") == 2)  // missing --values
    // resolved-config inspection (whole pipeline, then one table)
    assert(cli("config") == 0)
    assert(cli("config", "-t", "fx.orders") == 0)
    // s3clean dry-run reports, deletes nothing
    assert(cli("s3clean", "--older-than-hours", "0", "--dry-run") == 0)
    assert(cli("s3clean") == 2)                   // missing required option
    // markers: today's sync artifacts list clean (exit 0 = no FAILED);
    // a bogus date has none (exit 1)
    assert(cli("markers") == 0)
    assert(cli("markers", "--date", "19700101") == 1)
    // argument errors
    assert(cli("no-such-verb") == 2)
    assert(graft.Cli.run(Array("sync")) == 2)     // missing -c

    // a bare -t matching two same-named tables on DIFFERENT connections is
    // refused (a single-table verb silently taking the first would e.g.
    // forget a key from only one connection's warehouse); the scoped form
    // addresses exactly one
    val mcYml = java.nio.file.Paths.get(tmpDir("mccfg"), "mc.yml")
    java.nio.file.Files.writeString(mcYml,
      s"""pipeline:
         |  name: "mc"
         |  target: "warehouse"
         |  connections:
         |    a:
         |      source: "$sfDir"
         |    b:
         |      source: "$sfDir"
         |tables:
         |  "a:fx.orders":
         |    cdc_strategy: "full_sync"
         |    target_name: "oa"
         |  "b:fx.orders":
         |    cdc_strategy: "full_sync"
         |    target_name: "ob"
         |""".stripMargin)
    def mcCli(args: String*): Int =
      graft.Cli.run((args ++ Seq("-c", mcYml.toString,
        "--work-dir", tmpDir("mcwork"))).toArray)
    assert(mcCli("compact", "-t", "fx.orders") == 2)
    assert(mcCli("compact", "-t", "a:fx.orders") == 0)
  }

  test("column-map CLI inspects the mapping persisted by a normalizing sync") {
    // a source table whose column names need normalization (digit-leading,
    // mixed case) flows through a normalize_columns sync; the CLI then
    // inspects the PERSISTED rename map (ref column_mapping_commands.py)
    val s = spark; import s.implicits._
    val srcDir = tmpDir("cmap_src")
    Seq((1L, "a", "Zoe"), (2L, "b", "Kai"))
      .toDF("id", "2nd_phone", "UserName")
      .write.parquet(s"$srcDir/codes.parquet")
    val work = tmpDir("cmap_work")
    val ymlPath = java.nio.file.Paths.get(tmpDir("cmap_cfg"), "p.yml")
    java.nio.file.Files.writeString(ymlPath,
      s"""pipeline:
         |  name: "colmap"
         |  source: "$srcDir"
         |  target: "warehouse"
         |  processing:
         |    normalize_columns: true
         |tables:
         |  fx.codes:
         |    cdc_strategy: "full_sync"
         |""".stripMargin)
    def cli(args: String*): (Int, String) = {
      val buf = new java.io.ByteArrayOutputStream()
      val code = Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        graft.Cli.run((args ++ Seq("-c", ymlPath.toString,
          "--work-dir", work)).toArray)
      }
      (code, buf.toString("UTF-8"))
    }
    assert(cli("sync")._1 == 0)
    // the warehouse table carries the NORMALIZED names
    val p = PipelineConfig.fromString(
      java.nio.file.Files.readString(ymlPath))
    val runner = new PipelineRunner(spark, work)
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.head.tableId(p)
    assert(loader.readTarget(spark, id).get.columns.toSeq ==
      Seq("id", "col_2nd_phone", "username"))
    // get: the persisted original→normalized record, one line per rename
    val (gc, gout) = cli("column-map", "get", "-t", "fx.codes")
    assert(gc == 0, gout)
    assert(gout.contains("2nd_phone -> col_2nd_phone"))
    assert(gout.contains("UserName -> username"))
    assert(!gout.contains("id ->"), "unchanged names must not be in the map")
    // list: pipeline-wide view
    val (lc, lout) = cli("column-map", "list")
    assert(lc == 0 && lout.contains("2 mapped column(s)"))
    // clear requires --force, then the map is gone
    assert(cli("column-map", "clear", "-t", "fx.codes")._1 == 2)
    assert(cli("column-map", "clear", "-t", "fx.codes", "--force")._1 == 0)
    assert(cli("column-map", "get", "-t", "fx.codes")._1 == 1)
    assert(cli("column-map", "list")._2.contains("(no column mappings)"))
    // -t is mandatory for get
    assert(cli("column-map", "get")._1 == 2)
  }

  test("config hardening: scalar lists, strict enums, comment-safe interpolation") {
    // merge_keys as a YAML SCALAR is a natural way to write one key —
    // silently parsing it to Nil would demote the table to append mode
    val scalarKeys = PipelineConfig.fromString(
      yaml.replace("cdc_id_column: \"o_orderkey\"",
        "cdc_id_column: \"o_orderkey\"\n    merge_keys: \"o_orderkey\""))
    assert(scalarKeys.tables.find(_.name == "fx.orders").get.mergeKeys ==
      Seq("o_orderkey"))
    // strict enums: typos throw instead of silently changing semantics
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yaml.replace("cdc_strategy: \"hybrid\"",
        "cdc_strategy: \"hybrid\"\n    table_type: \"dimensions\"")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yaml.replace("strategy: \"sequential\"", "strategy: \"parallell\"")))
    // capitalized Dimension parses (case-insensitive, still strict)
    val dim = PipelineConfig.fromString(
      yaml.replace("cdc_strategy: \"hybrid\"",
        "cdc_strategy: \"hybrid\"\n    table_type: \"Dimension\""))
    assert(dim.tables.find(_.name == "fx.orders").get.tableType ==
      graft.model.TableType.Dimension)
    // ${VAR} in a COMMENT must not abort the load (interpolation runs on
    // the parsed tree, where comments no longer exist)
    val commented = PipelineConfig.fromString(
      "# remember to export ${TOTALLY_UNSET_VAR}\n" + yaml, env = Map.empty)
    assert(commented.name == "fixtures_sync")
    // ...but a missing var in a VALUE still throws
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yaml.replace("target: \"warehouse\"", "target: \"${TOTALLY_UNSET_VAR}\""),
      env = Map.empty))
    // multi-connection strictness: a table naming an UNDECLARED connection
    // must fail at parse (silently reading the default source would sync
    // the wrong database), and a scoped name disagreeing with an explicit
    // connection: key is a config contradiction
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      yaml.replace("cdc_id_column: \"o_orderkey\"",
        "cdc_id_column: \"o_orderkey\"\n    connection: \"nope\"")))
    intercept[IllegalArgumentException](PipelineConfig.fromString(
      s"""pipeline:
         |  name: "x"
         |  target: "warehouse"
         |  connections:
         |    a:
         |      source: "dirA"
         |    b:
         |      source: "dirB"
         |tables:
         |  "a:fx.orders":
         |    cdc_strategy: "full_sync"
         |    connection: "b"
         |""".stripMargin))
    // a declared connection parses and lands on the table id's scope
    val mc = PipelineConfig.fromString(
      s"""pipeline:
         |  name: "x"
         |  target: "warehouse"
         |  connections:
         |    alt:
         |      source: "$sfDir"
         |tables:
         |  "alt:fx.orders":
         |    cdc_strategy: "full_sync"
         |""".stripMargin)
    assert(mc.tables.head.connection.contains("alt"))
    assert(mc.tables.head.tableId(mc).connection == "alt")
  }

  test("completion markers: SUCCESS artifact with sync facts; failure never signals success") {
    val y = s"""pipeline:
       |  name: "mark"
       |  source: "$sfDir"
       |  target: "warehouse"
       |tables:
       |  fx.orders:
       |    cdc_strategy: "id_only"
       |    cdc_id_column: "o_orderkey"
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val work = tmpDir("markers")
    val r = new PipelineRunner(spark, work).sync(p)
    assert(r.allOk, r.tables.flatMap(_.error).mkString(";"))
    val today = java.time.LocalDate.now()
      .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val dir = new java.io.File(s"$work/markers/$today")
    val id = p.tables.head.tableId(p)
    val files = dir.listFiles().map(_.getName).toSet
    // the sensor contract: date + table + terminal status IN THE KEY
    assert(files.contains(s"sync_${id.safeName}_SUCCESS.json"), files.toString)
    assert(files.contains("pipeline_mark_SUCCESS.json"), files.toString)
    // body carries the machine-readable sync facts a downstream gate needs
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(new java.io.File(dir, s"sync_${id.safeName}_SUCCESS.json"))
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(m.get("rows").asLong() == nOrders)
    assert(m.get("status").asText() == "SUCCESS")
    assert(m.get("pipeline").asText() == "mark")
    assert(m.get("watermark").get("last_id").asLong() > 0)
    assert(m.get("watermark").get("total_rows").asLong() == nOrders)
    assert(m.get("execution_id").asText().startsWith("mark_"))
    val pm = om.readTree(new java.io.File(dir, "pipeline_mark_SUCCESS.json"))
    assert(pm.get("tables_count").asInt() == 1 &&
      pm.get("total_rows").asLong() == nOrders)

    // a FILTERED (one-table) sync is a partial run: the table's own marker
    // is written, but the PIPELINE-completion artifact must not be — a
    // backfill would otherwise fire every downstream sensor
    val workF = tmpDir("markers_filtered")
    assert(new PipelineRunner(spark, workF).sync(p,
      tableFilter = Some("fx.orders")).allOk)
    val filesF = new java.io.File(s"$workF/markers/$today")
      .listFiles().map(_.getName).toSet
    assert(filesF.contains(s"sync_${id.safeName}_SUCCESS.json"))
    assert(!filesF.exists(_.startsWith("pipeline_")),
      s"partial sync signaled whole-pipeline completion: $filesF")

    // a failing table emits a _FAILED artifact and NEVER a success one — a
    // sensor polling the SUCCESS key keeps waiting (ref airflow_integration
    // failure semantics); a hard crash emits nothing by construction
    // (markers write strictly after the final report exists)
    val bad = PipelineConfig.fromString(y.replace(s"source: \"$sfDir\"",
      "source: \"/nonexistent_graft_dir\""))
    val work2 = tmpDir("markers_bad")
    val r2 = new PipelineRunner(spark, work2).sync(bad)
    assert(!r2.allOk)
    val files2 = new java.io.File(s"$work2/markers/$today")
      .listFiles().map(_.getName).toSet
    assert(files2.contains(s"sync_${bad.tables.head.tableId(bad).safeName}_FAILED.json"),
      files2.toString)
    assert(!files2.exists(_.contains("_SUCCESS")), files2.toString)
  }

  test("custom_sql table syncs INCREMENTALLY through the pipeline") {
    // the template's {last_id} placeholder must render from the cursor and
    // the cursor must advance from the configured id column — without both,
    // every sync re-stages the whole source and the append load duplicates it
    val y = s"""pipeline:
       |  name: "custom_sql_sync"
       |  source: "$sfDir"
       |  target: "warehouse"
       |tables:
       |  fx.events:
       |    cdc_strategy: "custom_sql"
       |    cdc_id_column: "event_id"
       |    custom_sql: "SELECT event_id, user_id, event_type FROM {table_name} WHERE event_id > {last_id}"
       |""".stripMargin
    val p = PipelineConfig.fromString(y)
    val work = tmpDir("customsql")
    val runner = new PipelineRunner(spark, work)
    val r1 = runner.sync(p)
    assert(r1.allOk, r1.tables.flatMap(_.error).mkString(";"))
    val (store, _, loader) = runner.rigFor(p)
    val id = p.tables.head.tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(loader.readTarget(spark, id).get.count() == n)
    // cursor advanced to max(event_id) → the second sync stages NOTHING
    val maxId = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(org.apache.spark.sql.functions.max("event_id")).head().getLong(0)
    assert(store.get(id.scoped).get.mysql_state.last_id.contains(maxId))
    val r2 = runner.sync(p)
    assert(r2.allOk)
    assert(loader.readTarget(spark, id).get.count() == n,
      "second custom_sql sync duplicated rows")
  }

  test("failed table is reported, others still succeed") {
    val y = yaml.replace("cdc_id_column: \"event_id\"",
      "cdc_id_column: \"no_such_column\"")
    val p = PipelineConfig.fromString(y)
    val runner = new PipelineRunner(spark, tmpDir("pipe4"), maxAttempts = 1)
    val report = runner.sync(p)
    assert(!report.allOk)
    assert(report.tables.count(_.ok) == 2)
    assert(report.tables.find(t => !t.ok).get.error.isDefined)
  }
}
