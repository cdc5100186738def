package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions
import graft.operators.Relational
import graft.pipeline._

/** Unit coverage for the relational operators and runner paths not already
  * pinned by an oracle query. */
class RelationalSpec extends AnyFunSuite with SparkTestBase {

  test("asofJoin: inclusive/strict, ties broken by rightOrder, no-match → null") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, "u1", 100L), // before any right row
      (2L, "u1", 200L), // exactly at a right ts
      (3L, "u1", 250L), // between right rows
      (4L, "u2", 500L), // other key
      (5L, "u3", 900L)  // key with no right rows at all
    ).toDF("eid", "k", "t")
    val right = Seq(
      ("u1", 200L, 10L), ("u1", 200L, 11L), // tie on ts: id 11 must win
      ("u1", 240L, 12L),
      ("u2", 400L, 20L)
    ).toDF("k", "rt", "rid")
    def run(strict: Boolean): Map[Long, Option[Long]] =
      Relational.asofJoin(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid"), rightOrder = Seq("rid"), strict = strict)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val incl = run(strict = false)
    assert(incl == Map(1L -> None, 2L -> Some(11L), 3L -> Some(12L),
      4L -> Some(20L), 5L -> None))
    val strict = run(strict = true)
    // at t=200 the same-ts right rows are now invisible
    assert(strict(2L).isEmpty)
    assert(strict(3L).contains(12L) && strict(4L).contains(20L))
    // row count preserved (left outer semantics)
    assert(Relational.asofJoin(left, right, Seq("k"), "t", "rt",
      payload = Seq("rid"), rightOrder = Seq("rid")).count() == left.count())
  }

  test("asofJoin: multi-column payload comes from ONE right row") {
    val s = spark; import s.implicits._
    val left = Seq((1L, "k", 300L)).toDF("eid", "k", "t")
    val right = Seq(
      ("k", 100L, 1L, "old-name"),
      ("k", 200L, 2L, null.asInstanceOf[String]) // latest row has a NULL field
    ).toDF("k", "rt", "rid", "rname")
    val out = Relational.asofJoin(left, right, Seq("k"), "t", "rt",
      payload = Seq("rid", "rname"), rightOrder = Seq("rid")).head()
    // per-column last(ignoreNulls) would mix rows (rid=2 with rname=old-name);
    // the struct carrier must keep them together
    assert(out.getLong(3) == 2L && out.isNullAt(4))
  }

  test("asofJoin property: matches the naive per-row lookup on random data") {
    // random (key, ts) streams with heavy ts collisions — the union+window
    // formulation must agree with a brute-force per-left-row maximum
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark; import s.implicits._
    val genCase = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      lrows <- Gen.listOfN(nl, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 8L)))
      rrows <- Gen.listOfN(nr, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 8L)))
    } yield (lrows, rrows)
    (1 to 25).foreach { i =>
      val (lrows, rrows) = genCase(Gen.Parameters.default, Seed(i.toLong)).get
      val left = lrows.zipWithIndex
        .map { case ((k, t), idx) => (idx.toLong, s"k$k", t) }
        .toDF("eid", "k", "t")
      val right = rrows.zipWithIndex
        .map { case ((k, t), idx) => (idx.toLong + 1000, s"k$k", t) }
        .toDF("rid", "k", "rt")
        .select(col("k"), col("rt"), col("rid"))
      for (strict <- Seq(false, true)) {
        val got = Relational.asofJoin(left, right, Seq("k"), "t", "rt",
          payload = Seq("rid"), rightOrder = Seq("rid"), strict = strict)
          .collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
          .toMap
        val rSeq = rrows.zipWithIndex
          .map { case ((k, t), idx) => (s"k$k", t, idx.toLong + 1000) }
        val want = lrows.zipWithIndex.map { case ((k, t), idx) =>
          val matches = rSeq.filter(r => r._1 == s"k$k" &&
            (if (strict) r._2 < t else r._2 <= t))
          idx.toLong -> (if (matches.isEmpty) -1L
                         else matches.maxBy(r => (r._2, r._3))._3)
        }.toMap
        assert(got == want, s"case $i strict=$strict")
      }
    }
  }

  test("rangeJoin: boundary inclusivity and multi-bucket intervals") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, 0L), (2L, 9999L), (3L, 10000L), (4L, 25000L))
      .toDF("pid", "p")
    val ivs = Seq((100L, 0L, 9999L), (200L, 10000L, 19999L),
      (300L, 0L, 29999L)) // wide interval spans many buckets
      .toDF("iid", "lo", "hi")
    val out = Relational.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 700)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 200L), (4L, 300L),
      (1L, 300L), (2L, 300L), (3L, 300L)))
  }

  test("rangeJoin property: matches the naive inequality join on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark; import s.implicits._
    val genCase = for {
      np <- Gen.choose(1, 25)
      ni <- Gen.choose(0, 15)
      pts <- Gen.listOfN(np, Gen.choose(-50L, 50L))
      ivs <- Gen.listOfN(ni, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 40L)))
      width <- Gen.choose(1L, 30L)
    } yield (pts, ivs, width)
    (1 to 15).foreach { i =>
      val (ptsL, ivsL, width) = genCase(Gen.Parameters.default, Seed(i.toLong)).get
      val pts = ptsL.zipWithIndex.map { case (p, idx) => (idx.toLong, p) }
        .toDF("pid", "p")
      val ivs = ivsL.zipWithIndex
        .map { case ((lo, len), idx) => (idx.toLong + 100, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val got = Relational.rangeJoin(pts, ivs, "p", "lo", "hi", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"case $i width=$width")
    }
  }

  test("rangeJoin plans an equi-join, never a nested loop") {
    val s = spark; import s.implicits._
    val pts = (1L to 1000L).map(i => (i, i * 3)).toDF("pid", "p")
    val ivs = (1L to 500L).map(i => (i, i * 6, i * 6 + 5)).toDF("iid", "lo", "hi")
    val joined = Relational.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 10)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n${plan.take(1500)}")
    // correctness vs the naive condition
    assert(joined.count() ==
      pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi")).count())
  }

  test("deterministicSplit: stable, key-only, fraction-accurate, edge cases") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count().toDouble
    val a = Relational.deterministicSplit(docs, "doc_id", 0.8)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fraction lands near 0.8 (binomial tolerance at fixture size)
    assert(math.abs(a("train") / n - 0.8) < 0.1, a.toString)
    // repeatable and independent of row content/order: same assignment twice
    val s1 = Relational.deterministicSplit(docs, "doc_id", 0.8)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Relational.deterministicSplit(docs.orderBy(rand(7)), "doc_id", 0.8)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)
    // monotone: growing the train fraction never evicts a train row
    val s9 = Relational.deterministicSplit(docs, "doc_id", 0.9)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    s1.foreach { case (id, sp) => if (sp == "train") assert(s9(id) == "train") }
    // edges
    assert(Relational.deterministicSplit(docs, "doc_id", 1.0)
      .filter(col("split") =!= "train").count() == 0)
    assert(Relational.deterministicSplit(docs, "doc_id", 0.0)
      .filter(col("split") === "train").count() == 0)
  }

  test("profile: one row per column, exact stats + plausible HLL") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = orders.count()
    val rows = Relational.profile(orders, Seq("o_orderkey", "o_orderstatus"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("o_orderkey", "o_orderstatus"))
    val key = rows("o_orderkey")
    assert(key.getLong(1) == n)                   // row_count
    assert(key.getLong(2) == 0)                   // null_count
    val approx = key.getLong(3).toDouble
    assert(approx > n * 0.9 && approx < n * 1.1)  // HLL within 10%
    assert(rows("o_orderstatus").getLong(3) <= 5) // tiny domain
    // sketch percentiles: present for numeric, NULL for strings, ordered
    val p50 = key.getDouble(6); val p95 = key.getDouble(7)
    assert(p50 > 0 && p95 >= p50)
    assert(rows("o_orderstatus").isNullAt(6) && rows("o_orderstatus").isNullAt(7))
  }

  test("alignToSchema: non-nullable string gets empty string, not NULL") {
    val s = spark; import s.implicits._
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "name")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType, nullable = false),
      StructField("extra", StringType, nullable = false)))
    val out = Relational.alignToSchema(df, target).collect().head
    assert(out.getString(1) == "")   // null → "" under non-nullable rule
    assert(out.getString(2) == "")   // missing non-nullable string → ""
  }

  test("diffSchemas classifies added/removed/changed") {
    val a = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    val b = StructType(Seq(StructField("x", IntegerType), StructField("z", StringType)))
    val d = Relational.diffSchemas(a, b)
    assert(d.added.map(_.name) == Seq("z"))
    assert(d.removed.map(_.name) == Seq("y"))
    assert(d.changed.map(_._1.name) == Seq("x"))
    assert(!d.isCompatible)
  }

  test("excludeProcessedFiles filters rows by source file") {
    val dir = tmpDir("excl")
    val s = spark; import s.implicits._
    Seq(1L, 2L).toDF("v").coalesce(1).write.parquet(s"$dir/a")
    Seq(3L).toDF("v").coalesce(1).write.parquet(s"$dir/b")
    val all = spark.read.parquet(s"$dir/a", s"$dir/b")
    val aFile = all.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).find(_.contains("/a/")).get
    val remaining = Relational.excludeProcessedFiles(all, Set(aFile))
    assert(remaining.select("v").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("bpeTokenCount: contractions, unicode, digits, empty") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, "it's we'll they've"),   // 'it' ' s' ... contractions split off
      (2L, ""),                     // empty → 0
      (3L, "héllo wörld 42!"),      // unicode letters, digits, punct
      (4L, "   ")                   // whitespace-only → 1 run
    ).toDF("id", "t")
      .select(col("id"), TextFunctions.bpeTokenCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(1L) == 6) // it|'s| we|'ll| they|'ve
    assert(rows(2L) == 0)
    assert(rows(3L) == 4) // héllo| wörld| 42|!
    assert(rows(4L) == 1)
  }

  test("text functions: empty and unicode edges") {
    val s = spark; import s.implicits._
    val df = Seq("", "   ", "汉字文本", "word").toDF("text")
    val out = df.select(
      TextFunctions.wordCount(col("text")).as("wc"),
      TextFunctions.punctRatio(col("text")).as("pr"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("lang")).collect()
    assert(out(0).getInt(0) == 0 && out(0).getDouble(1) == 0.0)
    assert(out(1).getInt(0) == 0)
    assert(out(2).getString(3) == "zh")       // CJK marker fires
    assert(out(3).getInt(0) == 1)
    out.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("runner: backup stages, loadOnly then drains the staged files") {
    val yaml =
      s"""pipeline:
         |  name: "two_phase"
         |  source: "$sfDir"
         |  s3:
         |    isolation_prefix: "tp/"
         |tables:
         |  fx.region:
         |    cdc_strategy: "full_sync"
         |""".stripMargin
    val p = PipelineConfig.fromString(yaml)
    val runner = new PipelineRunner(spark, tmpDir("twophase"))
    val b = runner.backup(p)
    assert(b.allOk && b.totalRows == spark.read.parquet(s"$sfDir/region.parquet").count())
    val (_, _, loader) = runner.rigFor(p)
    val id = p.tables.head.tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    assert(loader.readTarget(spark, id).isEmpty)  // backup never loads
    val l = runner.loadOnly(p)
    assert(l.allOk)
    assert(loader.readTarget(spark, id).get.count() == b.totalRows)
    // a second loadOnly drains nothing (blacklist)
    assert(runner.loadOnly(p).totalRows == 0)
  }

  test("loadOnly refuses a concurrently-locked table (PostOps under lock)") {
    // loadOnly runs PostOps.run, whose foldIncremental path calls the
    // MUTATING loader.recoverDerived ("we hold the table lock" contract) —
    // so the per-table body must hold the same session lock as sync. A
    // foreign holder means refusal, not an unlocked racing recovery.
    val yaml =
      s"""pipeline:
         |  name: "locked_load"
         |  source: "$sfDir"
         |  s3:
         |    isolation_prefix: "ll/"
         |tables:
         |  fx.region:
         |    cdc_strategy: "full_sync"
         |""".stripMargin
    val p = PipelineConfig.fromString(yaml)
    val base = tmpDir("lockedload")
    val runner = new PipelineRunner(spark, base)
    assert(runner.backup(p).allOk)
    val id = p.tables.head.tableId(p.source.replaceAll("[^A-Za-z0-9_]", "_"))
    // a second store instance (≅ another process) holds the table lock —
    // same watermarks dir rigFor derives (workRoot + isolation prefix)
    val foreign = new graft.watermark.WatermarkStore(s"$base/ll/watermarks")
    val report = foreign.withTableLock(id.scoped) { runner.loadOnly(p) }
    assert(!report.allOk)
    assert(report.tables.head.error.exists(_.toLowerCase.contains("lock")))
    // with the lock free, the same loadOnly drains normally
    assert(runner.loadOnly(p).allOk)
  }

  test("foldAggregate: any chunking folds to the direct aggregate, schema stable") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (i.toLong, s"g${rnd.nextInt(5)}", rnd.nextInt(1000) / 100.0))
    val df = rows.toDF("id", "grp", "v")
    val sums = Seq(Relational.SumSpec("sum_v", "v", 2))
    def fold(chunks: Seq[org.apache.spark.sql.DataFrame]) =
      Relational.readAggState(
        chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (p, c) => Some(Relational.foldAggregate(p, c, Seq("grp"), sums))
        }.get, sums)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    val direct = fold(Seq(df))
    // three different random chunkings, incl. single-row chunks and chunks
    // that miss some groups entirely
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val parts = (0 until 4).map(k =>
        df.filter(abs(hash(col("id"), lit(seed))) % 4 === k))
      assert(fold(r2.shuffle(parts.toList)) == direct,
        s"chunking seed=$seed diverged")
    }
    // the state schema must be a fixpoint: after ten folds the sum column
    // is still DECIMAL(38,2) (no unbounded widening / analysis drift)
    val many = (1 to 10).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (p, k) => Some(Relational.foldAggregate(
        p, df.filter(col("id") % 10 === k - 1), Seq("grp"), sums))
    }.get
    assert(many.schema("sum_v").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 2))
    assert(Relational.readAggState(many, sums)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap == direct)
  }

  test("foldAggregate magnitude contract: 38-digit accumulation, loud overflow") {
    // pins the DOCUMENTED boundary (scaladoc): values accumulate at
    // DECIMAL(38, scale) end to end, so pre-aggregated inputs near 10^17
    // fold WITHOUT caller-side re-scaling (the round-6 trap); only a SUM
    // overflowing 38−scale digits fails — loudly under ANSI
    // (NUMERIC_VALUE_OUT_OF_RANGE), never by silently dropping values
    val s = spark
    import s.implicits._
    val sums = Seq(Relational.SumSpec("sum_v", "v", 2))
    // pre-aggregated magnitudes (1e17) fold exactly — no 18-digit value trap
    val big = Relational.foldAggregate(None,
      Seq(("g", 1e17), ("g", 1e17), ("g", 1.5)).toDF("grp", "v"),
      Seq("grp"), sums)
    val row = big.head()
    assert(row.getLong(1) == 3L)
    assert(row.getDecimal(2) ==
      new java.math.BigDecimal("200000000000000001.50"))
    // ...and the state keeps folding at full width
    val twice = Relational.readAggState(
      Relational.foldAggregate(Some(big),
        Seq(("g", 1e17)).toDF("grp", "v"), Seq("grp"), sums), sums).head()
    assert(twice.getLong(1) == 4L &&
      math.abs(twice.getDouble(2) - 3.0e17) / 3.0e17 < 1e-15)
    // out of range: a SUM beyond DECIMAL(38,2)'s 36 integer digits → loud
    // (each 1e35 value fits; their sum 2e36 exceeds the state type)
    val e = intercept[Exception] {
      Relational.foldAggregate(None,
        Seq.fill(20)(("g", 1e35)).toDF("grp", "v"), Seq("grp"), sums)
        .collect()
    }
    assert(e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      e.getMessage.contains("CAST_OVERFLOW") ||
      e.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"expected decimal range failure, got: ${e.getMessage.take(200)}")
  }

  test("intervalOverlapJoin: exact-once pairs incl. touching, containment, long spans") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 0L, 10L), (2L, 95L, 105L), (3L, 0L, 1000L))
      .toDF("lid", "lo_a", "hi_a")
    val right = Seq(
      (10L, 10L, 20L),    // touches interval 1 at a point; inside 3
      (11L, 200L, 210L),  // inside the long interval 3 only
      (12L, 1001L, 1100L) // disjoint from everything
    ).toDF("rid", "lo_b", "hi_b")
    val out = Relational.intervalOverlapJoin(left, right,
      "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 7)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // EXACTLY once per overlapping pair despite both intervals covering
    // many shared 7-wide buckets
    assert(out.sorted == Seq((1L, 10L), (3L, 10L), (3L, 11L)))
    assert(out.distinct.length == out.length, "duplicated pair emission")
  }

  test("funnelCounts: strict ordering — out-of-order stages don't convert") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE view — reaches view, not purchase
      (2L, 10L, "signup"), (2L, 30L, "view"), (2L, 20L, "purchase"),
      // user 3: no signup — contributes to nothing
      (3L, 5L, "view"), (3L, 6L, "purchase"),
      // user 4: signup only
      (4L, 50L, "signup"),
      // user 5: view at the SAME instant as signup — strict > excludes it
      (5L, 10L, "signup"), (5L, 10L, "view")
    ).toDF("u", "ts", "stage")
    val out = Relational.funnelCounts(ev, "u", "ts", "stage",
      Seq("signup", "view", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("signup" -> 4L, "view" -> 2L, "purchase" -> 1L))
    // cohort retention on the same fixture, bucket width 100
    val ret = Relational.cohortRetention(ev, "u", "ts", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ret == Map((0L, 0L) -> 5L)) // everyone active in their own cohort bucket
  }

  test("fuzzy matching: blocked pairs and sorted-neighborhood agree on plants") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "acme corp"), (2L, "acme c0rp"),     // dist 1, same block "corp"? no —
      (3L, "acme inc"), (4L, "acme incx"),      // blocks differ; see below
      (5L, "zzz unrelated name")
    ).toDF("id", "name")
    // blocked on the FIRST token: all acme* share a block
    val blocked = Relational.fuzzyMatchPairs(docs, "id", "name",
      element_at(split(col("name"), " "), 1), maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == Set((1L, 2L, 1L), (3L, 4L, 1L)),
      s"blocked pairs: $blocked")
    // sorted neighborhood: lexicographic sort puts the acme variants
    // adjacent, so a window of 2 finds the same true pairs
    val snm = Relational.sortedNeighborPairs(docs, "id", "name",
      windowSize = 2, maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(snm == Set((1L, 2L, 1L), (3L, 4L, 1L)), s"snm pairs: $snm")
  }

  test("scd2Apply: versions close and reopen; asOf reads any point in time") {
    val s = spark
    import s.implicits._
    def inc(rows: (Long, String, Long)*) =
      rows.toSeq.toDF("k", "status", "ts")
    // t=10: A=new, B=new. t=20: A→done (change), B same, C appears.
    // t=30: A back to new (change again — THREE versions of A).
    val h1 = Relational.scd2Apply(None, inc((1L, "new", 10L), (2L, "new", 10L)),
      Seq("k"), "ts", Seq("status"))
    val h2 = Relational.scd2Apply(Some(h1),
      inc((1L, "done", 20L), (2L, "new", 20L), (3L, "new", 20L)),
      Seq("k"), "ts", Seq("status"))
    val h3 = Relational.scd2Apply(Some(h2), inc((1L, "new", 30L)),
      Seq("k"), "ts", Seq("status"))
    val rows = h3.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows == Set(
      (1L, "new", 10L, 20L), (1L, "done", 20L, 30L), (1L, "new", 30L, -1L),
      (2L, "new", 10L, -1L),   // unchanged across folds: original valid_from
      (3L, "new", 20L, -1L)))
    // point-in-time views
    def asOf(t: Long) = Relational.scd2AsOf(h3, lit(t))
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOf(15L) == Map(1L -> "new", 2L -> "new"))
    assert(asOf(25L) == Map(1L -> "done", 2L -> "new", 3L -> "new"))
    assert(asOf(35L) == Map(1L -> "new", 2L -> "new", 3L -> "new"))
    // intra-increment transitions are invisible: only the latest per key
    // versions (by ts, then order col)
    val multi = Relational.scd2Apply(None,
      Seq((1L, "a", 5L, 1L), (1L, "b", 5L, 2L), (1L, "c", 4L, 9L))
        .toDF("k", "status", "ts", "seq"),
      Seq("k"), "ts", Seq("status"), orderCols = Seq("seq"))
    assert(multi.collect().map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("b", 5L)))   // ts 5 beats 4; seq 2 beats 1
    // LATE-ARRIVING increment (effective time at-or-before the open
    // version's valid_from) is stale information: it must NOT close the
    // open row with an inverted interval or rewrite history backwards
    val base = Relational.scd2Apply(None, inc((7L, "new", 20L)),
      Seq("k"), "ts", Seq("status"))
    for (lateTs <- Seq(10L, 20L)) {
      val after = Relational.scd2Apply(Some(base),
        inc((7L, "stale", lateTs)), Seq("k"), "ts", Seq("status"))
        .collect().map(r => (r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(after == Seq(("new", 20L, -1L)),
        s"late ts=$lateTs corrupted history: $after")
    }
  }

  test("foldDistinctSketch: chunk-invariant estimates within HLL error bounds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    // per-group true distinct counts of a few hundred — HLL's standard
    // error at default lgK=12 is ~1.6%, so a 5% assertion bound is safe
    val rows = (1 to 3000).map(i =>
      (i.toLong, s"g${i % 3}", s"user_${rnd.nextInt(500)}"))
    val df = rows.toDF("id", "grp", "user")
    val exact = df.groupBy("grp").agg(countDistinct(col("user")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def estimates(chunks: Seq[org.apache.spark.sql.DataFrame]) =
      Relational.readDistinctSketch(
        chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (p, c) => Some(Relational.foldDistinctSketch(p, c, Seq("grp"), "user"))
        }.get)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = estimates(Seq(df))
    exact.foreach { case (g, d) =>
      val e = direct(g)
      assert(math.abs(e - d).toDouble / d < 0.05,
        s"group $g: estimate $e vs exact $d")
    }
    // chunked folds — in either order — stay within the error bound too.
    // (Union is NOT bit-identical across orders: DataSketches sketches
    // transition list→set→HLL modes at different points per merge order, so
    // the guarantee is the bound, not equality.)
    val parts = (0 until 5).map(k => df.filter(col("id") % 5 === k))
    for (chunks <- Seq(parts, parts.reverse)) {
      val est = estimates(chunks)
      exact.foreach { case (g, d) =>
        assert(math.abs(est(g) - d).toDouble / d < 0.05,
          s"group $g chunked: estimate ${est(g)} vs exact $d")
      }
    }
  }

  test("foldQuantileSketch: rank-accurate within KLL bounds for any chunking") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // two groups with very different distributions (uniform vs squared)
    val rows = (1 to 8000).map { i =>
      val g = s"g${i % 2}"
      val v = if (i % 2 == 0) rnd.nextDouble() * 100 else {
        val u = rnd.nextDouble(); u * u * 100
      }
      (i.toLong, g, v)
    }
    val df = rows.toDF("id", "grp", "v")
    val sorted = rows.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(_._3).sorted.toIndexedSeq
    }
    // true rank of the estimated quantile must sit within eps of q·n;
    // k=400 → normalized rank error ~1.1% at 99% conf; assert 3%
    def rankCheck(est: Map[String, org.apache.spark.sql.Row], qIdx: Int,
                  q: Double): Unit =
      sorted.foreach { case (g, vs) =>
        val e = est(g).getDouble(qIdx)
        val rank = vs.count(_ <= e).toDouble / vs.size
        assert(math.abs(rank - q) < 0.03,
          s"group $g q=$q: estimate $e has rank $rank")
      }
    def estimates(chunks: Seq[org.apache.spark.sql.DataFrame]) =
      Relational.readQuantileSketch(
        chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (p, c) => Some(Relational.foldQuantileSketch(
            p, c, Seq("grp"), "v", k = 400))
        }.get, Seq(0.5, 0.95))
        .collect().map(r => r.getString(0) -> r).toMap
    val direct = estimates(Seq(df))
    rankCheck(direct, 1, 0.5); rankCheck(direct, 2, 0.95)
    // chunked folds (either order) hold the same rank bound — merge is the
    // whole point of the KLL state; estimates are bound-reproducible, not
    // bit-identical (randomized compaction)
    val parts = (0 until 4).map(k => df.filter(col("id") % 4 === k))
    for (chunks <- Seq(parts, parts.reverse)) {
      val est = estimates(chunks)
      rankCheck(est, 1, 0.5); rankCheck(est, 2, 0.95)
    }
    // null-only group reads as null quantiles, not a crash
    val withNulls = Seq((1L, "gn", Option.empty[Double]),
      (2L, "gn", Option.empty[Double])).toDF("id", "grp", "v")
    val nulls = estimates(Seq(withNulls.unionByName(df.limit(0))))
    assert(nulls("gn").isNullAt(1) && nulls("gn").isNullAt(2))
  }

  test("snapshotDiff: adds, removes, null transitions; unchanged omitted") {
    val s = spark; import s.implicits._
    val old = Seq((1L, Some("a"), 10), (2L, Some("b"), 20),
      (3L, None: Option[String], 30), (4L, Some("d"), 40))
      .toDF("k", "v", "x")
    val nw = Seq((1L, Some("a"), 10), (2L, Some("B"), 20),
      (3L, Some("c"), 30), (5L, Some("e"), 50))
      .toDF("k", "v", "x")
    val d = graft.operators.Relational.snapshotDiff(old, nw, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(d == Map(
      2L -> (("changed", "v")),
      3L -> (("changed", "v")), // null → value IS a change (null-safe eq)
      4L -> (("removed", "")),
      5L -> (("added", ""))))   // k=1 unchanged → omitted
    // multi-column change lists every differing column in schema order
    val both = graft.operators.Relational.snapshotDiff(
      Seq((9L, "a", 1)).toDF("k", "v", "x"),
      Seq((9L, "z", 2)).toDF("k", "v", "x"), Seq("k")).head()
    assert(both.getString(2) == "v,x")
    // key-only schema overlap: the default column set would compare
    // NOTHING and report vacuous parity — refused loudly instead
    val e = intercept[IllegalArgumentException] {
      graft.operators.Relational.snapshotDiff(
        Seq((1L, "a")).toDF("k", "only_old"),
        Seq((1L, "b")).toDF("k", "only_new"), Seq("k"))
    }
    assert(e.getMessage.contains("no non-key columns"), e.getMessage)
    // explicit compareCols still expresses a presence-only diff
    val pres = graft.operators.Relational.snapshotDiff(
      Seq((1L, "a")).toDF("k", "only_old"),
      Seq((2L, "b")).toDF("k", "only_new"), Seq("k"),
      compareCols = Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pres == Map(1L -> "removed", 2L -> "added"))
  }
}
