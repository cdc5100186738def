package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CorpusFunctions

/** Invariants for the corpus-curation operators (stratified sampling,
  * token-budget selection, benchmark decontamination). */
class CorpusSpec extends AnyFunSuite with SparkTestBase {

  test("perplexityBands: per-language cuts honor fractions, short docs drop") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bands = CorpusFunctions.perplexityBands(
      docs, "doc_id", "text", "lang").cache()
    // every scored doc lands in exactly one band
    assert(bands.filter(!col("band").isin("head", "middle", "tail"))
      .count() == 0)
    // within each language the head fraction is ~30% (percent_rank cut)
    val fr = bands.groupBy("lang")
      .agg((sum(when(col("band") === "head", 1).otherwise(0)) /
        count(lit(1))).as("f")).collect()
    fr.foreach { r =>
      val f = r.getDouble(1)
      assert(f > 0.2 && f < 0.4, s"lang ${r.getString(0)} head frac $f")
    }
    // head of a language is strictly more fluent than its tail (avg pr)
    val m = bands.groupBy("lang").pivot("band", Seq("head", "tail"))
      .agg(avg("pr")).collect()
    m.foreach(r => assert(r.getDouble(1) < r.getDouble(2)))
    bands.unpersist()
  }

  test("epochShards: exact coverage, contiguous positions, epoch re-deal") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val e0 = CorpusFunctions.epochShards(docs, "doc_id", epoch = 0).cache()
    assert(e0.count() == n) // every doc addressed exactly once
    assert(e0.select("doc_id").distinct().count() == n)
    // positions are contiguous 1..size within each shard
    val bad = e0.groupBy("shard")
      .agg(count(lit(1)).as("sz"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("sz") || col("mn") =!= 1).count()
    assert(bad == 0)
    // re-running the SAME epoch is bit-identical; a new epoch re-deals
    val e0b = CorpusFunctions.epochShards(docs, "doc_id", epoch = 0)
    assert(e0.exceptAll(e0b).count() == 0)
    val e1 = CorpusFunctions.epochShards(docs, "doc_id", epoch = 1)
    assert(e0.exceptAll(e1).count() > 0, "epoch change did not re-deal")
    // multinomial balance sanity: no shard is empty or > 3x the mean
    val sizes = e0.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 16)
    assert(sizes.min > 0 && sizes.max <= 3 * n / 16)
    e0.unpersist()
  }

  test("distributionDrift: zero on identical mixes, flags a planted shift") {
    val s = spark
    import s.implicits._
    def mk(rows: (String, Int)*) = rows.flatMap { case (c, n) =>
      Seq.fill(n)(c) }.toDF("cat")
    val a = mk("x" -> 50, "y" -> 30, "z" -> 20)
    val same = CorpusFunctions.distributionDrift(a, a, "cat").collect()
    same.foreach(r => assert(r.getDouble(5) == 0.0))
    // planted shift: y collapses into x on the B side
    val b = mk("x" -> 80, "y" -> 0, "z" -> 20)
    val drift = CorpusFunctions.distributionDrift(a, b, "cat")
      .agg(sum(col("psi_contrib"))).head().getDouble(0)
    assert(drift > 0.25, s"planted shift PSI $drift not flagged")
    // one-sided category (only in B) stays finite via add-1 smoothing
    val c = mk("x" -> 50, "w" -> 50)
    val rows = CorpusFunctions.distributionDrift(a, c, "cat").collect()
    assert(rows.length == 4) // union of categories
    rows.foreach(r => assert(!r.getDouble(5).isNaN))
  }

  test("sampleByGroup: rate 1 keeps all, rate 0 keeps none, rates nest") {
    val s = spark
    import s.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val kept = CorpusFunctions.sampleByGroup(df, "id", "grp",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (2L to 400L by 2).toSet) // all of a, none of b

    // determinism + nesting: the 25% sample is a subset of the 50% sample
    def sample(r: Double) = CorpusFunctions.sampleByGroup(df, "id", "grp",
      Map.empty, defaultRate = r).select("id").collect().map(_.getLong(0)).toSet
    val half = sample(0.5)
    val quarter = sample(0.25)
    assert(quarter.subsetOf(half))
    assert(sample(0.5) == half) // re-run identical
    // rate is approximately honored (md5 is uniform)
    assert(half.size > 120 && half.size < 280)
  }

  test("temperatureSample: smallest source whole, sizes track n^(1/T), stable") {
    val s = spark
    import s.implicits._
    // sources of 1000 / 4000 / 250 docs
    val df = ((1L to 1000L).map(i => (i, "big")) ++
      (1001L to 5000L).map(i => (i, "huge")) ++
      (5001L to 5250L).map(i => (i, "rare"))).toDF("id", "src")
    val kept = CorpusFunctions.temperatureSample(df, "id", "src",
      temperature = 2.0)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest source is kept WHOLE
    assert(bySrc("rare") == 250L)
    // expected rates: (250/n)^(1-1/2) → big .5, huge .25 (md5 thresholds
    // are uniform — allow sampling noise)
    assert(math.abs(bySrc("big") - 500.0) < 60, bySrc.toString)
    assert(math.abs(bySrc("huge") - 1000.0) < 100, bySrc.toString)
    // T=1 is the identity
    assert(CorpusFunctions.temperatureSample(df, "id", "src", 1.0).count() ==
      df.count())
    // growth stability: adding docs to one source never evicts another
    // source's members (same md5 rule as the splitter)
    val grown = df.unionByName(
      (9001L to 9500L).map(i => (i, "huge")).toDF("id", "src"))
    val keptIds = kept.filter(col("src") === "big")
      .select("id").collect().map(_.getLong(0)).toSet
    val grownBigIds = CorpusFunctions.temperatureSample(grown, "id", "src", 2.0)
      .filter(col("src") === "big")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(grownBigIds.subsetOf(keptIds),
      "growing another source must only SHRINK a source's kept set")
    // NULL source is a group like any other — sampled at its rate, never
    // silently deleted
    val withNull = df.unionByName(
      (8001L to 8250L).map(i => (i, null.asInstanceOf[String])).toDF("id", "src"))
    val keptNull = CorpusFunctions.temperatureSample(withNull, "id", "src", 2.0)
      .filter(col("src").isNull).count()
    assert(keptNull == 250L, s"null-source rows were dropped: kept $keptNull/250")
  }

  test("dedupLinesWithinDoc: first occurrence kept, cross-doc dups survive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "header\nalpha\nheader\n\nbeta\nalpha"),
      (2L, "header\ngamma")                      // cross-doc dup of 'header'
    ).toDF("doc_id", "text")
    val out = CorpusFunctions.dedupLinesWithinDoc(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // within-doc repeats drop (second 'header', second 'alpha'); the empty
    // layout line survives; order is original first-occurrence order
    assert(out(1L) == (("header\nalpha\n\nbeta", 4L)), out(1L).toString)
    // doc 2 keeps its own 'header' — within-doc scope only
    assert(out(2L) == (("header\ngamma", 2L)))
  }

  test("selectWithinTokenBudget: greedy per-group fill in order") {
    val s = spark
    import s.implicits._
    // group x: 60+50 admitted (110 <= 120), +30 would be 140 > 120 → cut,
    // and the cut is positional, not best-fit (greedy in id order).
    val df = Seq(
      (1L, "x", 60L), (2L, "x", 50L), (3L, "x", 30L), (4L, "x", 5L),
      (5L, "y", 120L), (6L, "y", 1L)
    ).toDF("id", "grp", "tok")
    val out = CorpusFunctions.selectWithinTokenBudget(
      df, "grp", col("tok"), "id", budget = 120L)
      .select("id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 60L, 2L -> 110L, 5L -> 120L))
  }

  test("contaminationScores: identical doc 1.0, disjoint 0.0, flagged dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // == bench doc
      (2L, "one two three four five six seven"),        // disjoint
      (3L, "alpha beta gamma delta unrelated trailing") // partial overlap
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val scores = CorpusFunctions.contaminationScores(docs, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(scores(1L) == 1.0)
    assert(scores(2L) == 0.0)
    // doc 3: 4 shingles, 2 of them ("alpha beta gamma", "beta gamma delta")
    // in the benchmark set
    assert(scores(3L) == 0.5)

    val kept = CorpusFunctions.dropContaminated(
      docs, bench, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("chunkDocuments: stride windows, overlap, short-doc single chunk") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6,9
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "only two"))
      .toDF("doc_id", "text")
    val out = CorpusFunctions.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // start 9 is DROPPED: its window ("t9") is a strict suffix of the chunk
    // at 6 — zero novel tokens, pure duplicated training text
    assert(d1.map(c => (c._3, c._4)).toSeq == Seq(
      ("t0 t1 t2 t3", 4L), ("t3 t4 t5 t6", 4L), ("t6 t7 t8 t9", 4L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "only two", 2L)))
  }

  test("topKByQuality: per-group k winners, deterministic ties") {
    val s = spark
    import s.implicits._
    val good = ("x " * 40).trim // 79 chars: passes length/punct/mwl gates
    val docs = Seq(
      (1L, "a", good + " the"), (2L, "a", good + " the"), (3L, "a", "!!"),
      (4L, "b", good + " the")
    ).toDF("doc_id", "source", "text")
    val out = CorpusFunctions.topKByQuality(docs, "doc_id", "text",
      Seq("source"), k = 2)
      .select("doc_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // group a: docs 1,2 tie on quality → ordered by doc_id; doc 3 cut
    assert(out == Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("capPerGroup: deterministic distribution-preserving per-source cap") {
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).map(i =>
      (i, if (i <= 70) "big" else "small", s"doc $i")).toDF("doc_id", "source", "text")
    def run() = CorpusFunctions.capPerGroup(docs, "doc_id", Seq("source"), 25)
      .select("doc_id", "source", "rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val out = run()
    // big source capped to 25, small (30 docs) also capped to 25
    assert(out.count(_._2 == "big") == 25)
    assert(out.count(_._2 == "small") == 25)
    assert(out.forall(_._3 <= 25) && out.map(_._3).nonEmpty)
    // deterministic across runs (md5 order, not a random sample)
    assert(run() == out)
    // a cap larger than every group passes everything through
    assert(CorpusFunctions.capPerGroup(docs, "doc_id", Seq("source"), 1000)
      .count() == 100)
  }

  test("chunkDocuments: partition/coverage properties on random docs") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.choose('a', 'z').map(_.toString)
    val docGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, word))
    for (seed <- 1 to 3) {
      val docsTokens = (1 to 8).map { i =>
        (i.toLong, docGen.apply(Gen.Parameters.default,
          Seed(seed * 100L + i)).get)
      }
      val docs = docsTokens.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      // stride == chunk → chunks PARTITION the token stream exactly
      val back = CorpusFunctions.chunkDocuments(docs, "doc_id", "text", 5, 5)
        .orderBy("doc_id", "chunk_id")
        .collect().map(r => (r.getLong(0), r.getString(2)))
        .groupBy(_._1).map { case (id, cs) =>
          id -> cs.map(_._2).mkString(" ") }
      docsTokens.foreach { case (id, ts) =>
        assert(back(id) == ts.mkString(" "), s"seed=$seed doc=$id") }
      // overlapping stride → kept starts are 0 plus every stride multiple
      // that begins before the previous chunk's coverage ends; the tail is
      // covered exactly once and NO chunk is contained in another
      val counts = CorpusFunctions.chunkDocuments(docs, "doc_id", "text", 7, 3)
        .groupBy("doc_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      docsTokens.foreach { case (id, ts) =>
        val n = ts.size
        val expected = (0 until n by 3).count(s => s == 0 || s < n - 7 + 3)
        assert(counts(id) == expected, s"seed=$seed doc=$id n=$n")
        // coverage: the last kept start's window reaches the end of the doc
        assert(3 * (expected - 1) + 7 >= n, s"seed=$seed doc=$id tail uncovered")
      }
    }
  }

  test("topNgramsByDocFreq: distinct-per-doc counts, deterministic order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "common header text common header text", // repeated in-doc: counts once
      "common header text something else here",
      "totally different content entirely now"
    ).toDF("text")
    val top = CorpusFunctions.topNgramsByDocFreq(docs, "text", shingleN = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("common header text", 2L)) // df=2 despite 3 occurrences
    assert(top(1)._2 == 1L)
    // plan: top-k must be TakeOrdered, not a global sort
    val plan = CorpusFunctions.topNgramsByDocFreq(docs, "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mixtureStats: token shares sum to 1 and counts are exact") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("a", "en", "one two three"), ("a", "en", "four five"),
      ("b", "en", "six seven eight nine ten")
    ).toDF("source", "lang", "text")
    val rows = CorpusFunctions.mixtureStats(docs, "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSet == Set(("a", 2L, 5L, 0.5), ("b", 1L, 5L, 0.5)))
  }

  test("redactPii: each rule fires once, placeholders typed, clean text unchanged") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-host.org phone 555.123.4567 ssn 123-45-6789 ip 192.168.0.1 end"),
      (2L, "no pii here, just 12345 and 1.5 numbers")
    ).toDF("id", "t")
    val out = df.select(col("id"),
      graft.functions.TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "mail <EMAIL> phone <PHONE> ssn <SSN> ip <IP> end")
    assert(out(2L) == "no pii here, just 12345 and 1.5 numbers")

    // progressive counts: the SSN is not double-counted as a phone
    val counts = df.filter(col("id") === 1L).select(
      graft.functions.TextFunctions.piiCounts(col("t"))
        .map { case (n, c) => c.as(n) }: _*).collect().head
    assert((0 to 3).map(counts.getInt) == Seq(1, 1, 1, 1))
  }

  test("repetitionStats: exact fractions on a crafted doc") {
    val s = spark
    import s.implicits._
    // doc 1: lines [aa, bb, aa, cc] → 4 lines, 3 distinct, dup_line=1/4;
    // dup chars: 'aa' appears 2× → 4 of 8 chars; words: aa aa bb aa cc
    // wait—tokens come from the whole text: aa,bb,aa,cc → top word aa 2/4
    val df = Seq(
      (1L, "aa\nbb\naa\ncc"),
      (2L, "unique lines\nonly here")
    ).toDF("doc_id", "text")
    val out = CorpusFunctions.repetitionStats(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((4L, 0.25, 0.5, 0.5)))
    assert(out(2L) == ((2L, 0.0, 0.0, 0.25)))
  }

  test("tfidfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma")
    ).toDF("doc_id", "text")
    val out = CorpusFunctions.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(5)))
    // 'common' is in every doc → idf ln(1)=0 → ranks below the unique term
    val first = out.filter(_._3 == 1L).map(t => (t._1, t._2)).toSet
    assert(first == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(out.filter(_._3 == 2L).forall(_._2 == "common"))
  }

  test("contaminationScoresBloom: identical to the broadcast-exact scores") {
    val s = spark
    import s.implicits._
    val docs = (1L to 60L).map(i =>
      (i, s"token$i alpha beta gamma doc $i words ${i % 5} more filler"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val exact = rows(CorpusFunctions.contaminationScores(
      docs, bench, "doc_id", "text"))
    val bloom = rows(CorpusFunctions.contaminationScoresBloom(
      docs, bench, "doc_id", "text"))
    assert(bloom == exact)
    // empty benchmark: every doc scores zero hits, nothing errors
    val none = CorpusFunctions.contaminationScoresBloom(
      docs, bench.limit(0), "doc_id", "text")
      .collect()
    assert(none.length == 60 && none.forall(_.getLong(2) == 0L))
  }

  test("vocabularyStats: exact counts, ttr and hapax share on a crafted corpus") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "x x y z"),   // group a: 4 tokens, terms {x:2, y:1, z:1}
      ("a", "x"),         //   → x:3 total; terms 3, hapax {y,z} = 2
      ("b", "unique words only here")
    ).toDF("grp", "text")
    val out = CorpusFunctions.vocabularyStats(df, "text", Seq("grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") == ((5L, 3L, 3.0 / 5.0, 2.0 / 3.0)))
    assert(out("b") == ((4L, 4L, 1.0, 1.0)))
  }

  test("bigramLogProbScores: word ORDER matters — shuffled text scores lower") {
    val s = spark
    import s.implicits._
    // docs 1-3 share the dominant phrasing; doc 4 has the SAME TOKENS as
    // doc 1 but scrambled — a unigram model cannot tell them apart, the
    // bigram model must
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the rug"),
      (4L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val bi = CorpusFunctions.bigramLogProbScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[Double]("avg_logprob")))).toMap
    assert(bi.keySet == Set(1L, 2L, 3L, 4L))
    assert(bi.forall(_._2._1 == 5L))          // 5 adjacent pairs each
    assert(bi(1L)._2 > bi(4L)._2, s"order-scrambled doc not penalized: $bi")
    // unigram scores for docs 1 and 4 are IDENTICAL (same bag of tokens)
    val uni = CorpusFunctions.unigramLogProbScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    assert(math.abs(uni(1L) - uni(4L)) < 1e-12)
    // docs too short for a bigram are dropped, not scored
    val short = CorpusFunctions.bigramLogProbScores(
      Seq((9L, "single")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() == 0)
  }

  test("unigramLogProbScores: common text scores higher than rare text") {
    val s = spark
    import s.implicits._
    // docs 1-3 share the corpus-dominant phrasing; doc 4 is all-rare tokens
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the cat sat on the rug"),
      (4L, "zyx wvu tsr qpo nml kji")
    ).toDF("doc_id", "text")
    val rows = CorpusFunctions.unigramLogProbScores(df, "doc_id", "text")
    val out = rows.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getAs[Double]("avg_logprob"),
        r.getAs[Double]("sum_logprob")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out.forall(_._2._1 == 6L))                 // 6 tokens each
    assert(out(1L)._2 > out(4L)._2)                   // fluent >> gibberish
    // doc 1 repeats only corpus-common tokens → highest score of the three
    assert(out(1L)._2 >= out(2L)._2 && out(2L)._2 == out(3L)._2)
    // the exact sum and the float average agree: avg == sum / n
    out.values.foreach { case (n, avg, s2) =>
      assert(math.abs(avg - s2 / n) < 1e-12) }
  }

  test("packSequences: whole docs, budget overflow by last doc only, jumbo docs") {
    val s = spark
    import s.implicits._
    // stream a: 60+50 start in seq 0 (cum-before 0, 60); 30 starts at 110
    //   >= budget? (110 div 100 = 1) → seq 1; 5 at 140 → seq 1.
    // stream b: a 250-token jumbo doc occupies seq 0 alone and advances the
    //   stream to 250, so the next doc starts in seq 2 (ids skip 1).
    val df = Seq(
      (1L, "a", 60L), (2L, "a", 50L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 250L), (6L, "b", 10L)
    ).toDF("id", "grp", "tok")
    val out = CorpusFunctions.packSequences(df, col("tok"), "id",
      budget = 100L, groupCols = Seq("grp"))
      .select("id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 2L))
    // seq ids are monotone in the pack order within each stream
    val byGroup = CorpusFunctions.packSequences(df, col("tok"), "id",
      budget = 100L, groupCols = Seq("grp"))
      .select("grp", "id", "seq_id").collect()
      .groupBy(_.getString(0)).values
    byGroup.foreach { rows =>
      val seqs = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(seqs.zip(seqs.tail).forall { case (x, y) => x <= y })
    }
  }

  test("dedupLinesGlobal: first occurrence survives, empties kept, reassembly order") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "banner\nalpha\n\nbeta"),
      (2L, "banner\ngamma\n\nalpha"), // banner+alpha dup'd away, empty kept
      (3L, "banner")                  // everything dup'd away → doc dropped
    ).toDF("doc_id", "text")
    val out = CorpusFunctions.dedupLinesGlobal(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("banner\nalpha\n\nbeta", 4L)))
    assert(out(2L) == (("gamma\n", 2L))) // kept: gamma + the empty line
    assert(!out.contains(3L))
  }

  test("keepAboveQualityPercentile: per-group fraction, boundary inclusive") {
    val s = spark
    import s.implicits._
    // 5 docs per group with strictly increasing quality (longer = better up
    // to the length gate); percentile 0.5 keeps ranks 3,4,5 (pr 0.5,0.75,1).
    val mk = (n: Int) => ("the and of to is in that for with on " * n).trim
    val df = (1 to 5).flatMap(i => Seq(
      (i.toLong, "g1", mk(i)), (i.toLong + 10, "g2", mk(i))))
      .toDF("doc_id", "grp", "text")
    val kept = CorpusFunctions.keepAboveQualityPercentile(
      df, "doc_id", "text", Seq("grp"), minPercentile = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // quality ties resolve by doc_id, so the kept set is the top ids per grp
    assert(kept.size == 6)
    assert(kept.count(_ < 10) == 3 && kept.count(_ >= 10) == 3)
  }

  test("sampleExactN: exact size, deterministic, hash-ordered prefix nests") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).toDF("id")
    val take50 = CorpusFunctions.sampleExactN(df, "id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(take50.size == 50)
    val take20 = CorpusFunctions.sampleExactN(df, "id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(take20.subsetOf(take50)) // same hash order → prefix nesting
    assert(CorpusFunctions.sampleExactN(df, "id", 50)
      .collect().map(_.getLong(0)).toSet == take50)
  }

  test("bm25TopK: relevance ordering, rank contiguity, k cap, determinism") {
    val s = spark
    import s.implicits._
    // d1 mentions both query terms often (short doc), d2 one term, d3 none;
    // d4 pads the corpus so idf is informative
    val docs = Seq(
      (1L, "spark join spark join fast"),
      (2L, "join of tables and tables and tables in a long long document"),
      (3L, "completely unrelated text about gardening and flowers"),
      (4L, "more filler text about gardening the quiet way")
    ).toDF("doc_id", "text")
    val out = CorpusFunctions.bm25TopK(docs, "doc_id", "text",
      queries = Seq((7L, "spark join")), k = 10).collect()
    // only docs hitting >=1 term appear
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L))
    val byRank = out.sortBy(_.getLong(4))
    assert(byRank.map(_.getLong(4)).toSeq == Seq(1L, 2L)) // contiguous ranks
    // the both-terms short doc wins; scores strictly ordered
    assert(byRank.head.getLong(1) == 1L)
    assert(byRank.head.getDouble(2) > byRank.last.getDouble(2))
    assert(byRank.head.getLong(3) == 2L && byRank.last.getLong(3) == 1L)
    // k cap honored
    assert(CorpusFunctions.bm25TopK(docs, "doc_id", "text",
      Seq((7L, "spark join")), k = 1).count() == 1L)
    // deterministic re-run
    val again = CorpusFunctions.bm25TopK(docs, "doc_id", "text",
      Seq((7L, "spark join")), k = 10).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("rrfFuse: both-list docs outrank single-list, ties on id, k cap") {
    val s = spark
    import s.implicits._
    // doc 10 is rank 1 in both lists; 20 only in A (rank 2); 30 only in B
    // (rank 2); 40 only in B (rank 3)
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 10L, 1L), (1L, 30L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "id", "rank")
    val fused = CorpusFunctions.rrfFuse(Seq(a, b), "query_id", "id", "rank",
      k = 10).collect().sortBy(_.getLong(4))
    assert(fused.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L, 40L))
    // 10: 2/(60+1); 20 and 30 both 1/62 — the id tiebreak orders 20 first
    assert(fused.head.getLong(3) == 2L) // n_rankers
    assert(math.abs(fused.head.getDouble(2) - 2.0 / 61.0) < 1e-6)
    assert(fused(1).getDouble(2) == fused(2).getDouble(2)) // exact tie
    // k cap
    assert(CorpusFunctions.rrfFuse(Seq(a, b), "query_id", "id", "rank",
      k = 2).count() == 2L)
  }

  test("foldBm25Index: fold-then-score equals batch BM25 exactly, any chunking") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probes = Seq((0L, "spark join merge"), (1L, "window agg stream"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._5)).toSeq
    val batch = canon(CorpusFunctions.bm25TopK(
      docs, "doc_id", "text", probes, k = 10))
    for (m <- Seq(2, 3)) {
      val chunks = (0 until m).map(j => docs.filter(col("doc_id") % m === j))
      val index = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (p, c) => Some(CorpusFunctions.foldBm25Index(p, c, "doc_id", "text"))
      }.get
      assert(canon(CorpusFunctions.bm25FromIndex(index, probes, k = 10)) ==
        batch, s"$m-chunk fold diverged from batch BM25")
    }
    // the state is the postings + doclen discriminated union
    val one = CorpusFunctions.foldBm25Index(None, docs, "doc_id", "text")
    assert(one.filter(col("kind") === "d").count() == docs.count())
    assert(one.filter(col("kind") === "p").count() > docs.count())
  }

  test("weightedSampleByGroup: weights steer the race, zero weights " +
      "excluded, deterministic, per-group n") {
    val s = spark
    import s.implicits._
    // one heavy row among 100 light ones: −ln(u)/1e6 ≈ 0 beats every
    // −ln(u)/1 except u within e^(−1e−6·k4max) of 1 — astronomically safe
    val df = ((1L to 100L).map(i => (i, "g", 1.0)) :+ ((101L, "g", 1e6)))
      .toDF("id", "grp", "w")
    val top10 = CorpusFunctions.weightedSampleByGroup(
      df, "id", "w", Seq("grp"), n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top10.size == 10)
    assert(top10.contains(101L), "the 1e6-weight row must win a slot")
    // n >= group size keeps everything with positive weight
    val all = CorpusFunctions.weightedSampleByGroup(
      df, "id", "w", Seq("grp"), n = 1000).count()
    assert(all == 101)
    // zero/negative/null weights are excluded
    val bad = (Seq((1L, "g", 0.0), (2L, "g", -3.0), (4L, "g", Double.NaN)) :+
      ((3L, "g", 1.0))).toDF("id", "grp", "w")
      .withColumn("w", when(col("id") === 3L,
        lit(null).cast("double")).otherwise(col("w")))
    // NaN > 0 is TRUE under Spark's total order — the filter must still
    // exclude it, along with zero, negative and NULL weights
    assert(CorpusFunctions.weightedSampleByGroup(
      bad, "id", "w", Seq("grp"), n = 10).count() == 0)
    // deterministic re-run; global (ungrouped) top-n agrees with the
    // grouped path on a single group
    val g1 = CorpusFunctions.weightedSampleByGroup(
      df, "id", "w", Seq.empty, n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(g1 == top10)
    val again = CorpusFunctions.weightedSampleByGroup(
      df, "id", "w", Seq("grp"), n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == top10)
    // two groups sample independently
    val two = df.withColumn("grp",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val byG = CorpusFunctions.weightedSampleByGroup(
      two, "id", "w", Seq("grp"), n = 5)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 5L, "b" -> 5L))
  }

  test("dataCard: exact counts, duplicate fraction, mixture shares") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a", "hello world"), (2L, "a", "hello world"),
      (3L, "b", "one two three")).toDF("doc_id", "lang", "text")
    val card = CorpusFunctions.dataCard(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 3.0)
    assert(card("n_tokens") == 7.0)
    assert(card("n_distinct_texts") == 2.0)
    assert(card("dup_doc_frac") == 1.0 / 3.0)
    assert(card("mean_tokens") == 7.0 / 3.0)
    assert(card("share_a") == 2.0 / 3.0 && card("share_b") == 1.0 / 3.0)
    assert(card("n_null_texts") == 0.0 && card("n_null_group") == 0.0)
    assert(card.size == 9)
    // NULL group/text rows surface as their OWN count metrics (a group
    // whose literal value is "null" cannot collide), and null texts are
    // unknown content, never counted as duplicates of each other
    val withNull = docs.unionByName(Seq((4L, "x"))
      .toDF("doc_id", "text").withColumn("lang", lit(null).cast("string"))
      .select(col("doc_id"), col("lang"), col("text")))
      .unionByName(Seq((5L, "a")).toDF("doc_id", "lang")
        .withColumn("text", lit(null).cast("string"))
        .select(col("doc_id"), col("lang"), col("text")))
    val c2 = CorpusFunctions.dataCard(withNull, "text", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(c2("n_null_group") == 1.0 && c2("n_null_texts") == 1.0)
    // 4 docs WITH text, 3 distinct → dup frac 1/4 (null text not a dup)
    assert(c2("dup_doc_frac") == 1.0 / 4.0, c2.toString)
    // empty corpus: empty card, not NaNs
    assert(CorpusFunctions.dataCard(docs.limit(0), "text", "lang")
      .count() == 0)
  }

  test("lengthGroupedBatches: similar lengths share a batch, addresses " +
      "exact, invalid rows drop") {
    val s = spark
    import s.implicits._
    val docs = (1L to 400L).map(i => (i, (i * 37 % 101) * 10)).toDF("id", "len")
    val out = CorpusFunctions.lengthGroupedBatches(
      docs, "id", "len", shards = 4, batchSize = 8).cache()
    assert(out.count() == 400)
    // addresses are exact: within each shard, pos covers 0..size-1 via
    // contiguous (batch, pos) and batch 0 pos 0 is the shard's LONGEST
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("batch").as("mb")).collect()
    byShard.foreach { r =>
      val n = r.getLong(1); val mb = r.getInt(2)
      assert(mb == ((n - 1) / 8).toInt, s"shard ${r.getInt(0)}: $n rows, max batch $mb")
    }
    // pos is contiguous 0..count-1 within every (shard, batch)
    val badPos = out.groupBy("shard", "batch")
      .agg(count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("c") - 1).count()
    assert(badPos == 0, "pos must run 0..count-1 within each batch")
    val heads = out.filter(col("batch") === 0 && col("pos") === 0)
      .select("shard", "n_tokens").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxes = out.groupBy("shard").agg(max("n_tokens")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(heads == maxes, "batch 0 pos 0 must be each shard's longest")
    // padding waste: per batch, pad-to-longest waste under length grouping
    // must beat id-ordered batching on the same shards
    def waste(df: org.apache.spark.sql.DataFrame): Double = {
      val a = df.groupBy("shard", "batch")
        .agg(max("n_tokens").as("mx"), sum("n_tokens").as("sm"),
          count(lit(1)).as("c")).collect()
      val padded = a.map(r => r.getLong(2) * r.getLong(4)).sum.toDouble
      val used = a.map(_.getLong(3)).sum.toDouble
      1.0 - used / padded
    }
    val naive = CorpusFunctions.lengthGroupedBatches(
      docs.withColumn("len2", col("id")), "id", "len2",
      shards = 4, batchSize = 8)
      .drop("n_tokens")
      .join(docs.select(col("id"), col("len").cast("long").as("n_tokens")),
        "id")
    assert(waste(out) < waste(naive),
      s"grouped ${waste(out)} should waste less than id-ordered ${waste(naive)}")
    // determinism + invalid rows
    val again = CorpusFunctions.lengthGroupedBatches(
      docs, "id", "len", shards = 4, batchSize = 8)
    assert(out.exceptAll(again).isEmpty)
    val bad = Seq((1L, -5L), (2L, 10L)).toDF("id", "len")
      .unionByName(Seq(3L).toDF("id")
        .withColumn("len", lit(null).cast("long")))
    assert(CorpusFunctions.lengthGroupedBatches(
      bad, "id", "len", shards = 2, batchSize = 4)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    out.unpersist()
  }

  test("preferencePairs: best-vs-worst alignment, gap gate, crossing stop, " +
      "NaN/null excluded") {
    val s = spark
    import s.implicits._
    // group g: scores 100, 80, 60, 40, 20 → pairs (100,20), (80,40);
    // (60, 60) would self-pair at the crossing and must not emit
    val df = Seq(
      (1L, "g", 100.0), (2L, "g", 80.0), (3L, "g", 60.0),
      (4L, "g", 40.0), (5L, "g", 20.0)).toDF("id", "grp", "q")
    val got = CorpusFunctions.preferencePairs(df, "grp", "id", "q",
      gapMin = 0.0, maxPerGroup = 10)
      .orderBy("pair_rank").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 5L), (2L, 4L)), got.toString)
    // gap gate: gapMin 50 keeps only the (100, 20) pair
    assert(CorpusFunctions.preferencePairs(df, "grp", "id", "q",
      gapMin = 50.0, maxPerGroup = 10).count() == 1)
    // maxPerGroup caps
    assert(CorpusFunctions.preferencePairs(df, "grp", "id", "q",
      gapMin = 0.0, maxPerGroup = 1).count() == 1)
    // equal-score rows never pair (a tie is not a preference); NaN and
    // null scores drop out (under Spark's total order an unfiltered NaN
    // would rank FIRST and emit a (NaN, x) pair); null groups drop too
    val flat = Seq((1L, "g", 5.0), (2L, "g", 5.0), (4L, "g", Double.NaN))
      .toDF("id", "grp", "q")
      .unionByName(Seq((3L, "g")).toDF("id", "grp")
        .withColumn("q", lit(null).cast("double")))
      .unionByName(Seq((6L, 9.0), (7L, 1.0)).toDF("id", "q")
        .withColumn("grp", lit(null).cast("string"))
        .select(col("id"), col("grp"), col("q")))
    assert(CorpusFunctions.preferencePairs(flat, "grp", "id", "q",
      gapMin = 0.0, maxPerGroup = 10).count() == 0)
    // groups pair independently
    val two = df.unionByName(Seq((11L, "h", 9.0), (12L, "h", 1.0))
      .toDF("id", "grp", "q"))
    val byG = CorpusFunctions.preferencePairs(two, "grp", "id", "q",
      gapMin = 0.0, maxPerGroup = 10)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("g" -> 2L, "h" -> 1L))
  }

  test("rebalanceToMixture: quota formula holds across seeded random " +
      "corpora and weights") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // deterministic cases
    (1 to 5).foreach { _ =>
      val groups = ('a' to ('a' + 2 + rnd.nextInt(3)).toChar).map(_.toString)
      val sizes = groups.map(g => g -> (5 + rnd.nextInt(40))).toMap
      val weights = groups.map(g => g -> (1L + rnd.nextInt(5))).toSeq
      val docs = groups.flatMap(g => (0 until sizes(g)).map(i =>
        (g.hashCode.toLong * 1000 + i, g))).toDF("id", "grp")
      val sumW = weights.map(_._2).sum
      val t = weights.map { case (g, w) => sizes(g).toLong * sumW / w }.min
      val want = weights.map { case (g, w) => g -> w * t / sumW }.toMap
      val got = CorpusFunctions.rebalanceToMixture(docs, "grp", weights, "id")
        .groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want.filter(_._2 > 0), s"sizes=$sizes weights=$weights")
    }
  }

  test("bigramLogProbScoresAgainst: reference-trained LM, exact unseen " +
      "backstops, fluent text outranks OOV") {
    val s = spark
    import s.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the fish")).toDF("doc_id", "text")
    // vocab V = {the,cat,sat,on,mat,ate,fish} = 7
    val tgt = Seq(
      (10L, "the cat"),        // seen pair: c12=2, c1(the)=4 → ln(3/11)
      (11L, "the dog"),        // seen head, unseen pair → ln(1/11)
      (12L, "zig zag")         // unseen head → ln(1/7)
    ).toDF("doc_id", "text")
    val res = CorpusFunctions.bigramLogProbScoresAgainst(
      ref, tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    def lp4(x: Double): Double = BigDecimal(math.log(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(10L) == ((1L, lp4(3.0 / 11.0))), res(10L).toString)
    assert(res(11L) == ((1L, lp4(1.0 / 11.0))), res(11L).toString)
    assert(res(12L) == ((1L, lp4(1.0 / 7.0))), res(12L).toString)
    // fluency ordering: in-distribution > seen-head > fully-OOV... note
    // 1/7 > 1/11, so the OOV *backstop* can outrank a sparse head — the
    // meaningful assertion is the seen pair beats both backstops
    assert(res(10L)._2 > res(11L)._2)
    assert(res(10L)._2 > res(12L)._2)
  }

  test("bm25PrfTopK: expansion retrieves vocabulary-gap docs plain BM25 " +
    "cannot see") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma engine"),
      (2L, "alpha beta gamma pipeline"),
      (3L, "alpha beta gamma shuffle"),
      // no 'alpha' — invisible to the literal query, dense in the
      // feedback docs' vocabulary
      (10L, "beta gamma beta gamma beta gamma"),
      (20L, "totally unrelated filler words here")
    ).toDF("doc_id", "text")
    val q = Seq((0L, "alpha"))
    val plain = CorpusFunctions.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!plain.contains(10L) && !plain.contains(20L))
    val prf = CorpusFunctions.bm25PrfTopK(docs, "doc_id", "text", q, k = 10,
      fbDocs = 3, expTerms = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(prf.contains(10L), s"expansion missed the gap doc: $prf")
    assert(!prf.contains(20L), "off-vocabulary doc must stay invisible")
    // original-term docs still outrank the expansion-only doc (weight 1
    // vs 0.5 and idf of the rare original term)
    assert(prf.filterNot(_._1 == 10L).values.forall(_ < prf(10L)))
    // invalid weights refuse
    intercept[IllegalArgumentException] {
      CorpusFunctions.bm25PrfTopK(docs, "doc_id", "text", q, k = 5,
        expWeight = 0.0)
    }
    // non-numeric doc ids are first-class (same contract as bm25TopK):
    // the PRF path must not narrow ids to long
    val sdocs = docs.select(
      concat(lit("doc-"), col("doc_id").cast("string")).as("doc_id"),
      col("text"))
    val sprf = CorpusFunctions.bm25PrfTopK(sdocs, "doc_id", "text", q,
      k = 10, fbDocs = 3, expTerms = 2)
      .collect().map(r => r.getString(1) -> r.getLong(4)).toMap
    assert(sprf.keySet == prf.keys.map("doc-" + _).toSet, s"$sprf")
    assert(sprf("doc-10") == prf(10L), "string-id ranking diverged")
  }

  test("majorityVote: distinct-rater tallies, deterministic ties, agreement") {
    val s = spark
    import s.implicits._
    val votes = Seq(
      // item 1: clear 2-1 majority
      (1L, 10L, "good"), (1L, 11L, "good"), (1L, 12L, "bad"),
      // item 2: 1-1 tie → lexicographically smallest label wins
      (2L, 10L, "zeta"), (2L, 11L, "alpha"),
      // item 3: rater 10 votes the same label TWICE (counts once) and a
      // second label (counts toward that label but once toward n_raters)
      (3L, 10L, "x"), (3L, 10L, "x"), (3L, 10L, "y"), (3L, 11L, "x")
    ).toDF("item", "rater", "label")
    val m = CorpusFunctions.majorityVote(votes, "item", "rater", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(m(1L) == ((3L, 2L, "good", 2L, 2.0 / 3.0)))
    assert(m(2L) == ((2L, 2L, "alpha", 1L, 0.5)))
    assert(m(3L) == ((2L, 2L, "x", 2L, 1.0)))
    // NULL labels are abstentions: dropped before tallying, so a null can
    // never win a tie (Spark's nulls-first window order vs DuckDB's
    // nulls-last would otherwise diverge) and an all-null item vanishes
    val withNulls = Seq(
      (5L, 10L, Some("approve")), (5L, 11L, None), // tie would go to NULL
      (6L, 10L, None), (6L, 11L, None)             // pure abstention
    ).toDF("item", "rater", "label")
    val mn = CorpusFunctions.majorityVote(withNulls, "item", "rater", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(3), r.getLong(4)))).toMap
    assert(mn(5L) == ((1L, "approve", 1L)), s"null label leaked: $mn")
    assert(!mn.contains(6L))
  }

  test("ngramCommonness: template twins score common, unique doc scores " +
    "zero, empty doc absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d} — shared with doc 2
      (2L, "a b c d"),
      (3L, "x y z w"),   // unique shingles
      (4L, "")           // no shingles: absent
    ).toDF("doc_id", "text")
    val m = CorpusFunctions.ngramCommonness(
      docs, "doc_id", "text", shingleN = 3, commonDf = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(m.keySet == Set(1L, 2L, 3L))
    // df=2 for both shingles of docs 1/2: mean ln(2) rounded to 4 decimals
    assert(m(1L) == ((2L, 0.6931, 2L, 1.0)), s"${m(1L)}")
    assert(m(2L) == m(1L))
    assert(m(3L) == ((2L, 0.0, 0L, 0.0)), s"${m(3L)}")
  }

  test("sourceOverlapMatrix: pairwise Jaccard, ordered pairs, disjoint " +
    "and null groups absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Some("A"), "a b c d e"),  // shingles abc bcd cde (3)
      (2L, Some("B"), "c d e f"),    // cde def (2): shares {cde} with A
      (3L, Some("C"), "p q r s"),    // disjoint from both
      (4L, None, "a b c d e")        // null group dropped
    ).toDF("doc_id", "src", "text")
    val m = CorpusFunctions.sourceOverlapMatrix(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(m.keySet == Set(("A", "B")), s"unexpected pairs: ${m.keySet}")
    assert(m(("A", "B")) == ((3L, 2L, 1L, 1.0 / 4.0)), s"${m(("A", "B"))}")
  }

  test("krippendorffAlpha: hand-computed nominal alpha, unpairable and " +
    "null exclusions, one-category convention") {
    val s = spark
    import s.implicits._
    val ratings = Seq(
      (1L, 10L, Some("A")), (1L, 11L, Some("A")),     // agree
      (2L, 10L, Some("A")), (2L, 11L, Some("B")),     // disagree
      (3L, 10L, Some("B")), (3L, 11L, Some("B")),     // agree
      (4L, 10L, Some("A")),                           // unpairable: excluded
      (5L, 10L, None), (5L, 11L, None)                // abstentions only
    ).toDF("item", "rater", "label")
    val r = CorpusFunctions.krippendorffAlpha(
      ratings, "item", "rater", "label").head()
    // n=6 values over 3 pairable items; Do = 2/6; De = (36-18)/30 = 0.6
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 2.0 / 6.0)
    assert(r.getDouble(4) == 0.6)
    assert(r.getDouble(5) == 1.0 - (2.0 / 6.0) / 0.6)
    // one-category corpus: De = 0 → alpha = 1 by convention
    val one = Seq((1L, 10L, "A"), (1L, 11L, "A"), (2L, 10L, "A"),
      (2L, 11L, "A")).toDF("item", "rater", "label")
    val r1 = CorpusFunctions.krippendorffAlpha(
      one, "item", "rater", "label").head()
    assert(r1.getDouble(4) == 0.0 && r1.getDouble(5) == 1.0)
  }

  test("raterConsensusQuality: leave-one-out consensus, sole-voter items " +
    "excluded, LOO differs from naive majority") {
    val s = spark
    import s.implicits._
    val ratings = Seq(
      // item 1: A, A, B — LOO keeps r1/r2 agreeing, r3 disagreeing
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"),
      // item 2: sole voter — no LOO consensus, excluded from r1's count
      (2L, 1L, "A"),
      // item 3: C vs D tie — naive majority "C" would credit r1, but the
      // LOO reference for r1 is D (their own vote removed) → disagree
      (3L, 1L, "C"), (3L, 2L, "D")
    ).toDF("item", "rater", "label")
    val m = CorpusFunctions.raterConsensusQuality(
      ratings, "item", "rater", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((2L, 1L, 0.5)), s"r1: ${m(1L)}")  // item1 yes, item3 no
    assert(m(2L) == ((2L, 1L, 0.5)), s"r2: ${m(2L)}")  // item1 yes, item3 no
    assert(m(3L) == ((1L, 0L, 0.0)), s"r3: ${m(3L)}")
  }

  test("temperatureMixtureWeights: alpha=0.5 flattens, alpha=1 is the " +
    "identity, exact fixed-point weights, null groups dropped") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(8)(Some("a")) ++ Seq.fill(2)(Some("b")) ++
      Seq(Option.empty[String])).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val w = CorpusFunctions.temperatureMixtureWeights(docs, "g", 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(w.keySet == Set("a", "b"))  // null group dropped
    assert(w("a")._1 == 8L && w("a")._2 == 0.8)
    assert(w("a")._4 == 894427191L && w("b")._4 == 447213595L)
    // flattening: minority share 0.2 → weight 1/3
    assert(math.abs(w("b")._3 - 447213595.0 / 1341640786.0) < 1e-12)
    // alpha=1 reproduces the shares (to the 9-decimal rounding)
    val id = CorpusFunctions.temperatureMixtureWeights(docs, "g", 1.0)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    id.foreach { case (share, weight) =>
      assert(math.abs(share - weight) < 1e-9) }
    intercept[IllegalArgumentException] {
      CorpusFunctions.temperatureMixtureWeights(docs, "g", 0.0)
    }
    // aggressive sharpening of a vanishing group: share^alpha rounds to
    // zero at 9 decimals -> weight_int = 0 surfaces (the documented
    // "filter before rebalanceToMixture" contract), weight stays tiny
    val skew = (Seq.fill(100000)(Some("big")) ++ Seq(Some("tiny")))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val sharp = CorpusFunctions.temperatureMixtureWeights(skew, "g", 3.0)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(sharp("tiny") == 0L && sharp("big") > 0L, s"$sharp")
  }

  test("zipfFit: exact power law recovers slope -1, degenerate vocab " +
    "yields NULL fit, tiny topR refused") {
    val s = spark
    import s.implicits._
    // f = 12/r exactly at ranks 1..4: ln f = ln 12 - ln r, slope -1
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val r = CorpusFunctions.zipfFit(
      Seq((1L, text)).toDF("doc_id", "text"), "text", topR = 500)
      .head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 25L && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) + 1.0) < 1e-4, s"slope ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - math.log(12.0)) < 1e-3)
    assert(r.getDouble(5) > 0.999999, s"r2 ${r.getDouble(5)}")
    val d = CorpusFunctions.zipfFit(
      Seq((1L, "solo solo")).toDF("doc_id", "text"), "text").head()
    assert(d.getLong(0) == 1L && d.getLong(2) == 1L && d.isNullAt(3) &&
      d.isNullAt(4) && d.isNullAt(5))
    intercept[IllegalArgumentException] {
      CorpusFunctions.zipfFit(
        Seq((1L, "x")).toDF("doc_id", "text"), "text", topR = 1)
    }
  }

  test("duplicationProfile: multiplicity histogram with cross-source " +
    "leakage; no groupCol means zero cross counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "same text alpha", "s1"), (2L, "same text alpha", "s1"),
      (3L, "same text alpha", "s2"),                  // m=3, cross-source
      (4L, "same text beta", "s1"), (5L, "same text beta", "s1"), // m=2
      (6L, "unique text gamma", "s2")                 // m=1
    ).toDF("doc_id", "text", "source")
    val m = CorpusFunctions.duplicationProfile(
      docs, "text", Some("source")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m == Map(1L -> ((1L, 1L, 0L)), 2L -> ((1L, 2L, 0L)),
      3L -> ((1L, 3L, 1L))), s"$m")
    val noG = CorpusFunctions.duplicationProfile(docs, "text")
      .collect().map(_.getLong(3)).sum
    assert(noG == 0L, "cross-source counts must be 0 without a groupCol")
  }

  test("raterBiasReport: one-note rater scores high PSI, pool-matching " +
    "rater stays low") {
    val s = spark
    import s.implicits._
    val votes = (
      (1L to 20L).map(i => (i, 1L, if (i <= 10) "L1" else "L2")) ++ // balanced
      (21L to 40L).map(i => (i, 2L, if (i <= 30) "L1" else "L2")) ++ // balanced
      (41L to 50L).map(i => (i, 3L, "L1"))                          // one-note
    ).toDF("item", "rater", "label")
    val m = CorpusFunctions.raterBiasReport(votes, "item", "rater", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(m(1L)._1 == 20L && m(3L)._1 == 10L)
    assert(m(3L)._2 > 0.25, s"one-note rater PSI: ${m(3L)._2}")
    assert(m(1L)._2 < 0.1 && m(2L)._2 < 0.1,
      s"balanced raters PSI: ${m(1L)._2} ${m(2L)._2}")
    assert(m(3L)._2 > m(1L)._2 * 3)
  }

  test("mixtureDiversity: uniform mix hits ln(k) and 1-1/k, single group " +
    "zeroes both, nulls dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(Some("a"), Some("a"), Some("b"), Some("b"), None)
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val r = CorpusFunctions.mixtureDiversity(docs, "g").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) - math.log(2.0)) < 1e-5,
      s"uniform entropy: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.5)
    val one = CorpusFunctions.mixtureDiversity(
      docs.filter(col("g") === "a"), "g").head()
    assert(math.abs(one.getDouble(2)) < 1e-5 && one.getDouble(3) == 0.0)
  }

  test("heapsFit: linear vocab growth nears beta 1, constant vocab fits " +
    "beta 0, empty-safe, tiny points refused") {
    val s = spark
    import s.implicits._
    // each doc adds exactly 2 new types and 4 tokens: V = 2+2d, N = 4d
    val grow = (1L to 20L).map(i => (i, s"a b c$i d$i")).toDF("doc_id", "text")
    val g = CorpusFunctions.heapsFit(grow, "doc_id", "text", points = 4)
      .head()
    assert(g.getLong(0) == 42L && g.getLong(1) == 80L && g.getLong(2) == 4L)
    assert(g.getDouble(3) > 0.8 && g.getDouble(3) < 1.0,
      s"near-linear growth beta: ${g.getDouble(3)}")
    assert(g.getDouble(5) > 0.98, s"r2 ${g.getDouble(5)}")
    // identical docs: V constant -> beta ~ 0 (flat fit)
    val flat = (1L to 20L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val f = CorpusFunctions.heapsFit(flat, "doc_id", "text", points = 4)
      .head()
    assert(f.getLong(0) == 3L && math.abs(f.getDouble(3)) < 1e-9,
      s"flat growth beta: ${f.getDouble(3)}")
    // empty corpus: ONE row of zero counts + NULL fit (the zipfFit
    // degenerate-input convention), no probe crash
    val e = CorpusFunctions.heapsFit(
      grow.filter(col("doc_id") < 0), "doc_id", "text").head()
    assert(e.getLong(0) == 0L && e.getLong(2) == 0L && e.isNullAt(3))
    intercept[IllegalArgumentException] {
      CorpusFunctions.heapsFit(grow, "doc_id", "text", points = 1)
    }
    // wide id range: (hi - lo) * k must not overflow Long into
    // below-range checkpoints (silent empty fit)
    val wide = Seq((0L, "alpha beta"), (Long.MaxValue / 32, "alpha gamma"))
      .toDF("doc_id", "text")
    val w = CorpusFunctions.heapsFit(wide, "doc_id", "text", points = 64)
      .head()
    assert(w.getLong(0) == 3L && w.getLong(2) == 2L,
      s"overflowed checkpoints: $w")
  }

  test("gopherQualityReport: each rule fires on its planted violation") {
    val s = spark
    import s.implicits._
    val goodBody = ("the data and the model have to be trained with " +
      "care and attention to every detail of the corpus ") * 3 // 60 words
    val docs = Seq(
      (1L, goodBody),                                   // passes every rule
      (2L, "too short to have the and of with that"),   // word-count floor
      (3L, Seq.fill(60)("##").mkString(" ") +
        " the and of to be that have with"),            // symbol ratio
      (4L, Seq.fill(60)("12345").mkString(" ") +
        " the and of to be that have with"),            // alpha fraction
      (5L, "the and to of be that have with data model\n" +
        "- four letter word rows\n" * 20),              // bullet fraction
      (6L, Seq.fill(60)("zzzz").mkString(" "))          // no stop words
    ).toDF("doc_id", "text")
    val m = graft.functions.TextFunctions.gopherQualityReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("pass"), m(1L).toString)
    assert(!m(2L).getAs[Boolean]("pass") && m(2L).getLong(1) < 50)
    assert(!m(3L).getAs[Boolean]("pass") &&
      m(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!m(4L).getAs[Boolean]("pass") &&
      m(4L).getAs[Double]("alpha_frac") < 0.8)
    assert(!m(5L).getAs[Boolean]("pass") &&
      m(5L).getAs[Double]("bullet_frac") > 0.9)
    assert(!m(6L).getAs[Boolean]("pass") &&
      m(6L).getAs[Long]("stop_hits") == 0L)
    // empty text: null ratios, pass resolves FALSE (not null)
    val e = graft.functions.TextFunctions.gopherQualityReport(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(e.getLong(1) == 0L && !e.getAs[Boolean]("pass"))
    assert(e.isNullAt(e.fieldIndex("mean_word_len")))
    // NULL text: every measure NULL but the verdict is still a firm FALSE
    // (a 3VL NULL would vanish from both pass and reject filters)
    val n = graft.functions.TextFunctions.gopherQualityReport(
      Seq((10L, Option.empty[String])).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(!n.isNullAt(n.fieldIndex("pass")) && !n.getAs[Boolean]("pass"))
  }

  test("tokenizerFertility: exact totals, ratios, null-group drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // en doc 1: 3 whitespace words; 6 bpe-ish tokens (don / ' / t /
      // split / words / .); bytes = length (all ASCII)
      (1L, "en", "don't split words."),
      (2L, "en", "two words"),          // 2 words, 2 tokens
      (3L, "zh", "好"),                 // 1 word, 1 token, 3 utf-8 bytes
      (4L, null.asInstanceOf[String], "dropped row"),
      (5L, "empty", "")                 // 0 words → NULL fertility
    ).toDF("doc_id", "lang", "text")
    val m = graft.functions.CorpusFunctions.tokenizerFertility(docs, "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("en", "zh", "empty"))
    val en = m("en")
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("n_words") == 5L)
    assert(en.getAs[Long]("n_tokens") == 8L)
    assert(en.getAs[Long]("n_bytes") == ("don't split words." + "two words").length)
    assert(math.abs(en.getAs[Double]("fertility") - 8.0 / 5.0) < 1e-12)
    val zh = m("zh")
    assert(zh.getAs[Long]("n_words") == 1L && zh.getAs[Long]("n_tokens") == 1L)
    assert(zh.getAs[Long]("n_bytes") == 3L, "UTF-8 bytes, not chars")
    val e = m("empty")
    assert(e.getAs[Long]("n_words") == 0L &&
      e.isNullAt(e.fieldIndex("fertility")))
  }

  test("tokenBudgetPlan: exact targets, epoch cap, absent group, validation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("web", 100L), ("web", 200L),   // 300 available
      ("books", 1000L),               // 1000 available
      ("unweighted", 5000L),          // no weight → dropped
      (null.asInstanceOf[String], 9L)
    ).toDF("source", "toks")
    val plan = graft.functions.CorpusFunctions.tokenBudgetPlan(
      docs, "source", "toks",
      Seq(("web", 2L), ("books", 1L), ("absent", 1L)),
      budgetTokens = 10000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan.keySet == Set("web", "books", "absent"))
    // web: target 10000*2/4 = 5000, cap 4*300 = 1200 → capped, epochs 4.0
    val web = plan("web")
    assert(web.getAs[Long]("target_tokens") == 5000L)
    assert(web.getAs[Long]("allocated_tokens") == 1200L)
    assert(web.getAs[Boolean]("capped"))
    assert(web.getAs[Double]("epochs") == 4.0)
    assert(web.getAs[Long]("shortfall_tokens") == 3800L)
    // books: target 2500 ≤ cap 4000 → uncapped, epochs 2.5
    val books = plan("books")
    assert(books.getAs[Long]("allocated_tokens") == 2500L)
    assert(!books.getAs[Boolean]("capped"))
    assert(books.getAs[Double]("epochs") == 2.5)
    assert(books.getAs[Long]("shortfall_tokens") == 0L)
    // absent: weighted but no corpus rows → zero availability, all shortfall
    val ab = plan("absent")
    assert(ab.getAs[Long]("available_tokens") == 0L &&
      ab.getAs[Long]("allocated_tokens") == 0L &&
      ab.getAs[Long]("shortfall_tokens") == 2500L &&
      ab.isNullAt(ab.fieldIndex("epochs")))
    // loud validation
    intercept[IllegalArgumentException] {
      graft.functions.CorpusFunctions.tokenBudgetPlan(docs, "source", "toks",
        Seq(("web", 0L)), 100L)
    }
    intercept[IllegalArgumentException] {
      graft.functions.CorpusFunctions.tokenBudgetPlan(docs, "source", "toks",
        Seq(("web", 1L), ("web", 2L)), 100L)
    }
    intercept[IllegalArgumentException] {
      graft.functions.CorpusFunctions.tokenBudgetPlan(docs, "source", "toks",
        Seq(("web", 1000000L)), Long.MaxValue / 2)
    }
    // the epoch cap available·maxEpochs must not wrap for near-Long.Max
    // corpora: 4 × (Long.Max/2) overflows a long but the decimal cap
    // correctly loses the least() to the (fitting) target
    val huge = Seq(("web", Long.MaxValue / 2)).toDF("source", "toks")
    val hp = graft.functions.CorpusFunctions.tokenBudgetPlan(
      huge, "source", "toks", Seq(("web", 1L)),
      budgetTokens = 1000000L, maxEpochs = 4)
      .collect().head
    assert(hp.getAs[Long]("allocated_tokens") == 1000000L)
    assert(!hp.getAs[Boolean]("capped"))
  }

  test("c4Clean: line rules and page gates each fire on their planted case") {
    val s = spark
    import s.implicits._
    val s1 = "This first sentence carries enough words to be retained."
    val s2 = "Does the second sentence also survive the line filter, yes?"
    val s3 = "A third full sentence closes the page with a bang!"
    val docs = Seq(
      (1L, s"$s1\nno terminal punctuation on this line\n$s2\nShort line.\n$s3"),
      (2L, s"$s1\n$s2"),                                // only 2 kept lines
      (3L, s"$s1\n$s2\nPlease enable JavaScript to read the article."),
      (4L, s"$s1\n$s2\n$s3\nlorem ipsum dolor sit amet."),  // page gate
      (5L, s"$s1\n$s2\n$s3\nif (x) { return; }"),       // brace page gate
      (6L, null.asInstanceOf[String]),                  // null text
      // two retained LINES but three SENTENCES — the C4 gate counts
      // sentence-terminal marks in the retained text, not lines
      (7L, s"$s1\nTwo sentences share this line. They both count, right?")
    ).toDF("doc_id", "text")
    val m = graft.functions.TextFunctions.c4Clean(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: junk lines dropped, the 3 sentences survive IN ORDER
    assert(m(1L).getAs[Boolean]("kept_doc"))
    assert(m(1L).getAs[Long]("n_lines") == 5L)
    assert(m(1L).getAs[Long]("n_kept") == 3L)
    assert(m(1L).getAs[String]("text_clean") == s"$s1\n$s2\n$s3")
    // doc 2: two retained lines < 3 → page dropped, text_clean NULL
    assert(!m(2L).getAs[Boolean]("kept_doc") &&
      m(2L).isNullAt(m(2L).fieldIndex("text_clean")))
    // doc 3: the javascript line is dropped (case-insensitive) → 2 kept
    assert(m(3L).getAs[Long]("n_kept") == 2L &&
      !m(3L).getAs[Boolean]("kept_doc"))
    // doc 4: 4 retained lines but lorem ipsum kills the page
    assert(m(4L).getAs[Long]("n_kept") == 4L &&
      !m(4L).getAs[Boolean]("kept_doc"))
    // doc 5: brace kills the page even though 3 lines were retained
    assert(!m(5L).getAs[Boolean]("kept_doc"))
    // doc 6: NULL text → firm FALSE verdict (3VL must not leak)
    assert(!m(6L).isNullAt(m(6L).fieldIndex("kept_doc")) &&
      !m(6L).getAs[Boolean]("kept_doc"))
    // doc 7: 2 retained lines but 3 sentence marks → page KEPT (a
    // line-count gate would wrongly drop it)
    assert(m(7L).getAs[Long]("n_kept") == 2L &&
      m(7L).getAs[Boolean]("kept_doc"))
    // degenerate thresholds refused loudly
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.c4Clean(docs, minWordsPerLine = 0)
    }
  }

  test("contaminationMatrix: per-benchmark overlaps, sparse, threshold") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // fully in bench A
      (2L, "alpha beta gamma zeta eta theta"),  // partially in A
      (3L, "one two three four five"),          // fully in bench B
      (4L, "totally unrelated clean document here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      ("A", "alpha beta gamma delta epsilon"),
      ("B", "one two three four five")
    ).toDF("benchmark", "text")
    val m = CorpusFunctions.contaminationMatrix(
      docs, bench, "doc_id", "text", "benchmark").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc1 x A: all 3 shingles hit; doc2 x A: 1 of 4; doc3 x B: all 3
    assert(m((1L, "A")) == ((3L, 3L, 1.0)))
    assert(m((2L, "A"))._2 == 1L)
    assert(m((3L, "B")) == ((3L, 3L, 1.0)))
    // SPARSE: the clean doc and all zero-overlap pairs are absent
    assert(!m.keySet.exists(_._1 == 4L))
    assert(!m.contains((1L, "B")) && !m.contains((3L, "A")))
    // threshold drops the partial hit but keeps the verbatim ones
    val hi = CorpusFunctions.contaminationMatrix(
      docs, bench, "doc_id", "text", "benchmark", minOverlap = 0.9)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hi == Set((1L, "A"), (3L, "B")))
    // exact duplicate deliveries (a multi-session fold re-sending rows)
    // collapse: counts match the single-copy run and overlap stays <= 1
    val dup = CorpusFunctions.contaminationMatrix(
      docs.unionAll(docs), bench, "doc_id", "text", "benchmark").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(dup == m, s"duplicated input changed the matrix: $dup vs $m")
    assert(dup.values.forall(_._3 <= 1.0))
    // DIFFERING versions of one id are each scored and the WORST wins: a
    // contaminated version must not hide behind a clean rewrite
    val versions = docs.unionAll(Seq(
      (9L, "zzz totally unrelated clean rewrite here"),   // lex max, clean
      (9L, "alpha beta gamma delta epsilon")              // verbatim leak
    ).toDF("doc_id", "text"))
    val mv = CorpusFunctions.contaminationMatrix(
      versions, bench, "doc_id", "text", "benchmark").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(mv((9L, "A")) == 1.0,
      s"contaminated version hidden behind the clean one: $mv")
  }

  test("knLogProbScores: continuation counts reward versatile words " +
    "(the property add-1 smoothing cannot express)") {
    val s = spark
    import s.implicits._
    // "francisco" is frequent but follows ONLY "san"; "dog" follows many
    // distinct heads. Under head "z" both pairs have c12=1, same c1, same
    // head stats — add-1 scores them EQUAL; Kneser-Ney's N1+(·w2) backoff
    // must score "z dog" strictly higher.
    val docs = (
      Seq.tabulate(5)(i => (i.toLong, "san francisco")) ++
        Seq("a", "b", "c", "d", "e").zipWithIndex.map { case (h, i) =>
          (10L + i, s"$h dog") } ++
        Seq((20L, "z francisco"), (21L, "z dog"))
      ).toDF("doc_id", "text")
    val kn = CorpusFunctions.knLogProbScores(docs, "doc_id", "text")
      .select(col("doc_id"), col("sum_logprob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kn(21L) > kn(20L),
      s"KN backoff did not reward the versatile continuation: " +
        s"z-dog ${kn(21L)} <= z-francisco ${kn(20L)}")
    val add1 = CorpusFunctions.bigramLogProbScores(docs, "doc_id", "text")
      .select(col("doc_id"), col("sum_logprob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(add1(21L) == add1(20L), "add-1 control should tie the two docs")
    // probabilities stay in (0,1): every doc's log mass is negative
    assert(kn.values.forall(_ < 0.0))
    // exactness contract: repartition-invariant decimal sums
    val kn2 = CorpusFunctions.knLogProbScores(
      docs.repartition(7), "doc_id", "text")
      .select(col("doc_id"), col("sum_logprob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kn2 == kn)
  }

  test("curriculumShards: contiguous difficulty bands, exact addresses") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val scored = (1L to 103L).map(i => (i, rnd.nextDouble())).toDF("id", "sc")
    val out = CorpusFunctions.curriculumShards(scored, "id", "sc", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 103)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0 until 8).toSet)
    // near-equal contiguous blocks: sizes differ by at most 1
    val sizes = byShard.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    // pos is the contiguous 1..size in-band rank
    byShard.foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"shard $sh pos not contiguous") }
    // the bands respect the global order: every score in shard k is <=
    // every score in shard k+1 (ascending = easiest first)
    val score = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 7)
      assert(byShard(k).map(t => score(t._1)).max <=
        byShard(k + 1).map(t => score(t._1)).min)
    // deterministic under repartitioning
    val out2 = CorpusFunctions.curriculumShards(
      scored.repartition(13), "id", "sc", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out2 == out.toSet)
    // empty input yields an empty, correctly-shaped layout
    assert(CorpusFunctions.curriculumShards(
      scored.limit(0), "id", "sc", shards = 4).count() == 0)
    // null scores are refused loudly: Spark orders nulls first ascending,
    // other engines last — the layout would be silently engine-dependent
    val withNull = scored.unionByName(
      Seq((999L, Option.empty[Double])).toDF("id", "sc"))
    val e = intercept[IllegalArgumentException] {
      CorpusFunctions.curriculumShards(withNull, "id", "sc", shards = 4)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("dsirSelect: picks the docs that look like the target distribution") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
    // target: quantum-physics-flavored seed set
    val target = (0 until 20).map(i =>
      (1000L + i, "quantum physics entangled qubit " + noise(4)))
      .toDF("doc_id", "text")
    // corpus: 10 on-topic docs buried in 90 off-topic ones
    val corpus = ((0 until 10).map(i =>
      (i.toLong, "quantum physics entangled qubit " + noise(4))) ++
      (10 until 100).map(i => (i.toLong, noise(8))))
      .toDF("doc_id", "text")
    val sel = CorpusFunctions.dsirSelect(corpus, target, "doc_id", "text",
      k = 10)
    val rows = sel.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
    val picked = rows.map(_.getLong(0)).toSet
    val onTopic = picked.count(_ < 10L)
    assert(onTopic >= 8, s"only $onTopic/10 on-topic docs selected: $picked")
    // deterministic under repartitioning (decimal weights, total order)
    val sel2 = CorpusFunctions.dsirSelect(corpus.repartition(13),
      target.repartition(3), "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sel2 == rows.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("rebalanceToMixture: duplicate ids in a weighted group are refused") {
    val s = spark
    import s.implicits._
    // ids 1..5 unique in "a"; id 7 appears twice in "b" — its shared md5
    // key would let the threshold admit both rows and overfill the quota
    val docs = ((1L to 5L).map(i => (i, "a")) ++ Seq((7L, "b"), (7L, "b"),
      (8L, "b"))).toDF("id", "grp")
    val e = intercept[IllegalArgumentException] {
      CorpusFunctions.rebalanceToMixture(docs, "grp",
        Seq("a" -> 1L, "b" -> 1L), "id").collect()
    }
    assert(e.getMessage.contains("duplicate id"), e.getMessage)
    // an UNWEIGHTED group may carry duplicates — it is dropped anyway
    val ok = CorpusFunctions.rebalanceToMixture(docs, "grp",
      Seq("a" -> 1L), "id")
    assert(ok.count() == 5)
  }

  test("rebalanceToMixture: exact integer quotas, md5 pick order, " +
      "unweighted groups dropped") {
    val s = spark
    import s.implicits._
    // a:10 docs, b:6, c:4; weights a=2, b=1 (c unweighted)
    val docs = ((0L until 10L).map(i => (i, "a")) ++
      (10L until 16L).map(i => (i, "b")) ++
      (16L until 20L).map(i => (i, "c"))).toDF("doc_id", "grp")
    val res = CorpusFunctions.rebalanceToMixture(docs, "grp",
      Seq("a" -> 2L, "b" -> 1L), idCol = "doc_id")
    val byGrp = res.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(10*3/2, 6*3/1) = 15; keep_a = 2*15/3 = 10, keep_b = 15/3 = 5
    assert(byGrp == Map("a" -> 10L, "b" -> 5L), s"got $byGrp")
    // the kept b-rows are exactly the 5 smallest by (md5(id), id)
    def md5hex(v: String): String = java.security.MessageDigest
      .getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val wantB = (10L until 16L).sortBy(i => (md5hex(i.toString), i)).take(5)
    val gotB = res.filter(col("grp") === "b").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(gotB == wantB.sorted.toSeq)
    // rerun bit-identical
    val again = CorpusFunctions.rebalanceToMixture(docs, "grp",
      Seq("a" -> 2L, "b" -> 1L), idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == res.select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
    // equal weights equalize to the smaller group's size
    val eq = CorpusFunctions.rebalanceToMixture(docs, "grp",
      Seq("a" -> 1L, "b" -> 1L), idCol = "doc_id")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq == Map("a" -> 6L, "b" -> 6L))
    // a weighted group with ZERO corpus rows fails loudly (the declared
    // mixture is unsatisfiable) instead of silently shipping a 2-group mix
    intercept[IllegalArgumentException] {
      CorpusFunctions.rebalanceToMixture(docs, "grp",
        Seq("a" -> 2L, "zz" -> 1L), "doc_id").count()
    }
    // validation
    intercept[IllegalArgumentException] {
      CorpusFunctions.rebalanceToMixture(docs, "grp", Seq.empty, "doc_id")
    }
    intercept[IllegalArgumentException] {
      CorpusFunctions.rebalanceToMixture(docs, "grp",
        Seq("a" -> 0L), "doc_id")
    }
    intercept[IllegalArgumentException] {
      CorpusFunctions.rebalanceToMixture(docs, "grp",
        Seq("a" -> 1L, "a" -> 2L), "doc_id")
    }
  }
}
