package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.exprs._
import graft.functions.{RollingHash, SimHash64}

/** Custom Catalyst expressions: codegen path must agree with the interpreted
  * path and with the reference Scala implementations. */
class ExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private def withCodegen[T](enabled: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try f finally spark.conf.set(key, old)
  }

  private def docsDf = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox"),
      (2L, ""),
      (3L, "汉字 mixed ünïcode text"),
      (4L, "a"),
      (5L, "the quick brown fox")  // dup of 1
    ).toDF("id", "text")
  }

  test("rolling_hash: codegen == interpreted == direct Scala") {
    def run(codegen: Boolean) = withCodegen(codegen) {
      docsDf.select(col("id"), rolling_hash(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cg = run(true)
    val interp = run(false)
    assert(cg == interp)
    val direct = docsDf.collect().map(r =>
      r.getLong(0) -> RollingHash.hashBytes(
        r.getString(1).getBytes("UTF-8"))).toMap
    assert(cg == direct)
    assert(cg(1L) == cg(5L))          // identical text → identical hash
    assert(cg(2L) == 0L)              // empty string → 0 accumulator
  }

  test("simhash64: codegen == interpreted; identical token arrays collide") {
    def run(codegen: Boolean) = withCodegen(codegen) {
      docsDf.select(col("id"),
        simhash64(split(col("text"), " ")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cg = run(true)
    assert(cg == run(false))
    assert(cg(1L) == cg(5L))
  }

  test("hamming64 equals bit-count of xor") {
    val s = spark; import s.implicits._
    val df = Seq((0x0FL, 0x00L), (0xFFL, 0xFFL), (-1L, 0L)).toDF("a", "b")
    val got = df.select(hamming64(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(4, 0, 64))
    assert(SimHash64.hamming(0x0FL, 0x00L) == 4)
  }

  test("cosine_sim/dot_prod: codegen == interpreted == composed HOF form") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5f, -1.5f, 2.5f), Seq(-1.0, 0.0, 2.0))
    ).toDF("a", "b")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(cosine_sim(col("a"), col("b")).as("c"),
        dot_prod(col("a"), col("b")).as("d"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    }
    val cg = run(true)
    assert(cg == run(false))
    // equals the composed higher-order-function form bit-for-bit
    val hof = df.select(
      (aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _) /
        (sqrt(aggregate(zip_with(col("a"), col("a"),
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)) *
         sqrt(aggregate(zip_with(col("b"), col("b"),
           (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)))).as("c"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _).as("d"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(cg == hof)
  }

  test("two instances of one custom expression share a generated method") {
    // fixed local names in doGenCode would declare twice in the fused
    // projection → janino failure → silent interpreter fallback
    def run(codegen: Boolean) = withCodegen(codegen) {
      docsDf.select(
        rolling_hash(col("text")).as("h1"),
        rolling_hash(concat(col("text"), lit("x"))).as("h2"),
        simhash64(split(col("text"), " ")).as("s1"),
        simhash64(split(concat(col("text"), lit(" x")), " ")).as("s2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(run(true) == run(false))
  }

  test("cosine_sim/dot_prod: NULL on length mismatch or null elements") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0)), Seq[Option[Double]](Some(3.0), Some(4.0)))
    ).toDF("a", "b")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(cosine_sim(col("a"), col("b")).as("c"),
        dot_prod(col("a"), col("b")).as("d"))
        .collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSeq
    }
    val cg = run(true)
    assert(cg == run(false))
    // row 1 computes; a null element or a length mismatch is NULL, never a
    // truncated/zero-filled similarity
    assert(cg == Seq((false, false), (true, true), (true, true)))
  }

  test("shingle_hashes: codegen == interpreted; cardinality matches string shingles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    def run(codegen: Boolean) = withCodegen(codegen) {
      docs.select(col("doc_id"),
        shingle_hashes(col("text"), 3).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    }
    val cg = run(true)
    assert(cg == run(false))
    // one hash per distinct string shingle (no collisions on this corpus)
    val strCounts = docs.select(col("doc_id"),
      size(graft.functions.DedupFunctions.shingles(col("text"), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cg.foreach { case (id, hs) => assert(hs.size == strCounts(id), s"doc $id") }
    // token-less text → ONE empty-stream gram (mirrors the string form's
    // single "" shingle so empty docs still pair as candidates)
    val s = spark; import s.implicits._
    val empty = Seq((1L, ""), (2L, "!!!")).toDF("doc_id", "text")
      .select(shingle_hashes(col("text"), 3).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(empty.forall(_.size == 1))
    assert(empty(0) == empty(1)) // both token-less → identical gram
  }

  test("token_window_hashes: codegen == interpreted; rolling == positional") {
    val s0 = spark; import s0.implicits._
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three"),           // exactly window tokens
      (3L, "one two"),                 // under window → empty
      (4L, ""),                        // no tokens → empty
      (5L, "two three four one two three") // shares windows with 1 and 2
    ).toDF("id", "text")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(col("id"),
        token_window_hashes(
          graft.functions.TextFunctions.tokens(col("text")), 3).as("ws"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    }
    val cg = run(true)
    assert(cg == run(false))
    assert(cg(1L).size == 4 && cg(2L).size == 1)
    assert(cg(3L).isEmpty && cg(4L).isEmpty)
    // identical windows hash identically regardless of position (the
    // cross-doc property the frequency prefilter counts on): doc 5's
    // tail window "one two three" == doc 2's only window, and its head
    // "two three four" == doc 1's second window
    assert(cg(5L)(3) == cg(2L)(0))
    assert(cg(5L)(0) == cg(1L)(1))
    // rolling recurrence equals the direct positional polynomial
    import graft.functions.{MinHashSig, RollingHash, TokenWindowHashes}
    val toks = Array("one", "two", "three", "four", "five", "six")
    val th = toks.map(t => MinHashSig.mix(RollingHash.hashBytes(t.getBytes)))
    val b = 0x100000001b3L
    val direct = (0 to 3).map(p =>
      (0 until 3).foldLeft(0L)((acc, j) => acc * b + th(p + j)))
    assert(cg(1L) == direct)
    val _ = TokenWindowHashes // anchor the import
  }

  test("dsir_buckets: codegen == interpreted == explode+md5+conv chain") {
    val s0 = spark; import s0.implicits._
    import org.apache.spark.sql.functions.{conv, concat_ws, element_at,
      explode, md5, sequence, size, substring, transform}
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "single"),
      (3L, ""),                          // no tokens → no features
      (4L, "naïve café déjà vu"),        // multi-byte UTF-8 digests
      (5L, "a b a b a")                  // repeated features keep multiplicity
    ).toDF("id", "text")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    def sorted(m: Map[Long, Seq[Long]]) = m.map { case (k, v) => k -> v.sorted }
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(col("id"), explode(dsir_buckets(toks, 2)).as("b"))
        .collect().groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
    }
    val cg = sorted(run(true))
    assert(cg == sorted(run(false)))
    // the replaced SQL chain: union of unigram and bigram explodes, each
    // bucketed via conv(substring(md5(f),1,2),16,10) — the oracle's form
    val toked = df.select(col("id"), toks.as("__toks"))
    val uni = toked.select(col("id"), explode(col("__toks")).as("f"))
    val bi = toked.filter(size(col("__toks")) >= 2)
      .select(col("id"), explode(transform(
        sequence(org.apache.spark.sql.functions.lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", element_at(col("__toks"), i),
          element_at(col("__toks"), i + 1)))).as("f"))
    val chain = uni.unionByName(bi)
      .select(col("id"), conv(substring(md5(col("f")), 1, 2), 16, 10)
        .cast("long").as("b"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
    assert(cg == sorted(chain))
    assert(!cg.contains(3L) && cg(2L).size == 1 && cg(1L).size == 7)
    assert(cg(5L).size == 9) // 5 unigrams + 4 bigrams, multiplicity kept
  }

  test("near-identical token sets differ in few simhash bits") {
    val s = spark; import s.implicits._
    val base = (1 to 60).map(i => s"token$i")
    val mutated = base.updated(5, "changed")
    val df = Seq((1L, base), (2L, mutated)).toDF("id", "toks")
    val hs = df.select(col("id"), simhash64(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(SimHash64.hamming(hs(1L), hs(2L)) <= 12) // small edit → few bits
    assert(hs(1L) != hs(2L))
  }

  test("unicode_normalize: codegen == interpreted; composes, folds, rejects") {
    val s = spark
    import s.implicits._
    // decomposed e+combining-acute, composed é, precomposed-only ASCII
    val df = Seq((1L, "café"), (2L, "café"), (3L, "cafe"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(col("id"), unicode_normalize(col("t")).as("n"),
        unicode_normalize(col("t"), stripAccents = true).as("f"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else (r.getString(1), r.getString(2)))).toMap
    }
    val cg = run(true)
    assert(cg == run(false))
    assert(cg(1L) == (("caf\u00e9", "cafe"))) // NFC composes; fold strips
    assert(cg(2L) == (("caf\u00e9", "cafe"))) // both encodings converge
    assert(cg(3L) == (("cafe", "cafe")))
    assert(cg(4L) == null)                    // null-safe
    // NFKC folds compatibility chars (ﬁ ligature → fi)
    val nfkc = Seq((1L, "\uFB01n")).toDF("id", "t")
      .select(unicode_normalize(col("t"), form = "NFKC").as("n"))
      .head().getString(0)
    assert(nfkc == "fin")
    // bad form fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(unicode_normalize(col("t"), form = "NFX")).collect()
    }
  }

  test("fingerprint_norm: codegen == interpreted == the regex chain") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
    // the tricky inputs: unicode one-to-many lowercase (İ), surrogate
    // pairs, non-ASCII whitespace, all-separator, empty, tabs/newlines,
    // digits, leading/trailing runs, null
    val df = Seq(
      (1L, "Hello,  World!!  42"), (2L, "  \t\n mixed WS\r\n"),
      (3L, "!!!???"), (4L, ""), (5L, "İstanbul Σigma"),
      (6L, "emoji 😀 pair"), (7L, "a"), (8L, "7 8\t9"),
      (9L, null.asInstanceOf[String]),
      (10L, "ALL CAPS with-hyphen_under.dot"))
      .toDF("id", "t")
    val regexForm = trim(regexp_replace(
      regexp_replace(lower(col("t")), "[^a-z0-9\\s]", " "), "\\s+", " "))
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(col("id"), fingerprint_norm(col("t")).as("n"),
        regexForm.as("r"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
    }
    val cg = run(true)
    assert(cg == run(false))
    val viaRegex = df.select(col("id"), regexForm.as("r")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(cg == viaRegex, s"single-scan form diverged from the regex chain")
    assert(cg(1L) == "hello world 42" && cg(3L) == "" && cg(9L) == null)
  }

  test("SQL surface: registered functions equal the Column API") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    docsDf.createOrReplaceTempView("sql_docs")
    val viaSql = s.sql(
      """SELECT id, rolling_hash(text) AS h,
        |  simhash64(split(text, ' ')) AS sh,
        |  unicode_normalize(text, 'NFKC', true) AS n
        |FROM sql_docs""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val viaCols = docsDf.select(col("id"), rolling_hash(col("text")).as("h"),
      simhash64(split(col("text"), " ")).as("sh"),
      unicode_normalize(col("text"), "NFKC", stripAccents = true).as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(viaSql == viaCols)
    // registration is idempotent; extension injector applies cleanly
    graft.functions.GraftFunctions.register(s)
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    // arity/type errors surface at analysis, not execution
    intercept[Exception] { s.sql("SELECT rolling_hash()").collect() }
    intercept[Exception] {
      s.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
  }

  test("AhoCorasick: overlapping matches, suffix patterns, distributed counts") {
    import graft.functions.AhoCorasick
    // classic automaton fixture: suffix patterns surface through fail links
    val ac = new AhoCorasick(IndexedSeq("he", "she", "his", "hers"))
    val counts = ac.countMatches("ushers and his herd")
      .zip(Seq("he", "she", "his", "hers")).map(_.swap).toMap
    assert(counts == Map("he" -> 2L, "she" -> 1L, "his" -> 1L, "hers" -> 1L))
    // overlapping occurrences ALL count (AC semantics)
    val aa = new AhoCorasick(IndexedSeq("aa"))
    assert(aa.countMatches("aaaa").head == 3L)
    // no-match text
    assert(new AhoCorasick(IndexedSeq("zz")).countMatches("abc").head == 0L)
    // distributed operator: per-doc counts, zero-match docs absent
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "she sells seashells"), (2L, "plain text"),
      (3L, "hers and his")).toDF("doc_id", "text")
    val out = AhoCorasick.multiPatternCounts(spark, docs,
      Seq("she", "his", "hers"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 1 has "she" twice: the standalone word AND inside "seashells"
    assert(out == Map((1L, "she") -> 2L, (3L, "his") -> 1L,
      (3L, "hers") -> 1L))
  }
}
