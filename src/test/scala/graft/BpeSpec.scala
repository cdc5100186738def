package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BpeFunctions

/** BPE trainer/encoder semantics on planted corpora: exact merge choice,
  * second-order merges, fixpoint-replace behavior on self-adjacent pairs,
  * round-trip, and determinism. */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  private val s0 = spark
  import s0.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("most frequent pair merges first, ties break lexicographically") {
    // "ab" appears 3 times (pair (a,b) weight 3), "cd" twice
    val m = BpeFunctions.trainBpe(
      corpus("ab ab", "ab cd", "cd"), "text", numMerges = 2)
    assert(m.map(x => (x.left, x.right, x.pairCount)) ==
      Seq(("a", "b", 3L), ("c", "d", 2L)))
    // tie: xy and yx both once → (x,y) < (y,x) lexicographically
    val tie = BpeFunctions.trainBpe(corpus("xy yx"), "text", numMerges = 1)
    assert((tie.head.left, tie.head.right) == ("x", "y"))
  }

  test("second-order merge: a merged symbol joins a later pair") {
    // "abc" ×4: round 1 merges (a,b); round 2 must merge (ab, c)
    val m = BpeFunctions.trainBpe(
      corpus("abc abc", "abc abc"), "text", numMerges = 2)
    assert(m(0).merged == "ab")
    assert((m(1).left, m(1).right) == ("ab", "c"))
  }

  test("fixpoint replace handles self-adjacent runs like left-greedy BPE") {
    // aaaa: pair (a,a) weight 3 (multiplicity!); after merging, left-greedy
    // gives [aa, aa]; aaa gives [aa, a]
    val m = BpeFunctions.trainBpe(corpus("aaaa aaa"), "text", numMerges = 1)
    assert((m.head.left, m.head.right, m.head.pairCount) == ("a", "a", 5L))
    assert(BpeFunctions.symbols(
      BpeFunctions.encodeWord("aaaa", Seq(("a", "a")))) == Seq("aa", "aa"))
    assert(BpeFunctions.symbols(
      BpeFunctions.encodeWord("aaa", Seq(("a", "a")))) == Seq("aa", "a"))
  }

  test("encoding round-trips: symbol concatenation equals the word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeFunctions.trainBpe(docs, "text", numMerges = 6)
      .map(m => (m.left, m.right))
    assert(merges.size == 6)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .distinct().as[String].take(200)
    words.foreach { w =>
      val syms = BpeFunctions.symbols(BpeFunctions.encodeWord(w, merges))
      assert(syms.mkString == w, s"round-trip broke for '$w': $syms")
      assert(syms.forall(_.nonEmpty))
    }
  }

  test("encodeBpe counts: words <= bpe tokens <= chars, deterministic rerun") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeFunctions.trainBpe(docs, "text", numMerges = 4)
    val pairs = merges.map(m => (m.left, m.right))
    val enc = BpeFunctions.encodeBpe(docs, "doc_id", "text", pairs)
    val joined = enc.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nw, nb, nc) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("n_chars"))
      assert(nw <= nb, s"fewer tokens than words: $r")
      assert(nb <= nc, s"more tokens than chars: $r")
    }
    // merges with fewer rounds are a strict prefix (training is greedy)
    val merges2 = BpeFunctions.trainBpe(docs, "text", numMerges = 2)
    assert(merges.take(2).map(_.merged) == merges2.map(_.merged))
  }

  test("vocabulary exhaustion stops training early") {
    val m = BpeFunctions.trainBpe(corpus("ab ab"), "text", numMerges = 10)
    // only "ab" exists: merge 1 = (a,b); then no adjacent pairs remain
    assert(m.map(_.merged) == Seq("ab"))
  }

  test("driver-side training equals the distributed round loop") {
    // mixed frequencies, ties, multi-round second-order merges — the
    // shapes every earlier test pins — trained through BOTH physical
    // paths (the driver fast path and the distributed loop it replaced
    // for small vocabularies) must yield identical merge tables
    val c = corpus("low lower lowest low", "new newer newest new new",
      "xy yx ab ab cd", "aaa aaaa aa")
    val saved = BpeFunctions.driverBpeMaxVocab
    val viaDriver =
      try { BpeFunctions.driverBpeMaxVocab = Long.MaxValue
        BpeFunctions.trainBpe(c, "text", numMerges = 6)
      } finally BpeFunctions.driverBpeMaxVocab = saved
    val viaCluster =
      try { BpeFunctions.driverBpeMaxVocab = -1L
        BpeFunctions.trainBpe(c, "text", numMerges = 6)
      } finally BpeFunctions.driverBpeMaxVocab = saved
    assert(viaDriver == viaCluster)
    // exhaustion agrees too
    val exD =
      try { BpeFunctions.driverBpeMaxVocab = Long.MaxValue
        BpeFunctions.trainBpe(corpus("ab ab"), "text", numMerges = 10)
      } finally BpeFunctions.driverBpeMaxVocab = saved
    val exC =
      try { BpeFunctions.driverBpeMaxVocab = -1L
        BpeFunctions.trainBpe(corpus("ab ab"), "text", numMerges = 10)
      } finally BpeFunctions.driverBpeMaxVocab = saved
    assert(exD == exC && exD.map(_.merged) == Seq("ab"))
  }

  test("foldBpeTokens: first fold trains and freezes, later folds append " +
      "under the frozen merges, empty increment no-op") {
    val c1 = Seq((1L, "low lower lowest"), (2L, "new newer"))
      .toDF("doc_id", "text")
    val c2 = Seq((3L, "lowest newest"), (4L, "low new"))
      .toDF("doc_id", "text")
    val st1 = BpeFunctions.foldBpeTokens(None, c1, "doc_id", "text",
      numMerges = 6)
    def merges(st: org.apache.spark.sql.DataFrame) =
      BpeFunctions.bpeMergesFromState(st).orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    val m1 = merges(st1)
    assert(m1.nonEmpty && m1.size <= 6)
    // the trained merges equal direct training on the same chunk
    assert(m1 == BpeFunctions.trainBpe(c1, "text", 6).map(m => (m.left, m.right)))
    val st2 = BpeFunctions.foldBpeTokens(Some(st1), c2, "doc_id", "text")
    assert(merges(st2) == m1, "fold 2 must NOT retrain — merges are frozen")
    // doc rows equal one batch encode of ALL docs under the frozen merges
    def docRows(st: org.apache.spark.sql.DataFrame) =
      BpeFunctions.bpeTokensFromState(st).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = BpeFunctions.encodeBpe(c1.unionByName(c2),
      "doc_id", "text", m1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(docRows(st2) == want)
    // an idle fold changes nothing
    val st3 = BpeFunctions.foldBpeTokens(Some(st2), c1.limit(0),
      "doc_id", "text")
    assert(docRows(st3) == want && merges(st3) == m1)
    // an EMPTY first fold must not freeze an empty vocabulary forever:
    // the next non-empty fold trains (and installs) the merges
    val stE = BpeFunctions.foldBpeTokens(None, c1.limit(0),
      "doc_id", "text", numMerges = 6)
    assert(merges(stE).isEmpty && docRows(stE).isEmpty)
    val stR = BpeFunctions.foldBpeTokens(Some(stE), c1, "doc_id", "text",
      numMerges = 6)
    assert(merges(stR) == m1, "second fold must retrain after an empty start")
    assert(docRows(stR) == BpeFunctions.encodeBpe(c1, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap)
  }
}
