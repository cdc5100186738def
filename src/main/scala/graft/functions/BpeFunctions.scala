package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich 2016) —
  * the real-merge upgrade over [[TextFunctions]]' regex token counting.
  *
  * Distributed shape: the corpus is scanned ONCE (word counts); all
  * training state is VOCABULARY-scale (distinct words × their current
  * symbol encoding), the classic word-level BPE reduction. Each merge
  * round costs one vocab-scale pair-count aggregate plus a 1-row argmax
  * collect, and re-encodes the vocab in a typed map — the corpus is never
  * rescanned. Encoding joins document words against the vocab's final
  * encoding, so exchanges carry words, never document text.
  *
  * Determinism contract (what buys the full cross-engine oracle in
  * `q_bpe_train` / `q_bpe_encode`): words are the repo-standard
  * `[a-z0-9]+` tokens, so a SPACE can delimit symbols unambiguously; a
  * word's encoding is `" s1 s2 … "` with boundary spaces; applying a merge
  * (l, r) = replacing `" l r "` with `" lr "` TO FIXPOINT (repeat while
  * present — each replace() pass is the same leftmost non-overlapping scan
  * in the JVM and in DuckDB, and each hit strictly shrinks the string, so
  * the fixpoint is engine-identical); the chosen merge each round is the
  * max pair count with ties broken (left ASC, right ASC).
  */
object BpeFunctions {

  /** One learned merge rule, in application order. */
  final case class Merge(step: Int, left: String, right: String,
                         pairCount: Long) {
    def merged: String = left + right
  }

  /** Initial character-level encoding of a word. */
  def initEncoding(word: String): String =
    " " + word.map(_.toString).mkString(" ") + " "

  /** Apply one merge to an encoding, to fixpoint. */
  def applyMerge(enc: String, left: String, right: String): String = {
    val pat = s" $left $right "
    val rep = s" $left$right "
    var x = enc
    while (x.contains(pat)) x = x.replace(pat, rep)
    x
  }

  /** Encode one word through an ordered merge list. */
  def encodeWord(word: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(initEncoding(word)) { case (e, (l, r)) =>
      applyMerge(e, l, r)
    }

  /** Symbol list of an encoding. */
  def symbols(enc: String): Seq[String] =
    enc.split(" ").toSeq.filter(_.nonEmpty)

  /** Adjacent symbol pairs (with multiplicity) of the `enc` column —
    * shared by training and the PlanSpec guard. */
  private def pairCol(enc: org.apache.spark.sql.Column) = {
    val syms = filter(split(enc, " "), s => length(s) > 0)
    val n = greatest(size(syms) - 1, lit(0))
    explode(arrays_zip(
      slice(syms, lit(1), n).as("l"), slice(syms, lit(2), n).as("r")))
  }

  /** Vocab size at or below which BPE training runs DRIVER-side: the
    * distributed round loop costs ~3 Spark jobs per merge (pair-count
    * argmax, re-encode materialization, plus their plan round-trips —
    * measured ~1.7 s of pure driver latency on an 8-merge train at the
    * 10× bench point) for state that is WORD-VOCABULARY scale, not corpus
    * scale. 2M (word, freq) rows collect as well under 100 MB, and the
    * driver loop reuses the SAME initEncoding/applyMerge/symbols helpers
    * and the same (count DESC, left ASC, right ASC) argmax over ASCII
    * alnum symbols, where JVM and UTF8 string orders agree — merges are
    * bit-identical to the distributed loop (BpeSpec pins both paths).
    * Var so tests can force the distributed path. */
  private[graft] var driverBpeMaxVocab: Long = 2L * 1000 * 1000

  /** Train `numMerges` BPE merges over the corpus' word vocabulary.
    * Returns the merges in application order; stops early if the
    * vocabulary runs out of adjacent pairs. */
  def trainBpe(docs: DataFrame, textCol: String,
               numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"trainBpe needs numMerges >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    if (vocabDf.count() <= driverBpeMaxVocab) {
      val rows = vocabDf.as[(String, Long)].collect()
      val freqs = rows.map(_._2)
      val encs = rows.map(r => initEncoding(r._1))
      val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var step = 1
      var exhausted = false
      while (step <= numMerges && !exhausted) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        var i = 0
        while (i < encs.length) {
          val syms = symbols(encs(i))
          var j = 0
          while (j < syms.length - 1) {
            val key = (syms(j), syms(j + 1))
            counts.update(key, counts.getOrElse(key, 0L) + freqs(i))
            j += 1
          }
          i += 1
        }
        if (counts.isEmpty) exhausted = true
        else {
          var bl: String = null; var br: String = null; var bc = Long.MinValue
          counts.foreach { case ((l, r), c) =>
            val better = c > bc || (c == bc &&
              (l < bl || (l == bl && r < br)))
            if (better) { bl = l; br = r; bc = c }
          }
          out += Merge(step, bl, br, bc)
          var m = 0
          while (m < encs.length) {
            encs(m) = applyMerge(encs(m), bl, br); m += 1
          }
          step += 1
        }
      }
      return out.toSeq
    }
    var vocab: Dataset[(String, Long, String)] = vocabDf
      .as[(String, Long)]
      .map { case (w, f) => (w, f, initEncoding(w)) }
      .persist()
    vocab.count() // materialize before the round loop
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val top = vocab.toDF("w", "freq", "enc")
        .select(col("freq"), pairCol(col("enc")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect().headOption
      top match {
        case None => exhausted = true
        case Some(row) =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          out += Merge(step, l, r, c)
          val prev = vocab
          vocab = prev.map { case (w, f, e) => (w, f, applyMerge(e, l, r)) }
            .persist()
          vocab.count() // materialize the round before dropping its input
          prev.unpersist()
          step += 1
      }
    }
    vocab.unpersist()
    out.toSeq
  }

  /** Learned merges as a DataFrame (the `q_bpe_train` surface). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
               merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.step.toLong, m.left, m.right, m.merged, m.pairCount))
      .toDF("step", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Per-document BPE token counts under an ordered merge list:
    * (idCol, n_words, n_bpe_tokens). The distinct-word set is encoded once
    * (vocab-scale typed map), then joined back to the per-doc words.
    * CONTRACT: documents with zero tokens (empty/punctuation-only text)
    * emit NO row — not (0, 0) — mirrored by the DuckDB oracle's inner
    * join; [[foldBpeTokens]] state inherits the same absence. Join
    * through a left join from your doc set if you need explicit zeros. */
  def encodeBpe(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dw = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
    val vocabEnc = dw.select("w").distinct().as[String]
      .map(w => (w, symbols(encodeWord(w, merges)).length.toLong))
      .toDF("w", "n_syms")
    dw.join(vocabEnc, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
  }

  // --------------------------------------------------------------------
  // Incremental tokenization state (the fold_bpe_tokens post-op)
  // --------------------------------------------------------------------

  /** Fold one increment into persisted tokenization state: the FIRST fold
    * trains `numMerges` BPE merges on its increment and freezes them;
    * every later fold encodes its increment under the frozen merges and
    * APPENDS per-doc token counts — the "pre-tokenize each sync" stage of
    * a training-data pipeline, where the tokenizer must NOT drift between
    * syncs (token counts from different vocabularies don't compare).
    *
    * State is one discriminated relation (the [[graft.functions.
    * CorpusFunctions.foldBm25Index]] convention): kind='m' rows carry the
    * ordered merge table, kind='d' rows the per-doc counts. Same new-docs
    * append-only contract as the BM25 fold (enforced at config parse).
    *
    * Scale: the merge table is tokenizer-scale (collected once per fold —
    * numMerges rows); encoding cost is the increment's vocab, never the
    * corpus; folded doc rows are never recomputed. */
  def foldBpeTokens(prev: Option[DataFrame], increment: DataFrame,
                    idCol: String, textCol: String,
                    numMerges: Int = 8): DataFrame = {
    val spark = increment.sparkSession
    import spark.implicits._
    // "trained" means the state carries a NON-EMPTY merge table: a first
    // sync whose increment was empty (or single-character words only)
    // must not freeze an empty vocabulary forever — keep retraining until
    // an increment actually yields merges
    val prevMerges: Option[Seq[(String, String)]] = prev.map(st =>
      st.filter(col("kind") === "m")
        .select(col("step"), col("left_sym"), col("right_sym"))
        .orderBy(col("step")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    val frozen: Seq[(String, String)] = prevMerges.filter(_.nonEmpty)
      .getOrElse(trainBpe(increment, textCol, numMerges)
        .map(m => (m.left, m.right)))
    def shape(df: DataFrame): DataFrame = df.select(
      col("kind"), col("step").cast("long").as("step"),
      col("left_sym"), col("right_sym"),
      col("doc_id").cast("long").as("doc_id"),
      col("n_words").cast("long").as("n_words"),
      col("n_bpe_tokens").cast("long").as("n_bpe_tokens"))
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val mergeRows = shape(frozen.zipWithIndex
      .map { case ((l, r), i) => ((i + 1).toLong, l, r) }
      .toDF("step", "left_sym", "right_sym")
      .select(lit("m").as("kind"), col("step"), col("left_sym"),
        col("right_sym"), nullL.as("doc_id"), nullL.as("n_words"),
        nullL.as("n_bpe_tokens")))
    val docRows = shape(encodeBpe(increment, idCol, textCol, frozen)
      .select(lit("d").as("kind"), nullL.as("step"),
        nullS.as("left_sym"), nullS.as("right_sym"),
        col(idCol).cast("long").as("doc_id"),
        col("n_words"), col("n_bpe_tokens")))
    prev match {
      case Some(st) if prevMerges.exists(_.nonEmpty) =>
        shape(st).unionByName(docRows)
      case Some(st) => // retrained this fold: install the merge rows too
        shape(st).unionByName(mergeRows).unionByName(docRows)
      case None => mergeRows.unionByName(docRows)
    }
  }

  /** Read back the per-doc token counts from [[foldBpeTokens]] state. */
  def bpeTokensFromState(state: DataFrame): DataFrame =
    state.filter(col("kind") === "d")
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))

  /** Read back the frozen ordered merge table from [[foldBpeTokens]]
    * state. */
  def bpeMergesFromState(state: DataFrame): DataFrame =
    state.filter(col("kind") === "m")
      .select(col("step"), col("left_sym"), col("right_sym"))
}
