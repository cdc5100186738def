package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * ID, quality scoring, token counting, fingerprinting. All built from
  * codegen'd `org.apache.spark.sql.functions` — narrow projections, no
  * shuffle, embarrassingly parallel at 100 TB.
  */
object TextFunctions {

  /** Lowercase word tokens (alnum runs). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** Simplified GPT-2-style pretokenizer pattern (contractions, space-prefixed
    * letter/digit runs, punctuation runs, whitespace runs). Deliberately
    * lookahead-free so RE2-based engines (DuckDB) match Java regex exactly —
    * the count is verifiable cross-engine. */
  val BpePretokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** BPE-ish token count: pretokenizer matches as a cheap, codegen'd proxy
    * for subword token counts at corpus scale (real BPE needs the merges
    * table; the pretokenizer bounds it and is tokenizer-family-stable). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePretokenPattern))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the usual pre-tokenizer regex
    * families used by BPE vocabularies). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Per-language marker-word counts for the n-gram/stopword language-ID
    * heuristic. Deterministic and oracle-reproducible (pure regexp counts). */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in|that|for|with|on)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|en|un|una|por)\\b",
    "fr" -> "\\b(le|la|les|des|une|est|et|dans|pour|sur)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|eine|mit|für|auf)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langScore(text: Column, lang: String): Column = {
    val pattern = langMarkers.toMap.apply(lang)
    regexp_count(lower(text), lit(pattern))
  }

  /** Heuristic language ID: argmax of marker-word hit counts; "und"
    * (undetermined) when nothing matches. Ties break in `langMarkers` order. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, _) => lang -> langScore(text, lang) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // wrap in reverse so the FIRST language in langMarkers order is the
    // outermost `when` → first-wins tie-break
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Punctuation character ratio (punct chars / total chars). Integer counts
    * divided once — bitwise-deterministic across engines. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
        length(text).cast("double"))

  /** English stopword ratio over word tokens. */
  def stopwordRatio(text: Column): Column = {
    val words = wordCount(text)
    when(words === 0, lit(0.0))
      .otherwise(langScore(text, "en").cast("double") / words.cast("double"))
  }

  /** Mean word length. */
  def meanWordLength(text: Column): Column = {
    val words = wordCount(text)
    when(words === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[A-Za-z0-9]")).cast("double") /
        words.cast("double"))
  }

  /** Composite document-quality score in [0,1]: the standard pre-training
    * filter signals (length band, punctuation sanity, stopword presence,
    * word-length sanity) — cf. Gopher/C4-style quality rules. Each signal is
    * a deterministic 0/1 gate; score = mean of gates. */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val gates = Seq(
      (len >= 50 && len <= 100000).cast("int"),        // length band
      (punctRatio(text) <= 0.3).cast("int"),            // not symbol soup
      (stopwordRatio(text) >= 0.01).cast("int"),        // has function words
      (meanWordLength(text) >= 2 && meanWordLength(text) <= 12).cast("int"))
    gates.reduce(_ + _).cast("double") / lit(gates.size.toDouble)
  }

  /** PII patterns, deliberately lookaround-free so Java regex and RE2
    * (DuckDB) match identically — each rule is (pattern, replacement
    * placeholder). Order matters: emails first (they contain digits and
    * dots), then SSNs (3-2-4 shape) before phones (3-3-4 shape) so neither
    * rule half-consumes the other's match, IPv4 last (a 3-group phone can
    * never satisfy the 4-octet shape).
    * Ref patterns: the usual scrubbing rules of web-corpus pipelines
    * (C4/Dolma-style email/phone/IP masking). */
  val PiiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** Redact emails, SSNs, phone numbers, and IPv4 addresses with typed
    * placeholders — the pre-training scrub pass. A chain of codegen'd
    * `regexp_replace` calls: narrow projection, no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Per-rule PII hit counts (audit/reporting side of the scrub). Counts are
    * computed on the PROGRESSIVELY redacted text exactly as [[redactPii]]
    * consumes it, so overlapping rules never double-count one span. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val (counts, _) = PiiRules.foldLeft(
      (Seq.empty[(String, Column)], text)) {
      case ((acc, t), (pat, repl)) =>
        val name = repl.stripPrefix("<").stripSuffix(">").toLowerCase
        (acc :+ (s"n_$name" -> regexp_count(t, lit(pat))),
          regexp_replace(t, pat, repl))
    }
    counts
  }

  /** Normalized text for fingerprinting: lowercase, collapse whitespace,
    * strip punctuation — so near-identical docs collide. Computed by the
    * single-scan codegen expression [[graft.functions.FingerprintNorm]]
    * (value-identical to the former
    * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\\s]", " "),
    * "\\s+", " "))` chain, which cost two Java-regex passes per document —
    * the dominant cpu of every fingerprint consumer at the 100× bench
    * point; the DuckDB oracles keep replaying the regex SQL). */
  def normalizedText(text: Column): Column =
    graft.functions.exprs.fingerprint_norm(text.cast("string"))

  /** Content fingerprint: md5 of normalized text (exact-dup key; DuckDB-
    * reproducible). For the 64-bit rolling-hash variant see
    * [[graft.functions.rollingHash]] (custom Catalyst expression). */
  def fingerprintMd5(text: Column): Column = md5(normalizedText(text).cast("binary"))

  /** Gopher rule-based quality report (Rae et al. 2021, Appendix A) — the
    * canonical pre-LM filter battery as one per-doc relation: whitespace
    * word count bounds, mean word length bounds, symbol-to-word ratio
    * (# and ellipses), the fraction of words carrying at least one
    * alphabetic character, bullet-started and ellipsis-ended line
    * fractions, and a minimum count of distinct common stop words. Every
    * measure is an exact integer count or an IEEE quotient of two — the
    * whole report (and the `pass` verdict) replays cross-engine.
    *
    * Scale: a pure rowwise projection (split + array folds, all codegen'd
    * — no UDF, no shuffle); thresholds ride as literals. Compose with
    * `.filter(col("pass"))` for the filter itself. */
  def gopherQualityReport(docs: DataFrame, idCol: String,
                          textCol: String,
                          minWords: Int = 50, maxWords: Int = 100000,
                          minMeanWordLen: Double = 3.0,
                          maxMeanWordLen: Double = 10.0,
                          maxSymbolRatio: Double = 0.1,
                          minAlphaFrac: Double = 0.8,
                          maxBulletFrac: Double = 0.9,
                          maxEllipsisFrac: Double = 0.3,
                          minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w))
    // symbol occurrences: '#' chars + non-overlapping '...' + '…' chars
    val nSymbols = (length(t) - length(regexp_replace(t, "#", ""))).cast("long") +
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long") +
      (length(t) - length(regexp_replace(t, "…", ""))).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
        ltrim(l).startsWith("•"))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("long")
    val toks = tokens(t)
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stops.map(s =>
      when(array_contains(toks, s), 1L).otherwise(0L)).reduce(_ + _)
    // empty docs: NULL ratios (matching SQL's x/NULLIF(n,0)), and `pass`
    // still resolves FALSE through the n_words bound (3VL short-circuit)
    def over(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(null).cast("double"))
    val meanLen = over(sumLen, nWords)
    val symRatio = over(nSymbols, nWords)
    val alphaFrac = over(nAlpha, nWords)
    val bulletFrac = over(nBullet, nLines)
    val ellipsisFrac = over(nEllipsis, nLines)
    docs.select(col(idCol), nWords.as("n_words"),
        meanLen.as("mean_word_len"), symRatio.as("symbol_ratio"),
        alphaFrac.as("alpha_frac"), stopHits.as("stop_hits"),
        bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"))
      .withColumn("pass",
        // coalesce: a NULL text makes every measure NULL and the whole
        // conjunction NULL — the verdict must still be a firm FALSE
        // (3VL NULL vanishes from both .filter(pass) and .filter(!pass))
        coalesce(
          col("n_words") >= minWords && col("n_words") <= maxWords &&
            col("mean_word_len") >= minMeanWordLen &&
            col("mean_word_len") <= maxMeanWordLen &&
            col("symbol_ratio") <= maxSymbolRatio &&
            col("alpha_frac") >= minAlphaFrac &&
            col("bullet_frac") <= maxBulletFrac &&
            col("ellipsis_frac") <= maxEllipsisFrac &&
            col("stop_hits") >= minStopHits, lit(false)))
  }

  /** C4-style line-level cleanup (Raffel et al. 2020, §2.2) — the other
    * canonical pre-LM filter next to [[gopherQualityReport]]'s doc-level
    * battery, operating a level DOWN: each line of a page is retained only
    * if it ends in terminal punctuation (. ! ? "), carries at least
    * `minWordsPerLine` whitespace words, and does not mention "javascript";
    * the PAGE is then kept only if the RETAINED text carries at least
    * `minSentences` sentence-terminal marks (. ! ?) — C4's "at least three
    * sentences" gate counted on the retained text itself, so a retained
    * line holding several sentences contributes all of them, not one —
    * and the raw text contains neither "lorem ipsum" nor a '{' (code
    * leakage). Emits
    * per-doc counts, the verdict, and the cleaned text (NULL for dropped
    * pages) — compose with `.filter(col("kept_doc"))` for the filter.
    *
    * Scale: pure rowwise projection — split + array-HOF folds, thresholds
    * as literals, no UDF, no shuffle; embarrassingly parallel at 100 TB.
    * The line predicate is deliberately lookaround-free so the whole pass
    * (including the regex) replays in RE2-based engines. */
  def c4Clean(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text",
              minWordsPerLine: Int = 5,
              minSentences: Int = 3): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine $minWordsPerLine < 1")
    require(minSentences >= 1, s"minSentences $minSentences < 1")
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0))
          >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val keptDoc = coalesce(
      regexp_count(array_join(kept, "\n"), lit("[.!?]")) >= minSentences &&
        !lower(t).contains("lorem ipsum") &&
        !t.contains("{"), lit(false))
    docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      keptDoc.as("kept_doc"),
      when(keptDoc, array_join(kept, "\n")).as("text_clean"))
  }

  /** Full text-analysis projection over a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("*"),
      langId(t).as("lang_pred"),
      wordCount(t).as("word_cnt"),
      bpeishTokenCount(t).as("bpeish_tokens"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      fingerprintMd5(t).as("fingerprint"))
  }
}
