package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{BpeFunctions, DedupFunctions, LearnFunctions, TextFunctions, VectorFunctions}

/** Driver-contract queries for the LLM-training-data operators (dedup,
  * similarity search, text analysis) over the `documents` / `embeddings`
  * fixtures. Where the operator is deterministic + SQL-expressible the oracle
  * is exact DuckDB SQL; approximate/hash-seeded operators (SimHash, IVF) get
  * rows-only driver checks plus ScalaTest invariants.
  */
object LlmQueries {

  /** DuckDB replay of [[graft.functions.BpeFunctions.trainBpe]]: character
    * vocab `v0`, then per merge round t — pair counts `pc{t}` (cross-join
    * position series, vocab-scale), argmax `m{t}` (count DESC, l, r),
    * recursive fixpoint re-encode `r{t}` (every replace pass strictly
    * shrinks the encoding, so min-length per word IS the fixpoint `v{t}`).
    * MATERIALIZED on each non-recursive stage — without it every stage
    * re-opens the parquet scan. */
  private def bpeOraclePrefix(k: Int): String = {
    def stage(t: Int): String =
      s"""pc$t AS MATERIALIZED (
         |  SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq) AS c
         |  FROM (SELECT freq, list_filter(string_split(enc, ' '),
         |          s -> len(s) > 0) AS syms FROM v${t - 1}),
         |       (SELECT unnest(generate_series(1, 60)) AS i)
         |  WHERE i <= len(syms) - 1
         |  GROUP BY 1, 2),
         |m$t AS MATERIALIZED (SELECT l, r, l || r AS lr, c FROM pc$t
         |  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |r$t(w, freq, enc) AS (
         |  SELECT w, freq, enc FROM v${t - 1}
         |  UNION
         |  SELECT w, freq, replace(enc,
         |      (SELECT ' '||l||' '||r||' ' FROM m$t),
         |      (SELECT ' '||lr||' ' FROM m$t))
         |  FROM r$t
         |  WHERE enc != replace(enc,
         |      (SELECT ' '||l||' '||r||' ' FROM m$t),
         |      (SELECT ' '||lr||' ' FROM m$t))),
         |v$t AS MATERIALIZED (
         |  SELECT w, freq, enc FROM (
         |    SELECT w, freq, enc, ROW_NUMBER() OVER (
         |      PARTITION BY w ORDER BY len(enc) ASC) AS rn FROM r$t)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH RECURSIVE v0 AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS freq,
       |    ' ' || array_to_string(list_transform(generate_series(1, len(w)),
       |        i -> w[i]), ' ') || ' ' AS enc
       |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
       |          '[^a-z0-9]+'), x -> len(x) > 0)) AS w FROM documents)
       |  GROUP BY w),
       |""".stripMargin + (1 to k).map(stage).mkString(",\n")
  }

  /** Probe queries shared by the BM25 / hybrid-retrieval queries. */
  private val bm25Probes: Seq[(Long, String)] = Seq(
    (0L, "spark join merge"), (1L, "vector scan filter"),
    (2L, "window agg stream"))

  /** Batch Okapi BM25 oracle over [[bm25Probes]] — shared verbatim by
    * `q_bm25_topk` AND `q_bm25_incremental`: the folded inverted index must
    * score exactly like rescoring the whole corpus. */
  private lazy val bm25OracleSql: String =
    s"""WITH q(query_id, qtext) AS (VALUES
       |    (0, 'spark join merge'), (1, 'vector scan filter'),
       |    (2, 'window agg stream')),
       |qt AS (SELECT query_id, unnest(list_distinct(
       |    list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'),
       |                t -> len(t) > 0))) AS term FROM q),
       |tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       |       FROM tok GROUP BY doc_id),
       |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) /
       |    (SELECT COUNT(*) FROM documents) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM tok WHERE term IN (SELECT DISTINCT term FROM qt)
       |       GROUP BY doc_id, term),
       |sc AS (SELECT doc_id, term, tf,
       |         CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) AS df
       |       FROM tf),
       |con AS (SELECT qt.query_id, sc.doc_id,
       |    CAST(round(
       |      ln(1.0 + ((SELECT COUNT(*) FROM documents) - df + 0.5)
       |               / (df + 0.5))
       |      * (tf * (1.2 + 1.0))
       |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
       |      6) AS DECIMAL(18,6)) AS contrib
       |  FROM sc JOIN qt USING (term) JOIN dl USING (doc_id), stats),
       |agg AS (SELECT query_id, doc_id, SUM(contrib) AS score_dec,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
       |       FROM con GROUP BY 1, 2),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY score_dec DESC, doc_id) AS rank FROM agg)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  CAST(score_dec AS DOUBLE) AS score, n_terms_hit,
       |  CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** DuckDB equivalent of [[TextFunctions.normalizedText]]. */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |'\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  /** DuckDB token list matching [[TextFunctions.tokens]]. */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** DuckDB 3-gram shingle set matching [[DedupFunctions.shingles]](n=3). */
  private val shinglesSql =
    s"""CASE WHEN len(toks) >= 3 THEN list_distinct(
       |  list_transform(generate_series(1, len(toks) - 2),
       |    i -> array_to_string(toks[i:i+2], ' ')))
       |ELSE [array_to_string(toks, ' ')] END""".stripMargin

  /** Shared oracle for both decontamination plans (broadcast and Bloom). */
  private val decontOracleSql =
    s"""WITH sh AS (
       |  SELECT doc_id, $shinglesSql AS s
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
       |  WHERE len(toks) > 0),
       |bench AS (
       |  SELECT list_distinct(flatten(list(s))) AS bs
       |  FROM sh WHERE doc_id % 7 = 0)
       |SELECT sh.doc_id, len(sh.s) AS n_shingles,
       |  len(list_intersect(sh.s, b.bs)) AS n_hits,
       |  len(list_intersect(sh.s, b.bs)) * 1.0 / len(sh.s) AS overlap
       |FROM sh CROSS JOIN bench b""".stripMargin

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------ exact dedup groups
    Q("q_dedup_exact_groups",
      (s, dir) => DedupFunctions.exactDuplicateGroups(
        Tables.df(s, dir, "documents"), "doc_id", "text"),
      Some(s"""SELECT md5($normSql) AS fingerprint, MIN(doc_id) AS keep_id,
             |  COUNT(*) AS dup_count
             |FROM documents GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------- exact dedup drop
    Q("q_dedup_drop_exact",
      (s, dir) => DedupFunctions.dropExactDuplicates(
        Tables.df(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""WITH keep AS (
             |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5($normSql))
             |SELECT d.doc_id, d.lang, d.source FROM documents d
             |JOIN keep USING (doc_id)""".stripMargin)),

    // ------------------------------------------------ BPE-ish token count
    // Same lookahead-free pretokenizer pattern on both engines (Java regex ==
    // RE2 on this subset) → exact count parity.
    Q("q_token_count",
      (s, dir) => Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.wordCount(col("text")).as("word_count"),
          TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens")),
      Some("""SELECT doc_id,
             |  len(list_filter(string_split_regex(text, '\s+'),
             |      t -> len(t) > 0)) AS word_count,
             |  len(regexp_extract_all(text,
             |      '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
             |    AS bpe_tokens
             |FROM documents""".stripMargin)),

    // ----------------------------- REAL BPE training + encoding (full
    // oracle). Word-level BPE: the training state is vocabulary-scale, and
    // every step is a pure function of the corpus — pair argmax with
    // (count DESC, left, right) tiebreak, then ` l r ` → ` lr ` string
    // replace TO FIXPOINT (replace() is the same leftmost non-overlapping
    // scan in the JVM and DuckDB, and every hit shrinks the string, so the
    // fixpoint is engine-identical). The oracle unrolls the 8 merge rounds
    // as chained CTE stages, each with a recursive fixpoint re-encode —
    // merges INCLUDING second-order ones (a merged symbol joining a later
    // pair) replay exactly.
    Q("q_bpe_train",
      (s, dir) => BpeFunctions.mergesDf(s, BpeFunctions.trainBpe(
        Tables.df(s, dir, "documents"), "text", numMerges = 8)),
      Some(bpeOraclePrefix(8) + "\n" +
        (1 to 8).map(t =>
          s"SELECT CAST($t AS BIGINT) AS step, l AS left_sym, " +
            s"r AS right_sym, lr AS merged, CAST(c AS BIGINT) AS pair_count " +
            s"FROM m$t").mkString("\nUNION ALL "))),

    Q("q_bpe_encode",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val merges = BpeFunctions.trainBpe(docs, "text", numMerges = 8)
        BpeFunctions.encodeBpe(docs, "doc_id", "text",
          merges.map(m => (m.left, m.right)))
      },
      Some(bpeOraclePrefix(8) + s""",
           |dw AS (SELECT doc_id, unnest($toksSql) AS w FROM documents)
           |SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(len(list_filter(string_split(v.enc, ' '),
           |      s -> len(s) > 0))) AS BIGINT) AS n_bpe_tokens
           |FROM dw JOIN v8 v ON v.w = dw.w
           |GROUP BY dw.doc_id""".stripMargin)),

    // --------------------------------------------- deterministic split
    // Same md5-prefix rule on both engines → identical assignment; 0.8 of
    // 2^32 rounds to 0xcccccccd (hardcoded in the oracle).
    Q("q_split_train_val",
      (s, dir) => graft.operators.Relational.deterministicSplit(
        Tables.df(s, dir, "documents"), "doc_id", trainFraction = 0.8)
        .select(col("doc_id"), col("split")),
      Some("""SELECT doc_id,
             |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             |            < 'cccccccd'
             |       THEN 'train' ELSE 'validation' END AS split
             |FROM documents""".stripMargin)),

    // -------------------------------------------- stratified corpus sampling
    // Per-source deterministic rates (corpus mixing). Same md5-prefix rule on
    // both engines; thresholds: 0.5→'80000000', 0.25→'40000000',
    // default 0.6→'9999999a' (round(r·2^32) in fixed-width hex).
    Q("q_sample_stratified",
      (s, dir) => graft.functions.CorpusFunctions.sampleByGroup(
        Tables.df(s, dir, "documents"), "doc_id", "source",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.6)
        .select(col("doc_id"), col("source"), col("lang")),
      Some("""SELECT doc_id, source, lang FROM documents
             |WHERE CASE source
             |  WHEN 'src0' THEN TRUE
             |  WHEN 'src1' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             |                   < '80000000'
             |  WHEN 'src2' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             |                   < '40000000'
             |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '9999999a'
             |END""".stripMargin)),

    // ------------------------------------- temperature mixture sampling
    // mT5-style rebalance at T=2: the smallest source is kept whole, a
    // source n times larger keeps (1/n)^(1-1/T) of its docs. The oracle
    // recomputes the per-source rates (POWER over the count aggregate) and
    // replays the md5-threshold membership rule.
    Q("q_sample_temperature",
      (s, dir) => graft.functions.CorpusFunctions.temperatureSample(
        Tables.df(s, dir, "documents"), "doc_id", "source",
        temperature = 2.0)
        .select(col("doc_id"), col("source"), col("lang")),
      Some("""WITH c AS (SELECT source, COUNT(*) AS n FROM documents
             |          GROUP BY source),
             |r AS (SELECT source,
             |        POWER((SELECT MIN(n) FROM c) / CAST(n AS DOUBLE),
             |              0.5) AS rate
             |      FROM c)
             |SELECT d.doc_id, d.source, d.lang
             |FROM documents d JOIN r USING (source)
             |WHERE rate >= 1.0
             |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
             |      < printf('%08x',
             |          CAST(round(rate * 4294967296) AS BIGINT))""".stripMargin)),

    // --------------------- weighted sampling without replacement (ES race)
    // Per language, 20 docs win the exponential race −ln(u)/n_chars —
    // inclusion odds proportional to length. u is the md5 32-bit prefix
    // shifted into (0,1) exactly; 4-decimal key rounding + id tiebreak
    // make the whole race replay.
    Q("q_weighted_sample",
      (s, dir) => graft.functions.CorpusFunctions.weightedSampleByGroup(
        Tables.df(s, dir, "documents"), "doc_id", "n_chars",
        groupCols = Seq("lang"), n = 20)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE n_chars > 0
             |QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
             |  ORDER BY round(-ln((CAST(('0x' ||
             |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             |      + 0.5) / 4294967296.0)
             |    / CAST(n_chars AS DOUBLE), 4), doc_id) <= 20"""
        .stripMargin)),

    // ----------------------------------------- corpus data card
    // The dataset-release report as one tall (metric, value) relation:
    // sizes, token mass, exact-dup fraction, language mixture — every
    // value a count or an IEEE quotient of exact counts.
    Q("q_data_card",
      (s, dir) => graft.functions.CorpusFunctions.dataCard(
        Tables.df(s, dir, "documents"), "text", "lang"),
      Some(s"""WITH t AS (SELECT lang,
             |    CAST(len($toksSql) AS BIGINT) AS nt, md5(text) AS f
             |  FROM documents),
             |st AS (SELECT COUNT(*) AS n, SUM(nt) AS tok,
             |         COUNT(f) AS ntext, COUNT(DISTINCT f) AS dis FROM t),
             |l AS (SELECT lang, COUNT(*) AS c FROM t
             |      WHERE lang IS NOT NULL GROUP BY lang)
             |SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM st
             |UNION ALL SELECT 'n_tokens', CAST(tok AS DOUBLE) FROM st
             |UNION ALL SELECT 'n_null_texts', CAST(n - ntext AS DOUBLE) FROM st
             |UNION ALL SELECT 'n_distinct_texts', CAST(dis AS DOUBLE) FROM st
             |UNION ALL SELECT 'dup_doc_frac',
             |  CASE WHEN ntext = 0 THEN 0.0
             |       ELSE CAST(ntext - dis AS DOUBLE) / ntext END FROM st
             |UNION ALL SELECT 'mean_tokens', CAST(tok AS DOUBLE) / n FROM st
             |UNION ALL SELECT 'n_null_group',
             |  CAST(n - (SELECT COALESCE(SUM(c), 0) FROM l) AS DOUBLE) FROM st
             |UNION ALL SELECT 'share_' || lang,
             |  CAST(c AS DOUBLE) / (SELECT n FROM st) FROM l"""
        .stripMargin)),

    // ---------------------- length-grouped batch layout (group_by_length)
    // Pad-minimizing training batches: md5 deal into 8 shards, sort by
    // (n_chars desc, id) within each, chop into 16-row batches. Every
    // address replays in DuckDB.
    Q("q_length_batches",
      (s, dir) => graft.functions.CorpusFunctions.lengthGroupedBatches(
        Tables.df(s, dir, "documents"), "doc_id", "n_chars",
        shards = 8, batchSize = 16),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST((CAST(('0x' ||
             |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             |      % 8) AS INT) AS shard,
             |    CAST(n_chars AS BIGINT) AS n_tokens
             |  FROM documents
             |  WHERE n_chars >= 0 AND doc_id IS NOT NULL),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
             |        ORDER BY n_tokens DESC, doc_id ASC) AS rn FROM b)
             |SELECT doc_id, shard, CAST((rn - 1) // 16 AS INT) AS batch,
             |  CAST((rn - 1) % 16 AS INT) AS pos, n_tokens
             |FROM r""".stripMargin)),

    // ------------------------------ preference pairs (DPO/RLHF data prep)
    // Per language: i-th best n_chars paired with i-th worst as
    // (chosen, rejected), gap >= 10, 20 pairs max. Deterministic (score,
    // id) ordering on both ends makes the pairing replay exactly.
    Q("q_preference_pairs",
      (s, dir) => graft.functions.CorpusFunctions.preferencePairs(
        Tables.df(s, dir, "documents"), "lang", "doc_id", "n_chars",
        gapMin = 10.0, maxPerGroup = 20),
      Some("""WITH b AS (SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS s
             |           FROM documents WHERE n_chars IS NOT NULL),
             |t AS (SELECT lang, doc_id AS chosen_id, s AS chosen_score,
             |        ROW_NUMBER() OVER (PARTITION BY lang
             |          ORDER BY s DESC, doc_id ASC) AS i FROM b),
             |r AS (SELECT lang, doc_id AS rejected_id, s AS rejected_score,
             |        ROW_NUMBER() OVER (PARTITION BY lang
             |          ORDER BY s ASC, doc_id DESC) AS i FROM b)
             |SELECT t.lang, CAST(t.i AS INT) AS pair_rank,
             |  chosen_id, rejected_id, chosen_score, rejected_score
             |FROM t JOIN r ON t.lang = r.lang AND t.i = r.i
             |WHERE t.i <= 20 AND chosen_id <> rejected_id
             |  AND chosen_score - rejected_score >= 10
             |  AND chosen_score > rejected_score""".stripMargin)),

    // ------------------------------- explicit-target mixture rebalance
    // Downsample documents to a 5:2:2:1 en/es/fr/zh mixture (de has no
    // weight → dropped). All quotas are exact integer arithmetic
    // (T = min_g floor(n_g·ΣW/w_g), keep_g = floor(w_g·T/ΣW)) and the
    // per-group pick order is md5(doc_id), so the oracle replays the
    // entire selection including the admission thresholds.
    Q("q_mixture_rebalance",
      (s, dir) => graft.functions.CorpusFunctions.rebalanceToMixture(
        Tables.df(s, dir, "documents"), "lang",
        weights = Seq("en" -> 5L, "es" -> 2L, "fr" -> 2L, "zh" -> 1L),
        idCol = "doc_id")
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""WITH wts(lang, w) AS (VALUES ('en', 5), ('es', 2),
             |                             ('fr', 2), ('zh', 1)),
             |counts AS (SELECT lang, COUNT(*) AS n FROM documents
             |           GROUP BY lang),
             |feas AS (SELECT c.lang, w.w, (c.n * 10) // w.w AS cap
             |         FROM counts c JOIN wts w USING (lang)),
             |quota AS (SELECT lang, (w * (SELECT MIN(cap) FROM feas)) // 10
             |            AS keep
             |          FROM feas),
             |ranked AS (
             |  SELECT d.doc_id, d.lang, q.keep,
             |    ROW_NUMBER() OVER (PARTITION BY d.lang
             |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
             |  FROM documents d JOIN quota q USING (lang)
             |  WHERE q.keep > 0)
             |SELECT d.doc_id, d.lang, d.source
             |FROM documents d
             |JOIN ranked r ON d.doc_id = r.doc_id
             |WHERE r.rn <= r.keep""".stripMargin)),

    // ---------------------------------------------- token-budget selection
    // Greedy per-source quota fill in deterministic (doc_id) order; integer
    // running sum → exact cross-engine parity.
    Q("q_token_budget",
      (s, dir) => graft.functions.CorpusFunctions.selectWithinTokenBudget(
        Tables.df(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.wordCount(col("text")).as("word_count")),
        "source", col("word_count"), "doc_id", budget = 2000L)
        .withColumn("cum_tokens", col("cum_tokens").cast("long")),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |        t -> len(t) > 0)) AS word_count
             |  FROM documents),
             |c AS (
             |  SELECT *, CAST(SUM(word_count) OVER (
             |      PARTITION BY source ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM t)
             |SELECT doc_id, source, word_count, cum_tokens
             |FROM c WHERE cum_tokens <= 2000""".stripMargin)),

    // ---------------------------------------------- benchmark decontamination
    // Shingle-overlap of every doc against a benchmark set (docs ≡ 0 mod 7
    // stand in for the eval corpus). Oracle recomputes the same 3-gram
    // overlap with list_intersect against the flattened benchmark list.
    Q("q_decontaminate",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        graft.functions.CorpusFunctions.contaminationScores(
          docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      },
      Some(decontOracleSql)),

    // ----------------------- BM25 + pseudo-relevance feedback (RM3-style)
    // Pass 1 retrieves 5 feedback docs per probe query; the 3 most
    // frequent non-query terms of those docs expand the query at weight
    // 0.5 (binary-exact); pass 2 rescores. Every stage — feedback ranks,
    // expansion pick, weighted contributions — replays in the oracle.
    Q("q_bm25_prf",
      (s, dir) => graft.functions.CorpusFunctions.bm25PrfTopK(
        Tables.df(s, dir, "documents"), "doc_id", "text",
        bm25Probes, k = 10),
      Some(s"""WITH q(query_id, qtext) AS (VALUES
             |    (0, 'spark join merge'), (1, 'vector scan filter'),
             |    (2, 'window agg stream')),
             |qt AS (SELECT query_id, unnest(list_distinct(
             |    list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'),
             |                t -> len(t) > 0))) AS term FROM q),
             |tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
             |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
             |       FROM tok GROUP BY doc_id),
             |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) /
             |    (SELECT COUNT(*) FROM documents) AS avgdl FROM dl),
             |tf1 AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |        FROM tok WHERE term IN (SELECT DISTINCT term FROM qt)
             |        GROUP BY doc_id, term),
             |sc1 AS (SELECT doc_id, term, tf,
             |          CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) AS df
             |        FROM tf1),
             |con1 AS (SELECT qt.query_id, sc1.doc_id,
             |    CAST(round(
             |      ln(1.0 + ((SELECT COUNT(*) FROM documents) - df + 0.5)
             |               / (df + 0.5))
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
             |      6) AS DECIMAL(18,6)) AS contrib
             |  FROM sc1 JOIN qt USING (term) JOIN dl USING (doc_id), stats),
             |agg1 AS (SELECT query_id, doc_id, SUM(contrib) AS s
             |         FROM con1 GROUP BY 1, 2),
             |fb AS (SELECT query_id, doc_id FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY s DESC, doc_id) AS rn FROM agg1) WHERE rn <= 5),
             |cand AS (SELECT f.query_id, t.term,
             |           CAST(COUNT(*) AS BIGINT) AS s
             |         FROM fb f JOIN tok t ON t.doc_id = f.doc_id
             |         LEFT JOIN qt q2 ON q2.query_id = f.query_id
             |           AND q2.term = t.term
             |         WHERE q2.term IS NULL
             |         GROUP BY 1, 2),
             |exp AS (SELECT query_id, term FROM (
             |    SELECT query_id, term, ROW_NUMBER() OVER (
             |      PARTITION BY query_id ORDER BY s DESC, term) AS rn
             |    FROM cand) WHERE rn <= 3),
             |wt AS (SELECT query_id, term, 1.0 AS w FROM qt
             |       UNION ALL SELECT query_id, term, 0.5 AS w FROM exp),
             |tf2 AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |        FROM tok WHERE term IN (SELECT DISTINCT term FROM wt)
             |        GROUP BY doc_id, term),
             |sc2 AS (SELECT doc_id, term, tf,
             |          CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) AS df
             |        FROM tf2),
             |con2 AS (SELECT wt.query_id, sc2.doc_id,
             |    CAST(round(
             |      wt.w
             |      * ln(1.0 + ((SELECT COUNT(*) FROM documents) - df + 0.5)
             |               / (df + 0.5))
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
             |      6) AS DECIMAL(18,6)) AS contrib
             |  FROM sc2 JOIN wt USING (term) JOIN dl USING (doc_id), stats),
             |agg2 AS (SELECT query_id, doc_id, SUM(contrib) AS score_dec,
             |          CAST(COUNT(*) AS BIGINT) AS n_terms_hit
             |        FROM con2 GROUP BY 1, 2),
             |r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |         ORDER BY score_dec DESC, doc_id) AS rank FROM agg2)
             |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             |  CAST(score_dec AS DOUBLE) AS score, n_terms_hit,
             |  CAST(rank AS BIGINT) AS rank
             |FROM r2 WHERE rank <= 10""".stripMargin)),

    // -------------------------------------- annotation majority vote
    // Events as an annotation table: item = event_id mod 499, rater =
    // user, label = event_type. Per item: majority label with distinct-
    // rater tallies, lexicographic tie-break, agreement fraction.
    Q("q_rating_majority",
      (s, dir) => graft.functions.CorpusFunctions.majorityVote(
        Tables.df(s, dir, "events")
          .select((col("event_id") % 499).as("item_id"), col("user_id"),
            col("event_type")),
        "item_id", "user_id", "event_type"),
      Some("""WITH v AS (
             |  SELECT DISTINCT event_id % 499 AS item_id, user_id,
             |    event_type AS l
             |  FROM events WHERE event_type IS NOT NULL),
             |t AS (SELECT item_id, l,
             |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nv
             |      FROM v GROUP BY 1, 2),
             |r AS (SELECT item_id,
             |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_raters,
             |        CAST(COUNT(DISTINCT l) AS BIGINT) AS n_labels
             |      FROM v GROUP BY 1),
             |m AS (SELECT item_id, l, nv, ROW_NUMBER() OVER (
             |        PARTITION BY item_id ORDER BY nv DESC, l ASC) AS rn
             |      FROM t)
             |SELECT m.item_id, r.n_raters, r.n_labels,
             |  m.l AS majority_label, m.nv AS majority_votes,
             |  CAST(m.nv AS DOUBLE) / CAST(r.n_raters AS DOUBLE)
             |    AS agreement
             |FROM m JOIN r USING (item_id) WHERE m.rn = 1""".stripMargin)),

    // --------------------------------- Krippendorff's alpha (reliability)
    // Same annotation mapping as q_rating_majority. One value per
    // (item, rater) = min non-null label; items with <2 ratings excluded;
    // D_obs 9-decimal-rounded per item, exact integer D_exp.
    Q("q_krippendorff_alpha",
      (s, dir) => graft.functions.CorpusFunctions.krippendorffAlpha(
        Tables.df(s, dir, "events")
          .select((col("event_id") % 499).as("item_id"), col("user_id"),
            col("event_type")),
        "item_id", "user_id", "event_type"),
      Some("""WITH vals AS (
             |  SELECT event_id % 499 AS i, user_id AS r, MIN(event_type) AS l
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |per AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i
             |        FROM vals GROUP BY 1 HAVING COUNT(*) >= 2),
             |nic AS (SELECT v.i, p.n_i, v.l, CAST(COUNT(*) AS BIGINT) AS n_ic
             |        FROM vals v JOIN per p USING (i) GROUP BY 1, 2, 3),
             |co AS (SELECT i, n_i,
             |         CAST(round(CAST(SUM(n_ic * (n_i - n_ic)) AS DOUBLE) /
             |           CAST(n_i - 1 AS DOUBLE), 9) AS DECIMAL(28,9)) AS c
             |       FROM nic GROUP BY 1, 2),
             |obs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             |          CAST(SUM(n_i) AS BIGINT) AS n_values,
             |          SUM(c) AS don FROM co),
             |cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
             |          SUM(CAST(n_c AS HUGEINT) * n_c) AS sq
             |        FROM (SELECT v.l, COUNT(*) AS n_c
             |              FROM vals v JOIN per USING (i) GROUP BY 1))
             |SELECT n_items, n_values, n_categories, d_obs, d_exp,
             |  CASE WHEN d_exp = 0 THEN 1.0
             |       ELSE 1.0 - d_obs / d_exp END AS alpha
             |FROM (
             |  SELECT n_items, n_values, n_categories,
             |    CAST(don AS DOUBLE) / CAST(n_values AS DOUBLE) AS d_obs,
             |    CAST(CAST(n_values AS HUGEINT) * n_values - sq AS DOUBLE) /
             |      CAST(CAST(n_values AS HUGEINT) * (n_values - 1) AS DOUBLE)
             |      AS d_exp
             |  FROM obs, cat)""".stripMargin)),

    // ----------------------- per-rater leave-one-out consensus quality
    // For each (item, rater): consensus recomputed WITHOUT the rater's
    // vote (tally minus own label); agree iff own label == LOO majority
    // (ties to smallest label). Items left without votes drop out of the
    // rater's denominator.
    Q("q_rater_reliability",
      (s, dir) => graft.functions.CorpusFunctions.raterConsensusQuality(
        Tables.df(s, dir, "events")
          .select((col("event_id") % 499).as("item_id"), col("user_id"),
            col("event_type")),
        "item_id", "user_id", "event_type"),
      Some("""WITH vals AS (
             |  SELECT event_id % 499 AS i, user_id AS r,
             |    MIN(event_type) AS own
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |tally AS (SELECT i, own AS l, CAST(COUNT(*) AS BIGINT) AS v
             |          FROM vals GROUP BY 1, 2),
             |cand AS (SELECT v.i, v.r, v.own, t.l,
             |           t.v - (CASE WHEN t.l = v.own THEN 1 ELSE 0 END)
             |             AS adj
             |         FROM vals v JOIN tally t USING (i)),
             |loo AS (SELECT i, r, own, l, ROW_NUMBER() OVER (
             |          PARTITION BY i, r ORDER BY adj DESC, l ASC) AS rn
             |        FROM cand WHERE adj > 0)
             |SELECT r AS user_id, CAST(COUNT(*) AS BIGINT) AS n_items,
             |  CAST(SUM(CASE WHEN l = own THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_agree,
             |  CAST(SUM(CASE WHEN l = own THEN 1 ELSE 0 END) AS DOUBLE) /
             |    CAST(COUNT(*) AS DOUBLE) AS agree_rate
             |FROM loo WHERE rn = 1 GROUP BY 1""".stripMargin)),

    // ---------------------------------- duplication profile (data card)
    // Exact-dup multiplicity histogram + cross-source leakage per
    // multiplicity, on the exact-dedup fingerprint convention.
    Q("q_duplication_profile",
      (s, dir) => graft.functions.CorpusFunctions.duplicationProfile(
        Tables.df(s, dir, "documents"), "text", Some("source")),
      Some(s"""WITH g AS (
             |  SELECT md5($normSql) AS fp, CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
             |  FROM documents GROUP BY 1)
             |SELECT m AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_groups,
             |  CAST(SUM(m) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_cross_source_groups
             |FROM g GROUP BY 1""".stripMargin)),

    // ----------------------------------------- per-rater label-bias PSI
    // Each rater's label mix vs the pooled mix, the drift arithmetic per
    // rater (add-1 over the pooled label set, 6-decimal ln, 9-decimal
    // decimal contributions).
    Q("q_rater_bias",
      (s, dir) => graft.functions.CorpusFunctions.raterBiasReport(
        Tables.df(s, dir, "events")
          .select((col("event_id") % 499).as("item_id"), col("user_id"),
            col("event_type")),
        "item_id", "user_id", "event_type"),
      Some("""WITH vals AS (
             |  SELECT event_id % 499 AS i, user_id AS r,
             |    MIN(event_type) AS l
             |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |pr AS (SELECT r, l, CAST(COUNT(*) AS BIGINT) AS n_r
             |       FROM vals GROUP BY 1, 2),
             |pool AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS n_p
             |         FROM vals GROUP BY 1),
             |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |         CAST(SUM(n_p) AS BIGINT) AS tp FROM pool),
             |rt AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS t_r
             |       FROM vals GROUP BY 1),
             |grid AS (SELECT rt.r, rt.t_r, p.n_p,
             |           COALESCE(pr.n_r, 0) AS n_r
             |         FROM rt CROSS JOIN pool p
             |         LEFT JOIN pr ON pr.r = rt.r AND pr.l = p.l),
             |c AS (SELECT r, t_r,
             |        CAST(round((pa - pb) * round(ln(pa / pb), 6), 9)
             |          AS DECIMAL(18,9)) AS contrib
             |      FROM (SELECT r, t_r,
             |              CAST(n_r + 1 AS DOUBLE) /
             |                CAST(t_r + (SELECT k FROM kk) AS DOUBLE) AS pa,
             |              CAST(n_p + 1 AS DOUBLE) /
             |                CAST((SELECT tp FROM kk) +
             |                     (SELECT k FROM kk) AS DOUBLE) AS pb
             |            FROM grid))
             |SELECT r AS user_id, t_r AS n_votes,
             |  CAST(SUM(contrib) AS DOUBLE) AS psi
             |FROM c GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------- mixture diversity (data card)
    // Shannon entropy (nats) + Gini-Simpson of the documents.lang mix;
    // integer-exact Σn_g², 6-decimal-rounded entropy terms.
    Q("q_mixture_diversity",
      (s, dir) => graft.functions.CorpusFunctions.mixtureDiversity(
        Tables.df(s, dir, "documents"), "lang"),
      Some("""WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g
             |           FROM documents WHERE lang IS NOT NULL GROUP BY 1)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             |  CAST(SUM(n_g) AS BIGINT) AS n_rows,
             |  ln(CAST(SUM(n_g) AS DOUBLE)) -
             |    CAST(SUM(CAST(round(CAST(n_g AS DOUBLE) *
             |        ln(CAST(n_g AS DOUBLE)), 6) AS DECIMAL(28,6)))
             |      AS DOUBLE) / CAST(SUM(n_g) AS DOUBLE) AS entropy_nats,
             |  1.0 - CAST(SUM(CAST(n_g AS HUGEINT) * n_g) AS DOUBLE) /
             |    CAST(CAST(SUM(n_g) AS HUGEINT) * SUM(n_g) AS DOUBLE)
             |    AS gini_simpson
             |FROM g""".stripMargin)),

    // -------------------------------- tokenizer fertility report (data card)
    // Per-language exact token/word/byte totals + fertility (tokens per
    // word) and bytes-per-token — the multilingual tokenizer-health metric
    // (Rust 2021), with the codegen'd BPE-ish pretokenizer counts.
    Q("q_tokenizer_fertility",
      (s, dir) => graft.functions.CorpusFunctions.tokenizerFertility(
        Tables.df(s, dir, "documents"), "lang"),
      Some(s"""WITH m AS (SELECT lang,
             |    CAST(len(list_filter(string_split_regex(text, '\\s+'),
             |      t -> len(t) > 0)) AS BIGINT) AS w,
             |    CAST(len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS t,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS b
             |  FROM documents WHERE lang IS NOT NULL)
             |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(w) AS BIGINT) AS n_words,
             |  CAST(SUM(t) AS BIGINT) AS n_tokens,
             |  CAST(SUM(b) AS BIGINT) AS n_bytes,
             |  CASE WHEN SUM(w) > 0
             |    THEN CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
             |    END AS fertility,
             |  CASE WHEN SUM(t) > 0
             |    THEN CAST(SUM(b) AS DOUBLE) / CAST(SUM(t) AS DOUBLE)
             |    END AS bytes_per_token
             |FROM m GROUP BY lang""".stripMargin)),

    // ----------------------------- token-budget epoch allocation (planning)
    // "How many epochs of each source fit a 40k-token run at these weights,
    // capped at 4 epochs" (Muennighoff 2023): exact long arithmetic for
    // targets/allocations/shortfalls, one IEEE epochs quotient. src0/src1
    // hit the epoch cap, src2's target fits uncapped, and the weighted but
    // absent srcX surfaces with zero availability (all-shortfall).
    Q("q_token_budget_plan",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
          .withColumn("toks", graft.functions.TextFunctions
            .bpeishTokenCount(col("text")).cast("long"))
        graft.functions.CorpusFunctions.tokenBudgetPlan(docs, "source",
          "toks", Seq(("src0", 5L), ("src1", 3L), ("src2", 1L), ("srcX", 1L)),
          budgetTokens = 40000L, maxEpochs = 4)
      },
      Some(s"""WITH w(source, wt) AS (VALUES ('src0', 5), ('src1', 3),
             |    ('src2', 1), ('srcX', 1)),
             |a AS (SELECT source, CAST(SUM(len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS avail
             |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
             |p AS (SELECT w.source,
             |    COALESCE(a.avail, 0) AS available_tokens,
             |    (40000 * w.wt) // 10 AS target_tokens
             |  FROM w LEFT JOIN a ON w.source = a.source)
             |SELECT source, available_tokens,
             |  CAST(target_tokens AS BIGINT) AS target_tokens,
             |  CAST(least(target_tokens, available_tokens * 4) AS BIGINT)
             |    AS allocated_tokens,
             |  CASE WHEN available_tokens > 0 THEN
             |    CAST(least(target_tokens, available_tokens * 4) AS DOUBLE) /
             |      CAST(available_tokens AS DOUBLE) END AS epochs,
             |  least(target_tokens, available_tokens * 4) < target_tokens
             |    AS capped,
             |  CAST(target_tokens - least(target_tokens, available_tokens * 4)
             |    AS BIGINT) AS shortfall_tokens
             |FROM p""".stripMargin)),

    // ------------------------- temperature-scaled mixture weights (α=0.5)
    // The multilingual sampling rule over documents.lang: weights ∝
    // share^0.5 flatten the mix; weight_int is the exact 9-decimal
    // fixed-point numerator rebalanceToMixture consumes.
    Q("q_temperature_mixture",
      (s, dir) => graft.functions.CorpusFunctions.temperatureMixtureWeights(
        Tables.df(s, dir, "documents"), "lang", alpha = 0.5),
      Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
             |           FROM documents WHERE lang IS NOT NULL GROUP BY 1),
             |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tt FROM c),
             |p AS (SELECT lang, n_docs,
             |        CAST(n_docs AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
             |        CAST(round(pow(
             |          CAST(n_docs AS DOUBLE) / CAST(tt AS DOUBLE), 0.5), 9)
             |          AS DECIMAL(28,9)) AS pp
             |      FROM c, t),
             |z AS (SELECT SUM(pp) AS zz FROM p)
             |SELECT lang, n_docs, share,
             |  CAST(pp AS DOUBLE) / CAST(zz AS DOUBLE) AS weight,
             |  CAST(pp * 1000000000 AS BIGINT) AS weight_int
             |FROM p, z""".stripMargin)),

    // --------------------- temperature mixture -> exact rebalance carve
    // The composition the weights exist for: share^0.5 weights at 1e-6
    // fixed point (scaled from weight_int so the quota arithmetic n*SumW
    // stays in BIGINT range at any corpus size) drive rebalanceToMixture's
    // exact integer quotas. Oracle replays weights AND carve end-to-end.
    Q("q_temperature_rebalance",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val w = graft.functions.CorpusFunctions
          .temperatureMixtureWeights(docs, "lang", alpha = 0.5)
          .select(col("lang"), expr("weight_int div 1000").as("wk"))
          .collect().map(r => r.getString(0) -> r.getLong(1))
          .filter(_._2 > 0).sortBy(_._1).toSeq
        graft.functions.CorpusFunctions.rebalanceToMixture(
          docs, "lang", w, "doc_id")
          .select(col("doc_id"), col("lang"))
      },
      Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
             |           FROM documents WHERE lang IS NOT NULL GROUP BY 1),
             |t AS (SELECT SUM(n) AS tt FROM c),
             |wf AS (SELECT lang, w FROM (
             |    SELECT lang,
             |      CAST(CAST(round(pow(
             |          CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 0.5), 9)
             |        AS DECIMAL(28,9)) * 1000000000 AS BIGINT) // 1000 AS w
             |    FROM c, t) WHERE w > 0),
             |sw AS (SELECT SUM(w) AS sumw FROM wf),
             |counts AS (SELECT lang, COUNT(*) AS n FROM documents
             |           GROUP BY lang),
             |feas AS (SELECT c2.lang, w.w,
             |           (c2.n * (SELECT sumw FROM sw)) // w.w AS cap
             |         FROM counts c2 JOIN wf w USING (lang)),
             |quota AS (SELECT lang,
             |            (w * (SELECT MIN(cap) FROM feas)) //
             |              (SELECT sumw FROM sw) AS keep
             |          FROM feas),
             |ranked AS (
             |  SELECT d.doc_id, d.lang, q.keep,
             |    ROW_NUMBER() OVER (PARTITION BY d.lang
             |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
             |  FROM documents d JOIN quota q USING (lang)
             |  WHERE q.keep > 0)
             |SELECT doc_id, lang FROM ranked
             |WHERE rn <= keep""".stripMargin)),

    // ----------------------------------- Zipf rank-frequency OLS (R=500)
    // Corpus-health fit: ln-ln least squares over the top-500 term
    // frequencies; 6-decimal ln rounding, exact decimal OLS sums.
    Q("q_zipf_fit",
      (s, dir) => graft.functions.CorpusFunctions.zipfFit(
        Tables.df(s, dir, "documents"), "text", topR = 500),
      Some(s"""WITH tok AS (SELECT unnest($toksSql) AS term FROM documents),
             |tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f
             |       FROM tok GROUP BY 1),
             |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
             |            CAST(SUM(f) AS BIGINT) AS total_tokens FROM tf),
             |top AS (SELECT f, ROW_NUMBER() OVER (
             |          ORDER BY f DESC, term ASC) AS r
             |        FROM tf ORDER BY f DESC, term ASC LIMIT 500),
             |pts AS (SELECT
             |    CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             |    CAST(round(ln(CAST(f AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
             |  FROM top),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS rr,
             |        SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             |        SUM(x*y) AS sxy, SUM(y*y) AS syy FROM pts)
             |SELECT n_types, total_tokens, rr AS top_r_used,
             |  CASE WHEN rr >= 2 THEN
             |    (CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
             |  CASE WHEN rr >= 2 THEN
             |    (CAST(sy AS DOUBLE) -
             |     ((CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |      (CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
             |     CAST(sx AS DOUBLE)) / CAST(rr AS DOUBLE) END AS intercept,
             |  CASE WHEN rr >= 2 AND
             |      (CAST(rr AS DOUBLE) * CAST(syy AS DOUBLE) -
             |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0 THEN
             |    ((CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
             |     (CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
             |    ((CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     (CAST(rr AS DOUBLE) * CAST(syy AS DOUBLE) -
             |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
             |FROM stats, s""".stripMargin)),

    // ------------------------------ Heaps' law vocabulary-growth fit
    // V(N) ~ K*N^beta sampled at 64 doc-id checkpoints; shared 6-decimal
    // log-log OLS with q_zipf_fit.
    Q("q_heaps_fit",
      (s, dir) => graft.functions.CorpusFunctions.heapsFit(
        Tables.df(s, dir, "documents"), "doc_id", "text", points = 64),
      Some(s"""WITH tok AS (SELECT doc_id AS id, unnest($toksSql) AS term
             |             FROM documents),
             |b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
             |      FROM documents),
             |cs AS (SELECT DISTINCT lo + ((hi - lo) * k) // 64 AS c
             |       FROM b, (SELECT unnest(generate_series(1, 64)) AS k)),
             |fd AS (SELECT term, MIN(id) AS fd FROM tok GROUP BY 1),
             |nv AS (SELECT fd, CAST(COUNT(*) AS BIGINT) AS nv
             |       FROM fd GROUP BY 1),
             |nt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS nt
             |       FROM tok GROUP BY 1),
             |vk AS (SELECT c, CAST(COALESCE(SUM(CASE WHEN fd <= c
             |           THEN nv END), 0) AS BIGINT) AS v
             |       FROM cs, nv GROUP BY 1),
             |nk AS (SELECT c, CAST(COALESCE(SUM(CASE WHEN id <= c
             |           THEN nt END), 0) AS BIGINT) AS n
             |       FROM cs, nt GROUP BY 1),
             |pts AS (SELECT DISTINCT v, n FROM vk JOIN nk USING (c)
             |        WHERE v > 0 AND n > 0),
             |lp AS (SELECT
             |    CAST(round(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             |    CAST(round(ln(CAST(v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
             |  FROM pts),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS rr,
             |        SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             |        SUM(x*y) AS sxy, SUM(y*y) AS syy FROM lp),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM fd),
             |tt AS (SELECT CAST(COALESCE(SUM(nt), 0) AS BIGINT)
             |         AS total_tokens FROM nt)
             |SELECT n_types, total_tokens, rr AS n_points_used,
             |  CASE WHEN rr >= 2 THEN
             |    (CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS beta,
             |  CASE WHEN rr >= 2 THEN
             |    (CAST(sy AS DOUBLE) -
             |     ((CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |      (CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
             |     CAST(sx AS DOUBLE)) / CAST(rr AS DOUBLE) END AS ln_k,
             |  CASE WHEN rr >= 2 AND
             |      (CAST(rr AS DOUBLE) * CAST(syy AS DOUBLE) -
             |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0 THEN
             |    ((CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
             |     (CAST(rr AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
             |    ((CAST(rr AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     (CAST(rr AS DOUBLE) * CAST(syy AS DOUBLE) -
             |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
             |FROM tot, tt, s""".stripMargin)),

    // ------------------------------------ Gopher rule-based quality report
    // The Rae 2021 filter battery per doc: word-count bounds, mean word
    // length, symbol ratio, alpha-word fraction, bullet/ellipsis line
    // fractions, stop-word hits, and the composite pass verdict — every
    // measure an exact count or IEEE quotient, replayed end-to-end.
    Q("q_gopher_quality",
      (s, dir) => graft.functions.TextFunctions.gopherQualityReport(
        Tables.df(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH w AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(text, '\\s+'),
             |      x -> len(x) > 0) AS words,
             |    list_filter(string_split(text, chr(10)),
             |      l -> len(trim(l)) > 0) AS lines,
             |    $toksSql AS toks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(words) AS BIGINT) AS n_words,
             |    CAST(COALESCE(list_sum(list_transform(words,
             |      x -> len(x))), 0) AS BIGINT) AS sum_len,
             |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
             |      + CAST((len(text) - len(replace(text, '...', ''))) // 3
             |          AS BIGINT)
             |      + CAST(len(text) - len(replace(text, '…', ''))
             |          AS BIGINT) AS n_sym,
             |    CAST(len(list_filter(words,
             |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             |    CAST(len(lines) AS BIGINT) AS n_lines,
             |    CAST(len(list_filter(lines,
             |      l -> starts_with(ltrim(l), '-') OR
             |           starts_with(ltrim(l), '*') OR
             |           starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet,
             |    CAST(len(list_filter(lines,
             |      l -> ends_with(rtrim(l), '...') OR
             |           ends_with(rtrim(l), '…'))) AS BIGINT) AS n_ell,
             |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END)
             |      + (CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
             |      AS BIGINT) AS stop_hits
             |  FROM w)
             |SELECT doc_id, n_words,
             |  sum_len * 1.0 / NULLIF(n_words, 0) AS mean_word_len,
             |  n_sym * 1.0 / NULLIF(n_words, 0) AS symbol_ratio,
             |  n_alpha * 1.0 / NULLIF(n_words, 0) AS alpha_frac,
             |  stop_hits,
             |  n_bullet * 1.0 / NULLIF(n_lines, 0) AS bullet_frac,
             |  n_ell * 1.0 / NULLIF(n_lines, 0) AS ellipsis_frac,
             |  COALESCE((n_words >= 50 AND n_words <= 100000
             |    AND sum_len * 1.0 / NULLIF(n_words, 0) >= 3.0
             |    AND sum_len * 1.0 / NULLIF(n_words, 0) <= 10.0
             |    AND n_sym * 1.0 / NULLIF(n_words, 0) <= 0.1
             |    AND n_alpha * 1.0 / NULLIF(n_words, 0) >= 0.8
             |    AND n_bullet * 1.0 / NULLIF(n_lines, 0) <= 0.9
             |    AND n_ell * 1.0 / NULLIF(n_lines, 0) <= 0.3
             |    AND stop_hits >= 2), FALSE) AS pass
             |FROM m""".stripMargin)),

    // ------------------------------------- C4 line-level cleanup (Raffel 2020)
    // Line filter (terminal punctuation + >=5 words + no "javascript") then
    // page gates (>=3 retained lines, no "lorem ipsum", no '{'). The corpus
    // text has no newlines or punctuation, so the fixture builds a multi-line
    // page per doc with planted violations: doc%5==0 loses its javascript
    // line (failing the 3-line gate), doc%11==0 plants lorem ipsum,
    // doc%13==0 plants a brace — each gate exercised on both engines.
    Q("q_c4_line_filter",
      (s, dir) => {
        val d = Tables.df(s, dir, "documents")
        val id = col("doc_id")
        val page = concat_ws("\n",
          concat(lit("Data pipeline sentence number "), id.cast("string"),
            lit(" describes the corpus well.")),
          substring(col("text"), 1, 60),
          lit("Too short."),
          when(id % 5 === 0,
            lit("Please enable javascript to view this content properly."))
            .otherwise(
              lit("A second proper sentence closes with a question mark, right?")),
          when(id % 11 === 0,
            lit("lorem ipsum dolor sit amet fills this entire line.")),
          when(id % 13 === 0,
            lit("this config has a { brace in it and gets killed.")),
          concat(lit("The third full sentence arrives here with id "),
            (id % 7).cast("string"), lit(" attached!")))
        graft.functions.TextFunctions.c4Clean(
          d.select(id, page.as("text")))
      },
      Some(s"""WITH built AS (SELECT doc_id,
             |    concat_ws(chr(10),
             |      'Data pipeline sentence number ' || CAST(doc_id AS VARCHAR)
             |        || ' describes the corpus well.',
             |      substring(text, 1, 60),
             |      'Too short.',
             |      CASE WHEN doc_id % 5 = 0
             |        THEN 'Please enable javascript to view this content properly.'
             |        ELSE 'A second proper sentence closes with a question mark, right?'
             |        END,
             |      CASE WHEN doc_id % 11 = 0
             |        THEN 'lorem ipsum dolor sit amet fills this entire line.' END,
             |      CASE WHEN doc_id % 13 = 0
             |        THEN 'this config has a ' || chr(123) ||
             |          ' brace in it and gets killed.' END,
             |      'The third full sentence arrives here with id ' ||
             |        CAST(doc_id % 7 AS VARCHAR) || ' attached!') AS t
             |  FROM documents),
             |f AS (SELECT doc_id, t,
             |    len(string_split(t, chr(10))) AS n_lines,
             |    list_filter(string_split(t, chr(10)), l ->
             |      regexp_matches(rtrim(l), '[.!?"]$$')
             |      AND len(list_filter(string_split_regex(trim(l), '\\s+'),
             |        w -> len(w) > 0)) >= 5
             |      AND NOT contains(lower(l), 'javascript')) AS kept
             |  FROM built),
             |v AS (SELECT doc_id, t, n_lines, kept,
             |    (len(regexp_extract_all(array_to_string(kept, chr(10)),
             |        '[.!?]')) >= 3
             |      AND NOT contains(lower(t), 'lorem ipsum')
             |      AND NOT contains(t, chr(123))) AS kept_doc
             |  FROM f)
             |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_kept, kept_doc,
             |  CASE WHEN kept_doc THEN array_to_string(kept, chr(10))
             |    END AS text_clean
             |FROM v""".stripMargin)),

    // ---------------------------- corpus-relative n-gram commonness
    // Per-doc templatedness: mean ln(DF) of the doc's shingles + the
    // fraction with DF >= 5. 4-decimal ln rounding, exact decimal sums.
    Q("q_ngram_commonness",
      (s, dir) => graft.functions.CorpusFunctions.ngramCommonness(
        Tables.df(s, dir, "documents"), "doc_id", "text", shingleN = 3,
        commonDf = 5),
      Some(s"""WITH sh AS (
             |  SELECT doc_id, unnest(s) AS sg FROM (
             |    SELECT doc_id, $shinglesSql AS s
             |    FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |    WHERE len(toks) > 0)),
             |dfq AS (SELECT sg, CAST(COUNT(*) AS BIGINT) AS df
             |        FROM sh GROUP BY 1)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
             |  CAST(SUM(CAST(round(ln(CAST(df AS DOUBLE)), 4)
             |      AS DECIMAL(18,4))) AS DOUBLE) /
             |    CAST(COUNT(*) AS DOUBLE) AS mean_log_df,
             |  CAST(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_common,
             |  CAST(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS DOUBLE) /
             |    CAST(COUNT(*) AS DOUBLE) AS common_frac
             |FROM sh JOIN dfq USING (sg) GROUP BY 1""".stripMargin)),

    // ----------------------------------- source-overlap Jaccard matrix
    // Pairwise shingle-set Jaccard between documents.source values —
    // which provenance buckets mirror each other.
    Q("q_source_overlap",
      (s, dir) => graft.functions.CorpusFunctions.sourceOverlapMatrix(
        Tables.df(s, dir, "documents"), "source", "text", shingleN = 3),
      Some(s"""WITH gs AS (
             |  SELECT DISTINCT g, sg FROM (
             |    SELECT g, unnest(s) AS sg FROM (
             |      SELECT source AS g, $shinglesSql AS s
             |      FROM (SELECT source, $toksSql AS toks FROM documents
             |            WHERE source IS NOT NULL)
             |      WHERE len(toks) > 0))),
             |sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM gs GROUP BY 1)
             |SELECT a.g AS group_a, b.g AS group_b, sa.n AS n_a,
             |  sb.n AS n_b, CAST(COUNT(*) AS BIGINT) AS n_common,
             |  CAST(COUNT(*) AS DOUBLE) /
             |    CAST(sa.n + sb.n - COUNT(*) AS DOUBLE) AS jaccard
             |FROM gs a JOIN gs b ON a.sg = b.sg AND a.g < b.g
             |JOIN sz sa ON sa.g = a.g JOIN sz sb ON sb.g = b.g
             |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // --------------------------- per-benchmark contamination matrix
    // Three benchmark suites at once (docs ≡ 0 mod 7, split b0/b1/b2 by
    // doc_id mod 3): the sparse (doc, benchmark, overlap) report — which
    // eval set leaked into which documents. Only contaminated pairs
    // (n_hits ≥ 1) materialize.
    Q("q_contamination_matrix",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 7 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string"))
            .as("benchmark"), col("text"))
        graft.functions.CorpusFunctions.contaminationMatrix(
          docs.filter(col("doc_id") % 7 =!= 0), bench, "doc_id", "text",
          "benchmark")
      },
      Some(s"""WITH sh AS (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(toks) > 0),
             |bench AS (
             |  SELECT 'b' || CAST(doc_id % 3 AS VARCHAR) AS benchmark,
             |    list_distinct(flatten(list(s))) AS bs
             |  FROM sh WHERE doc_id % 7 = 0 GROUP BY 1),
             |m AS (
             |  SELECT sh.doc_id, b.benchmark,
             |    CAST(len(sh.s) AS BIGINT) AS n_shingles,
             |    CAST(len(list_intersect(sh.s, b.bs)) AS BIGINT) AS n_hits
             |  FROM sh CROSS JOIN bench b
             |  WHERE sh.doc_id % 7 <> 0)
             |SELECT doc_id, benchmark, n_shingles, n_hits,
             |  n_hits * 1.0 / n_shingles AS overlap
             |FROM m WHERE n_hits >= 1""".stripMargin)),

    // ------------------------------- decontamination, Bloom-filter plan
    // Same semantics and ORACLE as q_decontaminate — only the plan differs
    // (BF prefilter + exact verify semi-join instead of a broadcast of the
    // raw benchmark shingle set), so the equality IS the correctness proof
    // that the fpp ghosts are fully killed.
    Q("q_decontaminate_bloom",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        graft.functions.CorpusFunctions.contaminationScoresBloom(
          docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      },
      Some(decontOracleSql)),

    // ------------------------------------------------- document chunking
    // Fixed 64-token windows at stride 48 (overlap packing). Same
    // start-set on both engines: Spark sequence(0, len-1, 48) ==
    // DuckDB range(0, len, 48).
    Q("q_chunk_documents",
      (s, dir) => graft.functions.CorpusFunctions.chunkDocuments(
        Tables.df(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 64, stride = 48),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |e AS (SELECT doc_id, toks,
             |        unnest(list_filter(range(0, len(toks), 48),
             |          s -> s = 0 OR s < len(toks) - 64 + 48)) AS s
             |      FROM t WHERE len(toks) > 0)
             |SELECT doc_id, s // 48 AS chunk_id,
             |  array_to_string(toks[s+1 : s+64], ' ') AS chunk,
             |  len(toks[s+1 : s+64]) AS n_tokens
             |FROM e""".stripMargin)),

    // ------------------------------------------ composed curation pipeline
    // The operators are built to COMPOSE: exact dedup → benchmark
    // decontamination → stratified sampling → per-source token budget, one
    // lazy plan end-to-end, each stage deterministic so the whole chain has
    // an exact nested-CTE oracle.
    Q("q_corpus_pipeline",
      (s, dir) => {
        import graft.functions.{CorpusFunctions, DedupFunctions}
        val docs = Tables.df(s, dir, "documents")
        val deduped = DedupFunctions.dropExactDuplicates(docs, "doc_id", "text")
        val clean = CorpusFunctions.dropContaminated(
          deduped, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          threshold = 0.5)
        val mixed = CorpusFunctions.sampleByGroup(
          clean, "doc_id", "source", Map("src0" -> 1.0), defaultRate = 0.5)
        CorpusFunctions.selectWithinTokenBudget(
          mixed.select(col("doc_id"), col("source"),
            TextFunctions.wordCount(col("text")).as("word_count")),
          "source", col("word_count"), "doc_id", budget = 1500L)
          .withColumn("cum_tokens", col("cum_tokens").cast("long"))
      },
      Some(s"""WITH keep AS (
             |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
             |d1 AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
             |sh AS (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(toks) > 0),
             |bench AS (
             |  SELECT list_distinct(flatten(list(s))) AS bs
             |  FROM sh WHERE doc_id % 7 = 0),
             |flagged AS (
             |  SELECT sh.doc_id FROM sh CROSS JOIN bench b
             |  WHERE len(list_intersect(sh.s, b.bs)) / len(sh.s) >= 0.5),
             |d2 AS (SELECT * FROM d1
             |       WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
             |d3 AS (SELECT * FROM d2 WHERE CASE source
             |  WHEN 'src0' THEN TRUE
             |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
             |END),
             |t AS (
             |  SELECT doc_id, source,
             |    len(list_filter(string_split_regex(text, '\\s+'),
             |        t -> len(t) > 0)) AS word_count
             |  FROM d3),
             |c AS (
             |  SELECT *, CAST(SUM(word_count) OVER (
             |      PARTITION BY source ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM t)
             |SELECT doc_id, source, word_count, cum_tokens
             |FROM c WHERE cum_tokens <= 1500""".stripMargin)),

    // ------------------------------------------- top-k n-gram doc frequency
    Q("q_ngram_topk",
      (s, dir) => graft.functions.CorpusFunctions.topNgramsByDocFreq(
        Tables.df(s, dir, "documents"), "text", shingleN = 3, k = 50),
      Some(s"""WITH sh AS (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(toks) >= 3),
             |e AS (SELECT unnest(s) AS ngram FROM sh)
             |SELECT ngram, COUNT(*) AS df FROM e
             |GROUP BY ngram ORDER BY df DESC, ngram LIMIT 50""".stripMargin)),

    // ---------------------------------------------- quality top-k per source
    // Keep the 25 best-quality docs per source (deterministic ties by
    // doc_id). The quality formula's DuckDB replica is the one proven exact
    // by q_text_analysis.
    // ------------------------------- dictionary multi-pattern search (AC)
    // One Aho–Corasick pass over each document counts every dictionary
    // phrase — O(corpus + matches), not O(patterns × corpus). The chosen
    // phrases are border-free (no self-overlap), so DuckDB's
    // non-overlapping replace-count reproduces the AC occurrence count
    // exactly.
    Q("q_multi_pattern",
      (s, dir) => graft.functions.AhoCorasick.multiPatternCounts(
        s, Tables.df(s, dir, "documents"),
        Seq("table scan", "hash join", "batch stream", "key order")),
      Some("""WITH pats AS (SELECT * FROM (VALUES ('table scan'),
             |    ('hash join'), ('batch stream'), ('key order')) p(pattern))
             |SELECT d.doc_id, p.pattern,
             |  CAST((len(d.text) - len(replace(d.text, p.pattern, '')))
             |       / len(p.pattern) AS BIGINT) AS n_matches
             |FROM documents d, pats p
             |WHERE len(replace(d.text, p.pattern, '')) < len(d.text)"""
        .stripMargin)),

    // ------------------------------------------------ per-source doc cap
    // C4/RefinedWeb-style per-domain limit: at most 20 docs per source,
    // picked by deterministic md5 order (distribution-preserving, unlike
    // the quality-creaming top-k below).
    Q("q_source_caps",
      (s, dir) => graft.functions.CorpusFunctions.capPerGroup(
        Tables.df(s, dir, "documents"), "doc_id", Seq("source"), cap = 20)
        .select(col("doc_id"), col("source"), col("rn")),
      Some("""SELECT doc_id, source, rn FROM (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             |      AS rn
             |  FROM documents) t
             |WHERE rn <= 20""".stripMargin)),

    Q("q_quality_topk",
      (s, dir) => graft.functions.CorpusFunctions.topKByQuality(
        Tables.df(s, dir, "documents"), "doc_id", "text",
        Seq("source"), k = 25)
        .select(col("doc_id"), col("source"), col("quality"), col("rn")),
      Some("""WITH scored AS (
             |  SELECT doc_id, source,
             |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|for|with|on)\b')) AS s_en,
             |    len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS word_cnt,
             |    CASE WHEN len(text) = 0 THEN 0.0
             |      ELSE len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) / len(text) END AS punct_ratio,
             |    len(regexp_extract_all(text, '[A-Za-z0-9]')) AS alnum_chars,
             |    len(text) AS n
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, source,
             |    (CAST(n BETWEEN 50 AND 100000 AS INT) +
             |     CAST(punct_ratio <= 0.3 AS INT) +
             |     CAST((CASE WHEN word_cnt = 0 THEN 0.0
             |           ELSE s_en / word_cnt END) >= 0.01 AS INT) +
             |     CAST((CASE WHEN word_cnt = 0 THEN 0.0
             |           ELSE alnum_chars / word_cnt END) BETWEEN 2 AND 12 AS INT)
             |    ) / 4.0 AS quality
             |  FROM scored),
             |r AS (
             |  SELECT *, ROW_NUMBER() OVER (
             |    PARTITION BY source ORDER BY quality DESC, doc_id) AS rn
             |  FROM q)
             |SELECT doc_id, source, quality, rn FROM r WHERE rn <= 25""".stripMargin)),

    // ------------------------------------------------ corpus mixture stats
    Q("q_corpus_stats",
      (s, dir) => graft.functions.CorpusFunctions.mixtureStats(
        Tables.df(s, dir, "documents"), "text", Seq("source", "lang")),
      Some("""WITH g AS (
             |  SELECT source, lang, COUNT(*) AS n_docs,
             |    CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
             |        t -> len(t) > 0))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1, 2)
             |SELECT source, lang, n_docs, n_tokens,
             |  n_tokens / SUM(n_tokens) OVER () AS token_share
             |FROM g""".stripMargin)),

    // ------------------------------------------------ streaming ingest dedup
    // Exact dedup at INGEST: a real readStream → dropDuplicates(state-store)
    // → parquet-append run (AvailableNow, checkpointed). The emitted
    // fingerprint SET is deterministic (which duplicate row survives is
    // arrival-order-dependent; its fingerprint is not) → exact oracle.
    Q("q_stream_dedup",
      (s, dir) => graft.streaming.StreamingPipeline.streamingDedupFingerprints(
        s, s"$dir/documents.parquet", Tables.scratchDir("dedup_ckpt"),
        s"stream_dedup_${System.nanoTime()}"),
      Some(s"""SELECT DISTINCT md5($normSql) AS fingerprint
             |FROM documents""".stripMargin)),

    // ------------------------------------------------- incremental dedup
    // The 100-TB shape: dedup an increment (odd doc_ids) against the corpus
    // (even doc_ids) via fingerprint anti-join — corpus text never rescanned.
    Q("q_dedup_incremental",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        DedupFunctions.dropDuplicatesAgainst(
          existing = docs.filter(col("doc_id") % 2 === 0),
          incoming = docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text")
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(s"""WITH fp AS (SELECT doc_id, lang, source, md5($normSql) AS f
             |            FROM documents),
             |ex AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
             |inc AS (SELECT doc_id, lang, source, f,
             |          row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
             |        FROM fp WHERE doc_id % 2 = 1)
             |SELECT i.doc_id, i.lang, i.source FROM inc i
             |LEFT JOIN ex ON i.f = ex.f
             |WHERE i.rn = 1 AND ex.f IS NULL""".stripMargin)),

    // -------------------------------------------------- MinHash-LSH near-dup
    // Threshold 0.9 with k=64/b=16/r=4: detection prob 1-(1-0.9^4)^16 ≈
    // 1-2e-8 per true pair, and xxhash64 is deterministic → stable result.
    // The oracle is the EXACT all-pairs Jaccard (feasible at oracle scale).
    Q("q_dedup_minhash_neardup",
      (s, dir) => DedupFunctions.minhashNearDuplicates(
        Tables.df(s, dir, "documents"), "doc_id", "text", threshold = 0.9)
        .select(col("id_a"), col("id_b"), col("jaccard")),
      Some(s"""WITH sh AS (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  len(list_intersect(a.s, b.s)) /
             |    len(list_distinct(list_concat(a.s, b.s))) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.s, b.s)) /
             |    len(list_distinct(list_concat(a.s, b.s))) >= 0.9""".stripMargin)),

    // ------------------------------- component-equivalent near-dup EDGES
    // The scale form feeding every closure consumer: identical-content
    // classes collapse to min-id stars, only reps enter LSH. The oracle
    // replays the construction exactly — fingerprint classes in SQL, star
    // edges, then exact all-pairs Jaccard restricted to representatives —
    // a full value oracle for the edge relation itself (the closure
    // equivalence is additionally proven by the cluster queries, whose
    // oracles close the FULL pair set).
    Q("q_dedup_minhash_edges",
      (s, dir) => DedupFunctions.minhashNearDupEdges(
        Tables.df(s, dir, "documents"), "doc_id", "text", threshold = 0.9),
      Some(s"""WITH sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |fp AS MATERIALIZED (
             |  SELECT doc_id, md5($normSql) AS f FROM documents
             |  WHERE doc_id IN (SELECT doc_id FROM sh)),
             |rep AS (SELECT f, MIN(doc_id) AS r FROM fp GROUP BY f),
             |star AS (
             |  SELECT rep.r AS id_a, fp.doc_id AS id_b
             |  FROM fp JOIN rep ON fp.f = rep.f
             |  WHERE fp.doc_id <> rep.r),
             |reppairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE a.doc_id IN (SELECT r FROM rep)
             |    AND b.doc_id IN (SELECT r FROM rep)
             |    AND len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9)
             |SELECT id_a, id_b FROM star
             |UNION ALL SELECT id_a, id_b FROM reppairs""".stripMargin)),

    // ------------------------------------ incremental MinHash near-dup
    // Odd doc_ids arrive as the increment and probe the even-id corpus
    // through its persisted band index; only pairs touching the increment
    // emerge. Same detection-probability argument as q_dedup_minhash_neardup
    // (k=64/b=16 at threshold 0.9); the oracle is the exact all-pairs
    // Jaccard restricted to non-corpus-internal pairs.
    Q("q_dedup_minhash_incremental",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val incoming = docs.filter(col("doc_id") % 2 === 1)
        DedupFunctions.minhashNearDuplicatesIncremental(
          incoming, corpus,
          // production reads the PERSISTED side-table; scratch-materialize
          // the in-query stand-in once so it isn't re-shingled per consumer
          // (and leaves no persisted RDD behind)
          graft.util.Scratch.materialize(
            DedupFunctions.minhashBandIndex(corpus, "doc_id", "text"),
            "q_band_index", compact = false),
          "doc_id", "text", threshold = 0.9)
      },
      Some(s"""WITH sh AS (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  len(list_intersect(a.s, b.s)) /
             |    len(list_distinct(list_concat(a.s, b.s))) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |  AND len(list_intersect(a.s, b.s)) /
             |    len(list_distinct(list_concat(a.s, b.s))) >= 0.9""".stripMargin)),

    // --------------------------- INCREMENTAL near-dup EDGES (rep-scale)
    // The edge-form incremental: the odd-id increment collapses by exact
    // fingerprint, known content star-joins the even-id corpus reps with
    // NO banding, and only genuinely-new content probes the rep-collapsed
    // index. Oracle replays the exact construction: corpus rep classes,
    // cross/inc stars, then all-pairs Jaccard restricted to reps with a
    // new-content side.
    Q("q_dedup_edges_incremental",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val incoming = docs.filter(col("doc_id") % 2 === 1)
        DedupFunctions.minhashNearDupEdgesIncremental(
          incoming, corpus,
          graft.util.Scratch.materialize(
            DedupFunctions.repFingerprints(corpus, "doc_id", "text"),
            "q_rep_fps"),
          graft.util.Scratch.materialize(
            DedupFunctions.minhashRepBandIndex(corpus, "doc_id", "text"),
            "q_rep_index", compact = false),
          "doc_id", "text", threshold = 0.9)
      },
      Some(s"""WITH sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |fp AS MATERIALIZED (
             |  SELECT doc_id, md5($normSql) AS f FROM documents
             |  WHERE doc_id IN (SELECT doc_id FROM sh)),
             |crep AS (SELECT f, MIN(doc_id) AS r FROM fp
             |         WHERE doc_id % 2 = 0 GROUP BY f),
             |inc AS (SELECT doc_id, f FROM fp WHERE doc_id % 2 = 1),
             |cross_star AS (
             |  SELECT LEAST(c.r, i.doc_id) AS id_a,
             |    GREATEST(c.r, i.doc_id) AS id_b
             |  FROM inc i JOIN crep c ON i.f = c.f WHERE i.doc_id <> c.r),
             |newc AS (SELECT doc_id, f FROM inc
             |         WHERE f NOT IN (SELECT f FROM crep)),
             |irep AS (SELECT f, MIN(doc_id) AS r FROM newc GROUP BY f),
             |inc_star AS (
             |  SELECT ir.r AS id_a, n.doc_id AS id_b
             |  FROM newc n JOIN irep ir ON n.f = ir.f WHERE n.doc_id <> ir.r),
             |reps AS (SELECT r FROM crep UNION SELECT r FROM irep),
             |rep_pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE a.doc_id IN (SELECT r FROM reps)
             |    AND b.doc_id IN (SELECT r FROM reps)
             |    AND (a.doc_id IN (SELECT r FROM irep)
             |      OR b.doc_id IN (SELECT r FROM irep))
             |    AND len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9)
             |SELECT id_a, id_b FROM cross_star
             |UNION ALL SELECT id_a, id_b FROM inc_star
             |UNION ALL SELECT id_a, id_b FROM rep_pairs""".stripMargin)),

    // --------------------------------------- near-dup CLUSTER dedup
    // Pairs → connected components → keep min-id per component. The oracle
    // computes the same exact-Jaccard pairs, closes them transitively with a
    // recursive CTE, and keeps each component's min id.
    Q("q_dedup_cluster_drop",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        // closure consumer → component-equivalent edge form (star collapse),
        // not the C(m,2) full pair relation
        val pairs = DedupFunctions.minhashNearDupEdges(
          docs, "doc_id", "text", threshold = 0.9)
        DedupFunctions.dropNearDuplicateClusters(docs, pairs, "doc_id")
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(s"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |pairs AS MATERIALIZED (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9),
             |edges AS MATERIALIZED (
             |          SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |labels AS (
             |  SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
             |  FROM reach GROUP BY src)
             |SELECT d.doc_id, d.lang, d.source FROM documents d
             |LEFT JOIN labels l ON d.doc_id = l.id
             |WHERE l.id IS NULL OR l.cluster = d.doc_id""".stripMargin)),

    // ------------------------------------ CROSS-MODAL duplicate closure
    // Scraped pages duplicate along EITHER axis: same text re-hosted, or
    // the same image with rewritten boilerplate. One connected-component
    // closure over the UNION of heterogeneous pair sources (MinHash text
    // near-dups ∪ perceptual-hash image near-dups) labels both — the
    // composition a per-modality dedup cannot express (a text-dup of an
    // image-dup lands in ONE cluster). Oracle: both pair sets replay
    // exactly (all-pairs Jaccard; closed-form pixel dhashes), then the
    // same recursive-CTE closure as the text-only cluster oracles.
    Q("q_crossmodal_dedup",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        // component-equivalent text EDGES (identical-content star collapse
        // + rep-only LSH): the full pair relation is C(m,2) inside an
        // m-copy class — the 10x bench point measured ~73x executor work
        // on ~10x input before the collapse (round-9 finding #1)
        val textPairs = DedupFunctions.minhashNearDupEdges(
          docs, "doc_id", "text", threshold = 0.9)
        // component-equivalent EDGES, not the full pair relation: exact
        // dhash classes collapse to stars so the closure cost stays linear
        // in class size (the all-pairs form went quadratic at the 10x
        // bench point exactly where popular images repeat)
        // scratch: the edge builder references the hash relation from the
        // star collapse, member expansion and rep banding — unmaterialized,
        // each reference re-runs the ImageIO decode over the whole corpus
        // (the dominant cost of this query at the 10x/100x scale points)
        val imgPairs = graft.multimodal.Multimodal.imageNearDupEdges(
          graft.util.Scratch.materialize(
            graft.multimodal.Multimodal.imagePerceptualHashes(s,
              graft.multimodal.Multimodal.withFixtureMedia(s, docs)),
            "xm_img_hashes"),
          maxHamming = 2)
        DedupFunctions.foldClusterLabels(None,
          textPairs.unionByName(imgPairs))
          .select(col("id").as("doc_id"), col("cluster"))
      },
      Some(s"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |tpairs AS MATERIALIZED (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9),
             |${Align.imageDhashCtes},
             |ipairs AS MATERIALIZED (
             |  SELECT a.d AS id_a, b.d AS id_b
             |  FROM hs a JOIN hs b
             |    ON a.w = b.w AND a.h = b.h AND a.d < b.d
             |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 2),
             |allp AS MATERIALIZED (
             |  SELECT id_a, id_b FROM tpairs
             |  UNION SELECT id_a, id_b FROM ipairs),
             |edges AS MATERIALIZED (
             |  SELECT id_a AS src, id_b AS dst FROM allp
             |  UNION SELECT id_b, id_a FROM allp),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
             |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
             |FROM reach GROUP BY src""".stripMargin)),

    // ------------------------------- INCREMENTAL cluster-label maintenance
    // The label side-table analog of q_dedup_minhash_incremental: batch-
    // cluster the even-id corpus, then FOLD the odd-id increment's band-
    // probe pairs into the persisted labels (contracted union-find merge —
    // no full-graph re-propagation). The oracle ignores the staging
    // entirely and closes the FULL pair set with the recursive CTE: fold
    // output must equal batch clustering exactly.
    Q("q_dedup_cluster_incremental",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val base = docs.filter(col("doc_id") % 2 === 0)
        val inc = docs.filter(col("doc_id") % 2 === 1)
        // index-build class (bench-attributed): in production the labels
        // and band index PERSIST — each sync pays only the probe + fold.
        // ONE band index serves both the batch edge pass and the persisted
        // probe side (round 14): the former separate builds ran the
        // shingle+minhash projection over the base corpus twice per run.
        val t0 = System.nanoTime
        val bandIndex = graft.util.Scratch.materialize(
          DedupFunctions.minhashBandIndex(base, "doc_id", "text"),
          "base_band_index", compact = false)
        val baseLabels = DedupFunctions.foldClusterLabels(None,
          DedupFunctions.minhashNearDupEdges(base, "doc_id", "text",
            threshold = 0.9, prebuiltIndex = Some(bandIndex)))
        DedupFunctions.lastIndexBuildSec = (System.nanoTime - t0) / 1e9
        val incPairs = DedupFunctions.minhashNearDuplicatesIncremental(
          inc, base, bandIndex, "doc_id", "text", threshold = 0.9)
        DedupFunctions.foldClusterLabels(Some(baseLabels), incPairs)
          .select(col("id").as("doc_id"), col("cluster"))
      },
      Some(s"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |pairs AS MATERIALIZED (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9),
             |edges AS MATERIALIZED (
             |          SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
             |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
             |FROM reach GROUP BY src""".stripMargin)),

    // --------------------------------------- quality-aware cluster dedup
    // Same pair graph, but the LONGEST text per cluster survives (tie →
    // min id) instead of the arbitrary min-id copy — the curation variant
    // that keeps the cleanest extraction. Oracle: same recursive closure,
    // per-cluster argmax by (length DESC, id ASC).
    Q("q_dedup_keep_best",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        // closure consumer → edge form (see q_dedup_cluster_drop)
        val pairs = DedupFunctions.minhashNearDupEdges(
          docs, "doc_id", "text", threshold = 0.9)
        DedupFunctions.keepBestPerCluster(docs, pairs, "doc_id",
          length(col("text")))
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(s"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |pairs AS MATERIALIZED (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9),
             |edges AS MATERIALIZED (
             |          SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |labels AS (
             |  SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
             |  FROM reach GROUP BY src),
             |best AS (
             |  SELECT id FROM (
             |    SELECT l.id, ROW_NUMBER() OVER (PARTITION BY l.cluster
             |      ORDER BY length(d.text) DESC, l.id ASC) AS rn
             |    FROM labels l JOIN documents d ON l.id = d.doc_id)
             |  WHERE rn = 1)
             |SELECT d.doc_id, d.lang, d.source FROM documents d
             |LEFT JOIN labels l ON d.doc_id = l.id
             |WHERE l.id IS NULL OR d.doc_id IN (SELECT id FROM best)"""
        .stripMargin)),

    // ------------------------------------ leakage-aware cluster split
    // Near-dup clusters (same pair graph as q_dedup_cluster_drop) inherit
    // one split from their min-id representative; the oracle closes the
    // pairs with a recursive CTE and applies the same md5-threshold rule.
    Q("q_split_by_cluster",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        // closure consumer → edge form (see q_dedup_cluster_drop)
        val pairs = DedupFunctions.minhashNearDupEdges(
          docs, "doc_id", "text", threshold = 0.9)
        DedupFunctions.splitByCluster(docs, pairs, "doc_id",
          trainFraction = 0.8)
          .select(col("doc_id"), col("split_key"), col("split"))
      },
      Some(s"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, $shinglesSql AS s
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
             |  WHERE len(s) > 0),
             |pairs AS MATERIALIZED (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.s, b.s)) /
             |      len(list_distinct(list_concat(a.s, b.s))) >= 0.9),
             |edges AS MATERIALIZED (
             |          SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |labels AS (
             |  SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
             |  FROM reach GROUP BY src)
             |SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS split_key,
             |  CASE WHEN substr(md5(CAST(COALESCE(l.cluster, d.doc_id)
             |              AS VARCHAR)), 1, 8) < 'cccccccd'
             |       THEN 'train' ELSE 'validation' END AS split
             |FROM documents d LEFT JOIN labels l ON d.doc_id = l.id""".stripMargin)),

    // ------------------------------------------------ SimHash near-dup.
    // FULL oracle: the signature's token hash is the first 16 md5 hex chars
    // read as a 64-bit integer, so DuckDB reproduces the identical bit
    // votes; and the 4-band lookup is EXACT by pigeonhole (≤3 differing
    // bits → ≥1 identical 16-bit band), so the all-pairs Hamming filter
    // below is the complete answer, not a sample.
    Q("q_dedup_simhash_neardup",
      (s, dir) => DedupFunctions.simhashNearDuplicates(
        Tables.df(s, dir, "documents"), "doc_id", "text", maxHamming = 3),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(toks) AS t
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
             |votes AS (
             |  SELECT doc_id, b,
             |    SUM(CASE WHEN (CAST(concat('0x', substr(md5(t),1,16))
             |                        AS UBIGINT) >> b) & 1 = 1
             |        THEN 1 ELSE -1 END) AS v
             |  FROM tok, (SELECT unnest(range(64)) AS b) bb
             |  GROUP BY doc_id, b),
             |persig AS (
             |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1::UBIGINT << b
             |                               ELSE 0::UBIGINT END) AS UBIGINT) AS sim
             |  FROM votes GROUP BY doc_id),
             |sig AS (
             |  SELECT d.doc_id, CAST(COALESCE(s.sim, 0) AS UBIGINT) AS sim
             |  FROM documents d LEFT JOIN persig s ON d.doc_id = s.doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sim, b.sim)) <= 3""".stripMargin)),

    // ------------------------- SimHash near-dup EDGES (signature classes)
    // Identical-signature classes collapse to Hamming-0 stars; only
    // DISTINCT signatures enter the banded join. Unlike the MinHash edge
    // form this is EXACTLY component-equal (the pair predicate is a pure
    // function of signatures), and the oracle replays the whole
    // construction: signature classes, stars, rep pairs.
    Q("q_dedup_simhash_edges",
      (s, dir) => DedupFunctions.simhashNearDupEdges(
        Tables.df(s, dir, "documents"), "doc_id", "text", maxHamming = 3),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(toks) AS t
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
             |votes AS (
             |  SELECT doc_id, b,
             |    SUM(CASE WHEN (CAST(concat('0x', substr(md5(t),1,16))
             |                        AS UBIGINT) >> b) & 1 = 1
             |        THEN 1 ELSE -1 END) AS v
             |  FROM tok, (SELECT unnest(range(64)) AS b) bb
             |  GROUP BY doc_id, b),
             |persig AS (
             |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1::UBIGINT << b
             |                               ELSE 0::UBIGINT END) AS UBIGINT) AS sim
             |  FROM votes GROUP BY doc_id),
             |sig AS (
             |  SELECT d.doc_id, CAST(COALESCE(s.sim, 0) AS UBIGINT) AS sim
             |  FROM documents d LEFT JOIN persig s ON d.doc_id = s.doc_id),
             |rep AS (SELECT sim, MIN(doc_id) AS r FROM sig GROUP BY sim),
             |star AS (
             |  SELECT rep.r AS id_a, s.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
             |  FROM sig s JOIN rep ON s.sim = rep.sim WHERE s.doc_id <> rep.r),
             |reppairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
             |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |  WHERE a.doc_id IN (SELECT r FROM rep)
             |    AND b.doc_id IN (SELECT r FROM rep)
             |    AND bit_count(xor(a.sim, b.sim)) <= 3)
             |SELECT id_a, id_b, hamming FROM star
             |UNION ALL SELECT id_a, id_b, hamming FROM reppairs""".stripMargin)),

    // --------------------------------- INCREMENTAL SimHash near-dup.
    // The persisted-index shape: even-id docs are the corpus (its band
    // index stands in for the maintained side table), odd-id docs the
    // increment; the probe must find EXACTLY the all-pairs result
    // restricted to pairs with ≥1 incoming side — same pigeonhole
    // exactness as the batch path, so the oracle is the batch oracle
    // plus the not-both-corpus restriction. The corpus text is never
    // re-tokenized: signatures ride in the index.
    Q("q_dedup_simhash_incremental",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        DedupFunctions.simhashNearDuplicatesIncremental(
          docs.filter(col("doc_id") % 2 === 1),
          // production reads the PERSISTED side-table; scratch-materialize
          // the in-query stand-in (no leaked RDD, built once)
          graft.util.Scratch.materialize(
            DedupFunctions.simhashBandIndex(
              docs.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
            "q_simhash_index", compact = false),
          "doc_id", "text", maxHamming = 3)
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(toks) AS t
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
             |votes AS (
             |  SELECT doc_id, b,
             |    SUM(CASE WHEN (CAST(concat('0x', substr(md5(t),1,16))
             |                        AS UBIGINT) >> b) & 1 = 1
             |        THEN 1 ELSE -1 END) AS v
             |  FROM tok, (SELECT unnest(range(64)) AS b) bb
             |  GROUP BY doc_id, b),
             |persig AS (
             |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1::UBIGINT << b
             |                               ELSE 0::UBIGINT END) AS UBIGINT) AS sim
             |  FROM votes GROUP BY doc_id),
             |sig AS (
             |  SELECT d.doc_id, CAST(COALESCE(s.sim, 0) AS UBIGINT) AS sim
             |  FROM documents d LEFT JOIN persig s ON d.doc_id = s.doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sim, b.sim)) <= 3
             |  AND NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)""".stripMargin)),

    // ----------------------------------------------------------- text analysis
    // --------------------------------------- Unicode normalization (NFC)
    // The fixture text is pure ASCII, so the query PLANTS decomposed accent
    // sequences (a + U+0301, i + U+0308) deterministically and checks the
    // codegen'd normalizer composes (NFC) and folds (strip accents) them
    // exactly as DuckDB's nfc_normalize/strip_accents do.
    Q("q_unicode_normalize",
      (s, dir) => {
        import graft.functions.exprs.unicode_normalize
        val dirty = concat(lit("cafe\u0301 nai\u0308ve "), col("text"))
        Tables.df(s, dir, "documents")
          .select(col("doc_id"),
            unicode_normalize(dirty).as("norm"),
            unicode_normalize(dirty, stripAccents = true).as("folded"),
            (length(unicode_normalize(dirty)) < length(dirty)).as("composed"))
      },
      Some("""SELECT doc_id,
             |  nfc_normalize('cafe' || chr(769) || ' nai' || chr(776) || 've '
             |    || text) AS norm,
             |  strip_accents(nfc_normalize('cafe' || chr(769) || ' nai'
             |    || chr(776) || 've ' || text)) AS folded,
             |  len(nfc_normalize('cafe' || chr(769) || ' nai' || chr(776)
             |    || 've ' || text)) <
             |    len('cafe' || chr(769) || ' nai' || chr(776) || 've ' || text)
             |    AS composed
             |FROM documents""".stripMargin)),

    // ----------------------------- custom expressions on the SQL surface
    // GraftFunctions.register puts the engine's custom Catalyst expressions
    // into the session's function registry (the runtime face of the
    // spark.sql.extensions injector, GraftExtensions) — pure-SQL users get
    // normalization and z-ordering; the oracle replays z_value's bit
    // interleave arithmetically and NFKC-over-ASCII as identity.
    Q("q_sql_custom_functions",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables.registerAll(s, dir)
        s.sql("""SELECT doc_id,
                 unicode_normalize(text, 'NFKC') AS norm,
                 z_value(array(CAST(doc_id % 16 AS INT),
                               CAST(n_chars % 16 AS INT)), 4) AS z
                 FROM documents""")
      },
      Some("""SELECT doc_id, text AS norm,
             |  CAST((SELECT SUM((((doc_id % 16) >> j) & 1) * (1 << (2*j)) +
             |              (((n_chars % 16) >> j) & 1) * (1 << (2*j + 1)))
             |   FROM generate_series(0, 3) t(j)) AS BIGINT) AS z
             |FROM documents""".stripMargin)),

    Q("q_text_analysis",
      (s, dir) => TextFunctions.analyze(Tables.df(s, dir, "documents"))
        .select(col("doc_id"), col("lang_pred"), col("word_cnt"),
          col("bpeish_tokens"), col("punct_ratio"), col("stopword_ratio"),
          col("quality"), col("fingerprint")),
      Some(s"""WITH scored AS (
             |  SELECT doc_id, text,
             |    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|for|with|on)\\b')) AS s_en,
             |    len(regexp_extract_all(lower(text), '\\b(el|la|los|las|de|que|y|en|un|una|por)\\b')) AS s_es,
             |    len(regexp_extract_all(lower(text), '\\b(le|la|les|des|une|est|et|dans|pour|sur)\\b')) AS s_fr,
             |    len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|ein|eine|mit|für|auf)\\b')) AS s_de,
             |    len(regexp_extract_all(lower(text), '[\\x{4e00}-\\x{9fff}]')) AS s_zh,
             |    len(list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)) AS word_cnt,
             |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpeish_tokens,
             |    CASE WHEN len(text) = 0 THEN 0.0
             |      ELSE len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / len(text) END AS punct_ratio,
             |    len(regexp_extract_all(text, '[A-Za-z0-9]')) AS alnum_chars
             |  FROM documents),
             |feat AS (
             |  SELECT *,
             |    greatest(s_en, s_es, s_fr, s_de, s_zh) AS best,
             |    CASE WHEN word_cnt = 0 THEN 0.0 ELSE s_en / word_cnt END AS stopword_ratio,
             |    CASE WHEN word_cnt = 0 THEN 0.0 ELSE alnum_chars / word_cnt END AS mwl
             |  FROM scored)
             |SELECT doc_id,
             |  CASE WHEN best <= 0 THEN 'und'
             |       WHEN s_en = best THEN 'en' WHEN s_es = best THEN 'es'
             |       WHEN s_fr = best THEN 'fr' WHEN s_de = best THEN 'de'
             |       ELSE 'zh' END AS lang_pred,
             |  word_cnt, bpeish_tokens, punct_ratio, stopword_ratio,
             |  (CAST(len(text) BETWEEN 50 AND 100000 AS INT) +
             |   CAST(punct_ratio <= 0.3 AS INT) +
             |   CAST(stopword_ratio >= 0.01 AS INT) +
             |   CAST(mwl BETWEEN 2 AND 12 AS INT)) / 4.0 AS quality,
             |  md5($normSql) AS fingerprint
             |FROM feat""".stripMargin)),

    // ------------------------------------------------------- PII redaction
    // Deterministic synthetic PII (email/phone/SSN/IP built from doc_id) is
    // appended on BOTH engines, then scrubbed with the same lookaround-free
    // patterns (Java regex == RE2 on this subset) → exact parity on the
    // redacted text and the per-rule hit counts.
    Q("q_pii_redact",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val t = concat(lit("Contact u"), col("doc_id").cast("string"),
          lit("@example.com or 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ssn 123-45-6789 ip 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".1 "), col("text"))
        val counts = TextFunctions.piiCounts(t)
          .map { case (n, c) => c.cast("long").as(n) }
        docs.select(col("doc_id") +:
          TextFunctions.redactPii(t).as("redacted") +: counts: _*)
      },
      Some {
        val Seq((emailPat, _), (ssnPat, _), (phonePat, _), (ipPat, _)) =
          TextFunctions.PiiRules
        s"""WITH p AS (
           |  SELECT doc_id,
           |    'Contact u' || CAST(doc_id AS VARCHAR) ||
           |    '@example.com or 555-867-' ||
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           |    ' ssn 123-45-6789 ip 10.0.' ||
           |    CAST(doc_id % 256 AS VARCHAR) || '.1 ' || text AS t
           |  FROM documents),
           |r1 AS (SELECT doc_id,
           |    CAST(len(regexp_extract_all(t, '$emailPat')) AS BIGINT) AS n_email,
           |    regexp_replace(t, '$emailPat', '<EMAIL>', 'g') AS t2 FROM p),
           |r2 AS (SELECT doc_id, n_email,
           |    CAST(len(regexp_extract_all(t2, '$ssnPat')) AS BIGINT) AS n_ssn,
           |    regexp_replace(t2, '$ssnPat', '<SSN>', 'g') AS t3 FROM r1),
           |r3 AS (SELECT doc_id, n_email, n_ssn,
           |    CAST(len(regexp_extract_all(t3, '$phonePat')) AS BIGINT) AS n_phone,
           |    regexp_replace(t3, '$phonePat', '<PHONE>', 'g') AS t4 FROM r2),
           |r4 AS (SELECT doc_id, n_email, n_ssn, n_phone,
           |    CAST(len(regexp_extract_all(t4, '$ipPat')) AS BIGINT) AS n_ip,
           |    regexp_replace(t4, '$ipPat', '<IP>', 'g') AS redacted FROM r3)
           |SELECT doc_id, redacted, n_email, n_ssn, n_phone, n_ip
           |FROM r4""".stripMargin
      }),

    // --------------------------------------------- Gopher repetition stats
    // Duplicate lines are forced deterministically (text is framed by its own
    // first 80 chars on both engines) so the duplicate-line/char fractions
    // exercise real repetition, not a constant-zero path.
    Q("q_repetition_stats",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 80), lit("\n"), col("text"),
              lit("\n"), substring(col("text"), 1, 80)).as("text"))
        graft.functions.CorpusFunctions.repetitionStats(docs, "doc_id", "text")
      },
      Some(s"""WITH p AS (
             |  SELECT doc_id, substr(text, 1, 80) || chr(10) || text ||
             |    chr(10) || substr(text, 1, 80) AS t
             |  FROM documents),
             |l AS (SELECT doc_id,
             |        unnest(list_filter(string_split(t, chr(10)),
             |          x -> len(x) > 0)) AS line
             |      FROM p),
             |g AS (SELECT doc_id, line, COUNT(*) AS n, len(line) AS len
             |      FROM l GROUP BY doc_id, line),
             |ls AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_lines,
             |         COUNT(*) AS n_distinct,
             |         CAST(SUM(n * len) AS BIGINT) AS n_chars,
             |         CAST(SUM(CASE WHEN n > 1 THEN n * len ELSE 0 END)
             |           AS BIGINT) AS dup_chars
             |       FROM g GROUP BY doc_id),
             |w AS (SELECT doc_id, unnest($toksSql) AS w
             |      FROM (SELECT doc_id, t AS text FROM p)),
             |wg AS (SELECT doc_id, w, COUNT(*) AS n FROM w GROUP BY doc_id, w),
             |ws AS (SELECT doc_id, MAX(n) * 1.0 / CAST(SUM(n) AS BIGINT)
             |         AS top_word_frac
             |       FROM wg GROUP BY doc_id)
             |SELECT ls.doc_id, n_lines,
             |  (n_lines - n_distinct) * 1.0 / n_lines AS dup_line_frac,
             |  CASE WHEN n_chars = 0 THEN 0.0
             |    ELSE dup_chars * 1.0 / n_chars END AS dup_char_frac,
             |  ws.top_word_frac
             |FROM ls JOIN ws ON ls.doc_id = ws.doc_id""".stripMargin)),

    // ------------------------------------------------- TF-IDF top terms
    // Per-doc top-5 keyword terms; ranking on round(tfidf, 6) + term so
    // last-ulp ln() differences between engines can't flip ranks.
    Q("q_tfidf_topk",
      (s, dir) => graft.functions.CorpusFunctions.tfidfTopTerms(
        Tables.df(s, dir, "documents"), "doc_id", "text", k = 5)
        .withColumn("tfidf", round(col("tfidf"), 6)),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY doc_id, term),
             |sc AS (SELECT doc_id, term, tf,
             |         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
             |       FROM tf),
             |s2 AS (SELECT *, tf * ln((SELECT COUNT(*) FROM documents) * 1.0
             |         / df) AS tfidf FROM sc),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |         ORDER BY round(tfidf, 6) DESC, term) AS rn FROM s2)
             |SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf, rn
             |FROM r WHERE rn <= 5""".stripMargin)),

    // ----------------------------------------------- BM25 top-k retrieval
    // Okapi BM25 over three probe queries — the keyword half of hybrid
    // retrieval (the ANN queries are the embedding half). Per-term
    // contributions are rounded to 6 decimals and summed as DECIMAL(18,6),
    // so scores are order-independent and engine-exact; the oracle replays
    // the identical formula with the identical association order.
    Q("q_bm25_topk",
      (s, dir) => graft.functions.CorpusFunctions.bm25TopK(
        Tables.df(s, dir, "documents"), "doc_id", "text",
        queries = bm25Probes, k = 10),
      Some(bm25OracleSql)),

    // ------------------------- INCREMENTAL BM25 (persisted inverted index)
    // Two increments fold into one postings+doclen state (pure append —
    // new-docs-only contract), then scoring runs from the INDEX, never the
    // corpus. Because the fold is exactly chunk-invariant and
    // bm25FromIndex replays bm25TopK's arithmetic, the oracle is the BATCH
    // BM25 SQL verbatim — the strongest possible equality for an
    // incremental index: fold-then-score == rescore-the-world.
    Q("q_bm25_incremental",
      (s, dir) => {
        import graft.functions.CorpusFunctions
        val docs = Tables.df(s, dir, "documents")
        val chunks = Seq(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1))
        val index = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (p, c) => Some(CorpusFunctions.foldBm25Index(p, c, "doc_id", "text"))
        }.get
        CorpusFunctions.bm25FromIndex(index, bm25Probes, k = 10)
          .withColumnRenamed("id", "doc_id")
      },
      Some(bm25OracleSql)),

    // ------------------------------------- hybrid retrieval (RRF fusion)
    // Keyword BM25 ranks over documents + exact cosine ranks over the
    // aligned embeddings (vec_id ≡ doc_id), fused by reciprocal-rank
    // fusion. Both rankers are deterministic, contributions are
    // decimal-summed, so the fused list carries a full value oracle that
    // replays the whole composition.
    Q("q_hybrid_retrieval",
      (s, dir) => {
        import graft.functions.{CorpusFunctions, VectorFunctions}
        val bm = CorpusFunctions.bm25TopK(
          Tables.df(s, dir, "documents"), "doc_id", "text",
          queries = Seq((0L, "spark join merge"), (1L, "vector scan filter"),
            (2L, "window agg stream")),
          k = 20)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val emb = Tables.df(s, dir, "embeddings")
        val ann = VectorFunctions.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 3)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank").cast("long").as("rank"))
        CorpusFunctions.rrfFuse(Seq(bm, ann), "query_id", "doc_id",
          "rank", k = 10)
      },
      Some(s"""WITH q(query_id, qtext) AS (VALUES
             |    (0, 'spark join merge'), (1, 'vector scan filter'),
             |    (2, 'window agg stream')),
             |qt AS (SELECT query_id, unnest(list_distinct(
             |    list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'),
             |                t -> len(t) > 0))) AS term FROM q),
             |tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
             |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
             |       FROM tok GROUP BY doc_id),
             |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) /
             |    (SELECT COUNT(*) FROM documents) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM tok WHERE term IN (SELECT DISTINCT term FROM qt)
             |       GROUP BY doc_id, term),
             |sc AS (SELECT doc_id, term, tf,
             |         CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) AS df
             |       FROM tf),
             |con AS (SELECT qt.query_id, sc.doc_id,
             |    CAST(round(
             |      ln(1.0 + ((SELECT COUNT(*) FROM documents) - df + 0.5)
             |               / (df + 0.5))
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
             |      6) AS DECIMAL(18,6)) AS contrib
             |  FROM sc JOIN qt USING (term) JOIN dl USING (doc_id), stats),
             |bmagg AS (SELECT query_id, doc_id, SUM(contrib) AS score_dec
             |       FROM con GROUP BY 1, 2),
             |bm AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
             |         PARTITION BY query_id ORDER BY score_dec DESC, doc_id)
             |         AS rank FROM bmagg QUALIFY rank <= 20),
             |aq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |       FROM embeddings WHERE vec_id < 3),
             |ann AS (SELECT query_id, vec_id AS doc_id, ROW_NUMBER() OVER (
             |         PARTITION BY query_id
             |         ORDER BY list_cosine_similarity(
             |           embedding::DOUBLE[], qv) DESC, vec_id) AS rank
             |       FROM embeddings CROSS JOIN aq
             |       WHERE vec_id <> query_id QUALIFY rank <= 20),
             |fused AS (
             |  SELECT query_id, doc_id,
             |    CAST(round(1.0 / (60.0 + rank), 9) AS DECIMAL(18,9)) AS rrf
             |  FROM bm
             |  UNION ALL
             |  SELECT query_id, doc_id,
             |    CAST(round(1.0 / (60.0 + rank), 9) AS DECIMAL(18,9)) AS rrf
             |  FROM ann),
             |agg2 AS (SELECT query_id, doc_id, SUM(rrf) AS rrf_dec,
             |         CAST(COUNT(*) AS BIGINT) AS n_rankers
             |       FROM fused GROUP BY 1, 2),
             |r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |         ORDER BY rrf_dec DESC, doc_id) AS rank FROM agg2)
             |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             |  CAST(rrf_dec AS DOUBLE) AS rrf_score, n_rankers,
             |  CAST(rank AS BIGINT) AS rank
             |FROM r2 WHERE rank <= 10""".stripMargin)),

    // ------------------------------------------- vocabulary statistics
    // Type-token ratio and hapax share per (source, lang); integer counts
    // and single exact divisions → engine-exact.
    Q("q_vocab_stats",
      (s, dir) => graft.functions.CorpusFunctions.vocabularyStats(
        Tables.df(s, dir, "documents"), "text", Seq("source", "lang")),
      Some(s"""WITH tok AS (
             |  SELECT source, lang, unnest($toksSql) AS term FROM documents),
             |tf AS (SELECT source, lang, term, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM tok GROUP BY 1, 2, 3)
             |SELECT source, lang,
             |  CAST(SUM(n) AS BIGINT) AS n_tokens,
             |  CAST(COUNT(*) AS BIGINT) AS n_terms,
             |  COUNT(*) * 1.0 / CAST(SUM(n) AS BIGINT) AS type_token_ratio,
             |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1.0
             |    / COUNT(*) AS hapax_share
             |FROM tf GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------- unigram log-prob fluency score
    // Unigram log-probability mass under the corpus's own LM. Per-term
    // log-probs round to 4 decimals and sum as DECIMAL on both engines, so
    // ln() ulp differences and summation order can't flip the hash. The
    // driver compares the EXACT columns (n_tokens, sum_logprob); the
    // operator's avg_logprob is a float quotient of the two — rounding that
    // quotient is not engine-stable, so it stays out of the hash check.
    Q("q_unigram_logprob",
      (s, dir) => graft.functions.CorpusFunctions.unigramLogProbScores(
        Tables.df(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("sum_logprob")),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |lm AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c
             |       FROM tf GROUP BY term),
             |lp AS (SELECT term,
             |         CAST(round(ln(c * 1.0 / CAST(SUM(c) OVER () AS BIGINT)), 4)
             |           AS DECIMAL(28,4)) AS lp
             |       FROM lm)
             |SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |  CAST(SUM(tf * lp) AS DOUBLE) AS sum_logprob
             |FROM tf JOIN lp USING (term)
             |GROUP BY tf.doc_id""".stripMargin)),

    // --------------------------------------------- bigram LM fluency
    // Corpus-own add-1-smoothed bigram model: per-doc exact decimal sum of
    // log P(w2|w1). Head counts derive from pair counts (not raw unigrams)
    // so both engines share one definition; per-term 4-decimal rounding
    // absorbs ln() ulp differences (the unigram technique).
    Q("q_bigram_logprob",
      (s, dir) => graft.functions.CorpusFunctions.bigramLogProbScores(
        Tables.df(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("sum_logprob")),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |pr AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             |       FROM t, unnest(range(1, len(toks))) u(i)
             |       WHERE len(toks) >= 2),
             |pf AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS pf
             |       FROM pr GROUP BY 1, 2, 3),
             |c12 AS (SELECT w1, w2, CAST(SUM(pf) AS BIGINT) AS c12
             |        FROM pf GROUP BY 1, 2),
             |v AS (SELECT COUNT(DISTINCT tok) AS v
             |      FROM (SELECT unnest(toks) AS tok FROM t)),
             |lp AS (SELECT w1, w2,
             |         CAST(round(ln((c12 + 1) * 1.0 /
             |           (SUM(c12) OVER (PARTITION BY w1) + v.v)), 4)
             |           AS DECIMAL(28,4)) AS lp
             |       FROM c12, v)
             |SELECT pf.doc_id, CAST(SUM(pf) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(pf * lp) AS DOUBLE) AS sum_logprob
             |FROM pf JOIN lp USING (w1, w2)
             |GROUP BY pf.doc_id""".stripMargin)),

    // --------------------------------------- Kneser-Ney bigram LM fluency
    // The production n-gram smoother (KenLM's default) with D = 0.75:
    // discounted seen mass + continuation-count backoff. Corpus-own, so
    // every scored pair is seen; the two-term probability is mirrored
    // parenthesis-for-parenthesis in the oracle and the per-pair log
    // rounds to a 4-decimal decimal before the exact doc sum.
    Q("q_kn_logprob",
      (s, dir) => graft.functions.CorpusFunctions.knLogProbScores(
        Tables.df(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("sum_logprob")),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |pr AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             |       FROM t, unnest(range(1, len(toks))) u(i)
             |       WHERE len(toks) >= 2),
             |pf AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS pf
             |       FROM pr GROUP BY 1, 2, 3),
             |c12 AS (SELECT w1, w2, CAST(SUM(pf) AS BIGINT) AS c12
             |        FROM pf GROUP BY 1, 2),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1tot FROM c12),
             |lp AS (SELECT w1, w2,
             |    CAST(round(ln(
             |      ((c12 - 0.75)
             |        / CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE)) +
             |      ((0.75 * CAST(COUNT(*) OVER (PARTITION BY w1) AS DOUBLE))
             |        / CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE)) *
             |      (CAST(COUNT(*) OVER (PARTITION BY w2) AS DOUBLE)
             |        / CAST(tot.n1tot AS DOUBLE))), 4)
             |      AS DECIMAL(28,4)) AS lp
             |  FROM c12, tot)
             |SELECT pf.doc_id, CAST(SUM(pf) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(pf * lp) AS DOUBLE) AS sum_logprob
             |FROM pf JOIN lp USING (w1, w2)
             |GROUP BY pf.doc_id""".stripMargin)),

    // ------------------------------------ DSIR importance-weighted selection
    // Hashed-n-gram importance resampling (Xie 2023): srcs 0-1 play the
    // trusted target, the rest is the raw pool; top-100 by exact decimal
    // log-likelihood-ratio weight. 256 md5 buckets over unigrams+bigrams;
    // every count, smoothed ratio and rank replays in the oracle.
    Q("q_dsir_select",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val half = expr("CAST(substring(source, 4) AS INT)")
        graft.functions.CorpusFunctions.dsirSelect(
          docs.filter(half >= 2), docs.filter(half < 2),
          "doc_id", "text", k = 100)
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks
             |           FROM documents),
             |tgt AS (SELECT * FROM t WHERE CAST(substr(source, 4) AS INT) < 2),
             |cor AS (SELECT * FROM t
             |        WHERE CAST(substr(source, 4) AS INT) >= 2),
             |tfeat AS (SELECT unnest(toks) AS f FROM tgt
             |          UNION ALL
             |          SELECT toks[i] || ' ' || toks[i+1]
             |          FROM tgt, unnest(range(1, len(toks))) u(i)
             |          WHERE len(toks) >= 2),
             |cfeat AS (SELECT doc_id, unnest(toks) AS f FROM cor
             |          UNION ALL
             |          SELECT doc_id, toks[i] || ' ' || toks[i+1]
             |          FROM cor, unnest(range(1, len(toks))) u(i)
             |          WHERE len(toks) >= 2),
             |tc AS (SELECT (strpos('0123456789abcdef', substr(md5(f), 1, 1))
             |          - 1) * 16
             |        + strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1
             |          AS b,
             |        CAST(COUNT(*) AS BIGINT) AS tcn
             |       FROM tfeat GROUP BY 1),
             |cfb AS (SELECT doc_id,
             |        (strpos('0123456789abcdef', substr(md5(f), 1, 1))
             |          - 1) * 16
             |        + strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1
             |          AS b,
             |        CAST(COUNT(*) AS BIGINT) AS cf
             |       FROM cfeat GROUP BY 1, 2),
             |rc AS (SELECT b, CAST(SUM(cf) AS BIGINT) AS rcn
             |       FROM cfb GROUP BY 1),
             |tots AS (SELECT (SELECT COALESCE(SUM(tcn), 0) FROM tc) AS tt,
             |                (SELECT COALESCE(SUM(rcn), 0) FROM rc) AS rt),
             |r AS (SELECT COALESCE(tc.b, rc.b) AS b,
             |        CAST(round(
             |          ln((COALESCE(tcn, 0) + 1) * 1.0 / (tt + 256)) -
             |          ln((COALESCE(rcn, 0) + 1) * 1.0 / (rt + 256)), 6)
             |          AS DECIMAL(18,6)) AS lr
             |      FROM tc FULL OUTER JOIN rc ON tc.b = rc.b, tots),
             |sel AS (SELECT doc_id, CAST(SUM(cf) AS BIGINT) AS n_features,
             |          SUM(cf * lr) AS w
             |        FROM cfb JOIN r USING (b) GROUP BY 1),
             |rk AS (SELECT doc_id,
             |         ROW_NUMBER() OVER (ORDER BY w DESC, doc_id) AS rank,
             |         n_features, CAST(w AS DOUBLE) AS weight
             |       FROM sel)
             |SELECT doc_id, CAST(rank AS BIGINT) AS rank, n_features, weight
             |FROM rk WHERE rank <= 100""".stripMargin)),

    // ----------------------- cross-corpus LM scoring (the true CCNet shape)
    // Train the bigram LM on a REFERENCE slice (doc_id % 3 = 0, the
    // "Wikipedia" stand-in) and score the remaining docs under it, with
    // the standard add-1 unseen backstops (unseen pair → 1/(c1+V), unseen
    // head → 1/V). Per-pair log-probs are 4-decimal decimals, so every
    // score replays.
    Q("q_lm_cross_score",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        graft.functions.CorpusFunctions.bigramLogProbScoresAgainst(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
          .select(col("doc_id"), col("n_bigrams"), col("sum_logprob"))
      },
      Some(s"""WITH rt AS (SELECT doc_id, $toksSql AS toks FROM documents
             |            WHERE doc_id % 3 = 0),
             |tt AS (SELECT doc_id, $toksSql AS toks FROM documents
             |       WHERE doc_id % 3 <> 0),
             |rp AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |       FROM rt, unnest(range(1, len(toks))) u(i)
             |       WHERE len(toks) >= 2),
             |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
             |        FROM rp GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
             |       FROM c12 GROUP BY 1),
             |v AS (SELECT COUNT(DISTINCT tok) AS v
             |      FROM (SELECT unnest(toks) AS tok FROM rt)),
             |tp AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             |       FROM tt, unnest(range(1, len(toks))) u(i)
             |       WHERE len(toks) >= 2),
             |pfc AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS pf
             |        FROM tp GROUP BY 1, 2, 3),
             |sc AS (SELECT p.doc_id, p.pf,
             |    CAST(round(ln((COALESCE(c12.c12, 0) + 1) * 1.0 /
             |      (COALESCE(c1.c1, 0) + v.v)), 4) AS DECIMAL(28,4)) AS lp
             |  FROM pfc p LEFT JOIN c12 USING (w1, w2)
             |  LEFT JOIN c1 USING (w1), v)
             |SELECT doc_id, CAST(SUM(pf) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(pf * lp) AS DOUBLE) AS sum_logprob
             |FROM sc GROUP BY doc_id""".stripMargin)),

    // ---------------------------- CCNet-style per-language perplexity bands
    // Lang-stratified head/middle/tail by corpus-own bigram-LM fluency —
    // the Wenzek-2020 filter shape. percent_rank over a tie-free total
    // order is one integer division; the band cut replays exactly.
    Q("q_perplexity_bands",
      (s, dir) => graft.functions.CorpusFunctions.perplexityBands(
        Tables.df(s, dir, "documents"), "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          round(col("pr"), 6).as("pr6"), col("band")),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             |       FROM t, unnest(range(1, len(toks))) u(i)
             |       WHERE len(toks) >= 2),
             |pf AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS pf
             |       FROM pairs GROUP BY 1, 2, 3),
             |c12 AS (SELECT w1, w2, CAST(SUM(pf) AS BIGINT) AS c12
             |        FROM pf GROUP BY 1, 2),
             |v AS (SELECT COUNT(DISTINCT tok) AS v
             |      FROM (SELECT unnest(toks) AS tok FROM t)),
             |lp AS (SELECT w1, w2,
             |         CAST(round(ln((c12 + 1) * 1.0 /
             |           (SUM(c12) OVER (PARTITION BY w1) + v.v)), 4)
             |           AS DECIMAL(28,4)) AS lp
             |       FROM c12, v),
             |score AS (SELECT pf.doc_id, CAST(SUM(pf) AS BIGINT) AS n_bigrams,
             |    CAST(SUM(pf * lp) AS DOUBLE) /
             |      CAST(CAST(SUM(pf) AS BIGINT) AS DOUBLE) AS avg_lp
             |  FROM pf JOIN lp USING (w1, w2)
             |  GROUP BY pf.doc_id),
             |b AS (SELECT s.doc_id, d.lang, s.n_bigrams,
             |    PERCENT_RANK() OVER (PARTITION BY d.lang
             |      ORDER BY s.avg_lp DESC, s.doc_id ASC) AS pr
             |  FROM score s JOIN documents d USING (doc_id))
             |SELECT doc_id, lang, n_bigrams, round(pr, 6) AS pr6,
             |  CASE WHEN pr < 0.3 THEN 'head'
             |       WHEN pr < 0.6 THEN 'middle'
             |       ELSE 'tail' END AS band
             |FROM b""".stripMargin)),

    // ------------------------------------------------- sequence packing
    // Whole-document packing into 2048-token training sequences per source
    // stream; integer running sum + integer div → exact cross-engine parity.
    Q("q_pack_sequences",
      (s, dir) => graft.functions.CorpusFunctions.packSequences(
        Tables.df(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.wordCount(col("text")).as("wc")),
        tokenCol = col("wc"), orderCol = "doc_id", budget = 2048L,
        groupCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"), col("seq_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'),
             |        t -> len(t) > 0)) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT *, CAST(SUM(n_tokens) OVER (
             |      PARTITION BY source ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM t)
             |SELECT doc_id, source, n_tokens, cum_tokens,
             |  (cum_tokens - n_tokens) // 2048 AS seq_id
             |FROM c""".stripMargin)),

    // -------------------------------------------- corpus-wide line dedup
    // C4-style boilerplate scrub: a constant banner line plus each doc's
    // own first-60-chars line are framed around the text on BOTH engines,
    // so real cross-document duplicate lines exist; only the first
    // occurrence corpus-wide survives and docs are reassembled in order.
    Q("q_dedup_lines_global",
      (s, dir) => graft.functions.CorpusFunctions.dedupLinesGlobal(
        Tables.df(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("== graft corpus banner ==\n"), col("text"),
              lit("\n"), substring(col("text"), 1, 60)).as("text")),
        "doc_id", "text"),
      Some("""WITH p AS (
             |  SELECT doc_id, string_split('== graft corpus banner ==' ||
             |    chr(10) || text || chr(10) || substr(text, 1, 60),
             |    chr(10)) AS parts
             |  FROM documents),
             |l AS (
             |  SELECT doc_id, unnest(parts) AS line,
             |         generate_subscripts(parts, 1) AS pos
             |  FROM p),
             |r AS (
             |  SELECT doc_id, pos, line,
             |    CASE WHEN len(line) = 0 THEN 1
             |         ELSE ROW_NUMBER() OVER (PARTITION BY line
             |                ORDER BY doc_id, pos) END AS rn
             |  FROM l)
             |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             |       CAST(COUNT(*) AS BIGINT) AS n_lines_kept
             |FROM r WHERE rn = 1
             |GROUP BY doc_id""".stripMargin)),

    // ------------------------------------------ WITHIN-doc line dedup (C4)
    // The input doubles each doc's own body plus a repeated banner, so real
    // within-document duplicate lines exist; cross-doc duplicates must
    // SURVIVE (that is dedup_lines_global's job, not this one's).
    Q("q_dedup_lines_within",
      (s, dir) => graft.functions.CorpusFunctions.dedupLinesWithinDoc(
        Tables.df(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("== graft corpus banner ==\n"), col("text"),
              lit("\n== graft corpus banner ==\n"), col("text")).as("text")),
        "doc_id", "text"),
      Some("""WITH p AS (
             |  SELECT doc_id, string_split('== graft corpus banner ==' ||
             |    chr(10) || text || chr(10) || '== graft corpus banner ==' ||
             |    chr(10) || text, chr(10)) AS parts
             |  FROM documents),
             |l AS (
             |  SELECT doc_id, unnest(parts) AS line,
             |         generate_subscripts(parts, 1) AS pos
             |  FROM p),
             |r AS (
             |  SELECT doc_id, pos, line,
             |    CASE WHEN len(line) = 0 THEN 1
             |         ELSE ROW_NUMBER() OVER (PARTITION BY doc_id, line
             |                ORDER BY pos) END AS rn
             |  FROM l)
             |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             |       CAST(COUNT(*) AS BIGINT) AS n_lines_kept
             |FROM r WHERE rn = 1
             |GROUP BY doc_id""".stripMargin)),

    // --------------------------- span-level verbatim dedup (suffix-array analog)
    // Cross-document repeated 8-token windows, merged into maximal spans per
    // doc — the distributable form of suffix-array dedup (Lee et al. 2022).
    // The fixture's near-duplicate docs give real cross-doc verbatim spans.
    Q("q_dedup_span_stats",
      (s, dir) => graft.functions.DedupFunctions.repeatedSpanStats(
        Tables.df(s, dir, "documents"), "doc_id", "text", window = 8),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |w AS (SELECT doc_id, s AS pos,
             |        md5(array_to_string(toks[s+1:s+8], ' ')) AS h
             |      FROM t, unnest(range(0, len(toks) - 8 + 1)) u(s)
             |      WHERE len(toks) >= 8),
             |rep AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM w)
             |        GROUP BY h HAVING COUNT(*) >= 2),
             |hits AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM rep)),
             |flg AS (SELECT doc_id, pos,
             |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
             |           ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS nw FROM hits),
             |sp AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY doc_id
             |         ORDER BY pos) AS span_id FROM flg),
             |agg AS (SELECT doc_id, span_id, COUNT(*) AS n,
             |          MAX(pos) - MIN(pos) + 8 AS cov FROM sp GROUP BY 1, 2),
             |per AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_repeated_windows,
             |          COUNT(*) AS n_spans, CAST(SUM(cov) AS BIGINT) AS covered_tokens
             |        FROM agg GROUP BY doc_id),
             |tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id)
             |SELECT p.doc_id AS doc_id, t2.n_windows, p.n_repeated_windows,
             |  p.n_spans, p.covered_tokens
             |FROM per p JOIN tot t2 ON p.doc_id = t2.doc_id""".stripMargin)),

    // The scrub half: cut every repeated span, keep the normalized remainder
    // for ALL docs (empty survivors included — dropping is a policy choice).
    Q("q_dedup_span_scrub",
      (s, dir) => graft.functions.DedupFunctions.scrubRepeatedSpans(
        Tables.df(s, dir, "documents"), "doc_id", "text", window = 8),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             |w AS (SELECT doc_id, s AS pos,
             |        md5(array_to_string(toks[s+1:s+8], ' ')) AS h
             |      FROM t, unnest(range(0, len(toks) - 8 + 1)) u(s)
             |      WHERE len(toks) >= 8),
             |rep AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM w)
             |        GROUP BY h HAVING COUNT(*) >= 2),
             |hits AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM rep)),
             |cov AS (SELECT DISTINCT doc_id, s2
             |        FROM hits, unnest(range(hits.pos, hits.pos + 8)) z(s2)),
             |tpos AS (SELECT doc_id, u AS i, toks[CAST(u AS INT) + 1] AS tok
             |         FROM t, unnest(range(0, len(toks))) v(u)),
             |kept AS (SELECT p.doc_id AS doc_id, p.i, p.tok FROM tpos p
             |         LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.i = c.s2
             |         WHERE c.doc_id IS NULL),
             |ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt,
             |         COUNT(*) AS n FROM kept GROUP BY doc_id)
             |SELECT t.doc_id AS doc_id, COALESCE(ka.txt, '') AS clean_text,
             |  COALESCE(ka.n, 0) AS n_tokens_kept
             |FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id""".stripMargin)),

    // --------------------- surgical decontamination (span-level scrub)
    // Cut the exact 8-token spans shared verbatim with the benchmark set
    // (docs ≡ 0 mod 7, the same benchmark as q_decontaminate) instead of
    // dropping whole documents.
    Q("q_decontaminate_span",
      (s, dir) => {
        val all = Tables.df(s, dir, "documents")
        graft.functions.DedupFunctions.scrubContaminatedSpans(
          all.filter(col("doc_id") % 7 =!= 0),
          all.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", window = 8)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents
             |           WHERE doc_id % 7 <> 0),
             |bw AS (SELECT DISTINCT md5(array_to_string(toks[s+1:s+8], ' ')) AS h
             |       FROM (SELECT $toksSql AS toks FROM documents
             |             WHERE doc_id % 7 = 0) b,
             |            unnest(range(0, len(toks) - 8 + 1)) u(s)
             |       WHERE len(toks) >= 8),
             |w AS (SELECT doc_id, s AS pos,
             |        md5(array_to_string(toks[s+1:s+8], ' ')) AS h
             |      FROM t, unnest(range(0, len(toks) - 8 + 1)) u(s)
             |      WHERE len(toks) >= 8),
             |hits AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM bw)),
             |cov AS (SELECT DISTINCT doc_id, s2
             |        FROM hits, unnest(range(hits.pos, hits.pos + 8)) z(s2)),
             |tpos AS (SELECT doc_id, u AS i, toks[CAST(u AS INT) + 1] AS tok
             |         FROM t, unnest(range(0, len(toks))) v(u)),
             |kept AS (SELECT p.doc_id AS doc_id, p.i, p.tok FROM tpos p
             |         LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.i = c.s2
             |         WHERE c.doc_id IS NULL),
             |ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt,
             |         COUNT(*) AS n FROM kept GROUP BY doc_id)
             |SELECT t.doc_id AS doc_id, COALESCE(ka.txt, '') AS clean_text,
             |  COALESCE(ka.n, 0) AS n_tokens_kept
             |FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id""".stripMargin)),

    // --------------------------------------- quality percentile gate
    // Keep docs at/above the 60th quality percentile per source; the
    // percent_rank total order (quality, doc_id) and its single integer
    // division are engine-exact, so the boundary never flips.
    Q("q_quality_percentile",
      (s, dir) => graft.functions.CorpusFunctions.keepAboveQualityPercentile(
        Tables.df(s, dir, "documents"), "doc_id", "text",
        Seq("source"), minPercentile = 0.6)
        .select(col("doc_id"), col("source"), col("quality"),
          round(col("pr"), 6).as("pr6")),
      Some("""WITH scored AS (
             |  SELECT doc_id, source,
             |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|for|with|on)\b')) AS s_en,
             |    len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS word_cnt,
             |    CASE WHEN len(text) = 0 THEN 0.0
             |      ELSE len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) / len(text) END AS punct_ratio,
             |    len(regexp_extract_all(text, '[A-Za-z0-9]')) AS alnum_chars,
             |    len(text) AS n
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, source,
             |    (CAST(n BETWEEN 50 AND 100000 AS INT) +
             |     CAST(punct_ratio <= 0.3 AS INT) +
             |     CAST((CASE WHEN word_cnt = 0 THEN 0.0
             |           ELSE s_en / word_cnt END) >= 0.01 AS INT) +
             |     CAST((CASE WHEN word_cnt = 0 THEN 0.0
             |           ELSE alnum_chars / word_cnt END) BETWEEN 2 AND 12 AS INT)
             |    ) / 4.0 AS quality
             |  FROM scored),
             |r AS (
             |  SELECT doc_id, source, quality, percent_rank() OVER (
             |    PARTITION BY source ORDER BY quality, doc_id) AS pr
             |  FROM q)
             |SELECT doc_id, source, quality, round(pr, 6) AS pr6
             |FROM r WHERE pr >= 0.6""".stripMargin)),

    // --------------------------------------------- exactly-N sample
    // The 137 docs with the smallest md5(doc_id) — fixed-size holdout
    // carve-out; same hash text on both engines.
    Q("q_sample_exact_n",
      (s, dir) => graft.functions.CorpusFunctions.sampleExactN(
        Tables.df(s, dir, "documents"), "doc_id", n = 137)
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""SELECT doc_id, lang, source FROM documents
             |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |LIMIT 137""".stripMargin)),

    // ----------------------------------------------- per-label mean embedding
    // Element-wise centroids; the query explodes the assembled array so the
    // oracle can AVG per (label, pos). Double accumulation-order differences
    // sit far below the 1e-6 compare tolerance.
    Q("q_embedding_centroids",
      (s, dir) => VectorFunctions.meanEmbeddingByGroup(
        Tables.df(s, dir, "embeddings"), "label")
        .select(col("label"),
          posexplode(col("centroid")).as(Seq("pos", "mean_v")))
        .withColumn("pos", col("pos").cast("long")),
      Some("""SELECT label, i - 1 AS pos, AVG(embedding[i]) AS mean_v
             |FROM embeddings,
             |     (SELECT unnest(generate_series(1, 64)) AS i) s
             |GROUP BY 1, 2""".stripMargin)),

    // --------------------------------------------------- brute-force ANN top-k
    Q("q_ann_brute_topk",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        VectorFunctions.bruteForceTopK(emb, queries, k = 10)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY q.query_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
             |               e.vec_id ASC) AS rank
             |  FROM embeddings e CROSS JOIN q
             |  WHERE e.vec_id <> q.query_id)
             |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos4
             |FROM scored WHERE rank <= 10""".stripMargin)),

    // --------------------------------------------- hard-negative mining
    // Per query: top-k most-similar corpus vectors whose cosine falls in
    // [0.05, 0.45) — informative contrastive negatives below the near-dup
    // band. Identical arithmetic to the brute-force oracle plus the band
    // predicate, so every score and rank replays.
    Q("q_hard_negatives",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        VectorFunctions.hardNegatives(emb, queries, k = 10,
          simLo = 0.05, simHi = 0.45)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
             |  FROM embeddings e CROSS JOIN q
             |  WHERE e.vec_id <> q.query_id),
             |banded AS (
             |  SELECT query_id, neighbor_id, cos,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, neighbor_id ASC) AS rank
             |  FROM scored WHERE cos >= 0.05 AND cos < 0.45)
             |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos4
             |FROM banded WHERE rank <= 10""".stripMargin)),

    // -------------------------------- contrastive triplet mining
    // Per anchor: best positive (cos >= 0.45) × top-5 hard negatives from
    // [0.05, 0.45) — the dense-retrieval training-set builder. Anchors
    // without a qualifying positive drop out. Same arithmetic as the
    // brute-force oracle, so every pick replays.
    Q("q_contrastive_triplets",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val anchors = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        VectorFunctions.contrastiveTriplets(emb, anchors, k = 5,
          posMin = 0.45, negLo = 0.05, negHi = 0.45)
          .select(col("query_id"), col("pos_id"),
            round(col("pos_cos"), 4).as("pos_cos4"),
            col("neg_id"), col("neg_rank"),
            round(col("neg_cos"), 4).as("neg_cos4"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS nid,
             |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
             |  FROM embeddings e CROSS JOIN q
             |  WHERE e.vec_id <> q.query_id),
             |pos AS (
             |  SELECT query_id, nid AS pos_id, cos AS pos_cos,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, nid ASC) AS rn
             |  FROM scored WHERE cos >= 0.45),
             |neg AS (
             |  SELECT query_id, nid AS neg_id, cos AS neg_cos,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, nid ASC) AS neg_rank
             |  FROM scored WHERE cos >= 0.05 AND cos < 0.45)
             |SELECT p.query_id, p.pos_id, round(p.pos_cos, 4) AS pos_cos4,
             |  n.neg_id, CAST(n.neg_rank AS INT) AS neg_rank,
             |  round(n.neg_cos, 4) AS neg_cos4
             |FROM pos p JOIN neg n USING (query_id)
             |WHERE p.rn = 1 AND n.neg_rank <= 5""".stripMargin)),

    // --------------------------- JL random projection (dim reduction)
    // 64-d → 16-d with the deterministic md5-Rademacher matrix; each
    // reduced component is one dot product over a ±1 plane scaled by
    // 1/√16. The oracle re-derives the matrix and replays every
    // component; exploded to (vec_id, j, v4) rows for value hashing.
    Q("q_jl_project",
      (s, dir) => VectorFunctions.randomProjection(
        Tables.df(s, dir, "embeddings"), outDim = 16)
        .select(col("vec_id"), posexplode(col("reduced")).as(Seq("j", "v")))
        .select(col("vec_id"), col("j"), round(col("v"), 4).as("v4")),
      Some("""WITH planes AS MATERIALIZED (
             |  SELECT p, list(CASE WHEN strpos('01234567',
             |      substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)),
             |             1, 1)) > 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pl
             |  FROM (SELECT unnest(generate_series(0, 15)) AS p),
             |       (SELECT unnest(generate_series(0, 63)) AS d)
             |  GROUP BY p)
             |SELECT e.vec_id, pl.p AS j,
             |  round(list_dot_product(e.embedding::DOUBLE[], pl.pl)
             |        / sqrt(16.0), 4) + 0.0 AS v4
             |FROM embeddings e CROSS JOIN planes pl""".stripMargin)),
    // ^ `+ 0.0`: DuckDB's double round keeps the sign of a tiny negative
    // (-1e-9 → -0.0) where Spark's BigDecimal HALF_UP round cannot produce
    // a signed zero; -0.0 + 0.0 = +0.0 normalizes the one straddling row
    // (the round-7 q_jl_project red row) without touching any other value.

    // ------------------------------------- MMR diversity rerank (full oracle)
    // Greedy λ·rel − (1−λ)·max-sim selection over each query's top-30
    // candidates. λ=0.5 keeps BOTH coefficients exactly representable so
    // the engines' score arithmetic is bit-identical; the oracle unrolls
    // the 5 greedy steps as chained CTE stages (no recursion needed at
    // fixed k) and replays every pick and score.
    Q("q_mmr_rerank",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val top = VectorFunctions.bruteForceTopK(emb, queries, k = 30)
        val cands = top
          .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
            Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id").as("cand_id"),
            col("cosine").as("rel"), col("embedding"))
        VectorFunctions.mmrRerank(cands, k = 5, lambda = 0.5)
          .select(col("query_id"), col("selected_id"), col("sel_rank"),
            round(col("mmr_score"), 4).as("score4"))
      },
      Some {
        def stage(t: Int): String = {
          val prev = (1 until t)
            .map(i => s"SELECT query_id, cand_id FROM s$i")
            .mkString(" UNION ALL ")
          s"""p$t AS ($prev),
             |st$t AS (
             |  SELECT c.query_id, c.cand_id,
             |    0.5*c.rel - 0.5*(SELECT MAX(list_cosine_similarity(
             |        c.embedding::DOUBLE[], pc.embedding::DOUBLE[]))
             |      FROM p$t JOIN cand pc ON pc.query_id = p$t.query_id
             |        AND pc.cand_id = p$t.cand_id
             |      WHERE p$t.query_id = c.query_id) AS score
             |  FROM cand c
             |  WHERE NOT EXISTS (SELECT 1 FROM p$t
             |    WHERE p$t.query_id = c.query_id AND p$t.cand_id = c.cand_id)),
             |s$t AS (SELECT query_id, cand_id, score FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, cand_id) rn FROM st$t) WHERE rn = 1)"""
            .stripMargin
        }
        """WITH q AS (SELECT vec_id AS query_id, embedding
          |  FROM embeddings WHERE vec_id < 3),
          |sc AS (
          |  SELECT q.query_id, e.vec_id AS cand_id,
          |    list_cosine_similarity(e.embedding::DOUBLE[],
          |      q.embedding::DOUBLE[]) AS rel,
          |    e.embedding
          |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
          |cand AS (
          |  SELECT query_id, cand_id, rel, embedding FROM (
          |    SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY rel DESC, cand_id ASC) rn FROM sc) WHERE rn <= 30),
          |s1 AS (SELECT query_id, cand_id, 0.5 * rel AS score FROM (
          |  SELECT query_id, cand_id, rel, ROW_NUMBER() OVER (
          |    PARTITION BY query_id ORDER BY rel DESC, cand_id ASC) rn
          |  FROM cand) WHERE rn = 1),
          |""".stripMargin +
          (2 to 5).map(stage).mkString(",\n") + "\n" +
          """SELECT query_id, cand_id AS selected_id,
            |  CAST(1 AS BIGINT) AS sel_rank, ROUND(score, 4) AS score4
            |FROM s1
            |""".stripMargin +
          (2 to 5).map(t => s"UNION ALL SELECT query_id, cand_id, $t, " +
            s"ROUND(score,4) FROM s$t").mkString("\n")
      }),

    // ------------------- greedy k-center coreset selection (full oracle)
    // Farthest-point traversal: each round's winner is the point least
    // similar to every chosen center (argmin of max cosine) — diverse-seed
    // / coreset sampling with the classic 2-approx cover guarantee. One
    // corpus scan per round via a literal-array aggregate fold; the oracle
    // unrolls the 6 rounds as CTE stages.
    Q("q_kcenter_select",
      (s, dir) => VectorFunctions.kcenterSelect(
        Tables.df(s, dir, "embeddings"), k = 6)
        .select(col("center_id"), col("sel_rank"),
          round(col("max_cos"), 4).as("max_cos4")),
      Some {
        def stage(t: Int): String = {
          val prev = (1 until t).map(i => s"SELECT vec_id FROM c$i")
            .mkString(" UNION ALL ")
          s"""p$t AS ($prev),
             |st$t AS (SELECT e.vec_id,
             |   (SELECT MAX(list_cosine_similarity(e.embedding::DOUBLE[],
             |        c.embedding::DOUBLE[]))
             |    FROM embeddings c
             |    WHERE c.vec_id IN (SELECT vec_id FROM p$t)) AS mc
             | FROM embeddings e
             | WHERE e.vec_id NOT IN (SELECT vec_id FROM p$t)),
             |c$t AS (SELECT vec_id, mc FROM (
             |  SELECT *, ROW_NUMBER() OVER (ORDER BY mc ASC, vec_id ASC) rn
             |  FROM st$t) WHERE rn = 1)""".stripMargin
        }
        """WITH c1 AS (SELECT vec_id, embedding FROM embeddings
          |  ORDER BY vec_id LIMIT 1),
          |""".stripMargin +
          (2 to 6).map(stage).mkString(",\n") + "\n" +
          """SELECT (SELECT vec_id FROM c1) AS center_id,
            |  CAST(1 AS BIGINT) AS sel_rank, -1.0 AS max_cos4
            |""".stripMargin +
          (2 to 6).map(t =>
            s"UNION ALL SELECT vec_id, $t, ROUND(mc,4) FROM c$t")
            .mkString("\n")
      }),

    // ------------------------------------------ int8 scalar-quantized ANN
    // Per-dim symmetric scales, floor(+0.5) clamp encode, integer-dot ADC
    // ranking — every step IEEE-deterministic, so unlike IVF/PQ this
    // compressed path carries a FULL value oracle.
    Q("q_ann_sq_topk",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val scales = VectorFunctions.trainSq(emb)
        val codes = VectorFunctions.encodeSq(emb, scales)
        val qc = codes.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("codes"))
        VectorFunctions.sqTopK(codes, qc, k = 10)
      },
      Some("""WITH sc AS (
             |  SELECT list(GREATEST(m/127.0, 1e-30) ORDER BY d) AS sv FROM (
             |    SELECT d, MAX(ABS(CAST(x AS DOUBLE))) AS m
             |    FROM (SELECT unnest(embedding) AS x,
             |                 generate_subscripts(embedding, 1) AS d
             |          FROM embeddings)
             |    GROUP BY d)),
             |codes AS (
             |  SELECT vec_id,
             |    list_transform(range(1, 65), i -> GREATEST(-127, LEAST(127,
             |      CAST(FLOOR(CAST(embedding[i] AS DOUBLE)/sv[i] + 0.5)
             |           AS BIGINT)))) AS c
             |  FROM embeddings, sc),
             |q AS (SELECT vec_id AS query_id, c AS qc FROM codes
             |      WHERE vec_id < 5),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    CAST(list_dot_product(e.c, q.qc) AS BIGINT) AS score,
             |    ROW_NUMBER() OVER (PARTITION BY q.query_id
             |      ORDER BY list_dot_product(e.c, q.qc) DESC,
             |               e.vec_id ASC) AS rank
             |  FROM codes e CROSS JOIN q WHERE e.vec_id <> q.query_id)
             |SELECT query_id, neighbor_id, rank, score
             |FROM scored WHERE rank <= 10""".stripMargin)),

    // -------------------------------------------- embedding-cosine near-dup
    // Exact pairwise form with label BLOCKING (pairs compared only within a
    // block — O(Σ block²), not O(n²)). Oracle-checkable. The corpus-wide
    // LSH-bucketed variant is q_ann_cosine_neardup_lsh (rows-only) below.
    Q("q_ann_cosine_neardup",
      (s, dir) => VectorFunctions.cosineNearDuplicates(
        Tables.df(s, dir, "embeddings"), threshold = 0.4,
        blockCol = Some("label"))
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cos4")),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(a.embedding::DOUBLE[],
             |                               b.embedding::DOUBLE[]), 4) AS cos4
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.embedding::DOUBLE[],
             |                             b.embedding::DOUBLE[]) >= 0.4"""
        .stripMargin)),

    // Random-hyperplane LSH over md5-derived RADEMACHER planes: the plane
    // derivation, sign bits, band packing, hot-bucket cap and exact-cosine
    // verification all replay in DuckDB — a FULL oracle for the bucketed
    // approximate path (the candidate set itself is deterministic).
    Q("q_ann_cosine_neardup_lsh",
      (s, dir) => VectorFunctions.cosineNearDuplicatesLsh(
        Tables.df(s, dir, "embeddings"), threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cos4")),
      Some("""WITH planes AS MATERIALIZED (
             |  SELECT p, list(CASE WHEN strpos('01234567',
             |      substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)),
             |             1, 1)) > 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pl
             |  FROM (SELECT unnest(generate_series(0, 31)) AS p),
             |       (SELECT unnest(generate_series(0, 63)) AS d)
             |  GROUP BY p),
             |bits AS MATERIALIZED (
             |  SELECT e.vec_id, pl.p,
             |    CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.pl) > 0
             |      THEN 1 ELSE 0 END AS bit
             |  FROM embeddings e CROSS JOIN planes pl),
             |bucketed AS MATERIALIZED (
             |  SELECT vec_id, p // 4 AS band,
             |    SUM(bit * (1 << (p % 4))) AS bucket
             |  FROM bits GROUP BY 1, 2),
             |ok AS MATERIALIZED (
             |  SELECT band, bucket, vec_id FROM bucketed
             |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 10000),
             |cand AS MATERIALIZED (
             |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM ok a JOIN ok b ON a.band = b.band AND a.bucket = b.bucket
             |    AND a.vec_id < b.vec_id)
             |SELECT c.id_a, c.id_b,
             |  round(list_cosine_similarity(ea.embedding::DOUBLE[],
             |                               eb.embedding::DOUBLE[]), 4) AS cos4
             |FROM cand c
             |JOIN embeddings ea ON ea.vec_id = c.id_a
             |JOIN embeddings eb ON eb.vec_id = c.id_b
             |WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
             |        eb.embedding::DOUBLE[]) >= 0.5""".stripMargin)),

    // ----------------------- INCREMENTAL embedding near-dup (LSH probe)
    // The persisted-index shape for the cosine path: even-vec_id vectors
    // are the corpus (band index as the maintained side table), odd the
    // increment. Bucket membership is a pure function of the vector, so
    // the incremental candidate set equals the batch CTE's restricted to
    // pairs with an incoming side — the oracle adds exactly that
    // restriction to the batch LSH oracle.
    Q("q_ann_cosine_lsh_incremental",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") % 2 === 0)
        val incoming = emb.filter(col("vec_id") % 2 === 1)
        // ONE banded projection over the whole table, split by parity
        // (round 15): bucket membership is a pure per-row function of the
        // vector (md5-derived plane constants), so index rows built
        // together equal rows built per side — the former separate
        // corpus/increment builds ran the plane projection over the
        // embeddings twice and paid two scratch writes. The uniform
        // fixture dimension keeps majorityDim identical across subsets
        // (oracle-checked bit-for-bit).
        val idx = graft.util.Scratch.materialize(
          VectorFunctions.cosineLshBandIndex(emb), "q_cos_index",
          compact = false)
        VectorFunctions.cosineNearDuplicatesLshIncremental(
          incoming, corpus,
          idx.filter(col("doc_id") % 2 === 0),
          threshold = 0.5,
          incomingIndex = Some(idx.filter(col("doc_id") % 2 === 1)))
          .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH planes AS MATERIALIZED (
             |  SELECT p, list(CASE WHEN strpos('01234567',
             |      substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)),
             |             1, 1)) > 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS pl
             |  FROM (SELECT unnest(generate_series(0, 31)) AS p),
             |       (SELECT unnest(generate_series(0, 63)) AS d)
             |  GROUP BY p),
             |bits AS MATERIALIZED (
             |  SELECT e.vec_id, pl.p,
             |    CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.pl) > 0
             |      THEN 1 ELSE 0 END AS bit
             |  FROM embeddings e CROSS JOIN planes pl),
             |bucketed AS MATERIALIZED (
             |  SELECT vec_id, p // 4 AS band,
             |    SUM(bit * (1 << (p % 4))) AS bucket
             |  FROM bits GROUP BY 1, 2),
             |ok AS MATERIALIZED (
             |  SELECT band, bucket, vec_id FROM bucketed
             |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 10000),
             |cand AS MATERIALIZED (
             |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM ok a JOIN ok b ON a.band = b.band AND a.bucket = b.bucket
             |    AND a.vec_id < b.vec_id
             |  WHERE NOT (a.vec_id % 2 = 0 AND b.vec_id % 2 = 0))
             |SELECT c.id_a, c.id_b,
             |  round(list_cosine_similarity(ea.embedding::DOUBLE[],
             |                               eb.embedding::DOUBLE[]), 4) AS cos4
             |FROM cand c
             |JOIN embeddings ea ON ea.vec_id = c.id_a
             |JOIN embeddings eb ON eb.vec_id = c.id_b
             |WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
             |        eb.embedding::DOUBLE[]) >= 0.5""".stripMargin)),

    // ------------------------------- semantic dedup (SemDeDup, Abbas 2023)
    // Deterministic md5-leader clustering bounds pairwise cosine to within-
    // cluster blocks; one representative (min id) survives per near-dup
    // component. Every stage is engine-reproducible, so unlike KMeans-based
    // semantic dedup this carries a FULL value oracle: DuckDB re-derives the
    // leaders, replays the argmax assignment, and closes the pair graph with
    // the same recursive CTE as the MinHash cluster oracles.
    Q("q_semantic_dedup",
      (s, dir) => VectorFunctions.semanticDedup(
        Tables.df(s, dir, "embeddings"), kLeaders = 16, threshold = 0.4)
        .select(col("vec_id"), col("label")),
      Some("""WITH RECURSIVE leaders AS MATERIALIZED (
             |  SELECT vec_id AS leader_id, embedding FROM embeddings
             |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |assign AS MATERIALIZED (
             |  SELECT e.vec_id, l.leader_id,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                 l.embedding::DOUBLE[]) DESC,
             |               l.leader_id ASC) AS rn
             |  FROM embeddings e CROSS JOIN leaders l),
             |cl AS MATERIALIZED (
             |  SELECT vec_id, leader_id FROM assign WHERE rn = 1),
             |pairs AS MATERIALIZED (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM embeddings a
             |  JOIN cl ca ON ca.vec_id = a.vec_id
             |  JOIN embeddings b ON a.vec_id < b.vec_id
             |  JOIN cl cb ON cb.vec_id = b.vec_id
             |    AND cb.leader_id = ca.leader_id
             |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
             |          b.embedding::DOUBLE[]) >= 0.4),
             |edges AS MATERIALIZED (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |labels AS (
             |  SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
             |  FROM reach GROUP BY src)
             |SELECT e.vec_id, e.label FROM embeddings e
             |LEFT JOIN labels l ON e.vec_id = l.id
             |WHERE l.id IS NULL OR l.cluster = e.vec_id""".stripMargin)),

    // ---------------------------- INCREMENTAL SemDeDup (fixed leaders)
    // Leaders picked ONCE from the even-id base and persisted; the odd-id
    // increment assigns itself, compares only inside the blocks it lands
    // in, and folds into the label side-table. The oracle replays the
    // SAME fixed-leader contract: leaders from the base half, assignment
    // + closure over the full corpus — fold output must equal it exactly.
    Q("q_semantic_dedup_incremental",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val base = emb.filter(col("vec_id") % 2 === 0)
        val inc = emb.filter(col("vec_id") % 2 === 1)
        val leaders = VectorFunctions.pickLeaders(base, 16)
        val baseAssigned = VectorFunctions.assignToLeaders(base, leaders)
        val basePairs = VectorFunctions.cosineNearDuplicates(baseAssigned,
          threshold = 0.4, blockCol = Some("leader_id"))
        val l0 = DedupFunctions.foldClusterLabels(None, basePairs)
        VectorFunctions.semanticDedupIncremental(baseAssigned, inc, leaders,
          Some(l0), threshold = 0.4)
          .select(col("id").as("vec_id"), col("cluster"))
      },
      Some("""WITH RECURSIVE leaders AS MATERIALIZED (
             |  SELECT vec_id AS leader_id, embedding FROM embeddings
             |  WHERE vec_id % 2 = 0
             |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
             |assign AS MATERIALIZED (
             |  SELECT e.vec_id, l.leader_id,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                 l.embedding::DOUBLE[]) DESC,
             |               l.leader_id ASC) AS rn
             |  FROM embeddings e CROSS JOIN leaders l),
             |cl AS MATERIALIZED (
             |  SELECT vec_id, leader_id FROM assign WHERE rn = 1),
             |pairs AS MATERIALIZED (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM embeddings a
             |  JOIN cl ca ON ca.vec_id = a.vec_id
             |  JOIN embeddings b ON a.vec_id < b.vec_id
             |  JOIN cl cb ON cb.vec_id = b.vec_id
             |    AND cb.leader_id = ca.leader_id
             |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
             |          b.embedding::DOUBLE[]) >= 0.4),
             |edges AS MATERIALIZED (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
             |SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster
             |FROM reach GROUP BY src""".stripMargin)),

    // --------------------------------------------------------------- IVF ANN
    // Corpus-seeded deterministic coarse quantizer (buildIvfSeeded): the md5
    // selection, nearest-centroid assignment, nprobe cell choice and
    // in-cell exact cosine ALL replay in DuckDB, so the approximate index
    // probe carries a FULL value oracle (the q_ann_sq_topk recipe extended
    // to IVF; Lloyd-trained KMeans centroids stay recall-tested in
    // VectorSpec — their per-round averages don't replay cross-engine).
    Q("q_ann_ivf_topk",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val idx = VectorFunctions.buildIvfSeeded(emb, nlist = 16)
        VectorFunctions.ivfTopK(idx, queries, k = 10, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH cents AS MATERIALIZED (
             |  SELECT ROW_NUMBER() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS centroid_id,
             |    embedding
             |  FROM (SELECT vec_id, embedding FROM embeddings
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
             |cells AS MATERIALIZED (
             |  SELECT e.vec_id, c.centroid_id
             |  FROM embeddings e CROSS JOIN cents c
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |               c.embedding::DOUBLE[]) DESC,
             |             c.centroid_id ASC) = 1),
             |q AS MATERIALIZED (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |probe AS MATERIALIZED (
             |  SELECT query_id, centroid_id
             |  FROM q CROSS JOIN cents c
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], qv) DESC,
             |             c.centroid_id ASC) <= 4),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY q.query_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                 q.qv) DESC, e.vec_id ASC) AS rank
             |  FROM q
             |  JOIN probe p ON p.query_id = q.query_id
             |  JOIN cells ce ON ce.centroid_id = p.centroid_id
             |  JOIN embeddings e ON e.vec_id = ce.vec_id
             |  WHERE e.vec_id <> q.query_id)
             |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos4
             |FROM scored WHERE rank <= 10""".stripMargin)),

    // -------------------------------------------- corpus distribution drift
    // PSI over the language mix between two source halves — the per-sync
    // monitoring gate. Shares are IEEE quotients of exact counts; ln
    // rounded per the LM convention → contributions replay exactly.
    Q("q_corpus_drift",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val half = expr("CAST(substring(source, 4) AS INT)")
        graft.functions.CorpusFunctions.distributionDrift(
          docs.filter(half < 10), docs.filter(half >= 10), "lang")
      },
      Some("""WITH da AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_a
             |        FROM documents
             |        WHERE CAST(substr(source, 4) AS INT) < 10 GROUP BY 1),
             |db AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_b
             |       FROM documents
             |       WHERE CAST(substr(source, 4) AS INT) >= 10 GROUP BY 1),
             |j AS (SELECT COALESCE(da.lang, db.lang) AS category,
             |        COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
             |      FROM da FULL OUTER JOIN db ON da.lang = db.lang),
             |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
             |        CAST(SUM(n_b) AS BIGINT) AS tb,
             |        CAST(COUNT(*) AS BIGINT) AS k FROM j),
             |p AS (SELECT j.category, j.n_a, j.n_b,
             |        CAST(j.n_a + 1 AS DOUBLE) / CAST(t.ta + t.k AS DOUBLE)
             |          AS pa,
             |        CAST(j.n_b + 1 AS DOUBLE) / CAST(t.tb + t.k AS DOUBLE)
             |          AS pb
             |      FROM j CROSS JOIN t)
             |SELECT category, n_a, n_b, pa, pb,
             |  CAST(CAST(round((pa - pb) * round(ln(pa / pb), 6), 9)
             |    AS DECIMAL(18,9)) AS DOUBLE) AS psi_contrib
             |FROM p""".stripMargin)),

    // ----------------------------------- epoch-seeded training shard layout
    // (shard, pos) address per document as a pure function of (epoch, id):
    // md5-nibble shards, per-shard md5 rank. No global order — the only
    // exchange partitions by shard.
    Q("q_epoch_shards",
      (s, dir) => graft.functions.CorpusFunctions.epochShards(
        Tables.df(s, dir, "documents"), "doc_id", epoch = 7, nibbles = 1),
      Some("""WITH k AS (
             |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS kk
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(strpos('0123456789abcdef', substr(kk, 1, 1)) - 1
             |    AS INT) AS shard,
             |  CAST(ROW_NUMBER() OVER (
             |    PARTITION BY substr(kk, 1, 1)
             |    ORDER BY kk, doc_id) AS BIGINT) AS pos
             |FROM k""".stripMargin)),

    // --------------------------------- curriculum shard layout (full oracle)
    // Fluency-ordered contiguous difficulty bands: rank every doc by its
    // exact unigram-LM mean log-prob (descending — fluent docs first) and
    // cut the order into 8 near-equal shards. Exact global ranks via the
    // distributed zipWithIndex, shard/pos in pure integer arithmetic —
    // every address replays.
    Q("q_curriculum_shards",
      (s, dir) => {
        val docs = Tables.df(s, dir, "documents")
        val scored = graft.functions.CorpusFunctions.unigramLogProbScores(
          docs, "doc_id", "text").select(col("doc_id"), col("avg_logprob"))
        graft.functions.CorpusFunctions.curriculumShards(
          scored, "doc_id", "avg_logprob", shards = 8, ascending = false)
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |lm AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c
             |       FROM tf GROUP BY term),
             |lp AS (SELECT term,
             |         CAST(round(ln(c * 1.0 / CAST(SUM(c) OVER () AS BIGINT)), 4)
             |           AS DECIMAL(28,4)) AS lp
             |       FROM lm),
             |a AS (SELECT tf.doc_id,
             |        CAST(SUM(tf * lp) AS DOUBLE)
             |          / CAST(SUM(tf) AS BIGINT) AS avg
             |      FROM tf JOIN lp USING (term) GROUP BY tf.doc_id),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM a),
             |rk AS (SELECT doc_id, ROW_NUMBER() OVER (
             |         ORDER BY avg DESC, doc_id) - 1 AS r FROM a)
             |SELECT doc_id, CAST((r * 8) // n.n AS INT) AS shard,
             |  CAST(r - (((r * 8) // n.n) * n.n + 7) // 8 + 1 AS BIGINT)
             |    AS pos
             |FROM rk, n""".stripMargin)),

    // ------------------------------------ embedding dimension health report
    // Per-dim n/mean/variance/extremes on the 1e-6 integer grid — exact
    // sums, deterministic IEEE derivations, every value replays.
    Q("q_embedding_dim_stats",
      (s, dir) => graft.functions.VectorFunctions.embeddingDimStats(
        Tables.df(s, dir, "embeddings")),
      Some("""WITH q AS (
             |  SELECT list_transform(embedding::DOUBLE[],
             |    x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xq
             |  FROM embeddings),
             |e AS (SELECT u.d - 1 AS dim, xq[u.d] AS v
             |      FROM q, unnest(generate_series(1, 64)) u(d)),
             |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             |        SUM(v::HUGEINT) AS s, SUM((v * v)::HUGEINT) AS ss,
             |        MIN(v) AS mn, MAX(v) AS mx
             |      FROM e GROUP BY 1)
             |SELECT CAST(dim AS INT) AS dim, n,
             |  CAST(s AS DOUBLE) / 1000000.0 / n AS mean,
             |  CAST(ss AS DOUBLE) / 1000000000000.0 / n
             |    - (CAST(s AS DOUBLE) / 1000000.0 / n)
             |      * (CAST(s AS DOUBLE) / 1000000.0 / n) AS variance,
             |  CAST(mn AS DOUBLE) / 1000000.0 AS min_v,
             |  CAST(mx AS DOUBLE) / 1000000.0 AS max_v
             |FROM a""".stripMargin)),

    // ------------------------------------------------- ANN recall/MRR report
    // The index-trust report as a query: seeded-IVF top-10 evaluated
    // against exact brute-force ground truth, per query. Both rankings
    // and the eval arithmetic replay exactly.
    Q("q_ann_recall_report",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val idx = VectorFunctions.buildIvfSeeded(emb, nlist = 16)
        VectorFunctions.rankingEval(
          VectorFunctions.ivfTopK(idx, queries, k = 10, nprobe = 4),
          VectorFunctions.bruteForceTopK(emb, queries, k = 10))
      },
      Some("""WITH cents AS MATERIALIZED (
             |  SELECT ROW_NUMBER() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS centroid_id,
             |    embedding
             |  FROM (SELECT vec_id, embedding FROM embeddings
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
             |cells AS MATERIALIZED (
             |  SELECT e.vec_id, c.centroid_id
             |  FROM embeddings e CROSS JOIN cents c
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |               c.embedding::DOUBLE[]) DESC,
             |             c.centroid_id ASC) = 1),
             |q AS MATERIALIZED (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |  FROM embeddings WHERE vec_id < 5),
             |probe AS MATERIALIZED (
             |  SELECT query_id, centroid_id
             |  FROM q CROSS JOIN cents c
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], qv) DESC,
             |             c.centroid_id ASC) <= 4),
             |sys AS MATERIALIZED (
             |  SELECT query_id, neighbor_id, rank FROM (
             |    SELECT q.query_id, e.vec_id AS neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY q.query_id
             |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                   q.qv) DESC, e.vec_id ASC) AS rank
             |    FROM q
             |    JOIN probe p ON p.query_id = q.query_id
             |    JOIN cells ce ON ce.centroid_id = p.centroid_id
             |    JOIN embeddings e ON e.vec_id = ce.vec_id
             |    WHERE e.vec_id <> q.query_id)
             |  WHERE rank <= 10),
             |ref AS MATERIALIZED (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT q.query_id, e.vec_id AS neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY q.query_id
             |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                   q.qv) DESC, e.vec_id ASC) AS rank
             |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
             |  WHERE rank <= 10),
             |refn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ref
             |         FROM ref GROUP BY 1),
             |hits AS (SELECT s.query_id, CAST(COUNT(*) AS BIGINT) AS hits,
             |           MIN(s.rank) AS fr,
             |           SUM(CAST(round(1.0 / log2(s.rank + 1), 6)
             |             AS DECIMAL(18,6))) AS dcg_dec
             |         FROM sys s JOIN ref r
             |           ON r.query_id = s.query_id
             |          AND r.neighbor_id = s.neighbor_id
             |         GROUP BY 1),
             |idcg AS (SELECT r.query_id,
             |           SUM(CAST(round(1.0 / log2(u.i + 1), 6)
             |             AS DECIMAL(18,6))) AS idcg_dec
             |         FROM refn r,
             |           unnest(generate_series(1, r.n_ref)) u(i)
             |         GROUP BY 1)
             |SELECT r.query_id, COALESCE(h.hits, 0) AS hits, r.n_ref,
             |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(r.n_ref AS DOUBLE)
             |    AS recall,
             |  CASE WHEN h.fr IS NOT NULL THEN 1.0 / h.fr ELSE 0.0 END AS rr,
             |  CAST(COALESCE(h.dcg_dec, 0) AS DOUBLE) AS dcg,
             |  CAST(COALESCE(h.dcg_dec, 0) AS DOUBLE)
             |    / CAST(i.idcg_dec AS DOUBLE) AS ndcg
             |FROM refn r LEFT JOIN hits h USING (query_id)
             |JOIN idcg i USING (query_id)""".stripMargin)),

    // ---------------------------------------------------------------- PQ ANN
    // Corpus-seeded deterministic codebooks (trainPqSeeded) keep the
    // production shape end-to-end — train → encode → PERSIST → ADC probe of
    // the persisted codes → exact rerank — while every arithmetic step
    // (reciprocal-multiply normalization, float-rounded centroids, argmax
    // encode, LUT sums) replays in DuckDB: a FULL value oracle for
    // compressed ANN. KMeans-trained codebooks stay recall-tested in
    // VectorSpec. dim=64, m=16 → subDim=4 (the `[j*4+1 : j*4+4]` slices).
    Q("q_ann_pq_topk",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val model = VectorFunctions.trainPqSeeded(emb, m = 16, k = 16)
        val path = Tables.scratchDir("pq") + "/index"
        VectorFunctions.writePq(model, VectorFunctions.encodePq(model, emb), path)
        val (loaded, codes) = VectorFunctions.readPq(s, path)
        VectorFunctions.pqTopK(loaded, codes, emb, queries,
          k = 10, rerankDepth = 80)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH samp AS MATERIALIZED (
             |  SELECT ROW_NUMBER() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
             |    embedding::DOUBLE[] AS v
             |  FROM (SELECT vec_id, embedding FROM embeddings
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
             |cb AS MATERIALIZED (
             |  SELECT j.j, s.code,
             |    list_transform(s.u[j.j*4+1 : j.j*4+4],
             |      x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS c
             |  FROM (SELECT code,
             |          list_transform(v,
             |            x -> x * (1.0/sqrt(list_dot_product(v, v)))) AS u
             |        FROM samp) s,
             |       (SELECT unnest(generate_series(0, 15)) AS j) j),
             |cb2 AS MATERIALIZED (
             |  SELECT j, code, c, list_dot_product(c, c) AS c2 FROM cb),
             |vnorm AS MATERIALIZED (
             |  SELECT vec_id,
             |    list_transform(v, x -> x * (1.0/sqrt(list_dot_product(v, v)))) AS u
             |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
             |enc AS MATERIALIZED (
             |  SELECT vec_id, j, code FROM (
             |    SELECT v.vec_id, b.j, b.code,
             |      2*list_dot_product(v.u[b.j*4+1 : b.j*4+4], b.c) - b.c2 AS s
             |    FROM vnorm v CROSS JOIN cb2 b)
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, j
             |    ORDER BY s DESC, code ASC) = 1),
             |qn AS MATERIALIZED (
             |  SELECT vec_id AS query_id,
             |    list_transform(embedding::DOUBLE[],
             |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
             |                                     embedding::DOUBLE[]))) AS qu
             |  FROM embeddings WHERE vec_id < 5),
             |lut AS MATERIALIZED (
             |  SELECT q.query_id, b.j, b.code,
             |    list_dot_product(q.qu[b.j*4+1 : b.j*4+4], b.c) AS l
             |  FROM qn q CROSS JOIN cb2 b),
             |adc AS MATERIALIZED (
             |  SELECT l.query_id, e.vec_id, SUM(l.l) AS score
             |  FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
             |  GROUP BY 1, 2),
             |cand AS MATERIALIZED (
             |  SELECT query_id, vec_id FROM adc
             |  WHERE vec_id <> query_id
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, vec_id ASC) <= 80),
             |rer AS (
             |  SELECT c.query_id, c.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[],
             |                           qe.embedding::DOUBLE[]) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY c.query_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                 qe.embedding::DOUBLE[]) DESC,
             |               c.vec_id ASC) AS rank
             |  FROM cand c
             |  JOIN embeddings e ON e.vec_id = c.vec_id
             |  JOIN embeddings qe ON qe.vec_id = c.query_id)
             |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos4
             |FROM rer WHERE rank <= 10""".stripMargin)),

    // --------------------------------------------- INCREMENTAL PQ maintenance
    // appendIvf's analog for the compressed index: codebooks train on the
    // even-id BASE only, the odd-id increment encodes under the PERSISTED
    // (reloaded) codebooks and appends its code rows, and the probe runs
    // over the grown index. The oracle replays the same fixed-quantizer
    // contract: its codebook sample comes from the base subset, the encode
    // covers the whole corpus — value-identical to an index encoded whole
    // under the same model, which is exactly the append invariant
    // VectorSpec pins file-level (no existing code file rewritten).
    Q("q_ann_pq_incremental",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val base = emb.filter(col("vec_id") % 2 === 0)
        val inc = emb.filter(col("vec_id") % 2 === 1)
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val model = VectorFunctions.trainPqSeeded(base, m = 16, k = 16)
        val path = Tables.scratchDir("pqinc") + "/index"
        VectorFunctions.writePq(model, VectorFunctions.encodePq(model, base), path)
        VectorFunctions.appendPq(s, path, inc)
        val (loaded, codes) = VectorFunctions.readPq(s, path)
        VectorFunctions.pqTopK(loaded, codes, emb, queries,
          k = 10, rerankDepth = 80)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 4).as("cos4"))
      },
      Some("""WITH samp AS MATERIALIZED (
             |  SELECT ROW_NUMBER() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
             |    embedding::DOUBLE[] AS v
             |  FROM (SELECT vec_id, embedding FROM embeddings
             |        WHERE vec_id % 2 = 0
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
             |cb AS MATERIALIZED (
             |  SELECT j.j, s.code,
             |    list_transform(s.u[j.j*4+1 : j.j*4+4],
             |      x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS c
             |  FROM (SELECT code,
             |          list_transform(v,
             |            x -> x * (1.0/sqrt(list_dot_product(v, v)))) AS u
             |        FROM samp) s,
             |       (SELECT unnest(generate_series(0, 15)) AS j) j),
             |cb2 AS MATERIALIZED (
             |  SELECT j, code, c, list_dot_product(c, c) AS c2 FROM cb),
             |vnorm AS MATERIALIZED (
             |  SELECT vec_id,
             |    list_transform(v, x -> x * (1.0/sqrt(list_dot_product(v, v)))) AS u
             |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
             |enc AS MATERIALIZED (
             |  SELECT vec_id, j, code FROM (
             |    SELECT v.vec_id, b.j, b.code,
             |      2*list_dot_product(v.u[b.j*4+1 : b.j*4+4], b.c) - b.c2 AS s
             |    FROM vnorm v CROSS JOIN cb2 b)
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, j
             |    ORDER BY s DESC, code ASC) = 1),
             |qn AS MATERIALIZED (
             |  SELECT vec_id AS query_id,
             |    list_transform(embedding::DOUBLE[],
             |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
             |                                     embedding::DOUBLE[]))) AS qu
             |  FROM embeddings WHERE vec_id < 5),
             |lut AS MATERIALIZED (
             |  SELECT q.query_id, b.j, b.code,
             |    list_dot_product(q.qu[b.j*4+1 : b.j*4+4], b.c) AS l
             |  FROM qn q CROSS JOIN cb2 b),
             |adc AS MATERIALIZED (
             |  SELECT l.query_id, e.vec_id, SUM(l.l) AS score
             |  FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
             |  GROUP BY 1, 2),
             |cand AS MATERIALIZED (
             |  SELECT query_id, vec_id FROM adc
             |  WHERE vec_id <> query_id
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, vec_id ASC) <= 80),
             |rer AS (
             |  SELECT c.query_id, c.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[],
             |                           qe.embedding::DOUBLE[]) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY c.query_id
             |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
             |                 qe.embedding::DOUBLE[]) DESC,
             |               c.vec_id ASC) AS rank
             |  FROM cand c
             |  JOIN embeddings e ON e.vec_id = c.vec_id
             |  JOIN embeddings qe ON qe.vec_id = c.query_id)
             |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos4
             |FROM rer WHERE rank <= 10""".stripMargin)),

    // ------------------------------------------ EXACT Lloyd K-Means rounds
    // Deterministic Lloyd whose every round replays in DuckDB: seeded
    // init, argmax-cosine assignment, integer-grid centroid means
    // (lloydKmeansExact scaladoc). Output = the final centroid table
    // itself (k×dim exact integers) + cluster sizes — a trained
    // clustering model value-matched bit-for-bit across engines.
    Q("q_kmeans_lloyd",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.df(s, dir, "embeddings")
        val res = VectorFunctions.lloydKmeansExact(emb, k = 8, iters = 3)
        val cents = res.centroidsQ.zipWithIndex.flatMap { case (arr, cl) =>
          arr.zipWithIndex.map { case (cq, d) => (cl, d, cq) } }.toSeq
          .toDF("cluster", "dim", "cq")
        val sizes = res.assigned.groupBy("cluster")
          .agg(count(lit(1)).as("n"))
        cents.join(sizes, Seq("cluster"), "left")
          .select(col("cluster").cast("int").as("cluster"),
            coalesce(col("n"), lit(0L)).as("n"),
            col("dim").cast("int").as("dim"), col("cq"))
      },
      Some(kmeansOracle(k = 8, iters = 3) +
        """
          |SELECT CAST(c.cluster AS INT) AS cluster, COALESCE(n.n, 0) AS n,
          |  CAST(c.dim - 1 AS INT) AS dim, CAST(c.cq AS BIGINT) AS cq
          |FROM c3 c
          |LEFT JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
          |           FROM a3 GROUP BY 1) n USING (cluster)""".stripMargin)),

    // -------------------------------------- cluster-balanced diversity sample
    // The SemDeDup-era curation move: cluster the corpus, then cap each
    // cluster at n — a diversity-preserving carve-out no single md5
    // threshold can express (a global sample keeps dense regions dense).
    // Exact end-to-end: Lloyd rounds replay (kmeansOracle) and the
    // per-cluster cap is the deterministic md5 order.
    Q("q_cluster_balanced_sample",
      (s, dir) => {
        val emb = Tables.df(s, dir, "embeddings")
        val res = VectorFunctions.lloydKmeansExact(emb, k = 8, iters = 3)
        graft.functions.CorpusFunctions.capPerGroup(
          res.assigned, "vec_id", Seq("cluster"), cap = 20)
          .select(col("cluster").cast("int").as("cluster"), col("vec_id"),
            col("rn"))
      },
      Some(kmeansOracle(k = 8, iters = 3) +
        """
          |SELECT cluster, vec_id, rn FROM (
          |  SELECT CAST(cluster AS INT) AS cluster, vec_id,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster
          |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
          |      AS BIGINT) AS rn
          |  FROM a3)
          |WHERE rn <= 20""".stripMargin)),

    // --------------------------------------------- TRAINED linear probe
    // Full-batch hard-sigmoid logistic GD over the embeddings, in exact
    // fixed-point integer arithmetic (LearnFunctions scaladoc) — the
    // oracle replays all 4 unrolled training iterations in HUGEINT and
    // the confusion matrix matches bit-for-bit: a cross-engine value
    // oracle for a TRAINED model, not just a scoring pass. The target is
    // a planted sign rule over the vectors themselves (the fixture's
    // label column is noise w.r.t. the embeddings — measured 1-NN label
    // agreement ≈ chance), so held-out accuracy ~0.93 demonstrates real
    // learning (LearnSpec pins it) while every number stays exact.
    Q("q_linear_probe",
      (s, dir) =>
        probeScoredHeldOut(s, dir)
          .groupBy(col("y"), col("pred"))
          .agg(count(lit(1)).as("n"),
            // sum_p rides as a decimal STRING: at 17+ digits the value
            // exceeds double's exact range, and DuckDB's DECIMAL(38,0)
            // reaches the driver as a lossy float while Spark's stays
            // Decimal — same value, different hash (the round-7 red row).
            // Both engines stringify a scale-0 decimal as plain digits, so
            // the string form is exact and engine-identical at ANY sf.
            sum(col("p_num"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              .cast("string").as("sum_p"))
          .select(col("y"), col("pred"), col("n"), col("sum_p")),
      Some(probeOracle(iters = 4) +
        """
          |SELECT CAST(y AS BIGINT) AS y,
          |  CASE WHEN p_num >= 2000000000000000 THEN 1 ELSE 0 END AS pred,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(CAST(SUM(p_num) AS DECIMAL(38,0)) AS VARCHAR) AS sum_p
          |FROM sc GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------- threshold sweep over probe scores
    // The operating-point picker that turns a trained filter score into a
    // deployable cutoff: ONE corpus-scale aggregation builds a
    // (bucket, y) histogram, then the whole precision/recall curve falls
    // out of the tiny histogram — the sweep never rescans the corpus.
    // Counts are exact integers; precision/recall are quotients of those
    // exact integers (IEEE division of identical operands — engine-
    // identical doubles).
    Q("q_probe_pr_sweep",
      (s, dir) => LearnFunctions.prSweep(
        probeScoredHeldOut(s, dir), "y", buckets = 10),
      Some(probeOracle(iters = 4) +
        """,
          |hist AS MATERIALIZED (
          |  SELECT LEAST(p_num // 400000000000000, 9) AS b, y, COUNT(*) AS n
          |  FROM sc GROUP BY 1, 2),
          |thr AS (SELECT unnest(generate_series(0, 9)) AS t)
          |SELECT CAST(t.t AS BIGINT) AS bucket,
          |  CAST(SUM(CASE WHEN h.b >= t.t AND h.y = 1 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS tp,
          |  CAST(SUM(CASE WHEN h.b >= t.t AND h.y = 0 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS fp,
          |  CAST(SUM(CASE WHEN h.b < t.t AND h.y = 1 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS fn,
          |  CAST(SUM(CASE WHEN h.b < t.t AND h.y = 0 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS tn,
          |  CASE WHEN SUM(CASE WHEN h.b >= t.t THEN h.n ELSE 0 END) > 0
          |    THEN CAST(SUM(CASE WHEN h.b >= t.t AND h.y = 1 THEN h.n
          |                       ELSE 0 END) AS DOUBLE)
          |      / SUM(CASE WHEN h.b >= t.t THEN h.n ELSE 0 END) END AS prec,
          |  CASE WHEN SUM(CASE WHEN h.y = 1 THEN h.n ELSE 0 END) > 0
          |    THEN CAST(SUM(CASE WHEN h.b >= t.t AND h.y = 1 THEN h.n
          |                       ELSE 0 END) AS DOUBLE)
          |      / SUM(CASE WHEN h.y = 1 THEN h.n ELSE 0 END) END AS rec
          |FROM thr t CROSS JOIN hist h GROUP BY t.t""".stripMargin))
  )

  /** DuckDB replay of [[graft.functions.VectorFunctions.lloydKmeansExact]]:
    * per unrolled round t — centroid lists `cl{t}` from the integer grid,
    * argmax-cosine assignment `a{t}` (ties toward the lower cluster id),
    * exact integer per-(cluster,dim) sums `u{t}`, and the half-away
    * rounded mean update `c{t}` (empty clusters carry their centroid). */
  private def kmeansOracle(k: Int, iters: Int): String = {
    def round(t: Int): String =
      s"""cl$t AS MATERIALIZED (
         |  SELECT cluster, list(cq / 1000000.0 ORDER BY dim) AS c
         |  FROM c${t - 1} GROUP BY cluster),
         |a$t AS MATERIALIZED (
         |  SELECT vec_id, cluster FROM (
         |    SELECT v.vec_id, cl.cluster,
         |      list_cosine_similarity(v.vd, cl.c) AS cos
         |    FROM v CROSS JOIN cl$t cl)
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cluster ASC) = 1),
         |u$t AS MATERIALIZED (
         |  SELECT a.cluster, d.dim, SUM(v.xq[d.dim]) AS s, COUNT(*) AS n
         |  FROM a$t a JOIN v USING (vec_id) CROSS JOIN dims d
         |  GROUP BY 1, 2),
         |c$t AS MATERIALIZED (
         |  SELECT p.cluster, p.dim,
         |    COALESCE(CASE WHEN u.s >= 0 THEN (u.s + (u.n // 2)) // u.n
         |                  ELSE -((-u.s + (u.n // 2)) // u.n) END,
         |             p.cq) AS cq
         |  FROM c${t - 1} p
         |  LEFT JOIN u$t u ON u.cluster = p.cluster AND u.dim = p.dim)"""
        .stripMargin
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS vd,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
       |c0 AS MATERIALIZED (
       |  SELECT r.cluster, d.dim, r.xq[d.dim] AS cq
       |  FROM (SELECT CAST(ROW_NUMBER() OVER (
       |            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
       |          AS INT) AS cluster, xq
       |        FROM (SELECT vec_id, xq FROM v
       |              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |              LIMIT $k)) r
       |  CROSS JOIN dims d),
       |${(1 to iters).map(round).mkString(",\n")}""".stripMargin
  }

  /** Shared probe fixture for `q_linear_probe` / `q_probe_pr_sweep` (the
    * Scala twin of [[probeOracle]]'s CTE prefix — one source of truth for
    * the planted rule and hyperparameters): quantize at preScale 8, plant
    * y = [Σ ±xq_d ≥ 0], train 4 GD iterations at lr 2 on even ids, score
    * the odd half with the label carried through (no re-join). */
  private def probeScoredHeldOut(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.df(s, dir, "embeddings")
    val signs = array((0 until 64).map(d =>
      lit(if (d % 2 == 0) 1L else -1L)): _*)
    val base = emb.select(col("vec_id"),
        LearnFunctions.quantize(col("embedding"), preScale = 8).as("xq"))
      .withColumn("y",
        when(aggregate(zip_with(col("xq"), signs, (x, sn) => x * sn),
          lit(0L), (a, t) => a + t) >= 0, 1L).otherwise(0L))
    val w = LearnFunctions.trainLinearProbe(
      base.filter(col("vec_id") % 2 === 0), "xq", "y",
      iters = 4, lrLog2 = 1)
    LearnFunctions.scoreLinearProbe(base.filter(col("vec_id") % 2 === 1),
      "vec_id", "xq", w, keepCols = Seq("y"))
  }

  /** DuckDB replay of [[graft.functions.LearnFunctions.trainLinearProbe]]:
    * per unrolled iteration t — margins `m{t}` under weights `w{t-1}`
    * (bias is dim 65 with feature 1e6), clamped errors `e{t}`, integer
    * gradient sums `g{t}`, and the half-away rounded weight update `w{t}`
    * via positive-operand integer division. All HUGEINT — bit-identical
    * to the engine's DECIMAL(38,0)/BigInt arithmetic. */
  private def probeOracle(iters: Int): String = {
    def iter(t: Int): String =
      s"""m$t AS MATERIALIZED (
         |  SELECT t.vec_id,
         |    SUM((CASE WHEN w.d = 65 THEN 1000000
         |              ELSE t.xq[w.d] END)::HUGEINT * w.wq) AS m
         |  FROM tr t CROSS JOIN w${t - 1} w GROUP BY 1),
         |e$t AS MATERIALIZED (
         |  SELECT t.vec_id, t.xq,
         |    GREATEST(LEAST(m.m + 2000000000000000::HUGEINT,
         |                   4000000000000000::HUGEINT), 0::HUGEINT)
         |      - 4000000000000000::HUGEINT * t.y AS err
         |  FROM tr t JOIN m$t m USING (vec_id)),
         |g$t AS MATERIALIZED (
         |  SELECT dm.d,
         |    SUM(e.err * (CASE WHEN dm.d = 65 THEN 1000000
         |                      ELSE e.xq[dm.d] END)::HUGEINT) AS g
         |  FROM e$t e CROSS JOIN dims dm GROUP BY 1),
         |w$t AS MATERIALIZED (
         |  SELECT w.d,
         |    w.wq - (CASE WHEN g.g >= 0
         |                 THEN (g.g + bc.hb) // bc.b
         |                 ELSE -((-g.g + bc.hb) // bc.b) END) AS wq
         |  FROM w${t - 1} w JOIN g$t g USING (d) CROSS JOIN bc)""".stripMargin
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(round(x * 8000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |lab AS MATERIALIZED (
       |  SELECT vec_id, xq,
       |    CASE WHEN list_sum(list_transform(generate_series(1, 64),
       |        d -> CASE WHEN d % 2 = 1 THEN xq[d] ELSE -xq[d] END)) >= 0
       |      THEN 1 ELSE 0 END AS y
       |  FROM qv),
       |tr AS MATERIALIZED (SELECT * FROM lab WHERE vec_id % 2 = 0),
       |dims AS MATERIALIZED (SELECT unnest(generate_series(1, 65)) AS d),
       |bc AS MATERIALIZED (
       |  SELECT CAST(2000000000000 AS HUGEINT) * COUNT(*) AS b,
       |    (CAST(2000000000000 AS HUGEINT) * COUNT(*)) // 2 AS hb
       |  FROM tr),
       |w0 AS (SELECT d, CAST(0 AS HUGEINT) AS wq FROM dims),
       |${(1 to iters).map(iter).mkString(",\n")},
       |sc AS (
       |  SELECT t.vec_id, t.y,
       |    GREATEST(LEAST(
       |      SUM((CASE WHEN w.d = 65 THEN 1000000
       |                ELSE t.xq[w.d] END)::HUGEINT * w.wq)
       |        + 2000000000000000::HUGEINT,
       |      4000000000000000::HUGEINT), 0::HUGEINT) AS p_num
       |  FROM lab t CROSS JOIN w$iters w
       |  WHERE t.vec_id % 2 = 1
       |  GROUP BY t.vec_id, t.y)""".stripMargin
  }
}
