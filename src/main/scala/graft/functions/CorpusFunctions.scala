package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: stratified
  * deterministic sampling, token-budget selection, and benchmark
  * decontamination. All three are deterministic (hash- or integer-based, no
  * RNG) so results are reproducible across runs/engines and each carries an
  * exact DuckDB oracle in the driver contract.
  */
object CorpusFunctions {

  /** The SHARED md5-prefix threshold rule — one definition with
    * [[graft.operators.Relational.deterministicSplit]], so sampling and
    * splitting stay bit-identical by construction. */
  private def hashBelow(key: Column, fraction: Double): Column =
    graft.operators.Relational.md5Below(key, fraction)

  /** The md5 32-bit-prefix integer of a key — ONE definition for every
    * operator that derives uniform integers from ids (the ES race's u,
    * the length-batch shard deal). DuckDB replays it as
    * `('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::UBIGINT`. */
  private def md5Prefix32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Stratified deterministic sampling: keep each row with a PER-GROUP rate
    * (corpus mixing — e.g. downsample `web` to 10% while keeping `books`
    * whole). Membership depends only on (key, its group's rate): re-running
    * on grown data keeps every previously-kept row, so downstream caches and
    * dedup side-tables stay valid.
    *
    * Scale: a narrow projection + filter — no shuffle, no join; the rate map
    * rides into the codegen'd plan as a CASE chain (group cardinality is
    * human-scale: sources/domains/languages).
    */
  def sampleByGroup(df: DataFrame, keyCol: String, groupCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double): DataFrame = {
    val keep = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (g, r)) => acc.when(col(groupCol) === g, hashBelow(col(keyCol), r))
    }.otherwise(hashBelow(col(keyCol), defaultRate))
    df.filter(keep)
  }

  /** Temperature-flattened mixture sampling (the mT5/multilingual-curation
    * rebalance, Xue et al. 2021): post-sample source sizes follow
    * m_s ∝ n_s^(1/T), scaled so the SMALLEST source is kept whole — rare
    * sources survive intact, dominant ones downsample by
    * r_s = (n_min/n_s)^(1−1/T). T=1 is the identity; T→∞ equalizes.
    * Membership is the repo's deterministic md5-threshold rule
    * ([[graft.operators.Relational.md5Below]]), so the sample is stable
    * under corpus growth within a source and engine-portable (full value
    * oracle). Source cardinality is assumed driver-small (languages /
    * provenance buckets) — one partial-agg count pass, then a filter. */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        temperature: Double): DataFrame = {
    require(temperature >= 1.0, "temperature must be >= 1 (1 = keep all)")
    val exponent = 1.0 - 1.0 / temperature
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toSeq
    if (counts.isEmpty) return df
    val nMin = counts.map(_._2).min.toDouble
    // a NULL source is a group like any other (col === lit(null) is never
    // true — the null-safe branch keeps those rows in the mixture instead
    // of silently deleting them while their count still skewed the rates)
    val keep = counts.foldLeft(when(lit(false), lit(false))) {
      case (acc, (s, n)) =>
        val r = math.pow(nMin / n, exponent)
        val cond = if (s == null) col(sourceCol).isNull
                   else col(sourceCol) === lit(s)
        acc.when(cond, graft.operators.Relational.md5Below(col(idCol), r))
    }.otherwise(lit(false))
    df.filter(keep)
  }

  /** Rebalance the corpus to an EXPLICIT target mixture by downsampling
    * only (the DoReMi-deployment / data-card knob: "ship 60% en, 20% es,
    * 20% fr"). Targets are integer weights (share_g = w_g / ΣW), so every
    * quota derives in EXACT integer arithmetic and the selection carries a
    * full cross-engine oracle:
    *
    *   T      = min_g floor(n_g · ΣW / w_g)   — the largest total for which
    *                                            every group can fill its share
    *   keep_g = floor(w_g · T / ΣW)           — per-group quota (≤ n_g)
    *
    * Groups absent from `weights` are dropped (weight 0). Rows are picked
    * per group in deterministic md5(id) order, so the selection is stable
    * and engine-portable.
    *
    * Scale: the corpus full-payload rows NEVER shuffle. A narrow
    * (id, group) projection pays the one per-group rank exchange; from it
    * the keep_g-th smallest md5 per group becomes a PER-GROUP THRESHOLD
    * (group-cardinality rows, broadcast), and the payload corpus is then
    * filtered ROWWISE against the threshold — the same scan-side-filter
    * shape as [[sampleByGroup]], but with an exact quota instead of a rate.
    */
  def rebalanceToMixture(docs: DataFrame, groupCol: String,
                         weights: Seq[(String, Long)],
                         idCol: String): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 > 0), "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate group in weights")
    val sumW = weights.map(_._2).sum
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toDF(groupCol, "__w")

    val mkey = md5(col(idCol).cast("string"))
    val narrow = docs.select(col(idCol), col(groupCol))
    val counts = narrow.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), countDistinct(col(idCol)).as("__nd"))
    // a WEIGHTED group with zero corpus rows makes the declared mixture
    // unsatisfiable (the formula says T = 0): silently rebalancing over
    // the remaining groups would ship the WRONG mixture, so fail loudly —
    // the drift_gate convention, not the silent-drop one. The probe costs
    // one weight-cardinality collect of the (already tiny) counts.
    val wrows = counts
      .filter(col(groupCol).isin(weights.map(_._1): _*))
      .select(col(groupCol), col("__n"), col("__nd")).collect()
    val present = wrows.map(_.getString(0)).toSet
    val absent = weights.map(_._1).filterNot(present)
    if (absent.nonEmpty) throw new IllegalArgumentException(
      s"rebalanceToMixture: weighted group(s) ${absent.mkString(", ")} " +
        "have no rows — the declared mixture is unsatisfiable (T = 0)")
    // the threshold admission below (mkey < tm OR (mkey = tm AND id <= tid))
    // is only an EXACT quota when ids are unique per group: duplicate ids
    // share one md5 key, so a group could admit more than keep_g rows and
    // silently ship the wrong mixture. The uniqueness probe rides the same
    // counts aggregate (count vs countDistinct) — fail loudly, the
    // operator's convention for every other unsatisfiable input.
    val duped = wrows.filter(r => r.getLong(1) != r.getLong(2))
      .map(_.getString(0))
    if (duped.nonEmpty) throw new IllegalArgumentException(
      s"rebalanceToMixture: group(s) ${duped.mkString(", ")} have " +
        s"duplicate $idCol values — exact quota admission needs unique ids " +
        "(dedupe upstream or supply a unique id column)")
    // feasibility caps and the global total T (1 row, broadcast)
    val feas = counts.join(broadcast(wdf), groupCol)
      .withColumn("__cap", expr(s"(__n * ${sumW}L) div __w"))
    val tRow = feas.agg(min(col("__cap")).as("__T"))
    val quota = feas.crossJoin(broadcast(tRow))
      .withColumn("__keep", expr(s"(__w * __T) div ${sumW}L"))
      .select(col(groupCol), col("__keep"))
      .filter(col("__keep") > 0)

    // the keep_g-th (group, md5, id) in rank order IS the admission
    // threshold; ties on md5 break by id, so membership is total-ordered
    val thresholds = narrow.join(broadcast(quota), groupCol)
      .select(col(groupCol), col("__keep"), mkey.as("__m"), col(idCol))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol)).orderBy(col("__m"), col(idCol))))
      .filter(col("__rn") === col("__keep"))
      .select(col(groupCol), col("__m").as("__tm"),
        col(idCol).as("__tid"))

    docs.join(broadcast(thresholds), groupCol)
      .filter(mkey < col("__tm") ||
        (mkey === col("__tm") && col(idCol) <= col("__tid")))
      .drop("__tm", "__tid")
  }

  /** Corpus DATA CARD: the one-stop (metric, value) report a dataset
    * release ships — size, token mass, exact-duplicate fraction, and the
    * group mixture — as a tall relation ready for diffing between
    * snapshots (feed two cards to [[distributionDriftFromCounts]]-style
    * comparisons or the snapshot-diff audit). Every value is a count or
    * an IEEE quotient of exact counts, so the whole card replays
    * cross-engine.
    *
    * Scale: two partial-aggregated passes (corpus stats; group counts) —
    * exchanges carry (group) and 16-byte fingerprints, never text. The
    * report itself is driver-sized by definition (a handful of rows plus
    * one per group), so assembling it on the driver is the right cost. */
  def dataCard(docs: DataFrame, textCol: String,
               groupCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = docs.select(col(groupCol).as("__g"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("__nt"),
      md5(col(textCol).cast("binary")).as("__f"))
    val s = t.agg(count(lit(1)).as("n"), sum(col("__nt")).as("tok"),
      count(col("__f")).as("ntext"), countDistinct(col("__f")).as("dis"))
      .head()
    val n = s.getLong(0)
    if (n == 0) // no corpus, no card — not a divide-by-zero NaN sheet
      return Seq.empty[(String, Double)].toDF("metric", "value")
    val tok = if (s.isNullAt(1)) 0L else s.getLong(1)
    val nText = s.getLong(2) // docs with NON-NULL text
    val dis = s.getLong(3)   // countDistinct skips NULL fingerprints
    // shares cover NON-NULL groups; the NULL group gets its own count
    // metric instead of a share row (a group whose literal value is
    // "null" would otherwise collide with it)
    val groups = t.filter(col("__g").isNotNull)
      .groupBy(col("__g")).agg(count(lit(1)).as("c"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .sortBy(_._1)
    val nullGroup = n - groups.map(_._2).sum
    val rows = Seq(
      ("n_docs", n.toDouble),
      ("n_tokens", tok.toDouble),
      ("n_null_texts", (n - nText).toDouble),
      ("n_distinct_texts", dis.toDouble),
      // duplicate fraction over docs WITH text: a NULL text is unknown
      // content, not a duplicate of other NULL texts
      ("dup_doc_frac",
        if (nText == 0) 0.0 else (nText - dis).toDouble / nText),
      ("mean_tokens", tok.toDouble / n),
      ("n_null_group", nullGroup.toDouble)) ++
      groups.map { case (g, c) => (s"share_$g", c.toDouble / n) }
    rows.toDF("metric", "value")
  }

  /** Length-grouped training batches (the fairseq/HF `group_by_length`
    * serving layout): docs land in fixed-size batches of SIMILAR token
    * length, minimizing padding waste when a batch pads to its longest
    * member. Docs first deal into `shards` by md5(id) — a random partition,
    * so every shard sees the corpus' length distribution — then sort by
    * (length desc, id) WITHIN their shard and chop into `batchSize`-row
    * batches. Returns (id, shard, batch, pos, n_tokens). Deterministic →
    * reproducible epochs and a full cross-engine oracle.
    *
    * Scale: the md5 deal avoids the global length sort (a total order
    * would funnel everything through one rank); the one exchange carries
    * (id, len) keyed by shard, and each shard's window sorts only its own
    * slice — the [[epochShards]] shape with a length key. Rows with NULL
    * id or NULL/negative length are excluded. */
  def lengthGroupedBatches(docs: DataFrame, idCol: String,
                           lenCol: String, shards: Int = 16,
                           batchSize: Int = 32): DataFrame = {
    require(shards >= 1 && shards <= 4096, s"shards $shards out of [1,4096]")
    require(batchSize >= 1, s"batchSize $batchSize < 1")
    val ln = col(lenCol).cast("long")
    // md5 32-bit prefix mod N (NOT epochShards' positional-nibble rule,
    // which fixes shard counts at powers of 16 — this deal takes any N)
    val shard = pmod(md5Prefix32(col(idCol)), lit(shards.toLong)).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__len").desc, col(idCol).asc)
    docs.filter(col(idCol).isNotNull && ln.isNotNull && ln >= 0)
      .select(col(idCol), ln.as("__len"))
      .withColumn("shard", shard)
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), col("shard"),
        expr(s"(__rn - 1) div $batchSize").cast("int").as("batch"),
        ((col("__rn") - 1) % batchSize).cast("int").as("pos"),
        col("__len").as("n_tokens"))
  }

  /** Preference-pair construction for DPO/RLHF-style training: per group
    * (prompt, topic, source …), pair the i-th BEST-scored row with the
    * i-th WORST as (chosen, rejected), keep pairs whose score gap is at
    * least `gapMin`, cap at `maxPerGroup` pairs. Deterministic ordering
    * ((score, id) tiebreaks both ends), so the pairing is reproducible
    * and engine-portable. A row never appears on both sides of one pair
    * (the best-vs-worst alignment crosses at the middle: pair i is only
    * emitted while rank_i < rev_rank_i). Rows with a NULL group, NULL id,
    * or NULL/NaN score are excluded up front (a null group would rank and
    * then silently vanish in the non-null-safe pair join).
    *
    * Scale: two literal-capped ranks (one per sort direction — their
    * exchanges cannot be shared, the partial WindowGroupLimits sort
    * opposite ways) plus the (group, i) pair join; every one of those
    * exchanges carries at most maxPerGroup rows per group after the
    * map-side WindowGroupLimit, never the group body.
    */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, gapMin: Double,
                      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    require(gapMin >= 0, s"gapMin must be non-negative, got $gapMin")
    val sd = col(scoreCol).cast("double")
    val base = df.filter(sd.isNotNull && !isnan(sd) &&
        col(idCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol), col(idCol), sd.as("__s"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__s").desc, col(idCol).asc)
    val wBot = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__s").asc, col(idCol).desc)
    val top = base.withColumn("__i", row_number().over(wTop))
      .filter(col("__i") <= maxPerGroup)
      .select(col(groupCol), col("__i"),
        col(idCol).as("chosen_id"), col("__s").as("chosen_score"))
    val bot = base.withColumn("__i", row_number().over(wBot))
      .filter(col("__i") <= maxPerGroup)
      .select(col(groupCol), col("__i"),
        col(idCol).as("rejected_id"), col("__s").as("rejected_score"))
    top.join(bot, Seq(groupCol, "__i"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= gapMin &&
        // stop at the crossing point: beyond it the "chosen" of pair i is
        // ranked below its "rejected" and the pair would invert
        col("chosen_score") > col("rejected_score"))
      .select(col(groupCol), col("__i").as("pair_rank"),
        col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * per group, keep the `n` rows that win the exponential race
    * key = −ln(u)/w — inclusion probability proportional to `weightCol`
    * (quality-weighted corpus carve-outs: sample prefer-high-quality
    * without hard-cutting the tail, cf. the FineWeb ablation recipe).
    *
    * Determinism/portability: u derives from the md5(id) 32-bit prefix as
    * (prefix + 0.5)·2⁻³² — EXACTLY representable (power-of-two divisor) and
    * strictly inside (0,1) in both engines; keys are rounded to 4 decimals
    * before ordering (id tiebreak) so the ≤1-ulp `ln` disagreement between
    * libm implementations cannot flip a rank. Rows with weight ≤ 0, NULL
    * or NaN, and rows with a NULL id, are excluded (the ES race is
    * undefined there).
    *
    * Scale: groupCols empty → global top-n = TakeOrdered (no sort);
    * grouped → literal-n rank, WindowGroupLimit pre-prunes map-side. The
    * key is computed rowwise from (id, weight); text never shuffles beyond
    * the surviving n·groups rows. */
  def weightedSampleByGroup(df: DataFrame, idCol: String, weightCol: String,
                            groupCols: Seq[String], n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (md5Prefix32(col(idCol)).cast("double") + 0.5) / 4294967296.0
    val key = round(-log(u) / col(weightCol).cast("double"), 4)
    // NaN > 0 is TRUE under Spark's total order, so an upstream 0/0 score
    // would slip through a bare `> 0` with key NaN; a NULL id would get a
    // NULL race key that sorts FIRST and steals slots from real rows —
    // both are excluded, per the docstring's contract
    val wd = col(weightCol).cast("double")
    val base = df.filter(wd > 0 && !isnan(wd) && col(idCol).isNotNull)
    if (groupCols.isEmpty)
      base.withColumn("__k", key)
        .orderBy(col("__k"), col(idCol)).limit(n).drop("__k")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(key, col(idCol))
      base.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n).drop("__rn")
    }
  }

  /** Greedy token-budget selection: PER GROUP, admit documents in a
    * deterministic order (ascending `orderCol`) until the group's cumulative
    * token count would exceed `budget` — the "fill each source's quota"
    * step of corpus assembly. Returns the admitted rows with their running
    * total (`cum_tokens`).
    *
    * Scale: one shuffle on the group column; within a group the running sum
    * is a single sorted window pass. Group count is small (sources), but
    * rows per group are unbounded — the window never buffers the whole
    * group (running frame), so this survives 100 TB as long as no single
    * group must be TOTALLY ordered across more data than one task can sort;
    * for pathological single-source corpora, pre-chunk by [[sampleByGroup]].
    */
  def selectWithinTokenBudget(df: DataFrame, groupCol: String,
                              tokenCol: Column, orderCol: String,
                              budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Long.MinValue, 0)
    df.withColumn("cum_tokens", sum(tokenCol).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Benchmark decontamination: for every document, the fraction of its
    * word n-gram shingles that also occur in a benchmark/eval corpus —
    * the overlap test run before training so eval answers aren't memorized
    * from the training set. Returns (id, n_shingles, n_hits, overlap).
    *
    * Scale: benchmark shingles are BENCHMARK-scale (eval sets are small) —
    * distinct'd, then broadcast; each corpus doc explodes its shingles once
    * and left-joins the broadcast set, and the hit-count groupBy carries
    * only (id, hit) through partial aggregation. The corpus is never
    * shuffled on text and never self-joined. Both sides shingle via the
    * codegen'd [[ShingleHashes]] byte-scan (one pass, no token/shingle
    * string allocation, 8-byte join keys) — set cardinalities equal the
    * string-shingle ones short of a 64-bit collision inside one comparison
    * (P ≈ |corpus-doc|·|bench| / 2⁶⁴ per doc — negligible).
    */
  def contaminationScores(docs: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int = 3): DataFrame = {
    def hashed(d: DataFrame) = d
      .select(col(idCol), DedupFunctions.shingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)

    val benchShingles = hashed(benchmark)
      .select(explode(col("hs")).as("h")).distinct()
      .withColumn("hit", lit(1))
    hashed(docs)
      .select(col(idCol), explode(col("hs")).as("h"))
      .join(broadcast(benchShingles), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .withColumn("overlap", col("n_hits").cast("double") / col("n_shingles"))
  }

  /** Annotation MAJORITY VOTE — the rating-aggregation step of every
    * human-labeled dataset (RLHF preference labels, toxicity flags,
    * quality grades): per item, the label with the most DISTINCT raters,
    * ties broken to the lexicographically smallest label (deterministic,
    * engine-portable), plus the agreement fraction majority_votes /
    * n_raters that downstream filters gate on ("keep items with ≥ 2/3
    * agreement"). A rater voting the same label twice counts once; a
    * rater voting several labels contributes to each label's tally but
    * once to n_raters. NULL labels are abstentions: the row is dropped
    * before tallying (a rater who only abstained does not reach n_raters)
    * — besides matching annotation semantics, this keeps the tie-break
    * engine-portable (Spark windows sort NULL first ascending, DuckDB
    * sorts it last, so a surviving NULL would win ties on one engine and
    * lose them on the other).
    *
    * Scale: two partial-aggregated passes — (item, label, rater) distinct
    * → per-label tallies → a per-item rank window over label-cardinality
    * rows. Exchanges carry ids and labels, never payloads; all outputs
    * are exact counts or one IEEE quotient. */
  def majorityVote(df: DataFrame, itemCol: String, raterCol: String,
                   labelCol: String): DataFrame = {
    val votes = df
      .select(col(itemCol), col(raterCol).as("__r"), col(labelCol).as("__l"))
      .filter(col("__l").isNotNull)
      .distinct()
    val tally = votes.groupBy(col(itemCol), col("__l"))
      .agg(countDistinct(col("__r")).as("__v"))
    val raters = votes.groupBy(col(itemCol))
      .agg(countDistinct(col("__r")).as("n_raters"),
        countDistinct(col("__l")).as("n_labels"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(itemCol)).orderBy(col("__v").desc, col("__l").asc)
    tally.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(raters, Seq(itemCol))
      .select(col(itemCol), col("n_raters"), col("n_labels"),
        col("__l").as("majority_label"), col("__v").as("majority_votes"),
        (col("__v").cast("double") / col("n_raters").cast("double"))
          .as("agreement"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal data, Krippendorff 2004) — the standard
    * inter-rater reliability statistic reported alongside every released
    * annotation set ("labels were collected at α = 0.81"). One value per
    * (item, rater): the lexicographically smallest non-null label (NULLs
    * are abstentions, the [[majorityVote]] convention; the deterministic
    * pick makes the statistic a pure function of the input SET). Items
    * with fewer than 2 ratings are unpairable and excluded throughout.
    *
    *   D_obs = (1/n) Σ_i [ Σ_c n_ic·(n_i − n_ic) ] / (n_i − 1)
    *   D_exp = (n² − Σ_c n_c²) / (n·(n−1))
    *   α     = 1 − D_obs / D_exp   (α = 1 when D_exp = 0: a one-category
    *                                corpus has no disagreement to expect)
    *
    * Engine parity: every count is an exact integer; the per-item D_obs
    * contribution (the only non-integer intermediate) rounds to 9 decimals
    * and sums as DECIMAL(28,9) — order-independent — and the final
    * quotients are single IEEE steps over values both engines share.
    *
    * Scale: two partial-agg passes (item×label counts, then per-item
    * contributions) + a category-scale total; exchanges carry item ids and
    * labels, never payloads; output is ONE row. */
  def krippendorffAlpha(df: DataFrame, itemCol: String, raterCol: String,
                        labelCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val vals = df
      .select(col(itemCol).as("__i"), col(raterCol).as("__r"),
        col(labelCol).as("__l"))
      .filter(col("__l").isNotNull)
      .groupBy(col("__i"), col("__r")).agg(min(col("__l")).as("__l"))
    val pairable = vals.groupBy(col("__i"))
      .agg(count(lit(1)).as("n_i")).filter(col("n_i") >= 2)
    val nic = vals.join(pairable, Seq("__i"))
      .groupBy(col("__i"), col("n_i"), col("__l"))
      .agg(count(lit(1)).as("n_ic"))
    val obs = nic
      .groupBy(col("__i"), col("n_i"))
      .agg(sum(col("n_ic") * (col("n_i") - col("n_ic"))).as("__num"))
      .select(col("n_i"),
        round(col("__num").cast("double") /
          (col("n_i") - 1).cast("double"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("__c"))
      .agg(count(lit(1)).as("n_items"), sum(col("n_i")).as("n_values"),
        sum(col("__c")).as("__don"))
    val cat = vals.join(pairable.select(col("__i")), Seq("__i"))
      .groupBy(col("__l")).agg(count(lit(1)).cast(dec38).as("n_c"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("n_c") * col("n_c")).as("__sq"))
    obs.crossJoin(cat)
      .withColumn("d_obs",
        col("__don").cast("double") / col("n_values").cast("double"))
      .withColumn("d_exp",
        (col("n_values").cast(dec38) * col("n_values").cast(dec38) -
          col("__sq")).cast("double") /
          (col("n_values").cast(dec38) *
            (col("n_values").cast(dec38) - 1)).cast("double"))
      .select(col("n_items"), col("n_values"), col("n_categories"),
        col("d_obs"), col("d_exp"),
        when(col("d_exp") === 0.0, lit(1.0))
          .otherwise(lit(1.0) - col("d_obs") / col("d_exp")).as("alpha"))
  }

  /** The SHARED reliability-gate fold — one definition for the batch
    * `reliability_gate` post-op and
    * [[graft.streaming.StreamingPipeline.streamingReliabilityGate]] (the
    * [[driftGateFold]] pattern): the increment's [[krippendorffAlpha]]
    * must reach `minAlpha` BEFORE folding — a breach throws with the fold
    * cursor unmoved, so the same batch is re-gated on retry; a passing
    * increment appends its one-row report (with an ordering `batch_seq`)
    * to the cumulative audit state. No pairable items → NULL alpha →
    * vacuous pass. */
  def reliabilityGateFold(prev: Option[DataFrame], batch: DataFrame,
                          itemCol: String, raterCol: String,
                          labelCol: String, minAlpha: Double,
                          what: String): DataFrame = {
    val rep0 = krippendorffAlpha(batch, itemCol, raterCol, labelCol)
    // the statistic runs ONCE: the 1-row result is collected for the gate
    // check and re-lifted for the fold (re-using rep0 would re-execute
    // the whole aggregation at persist time)
    val rows = rep0.collect()
    val row = rows.head
    val aIdx = row.fieldIndex("alpha")
    if (!row.isNullAt(aIdx) && row.getDouble(aIdx) < minAlpha)
      throw new IllegalStateException(
        f"reliability_gate $what: increment inter-rater alpha " +
          f"${row.getDouble(aIdx)}%.3f < $minAlpha — review the " +
          "annotation batch before syncing")
    // batch_seq orders the audit rows; prev is report-scale, cheap count
    val seq = prev.map(_.count()).getOrElse(0L) + 1L
    val rep = batch.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), rep0.schema)
      .withColumn("batch_seq", lit(seq))
    prev.fold(rep)(p => p.unionByName(rep))
  }

  /** Per-RATER consensus quality with LEAVE-ONE-OUT majorities — the rater
    * triage step of an annotation pipeline ("which raters should we stop
    * paying / retrain"). For each (item, rater) the consensus is recomputed
    * WITHOUT that rater's vote (subtracting their label from the tallies),
    * so a rater can never inflate their own score by being counted in the
    * reference — the bias a naive compare-to-[[majorityVote]] carries.
    * One value per (item, rater): smallest non-null label (abstentions
    * dropped, the [[krippendorffAlpha]] convention). Items where removing
    * the rater leaves no votes have no consensus and are excluded from
    * that rater's denominator. LOO ties break to the lexicographically
    * smallest label (deterministic, engine-portable).
    *
    * Scale: the candidate relation is Σ_items (raters_i × labels_i) rows —
    * pair-graph scale, same class as the MinHash candidate sets; exchanges
    * carry (item, rater, label, count), never payloads. Output is one row
    * per rater: n_items, n_agree, agree_rate. */
  def raterConsensusQuality(df: DataFrame, itemCol: String,
                            raterCol: String, labelCol: String): DataFrame = {
    val vals = df
      .select(col(itemCol).as("__i"), col(raterCol).as("__r"),
        col(labelCol).as("__l"))
      .filter(col("__l").isNotNull)
      .groupBy(col("__i"), col("__r")).agg(min(col("__l")).as("__own"))
    // vals is unique per (item, rater), so COUNT(*) here IS distinct raters
    val tally = vals.groupBy(col("__i"), col("__own"))
      .agg(count(lit(1)).as("__v"))
      .select(col("__i"), col("__own").as("__l"), col("__v"))
    val cand = vals.join(tally, Seq("__i"))
      .withColumn("__adj",
        col("__v") - when(col("__l") === col("__own"), 1L).otherwise(0L))
      .filter(col("__adj") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i"), col("__r"))
      .orderBy(col("__adj").desc, col("__l").asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__r"), (col("__l") === col("__own")).as("__agree"))
      .groupBy(col("__r").as(raterCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__agree"), 1L).otherwise(0L)).as("n_agree"))
      .select(col(raterCol), col("n_items"), col("n_agree"),
        (col("n_agree").cast("double") / col("n_items").cast("double"))
          .as("agree_rate"))
  }

  /** Per-RATER label-BIAS report — PSI of each rater's label mix against
    * the pooled mix (the [[distributionDrift]] arithmetic, per rater):
    * catches the annotator who always answers "safe" / grades everything
    * 3, which per-item agreement alone can miss when items are easy. One
    * value per (item, rater) (min non-null label, the
    * [[krippendorffAlpha]] convention); categories are the pooled label
    * set, add-1 smoothed so a rater's unused labels stay finite. Reads as
    * PSI: < 0.1 in line with the pool, > 0.25 strongly biased.
    *
    * Engine parity: the drift convention verbatim — IEEE share quotients
    * of exact integers, 6-decimal-rounded ln, 9-decimal DECIMAL
    * contributions summed exactly per rater.
    *
    * Scale: vote-scale partial aggs, then a (raters × labels) grid with
    * the label relation broadcast — label cardinality is human-scale;
    * output is one row per rater. */
  def raterBiasReport(df: DataFrame, itemCol: String, raterCol: String,
                      labelCol: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(18, 9)
    val vals = df
      .select(col(itemCol).as("__i"), col(raterCol).as("__r"),
        col(labelCol).as("__l"))
      .filter(col("__l").isNotNull)
      .groupBy(col("__i"), col("__r")).agg(min(col("__l")).as("__l"))
    val perRater = vals.groupBy(col("__r"), col("__l"))
      .agg(count(lit(1)).as("n_r"))
    val pool = vals.groupBy(col("__l")).agg(count(lit(1)).as("n_p"))
    val tot = pool.agg(count(lit(1)).as("__k"), sum(col("n_p")).as("__tp"))
    val raterTot = vals.groupBy(col("__r")).agg(count(lit(1)).as("t_r"))
    val grid = raterTot
      .crossJoin(broadcast(pool))
      .join(perRater, Seq("__r", "__l"), "left_outer")
      .select(col("__r"), col("t_r"), col("n_p"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))
      .crossJoin(broadcast(tot))
      .withColumn("pa", (col("n_r") + 1).cast("double") /
        (col("t_r") + col("__k")).cast("double"))
      .withColumn("pb", (col("n_p") + 1).cast("double") /
        (col("__tp") + col("__k")).cast("double"))
      .withColumn("__c",
        round((col("pa") - col("pb")) *
          round(log(col("pa") / col("pb")), 6), 9).cast(dec9))
    grid.groupBy(col("__r").as(raterCol))
      .agg(first(col("t_r")).as("n_votes"),
        sum(col("__c")).cast("double").as("psi"))
  }

  /** TEMPERATURE-SCALED mixture weights (the multilingual α-sampling rule,
    * Conneau & Lample 2019 / mT5): resampling weights w_g ∝ share_g^α that
    * flatten (α < 1) or sharpen (α > 1) a corpus mix — the knob every
    * multilingual / multi-source training run turns so low-resource groups
    * are not drowned. Emits per group: n_docs, share, the normalized
    * target weight, and `weight_int` — the weight's exact 9-decimal
    * fixed-point numerator, ready to feed [[rebalanceToMixture]] as its
    * integer weights (the two operators compose into "resample the corpus
    * to temperature α").
    *
    * Relation to [[temperatureSample]] (α = 1/T): that operator CARVES the
    * sample directly with per-source md5 rates — counts hit the target
    * only in expectation, smallest source pinned whole. This one emits the
    * weight RELATION, so the carve can go through [[rebalanceToMixture]]'s
    * exact integer quotas (deterministic row counts, admission
    * thresholds) — the audit-grade path when a data card must state the
    * mixture exactly.
    *
    * A group whose share^α rounds to zero at 9 decimals (aggressive
    * sharpening of a vanishing group) surfaces with `weight_int = 0`;
    * [[rebalanceToMixture]] refuses zero weights, so filter those rows
    * first — dropping the group is exactly what a zero target weight
    * means.
    *
    * Engine parity: share^α rounds to 9 decimals and the normalizer is an
    * exact DECIMAL sum, so weights are IEEE quotients of shared decimals.
    * NULL groups are dropped ([[rebalanceToMixture]] ignores unweighted
    * groups anyway).
    *
    * Scale: one partial-agg count pass; everything after operates on the
    * group-cardinality relation with 1-row broadcast totals. */
  def temperatureMixtureWeights(df: DataFrame, groupCol: String,
                                alpha: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__t"))
    val p = counts.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_docs").cast("double") / col("__t").cast("double"))
      .withColumn("__p", round(pow(col("share"), lit(alpha)), 9)
        .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
    val z = p.agg(sum(col("__p")).as("__z"))
    p.crossJoin(broadcast(z))
      .select(col(groupCol), col("n_docs"), col("share"),
        (col("__p").cast("double") / col("__z").cast("double"))
          .as("weight"),
        (col("__p") * lit(1000000000L)).cast("long").as("weight_int"))
  }

  /** DUPLICATION PROFILE — the release-audit histogram "how much exact
    * duplication, at what multiplicity, and does it leak across sources":
    * per multiplicity m, the number of content groups, the docs they
    * hold, and how many of those groups span ≥ 2 `groupCol` values (a
    * mirrored dump shows up as a spike of cross-source groups long before
    * anyone diffs the dumps). Uses [[DedupFunctions.exactDuplicateGroups]]'
    * fingerprint convention (md5 of normalized text); with no `groupCol`
    * the cross-source column is 0.
    *
    * Scale: one fingerprint partial-agg (the exact-dedup shuffle, 16-byte
    * keys) then a multiplicity-cardinality fold; output rows = distinct
    * multiplicities. */
  def duplicationProfile(docs: DataFrame, textCol: String,
                         groupCol: Option[String] = None): DataFrame = {
    val base = docs.select(
      TextFunctions.fingerprintMd5(col(textCol)).as("__fp"),
      groupCol.map(g => col(g)).getOrElse(lit(null).cast("string"))
        .as("__g"))
    base.groupBy(col("__fp"))
      .agg(count(lit(1)).as("m"), countDistinct(col("__g")).as("__ns"))
      .groupBy(col("m").as("multiplicity"))
      .agg(count(lit(1)).as("n_groups"), sum(col("m")).as("n_docs"),
        sum(when(col("__ns") >= 2, 1L).otherwise(0L))
          .as("n_cross_source_groups"))
  }

  /** Mixture DIVERSITY metrics — the two numbers a data card quotes about
    * a corpus mix: Shannon entropy H = ln n − (Σ n_g·ln n_g)/n (nats; how
    * evenly the mass spreads over groups) and Gini–Simpson 1 − Σ n_g²/n²
    * (the chance two random docs differ in group). A release dominated by
    * one source scores near 0 on both however many groups nominally
    * exist. NULL groups are dropped.
    *
    * Engine parity: Gini–Simpson is pure integer arithmetic (Σ n_g² as
    * DECIMAL(38,0)) with one IEEE quotient; each entropy term n_g·ln(n_g)
    * rounds to 6 decimals into an exact DECIMAL sum, then two IEEE steps.
    *
    * Scale: one partial-agg count pass; everything after is
    * group-cardinality with a 1-row output. */
  def mixtureDiversity(df: DataFrame, groupCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_g")).as("n_rows"),
        sum((col("n_g").cast(dec38) * col("n_g").cast(dec38))).as("__sq"),
        sum(round(col("n_g").cast("double") *
          log(col("n_g").cast("double")), 6).cast(dec)).as("__sl"))
      .select(col("n_groups"), col("n_rows"),
        when(col("n_rows") > 0,
          log(col("n_rows").cast("double")) -
            col("__sl").cast("double") / col("n_rows").cast("double"))
          .as("entropy_nats"),
        when(col("n_rows") > 0,
          lit(1.0) - col("__sq").cast("double") /
            (col("n_rows").cast(dec38) * col("n_rows").cast(dec38))
              .cast("double")).as("gini_simpson"))
  }

  /** TOKENIZER FERTILITY report — the multilingual data-card metric (Rust
    * et al. 2021): per group (usually language), exact token / word / byte
    * totals and their ratios. fertility = tokens per whitespace word (a
    * tokenizer serving one language at ~1.3 while another pays 4+ is
    * silently under-training the latter); bytes_per_token is the
    * compression-rate twin. Token counts use the codegen'd BPE-ish
    * pretokenizer family ([[TextFunctions.bpeishTokenCount]]) so the
    * report replays cross-engine; swap in real frozen-BPE counts via
    * [[BpeFunctions]] when the merges table exists. NULL groups drop.
    *
    * Engine parity: all totals are exact integer sums; the two ratios are
    * IEEE quotients of those integers (NULL on zero denominators).
    *
    * Scale: one rowwise projection + one group-cardinality partial agg. */
  def tokenizerFertility(docs: DataFrame, groupCol: String,
                         textCol: String = "text"): DataFrame =
    docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol),
        TextFunctions.wordCount(col(textCol)).cast("long").as("__w"),
        TextFunctions.bpeishTokenCount(col(textCol)).cast("long").as("__t"),
        octet_length(col(textCol)).cast("long").as("__b"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_tokens"), sum(col("__b")).as("n_bytes"))
      .select(col(groupCol), col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_bytes"),
        when(col("n_words") > 0, col("n_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"),
        when(col("n_tokens") > 0, col("n_bytes").cast("double") /
          col("n_tokens").cast("double")).as("bytes_per_token"))

  /** TOKEN-BUDGET ALLOCATION plan — "how many epochs of each source fit my
    * B-token run": given per-group target weights and an epoch cap
    * (repeating data beyond ~4 epochs stops helping — Muennighoff 2023's
    * data-constrained scaling result), emit per group the available tokens
    * A_g (exact sum of `tokenCol`), the weight-proportional target
    * T_g = ⌊B·w_g/ΣW⌋, the cap-respecting allocation
    * min(T_g, maxEpochs·A_g), the implied epoch count, and the SHORTFALL
    * the cap leaves unfilled — the decision surface for re-weighting or
    * sourcing more data, computed rather than eyeballed. Weighted groups
    * missing from the corpus surface with zero availability (their whole
    * target is shortfall); unweighted corpus groups drop (a zero weight
    * means drop, the [[rebalanceToMixture]] convention).
    *
    * Engine parity: targets/allocations are exact 64-bit integer
    * arithmetic — budget·w_g must fit in a long (guarded loudly; a 900
    * trillion-token budget still fits at ΣW = 10⁴), the epoch cap
    * available·maxEpochs is computed in DECIMAL(38,0) so it cannot wrap
    * for near-Long.Max corpora (the least() against target keeps the
    * result long-ranged), and long division of positives is the same
    * floor both engines compute. `epochs` is one IEEE quotient of exact
    * integers.
    *
    * Scale: one partial-agg sum pass; everything after joins the
    * group-cardinality relation against a broadcast weights literal. */
  def tokenBudgetPlan(docs: DataFrame, groupCol: String, tokenCol: String,
                      weights: Seq[(String, Long)], budgetTokens: Long,
                      maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be at least 1: $maxEpochs")
    require(weights.nonEmpty, "no weights given")
    require(weights.forall(_._2 > 0),
      s"weights must be positive (drop a group by omitting it): $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate group in weights: $weights")
    val maxW = weights.map(_._2).max
    require(maxW <= Long.MaxValue / budgetTokens,
      s"budget $budgetTokens × weight $maxW overflows 64-bit — rescale the weights")
    val sumW = weights.map(_._2).sum
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(groupCol, "__w")
    val avail = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).as("available_tokens"))
    // the aggregated availability relation is group-cardinality — IT is the
    // broadcastable build side of the weights left join (the preserved
    // weights side of a left-outer can never build)
    w.join(broadcast(avail), Seq(groupCol), "left")
      .withColumn("available_tokens", coalesce(col("available_tokens"), lit(0L)))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * __w) div ${sumW}L"))
      // the epoch cap is computed in DECIMAL(38,0): available·maxEpochs can
      // exceed Long range for near-Long.Max corpora, where a 64-bit product
      // would silently wrap NEGATIVE and zero the allocation; in decimal the
      // oversized product just loses the least() to target (≤ budget, which
      // the weight guard above proved fits), so the cast back is exact
      .withColumn("allocated_tokens",
        least(col("target_tokens").cast(org.apache.spark.sql.types.DecimalType(38, 0)),
          col("available_tokens").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
            lit(maxEpochs.toLong)).cast("long"))
      .select(col(groupCol), col("available_tokens"), col("target_tokens"),
        col("allocated_tokens"),
        when(col("available_tokens") > 0,
          col("allocated_tokens").cast("double") /
            col("available_tokens").cast("double")).as("epochs"),
        (col("allocated_tokens") < col("target_tokens")).as("capped"),
        (col("target_tokens") - col("allocated_tokens")).as("shortfall_tokens"))
  }

  /** ZIPF rank-frequency fit — the corpus-health diagnostic that catches
    * template/boilerplate floods (slope far from −1, r² collapse) before
    * they poison training: closed-form log-log OLS over the top-R term
    * frequencies. slope ≈ −1 with high r² is natural language (Zipf 1949);
    * machine-generated or deduplication-damaged corpora bend the curve.
    *
    * Engine parity: ln(rank) / ln(freq) round to 6 decimals and all five
    * OLS sums are exact DECIMAL folds; slope/intercept/r² are then fixed
    * parenthesized IEEE steps over shared decimals. Fewer than 2 distinct
    * terms → NULL fit columns (no line to fit), counts still reported.
    *
    * Scale: one vocab-scale partial-agg count, then TakeOrdered(R) — the
    * rank window runs over the R-row literal-bounded result, never the
    * vocabulary; output is ONE row. */
  def zipfFit(docs: DataFrame, textCol: String,
              topR: Int = 1000): DataFrame = {
    require(topR >= 2, s"topR must be at least 2, got $topR")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val tf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
    val stats = tf.agg(count(lit(1)).as("n_types"),
      sum(col("f")).as("total_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("f").desc, col("term").asc)
    val pts = tf.orderBy(col("f").desc, col("term").asc).limit(topR)
      .withColumn("r", row_number().over(w))
      .select(round(log(col("r").cast("double")), 6).cast(dec).as("x"),
        round(log(col("f").cast("double")), 6).cast(dec).as("y"))
    stats.crossJoin(logLogOlsRow(pts))
      .select(col("n_types"), col("total_tokens"),
        col("rr").as("top_r_used"),
        col("slope"), col("intercept"), col("r2"))
  }

  /** Closed-form OLS over 6-decimal-rounded log-log points — ONE
    * definition for [[zipfFit]] and [[heapsFit]]: `pts` is (x, y) as
    * DECIMAL(18,6); returns 1 row (rr, slope, intercept, r2) with the
    * five sums folded exactly and the fit as fixed parenthesized IEEE
    * steps (NULL fit when fewer than 2 points / a degenerate spread). */
  private def logLogOlsRow(pts: DataFrame): DataFrame = {
    val s = pts.agg(count(lit(1)).as("rr"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val r = col("rr").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = r * d("sxy") - d("sx") * d("sy")
    val denX = r * d("sxx") - d("sx") * d("sx")
    val denY = r * d("syy") - d("sy") * d("sy")
    // guard BOTH denominators: a degenerate x-spread (distinct points
    // whose ln-values round to the same 6-decimal x) made slope/intercept
    // NaN/±Infinity while the docstring promises a NULL fit — only denY
    // was guarded
    s.select(col("rr"),
      when(col("rr") >= 2 && denX =!= 0.0, num / denX).as("slope"),
      when(col("rr") >= 2 && denX =!= 0.0,
        (d("sy") - (num / denX) * d("sx")) / r).as("intercept"),
      when(col("rr") >= 2 && denX =!= 0.0 && denY =!= 0.0,
        num * num / (denX * denY)).as("r2"))
  }

  /** HEAPS' LAW vocabulary-growth fit — the second corpus-health curve
    * next to [[zipfFit]]: V(N) ≈ K·N^β over cumulative token count N,
    * fit as ln V = β·ln N + ln K. Natural language sits near β ≈ 0.4–0.6;
    * β drifting toward 1 means unbounded novel tokens (serial numbers,
    * noise, encoding damage), β collapsing toward 0 means a template
    * flood has stopped growing the vocabulary.
    *
    * The growth curve is sampled at `points` id-value checkpoints between
    * min and max of the NUMERIC `idCol` (a doc's tokens enter the curve
    * at its id — any stable corpus order works, and the fixture ids are
    * load order). V at a checkpoint counts terms whose FIRST doc id is ≤
    * the cut; N sums tokens of docs ≤ the cut.
    *
    * Engine parity: checkpoints are exact integer arithmetic from the
    * min/max probe; V/N are exact counts; the fit is [[zipfFit]]'s shared
    * 6-decimal-ln OLS.
    *
    * Scale: NO cumulative window anywhere — first-occurrence is a
    * term-scale min-agg, per-doc sizes a partial-agg count, and all
    * `points` cumulative cuts evaluate as conditional sums in ONE pass
    * over each relation (2·points aggregates, one output row); the only
    * driver actions are the 1-row min/max probe. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               points: Int = 64): DataFrame = {
    require(points >= 2, s"points must be at least 2, got $points")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val emptySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_types",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("total_tokens",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_points_used",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("beta",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ln_k",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("r2",
        org.apache.spark.sql.types.DoubleType)))
    val bounds = docs.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head()
    if (bounds.isNullAt(0))
      // empty corpus: ONE row of zero counts and a NULL fit — the same
      // degenerate-input shape zipfFit (and the SQL oracle's aggregate
      // CTEs) produce, not an empty relation
      return docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          0L, 0L, 0L, null, null, null)), emptySchema)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // checkpoint arithmetic in BigInt: (hi - lo) * k can overflow Long for
    // a wide id range, which would silently push every checkpoint below lo
    // (each final value is <= hi, so the narrowing back is safe)
    val cs: Seq[Long] =
      (1 to points).map(k =>
        (BigInt(lo) + (BigInt(hi) - lo) * k / points).toLong).distinct
    val tok = docs.select(col(idCol).cast("long").as("__id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val firstDoc = tok.groupBy(col("term")).agg(min(col("__id")).as("fd"))
    val newPerDoc = firstDoc.groupBy(col("fd"))
      .agg(count(lit(1)).as("nv"))
    val tokPerDoc = tok.groupBy(col("__id")).agg(count(lit(1)).as("nt"))
    val vRow = newPerDoc.agg(
      sum(col("nv")).as("__tv"),
      cs.zipWithIndex.map { case (c, i) =>
        sum(when(col("fd") <= c, col("nv"))).as(s"__v$i") }: _*)
    val nRow = tokPerDoc.agg(
      sum(col("nt")).as("__tn"),
      cs.zipWithIndex.map { case (c, i) =>
        sum(when(col("__id") <= c, col("nt"))).as(s"__n$i") }: _*)
    val one = vRow.crossJoin(nRow)
    val pts = one
      .select(explode(array(cs.indices.map(i =>
        struct(coalesce(col(s"__v$i"), lit(0L)).as("v"),
          coalesce(col(s"__n$i"), lit(0L)).as("n"))): _*)).as("p"))
      .select(col("p.v").as("v"), col("p.n").as("n"))
      .filter(col("v") > 0 && col("n") > 0)
      .distinct()
      .select(round(log(col("n").cast("double")), 6).cast(dec).as("x"),
        round(log(col("v").cast("double")), 6).cast(dec).as("y"))
    one.select(coalesce(col("__tv"), lit(0L)).as("n_types"),
        coalesce(col("__tn"), lit(0L)).as("total_tokens"))
      .crossJoin(logLogOlsRow(pts))
      .select(col("n_types"), col("total_tokens"),
        col("rr").as("n_points_used"),
        col("slope").as("beta"), col("intercept").as("ln_k"), col("r2"))
  }

  /** Per-BENCHMARK contamination report — [[contaminationScores]] against
    * a whole benchmark SUITE at once: `benchmarks` carries (benchCol,
    * textCol) rows for several eval sets, and the result is the sparse
    * (doc, benchmark) matrix of shingle overlaps (only contaminated
    * pairs, n_hits ≥ 1, appear — at 100 TB the matrix of zeros is the
    * thing you must never materialize). The per-release audit question
    * "which benchmark leaked into which documents, and how badly" as one
    * relation; feed any row past a threshold to [[dropContaminated]] /
    * span scrubbing per benchmark.
    *
    * Scale: each benchmark's distinct shingle-hash set broadcasts (eval
    * suites are small by construction); the corpus is shingled ONCE and
    * the hash join + (id, benchmark) aggregation carry 8-byte hashes and
    * names, never text. Duplicate (id, text) deliveries collapse via one
    * distinct pass; differing versions of an id are each scored and the
    * worst one is reported — still no text on the post-shingle
    * exchanges. */
  def contaminationMatrix(docs: DataFrame, benchmarks: DataFrame,
                          idCol: String, textCol: String, benchCol: String,
                          shingleN: Int = 3,
                          minOverlap: Double = 0.0): DataFrame = {
    require(minOverlap >= 0.0 && minOverlap <= 1.0,
      s"minOverlap $minOverlap outside [0,1]")
    val benchShingles = benchmarks
      .select(col(benchCol).as("benchmark"),
        DedupFunctions.shingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("benchmark"), explode(col("hs")).as("h")).distinct()
    // a re-delivered doc may arrive as SEVERAL text versions under one id
    // (multi-session folds): every DISTINCT (id, text) version is scored —
    // collapsing to one representative would let a contaminated version
    // hide behind a clean one, the exact leak the gate exists to block —
    // and per (id, benchmark) the WORST version's row wins (max overlap,
    // ties to the larger shingle set), so overlap stays a true fraction
    // of one version
    val docsOne = docs.select(col(idCol), col(textCol)).distinct()
    val docH = docsOne
      .select(col(idCol), md5(col(textCol)).as("__v"),
        DedupFunctions.shingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col(idCol), col("__v"),
        size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
    docH
      .join(broadcast(benchShingles), Seq("h"))
      .groupBy(col(idCol), col("__v"), col("benchmark"))
      .agg(first(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_hits"))
      .withColumn("overlap",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
      .groupBy(col(idCol), col("benchmark"))
      .agg(max(struct(col("overlap"), col("n_shingles"), col("n_hits")))
        .as("__w"))
      .filter(col("__w.overlap") >= minOverlap)
      .select(col(idCol), col("benchmark"),
        col("__w.n_shingles").as("n_shingles"),
        col("__w.n_hits").as("n_hits"), col("__w.overlap").as("overlap"))
  }

  /** Corpus-relative n-gram COMMONNESS — per-doc templatedness against the
    * whole corpus: mean ln(document frequency) of the doc's distinct
    * shingles plus the fraction whose DF reaches `commonDf`. The
    * cross-document complement of [[repetitionStats]] (intra-doc) and
    * [[DedupFunctions.repeatedSpanStats]] (verbatim spans): boilerplate
    * mills and template floods score high here while every individual doc
    * still looks "clean" — the RefinedWeb-style duplication-aware quality
    * signal. Docs with no shingles (empty after tokenization) are absent
    * from the output.
    *
    * Engine parity: DF values are exact integers; each ln(df) rounds to 4
    * decimals (the LM convention) into an exact DECIMAL sum; the two
    * ratios are single IEEE quotients.
    *
    * Scale: one corpus shingling feeds both sides — a hash-keyed DF count
    * and a (id, hash) re-join; exchanges carry 8-byte hashes and ids,
    * never text. DF relation is shingle-vocabulary scale. */
  def ngramCommonness(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, commonDf: Long = 10): DataFrame = {
    require(commonDf >= 1, s"commonDf must be >= 1, got $commonDf")
    val sh = docs
      .filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol),
        explode(DedupFunctions.shingleHashes(col(textCol), shingleN))
          .as("h"))
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(round(log(col("df").cast("double")), 4)
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("__sld"),
        sum(when(col("df") >= commonDf, 1L).otherwise(0L)).as("n_common"))
      .select(col(idCol), col("n_ngrams"),
        (col("__sld").cast("double") / col("n_ngrams").cast("double"))
          .as("mean_log_df"),
        col("n_common"),
        (col("n_common").cast("double") / col("n_ngrams").cast("double"))
          .as("common_frac"))
  }

  /** SOURCE-OVERLAP matrix — pairwise shingle-set Jaccard between GROUPS
    * (sources / dumps / languages): the provenance audit "which sources
    * duplicate each other" run before paying for cross-source dedup, and
    * the evidence behind dropping a mirrored dump wholesale. Only pairs
    * with at least one shared shingle appear (group_a < group_b
    * lexicographically); NULL groups are dropped.
    *
    * Scale: the corpus is shingled ONCE into a distinct (group, hash)
    * relation (group-vocabulary scale); the pair relation is built
    * hash-keyed — each hash emits C(groups-containing-it, 2) rows, and
    * group cardinality is human-scale — never by joining corpora.
    * Exchanges carry (group, 8-byte hash). */
  def sourceOverlapMatrix(docs: DataFrame, groupCol: String,
                          textCol: String, shingleN: Int = 3): DataFrame = {
    val gs = docs
      .filter(col(groupCol).isNotNull &&
        size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col(groupCol).as("__g"),
        explode(DedupFunctions.shingleHashes(col(textCol), shingleN))
          .as("h"))
      .distinct()
    val sizes = gs.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val a = gs.select(col("__g").as("group_a"), col("h"))
    val b = gs.select(col("__g").as("group_b"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("__g").as("group_a"), col("__n").as("n_a")),
        Seq("group_a"))
      .join(sizes.select(col("__g").as("group_b"), col("__n").as("n_b")),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }

  /** Split every document into fixed-size token windows with a stride —
    * the context-packing step that turns variable-length documents into
    * training-window-sized chunks. `stride < chunkTokens` overlaps
    * consecutive chunks; the LAST chunk may be shorter. Emits
    * (id, chunk_id, chunk, n_tokens); chunk_id counts from 0 in document
    * order.
    *
    * Starts past `len - chunkTokens` (beyond the first) are dropped: their
    * windows are strict SUFFIXES of the previous chunk — zero novel tokens,
    * pure duplicated training text (exactly what the dedup stages elsewhere
    * remove). A start survives iff it is 0 or begins before the previous
    * chunk's coverage ends, so the tail is covered exactly once.
    *
    * Scale: a narrow per-row transform + generator — no shuffle, no UDF;
    * the token array is built once per row and sliced lazily inside
    * codegen. Output size is input × (1/stride) tokens, the expected
    * amplification of overlap packing.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be > 0")
    val len = size(col("toks"))
    val starts = filter(
      sequence(lit(0), len - 1, lit(stride)),
      s => s === 0 || s < len - chunkTokens + stride)
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(transform(starts,
          s => slice(col("toks"), s + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "chunk_toks")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", col("chunk_toks")).as("chunk"),
        size(col("chunk_toks")).cast("long").as("n_tokens"))
  }

  /** Corpus mixture statistics: documents, tokens, and token SHARE per
    * (group, subgroup) — the table a mixing-weight decision reads. The
    * share denominator is the whole corpus (a 1-row broadcast-ish window
    * over the already-aggregated groups, not over rows).
    */
  def mixtureStats(docs: DataFrame, textCol: String,
                   groupCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy() // whole (tiny, post-agg) relation
      .rowsBetween(Long.MinValue, Long.MaxValue)
    docs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.wordCount(col(textCol))).as("n_tokens"))
      .withColumn("token_share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
  }

  /** Corpus-wide n-gram DOCUMENT frequency, top-k: shingles are distinct
    * within each document, so the count is "how many documents contain this
    * n-gram" — the boilerplate/template detector (headers, cookie banners,
    * license blurbs float to the top). Deterministic order: df desc, then
    * ngram.
    *
    * Scale: partial aggregation combines per-task before the shuffle, and
    * the final top-k is a TakeOrdered, never a global sort. The exchange
    * carries one row per distinct n-gram per task — irreducible for exact
    * counts; switch to a count-min sketch when approximate DF suffices.
    */
  def topNgramsByDocFreq(docs: DataFrame, textCol: String,
                         shingleN: Int, k: Int): DataFrame =
    docs
      .select(TextFunctions.tokens(col(textCol)).as("toks"))
      // >= n, not > 0: shinglesFromTokens falls back to one whole-doc
      // pseudo-shingle for shorter docs (right for Jaccard between short
      // docs, wrong here — a repeated 2-token title would pollute the
      // "top 3-grams" list with a non-3-gram)
      .filter(size(col("toks")) >= shingleN)
      .select(explode(DedupFunctions.shinglesFromTokens(col("toks"), shingleN))
        .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(k)

  /** Quality filtering: keep the `k` highest-[[TextFunctions.qualityScore]]
    * documents per group (beam the best of each source/domain), ties broken
    * deterministically by id. Returns the winners with their `quality` and
    * 1-based per-group `rn`.
    *
    * Scale: one shuffle on the group columns; the rank filter is a
    * WindowGroupLimit in Spark ≥3.5 (each map task pre-prunes to its local
    * top-k before the exchange), so the shuffle carries ~k rows per
    * (group, task) — not the corpus.
    */
  def topKByQuality(docs: DataFrame, idCol: String, textCol: String,
                    groupCols: Seq[String], k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("quality").desc, col(idCol))
    docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Per-source/domain document CAP (the C4/RefinedWeb-style per-domain
    * limit): keep at most `cap` docs per group, selected DETERMINISTICALLY
    * at random (md5 of the id, then id) rather than by quality — a cap
    * preserves the within-source distribution where [[topKByQuality]]
    * creams the top. Returns survivors with their 1-based per-group `rn`.
    *
    * Scale: same WindowGroupLimit shape as [[topKByQuality]] — map tasks
    * pre-prune to their local cap before the one group-column exchange, so
    * a 10-billion-doc domain ships ~cap rows per task, not the domain. */
  def capPerGroup(docs: DataFrame, idCol: String,
                  groupCols: Seq[String], cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
  }

  /** Gopher-style repetition statistics per document — the "repetitious
    * text" quality gates (duplicate-line fraction, duplicate-line CHARACTER
    * fraction, most-frequent-word fraction). Returns
    * (id, n_lines, dup_line_frac, dup_char_frac, top_word_frac); documents
    * with no non-empty line or no word token are dropped (nothing to score).
    *
    * Scale: lines are grouped by (id, md5(line)) so the exchange carries a
    * fixed-width 32-char key + length, never the line text; words group on
    * (id, token). Both aggregations partial-combine map-side, and the final
    * per-doc join is between two already-per-doc (narrow) relations on the
    * same key. No self-join, no window over raw rows.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol), explode(filter(split(col(textCol), "\n"),
        l => length(l) > 0)).as("line"))
    val lineStats = lines
      .groupBy(col(idCol), md5(col("line").cast("binary")).as("lh"))
      .agg(count(lit(1)).as("n"), min(length(col("line"))).as("len"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * col("len")).as("n_chars"),
        sum(when(col("n") > 1, col("n") * col("len")).otherwise(0L)).as("dup_chars"))
      .select(col(idCol), col("n_lines"),
        ((col("n_lines") - col("n_distinct")).cast("double") /
          col("n_lines").cast("double")).as("dup_line_frac"),
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("dup_chars").cast("double") /
            col("n_chars").cast("double")).as("dup_char_frac"))
    val wordStats = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg((max(col("n")).cast("double") /
        sum(col("n")).cast("double")).as("top_word_frac"))
    lineStats.join(wordStats, Seq(idCol))
  }

  /** Per-document top-`k` terms by TF-IDF (tf·ln(N/df)) — the keyword /
    * topic-signature extractor. `nDocs` is the corpus size used for the IDF
    * numerator; pass it in when known (e.g. from footer counts) to keep the
    * operator one lazy plan, else it is computed with one `count()`.
    * Returns (id, term, tf, df, tfidf, rn) with rn 1-based per document.
    *
    * Ranking orders on round(tfidf, 6) with the term string as tie-break, so
    * the result is reproducible across engines whose `ln` differs in the
    * last ulp.
    *
    * Scale: groupBy (id, term) partial-combines map-side; the document
    * frequency is a window COUNT over the already-aggregated (id, term)
    * rows — one row per distinct term-in-doc, never the raw token stream;
    * and the final per-doc rank is a WindowGroupLimit (each task pre-prunes
    * to its local top-k before the exchange).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, nDocs: Option[Long] = None): DataFrame = {
    val n = nDocs.getOrElse(docs.count())
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(round(col("tfidf"), 6).desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("tfidf",
        col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double")))
      .withColumn("rn", row_number().over(byDoc).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Vocabulary statistics per group: token count, distinct-term count,
    * type-token ratio, and the hapax share (terms occurring exactly once —
    * the Zipf-tail gauge; OCR noise and boilerplate shift it in opposite
    * directions). Returns (groups..., n_tokens, n_terms, type_token_ratio,
    * hapax_share).
    *
    * Scale: two stacked partial aggregations — (group, term) counts combine
    * map-side, then the per-group rollup is group-cardinality-sized; raw
    * token streams never cross an exchange twice. */
  def vocabularyStats(docs: DataFrame, textCol: String,
                      groupCols: Seq[String]): DataFrame =
    docs
      .select(groupCols.map(col) :+
        explode(TextFunctions.tokens(col(textCol))).as("term"): _*)
      .groupBy((groupCols :+ "term").map(col): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(groupCols.map(col) ++ Seq(
        col("n_tokens"), col("n_terms"),
        (col("n_terms").cast("double") / col("n_tokens")).as("type_token_ratio"),
        (col("hapax").cast("double") / col("n_terms")).as("hapax_share")): _*)

  /** CCNet-style fluency score: per-document MEAN UNIGRAM LOG-PROBABILITY
    * under the corpus's own unigram language model — the perplexity-filter
    * analog that needs no external LM (gibberish and boilerplate-stuffed
    * documents score far from the corpus mode and can be percentile-gated).
    * Returns (id, n_tokens, avg_logprob).
    *
    * Cross-engine exactness: each term's log-prob is rounded to 4 decimals
    * and summed as DECIMAL (order-independent). The coarse per-term rounding
    * is what makes the aggregate engine-portable: an `ln` that differs in
    * the last ulp flips a 4-decimal boundary with probability ~1e-11 per
    * term (at 9 decimals it flips ~1e-6 — measured as real hash mismatches),
    * and once the per-term decimals agree the sum and mean are exact.
    *
    * Scale: the LM is a second partial aggregation over the already
    * per-doc-distinct (term, tf) rows (vocabulary-sized output); the score
    * join shuffles (id, term, tf) against the vocabulary — never raw text.
    */
  /** Bigram-LM fluency (corpus-own, add-1 smoothed): per doc the exact
    * decimal sum and plain-float mean of log P(w2|w1) over its adjacent
    * token pairs, with P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V) — head counts
    * c(w1·) are the pair counts summed per head (so the last token of a
    * doc never skews the denominator) and V is the corpus vocabulary.
    * The same per-term round-to-4-decimals trick as
    * [[unigramLogProbScores]] absorbs cross-engine log() ulp differences;
    * the decimal SUM is then bit-identical.
    *
    * Scale: pair counts partial-aggregate map-side; the LM relation is
    * bigram-vocabulary-sized; docs join it by pair key — same shape as the
    * unigram path, one extra key column. */
  /** Per-doc bigram counts (idCol, w1, w2, pf), hash-partitioned by
    * (w1, w2) — the shared pair extraction behind [[bigramLogProbScores]]
    * / [[knLogProbScores]].
    *
    * ONE (w1, w2)-keyed exchange serves the whole scorer (round 15, guide
    * §2.4): the former shape exchanged the instances by hash(id, w1, w2)
    * for this aggregation (403 MB at the 100× bench point, near-zero
    * map-side reduction since bigrams rarely repeat within one doc) and
    * then RE-SHUFFLED the counted relation by (w1, w2) for the LM join
    * (another 511 MB). Hash(w1, w2) established BELOW the aggregation
    * clusters the (id, w1, w2) group keys too, and every downstream
    * consumer — the bigram-vocabulary rollup, the pair-total scalar, the
    * scoring join's probe side — reads THIS relation, whose lineage roots
    * in one canonically-identical exchange (reused, not re-executed; the
    * id column stays in the exchange so column pruning cannot split it
    * into per-consumer variants). Only the vocabulary-scale LM moves
    * again. Hot-bigram placement is unchanged from the former join's
    * (w1, w2) hashing. */
  private def bigramInstanceRows(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))

  private def bigramPairCounts(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    bigramInstanceRows(docs, idCol, textCol)
      .repartition(col("w1"), col("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("pf"))

  def bigramLogProbScores(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val pf = bigramPairCounts(docs, idCol, textCol)
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    // exchange-free: hash(w1, w2) already clusters the group keys
    val c12 = pf.groupBy(col("w1"), col("w2")).agg(sum(col("pf")).as("c12"))
    val lm = c12
      .withColumn("c1", sum(col("c12")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(log((col("c12") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4)).as("lp"))
    // probe side already (w1, w2)-clustered; only the vocab-scale LM moves
    pf.join(lm, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("pf")).as("n_bigrams"), sum(col("pf") * col("lp")).as("slp"))
      .select(col(idCol), col("n_bigrams"),
        col("slp").cast("double").as("sum_logprob"),
        (col("slp").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_logprob"))
  }

  /** Corpus-own bigram LM scoring under KNESER-NEY smoothing — the
    * standard n-gram smoother (Kneser & Ney 1995; Chen & Goodman 1999)
    * behind KenLM-style quality filters, where [[bigramLogProbScores]]'s
    * add-1 is the classroom baseline. Absolute discount D = 0.75 (exactly
    * representable in binary, so the arithmetic replays bit-for-bit):
    *
    *   P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/N1+(··)
    *
    * with N1+(w1·) the distinct continuations of w1, N1+(·w2) the distinct
    * histories of w2 (the "how many contexts has this word completed"
    * continuation count that makes KN famous), and N1+(··) the distinct
    * pair count. Scoring is corpus-own, so every scored pair is seen
    * (c12 ≥ 1) and the discounted term stays positive. Per-pair log-probs
    * round to 4 decimals and sum as DECIMAL — the [[unigramLogProbScores]]
    * cross-engine exactness technique.
    *
    * Scale: all LM relations (pair counts + windowed distinct-neighbor
    * counts) are bigram-vocabulary-scale, partitioned by w1 / w2 — never a
    * global window over data rows; the pair-total is a 1-row broadcast.
    * Exchanges carry (id, w1, w2, tf), never text. */
  def knLogProbScores(docs: DataFrame, idCol: String,
                      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount $discount not in (0,1)")
    val pf = bigramPairCounts(docs, idCol, textCol)
    // The LM side reads c12 THREE ways (the head/continuation windows and
    // the 1-row pair-total broadcast) — left lazy, each consumer
    // re-tokenized the corpus and re-exchanged the bigram counts (the
    // optimizer collapses sum-of-per-doc-counts to a direct count, so the
    // subtrees canonicalize differently from the probe's and nothing is
    // reused; measured at the 100× bench point as a third full
    // tokenize + 280 MB exchange per run). The relation is
    // bigram-vocabulary-scale — materialize it once. The PROBE side stays
    // lazy on purpose: its (w1, w2) hash partitioning survives into the
    // scoring join (a scratch scan would forget it and re-exchange the
    // full counted relation, the 511 MB shuffle this rewrite removes).
    // built from the instance rows directly (count per bigram ≡ sum of
    // per-doc counts), so the id column prunes out of its exchange and the
    // aggregation combines map-side
    val c12 = graft.util.Scratch.materialize(
      bigramInstanceRows(docs, idCol, textCol)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")),
      "kn_c12")
    val wHead = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wCont = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val n1tot = c12.agg(count(lit(1)).as("n1tot")) // distinct pairs, 1 row
    val d = lit(discount)
    val lm = c12
      .withColumn("c1", sum(col("c12")).over(wHead))
      .withColumn("n1h", count(lit(1)).over(wHead))
      .withColumn("n1c", count(lit(1)).over(wCont))
      .crossJoin(broadcast(n1tot))
      // parenthesization is the cross-engine contract: term1 + term2·pcont,
      // each an IEEE op over exact-integer-valued doubles — mirrored
      // verbatim in the DuckDB oracle
      .select(col("w1"), col("w2"),
        round(log(
          ((col("c12").cast("double") - d) / col("c1").cast("double")) +
            ((d * col("n1h").cast("double")) / col("c1").cast("double")) *
              (col("n1c").cast("double") / col("n1tot").cast("double"))), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4)).as("lp"))
    // probe side already (w1, w2)-clustered; only the vocab-scale LM moves
    pf.join(lm, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("pf")).as("n_bigrams"), sum(col("pf") * col("lp")).as("slp"))
      .select(col(idCol), col("n_bigrams"),
        col("slp").cast("double").as("sum_logprob"),
        (col("slp").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_logprob"))
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): pick the `k` corpus documents
    * whose hashed n-gram feature distribution looks most like a small
    * TARGET corpus. Features are md5-bucketed unigrams AND bigrams
    * (16^nibbles buckets — the paper's hashed-n-gram generative model);
    * each document's importance weight is its log-likelihood ratio
    *
    *   w(doc) = Σ_b c_b(doc) · [ln p̂_target(b) − ln p̂_corpus(b)]
    *
    * under add-1-smoothed bucket distributions. Selection is the
    * deterministic top-k by (weight DESC, id ASC) — the ranking the
    * paper's Gumbel resampling is a noisy version of — so the result
    * carries a full cross-engine oracle: counts are exact integers, the
    * per-bucket log-ratio rounds to 6 decimals as DECIMAL, and the doc
    * weight is an exact decimal dot product of (count × ratio).
    *
    * Scale: the corpus is tokenized and hashed ONCE — its bucket
    * distribution derives from the same persisted per-doc (id, bucket,
    * count) relation the weights aggregate (narrow: no text). Both
    * distributions collapse to ≤16^nibbles rows, collected and rejoined
    * as a broadcast literal; the top-k is a TakeOrdered, not a global
    * sort. The target corpus can be tiny (it usually is: a benchmark or
    * a trusted seed set). The operator is EAGER — it returns the
    * materialized k-row selection so the cached feature relation can be
    * released before returning (the trainLinearProbe convention).
    *
    * Docs with zero tokens have no features and are never selected. */
  def dsirSelect(corpus: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, nibbles: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nibbles >= 1 && nibbles <= 4, s"nibbles $nibbles outside [1,4]")
    val spark = corpus.sparkSession
    val buckets = math.pow(16, nibbles).toLong
    // ONE id-keyed exchange serves every aggregation over cfb (round 14):
    // hash(id) partitioning satisfies the (id, __b) grouping AND the
    // per-doc weight grouping downstream, so the former second full
    // exchange of the persisted feature relation (measured 184 MB at the
    // 100× bench point — the groupBy(id) re-shuffle of hash(id,__b)-
    // partitioned cache) disappears. Explicit partition count keeps AQE
    // from coalescing the feature stream; rows are (id, bucket) longs.
    val cfb = dsirFeatures(corpus, Seq(col(idCol)), textCol, nibbles)
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__cf"))
      .persist()
    try {
      val top = dsirTopPlan(cfb,
        dsirFeatures(target, Nil, textCol, nibbles), idCol, k, buckets)
      val out = top.collect() // ≤ k rows — frees cfb before returning
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1), top.schema)
    } finally cfb.unpersist()
  }

  /** The hashed unigram+bigram (…, __b) feature stream behind
    * [[dsirSelect]] — one row per feature occurrence, bucketed by the
    * first `nibbles` md5 hex digits. Computed by the single-scan
    * [[graft.functions.DsirBuckets]] expression: the former plan UNIONED
    * two explodes (tokenizing every document twice) and paid a 32-char
    * md5 hex string + a base-16 `conv` parse per feature — the dominant
    * cpu of the 100× bench point. Values are bit-identical (same md5
    * bytes, hex round-trip skipped); the DuckDB oracle keeps replaying
    * the explode+conv SQL. */
  private[graft] def dsirFeatures(d: DataFrame, keep: Seq[Column],
                                  textCol: String, nibbles: Int): DataFrame =
    d.select(keep :+ graft.functions.exprs.dsir_buckets(
        TextFunctions.tokens(col(textCol)), nibbles).as("__bs"): _*)
      .select(keep :+ explode(col("__bs")).as("__b"): _*)

  /** The lazy selection plan behind [[dsirSelect]], split out so PlanSpec
    * can pin its scale shape (broadcast ratio, TakeOrdered top-k, no text
    * on exchanges): `cfb` is the per-doc (id, __b, __cf) feature relation,
    * `targetFeatures` the target's (__b) stream. The two distribution
    * collects are bucket-cardinality (≤16^nibbles rows); the log-ratio is
    * computed with Spark expressions over the collected exact integers, so
    * the values — and the DuckDB oracle — are unchanged by the split. */
  private[graft] def dsirTopPlan(cfb: DataFrame, targetFeatures: DataFrame,
                                 idCol: String, k: Int,
                                 buckets: Long): DataFrame = {
    val spark = cfb.sparkSession
    val rcMap = cfb.groupBy(col("__b")).agg(sum(col("__cf")).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tcMap = targetFeatures
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tTot = tcMap.values.sum
    val rTot = rcMap.values.sum
    import spark.implicits._
    val ratio = (rcMap.keySet ++ tcMap.keySet).toSeq.sorted
      .map(b => (b, tcMap.getOrElse(b, 0L), rcMap.getOrElse(b, 0L)))
      .toDF("__b", "__tc", "__rc")
      .select(col("__b"),
        round(log((col("__tc") + 1).cast("double") /
            lit(tTot + buckets).cast("double")) -
          log((col("__rc") + 1).cast("double") /
            lit(rTot + buckets).cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__lr"))
    cfb
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cf")).as("n_features"),
        sum(col("__cf") * col("__lr")).as("__w"))
      .orderBy(col("__w").desc, col(idCol).asc)
      .limit(k) // TakeOrdered — k rows, never a full sort exchange
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__w").desc, col(idCol).asc))) // over k rows only
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("n_features"), col("__w").cast("double").as("weight"))
  }

  /** Score `docs` under a bigram LM trained on a SEPARATE `reference`
    * corpus — the actual CCNet shape (Wenzek 2020 scores web text under a
    * Wikipedia-trained LM; [[bigramLogProbScores]] is the corpus-own
    * special case). Add-1 smoothing with the standard unseen backstops:
    * pair unseen under a seen head → P = 1/(c(w1·)+V); head unseen
    * entirely → P = 1/V. Per-pair log-probs are 4-decimal-rounded decimals
    * and the doc sum is a decimal sum, so scores replay bit-for-bit
    * cross-engine.
    *
    * Scale: the LM relations (pair counts, head counts, vocab scalar) are
    * vocabulary-scale and build in two partial-aggregated passes over the
    * reference; target docs join them by pair/head key — exchanges carry
    * (id, w1, w2, tf), never text. Nothing is corpus × corpus. */
  def bigramLogProbScoresAgainst(reference: DataFrame, docs: DataFrame,
                                 idCol: String,
                                 textCol: String): DataFrame = {
    def pairsOf(d: DataFrame, cols: Column*): DataFrame = d
      .select(cols :+ TextFunctions.tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= 2)
      .select(cols :+ explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("p"): _*)
      .select(cols :+ col("p.w1") :+ col("p.w2"): _*)

    val rpairs = pairsOf(reference)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
    val heads = rpairs.groupBy(col("w1")).agg(sum(col("__c12")).as("__c1"))
    val vocab = reference
      .select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("__v"))

    val pf = pairsOf(docs, col(idCol))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("pf"))

    val lpCol = round(log(
      (coalesce(col("__c12"), lit(0L)) + 1).cast("double") /
        (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double")), 4)
      .cast(org.apache.spark.sql.types.DecimalType(28, 4))

    pf.join(rpairs, Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", lpCol)
      .groupBy(col(idCol))
      .agg(sum(col("pf")).as("n_bigrams"),
        sum(col("pf") * col("__lp")).as("__slp"))
      .select(col(idCol), col("n_bigrams"),
        col("__slp").cast("double").as("sum_logprob"),
        (col("__slp").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_logprob"))
  }

  /** CCNet-style per-LANGUAGE fluency banding: rank each document by its
    * corpus-own bigram-LM mean log-probability WITHIN its language and cut
    * head/middle/tail at `headFrac` / `headFrac+midFrac` of the
    * percent-rank — the lang-stratified perplexity filter (Wenzek 2020)
    * that a global percentile gate gets wrong (a clean low-resource-
    * language doc scores below the English mode simply because its LM is
    * sparser). Docs with < 2 tokens have no bigram score and are dropped,
    * like every LM-gated pipeline does.
    *
    * Cross-engine exactness: per-pair log-probs are 4-decimal-rounded
    * decimals ([[bigramLogProbScores]]), the mean is an IEEE quotient of
    * exact operands, and percent_rank over the tie-free total order
    * (avg DESC, id ASC) is one integer division — every band boundary
    * replays bit-for-bit.
    *
    * Scale: the heavy work is the LM scoring (vocabulary-scale relations,
    * exchanges carry (id, pair, tf) — never text); the banding window
    * shuffles only (id, lang, score) rows partitioned by language. A
    * heavily-skewed language mix makes one window partition large — at
    * that point pre-aggregate per-lang score histograms and cut on them
    * (the [[graft.functions.LearnFunctions.prSweep]] trick) instead of
    * ranking rows. */
  def perplexityBands(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, headFrac: Double = 0.3,
                      midFrac: Double = 0.3): DataFrame = {
    require(headFrac > 0 && midFrac >= 0 && headFrac + midFrac < 1,
      s"band fractions ($headFrac, $midFrac) must cut strictly inside (0,1)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("avg_logprob").desc, col(idCol).asc)
    docs.select(col(idCol), col(langCol))
      .join(bigramLogProbScores(docs, idCol, textCol)
        .select(col(idCol), col("n_bigrams"), col("avg_logprob")), Seq(idCol))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("band",
        when(col("pr") < headFrac, "head")
          .when(col("pr") < headFrac + midFrac, "middle")
          .otherwise("tail"))
  }

  /** Deterministic EPOCH-SEEDED shard layout for training-data serving:
    * every document gets a (shard, pos) address for the epoch, so any
    * worker can recompute ITS shard's exact read order with no coordination
    * and a re-run of the epoch is bit-identical — the "global shuffle per
    * epoch" training loops need, as a pure function of (epoch, id).
    *
    * shard = the first `nibbles` hex digits of md5(epoch:id) (16^nibbles
    * shards, multinomially balanced); pos = rank of the md5 key within the
    * shard. Changing `epoch` re-deals both, re-running the same epoch
    * changes nothing.
    *
    * Scale: NO global order anywhere — the only exchange partitions by
    * shard (pick `nibbles` so 16^nibbles ≳ cluster parallelism) and
    * carries (id, 32-byte key); the per-shard rank is a windowed sort of
    * one shard's keys. Contrast with a row_number-over-everything layout,
    * whose single-partition window is exactly the bottleneck this shape
    * avoids. */
  def epochShards(docs: DataFrame, idCol: String, epoch: Int,
                  nibbles: Int = 1): DataFrame = {
    require(nibbles >= 1 && nibbles <= 4, s"nibbles $nibbles out of [1,4]")
    val k = md5(concat_ws(":", lit(epoch.toString), col(idCol).cast("string")))
    val shard = (1 to nibbles).map(i =>
        (expr(s"instr('0123456789abcdef', substring(__k, $i, 1))") - 1) *
          lit(math.pow(16, nibbles - i).toLong))
      .reduce(_ + _).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    docs.select(col(idCol), k.as("__k"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** CURRICULUM shard layout: contiguous difficulty bands for ordered
    * training (Bengio 2009; score-ordered data feeds in GPT-style
    * "pretraining curricula"). Documents are totally ordered by
    * (scoreCol, id) — ascending = easiest-first under a difficulty score,
    * descending for fluency-style scores where HIGH means easy — and the
    * ordered sequence is cut into `shards` near-equal contiguous blocks:
    * shard s is the s-th difficulty band, `pos` the 1-based in-band rank,
    * so a trainer consuming shard 0 → S-1 reads the exact global order.
    *
    * The score must be cross-engine exact for the layout to replay (the
    * repo's LM scores — decimal sums and their IEEE quotients — qualify;
    * an unrounded float from a different engine does not).
    *
    * Scale: one range exchange for the total order plus one zipWithIndex
    * pass for EXACT global ranks (the [[graft.operators.Relational]]
    * fuzzy-pair indexing technique) — never a single-partition
    * row_number window. The count action is index-build class, same as
    * zorder's quantile probe. Shard/pos then derive per-row from (rank,
    * n) in pure integer arithmetic: shard = ⌊rank·S/n⌋, pos = rank −
    * ⌈shard·n/S⌉ + 1. */
  def curriculumShards(docs: DataFrame, idCol: String, scoreCol: String,
                       shards: Int, ascending: Boolean = true): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    val ord =
      if (ascending) Seq(col(scoreCol).asc, col(idCol).asc)
      else Seq(col(scoreCol).desc, col(idCol).asc)
    // materialize the (id, score) projection ONCE (round 14): this
    // operator runs its input three times — the null/size probe, the
    // zipWithIndex rank pass, and the caller's action — and the input is
    // typically a full scoring pipeline (the curriculum query's unigram
    // LM join re-executed per pass, ~1 s each at the 10× bench point).
    // The projection is doc-scale (two columns), far cheaper to write
    // than to recompute.
    val slimSrc = graft.util.Scratch.materialize(
      docs.select(col(idCol), col(scoreCol)), "curriculum_scores")
    val slim = slimSrc.sort(ord: _*)
    // one action probes size AND null scores: count(col) skips nulls. A
    // null score has no place in a difficulty order (Spark sorts nulls
    // first ascending, other engines last — the layout would be silently
    // engine-dependent AND feed unscored docs as "easiest") — refuse.
    val probe = slimSrc.agg(count(lit(1)), count(col(scoreCol))).head()
    val n = probe.getLong(0)
    require(probe.getLong(1) == n,
      s"curriculumShards: ${n - probe.getLong(1)} rows have a null " +
        s"$scoreCol — score every doc (or filter) before laying out")
    if (n == 0)
      return docs.select(col(idCol),
        lit(0).as("shard"), lit(0L).as("pos")).limit(0)
    val schema = org.apache.spark.sql.types.StructType(
      slim.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__r", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = spark.createDataFrame(
      slim.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
    // `div` (integer division), not `/` (which Spark widens to double)
    indexed
      .withColumn("shard", expr(s"(__r * ${shards}L) div ${n}L").cast("int"))
      .withColumn("pos", // rank − ceil(shard·n/S) + 1, all integer ops
        col("__r") - expr(s"(shard * ${n}L + ${shards - 1}L) div ${shards}L")
          + 1)
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Population-stability-index (PSI) drift between two corpus snapshots
    * over a categorical column — the standing monitoring question of a
    * refreshed training pipeline ("did this sync shift the language /
    * source / quality-band mix?"). Per category (union of both sides,
    * add-1 smoothed so one-sided categories stay finite):
    * psi_c = (p_a − p_b)·ln(p_a/p_b), with the usual reading: Σ < 0.1
    * stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Cross-engine exactness: shares are IEEE quotients of exact integer
    * counts; the ln is 6-decimal-rounded (the LM convention) and the
    * contribution 9-decimal DECIMAL — so the per-category rows and any
    * sum over them replay bit-for-bit.
    *
    * Scale: two partial-aggregated count passes + a category-cardinality
    * full-outer join; the totals row broadcasts. Nothing row-scale ever
    * shuffles. */
  def distributionDrift(a: DataFrame, b: DataFrame,
                        catCol: String): DataFrame =
    distributionDriftFromCounts(
      a.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_a")),
      b.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_b")))

  /** [[distributionDrift]] over PRE-AGGREGATED counts `(category, n_a)` /
    * `(category, n_b)` — what an incremental pipeline has at hand (the
    * persisted mix state vs the increment's counts) without touching row
    * data at all. */
  def distributionDriftFromCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    // null-safe equality on the category key: an equi-join never matches
    // NULL categories, so a NULL category present on BOTH sides (unlabeled
    // rows in identical proportion) would split into two one-sided phantom
    // rows whose add-1 smoothing reports PSI > 0 on zero actual drift —
    // and the gate fold could then block a sync for nothing
    val cbR = cb.withColumnRenamed("category", "__cat_b")
    val joined = ca.join(cbR, col("category") <=> col("__cat_b"),
        "full_outer")
      .select(coalesce(col("category"), col("__cat_b")).as("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum("n_a").as("ta"), sum("n_b").as("tb"),
      count(lit(1)).as("k"))
    joined.crossJoin(broadcast(tot))
      .withColumn("pa",
        (col("n_a") + 1).cast("double") / (col("ta") + col("k")).cast("double"))
      .withColumn("pb",
        (col("n_b") + 1).cast("double") / (col("tb") + col("k")).cast("double"))
      // quantize through DECIMAL(18,9) (kills any -0.0 and pins the value
      // set), then surface as DOUBLE: a decimal ZERO stringifies as "0E-9"
      // while DuckDB's hands the driver "0.0" — same value, different hash
      // (the round-7 q_corpus_drift red row). The decimal→double conversion
      // is correctly-rounded in both engines, so the cast is value-exact.
      .withColumn("psi_contrib",
        round((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 6), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double"))
      .select("category", "n_a", "n_b", "pa", "pb", "psi_contrib")
  }

  /** The drift-GATE fold shared by the batch `drift_gate` post-op and
    * [[graft.streaming.StreamingPipeline.streamingDriftGate]]: state is the
    * persisted category-count mix of everything folded so far; the
    * increment's mix is PSI-checked against it BEFORE folding, and a
    * breach throws — under either harness the fold cursor then stays put,
    * so the offending increment is re-gated (never silently folded) on
    * every retry. First fold has no state → no gate (it DEFINES the
    * baseline mix). State is category-cardinality rows; the PSI check is
    * a category-scale join ([[distributionDriftFromCounts]]). */
  def driftGateFold(prev: Option[DataFrame], inc: DataFrame, catCol: String,
                    threshold: Double, what: String): DataFrame = {
    val incCounts = inc.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))
    prev.foreach { state =>
      // sum as DECIMAL, not double: a double sum combines per-partition
      // partials in nondeterministic order, so a PSI within an ulp of the
      // threshold could breach on one run and pass on the retry —
      // violating the re-gate contract. psi_contrib is a 9-decimal value
      // surfaced as double (decimal→double is exact at this magnitude),
      // so the cast back to DECIMAL(18,9) recovers it exactly and the
      // decimal sum is order-independent.
      val psi = distributionDriftFromCounts(
        state.select(col("category"), col("n").as("n_a")),
        incCounts.select(col("category"), col("n").as("n_b")))
        .agg(sum(col("psi_contrib")
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))).head()
      val p = if (psi.isNullAt(0)) BigDecimal(0)
        else BigDecimal(psi.getDecimal(0))
      if (p > threshold) throw new IllegalStateException(
        f"drift_gate $what: PSI ${p.toDouble}%.4f > $threshold — " +
          "increment mix diverges from the corpus baseline")
    }
    prev.fold(incCounts)(p =>
      p.select(col("category"), col("n")).unionByName(incCounts)
        .groupBy("category").agg(sum(col("n")).as("n")))
  }

  def unigramLogProbScores(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    // global total via agg + broadcast, NOT an unpartitioned window: the
    // window shape funnels the whole vocabulary relation through a single
    // task (the bigramLogProbScores totals already use this form)
    val totalRow = termCounts.agg(sum(col("c")).as("total"))
    val lm = termCounts.crossJoin(broadcast(totalRow))
      .select(col("term"),
        round(log(col("c").cast("double") / col("total").cast("double")), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4)).as("lp"))
    tf.join(lm, Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("tf") * col("lp")).as("slp"))
      // sum_logprob is EXACT (decimal sum → double, bit-identical across
      // engines); avg_logprob is its plain float quotient for ranking and
      // thresholding — deliberately unrounded, since rounding a double
      // quotient at a fixed decimal is not cross-engine stable (a ~1e-16
      // ulp difference flips a .5 boundary; measured at sf0.1)
      .select(col(idCol), col("n_tokens"),
        col("slp").cast("double").as("sum_logprob"),
        (col("slp").cast("double") / col("n_tokens").cast("double"))
          .as("avg_logprob"))
  }

  /** [[contaminationScores]] for benchmark sets too large to broadcast raw:
    * the benchmark's distinct shingle hashes are folded into a Bloom filter
    * (~10 bits/element at the default 1% fpp — 50-100× smaller than the
    * 8-byte hash set), the corpus's shingles are prefiltered against it
    * inside codegen (`BloomFilterMightContain`), and only the survivors
    * (true hits + the fpp sliver) take the exact verification semi-join.
    * The RESULT is exact — identical to [[contaminationScores]], same
    * oracle — only the plan shape changes: no broadcast of the benchmark,
    * and the verify join's shuffle carries the BF-surviving (id, hash)
    * pairs instead of every corpus shingle.
    *
    * Building the filter is one eager benchmark-scale aggregation
    * (`stat.bloomFilter`), so unlike the broadcast form this is not a
    * single lazy plan — the price of bounding driver/executor memory by
    * bits-per-element instead of bytes-per-shingle.
    */
  def contaminationScoresBloom(docs: DataFrame, benchmark: DataFrame,
                               idCol: String, textCol: String,
                               shingleN: Int = 3,
                               fpp: Double = 0.01): DataFrame = {
    def hashed(d: DataFrame) = d
      .select(col(idCol), DedupFunctions.shingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)

    val benchShingles = hashed(benchmark)
      .select(explode(col("hs")).as("h")).distinct()
    val corpus = hashed(docs).select(col(idCol), explode(col("hs")).as("h"))
    val totals = corpus.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))

    val nBench = benchShingles.count()
    val scoredHits =
      if (nBench == 0) totals.select(col(idCol), lit(0L).as("n_hits")).limit(0)
      else {
        val bf = benchShingles.stat.bloomFilter("h", nBench, fpp)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        val mightContain = org.apache.spark.sql.GraftShim.column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            org.apache.spark.sql.catalyst.expressions.Literal(
              bos.toByteArray,
              org.apache.spark.sql.types.BinaryType),
            org.apache.spark.sql.GraftShim.expression(col("h"))))
        corpus
          .filter(mightContain)
          .join(benchShingles, Seq("h"), "left_semi") // exact: kill fpp ghosts
          .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
      }
    totals.join(scoredHits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("overlap", col("n_hits").cast("double") / col("n_shingles"))
  }

  /** Pack documents into fixed token-budget training sequences — the
    * "concatenate docs up to the context window" sharding step of a training
    * run. Documents are laid out in deterministic `orderCol` order (per
    * `groupCols` stream when given); a document belongs to the sequence its
    * FIRST token lands in: `seq_id = (cum_tokens - n_tokens) div budget`.
    * A sequence therefore holds whole documents and may overflow `budget` by
    * at most its last document (the standard concat-then-split-free
    * approximation); a document larger than `budget` advances the stream by
    * several ids (ids are monotone but not necessarily contiguous). Emits
    * the input plus (n_tokens, cum_tokens, seq_id).
    *
    * Scale: identical shape to [[selectWithinTokenBudget]] — one shuffle on
    * the group columns, then a single running-sum window pass; the integer
    * `div` keeps ids exact at any corpus size (no float rounding at 100 TB
    * token counts).
    */
  def packSequences(df: DataFrame, tokenCol: Column, orderCol: String,
                    budget: Long, groupCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Long.MinValue, 0)
    df.withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr(s"(cum_tokens - n_tokens) div ${budget}L"))
  }

  /** Corpus-wide line deduplication (the C4/CCNet boilerplate scrub): every
    * NON-EMPTY line keeps only its first occurrence across the whole corpus
    * (first = smallest (id, position)); empty lines are document structure
    * and always survive. Documents are reassembled in original line order;
    * documents whose every line was removed disappear. Returns
    * (id, text_dedup, n_lines_kept).
    *
    * Scale: the first-occurrence pick is a GROUP-BY min(struct(id,pos)) per
    * line hash — partial-aggregatable, so a boilerplate line repeated 100M
    * times collapses map-side instead of sorting 100M rows in one window
    * partition on one task (the row_number formulation's failure mode).
    * The keeper set joins back by hash; a residual hot hash on the probe
    * side is a streamed SMJ partition that AQE's skew-join splitting
    * handles — unlike a window, which AQE cannot split. Line text rides two
    * exchanges (join, then reassembly groupBy) — irreducible, since the
    * output IS the surviving text. Reassembly buffers one document's lines
    * per group (documents are MB-scale; the corpus never aggregates).
    */
  def dedupLinesGlobal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__lh", md5(col("line").cast("binary")))
    val isEmpty = length(col("line")) === 0
    // keeper per distinct non-empty line: smallest (id, pos) corpus-wide
    val keepers = lines.filter(!isEmpty)
      .groupBy(col("__lh"))
      .agg(min(struct(col(idCol).as("kid"), col("pos").as("kpos"))).as("__k"))
    val keptNonEmpty = lines.filter(!isEmpty)
      .join(keepers, Seq("__lh"))
      .filter(col(idCol) === col("__k.kid") && col("pos") === col("__k.kpos"))
      .select(col(idCol), col("pos"), col("line"))
    val keptEmpty = lines.filter(isEmpty)
      .select(col(idCol), col("pos"), col("line"))
    keptNonEmpty.unionByName(keptEmpty)
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("text_dedup"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** WITHIN-document line dedup — the C4 "repeated lines inside one page"
    * scrub (boilerplate headers/footers, quoted reply chains), complement
    * of the corpus-wide [[dedupLinesGlobal]]: each document keeps the FIRST
    * occurrence of each of its non-empty lines; empty lines pass through
    * (layout, not content). Purely per-document — the only exchange is the
    * (id, line-hash) partial-agg reassembly; no corpus-wide state.
    * Returns (id, text_dedup, n_lines_kept), [[dedupLinesGlobal]]'s shape. */
  def dedupLinesWithinDoc(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val isEmpty = length(col("line")) === 0
    val keptNonEmpty = lines.filter(!isEmpty)
      .groupBy(col(idCol), md5(col("line").cast("binary")).as("__lh"))
      .agg(min(struct(col("pos"), col("line"))).as("__k"))
      .select(col(idCol), col("__k.pos").as("pos"), col("__k.line").as("line"))
    val keptEmpty = lines.filter(isEmpty)
      .select(col(idCol), col("pos"), col("line"))
    keptNonEmpty.unionByName(keptEmpty)
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("text_dedup"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** Quantile quality gate: keep documents at or above the `minPercentile`
    * quality percentile WITHIN their group ("top 30% per language" curation).
    * percent_rank is computed over (quality asc, id asc) — a total order —
    * so membership is deterministic and engine-portable (one exact integer
    * division per row). Returns the input plus (quality, pr).
    *
    * Scale: one shuffle on the group columns; percent_rank is a streaming
    * two-pass frame within each group (no whole-group buffering). Unlike
    * [[topKByQuality]] this keeps a FRACTION per group, so group size skew
    * doesn't change selectivity.
    */
  def keepAboveQualityPercentile(docs: DataFrame, idCol: String, textCol: String,
                                 groupCols: Seq[String],
                                 minPercentile: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("quality"), col(idCol))
    docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= minPercentile)
  }

  /** Exactly-N deterministic sample: the `n` rows with the smallest
    * md5(key) — an unbiased fixed-size carve-out (eval/holdout sets that
    * must be EXACTLY n docs, where [[sampleByGroup]]'s rate form only hits
    * n in expectation). Unlike the rate form, membership shifts as the
    * corpus grows (the n smallest hashes change) — use rates when
    * growth-stability matters more than exact size.
    *
    * Scale: TakeOrdered (per-partition top-n → merge of n-row heaps), never
    * a global sort — asserted in PlanSpec. */
  def sampleExactN(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.withColumn("__h", md5(col(keyCol).cast("string").cast("binary")))
      .orderBy(col("__h"), col(keyCol))
      .limit(n)
      .drop("__h")

  /** Drop documents whose benchmark shingle-overlap is at or above
    * `threshold` (decontaminated corpus). Anti-join on the flagged id set —
    * no broadcast hint: against a large benchmark the flagged set can grow
    * to corpus scale, where a forced broadcast OOMs; AQE still broadcasts
    * at runtime whenever it is actually small. */
  def dropContaminated(docs: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String,
                       threshold: Double, shingleN: Int = 3): DataFrame = {
    val flagged = contaminationScores(docs, benchmark, idCol, textCol, shingleN)
      .filter(col("overlap") >= threshold)
      .select(col(idCol).as("__contaminated_id"))
    docs.join(flagged,
      docs(idCol) === flagged("__contaminated_id"), "left_anti")
  }

  /** Okapi BM25 top-`k` retrieval: for each query in `queries`
    * (query_id, query_text — a SMALL, driver-known probe set), the `k`
    * best-scoring documents. The keyword-retrieval complement of the
    * embedding ANN family ([[VectorFunctions]]) — together they form the
    * hybrid-retrieval pair a RAG pipeline runs.
    *
    * score(q,d) = Σ_t∈q idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5))  (Robertson–Spärck Jones).
    *
    * Engine parity: each per-term contribution is rounded to 6 decimals and
    * summed as DECIMAL(18,6) — the sum is then order-independent and exact,
    * so cross-engine `ln` ulp drift cannot reorder the ranking (same
    * convention as the LM fluency scores). Ties break on doc id.
    *
    * Scale shape: the token stream is cut to QUERY TERMS ONLY by a broadcast
    * semi-join before the (doc, term) aggregation, so the exchange carries
    * O(docs × query-terms), not the corpus vocabulary; df comes from a
    * window over the already-aggregated rows; doc lengths are a separate
    * partial-agg; the final per-query rank is a WindowGroupLimit (map-side
    * top-k pre-prune). N must be passed or is computed with one count().
    */
  /** Driver-side query tokenizer matching [[TextFunctions.tokens]] — ONE
    * definition for every BM25 entry point, so a scoring-convention change
    * cannot silently desynchronize query terms from corpus tokens. */
  private def queryTerms(qtext: String): Seq[String] =
    qtext.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Duplicate query ids would violate bm25ScoreWeighted's (query_id, term)
    * uniqueness and silently double-count every shared term's contribution
    * — refuse loudly at the entry points. */
  private def requireDistinctQueryIds(queries: Seq[(Long, String)]): Unit = {
    val dup = queries.groupBy(_._1).collect { case (q, vs) if vs.size > 1 => q }
    require(dup.isEmpty,
      s"duplicate query ids ${dup.mkString(",")} — merge each id's text " +
        "into one query (scores would silently double-count)")
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               nDocs: Option[Long] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    requireDistinctQueryIds(queries)
    val n = nDocs.getOrElse(docs.count())
    val qTerms = queries
      .flatMap { case (qid, qtext) =>
        queryTerms(qtext).distinct.map(t => (qid, t, 1.0))
      }
    bm25ScoreWeighted(docs, idCol, textCol, qTerms, k, k1, b, n)
  }

  /** The ONE BM25 scoring plan, shared by [[bm25TopK]] (w ≡ 1.0 — an
    * exact no-op factor inside the rounding, so plain BM25 is bit-for-bit
    * the unweighted formula) and [[bm25PrfTopK]]'s expanded pass.
    * `wTerms` is (query_id, term, w) with (query_id, term) unique — a
    * LOCAL seq (both callers build it driver-side from the probe
    * queries), so the query-term set is a literal in the plan. Any
    * change to the scoring convention (idf form, rounding, tie-break)
    * lands here exactly once.
    *
    * ONE tokenize pass (round 14): the former plan tokenized the corpus
    * twice — once for per-doc lengths, once for query-term frequencies
    * (~half the operator's CPU at the steady bench point). One exploded
    * pass now aggregates both: tokens outside the (driver-known,
    * literal-isin) query-term set collapse into a per-doc "" row, so the
    * exchange carries ≤ |terms|+1 rows per doc, dl is the per-doc SUM of
    * the counts, and tf is the non-"" rows. Both consumers read the same
    * (id, term) aggregation exchange, which Spark reuses — the
    * tokenize+explode map side runs once. */
  private def bm25ScoreWeighted(docs: DataFrame, idCol: String,
                                textCol: String,
                                wTerms: Seq[(Long, String, Double)], k: Int,
                                k1: Double, b: Double, n: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wTermsDf = wTerms.toDF("query_id", "term", "w")
    val terms = wTerms.map(_._2).distinct.sorted
    // scratch-materialized: the three consumers below (tf, dl, avgdl) are
    // separate subtrees after optimization (the term≠"" filter pushes
    // into the tf branch's projection, so their canonical plans diverge
    // and exchange reuse cannot fire) — unmaterialized, each re-ran the
    // tokenize+explode pass over the corpus. The relation is ≤ |terms|+1
    // rows per doc.
    val counted = graft.util.Scratch.materialize(docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .select(col(idCol),
        when(col("term").isin(terms: _*), col("term"))
          .otherwise(lit("")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")), "bm25_term_counts")
    val dl = counted.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val avgdl = dl.agg(
      (sum(col("dl")).cast("double") / lit(n.toDouble)).as("avgdl"))
    val tf = counted.filter(col("term") =!= "")
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(byTerm).cast("double"))
      .join(broadcast(wTermsDf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(avgdl))
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("contrib",
        round(col("w") * col("idf") *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib")).as("score_dec"),
        count(lit(1)).as("n_terms_hit"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_dec").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        col("score_dec").cast("double").as("score"),
        col("n_terms_hit"), col("rank"))
  }

  /** BM25 with PSEUDO-RELEVANCE FEEDBACK (RM3-style query expansion,
    * Lavrenko & Croft 2001 / Abdul-Jaleel 2004): retrieve `fbDocs` per
    * query with plain [[bm25TopK]], harvest the `expTerms` most frequent
    * non-query terms from those feedback documents (ties to the
    * lexicographically smaller term), and rescore with the expanded
    * weighted query — original terms at weight 1, expansion terms at
    * `expWeight` (pick a binary-exact weight like 0.5 to keep the oracle
    * bit-for-bit). The classic recall lever when queries are short and
    * the vocabulary gap is real.
    *
    * Scale: pass 1 is [[bm25TopK]]'s shape; the harvest tokenizes ONLY
    * the feedback documents (queries × fbDocs rows, isin-pruned scan) and
    * the candidate tally collected driver-side is feedback-vocabulary
    * sized — the operator is EAGER through that tiny collect, and pass 2
    * is the SAME [[bm25ScoreWeighted]] plan with the weight folded INSIDE
    * the 6-decimal rounding. Doc ids keep their native type end-to-end
    * (string ids are first-class, exactly as in plain [[bm25TopK]]). */
  def bm25PrfTopK(docs: DataFrame, idCol: String, textCol: String,
                  queries: Seq[(Long, String)], k: Int,
                  fbDocs: Int = 5, expTerms: Int = 3,
                  expWeight: Double = 0.5,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs > 0 && expTerms >= 0, "fbDocs > 0, expTerms >= 0")
    require(expWeight > 0.0 && expWeight <= 1.0,
      s"expWeight $expWeight outside (0,1]")
    requireDistinctQueryIds(queries)
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    val qTermSet: Map[Long, Set[String]] = queries.map { case (qid, t) =>
      qid -> queryTerms(t).toSet
    }.toMap
    // pass 1 collected ONCE (queries × fbDocs rows); the local rows are
    // re-lifted to a DataFrame so pass 1's plan never re-executes, and the
    // id values stay whatever type the corpus uses
    val fbTop = bm25TopK(docs, idCol, textCol, queries, fbDocs, k1, b,
      Some(n)).select(col("query_id"), col(idCol))
    val fbRows = fbTop.collect()
    val fbIds = fbRows.map(_.get(1)).distinct.toSeq
    val fbPairs = spark.createDataFrame(
        java.util.Arrays.asList(fbRows: _*), fbTop.schema)
      .withColumnRenamed(idCol, "__fbid")
    val fbTokens = docs
      .filter(col(idCol).isin(fbIds: _*))
      .select(col(idCol).as("__fbid"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
    val cand = fbTokens.join(broadcast(fbPairs), Seq("__fbid"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("__s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = cand
      .filterNot { case (qid, t, _) => qTermSet(qid).contains(t) }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(expTerms)
          .map(t => (qid, t._2, expWeight))
      }
    val orig = queries.flatMap { case (qid, _) =>
      qTermSet(qid).toSeq.sorted.map(term => (qid, term, 1.0)) }
    bm25ScoreWeighted(docs, idCol, textCol, orig ++ exp, k, k1, b, n)
  }

  /** Reciprocal-rank fusion (Cormack–Clarke–Buettcher 2009): merge per-query
    * rankings from heterogeneous retrievers (e.g. [[bm25TopK]] keyword ranks
    * and [[VectorFunctions.bruteForceTopK]] embedding ranks) into one list by
    * rrf(q,d) = Σ_r 1/(c + rank_r(q,d)) — rank-only fusion, so the rankers'
    * incomparable score scales never need calibrating.
    *
    * Each input needs (queryCol, idCol, rankCol); ids must share one space.
    * Contributions are rounded to 9 decimals and summed as DECIMAL(18,9):
    * order-independent and engine-exact, same convention as the BM25/LM
    * scores. Ties break on id. Returns (queryCol, idCol, rrf_score,
    * n_rankers, rank).
    *
    * Scale: inputs are already top-k-per-query (tiny relative to corpora);
    * the union aggregates map-side on (query, id) and the final rank is a
    * WindowGroupLimit pre-prune — one exchange over candidate lists, the
    * corpora themselves are never touched here. */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(_.select(col(queryCol), col(idCol),
      round(lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double")), 9)
        .cast("decimal(18,9)").as("__rrf")))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col("__rrf_dec").desc, col(idCol))
    contribs.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(idCol))
      .agg(sum(col("__rrf")).as("__rrf_dec"),
        count(lit(1)).as("n_rankers"))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryCol), col(idCol),
        col("__rrf_dec").cast("double").as("rrf_score"),
        col("n_rankers"), col("rank"))
  }

  // --------------------------------------------------------------------------
  // Incremental BM25 inverted-index maintenance
  // --------------------------------------------------------------------------

  /** Fold an increment of NEW documents into a persisted BM25 inverted
    * index — the CDC answer to "keep keyword retrieval fresh per sync"
    * next to the incremental ANN indexes (band index, IVF cells). State is
    * ONE discriminated relation:
    *
    *   kind='p' → postings row (term, doc id, term frequency)
    *   kind='d' → doc-length row (doc id, token count; term = "")
    *
    * Because increments are NEW doc ids (the same append-only contract the
    * band index and `neardup_labels` rely on; a re-delivered id would
    * double its rows — the post_ops fold cursor guarantees exactly-once),
    * the fold is a pure APPEND of increment-derived rows: no history
    * rescan, no state rewrite beyond the atomic swap, and the state after
    * any chunking equals a one-pass build exactly — so scoring from the
    * fold carries the batch oracle verbatim. df/N/avgdl are NOT stored:
    * df derives from the query-term-pruned postings at read time, N and
    * avgdl from one aggregate over the doc-cardinality 'd' rows — stats
    * that must see the WHOLE corpus are exactly the ones cheap enough to
    * derive, and storing them would make the fold non-append.
    */
  def foldBm25Index(prev: Option[DataFrame], increment: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    // the state schema stores ids as LONG; a silent cast of a string-id
    // corpus would null every id and merge the whole increment into one
    // pseudo-document — refuse loudly instead (the rebalanceToMixture
    // convention). String-id corpora use the batch bm25TopK, where ids
    // are first-class.
    require({
        import org.apache.spark.sql.types._
        increment.schema(idCol).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
      },
      s"foldBm25Index stores ids as LONG; id column '$idCol' is " +
        s"${increment.schema(idCol).dataType.catalogString} — cast it " +
        "explicitly or use the batch bm25TopK for string ids")
    val tok = increment.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val postings = tok.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("v"))
      .select(lit("p").as("kind"), col("term"), col("id"), col("v"))
    // EVERY increment doc gets a 'd' row — tokenless docs (empty or null
    // text) carry dl=0. N and avgdl derive from the 'd' rows at read
    // time, so dropping tokenless docs here would diverge bm25FromIndex
    // from bm25TopK's N = docs.count() on any corpus that has them,
    // breaking the documented bit-for-bit batch equality.
    val doclens = increment.select(col(idCol).cast("long").as("id"))
      .distinct()
      .join(tok.groupBy(col("id")).agg(count(lit(1)).as("__n")), Seq("id"),
        "left")
      .select(lit("d").as("kind"), lit("").as("term"), col("id"),
        coalesce(col("__n"), lit(0L)).as("v"))
    val inc = postings.unionByName(doclens)
    prev.fold(inc)(_ unionByName inc)
  }

  /** Score queries from a [[foldBm25Index]] state — identical formula,
    * rounding and tie-breaks to [[bm25TopK]], so the result over a folded
    * index equals the batch computation over the underlying corpus
    * bit-for-bit (CorpusSpec pins it; `q_bm25_incremental` carries the
    * batch oracle). Returns (query_id, id, score, n_terms_hit, rank).
    *
    * Scale: the postings side is pruned to query terms BEFORE any
    * aggregation (broadcast semi-join), doc lengths join at candidate
    * scale, and the N/avgdl aggregate touches only the 'd' rows. */
  def bm25FromIndex(state: DataFrame, queries: Seq[(Long, String)], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    requireDistinctQueryIds(queries)
    val qTerms = queries
      .flatMap { case (qid, qtext) =>
        queryTerms(qtext).distinct.map(t => (qid, t))
      }.toDF("query_id", "term")
    val dl = state.filter(col("kind") === "d")
      .select(col("id"), col("v").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = state.filter(col("kind") === "p")
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
      .select(col("term"), col("id"), col("v").as("tf"))
    val byTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(byTerm).cast("double"))
      .join(broadcast(qTerms), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("contrib",
        round(col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib")).as("score_dec"),
        count(lit(1)).as("n_terms_hit"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_dec").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"),
        col("score_dec").cast("double").as("score"),
        col("n_terms_hit"), col("rank"))
  }
}
