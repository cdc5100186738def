package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine TRAINED linear probe (hard-sigmoid logistic regression by
  * full-batch gradient descent) — the "train a quality/topic filter where
  * the data lives" operator: corpora are scored by small linear models far
  * more often than they are re-embedded, and at 100 TB the training data
  * cannot leave the cluster.
  *
  * Distributed shape per iteration (the textbook data-parallel GD layout):
  * the weight vector rides the PLAN as a (D+1)-literal array; the margin
  * and per-row error are computed rowwise with zero shuffle; the gradient
  * is one `groupBy(dim)` over the posexploded (dim, err·x) pairs, which
  * partial-aggregates map-side to D+1 rows per partition before the
  * exchange — the only shuffle carries `D+1 × partitions` rows regardless
  * of corpus size, and the driver touches exactly D+1 sums per iteration
  * (bounded — same index-build class as IVF centroids). The corpus is
  * scanned `iters` times from cache and never moves.
  *
  * EXACT fixed-point arithmetic end-to-end (what buys the full
  * cross-engine oracle in `q_linear_probe`, where every other trained-
  * model system settles for tolerance tests): features quantize once to
  * integers (`round(x · preScale · 1e6)` — IEEE multiply then half-away
  * rounding, bit-identical in any engine); the activation is the HARD
  * sigmoid `clamp(m/4 + 1/2, 0, 1)` — chosen over `exp` precisely because
  * it needs no libm call whose last ulp differs between engines; sums of
  * per-row integer contributions are DECIMAL(38,0)/int128 — associative,
  * so partition order cannot change them; and the weight update rounds
  * the exact rational `lr·G/N` half-away-from-zero using only integer
  * division. Training is therefore a pure function of the input SET —
  * invariant under repartitioning (LearnSpec pins this) and replayable
  * verbatim in DuckDB `HUGEINT` arithmetic.
  *
  * Scales: features carry 1e6 fixed-point (after `preScale`), weights
  * 1e9, margins 1e15, probabilities 4e15 (p_num = 4e15·p). `preScale`
  * preconditions: raw embedding dims with std ~0.1 give the Gram matrix a
  * bias-dominated spectrum (cond ≈ 240 measured on the fixture — hundreds
  * of GD steps); ×8 equalizes feature/bias scale (cond ≈ 8) so a handful
  * of iterations converge, which is what keeps the unrolled SQL oracle
  * finite.
  */
object LearnFunctions {

  /** Fixed-point scale of a quantized feature (1.0 → 1e6). */
  val Quant = 1000000L
  /** Fixed-point scale of a probability: p_num = PScale·p, p ∈ [0,1]. */
  val PScale = 4000000000000000L // 4e15
  private val Half = 2000000000000000L // PScale/2 = margin-0 intercept

  /** Quantize a float-vector column to integer fixed point:
    * xq_d = round(x_d · preScale · 1e6) as array<long>. */
  def quantize(vecCol: Column, preScale: Int = 8): Column =
    transform(vecCol, x =>
      round(x.cast("double") * lit(preScale.toDouble * Quant)).cast("long"))

  /** Exact margin of one quantized row under integer weights (scale 1e15):
    * Σ_d xq_d·wq_d + 1e6·wq_bias, accumulated as DECIMAL(38,0). */
  private def marginCol(xqCol: Column, w: Array[BigInt]): Column = {
    val dim = w.length - 1
    require(w.forall(_.abs < BigInt("1000000000000")),
      s"weight magnitude exceeds 1e12 — margin products would overflow long")
    val wLit = array(w.take(dim).map(v => lit(v.toLong)): _*)
    aggregate(
      zip_with(xqCol, wLit, (x, wc) => x * wc),
      lit(0L).cast(DecimalType(38, 0)),
      (acc, t) => acc + t) + lit(w(dim).toLong) * lit(Quant)
  }

  /** p_num = clamp(m + 2e15, 0, 4e15) = 4e15 · hardSigmoid(m/1e15). */
  private def pNumCol(m: Column): Column =
    least(greatest(m + lit(Half), lit(0L).cast(DecimalType(38, 0))),
      lit(PScale).cast(DecimalType(38, 0)))

  /** Train an integer-weight linear probe on `(xqCol: array<long>,
    * yCol: 0/1)` rows. Returns D+1 weights at scale 1e9 (bias last).
    * Learning rate is 2^lrLog2; the per-iteration update is
    * wq_d ← wq_d − round(2^lrLog2 · G_d / (4e12 · N)) with G_d the exact
    * integer gradient sum — every step replays in any engine with int128
    * arithmetic. */
  def trainLinearProbe(vecs: DataFrame, xqCol: String, yCol: String,
                       iters: Int = 4, lrLog2: Int = 1,
                       initWeights: Option[Array[BigInt]] = None)
      : Array[BigInt] = {
    require(iters >= 1 && iters <= 64, s"iters $iters out of [1,64]")
    require(lrLog2 >= -8 && lrLog2 <= 20, s"lrLog2 $lrLog2 out of [-8,20]")
    val base = vecs.select(col(xqCol).as("__xq"),
      col(yCol).cast("long").as("__y")).persist()
    try {
      val n = base.count()
      require(n > 0, "empty training set")
      // width of the FIRST non-null vector; an all-null input falls through
      // to the bad-row refusal below rather than NPE-ing on the probe
      val dim = base.select(size(col("__xq")).as("__d"))
        .filter(col("__d") > 0).limit(1)
        .collect().headOption.map(_.getInt(0)).getOrElse(0)
      // a null or width-mismatched vector would count toward N (the
      // learning-rate divisor 4e12·N) while its null margin drops out of
      // every gradient sum — silently shrinking each step. The oracle
      // contract ("pure function of the input SET") needs every row to
      // participate, so mirror lloydKmeansExact and refuse loudly.
      val bad = base.filter(col("__xq").isNull ||
        size(col("__xq")) =!= dim).count()
      require(bad == 0,
        s"$bad training rows have null or non-$dim-dimensional vectors")
      // the margin fold multiplies long×long: with |wq| < 1e12 guarded in
      // marginCol, features must stay below ~9.2e6 or products silently
      // wrap — refuse data quantized off the intended ±10-unit range loudly
      val maxXq = base
        .select(max(aggregate(transform(col("__xq"), x => abs(x)),
          lit(0L), (a, t) => greatest(a, t)))).head().getLong(0)
      require(maxXq < 9000000L,
        s"quantized feature magnitude $maxXq >= 9e6 — margin products " +
          "would overflow long (rescale features or lower preScale)")
      // B = 4e12·N / 2^lrLog2 — must divide EXACTLY or the update deviates
      // from the documented rational wq − round(lr·G/(4e12·N))
      val b4 = BigInt(4000000000000L) * n
      val bDiv =
        if (lrLog2 >= 0) {
          require(b4 % (BigInt(1) << lrLog2) == 0,
            s"lr 2^$lrLog2 does not divide 4e12·N=$b4 exactly")
          b4 >> lrLog2
        } else b4 << (-lrLog2)
      require(bDiv > 0 && bDiv % 2 == 0,
        s"lr 2^$lrLog2 leaves an odd divisor $bDiv (half-rounding undefined)")
      val halfB = bDiv / 2
      // warm start = ONLINE learning: continuing from persisted weights
      // makes "train a few steps on each increment" a pure function of the
      // (ordered) increment sequence — the fold_probe post-op's contract
      var w = initWeights.map { iw =>
        require(iw.length == dim + 1,
          s"initWeights length ${iw.length} != dim+1 ${dim + 1}")
        iw.clone()
      }.getOrElse(Array.fill[BigInt](dim + 1)(BigInt(0)))
      for (_ <- 1 to iters) {
        val err = pNumCol(marginCol(col("__xq"), w)) -
          lit(PScale).cast(DecimalType(38, 0)) * col("__y")
        val grads = base
          .select(err.as("__err"), col("__xq"))
          .select(col("__err"),
            posexplode(concat(col("__xq"), array(lit(Quant))))
              .as(Seq("__dim", "__x")))
          .groupBy(col("__dim"))
          .agg(sum(col("__err") * col("__x").cast(DecimalType(38, 0)))
            .as("__g"))
          .collect()
          .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
          .toMap
        w = w.zipWithIndex.map { case (wd, d) =>
          val g = grads.getOrElse(d, BigInt(0))
          val delta = (g.abs + halfB) / bDiv // round-half-away |lr·G/(4e12·N)|
          wd - (if (g.signum >= 0) delta else -delta)
        }
      }
      w
    } finally base.unpersist()
  }

  /** Score rows under trained weights: (idCol, keepCols..., p_num, pred,
    * score) where p_num is the exact integer probability (scale 4e15),
    * pred the exact integer decision p ≥ 1/2, and score its double
    * rendering for ranking. `keepCols` pass through from the input (e.g.
    * the label for evaluation) — carrying them here keeps the scorer ONE
    * rowwise no-shuffle pass instead of forcing callers into a
    * corpus-scale re-join on id. Quantized features must respect
    * [[trainLinearProbe]]'s |xq| < 9e6 bound or margin products wrap. */
  def scoreLinearProbe(df: DataFrame, idCol: String, xqCol: String,
                       w: Array[BigInt],
                       keepCols: Seq[String] = Nil): DataFrame = {
    val p = pNumCol(marginCol(col(xqCol), w))
    df.select(col(idCol) +: keepCols.map(col) :+ p.as("p_num"): _*)
      .withColumn("pred",
        when(col("p_num") >= lit(Half), 1).otherwise(0))
      .withColumn("score", col("p_num").cast("double") / lit(PScale.toDouble))
  }

  /** Precision/recall curve by threshold sweep over `p_num` scores — the
    * operating-point picker for a trained filter. ONE corpus-scale
    * aggregation builds a (bucket, y) histogram (≤ 2·buckets rows — the
    * exchange carries the histogram, never scores); the whole curve then
    * falls out of conditional sums over that tiny relation, so sweeping
    * more thresholds costs nothing at corpus scale. Returns per threshold
    * bucket t (score ≥ t/buckets): exact integer tp/fp/fn/tn plus
    * prec/rec as quotients of those integers (IEEE division of identical
    * operands — engine-identical doubles, no rounding convention needed). */
  def prSweep(scored: DataFrame, yCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && PScale % buckets == 0,
      s"buckets $buckets must divide the probability scale")
    val step = PScale / buckets
    val spark = scored.sparkSession
    val hist = scored
      .select(least(expr(s"CAST(p_num AS BIGINT) div $step"),
        lit(buckets - 1L)).as("b"), col(yCol).cast("long").as("__y"))
      .groupBy(col("b"), col("__y")).agg(count(lit(1)).as("n"))
    val thr = spark.range(buckets).toDF("bucket")
    val above = col("b") >= col("bucket")
    val isPos = col("__y") === 1
    // left join (not cross): an EMPTY scored input must still yield one
    // all-zero row per threshold, not an empty curve; the null hist side
    // falls through every when() to 0
    thr.join(broadcast(hist), lit(true), "left")
      .groupBy(col("bucket"))
      .agg(
        sum(when(above && isPos, col("n")).otherwise(0L)).as("tp"),
        sum(when(above && !isPos, col("n")).otherwise(0L)).as("fp"),
        sum(when(!above && isPos, col("n")).otherwise(0L)).as("fn"),
        sum(when(!above && !isPos, col("n")).otherwise(0L)).as("tn"))
      .select(col("bucket"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))).as("rec"))
  }
}
