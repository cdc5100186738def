package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** The deterministic sketch family's two load-bearing promises:
  * (1) EXACT chunk invariance — state after any chunking is bit-identical
  * to the direct one-pass state (this is what buys the full DuckDB value
  * oracles, unlike the HLL/KLL folds); (2) the documented error shapes
  * (KMV relative error, CMS overestimate-only, sample-quantile rank
  * error) against exact computations. */
class SketchesSpec extends AnyFunSuite with SparkTestBase {

  private val s = spark
  import s.implicits._

  private def mkRows(n: Int, groups: Int, card: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, s"g${rnd.nextInt(groups)}",
      rnd.nextInt(card).toLong, rnd.nextInt(10000) / 10.0))
      .toDF("id", "grp", "item", "v")
  }

  private def randomChunks(df: DataFrame, k: Int, seed: Int): Seq[DataFrame] =
    (0 until k).map(j => df.filter(abs(hash(col("id"), lit(seed))) % k === j))

  // ------------------------------------------------------------------ KMV

  test("foldKmvDistinct: bit-identical state under any chunking; exact below k") {
    val df = mkRows(3000, 4, 900, 7)
    def state(chunks: Seq[DataFrame]) =
      chunks.foldLeft(Option.empty[DataFrame]) {
        (p, c) => Some(Sketches.foldKmvDistinct(p, c, Seq("grp"), "item", k = 64))
      }.get.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = state(Seq(df))
    for (seed <- 1 to 3)
      assert(state(randomChunks(df, 3, seed)) == direct, s"seed=$seed diverged")

    // sparse group: fewer distinct items than k → estimate is EXACT
    val sparse = df.filter(col("item") < 40)
    val est = Sketches.readKmvDistinct(
      Sketches.foldKmvDistinct(None, sparse, Seq("grp"), "item", k = 64),
      k = 64)
    val exact = sparse.groupBy("grp").agg(countDistinct("item").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.collect().foreach { r =>
      assert(r.getAs[Long]("est_distinct") == exact(r.getString(0)))
      assert(r.isNullAt(r.fieldIndex("kth_hash")))
    }
  }

  test("readKmvDistinct: saturated estimate within 4/sqrt(k) of exact") {
    val df = mkRows(6000, 2, 2500, 13)
    val est = Sketches.readKmvDistinct(
      Sketches.foldKmvDistinct(None, df, Seq("grp"), "item"), k = 256)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    val exact = df.groupBy("grp").agg(countDistinct("item").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tol = 4.0 / math.sqrt(256.0) // ~4 standard errors
    exact.foreach { case (g, d) =>
      assert(math.abs(est(g) - d).toDouble / d <= tol,
        s"group $g: est=${est(g)} exact=$d off by more than ${tol * 100}%")
    }
  }

  // ------------------------------------------------------------------ CMS

  test("foldCountMin: counter state equals direct counts; estimates never undercount") {
    val df = mkRows(4000, 3, 300, 23)
    def state(chunks: Seq[DataFrame]) =
      chunks.foldLeft(Option.empty[DataFrame]) {
        (p, c) => Some(Sketches.foldCountMin(p, c, Seq("grp"), "item",
          depth = 4, width = 512))
      }.get
    val direct = state(Seq(df)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    for (seed <- 1 to 2) {
      val folded = state(randomChunks(df, 3, seed)).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(folded == direct, s"seed=$seed counter state diverged")
    }

    val cand = df.select("grp", "item").distinct()
    val est = Sketches.estimateCountMin(state(Seq(df)), cand, Seq("grp"),
      "item", depth = 4, width = 512)
    val exact = df.groupBy("grp", "item").count()
    val joined = est.join(exact, Seq("grp", "item"))
      .select(col("est_count"), col("count")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1),
        s"CMS undercounted: est=${r.getLong(0)} true=${r.getLong(1)}")
    }
    // with width >> distinct items, most estimates are exact
    val exactFrac = joined.count(r => r.getLong(0) == r.getLong(1)).toDouble /
      joined.length
    assert(exactFrac > 0.5, f"only $exactFrac%.2f of estimates exact")
  }

  test("heavyHitters: finds a planted heavy key at rank 1") {
    val base = mkRows(2000, 1, 400, 31)
    val heavy = (1 to 600).map(i =>
      (100000L + i, "g0", 99999L, 0.0)).toDF("id", "grp", "item", "v")
    val df = base.unionByName(heavy)
    val st = Sketches.foldCountMin(None, df, Seq("grp"), "item")
    val top = Sketches.heavyHitters(st, df.select("grp", "item").distinct(),
      Seq("grp"), "item", topN = 5).collect()
    assert(top.head.getAs[Long]("item") == 99999L,
      s"planted heavy hitter not at rank 1: ${top.toSeq}")
    assert(top.head.getAs[Long]("est_count") >= 600L)
    assert(top.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  // --------------------------------------------------------- sample fold

  test("foldSampleState: bit-identical sample under any chunking; uniform over history") {
    val df = mkRows(5000, 3, 100, 41)
    def state(chunks: Seq[DataFrame]) =
      chunks.foldLeft(Option.empty[DataFrame]) {
        (p, c) => Some(Sketches.foldSampleState(p, c, Seq("grp"), "id", "v",
          k = 128))
      }.get.collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1))
        .toMap
    val direct = state(Seq(df))
    for (seed <- 1 to 3)
      assert(state(randomChunks(df, 4, seed)) == direct, s"seed=$seed diverged")
    // every group saturates at exactly k
    direct.values.foreach(a => assert(a.size == 128))
  }

  test("readSampleQuantiles: within rank-error bound of exact quantiles") {
    val df = mkRows(8000, 2, 100, 53)
    val out = Sketches.readSampleQuantiles(
      Sketches.foldSampleState(None, df, Seq("grp"), "id", "v", k = 256),
      Seq(0.5), out = "samp").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("q_50")).toMap
    // compare by RANK: the sample median's true rank must be 0.5 ± 4/sqrt(k)
    out.foreach { case (g, m) =>
      val grp = df.filter(col("grp") === g)
      val below = grp.filter(col("v") <= m).count().toDouble
      val frac = below / grp.count()
      assert(math.abs(frac - 0.5) <= 4.0 / math.sqrt(256.0),
        f"group $g: sample median at true rank $frac%.3f")
    }
  }

  test("sample fold keeps earliest-hash rows, not latest rows (no recency bias)") {
    // fold two chunks where the second chunk has ids disjoint from the
    // first; the retained sample must mix both chunks by hash order, not
    // simply keep the newest chunk
    val a = (1L to 400L).map(i => (i, "g", i / 10.0)).toDF("id", "grp", "v")
    val b = (401L to 800L).map(i => (i, "g", i / 10.0)).toDF("id", "grp", "v")
    val st = Sketches.foldSampleState(
      Some(Sketches.foldSampleState(None, a, Seq("grp"), "id", "v", k = 64)),
      b, Seq("grp"), "id", "v", k = 64)
    val ids = st.select(explode(col("samp"))).select("col.v").collect()
      .map(_.getDouble(0) * 10).map(_.toLong)
    assert(ids.exists(_ <= 400) && ids.exists(_ > 400),
      "sample should draw from both increments")
  }
}
