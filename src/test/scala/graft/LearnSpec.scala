package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LearnFunctions

/** Trained linear probe: learning quality on a planted linearly-separable
  * rule, plus the exactness contract (repartition-invariant integer
  * training) that underwrites the `q_linear_probe` cross-engine oracle. */
class LearnSpec extends AnyFunSuite with SparkTestBase {

  // planted rule: y = [Σ_d s_d·xq_d ≥ 0] with s alternating +1/−1 — a
  // genuine learning target (the fixture's own label column is noise
  // w.r.t. the vectors: measured 1-NN label agreement ≈ 0.10 = chance)
  private lazy val base = {
    val signs = array((0 until 64).map(d =>
      lit(if (d % 2 == 0) 1L else -1L)): _*)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        LearnFunctions.quantize(col("embedding"), preScale = 8).as("xq"))
      .withColumn("y",
        when(aggregate(zip_with(col("xq"), signs, (x, s) => x * s),
          lit(0L), (a, t) => a + t) >= 0, 1L).otherwise(0L))
      .cache()
  }
  private lazy val train = base.filter(col("vec_id") % 2 === 0)
  private lazy val heldOut = base.filter(col("vec_id") % 2 === 1)

  test("probe learns the planted rule: held-out accuracy >= 0.85") {
    val w = LearnFunctions.trainLinearProbe(train, "xq", "y",
      iters = 4, lrLog2 = 1)
    assert(w.length == 65)
    assert(w.exists(_ != 0), "training left all weights zero")
    val scored = LearnFunctions.scoreLinearProbe(heldOut, "vec_id", "xq", w,
      keepCols = Seq("y"))
    val acc = scored
      .agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.85, s"held-out accuracy $acc < 0.85")
    // the probability column is the exact integer scale rendering
    val bad = scored.filter(col("score") < 0 || col("score") > 1).count()
    assert(bad == 0)
  }

  test("train refuses null and width-mismatched vectors loudly") {
    val s = spark
    import s.implicits._
    val good = Seq((Seq(1L, 2L), 1L), (Seq(-3L, 4L), 0L)).toDF("xq", "y")
    val mixed = good.unionByName(
      Seq((null.asInstanceOf[Seq[Long]], 1L), (Seq(1L, 2L, 3L), 0L))
        .toDF("xq", "y"))
    val e = intercept[IllegalArgumentException] {
      LearnFunctions.trainLinearProbe(mixed, "xq", "y", iters = 1)
    }
    assert(e.getMessage.contains("2 training rows"), e.getMessage)
    // an ALL-null input refuses too (the dim probe must not NPE)
    val allNull = Seq.fill(3)(null.asInstanceOf[Seq[Long]])
      .zip(Seq(1L, 0L, 1L)).toDF("xq", "y")
    intercept[IllegalArgumentException] {
      LearnFunctions.trainLinearProbe(allNull, "xq", "y", iters = 1)
    }
  }

  test("training is a pure function of the input set: repartition-invariant") {
    val w1 = LearnFunctions.trainLinearProbe(train.repartition(3), "xq", "y",
      iters = 3, lrLog2 = 1)
    val w2 = LearnFunctions.trainLinearProbe(train.repartition(17), "xq", "y",
      iters = 3, lrLog2 = 1)
    assert(w1.toSeq == w2.toSeq,
      "weights differ under repartitioning — summation is order-dependent")
    assert(w1.exists(_ != 0))
  }

  test("prSweep: exact anchored counts, recall monotone in the threshold") {
    val w = LearnFunctions.trainLinearProbe(train, "xq", "y",
      iters = 4, lrLog2 = 1)
    val scored = LearnFunctions.scoreLinearProbe(heldOut, "vec_id", "xq", w,
      keepCols = Seq("y"))
    val total = heldOut.count()
    val pos = heldOut.filter(col("y") === 1).count()
    val rows = LearnFunctions.prSweep(scored, "y").orderBy("bucket").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (tp, fp, fn, tn) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(tp + fn == pos, s"bucket ${r.getLong(0)}: tp+fn != positives")
      assert(tp + fp + fn + tn == total)
    }
    // score >= 0 keeps everything: recall anchors at 1 and never increases
    assert(rows.head.getDouble(6) == 1.0)
    val recs = rows.map(_.getDouble(6))
    recs.zip(recs.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("degenerate labels: all-one training set pushes predictions positive") {
    val allPos = train.withColumn("y", lit(1L))
    val w = LearnFunctions.trainLinearProbe(allPos, "xq", "y",
      iters = 4, lrLog2 = 1)
    val predPos = LearnFunctions.scoreLinearProbe(heldOut, "vec_id", "xq", w)
      .agg(avg(col("pred").cast("double"))).head().getDouble(0)
    assert(predPos >= 0.95, s"all-positive training predicts only $predPos")
  }
}
