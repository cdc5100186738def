package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay parquet-driver + codegen init before the clock
    // starts so the alphabetically-first query isn't charged for it
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    // Failed queries report NEGATIVE elapsed time so they are visible in
    // BENCH json (a swallowed failure must not look like a fast pass).
    // Each query runs twice: the first timing carries one-off codegen /
    // first-touch costs, the second is the steady state a long session sees
    // — report both so round-over-round comparison isn't polluted by
    // compile-time noise.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) sec else -sec
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = timeOne(name, fn)
      val steady = if (cold < 0) cold else timeOne(name, fn)
      (name, cold, steady)
    }
    def fmtQs(sel: ((String, Double, Double)) => Double) = results
      .map { case r @ (k, _, _) => "\"" + k + "\":" + sel(r) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    val totalSteady = results.map(_._3).filter(_ > 0).sum
    // a cold-pass/steady-fail query (state-dependent breakage) must count
    // as failed too, or its silent absence from total_steady reads as a
    // round-over-round improvement
    val nFail = results.count(r => r._2 < 0 || r._3 < 0)

    // end-to-end extract→parquet throughput (BASELINE.md bar: >=115k rows/s).
    // Measured over LINEITEM (the largest fixture, 600k rows at sf0.1) so the
    // fixed per-session overhead (watermark saves, listing, footer reads)
    // amortizes the way it does in a real long session. Two runs into fresh
    // scratch dirs, best-of-2: the first pays writer codegen/committer init.
    val rps: Double =
      try {
        import graft.cdc._
        import graft.model._
        val runs = (1 to 2).map { _ =>
          val scratch = java.nio.file.Files
            .createTempDirectory("graft_bench_e2e").toString
          val store = new graft.watermark.WatermarkStore(s"$scratch/wm")
          val extractor = new graft.extract.Extractor(store, s"$scratch/staging")
          val id = TableId("bench", "fixtures", "lineitem")
          val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("l_orderkey"))
          val lineitem = graft.queries.Tables.df(spark, sfDir, "lineitem")
          extractor.extract(spark, id, lineitem, cfg).metrics.rowsPerSec
        }
        runs.max
      } catch { case e: Throwable =>
        System.err.println(s"[bench] e2e throughput FAILED: ${e.getMessage}"); -1.0
      }

    // attribute q_ann_ivf_topk's wall time: how much was KMeans training
    // (variance-prone) vs the probe plan (regression-prone)
    val ivfTrain = graft.functions.VectorFunctions.lastTrainSec

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFail,"extract_rows_per_sec":$rps,"total_steady":$totalSteady,"ivf_train_sec":$ivfTrain,"queries":${fmtQs(_._2)},"queries_steady":${fmtQs(_._3)},"sf":"$sfDir"}"""
    println(json)
    // Also persist the artifact ourselves: a tail-capture of stdout can clip
    // the line (it did in round 4) and lose the round-over-round signal.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
