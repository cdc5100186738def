package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Per-run stage-metric attribution (executor run/cpu/GC time, spill,
    * tasks) — the signal that separates "the plan got slower" from "the
    * session got noisier" (GC/codegen pressure from 126 queries × 2 runs in
    * one JVM). Counters are cumulative; callers snapshot around a run after
    * draining the listener bus. */
  private final class StageAcc extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      runMs.addAndGet(m.executorRunTime)
      cpuNs.addAndGet(m.executorCpuTime)
      gcMs.addAndGet(m.jvmGCTime)
      spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
      ()
    }
    def snapshot: (Long, Long, Long, Long, Long) =
      (runMs.get, cpuNs.get, gcMs.get, spill.get, tasks.get)
  }

  final case class Attrib(execSec: Double, cpuSec: Double, gcSec: Double,
                          spillMb: Double, tasks: Long, leakedRdds: Int) {
    def json: String =
      f"""{"exec_sec":$execSec%.3f,"cpu_sec":$cpuSec%.3f,"gc_sec":$gcSec%.3f,""" +
        f""""spill_mb":$spillMb%.1f,"tasks":$tasks,"leaked_rdds":$leakedRdds}"""
  }

  def main(args: Array[String]): Unit = {
    // the f-interpolator formats through the DEFAULT locale: under a
    // de_DE/fr_FR host locale every %.3f renders "0,123" and both JSON
    // artifacts become unparseable. Pin ROOT before any formatting.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // isolation mode: SPARK_GRAFT_BENCH_ONLY=q_a,q_b runs just those
    // queries in this (fresh) JVM — the clean-room cross-check for any
    // in-session number that looks interference-shaped
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)
    // untimed warmup: pay parquet-driver + codegen init before the clock
    // starts so the alphabetically-first query isn't charged for it
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    // Inter-query hygiene: operators that localCheckpoint/persist
    // internally (cluster label propagation, PQ/IVF training) leave blocks
    // behind until the ContextCleaner happens to run; across 252 query
    // executions those blocks pile up and later queries pay the memory/GC
    // bill (round 5's "steady slower than cold" signature). Unpersist
    // everything between runs — each run rebuilds its own plan, so only
    // garbage goes — and REPORT what leaked so the leaking operator is
    // visible, not just its victims.
    def sweepLeaked(): Int = {
      val leaked = spark.sparkContext.getPersistentRDDs
      leaked.values.foreach(_.unpersist(blocking = false))
      leaked.size
    }

    // Failed queries report NEGATIVE elapsed time so they are visible in
    // BENCH json (a swallowed failure must not look like a fast pass).
    // Each query runs twice: the first timing carries one-off codegen /
    // first-touch costs, the second is the steady state a long session sees
    // — report both so round-over-round comparison isn't polluted by
    // compile-time noise.
    def timeOne(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String = sfDir)
        : (Double, Attrib) = {
      org.apache.spark.sql.GraftShim.waitListenerBus(spark)
      val (r0, c0, g0, s0, t0n) = acc.snapshot
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShim.waitListenerBus(spark)
      val (r1, c1, g1, s1, t1n) = acc.snapshot
      val leaked = sweepLeaked()
      val attrib = Attrib((r1 - r0) / 1e3, (c1 - c0) / 1e9, (g1 - g0) / 1e3,
        (s1 - s0) / 1e6, t1n - t0n, leaked)
      (if (ok) sec else -sec, attrib)
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = queries.map { case (name, fn) =>
      val (cold, _) = timeOne(name, fn)
      val (steady, attrib) =
        if (cold < 0) (cold, Attrib(0, 0, 0, 0, 0, 0)) else timeOne(name, fn)
      (name, cold, steady, attrib)
    }
    def fmtQs(sel: ((String, Double, Double, Attrib)) => Double) = results
      .map { case r @ (k, _, _, _) => "\"" + k + "\":" + sel(r) }
      .mkString("{", ",", "}")
    val attribJson = results
      .map { case (k, _, _, a) => "\"" + k + "\":" + a.json }
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

    // attribute the ANN queries' wall time: training/encode cost
    // (variance-prone) vs the probe plan (regression-prone)
    val ivfTrain = graft.functions.VectorFunctions.lastTrainSec
    val clusterIdx = graft.functions.DedupFunctions.lastIndexBuildSec
    val pqTrain = graft.functions.VectorFunctions.lastPqTrainSec
    val pqEncode = graft.functions.VectorFunctions.lastPqEncodeSec

    // ---- second scale point: synthesize ~10× locally and re-measure the
    // operators whose constant factors could hide at sf0.1 (span/cluster
    // dedup family + z-order write). documents ×8 with a per-copy Caesar
    // SUBSTITUTION on the text: each copy keeps the original's internal
    // near-dup structure (pairs/clusters scale by exactly 8×) while copies
    // stay mutually non-duplicate — the row-scaled workload, not a
    // quadratic cross-copy pair explosion. lineitem ×10 with shifted keys
    // feeds the extract and z-order paths. A query is scale-healthy when
    // its 10× steady time stays within ~linear of its sf time.
    val scaleQueries = Seq("q_dedup_span_stats", "q_dedup_cluster_drop",
      "q_split_by_cluster", "q_dedup_minhash_neardup", "q_dedup_lines_global",
      "q_zorder_layout", "q_crossmodal_dedup", "q_mixture_rebalance",
      "q_kn_logprob", "q_dsir_select", "q_curriculum_shards")
    val scaleCheck = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "1") != "0"
    val (scaleJson, rps10x): (String, Double) = if (!scaleCheck) ("{}", -1.0)
    else try {
      import org.apache.spark.sql.functions._
      val dir10 = java.nio.file.Files.createTempDirectory("graft_bench_10x")
        .toString
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until 8).map { i =>
        val d = docs.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 10000000L))
        if (i == 0) d
        else d.withColumn("text",
          translate(col("text"), alpha, alpha.drop(i) + alpha.take(i)))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      (0 until 10).map(i => li.withColumn("l_orderkey",
          col("l_orderkey") + lit(i.toLong * 100000000L)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dir10/lineitem.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "events", "embeddings"))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir10, s"$t.parquet"),
          java.nio.file.Paths.get(sfDir, s"$t.parquet"))
      val qmap = SparkEntry.queries
      val res10 = scaleQueries.flatMap(n => qmap.get(n).map { fn =>
        timeOne(n, fn, dir10) // warm (codegen already paid); one timed run
        n -> timeOne(n, fn, dir10)._1
      })
      val r10 = {
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_bench_e2e10").toString
        val store = new graft.watermark.WatermarkStore(s"$scratch/wm")
        val extractor = new graft.extract.Extractor(store, s"$scratch/staging")
        val cfg = graft.model.CdcConfig(graft.model.CdcStrategyKind.IdOnly,
          idColumn = Some("l_orderkey"))
        extractor.extract(spark,
          graft.model.TableId("bench10", "fixtures", "lineitem"),
          spark.read.parquet(s"$dir10/lineitem.parquet"), cfg)
          .metrics.rowsPerSec
      }
      (res10.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}"), r10)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] 10x scale point FAILED: ${e.getMessage}")
      ("{}", -1.0)
    }

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFail,"extract_rows_per_sec":$rps,"total_steady":$totalSteady,"ivf_train_sec":$ivfTrain,"cluster_index_build_sec":$clusterIdx,"pq_train_sec":$pqTrain,"pq_encode_sec":$pqEncode,"queries":${fmtQs(_._2)},"queries_steady":${fmtQs(_._3)},"attrib":$attribJson,"queries_10x":$scaleJson,"extract_rows_per_sec_10x":$rps10x,"scale_10x":{"documents":8,"lineitem":10},"sf":"$sfDir"}"""
    // The FULL artifact (cold+steady+attrib maps, ~30 KB at 174 queries)
    // goes to target/bench.json only: printed, it exceeds the driver's
    // stdout tail-capture and the round's "parsed" field comes back null
    // (it did in rounds 6 and 7). Stdout carries ONE compact line instead.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    // The compact line's "queries" map carries the COLD timings — the
    // same meaning the key has in target/bench.json, so a consumer
    // comparing stdout against a committed artifact never diffs
    // steady-vs-cold. Steady totals ride as the total_steady scalar;
    // per-query steady stays in the full artifact. Printed AFTER
    // spark.stop() so no executor/streaming log line can interleave
    // mid-JSON — the other way a capture ends up unparseable.
    val compactQs = results
      .map { case (k, cold, _, _) => f""""$k":$cold%.3f""" }
      .mkString("{", ",", "}")
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFail,"extract_rows_per_sec":$rps%.0f,"total_steady":$totalSteady%.3f,"queries":$compactQs,"queries_10x":$scaleJson,"extract_rows_per_sec_10x":$rps10x%.0f,"sf":"$sfDir"}"""
    spark.stop()
    println(compact)
  }
}
