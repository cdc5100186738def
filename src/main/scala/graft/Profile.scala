package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Measurement tooling (round 14): run one declared query and print a
  * per-JOB breakdown (wall, task time, CPU, tasks, call site) so the
  * expensive pass inside a multi-job operator names itself. Usage:
  *   runMain graft.Profile <sfDir> <queryName> [repeats]
  * Timing methodology matches Bench.timeOne (warmups then timed .count()). */
object Profile {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, var t0: Long = 0L, var t1: Long = 0L,
                            var site: String = "", var tasks: Long = 0L,
                            var runMs: Long = 0L, var cpuNs: Long = 0L,
                            var shufRead: Long = 0L, var shufWrite: Long = 0L,
                            val stages: java.util.concurrent.ConcurrentLinkedQueue[String] =
                              new java.util.concurrent.ConcurrentLinkedQueue[String]())
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var collecting = false
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description)
        case _ => ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collecting) {
        val r = JobRec(j.jobId)
        r.t0 = j.time
        r.site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .map(id => id + ":" +
            execDesc.getOrDefault(id.toLong, "?").linesIterator.next())
          .getOrElse("?")
        jobs.put(j.jobId, r)
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collecting) {
        Option(jobs.get(j.jobId)).foreach(_.t1 = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          Option(stageToJob.get(s.stageInfo.stageId))
            .flatMap(id => Option(jobs.get(id))).foreach { r =>
              val m = s.stageInfo.taskMetrics
              r.tasks += s.stageInfo.numTasks
              r.runMs += m.executorRunTime
              r.cpuNs += m.executorCpuTime
              r.shufRead += m.shuffleReadMetrics.totalBytesRead
              r.shufWrite += m.shuffleWriteMetrics.bytesWritten
              r.stages.add(
                f"${s.stageInfo.name.takeWhile(_ != '(').trim}:" +
                  f"${m.executorRunTime / 1e3}%.1f")
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries(name)
    // warmups (codegen/JIT), as Bench does
    (1 to 2).foreach(_ => fn(spark, sfDir).count())
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    (1 to repeats).foreach { rep =>
      jobs.clear(); stageToJob.clear()
      collecting = true
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShim.waitListenerBus(spark)
      collecting = false
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"== $name rep $rep: wall $wall%.3f s, rows $n ==")
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      val totalJobMs = recs.map(r => r.t1 - r.t0).sum
      recs.foreach { r =>
        println(f"job ${r.id}%3d wall ${(r.t1 - r.t0) / 1e3}%7.3f  " +
          f"task ${r.runMs / 1e3}%8.3f  cpu ${r.cpuNs / 1e9}%8.3f  " +
          f"tasks ${r.tasks}%4d  sr ${r.shufRead / 1e6}%7.1f MB  " +
          f"sw ${r.shufWrite / 1e6}%7.1f MB  ${r.site} " +
          r.stages.toArray.mkString("[", " ", "]"))
      }
      println(f"sum job wall ${totalJobMs / 1e3}%.3f s over ${recs.size} jobs" +
        f" (gaps = driver/plan time: ${wall - totalJobMs / 1e3}%.3f s)")
    }
    spark.stop()
  }
}
