package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access for the driver contract queries. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a fixture table. Timestamp columns are naive (TIMESTAMP_NTZ,
    * parquet µs with no zone; UTC by fixture convention) — epoch arithmetic
    * on them goes through [[graft.util.TimeCols]], never a session-tz cast. */
  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every fixture as a temp view (for custom-SQL strategy queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))

  /** Fresh scratch dir for queries that exercise the write path, deleted
    * RECURSIVELY at JVM exit (File.deleteOnExit only removes empty dirs —
    * populated scratch trees would leak across long bench sessions). */
  def scratchDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case scala.util.control.NonFatal(_) => () }))
    d.toString
  }
}
