package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** One shared local session per JVM (sbt forks a single test JVM, so every
  * suite reuses it — session startup is the dominant test cost otherwise). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkTestBase extends BeforeAndAfterAll { self: Suite =>
  def spark: SparkSession = SparkTestBase.spark
  def sfDir: String = SparkTestBase.sfDir
  def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_test_$tag").toString
}
