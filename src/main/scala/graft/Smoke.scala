package graft

import org.apache.spark.sql.SparkSession

/** Throwaway smoke main: verify Spark 4.1 reads the ns-timestamp events
  * table and show inferred schemas of all fixtures. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.count()} rows")
      df.printSchema()
      df.show(2, truncate = 60)
    }
    spark.stop()
  }
}
