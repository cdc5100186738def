package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale configuration baked in — the
  * code-level home for everything the reference tuned via boto3/settings
  * (K2 multipart upload tuning, s3_manager.py:362-427) plus the Spark-side
  * knobs this engine's plans assume:
  *
  *  - AQE on (runtime re-plan, skew-join splitting, partition coalescing);
  *  - shuffle partitions sized to the cluster, not the 200 default;
  *  - 256 MB scan splits (big-file parquet reads don't over-partition);
  *  - S3A multipart thresholds mirroring the reference's TransferConfig
  *    (100 MB threshold / 50 MB parts / 10 threads) — inert on local FS,
  *    authoritative when the same job runs against s3a://.
  */
object GraftSession {

  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "268435456") // 256 MB
      .config("spark.sql.parquet.compression.codec", "snappy")
      // K2 analog: S3A multipart tuning (ref TransferConfig). NOTE: on a
      // real S3 deployment also set fs.s3a.committer.name=magic and
      // spark.sql.sources.commitProtocolClass=...cloud.PathOutputCommitProtocol
      // — that class ships in the spark-hadoop-cloud artifact, absent here,
      // and Spark refuses the conf when the class is unloadable.
      .config("spark.hadoop.fs.s3a.multipart.threshold", "104857600") // 100 MB
      .config("spark.hadoop.fs.s3a.multipart.size", "52428800")       // 50 MB
      .config("spark.hadoop.fs.s3a.threads.max", "10")
    master.map(b.master).getOrElse(b)
  }

  /** Local session sized like the bench/verify harness. */
  def local(threads: Int = 32, appName: String = "graft"): SparkSession =
    builder(appName, Some(s"local[$threads]"), shufflePartitions = threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
