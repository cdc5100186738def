package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join/agg must be row-identical to the unsalted forms. */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("salted join equals plain join (inner)") {
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = Skew.saltedJoin(
      orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey"), saltFactor = 8)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("salted join preserves left rows (left_outer)") {
    val small = customer.limit(10)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_name")
    val plain = orders.join(small, Seq("o_custkey"), "left_outer").count()
    val salted = Skew.saltedJoin(orders, small, Seq("o_custkey"), 4, "left_outer")
      .count()
    assert(salted == plain && salted == orders.count())
  }

  test("salted join refuses small-side-preserving join types") {
    // each of the saltFactor small-side replicas would null-extend its own
    // unmatched row — saltFactor spurious rows per absent key
    val small = customer.limit(10)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_name")
    for (t <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(orders, small, Seq("o_custkey"), 4, t)
      }
      assert(e.getMessage.contains("spurious"), t)
    }
  }

  test("identical hot rows from different partitions spread across salts") {
    val s = spark
    import s.implicits._
    // 200 byte-identical rows (the sentinel-row skew case) across multiple
    // source partitions must not all take one salt
    val hot = s.createDataFrame(
      s.sparkContext.parallelize(Seq.fill(200)((1L, "sentinel")), 8))
      .toDF("k", "v")
    val dim = Seq((1L, "name")).toDF("k", "name")
    val joined = Skew.saltedJoin(hot, dim, Seq("k"), saltFactor = 4)
    assert(joined.count() == 200) // row-identical contract holds
    val salts = hot.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.spark_partition_id(),
          hot("k"), hot("v")),
        org.apache.spark.sql.functions.lit(4)))
      .select("__salt").distinct().count()
    assert(salts > 1, "identical rows all convoyed on one salt")
  }

  test("salted two-phase agg equals direct agg on a skewed key") {
    val s = spark; import s.implicits._
    // 10k rows on ONE key + scattered tail: worst-case key skew
    val skewed = ((1 to 10000).map(_ => ("hot", 1L)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val direct = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), saltFactor = 16,
      partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      fin = Seq(sum("s").as("s"), sum("c").as("c")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted == direct)
  }
}
