package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.watermark.WatermarkStore

/** Atomic merge-into-warehouse (directory swap) and datetime-layout
  * partition pruning. */
class MergeSwapSpec extends AnyFunSuite with SparkTestBase {

  private val id = TableId("t", "fx", "orders")
  private val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("o_orderkey"))
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("mergeInto upserts by key and swaps atomically") {
    val root = tmpDir("merge")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    extractor.extract(spark, id, orders.filter(col("o_orderkey") <= 1000), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val before = loader.readTarget(spark, id).get.count()

    // staged increment: keys 500.. updated (status U) + genuinely new keys
    val staged = orders.filter(col("o_orderkey") >= 500)
      .withColumn("o_orderstatus", lit("U"))
    val rows = loader.mergeInto(spark, id, staged, Seq("o_orderkey"))
    val after = loader.readTarget(spark, id).get
    assert(rows == after.count())
    // every key >= 500 now has status U; keys < 500 untouched
    assert(after.filter(col("o_orderkey") >= 500 && col("o_orderstatus") =!= "U")
      .count() == 0)
    assert(after.filter(col("o_orderkey") < 500 && col("o_orderstatus") === "U")
      .count() == 0)
    assert(after.count() ==
      orders.filter(col("o_orderkey") <= 1000).count() +
        orders.filter(col("o_orderkey") > 1000 && col("o_orderkey") >= 500).count())
    assert(before <= after.count())
    // no leftover swap directories
    val fs = new java.io.File(s"$root/warehouse")
    assert(!fs.listFiles().exists(f => f.getName.contains("__new") ||
      f.getName.contains("__old")))
  }

  test("mergeInto on an empty target bootstraps it") {
    val root = tmpDir("merge2")
    val store = new WatermarkStore(s"$root/wm")
    val loader = new Loader(store, s"$root/warehouse")
    val rows = loader.mergeInto(spark, id,
      orders.filter(col("o_orderkey") <= 100), Seq("o_orderkey"))
    assert(rows == loader.readTarget(spark, id).get.count())
    assert(rows == orders.filter(col("o_orderkey") <= 100).count())
  }

  test("bucketed load: co-located join has NO shuffle exchange") {
    val root = tmpDir("bucketed")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse")
    val custId = TableId("t", "fx", "customer")
    extractor.extract(spark, id, orders, cfg)
    extractor.extract(spark, custId,
      spark.read.parquet(s"$sfDir/customer.parquet"),
      CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("c_custkey")))
    // both tables bucketed 8 ways on the JOIN key = Redshift DISTKEY co-location
    val tOrders = loader.loadBucketed(spark, id,
      extractor.stagingDir(id), distKey = "o_custkey", buckets = 8)
    val tCust = loader.loadBucketed(spark, custId,
      extractor.stagingDir(custId), distKey = "c_custkey", buckets = 8)
    val joined = spark.table(tOrders)
      .join(spark.table(tCust),
        col("o_custkey") === col("c_custkey"))
    // correctness
    assert(joined.count() ==
      orders.join(spark.read.parquet(s"$sfDir/customer.parquet"),
        col("o_custkey") === col("c_custkey")).count())
    // the whole point: no Exchange anywhere in the physical join plan
    val hasExchange = joined.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    assert(!hasExchange, "bucketed join still shuffled:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))
  }

  test("datetime layout: year/month/day dirs exist and prune the scan") {
    val root = tmpDir("dtpart")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging",
      PartitionStrategy.Datetime)
    val hybridCfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("o_orderdate"), idColumn = Some("o_orderkey"))
    extractor.extract(spark, id, orders, hybridCfg)
    val staged = spark.read.parquet(extractor.stagingDir(id) + "/session=*")
    assert(staged.columns.contains("year") && staged.columns.contains("month"))
    val all = staged.inputFiles.length
    val pruned = staged.filter(col("year") === 1997)
    assert(pruned.count() ==
      orders.filter(year(col("o_orderdate")) === 1997).count())
    // partition pruning: the filtered plan reads strictly fewer files
    val prunedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
            .map(_.files.size).sum
      }).sum
    assert(prunedFiles < all, s"pruned=$prunedFiles all=$all")
  }
}
