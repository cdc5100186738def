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
