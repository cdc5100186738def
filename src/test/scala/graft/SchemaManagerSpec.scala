package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.sources._
import graft.watermark.WatermarkStore

/** Schema cache TTL, evolution policies on the load path, column-mapping
  * persistence (S7 + P5). */
class SchemaManagerSpec extends AnyFunSuite with SparkTestBase {

  test("schema cache honors TTL and invalidation") {
    var now = 0L
    var fetches = 0
    val cache = new SchemaCache(ttlMs = 100, clock = () => now)
    def schema = { fetches += 1; StructType(Seq(StructField("a", LongType))) }
    cache.get("t")(schema); cache.get("t")(schema)
    assert(fetches == 1)              // cached
    now = 150
    cache.get("t")(schema)
    assert(fetches == 2)              // expired → refetched
    cache.invalidate("t")
    cache.get("t")(schema)
    assert(fetches == 3)              // invalidated → refetched
  }

  private def rig(policy: EvolutionPolicy) = {
    val root = tmpDir("schema")
    val store = new WatermarkStore(s"$root/wm")
    (new Extractor(store, s"$root/staging"),
      new Loader(store, s"$root/warehouse", evolutionPolicy = policy), root)
  }

  private val id = TableId("t", "fx", "docs")
  private val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("id"))

  test("additive evolution: new column loads; old rows read NULL") {
    val s = spark; import s.implicits._
    val (extractor, loader, _) = rig(EvolutionPolicy.AdditiveOnly)
    extractor.extract(spark, id, Seq((1L, "a")).toDF("id", "v"), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    // second session adds a column
    extractor.extract(spark, id, Seq((2L, "b", 9.5)).toDF("id", "v", "score"), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val out = loader.readTarget(spark, id).get
    assert(out.columns.toSet == Set("id", "v", "score"))
    assert(out.filter(col("id") === 1 && col("score").isNull).count() == 1)
    assert(out.filter(col("id") === 2 && col("score") === 9.5).count() == 1)
  }

  test("additive policy rejects a dropped column") {
    val s = spark; import s.implicits._
    val (extractor, loader, _) = rig(EvolutionPolicy.AdditiveOnly)
    extractor.extract(spark, id, Seq((1L, "a")).toDF("id", "v"), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    extractor.extract(spark, id, Seq(Tuple1(2L)).toDF("id"), cfg) // v removed
    intercept[SchemaDriftException] {
      loader.load(spark, id, extractor.stagingDir(id), cfg)
    }
  }

  test("align-to-target policy forces staged rows into the target shape") {
    val s = spark; import s.implicits._
    val (extractor, loader, _) = rig(EvolutionPolicy.AlignToTarget)
    extractor.extract(spark, id, Seq((1L, "a")).toDF("id", "v"), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    extractor.extract(spark, id,
      Seq((2L, "b", "extra")).toDF("id", "v", "junk"), cfg)
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val out = loader.readTarget(spark, id).get
    assert(out.columns.toSet == Set("id", "v"))   // junk dropped
    assert(out.count() == 2)
  }

  test("column-mapping persistence round-trips and applies") {
    val dir = tmpDir("colmap")
    val conf = spark.sparkContext.hadoopConfiguration
    val mapping = Map("2ND_REF" -> "col_2nd_ref", "MixedCase" -> "mixedcase")
    ColumnMapStore.save(dir, mapping, conf)
    assert(ColumnMapStore.load(dir, conf) == mapping)
    // JSON metacharacters in names must round-trip exactly (a trailing
    // backslash or embedded quote broke the old hand-rolled writer)
    val evil = Map("""col\""" -> "col_bs", """we"ird""" -> """quo"ted""")
    val dir2 = tmpDir("colmap_evil")
    ColumnMapStore.save(dir2, evil, conf)
    assert(ColumnMapStore.load(dir2, conf) == evil)
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("2ND_REF", "MixedCase")
    val renamed = ColumnMapStore.apply(df, mapping)
    assert(renamed.columns.toSeq == Seq("col_2nd_ref", "mixedcase"))
  }

  test("loader normalizeColumns persists the mapping beside the target") {
    val s = spark; import s.implicits._
    val root = tmpDir("norm")
    val store = new WatermarkStore(s"$root/wm")
    val extractor = new Extractor(store, s"$root/staging")
    val loader = new Loader(store, s"$root/warehouse", normalizeColumns = true)
    extractor.extract(spark, id,
      Seq((1L, "a")).toDF("ID", "2Val"), cfg.copy(idColumn = Some("ID")))
    loader.load(spark, id, extractor.stagingDir(id), cfg)
    val out = loader.readTarget(spark, id).get
    assert(out.columns.toSet == Set("id", "col_2val"))
    val saved = ColumnMapStore.load(loader.targetPath(id),
      spark.sparkContext.hadoopConfiguration)
    assert(saved == Map("ID" -> "id", "2Val" -> "col_2val"))
  }
}
