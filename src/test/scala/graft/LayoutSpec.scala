package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.exprs.{range_bucket, z_value}
import graft.functions.{RangeBucket, ZValue}
import graft.operators.Layout

/** Z-order layout: bucket/interleave expression math, and the actual
  * data-skipping claim — per-file footer min/max ranges narrow in EVERY
  * z-ordered dimension, where a linear sort narrows only the leading one. */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private def withCodegen[T](enabled: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try f finally spark.conf.set(key, old)
  }

  test("range_bucket: boundary semantics, null → 0, codegen == interpreted") {
    val s = spark
    import s.implicits._
    val df = Seq(Option(5.0), Option(10.0), Option(15.0), Option(30.0),
      Option(35.0), None).toDF("v")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(range_bucket(col("v"), Array(10.0, 20.0, 30.0)))
        .collect().map(_.getInt(0)).toSeq
    }
    val cg = run(true)
    assert(cg == run(false))
    // bucket = count of boundaries <= v
    assert(cg == Seq(0, 1, 1, 3, 3, 0))
    assert(RangeBucket.bucket(Array(10.0, 20.0, 30.0), 20.0) == 2)
  }

  test("z_value: known interleavings, codegen == interpreted") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1, 0), 2), (Seq(2, 3), 2), (Seq(0, 0), 2))
      .toDF("b", "ignore")
    def run(codegen: Boolean) = withCodegen(codegen) {
      df.select(z_value(col("b"), 2)).collect().map(_.getLong(0)).toSeq
    }
    val cg = run(true)
    assert(cg == run(false))
    // [1,0]: d0 bit0 → out bit0.     [2,3]: d0 bit1 → out bit2 (4);
    // d1 bits 0,1 → out bits 1,3 (2+8) → 14.
    assert(cg == Seq(1L, 14L, 0L))
    // z-order property: interleaved value of a point dominated in BOTH dims
    // is smaller (the curve respects the partial order)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def z(a: Int, b: Int) =
      ZValue.interleave(new GenericArrayData(Array(a, b)), 8)
    assert(z(3, 4) < z(5, 6))
    assert(z(0, 0) == 0L)
  }

  test("zorderBy: every dimension's per-file span narrows; content preserved") {
    val s = spark
    import s.implicits._
    // deterministic uniform grid: 16384 points over (0..1023)²
    val rnd = new scala.util.Random(7)
    val pts = (1 to 16384).map(i =>
      (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = pts.toDF("id", "x", "y")

    def spans(dir: String, column: String): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try {
            val stats = reader.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala
                .find(_.getPath.toDotString == column).map(_.getStatistics))
            val mins = stats.map(_.genericGetMin
              .asInstanceOf[java.lang.Long].longValue())
            val maxs = stats.map(_.genericGetMax
              .asInstanceOf[java.lang.Long].longValue())
            (mins.min, maxs.max)
          } finally reader.close()
        }
    }
    def meanSpan(dir: String, column: String): Double = {
      val sp = spans(dir, column)
      assert(sp.size >= 8, s"expected >=8 files, got ${sp.size}")
      sp.map { case (lo, hi) => (hi - lo).toDouble }.sum / sp.size
    }

    val zdir = tmpDir("zorder") + "/z"
    Layout.zorderBy(df, Seq("x", "y"), bitsPerDim = 8,
      outPartitions = Some(16))
      .write.parquet(zdir)
    val ldir = tmpDir("zorder") + "/linear"
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.parquet(ldir)

    // linear: trailing dim spans ~the whole domain per file
    assert(meanSpan(ldir, "y") > 900.0)
    // z-order: BOTH dims narrow (16 files over a 2-D curve → ~quarter domain)
    assert(meanSpan(zdir, "x") < 512.0, s"x span ${meanSpan(zdir, "x")}")
    assert(meanSpan(zdir, "y") < 512.0, s"y span ${meanSpan(zdir, "y")}")

    // content preserved exactly
    val back = spark.read.parquet(zdir)
    assert(back.count() == df.count())
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("writeOrderedShards: each shard dir reads back in exact pos order") {
    val s = spark; import s.implicits._
    val docs = (1L to 500L).map(i => (i, s"payload_$i", i * 7 % 101))
      .toDF("id", "text", "score")
    val layout = graft.functions.CorpusFunctions.curriculumShards(
      docs, "id", "score", shards = 6)
    val out = tmpDir("ordered_shards") + "/shards"
    graft.operators.Layout.writeOrderedShards(docs, layout, "id", out)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == 6, s"expected 6 shard dirs, got ${dirs.length}")
    val addr = layout.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    var total = 0L
    dirs.foreach { d =>
      val shard = d.getName.stripPrefix("shard=").toInt
      // files in name order, rows in file order = the layout order
      val rows = d.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
        .flatMap(f => spark.read.parquet(f.getAbsolutePath)
          .select("id", "pos").collect())
        .map(r => (r.getLong(0), r.getLong(1)))
      total += rows.length
      assert(rows.map(_._2).toSeq == (1L to rows.length),
        s"shard $shard rows not in contiguous pos order")
      rows.foreach { case (id, pos) =>
        assert(addr(id) == ((shard, pos)), s"doc $id misplaced") }
    }
    assert(total == 500L)
    // duplicate payload ids would take every address assigned to the id
    // (duplicated pos inside a shard, corrupted read order): refuse loudly
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.writeOrderedShards(
        docs.unionAll(docs.limit(1)), layout, "id",
        tmpDir("ordered_dup") + "/shards")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // a duplicate id in the LAYOUT silently fans the payload row out to
    // every address it was assigned — refuse just as loudly
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Layout.writeOrderedShards(
        docs, layout.unionAll(layout.limit(1)
          .selectExpr("id", "shard", "pos + 1000 AS pos")), "id",
        tmpDir("ordered_duplayout") + "/shards")
    }
    assert(e2.getMessage.contains("layout"), e2.getMessage)
    // colliding (shard, pos) addresses make in-shard read order ambiguous
    val e3 = intercept[IllegalArgumentException] {
      val l1 = layout.limit(1).selectExpr("id + 10000 AS id", "shard", "pos")
      graft.operators.Layout.writeOrderedShards(
        docs.unionAll(docs.limit(1).selectExpr(
          "id + 10000 AS id", "text", "score")),
        layout.unionAll(l1), "id",
        tmpDir("ordered_dupaddr") + "/shards")
    }
    assert(e3.getMessage.contains("shard, pos"), e3.getMessage)
  }

  test("Scratch.fileCount: smooth ramp, no cliff at 256 KB") {
    // SQLConf.get needs an active session for defaultSizeInBytes
    val s = spark; assert(s != null)
    import graft.util.Scratch.fileCount
    val cores = 32
    def f(bytes: Long): Int = fileCount(BigInt(bytes), cores).get
    // tiny tier: 4 files
    assert(f(10L << 10) == 4)
    assert(f(255L << 10) == 4)
    // the former cliff: just-over-256 KB must STAY at the 4-file floor,
    // not jump to cores-many ~8 KB files (the measured 0.9 → 3.6 s
    // band-pipeline regression shape)
    assert(f(257L << 10) == 4)
    assert(f(300L << 10) == 4)
    assert(f(1L << 20) == 4)
    // ramp: ~256 KB/file up to the session's cores
    assert(f(2L << 20) == 8)
    assert(f(4L << 20) == 16)
    assert(f(8L << 20) == 32)
    // flat at cores through the mid band up to the cutoff
    assert(f(16L << 20) == 32)
    assert(f(24L << 20) == 32)
    // monotone across the whole engaged range
    val samples = (1 to 96).map(i => f(i.toLong << 18))
    assert(samples.zip(samples.tail).forall { case (a, b) => a <= b })
    // past the cutoff: the compaction exchange would cost more than the
    // file sizing buys — keep the producer's partitioning
    assert(fileCount(BigInt(25L << 20), cores).isEmpty)
    assert(fileCount(BigInt(128L << 20), cores).isEmpty)
    assert(fileCount(BigInt(Long.MaxValue), cores).isEmpty)
  }
}
