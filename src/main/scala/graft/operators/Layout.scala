package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization: multi-dimensional (z-order) clustering for
  * data skipping — the OPTIMIZE ZORDER analog (Delta/Iceberg) for the
  * engine's parquet warehouse. A linear sort gives ONE column narrow per-file
  * min/max ranges; interleaving per-dimension equi-depth bucket bits onto the
  * Morton curve gives EVERY z-ordered column ranges ~|files|^(-1/k) of the
  * domain, so footer-stats pruning (and the warehouse's partition pruning)
  * cuts scans on any of the clustered columns, not just the leading one.
  */
object Layout {

  /** Cluster `df` on the z-curve over `cols` (numeric): per-column equi-depth
    * boundaries from `approxQuantile` (a driver-side stats action of the
    * index-build class, like IVF training — `relErr` bounds its cost),
    * codegen'd bucket + bit-interleave expressions, then ONE range exchange
    * on the z-value with an in-partition sort. Downstream writers cut files
    * from the sorted stream; `outPartitions` sizes them (defaults to the
    * session's shuffle parallelism).
    *
    * Equi-depth (not equi-width) bucketing is what makes this robust at
    * 100 TB: skewed columns still spread across the full bucket range, so no
    * curve region collapses onto one file. Nulls bucket to the curve origin.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bitsPerDim: Int = 8,
               outPartitions: Option[Int] = None,
               relErr: Double = 0.001): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(cols.size * bitsPerDim <= 63,
      s"${cols.size} dims × $bitsPerDim bits exceeds 63")
    val buckets = 1 << bitsPerDim
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = cols.foldLeft(df)((d, c) =>
      d.withColumn(s"__zd_$c", col(c).cast("double")))
    val bounds = casted.stat.approxQuantile(
      cols.map(c => s"__zd_$c").toArray, probs, relErr)
    val bucketCols: Seq[Column] = cols.zip(bounds).map { case (c, b) =>
      val sorted = b.distinct.sorted
      // constant column → a single boundary still yields a total assignment
      graft.functions.exprs.range_bucket(col(s"__zd_$c"),
        if (sorted.nonEmpty) sorted else Array(0.0))
    }
    val z = graft.functions.exprs.z_value(array(bucketCols: _*), bitsPerDim)
    val n = outPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    casted
      .withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((cols.map(c => s"__zd_$c") :+ "__z"): _*)
  }

  /** MATERIALIZE a training shard layout: join the payload corpus to a
    * (id, shard, pos) address relation ([[graft.functions.CorpusFunctions
    * .epochShards]] / `.curriculumShards` / `.lengthGroupedBatches`-style)
    * and write `outDir/shard=<s>/` parquet whose ROW ORDER inside each
    * shard directory is exactly ascending `pos` — so a training worker
    * reads its shard as a plain parquet scan, in layout order, with no
    * sort of its own (parquet preserves row order; readers that scan a
    * shard's files in name order see the layout order because each shard
    * lands in one task's sorted stream).
    *
    * Scale: ONE shuffle keyed on shard (the address relation is narrow;
    * the payload joins by id), in-partition (shard, pos) sort, and a
    * partitioned write — the same bill as any partitioned export. Shard
    * count should be ≳ cluster parallelism (the layout builders' own
    * guidance); each shard must fit a task's spill budget, which is what
    * the shard-count knob controls. */
  def writeOrderedShards(docs: DataFrame, layout: DataFrame, idCol: String,
                         outDir: String): Unit = {
    // duplicate payload ids would each take EVERY address the layout
    // assigned that id — duplicated pos values inside a shard, silently
    // corrupted read order. Refuse loudly (the rebalanceToMixture
    // convention); one aggregate pass, the same cost class as the export
    // scan itself.
    val dup = docs.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count()
    require(dup == 0L,
      s"writeOrderedShards: duplicate '$idCol' values in the corpus — " +
        "every id must map to ONE payload row (dedup before exporting)")
    // the layout must be a FUNCTION too: a duplicate id there silently fans
    // the payload row out to every address it was assigned, and a colliding
    // (shard, pos) address makes the in-shard read order ambiguous — the
    // exact guarantee this operator exists to provide. Both checks ride one
    // aggregate pass over the (narrow) address relation.
    val badLayout = layout.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count()
    require(badLayout == 0L,
      s"writeOrderedShards: duplicate '$idCol' values in the layout — " +
        "every id must have ONE (shard, pos) address")
    val dupAddr = layout.groupBy(col("shard"), col("pos"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupAddr == 0L,
      "writeOrderedShards: colliding (shard, pos) addresses in the layout — " +
        "in-shard read order would be ambiguous")
    val joined = docs.join(layout.select(col(idCol), col("shard"),
      col("pos")), Seq(idCol))
    // tolerate int or long shard columns (the doc invites any
    // (id, shard, pos)-shaped layout, not just the repo's builders).
    // Partition count = DISTINCT shards, not max+1: order correctness
    // only needs the count to cover the shards, and sparse/large/negative
    // shard ids (foreign layouts) must not allocate millions of empty
    // partitions or make repartition throw on a non-positive count.
    val nShards = math.max(1L, math.min(
      layout.select(countDistinct(col("shard"))).head().getLong(0),
      65536L)).toInt
    joined
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
