package graft.queries

import org.apache.spark.sql.functions._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.watermark.WatermarkStore

/** End-to-end pipeline query: Extractor → staged parquet → Loader → warehouse
  * read-back, checked against the source table itself (the driver's DuckDB
  * oracle never sees the intermediate hops, so a pass proves the full
  * extract→stage→load path preserves every row). */
object EtlQueries {

  val all: Seq[Q] = Seq(
    Q("q_e2e_extract_load",
      (s, dir) => {
        val scratch = Tables.scratchDir("e2e")
        val store = new WatermarkStore(s"$scratch/wm")
        val extractor = new Extractor(store, s"$scratch/staging")
        val loader = new Loader(store, s"$scratch/warehouse")
        val id = TableId("bench", "fixtures", "events")
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
        val events = Tables.df(s, dir, "events")
        extractor.extract(s, id, events, cfg)
        loader.load(s, id, extractor.stagingDir(id), cfg)
        loader.readTarget(s, id).get
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), graft.util.TimeCols.epochUs("ts").as("ts_us"))
      },
      Some("""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
             |FROM events""".stripMargin)),

    // ------------------------- targeted deletion (right-to-be-forgotten)
    // Two-phase probe of the takedown path: load the first half, tombstone
    // every 5th event id (including ids that have NOT arrived yet), load
    // the second half — the first half is deleted by the crash-safe
    // rewrite, the second half's tombstoned arrivals are RE-SUPPRESSED by
    // load's tombstone gate. Final table = events minus every 5th id.
    Q("q_e2e_delete_keys",
      (s, dir) => {
        val scratch = Tables.scratchDir("forget")
        val store = new WatermarkStore(s"$scratch/wm")
        val extractor = new Extractor(store, s"$scratch/staging")
        val loader = new Loader(store, s"$scratch/warehouse")
        val id = TableId("bench", "fixtures", "events")
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
        val events = Tables.df(s, dir, "events")
        extractor.extract(s, id, events.filter(col("event_id") <= 500), cfg)
        loader.load(s, id, extractor.stagingDir(id), cfg)
        loader.deleteKeys(s, id,
          events.filter(col("event_id") % 5 === 0)
            .select(col("event_id")))
        extractor.extract(s, id, events, cfg) // cursor resumes past 500
        loader.load(s, id, extractor.stagingDir(id), cfg)
        loader.readTarget(s, id).get
          .select(col("event_id"), col("user_id"), col("event_type"))
      },
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE event_id % 5 <> 0""".stripMargin)),

    // ------------------------------------- z-order layout optimization
    // Cluster lineitem on the (l_partkey, l_suppkey) Morton curve, write,
    // read back: the oracle proves the rewrite is content-exact (row set
    // unchanged); the per-file min/max narrowing claim — every dimension,
    // not just the leading one — is measured from real parquet footers in
    // LayoutSpec.
    Q("q_zorder_layout",
      (s, dir) => {
        val scratch = Tables.scratchDir("zorder")
        graft.operators.Layout.zorderBy(
          Tables.df(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey")),
          Seq("l_partkey", "l_suppkey"), bitsPerDim = 8,
          outPartitions = Some(8))
          .write.parquet(s"$scratch/zorder")
        s.read.parquet(s"$scratch/zorder")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
             |FROM lineitem""".stripMargin)),

    // ------------------------------------------- atomic merge (dir swap)
    // Bootstrap the warehouse with orders<=1000, then mergeInto the >=500
    // increment (status forced 'U'); the swapped-in table must equal the
    // plain SQL merge semantics.
    Q("q_e2e_merge_swap",
      (s, dir) => {
        val scratch = Tables.scratchDir("mswap")
        val store = new WatermarkStore(s"$scratch/wm")
        val loader = new Loader(store, s"$scratch/warehouse")
        val id = TableId("bench", "fixtures", "orders")
        val orders = Tables.df(s, dir, "orders")
        loader.mergeInto(s, id, orders.filter(col("o_orderkey") <= 1000),
          Seq("o_orderkey"))
        loader.mergeInto(s, id,
          orders.filter(col("o_orderkey") >= 500)
            .withColumn("o_orderstatus", lit("U")),
          Seq("o_orderkey"))
        loader.readTarget(s, id).get
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
      },
      Some("""WITH target AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
             |staged AS (SELECT * REPLACE ('U' AS o_orderstatus)
             |  FROM orders WHERE o_orderkey >= 500)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
             |  SELECT * FROM target
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
             |  UNION ALL SELECT * FROM staged)""".stripMargin)),

    // --------------------------------- bucketed merge (bucket-targeted swap)
    // Same merge semantics as q_e2e_merge_swap through the OTHER physical
    // path: the bucket-partitioned layout where an increment rewrites only
    // the buckets containing its keys. One oracle proves both paths agree.
    Q("q_e2e_merge_bucketed",
      (s, dir) => {
        val scratch = Tables.scratchDir("bmswap")
        val store = new WatermarkStore(s"$scratch/wm")
        val loader = new Loader(store, s"$scratch/warehouse")
        val id = TableId("bench", "fixtures", "orders")
        val orders = Tables.df(s, dir, "orders")
        loader.mergeIntoBucketed(s, id,
          orders.filter(col("o_orderkey") <= 1000), Seq("o_orderkey"), 8)
        loader.mergeIntoBucketed(s, id,
          orders.filter(col("o_orderkey") >= 500)
            .withColumn("o_orderstatus", lit("U")),
          Seq("o_orderkey"), 8)
        loader.readTarget(s, id).get
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
      },
      Some("""WITH target AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
             |staged AS (SELECT * REPLACE ('U' AS o_orderstatus)
             |  FROM orders WHERE o_orderkey >= 500)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
             |  SELECT * FROM target
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
             |  UNION ALL SELECT * FROM staged)""".stripMargin))
  )
}
