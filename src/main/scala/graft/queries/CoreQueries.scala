package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.model._
import graft.operators.Relational
import graft.util.TimeCols

/** One driver-contract query: Spark plan + optional DuckDB oracle SQL.
  * Column names MUST match between the two (the driver sorts columns by name
  * and hash-compares values). */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** Comparator-alignment helpers shared by every query file: the canonical
  * ways to emit values that hash-match the DuckDB oracle. ONE definition —
  * if the canonicalization ever changes, every query follows. */
private[queries] object Align {
  def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Decimal cast used before floating sums so aggregation is exact and
    * order-independent — matches `CAST(x AS DECIMAL(18,p))` in the oracles. */
  def dec(c: Column, scale: Int): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, scale))

  /** Exact decimal SUM, emitted as DOUBLE. The aggregation stays decimal
    * (order-independent, exact); only the FINAL value is converted, so both
    * Spark and the DuckDB oracle hand the comparator the identical float64
    * (Spark fixed-scale Decimals vs DuckDB float64 otherwise canonicalize
    * differently on trailing fractional zeros — CORRECTNESS_r02 hash flags). */
  def dsum(c: Column, scale: Int): Column = sum(dec(c, scale)).cast("double")

  /** The fixture image-pixel → dHash replay (img/lum/bits/hs CTE chain),
    * shared by every oracle that re-derives perceptual hashes from
    * [[graft.multimodal.Multimodal.MediaFixtures]]' closed-form pixels
    * (q_mm_image_phash, q_mm_image_neardup, q_crossmodal_dedup). ONE
    * definition — if the fixture pixel formula changes, every oracle
    * follows. Emitted WITHOUT a trailing comma; hosts interpolate it as
    * the head of their WITH list. */
  val imageDhashCtes: String =
    """img AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS d,
      |    4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |lum AS MATERIALIZED (SELECT d, w, h, p,
      |    (d*31 + p*3) % 256 + (d*31 + p*3 + 1) % 256
      |      + (d*31 + p*3 + 2) % 256 AS l
      |  FROM img, generate_series(0, 47) t(p) WHERE p < w*h),
      |bits AS MATERIALIZED (SELECT a.d, a.w, a.h,
      |    ROW_NUMBER() OVER (PARTITION BY a.d ORDER BY a.p) - 1 AS k,
      |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
      |  FROM lum a JOIN lum b ON b.d = a.d AND b.p = a.p + 1
      |  WHERE (a.p % a.w) < a.w - 1),
      |hs AS MATERIALIZED (SELECT d, w, h,
      |    CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS dhash
      |  FROM bits GROUP BY d, w, h)""".stripMargin
}

/** Core-surface queries: every SQL-expressible operator from SURVEY §2
  * (CDC scans S1-S5, projections P1/P2/P5/P6, aggregations A1-A6, joins
  * J1-J3, windows W1/W2, sorts O1-O4, set ops, scalar functions). */
object CoreQueries {

  import Align.{dec, dsum, fmt}

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------- S1
    Q("q_cdc_timestamp_scan",
      (s, dir) => {
        val events = Tables.df(s, dir, "events")
        // watermark 2024-01-15T00:00:00 (UTC wall time); strictly-greater scan
        // (TimestampOnlyStrategy semantics). The NTZ literal predicate pushes
        // into the parquet scan; emit epoch-µs for the oracle compare.
        events.filter(col("ts") > expr("TIMESTAMP_NTZ '2024-01-15 00:00:00'"))
          .select(col("event_id"), TimeCols.epochUs("ts").as("ts_us"), col("user_id"),
            col("event_type"), col("value"))
      },
      Some("""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
             |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'""".stripMargin)),

    // ----------------------------------------------------------------- S2
    Q("q_cdc_hybrid_scan",
      (s, dir) => {
        val cfg = CdcConfig(CdcStrategyKind.Hybrid,
          timestampColumn = Some("o_orderdate"), idColumn = Some("o_orderkey"))
        val spec = CdcStrategy(cfg)
          .scanSpec(Cursor(Some("1997-06-01 00:00:00"), Some(750L)))
        spec(Tables.df(s, dir, "orders"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), fmt(col("o_orderdate")).as("o_orderdate_s"),
            col("o_orderpriority"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
             |  o_orderpriority
             |FROM orders
             |WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
             |   OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey > 750)"""
        .stripMargin)),

    // ----------------------------------------------------------------- S3
    Q("q_cdc_id_scan",
      (s, dir) => {
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
        val spec = CdcStrategy(cfg).scanSpec(Cursor(lastId = Some(500L)))
        spec(Tables.df(s, dir, "events"))
          .select(col("event_id"), col("user_id"), col("event_type"))
      },
      Some("SELECT event_id, user_id, event_type FROM events WHERE event_id > 500")),

    // ------------------------------------------------------ S3 + ceiling
    Q("q_cdc_ceiling_scan",
      (s, dir) => {
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
        val spec = CdcStrategy(cfg).scanSpec(Cursor(lastId = Some(200L)))
        // MAX(id) ceiling snapshot (infinite-sync guard, row_based.py:278-292)
        spec(Tables.df(s, dir, "events")).filter(col("event_id") <= lit(800L))
          .select(col("event_id"), col("event_type"), col("value"))
      },
      Some("SELECT event_id, event_type, value FROM events WHERE event_id > 200 AND event_id <= 800")),

    // ----------------------------------------------------------------- S4
    Q("q_cdc_full_replace",
      (s, dir) => {
        val cfg = CdcConfig(CdcStrategyKind.FullSync)
        CdcStrategy(cfg).scanSpec(Cursor())(Tables.df(s, dir, "region"))
      },
      Some("SELECT r_regionkey, r_name FROM region")),

    // ----------------------------------------------------------------- S5
    Q("q_cdc_custom_sql",
      (s, dir) => {
        Tables.df(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        val cfg = CdcConfig(CdcStrategyKind.CustomSql, customSql = Some(
          """SELECT l_returnflag, COUNT(*) AS cnt,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            |FROM {table_name} GROUP BY l_returnflag""".stripMargin))
        CustomSqlStrategy(cfg).run(s, "lineitem", Cursor())
      },
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // --------------------------------------------------------- P6 additional_where
    Q("q_filter_additional_where",
      (s, dir) => {
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("o_orderkey"),
          additionalWhere = Some("o_orderstatus = 'F' AND o_totalprice > 100000"))
        CdcStrategy(cfg).scanSpec(Cursor(lastId = Some(0L)))(Tables.df(s, dir, "orders"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |WHERE o_orderkey > 0 AND o_orderstatus = 'F' AND o_totalprice > 100000"""
        .stripMargin)),

    // ----------------------------------------------------------------- A1
    Q("q_agg_window_count",
      (s, dir) =>
        Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") > lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") <= lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
          .agg(count(lit(1)).as("cnt")),
      Some("""SELECT COUNT(*) AS cnt FROM orders
             |WHERE o_orderdate > TIMESTAMP '1997-01-01 00:00:00'
             |  AND o_orderdate <= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin)),

    // ----------------------------------------------------------------- A2
    Q("q_agg_max_id",
      (s, dir) => Tables.df(s, dir, "orders")
        .agg(max(col("o_orderkey")).as("max_id"), min(col("o_orderkey")).as("min_id")),
      Some("SELECT MAX(o_orderkey) AS max_id, MIN(o_orderkey) AS min_id FROM orders")),

    // --------------------------------------------------------------- A3/W2
    Q("q_agg_hourly_density",
      (s, dir) => Tables.df(s, dir, "events")
        .groupBy(expr(s"${TimeCols.epochUsSql("ts")} DIV 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("uniq_users")),
      Some("""SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
             |  COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uniq_users
             |FROM events GROUP BY 1""".stripMargin)),

    // ----------------------------------------------------------------- A4
    Q("q_agg_parity_stats",
      (s, dir) => {
        val st = Relational.parityStats(Tables.df(s, dir, "orders"),
          "o_orderkey", "o_orderdate")
        st.select(col("row_count"), col("distinct_keys"), col("min_key"),
          col("max_key"), fmt(col("min_ts")).as("min_ts_s"),
          fmt(col("max_ts")).as("max_ts_s"))
      },
      Some("""SELECT COUNT(*) AS row_count, COUNT(DISTINCT o_orderkey) AS distinct_keys,
             |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             |  strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_ts_s,
             |  strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts_s
             |FROM orders""".stripMargin)),

    // ----------------------------------------------------------------- A5
    Q("q_agg_status_summary",
      (s, dir) => Relational.latestStatusSummary(Tables.df(s, dir, "orders"),
        key = "o_custkey", statusCol = "o_orderstatus",
        tsCol = "o_orderdate", idCol = "o_orderkey"),
      Some("""WITH latest AS (
             |  SELECT * FROM (
             |    SELECT o_orderstatus, ROW_NUMBER() OVER (
             |      PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |    FROM orders) WHERE rn = 1)
             |SELECT o_orderstatus, COUNT(*) AS cnt,
             |  COUNT(*) * 100.0 / (SELECT COUNT(*) FROM latest) AS share_pct
             |FROM latest GROUP BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------- A6
    Q("q_agg_null_stats",
      (s, dir) => {
        val o = Tables.df(s, dir, "orders")
        o.agg(
          (count(lit(1)) - count(col("o_custkey"))).as("o_custkey_nulls"),
          (count(lit(1)) - count(col("o_orderstatus"))).as("o_orderstatus_nulls"),
          (count(lit(1)) - count(col("o_orderdate"))).as("o_orderdate_nulls"))
      },
      Some("""SELECT COUNT(*) - COUNT(o_custkey) AS o_custkey_nulls,
             |  COUNT(*) - COUNT(o_orderstatus) AS o_orderstatus_nulls,
             |  COUNT(*) - COUNT(o_orderdate) AS o_orderdate_nulls FROM orders"""
        .stripMargin)),

    // --------------------------------------------- TPC-H Q1-style pricing agg
    Q("q1_pricing_summary",
      (s, dir) => Tables.df(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------- star join (broadcast)
    Q("q_star_join_revenue",
      (s, dir) => {
        val li = Tables.df(s, dir, "lineitem")
        val o = Tables.df(s, dir, "orders")
        val c = Tables.df(s, dir, "customer")
        val n = Tables.df(s, dir, "nation")
        val r = Tables.df(s, dir, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // ------------------------------------------- TPC-H Q3-style top orders
    Q("q3_shipping_priority",
      (s, dir) => {
        val c = Tables.df(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1995-03-15 00:00:00").cast("timestamp_ntz"))
        val l = Tables.df(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1995-03-15 00:00:00").cast("timestamp_ntz"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), fmt(col("o_orderdate")).as("o_orderdate_s"))
          .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
          // order on the exact decimal, emit double (comparator alignment)
          .withColumn("revenue", col("revenue").cast("double"))
      },
      Some("""SELECT l_orderkey, o_orderdate_s, CAST(revenue AS DOUBLE) AS revenue
             |FROM (
             |  SELECT l_orderkey,
             |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
             |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS revenue
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  WHERE c_mktsegment = 'BUILDING'
             |    AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
             |    AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
             |  GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10)"""
        .stripMargin)),

    // ------------------------------------ TPC-H Q4-style order priority EXISTS
    Q("q4_order_priority",
      (s, dir) => {
        val o = Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        // fixture lineitem has no commit/receipt dates; the EXISTS predicate
        // becomes "has a returned line" (l_returnflag = 'R')
        val l = Tables.df(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority""".stripMargin)),

    // ------------------------- TPC-H Q12-style conditional priority buckets
    // (fixture lineitem has no shipmode/commit/receipt dates; the bucket
    // dimension becomes l_linestatus over a one-year ship window)
    Q("q12_priority_buckets",
      (s, dir) => {
        val l = Tables.df(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        val o = Tables.df(s, dir, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_linestatus""".stripMargin)),

    // ---------------------------------------- TPC-H Q14-style promo revenue
    Q("q14_promo_revenue",
      (s, dir) => {
        val l = Tables.df(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-09-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
        // part is SF-proportional (not a bounded dim like nation/region):
        // no broadcast hint — the optimizer broadcasts while it fits and
        // falls back to a shuffle join at scales where it cannot
        val p = Tables.df(s, dir, "part")
        l.join(p, l("l_partkey") === p("p_partkey"))
          .agg(
            sum(when(col("p_type").startsWith("PROMO"),
              dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
              .otherwise(dec(lit(0.0), 4))).cast("double").as("promo_rev"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("total_rev"))
      },
      Some("""SELECT
             |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
             |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
             |    ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_rev,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin)),

    // ----------------------------------------------------- top-k (O1/O4)
    Q("q_topk_customers",
      (s, dir) => Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"), 2)).as("spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("spend").desc, col("o_custkey").asc)
        .limit(10)
        .withColumn("spend", col("spend").cast("double")),
      Some("""SELECT o_custkey, CAST(spend AS DOUBLE) AS spend, n_orders FROM (
             |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
             |    COUNT(*) AS n_orders
             |  FROM orders GROUP BY o_custkey
             |  ORDER BY spend DESC, o_custkey ASC LIMIT 10)""".stripMargin)),

    // ------------------------------------------------------- J3 anti join
    Q("q_join_anti",
      (s, dir) => {
        val c = Tables.df(s, dir, "customer")
        val o = Tables.df(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""
        .stripMargin)),

    // ------------------------------------------------------------ semi join
    Q("q_join_semi",
      (s, dir) => {
        val c = Tables.df(s, dir, "customer")
        val o = Tables.df(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment""".stripMargin)),

    // ----------------------------------------------------------- J2 merge
    Q("q_merge_upsert",
      (s, dir) => {
        val orders = Tables.df(s, dir, "orders")
        val target = orders.filter(col("o_orderkey") <= 1000)
        val staged = orders.filter(col("o_orderkey") >= 500)
          .withColumn("o_orderstatus", lit("U"))
        Relational.merge(target, staged, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), fmt(col("o_orderdate")).as("o_orderdate_s"))
      },
      Some("""WITH target AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
             |staged AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             |  o_totalprice, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey >= 500)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s
             |FROM (
             |  SELECT * FROM target
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
             |  UNION ALL SELECT * FROM staged)""".stripMargin)),

    // ----------------------------------------------------- J1/W1 dedup latest
    Q("q_dedup_latest",
      (s, dir) => Relational.dedupLatestByTs(Tables.df(s, dir, "orders"),
        keys = Seq("o_custkey"), tsCol = "o_orderdate", idCol = "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          fmt(col("o_orderdate")).as("o_orderdate_s")),
      Some("""SELECT o_custkey, o_orderkey, o_orderstatus,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s
             |FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) WHERE rn = 1""".stripMargin)),

    // ------------------------------------------------------- running window
    Q("q_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.df(s, dir, "orders")
          .withColumn("running_spend",
            sum(dec(col("o_totalprice"), 2)).over(w).cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
             |FROM orders""".stripMargin)),

    // ------------------------------------------------------------- set ops
    Q("q_union_chunks",
      (s, dir) => {
        val e = Tables.df(s, dir, "events")
        e.filter(col("event_id") <= 500).select(col("event_id"), col("event_type"))
          .unionByName(
            e.filter(col("event_id") > 500).select(col("event_id"), col("event_type")))
      },
      Some("""SELECT event_id, event_type FROM events WHERE event_id <= 500
             |UNION ALL
             |SELECT event_id, event_type FROM events WHERE event_id > 500"""
        .stripMargin)),

    Q("q_set_except",
      (s, dir) => {
        val e = Tables.df(s, dir, "events")
        e.select(col("user_id"))
          .except(e.filter(col("event_type") === "click").select(col("user_id")))
      },
      Some("""SELECT user_id FROM events
             |EXCEPT
             |SELECT user_id FROM events WHERE event_type = 'click'""".stripMargin)),

    // ------------------------------------------------------ scalar: datetime
    Q("q_scalar_datetime",
      (s, dir) => Tables.df(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(date_add(col("o_orderdate"), 7), "yyyy-MM-dd").as("d_plus7"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom")),
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS d_plus7,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mo,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom
             |FROM orders""".stripMargin)),

    // -------------------------------------------------------- scalar: string
    Q("q_scalar_string",
      (s, dir) => Tables.df(s, dir, "customer")
        .filter(col("c_name").like("%1%"))
        .select(col("c_custkey"),
          lower(col("c_name")).as("lower_name"),
          regexp_replace(col("c_name"), "#", "-").as("dashed"),
          split(col("c_name"), "#").getItem(0).as("first_part"),
          length(col("c_name")).as("name_len")),
      Some("""SELECT c_custkey, lower(c_name) AS lower_name,
             |  regexp_replace(c_name, '#', '-', 'g') AS dashed,
             |  string_split(c_name, '#')[1] AS first_part,
             |  length(c_name) AS name_len
             |FROM customer WHERE c_name LIKE '%1%'""".stripMargin)),

    // ------------------------------------------------- P1/P2 schema alignment
    Q("q_schema_align",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val target = StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_linenumber", IntegerType),
          StructField("l_quantity", DecimalType(15, 4)),
          StructField("l_comment", StringType),      // missing in source → NULL
          StructField("l_returnflag", StringType)))
        Relational.alignToSchema(Tables.df(s, dir, "lineitem"), target)
          // comparator alignment: fixed-scale decimal → float64 on both sides
          .withColumn("l_quantity", col("l_quantity").cast("double"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_quantity AS DECIMAL(15,4)) AS DOUBLE) AS l_quantity,
             |  CAST(NULL AS VARCHAR) AS l_comment, l_returnflag
             |FROM lineitem""".stripMargin)),

    // ------------------------------------------------- P5 column-name norm
    Q("q_colname_norm",
      (s, dir) => {
        val (n1, _) = TypeMapper.normalizeColumnName("2ND_REF")
        val (n2, _) = TypeMapper.normalizeColumnName("MixedCase")
        Tables.df(s, dir, "orders")
          .select(col("o_orderkey").as(n1), col("o_orderstatus").as(n2))
      },
      Some("SELECT o_orderkey AS col_2nd_ref, o_orderstatus AS mixedcase FROM orders")),

    // ----------------------------------------------- W2 sessionization window
    Q("q_sessionize",
      (s, dir) => graft.streaming.StreamingPipeline
        .sessionize(Tables.df(s, dir, "events"), gapMinutes = 30)
        // session bounds at epoch-µs so both engines compare identically
        .select(col("user_id"), col("session_seq"), col("n_events"),
          TimeCols.epochUs("session_start").as("session_start_us"),
          TimeCols.epochUs("session_end").as("session_end_us")),
      Some("""WITH flagged AS (
             |  SELECT user_id, epoch_us(ts) AS tsu,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)))
             |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             |  COUNT(*) AS n_events,
             |  MIN(tsu) AS session_start_us, MAX(tsu) AS session_end_us
             |FROM (
             |  SELECT user_id, tsu, SUM(new_session) OVER (
             |    PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING)
             |    AS session_seq
             |  FROM flagged)
             |GROUP BY user_id, session_seq""".stripMargin))
  )
}
