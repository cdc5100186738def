package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP-surface breadth queries: multi-level aggregation (ROLLUP/CUBE),
  * pivot, analytic window functions, full-outer join, and a TPC-H Q5-shape
  * multi-join — the general-analytics queries a user of the reference's
  * warehouse (loaded by this engine) runs downstream of the sync
  * (ref README "Query the backup data directly from Redshift",
  * docs/ARCHITECTURE.md reporting examples).
  *
  * Scale notes per query inline; none of these introduce a shuffle beyond
  * the irreducible group/join exchanges, and the bounded dims in the Q5
  * shape broadcast (optimizer-chosen, not forced). */
object OlapQueries {

  import Align.{dec, dsum}

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------- ROLLUP
    // Subtotal hierarchy (priority, status) → priority → grand total in ONE
    // pass: Spark expands grouping sets before the partial aggregate, so the
    // exchange still carries pre-aggregated rows — no extra shuffle vs a
    // plain groupBy.
    Q("q_agg_rollup",
      (s, dir) => Tables.df(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("sum_price")),
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin)),

    // --------------------------------------------------------------- CUBE
    // All 2^2 grouping sets over a low-cardinality pair — the canonical
    // warehouse-report shape.
    Q("q_agg_cube",
      (s, dir) => Tables.df(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ----------------------------------------------- GROUPING() markers
    // Subtotal rows are distinguishable from genuine-NULL group values only
    // through the grouping markers — the disambiguation every reporting
    // layer over ROLLUP output needs.
    Q("q_agg_grouping_id",
      (s, dir) => Tables.df(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          grouping(col("o_orderstatus")).cast("long").as("g_status")),
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
             |FROM orders
             |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin)),

    // -------------------------------------------------------------- PIVOT
    // status → columns with EXPLICIT values (F/O/P): no discovery pass over
    // the data, single aggregate exchange. Missing combinations surface as 0
    // on both engines (Spark pivot yields NULL → filled; FILTER counts 0).
    Q("q_pivot_status",
      (s, dir) => Tables.df(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P")),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // --------------------------------------------- lag/lead/ntile analytics
    // Per-customer order history: previous price, next order id, day gap,
    // spend quartile. One hash exchange on o_custkey feeds all four window
    // functions (same Window frame → single Window operator). The (date, key)
    // ordering is total per partition, so every function is deterministic.
    Q("q_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.df(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .cast("long").as("gap_days"),
          ntile(4).over(w).cast("long").as("quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  lag(o_totalprice) OVER w AS prev_price,
             |  lead(o_orderkey) OVER w AS next_orderkey,
             |  date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .stripMargin)),

    // ---------------------------------------------------- FULL OUTER join
    // Order counts vs the high-balance customer roster: each side holds keys
    // the other lacks (customers with no orders / orders whose customer is
    // below the balance cut), so both null-extensions are exercised. The
    // using-column join coalesces the key on both engines.
    Q("q_join_full_outer",
      (s, dir) => {
        val perCust = Tables.df(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        val rich = Tables.df(s, dir, "customer")
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        perCust.join(rich, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"), col("n_orders"), col("c_name"))
      },
      Some("""SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey,
             |  o.n_orders, c.c_name
             |FROM (SELECT o_custkey, COUNT(*) AS n_orders
             |      FROM orders GROUP BY o_custkey) o
             |FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
             |                 WHERE c_acctbal > 5000) c
             |  ON o.o_custkey = c.c_custkey""".stripMargin)),

    // ----------------------------------------------- EXCEPT ALL (multiset)
    // Bag semantics preserve multiplicity: a user with 3 signups and 1
    // purchase keeps 2 signup rows — the set form would keep 0. Spark plans
    // both ALL-variants as a count-aggregate + generate, never a join per
    // duplicate.
    Q("q_set_except_all",
      (s, dir) => {
        val ev = Tables.df(s, dir, "events")
        ev.filter(col("event_type") === "signup").select(col("user_id"))
          .exceptAll(
            ev.filter(col("event_type") === "purchase").select(col("user_id")))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             |EXCEPT ALL
             |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // ----------------------------------------------------------- INTERSECT
    // Users present in BOTH behavioral cohorts. INTERSECT deduplicates both
    // sides (set semantics) on both engines; Spark plans it as an aggregate +
    // semi join, shuffling only the distinct user ids.
    Q("q_set_intersect",
      (s, dir) => {
        val ev = Tables.df(s, dir, "events")
        ev.filter(col("event_type") === "signup").select(col("user_id"))
          .intersect(
            ev.filter(col("event_type") === "purchase").select(col("user_id")))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             |INTERSECT
             |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // ------------------------------- TPC-H Q10-shape (returned-item ranking)
    // Customers ranked by revenue lost to returns in one quarter: date-pushed
    // orders scan, flag-pushed lineitem scan, exact-decimal ordered top-20
    // (TakeOrdered, never a global sort).
    Q("q10_returned_items",
      (s, dir) => {
        val o = Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-10-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        val l = Tables.df(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val c = Tables.df(s, dir, "customer")
        val n = Tables.df(s, dir, "nation")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
          .withColumn("revenue", col("revenue").cast("double"))
      },
      Some("""SELECT c_custkey, c_name, n_name, CAST(revenue AS DOUBLE) AS revenue
             |FROM (
             |  SELECT c_custkey, c_name, n_name,
             |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |        AS DECIMAL(18,4))) AS revenue
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  WHERE l_returnflag = 'R'
             |    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
             |  GROUP BY 1, 2, 3
             |  ORDER BY revenue DESC, c_custkey ASC LIMIT 20)""".stripMargin)),

    // ------------------------------------- TPC-H Q18-shape (HAVING semi-join)
    // Large-quantity orders: aggregate-then-filter produces a small key set
    // that gates the orders/customer join. The HAVING sum is exact decimal,
    // so the threshold boundary never flips between engines; the big-order
    // key set is orders-of-magnitude smaller than lineitem, and AQE sizes
    // the join accordingly.
    Q("q18_large_orders",
      (s, dir) => {
        val l = Tables.df(s, dir, "lineitem")
        val big = l.groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"), 2)).as("__sq"))
          .filter(col("__sq") > 250)
          .select(col("l_orderkey"), col("__sq").cast("double").as("sum_qty"))
        val o = Tables.df(s, dir, "orders")
        val c = Tables.df(s, dir, "customer")
        o.join(big, o("o_orderkey") === big("l_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("o_orderkey"),
            Align.fmt(col("o_orderdate")).as("o_orderdate_s"),
            col("o_totalprice"), col("sum_qty"))
      },
      Some("""SELECT c_name, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
             |  o_totalprice, CAST(sq AS DOUBLE) AS sum_qty
             |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
             |      FROM lineitem GROUP BY l_orderkey HAVING sq > 250) big
             |JOIN orders ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ----------------------------------------- TPC-H Q5-shape multi-join
    // Local-supplier revenue by nation for one region-year: a 6-table join
    // where region/nation are bounded dims (optimizer broadcasts them) and
    // the c_nationkey = s_nationkey condition rides the supplier equi-join.
    // The orders date filter is pushed to the parquet scan.
    Q("q5_local_supplier_revenue",
      (s, dir) => {
        val c = Tables.df(s, dir, "customer")
        val o = Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        val l = Tables.df(s, dir, "lineitem")
        val sup = Tables.df(s, dir, "supplier")
        val n = Tables.df(s, dir, "nation")
        val r = Tables.df(s, dir, "region").filter(col("r_name") === "ASIA")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(sup, l("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
          .join(n, sup("s_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name""".stripMargin)),

    // ---------------------- TPC-H Q2-shape (correlated scalar MIN subquery)
    // Cheapest supplier per part within a region, written AS a correlated
    // scalar subquery so Catalyst's RewriteCorrelatedScalarSubquery is the
    // surface under test: the per-part MIN must decorrelate to an aggregate
    // + join, never a per-row subquery execution (PlanSpec guard). lineitem
    // stands in for partsupp (the fixture schema has no partsupp table);
    // min_cost is a raw parquet double — no arithmetic, so the equality
    // boundary is engine-exact.
    Q("q2_min_cost_supplier",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT sp.s_name, p.p_partkey, p.p_type,
                 l.l_extendedprice AS min_cost
          FROM part p, supplier sp, lineitem l, nation n, region r
          WHERE p.p_partkey = l.l_partkey AND sp.s_suppkey = l.l_suppkey
            AND sp.s_nationkey = n.n_nationkey
            AND n.n_regionkey = r.r_regionkey
            AND r.r_name = 'ASIA'
            AND l.l_extendedprice = (
              SELECT MIN(l2.l_extendedprice)
              FROM lineitem l2, supplier s2, nation n2, region r2
              WHERE l2.l_partkey = p.p_partkey
                AND s2.s_suppkey = l2.l_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'ASIA')""")
      },
      Some("""SELECT sp.s_name, p.p_partkey, p.p_type,
             |       l.l_extendedprice AS min_cost
             |FROM part p, supplier sp, lineitem l, nation n, region r
             |WHERE p.p_partkey = l.l_partkey AND sp.s_suppkey = l.l_suppkey
             |  AND sp.s_nationkey = n.n_nationkey
             |  AND n.n_regionkey = r.r_regionkey
             |  AND r.r_name = 'ASIA'
             |  AND l.l_extendedprice = (
             |    SELECT MIN(l2.l_extendedprice)
             |    FROM lineitem l2, supplier s2, nation n2, region r2
             |    WHERE l2.l_partkey = p.p_partkey
             |      AND s2.s_suppkey = l2.l_suppkey
             |      AND s2.s_nationkey = n2.n_nationkey
             |      AND n2.n_regionkey = r2.r_regionkey
             |      AND r2.r_name = 'ASIA')""".stripMargin)),

    // ------------------- TPC-H Q21-shape (EXISTS + NOT EXISTS self-joins)
    // "Supplier whose line shipped last in a multi-supplier order": the
    // canonical EXISTS (another supplier participated) + NOT EXISTS (none
    // of them shipped later) pair, correlated on the SAME big fact table —
    // both must decorrelate to semi/anti self-joins on l_orderkey. The
    // fixture lineitem has no commit/receipt dates, so the lateness
    // predicate rides l_shipdate; the shape (two correlated predicate
    // subqueries against self) is Q21's.
    Q("q21_waiting_supplier",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT sp.s_name, COUNT(*) AS numwait
          FROM supplier sp, lineitem l1, orders o
          WHERE sp.s_suppkey = l1.l_suppkey
            AND o.o_orderkey = l1.l_orderkey
            AND o.o_orderstatus = 'F'
            AND EXISTS (
              SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (
              SELECT * FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l1.l_shipdate)
          GROUP BY sp.s_name""")
      },
      Some("""SELECT sp.s_name, COUNT(*) AS numwait
             |FROM supplier sp, lineitem l1, orders o
             |WHERE sp.s_suppkey = l1.l_suppkey
             |  AND o.o_orderkey = l1.l_orderkey
             |  AND o.o_orderstatus = 'F'
             |  AND EXISTS (
             |    SELECT * FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT * FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY sp.s_name""".stripMargin)),

    // ---------------- TPC-H Q22-shape (NOT EXISTS + scalar AVG subquery)
    // Above-average-balance customers with no FINALIZED orders, grouped
    // by country (every fixture customer has SOME order, so the classic
    // no-order-at-all form is vacuous — the anti join anchors on status).
    // The average is compared multiplicatively (bal × n > Σbal, all exact
    // decimals) so the threshold boundary cannot flip between engines the
    // way a float AVG could; the fixture customer has no phone column, so
    // nationkey stands in for the country code. NOT EXISTS must become an
    // anti join against orders; the two uncorrelated scalars execute once.
    Q("q22_idle_customers",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT CAST(c.c_nationkey AS BIGINT) AS cntry,
                 COUNT(*) AS numcust,
                 CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
          FROM customer c
          WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
                (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
              > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2)))
                 FROM customer c3 WHERE c3.c_acctbal > 0.0)
            AND NOT EXISTS (
              SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F')
          GROUP BY c.c_nationkey""")
      },
      Some("""SELECT CAST(c.c_nationkey AS BIGINT) AS cntry,
             |       COUNT(*) AS numcust,
             |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |         AS totacctbal
             |FROM customer c
             |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
             |      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
             |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2)))
             |       FROM customer c3 WHERE c3.c_acctbal > 0.0)
             |  AND NOT EXISTS (
             |    SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey
             |      AND o.o_orderstatus = 'F')
             |GROUP BY c.c_nationkey""".stripMargin)),

    // -------------------- TPC-H Q13-shape (outer-join count distribution)
    // Customer distribution by order count INCLUDING zero-order customers:
    // the LEFT OUTER join with an extra non-key ON predicate, a COUNT over
    // the nullable side (counting rows, not nulls), then a second grouping
    // over the counts. The zero bucket only exists if the outer join and
    // null-aware COUNT are both right.
    Q("q13_customer_distribution",
      (s, dir) => {
        val c = Tables.df(s, dir, "customer")
        val o = Tables.df(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
             |  FROM customer c LEFT OUTER JOIN orders o
             |    ON c.c_custkey = o.o_custkey
             |   AND o.o_orderpriority <> '1-URGENT'
             |  GROUP BY c.c_custkey) t
             |GROUP BY c_count""".stripMargin)),

    // ------------------------- TPC-H Q15-shape (top supplier, scalar MAX)
    // Revenue per supplier for one quarter, then the supplier(s) whose
    // revenue EQUALS the maximum — the aggregate-of-aggregate scalar
    // subquery (the reference CTE is referenced twice: once as the join
    // input, once under MAX). Exact decimal revenue keeps the equality
    // boundary engine-exact.
    Q("q15_top_supplier",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,4))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
          SELECT sp.s_suppkey, sp.s_name,
                 CAST(r.total_rev AS DOUBLE) AS total_rev
          FROM supplier sp JOIN rev r ON sp.s_suppkey = r.l_suppkey
          WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)""")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |         SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |             AS DECIMAL(18,4))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey)
             |SELECT sp.s_suppkey, sp.s_name,
             |       CAST(r.total_rev AS DOUBLE) AS total_rev
             |FROM supplier sp JOIN rev r ON sp.s_suppkey = r.l_suppkey
             |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin)),

    // ----------------- TPC-H Q17-shape (correlated AVG scalar subquery)
    // Revenue from small-quantity orders of one brand: each lineitem
    // compares against 20% of ITS part's average quantity. The average is
    // compared multiplicatively (qty × 5 × n < Σqty, exact decimals — same
    // trick as Q22) so the threshold boundary cannot flip between engines;
    // both correlated scalars decorrelate to per-part aggregates that Spark
    // merges into one pass.
    Q("q17_small_quantity_revenue",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0 AS avg_yearly
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#3'
            AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
                (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = p.p_partkey)
              < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
                 FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)""")
      },
      Some("""SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
             |            AS DOUBLE) / 7.0 AS avg_yearly
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_brand = 'Brand#3'
             |  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
             |      (SELECT COUNT(*) FROM lineitem l2
             |       WHERE l2.l_partkey = p.p_partkey)
             |    < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
             |       FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)""".stripMargin)),

    // --------------------- TPC-H Q19-shape (disjunctive predicate join)
    // Revenue under an OR of (brand, size-range, quantity-range) triples:
    // the optimizer must keep the common p_partkey = l_partkey conjunct as
    // an EQUI hash join (never a nested loop over the disjunction) and
    // evaluate the residual OR as a post-join filter — PlanSpec guards the
    // join algorithm.
    Q("q19_disjunctive_revenue",
      (s, dir) => {
        val l = Tables.df(s, dir, "lineitem")
        val p = Tables.df(s, dir, "part")
        l.join(p, l("l_partkey") === p("p_partkey") && (
          (p("p_brand") === "Brand#1" && p("p_size").between(1, 15) &&
            l("l_quantity").between(1, 20)) ||
          (p("p_brand") === "Brand#2" && p("p_size").between(10, 30) &&
            l("l_quantity").between(10, 40)) ||
          (p("p_brand") === "Brand#3" && p("p_size").between(20, 50) &&
            l("l_quantity").between(20, 60))))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
             |       AND l.l_quantity BETWEEN 1 AND 20)
             |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
             |       AND l.l_quantity BETWEEN 10 AND 40)
             |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
             |       AND l.l_quantity BETWEEN 20 AND 60)""".stripMargin)),

    // ------------------------ TPC-H Q20-shape (nested IN over aggregates)
    // Suppliers who shipped more than a SIXTH of some part's total (a
    // majority share never occurs once parts have many suppliers — the
    // threshold must scale with fan-out to stay non-vacuous):
    // an IN subquery whose body joins two grouped aggregates of the same
    // fact table — the nested-IN decorrelation (semi join over aggregate
    // subplans). Share comparison is multiplicative exact decimal.
    Q("q20_majority_suppliers",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT sp.s_suppkey, sp.s_name
          FROM supplier sp
          WHERE sp.s_suppkey IN (
            SELECT per.l_suppkey
            FROM (SELECT l_suppkey, l_partkey,
                         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
                  FROM lineitem GROUP BY l_suppkey, l_partkey) per
            JOIN (SELECT l_partkey,
                         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
                  FROM lineitem GROUP BY l_partkey) tot
              ON per.l_partkey = tot.l_partkey
            WHERE per.q * 6 > tot.tq)""")
      },
      Some("""SELECT sp.s_suppkey, sp.s_name
             |FROM supplier sp
             |WHERE sp.s_suppkey IN (
             |  SELECT per.l_suppkey
             |  FROM (SELECT l_suppkey, l_partkey,
             |               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
             |        FROM lineitem GROUP BY l_suppkey, l_partkey) per
             |  JOIN (SELECT l_partkey,
             |               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
             |        FROM lineitem GROUP BY l_partkey) tot
             |    ON per.l_partkey = tot.l_partkey
             |  WHERE per.q * 6 > tot.tq)""".stripMargin)),

    // ------------------------------- semi-structured JSON column handling
    // The events fixture carries a JSON props column; extract a typed field
    // with the codegen'd JSON path expression and aggregate it — the
    // "schema-on-read over a VARCHAR JSON column" surface every warehouse
    // query layer needs.
    Q("q_json_extract",
      (s, dir) => Tables.df(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k")),
      Some("""SELECT event_type,
             |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS n_with_k,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS BIGINT) AS sum_k,
             |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type""".stripMargin)),

    // ---------------------- incremental aggregate maintenance (MV fold)
    // Three disjoint increments folded one at a time into a per-group
    // aggregate state must equal the direct aggregate over everything —
    // the CDC answer to keeping a 100 TB rollup fresh without rescanning
    // history. The chunk boundaries are arbitrary id ranges.
    Q("q_incremental_rollup",
      (s, dir) => {
        import graft.operators.Relational
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val sums = Seq(Relational.SumSpec("sum_value", "value", 2))
        val chunks = Seq(
          ev.filter(col("event_id") % 3 === 0),
          ev.filter(col("event_id") % 3 === 1),
          ev.filter(col("event_id") % 3 === 2))
        val state = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (prev, chunk) => Some(Relational.foldAggregate(
            prev, chunk, Seq("event_type"), sums))
        }.get
        Relational.readAggState(state, sums)
      },
      Some("""SELECT event_type, COUNT(*) AS n_rows,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type""".stripMargin)),

    // --------------------------------------- RANGE-frame trailing window
    // One-hour trailing sum per user over event time — the time-based
    // RANGE frame (peers included by VALUE distance, not row count) that a
    // rows-frame cannot express. Exact decimal sum, one exchange on
    // user_id.
    Q("q_window_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0)
        Tables.df(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            graft.util.TimeCols.epochUs("ts").as("ts_us"), col("value"))
          .withColumn("trailing_1h_sum",
            sum(dec(col("value"), 2)).over(w).cast("double"))
          .drop("value")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) AS trailing_1h_sum
             |FROM events""".stripMargin)),

    // ----------------------------------------------------------- UNPIVOT
    // Wide measures melted to (measure, value) rows — the report-layer
    // reshape dual of pivot. Spark's native unpivot (a generator, no
    // shuffle) vs DuckDB's UNPIVOT.
    Q("q_unpivot_measures",
      (s, dir) => Tables.df(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_tax")),
          variableColumnName = "measure", valueColumnName = "val"),
      Some("""SELECT l_orderkey, l_linenumber, measure, val FROM (
             |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_tax
             |           FROM lineitem)
             |  ON l_quantity, l_tax INTO NAME measure VALUE val)""".stripMargin)),

    // ------------------------------ incremental distinct-count (HLL fold)
    // FULL value oracle in exact-error-bound form: the DataSketches HLL
    // estimate itself is not engine-reproducible (DuckDB runs a different
    // sketch), but its PUBLISHED error bound against the exact distinct
    // count is — the query emits the exact per-group count plus the bound
    // verdict (|est−exact| ≤ max(1, 5%·exact); lgK=12 ⇒ RSE 1.6%, 5% ≈
    // 3σ), and DuckDB replays the exact count and the constant-TRUE
    // verdict. A hash mismatch now means either the folded sketch broke
    // its accuracy contract or the exact pass diverged — both real
    // failures. The exact pass exists only for the sf-scale gate; at
    // 100 TB the sketch REPLACES it (that's the point), and
    // RelationalSpec separately pins chunking-invariance.
    Q("q_distinct_sketch",
      (s, dir) => {
        import graft.operators.Relational
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("user_id"))
        val chunks = Seq(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1))
        val est = Relational.readDistinctSketch(
          chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
            (p, c) => Some(Relational.foldDistinctSketch(
              p, c, Seq("event_type"), "user_id"))
          }.get)
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        est.join(exact, Seq("event_type"))
          .select(col("event_type"), col("exact_distinct"),
            (abs(col("approx_distinct") - col("exact_distinct")) <=
              greatest(lit(1.0), col("exact_distinct") * lit(0.05)))
              .as("within_bound"))
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
             |  TRUE AS within_bound
             |FROM events GROUP BY 1""".stripMargin)),

    // --------------------------- incremental quantile state (KLL fold)
    // FULL value oracle in exact-rank-bound form: KLL compaction is
    // randomized, so the estimates themselves reproduce in no other
    // engine — but the KLL GUARANTEE (the returned element's normalized
    // rank lies within ε of the target φ; ε ≈ 1.65% at k=200, checked at
    // 3% for slack) is exactly replayable. The query ranks each folded
    // estimate against its own group with one broadcast-join aggregation
    // pass ([#{v < est}, #{v ≤ est}] must bracket φ·n within ε·n) and
    // emits the exact group size plus per-φ verdicts; DuckDB replays the
    // size and the constant-TRUE verdicts. The exact pass is the sf-scale
    // gate only — at 100 TB the mergeable sketch state replaces it.
    Q("q_quantile_sketch",
      (s, dir) => {
        import graft.operators.Relational
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val chunks = Seq(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1))
        val est = Relational.readQuantileSketch(
          chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
            (p, c) => Some(Relational.foldQuantileSketch(
              p, c, Seq("event_type"), "value"))
          }.get, Seq(0.5, 0.9, 0.99))
        val eps = 0.03
        def within(q: String, phi: Double) =
          ((sum(when(col("value") < col(q), 1L).otherwise(0L)) <=
            (lit(phi) + eps) * count(lit(1))) &&
            (sum(when(col("value") <= col(q), 1L).otherwise(0L)) >=
              (lit(phi) - eps) * count(lit(1)))).as(s"within_$q")
        ev.join(broadcast(est), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), within("q_50", 0.5),
            within("q_90", 0.9), within("q_99", 0.99))
      },
      Some("""SELECT event_type, COUNT(*) AS n_rows,
             |  TRUE AS within_q_50, TRUE AS within_q_90, TRUE AS within_q_99
             |FROM events GROUP BY 1""".stripMargin)),

    // --------------- deterministic KMV distinct fold (FULL value oracle)
    // The exactly-replayable sibling of q_distinct_sketch: bottom-k-by-md5
    // state is a pure function of the value SET, so the 2-chunk fold below
    // is bit-identical to the oracle's one-pass recompute — merge
    // invariance is PROVED by the hash match, not just spec-bounded.
    Q("q_distinct_kmv",
      (s, dir) => {
        import graft.operators.Sketches
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("user_id"))
        val chunks = Seq(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1))
        // k=64 < the per-group user cardinality at sf0.01 so the oracle
        // exercises the SATURATED estimator branch, not just exact counts
        Sketches.readKmvDistinct(
          chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
            (p, c) => Some(Sketches.foldKmvDistinct(
              p, c, Seq("event_type"), "user_id", k = 64))
          }.get, k = 64)
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
             |                             1, 15)) AS BIGINT) AS h
             |  FROM events),
             |r AS (SELECT event_type, h, ROW_NUMBER() OVER (
             |        PARTITION BY event_type ORDER BY h) AS rn FROM h),
             |g AS (SELECT event_type, COUNT(*) AS n_kept,
             |        MAX(CASE WHEN rn = 64 THEN h END) AS kth_hash
             |      FROM r WHERE rn <= 64 GROUP BY 1)
             |SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept, kth_hash,
             |  CAST(CASE WHEN n_kept < 64 THEN n_kept
             |       ELSE ROUND(63.0 * 1152921504606846976 / kth_hash) END
             |    AS BIGINT) AS est_distinct
             |FROM g""".stripMargin)),

    // -------------- count-min heavy hitters fold (FULL value oracle)
    // Per-group CMS counters folded over two chunks, then the top-10 items
    // by estimate; counters are integer sums of md5-derived cells, so
    // DuckDB replays every estimate exactly (including collision
    // inflation, which only ever OVERcounts — SketchesSpec pins that).
    Q("q_heavy_hitters_cms",
      (s, dir) => {
        import graft.operators.Sketches
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("user_id"))
        val chunks = Seq(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1))
        val state = chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          (p, c) => Some(Sketches.foldCountMin(
            p, c, Seq("event_type"), "user_id"))
        }.get
        val cand = ev.select(col("event_type"), col("user_id")).distinct()
        Sketches.heavyHitters(state, cand, Seq("event_type"), "user_id",
          topN = 10)
      },
      Some("""WITH j AS (SELECT unnest(range(4)) AS jj),
             |cnt AS (
             |  SELECT event_type, jj,
             |    CAST(concat('0x', substr(md5(CAST(jj AS VARCHAR) || '_'
             |        || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 1024 AS idx,
             |    COUNT(*) AS c
             |  FROM events, j GROUP BY 1, 2, 3),
             |cand AS (SELECT DISTINCT event_type, user_id FROM events),
             |est AS (
             |  SELECT cand.event_type, cand.user_id, MIN(cnt.c) AS est_count
             |  FROM cand JOIN j ON TRUE
             |  JOIN cnt ON cnt.event_type = cand.event_type
             |    AND cnt.jj = j.jj
             |    AND cnt.idx = CAST(concat('0x', substr(md5(
             |          CAST(j.jj AS VARCHAR) || '_'
             |          || CAST(cand.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |        % 1024
             |  GROUP BY 1, 2)
             |SELECT event_type, user_id, est_count, rank FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY est_count DESC, user_id) AS rank FROM est)
             |WHERE rank <= 10""".stripMargin)),

    // ------------- bottom-k uniform-sample quantile fold (FULL oracle)
    // The deterministic sibling of q_quantile_sketch: the sample is the k
    // rows with smallest md5(event_id), so the fold is chunk-invariant and
    // the exact-element quantile picks replay bit-for-bit in DuckDB.
    Q("q_quantile_sample",
      (s, dir) => {
        import graft.operators.Sketches
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val chunks = Seq(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1))
        Sketches.readSampleQuantiles(
          chunks.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
            (p, c) => Some(Sketches.foldSampleState(
              p, c, Seq("event_type"), "event_id", "value"))
          }.get, Seq(0.25, 0.5, 0.9))
      },
      Some("""WITH s AS (
             |  SELECT event_type,
             |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
             |                             1, 15)) AS BIGINT) AS h,
             |    value AS v
             |  FROM events),
             |r AS (SELECT *, ROW_NUMBER() OVER (
             |        PARTITION BY event_type ORDER BY h, v) AS rn FROM s),
             |samp AS (SELECT event_type, list(v ORDER BY v) AS vs,
             |           COUNT(*) AS n
             |         FROM r WHERE rn <= 256 GROUP BY 1)
             |SELECT event_type,
             |  vs[CAST(FLOOR((n - 1) * 0.25) AS INT) + 1] AS q_25,
             |  vs[CAST(FLOOR((n - 1) * 0.5) AS INT) + 1] AS q_50,
             |  vs[CAST(FLOOR((n - 1) * 0.9) AS INT) + 1] AS q_90,
             |  CAST(n AS BIGINT) AS n_sample
             |FROM samp""".stripMargin)),

    // ------------------- TPC-H Q7-shape (bidirectional nation-pair trade)
    // Revenue between two specific nations in BOTH directions, by year:
    // the double-nation join with a symmetric OR pair condition.
    Q("q7_nation_trade",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                 CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          FROM supplier sp
          JOIN lineitem l ON sp.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON sp.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
          GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)""")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
             |            AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM supplier sp
             |JOIN lineitem l ON sp.s_suppkey = l.l_suppkey
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |JOIN nation n1 ON sp.s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
             |GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)""".stripMargin)),

    // --------------------------- TPC-H Q8-shape (market-share fraction)
    // One nation's share of a region's yearly order volume: conditional
    // aggregation over the same rows, the share emitted as a ratio of the
    // two exact-decimal sums converted to double at the END (one canonical
    // conversion point, so the division is engine-exact).
    Q("q8_market_share",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                      THEN CAST(l.l_extendedprice * (1.0 - l.l_discount)
                           AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
                 CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
          FROM lineitem l
          JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
          JOIN nation n1 ON sp.s_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE r.r_name = 'ASIA'
          GROUP BY year(o.o_orderdate)""")
      },
      Some("""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             |       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
             |            THEN CAST(l.l_extendedprice * (1.0 - l.l_discount)
             |                 AS DECIMAL(18,4))
             |            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
             |            AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
             |FROM lineitem l
             |JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
             |JOIN nation n1 ON sp.s_nationkey = n1.n_nationkey
             |JOIN region r ON n1.n_regionkey = r.r_regionkey
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |WHERE r.r_name = 'ASIA'
             |GROUP BY year(o.o_orderdate)""".stripMargin)),

    // ------------------------------- TPC-H Q9-shape (profit by nation)
    // Profit per (nation, year) over LIKE-filtered parts; the fixture has
    // no partsupp, so cost = 10% of retail price × quantity — the shape
    // (fact × part-filter × supplier-nation, mixed-sign sums) is Q9's.
    Q("q9_product_profit",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT n.n_name AS nation,
                 CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                        - p.p_retailprice * 0.1 * l.l_quantity
                      AS DECIMAL(18,4))) AS DOUBLE) AS profit
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
          JOIN nation n ON sp.s_nationkey = n.n_nationkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE p.p_name LIKE '%widget%'
          GROUP BY n.n_name, year(o.o_orderdate)""")
      },
      Some("""SELECT n.n_name AS nation,
             |       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
             |              - p.p_retailprice * 0.1 * l.l_quantity
             |            AS DECIMAL(18,4))) AS DOUBLE) AS profit
             |FROM lineitem l
             |JOIN part p ON p.p_partkey = l.l_partkey
             |JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
             |JOIN nation n ON sp.s_nationkey = n.n_nationkey
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |WHERE p.p_name LIKE '%widget%'
             |GROUP BY n.n_name, year(o.o_orderdate)""".stripMargin)),

    // ----------------------- TPC-H Q6-shape (pure-pushdown filter agg)
    // Every predicate is scan-pushable; the whole query is one scan + one
    // partial/final aggregate pair — the shape where pushdown either works
    // or the engine reads 10× the data.
    Q("q6_forecast_revenue",
      (s, dir) => Tables.df(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // ------------- TPC-H Q11-shape (HAVING vs scalar over the same agg)
    // Part values filtered against their own aggregate's statistics: the
    // grouped aggregate is referenced as the row source AND inside two
    // scalar subqueries. "Above 1.5× the mean part value" in exact
    // multiplicative decimals (val × n × 2 > Σval × 3) — scale-stable
    // (a fixed fraction-of-total threshold returns zero rows as the part
    // count grows) and boundary-exact on both engines.
    Q("q11_important_stock",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          WITH v AS (SELECT l_partkey,
                            SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
                     FROM lineitem GROUP BY l_partkey)
          SELECT l_partkey, CAST(val AS DOUBLE) AS value
          FROM v WHERE val * (SELECT COUNT(*) FROM v) * 2
                   > (SELECT SUM(val) FROM v) * 3""")
      },
      Some("""WITH v AS (SELECT l_partkey,
             |                  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
             |           FROM lineitem GROUP BY l_partkey)
             |SELECT l_partkey, CAST(val AS DOUBLE) AS value
             |FROM v WHERE val * (SELECT COUNT(*) FROM v) * 2
             |         > (SELECT SUM(val) FROM v) * 3""".stripMargin)),

    // ------------------- TPC-H Q16-shape (NOT IN + COUNT DISTINCT)
    // Supplier diversity per (brand, type, size) slice, excluding a
    // blocklisted supplier set via NOT IN — the null-aware anti join — and
    // an exact COUNT(DISTINCT) over the surviving join.
    Q("q16_supplier_diversity",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT p.p_brand, p.p_type, p.p_size,
                 COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
          FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
          WHERE p.p_brand <> 'Brand#3'
            AND p.p_size IN (1, 5, 9, 14, 20)
            AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
          GROUP BY p.p_brand, p.p_type, p.p_size""")
      },
      Some("""SELECT p.p_brand, p.p_type, p.p_size,
             |       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
             |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
             |WHERE p.p_brand <> 'Brand#3'
             |  AND p.p_size IN (1, 5, 9, 14, 20)
             |  AND l.l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
             |GROUP BY p.p_brand, p.p_type, p.p_size""".stripMargin)),

    // ------------------------------------------------- conversion funnel
    // signup → view → purchase in strict time order per user; a later
    // stage only counts after the previous stage's earliest qualifying
    // event. The oracle chains the same per-stage MIN frontiers.
    Q("q_funnel",
      (s, dir) => graft.operators.Relational.funnelCounts(
        Tables.df(s, dir, "events")
          .select(col("user_id"), graft.util.TimeCols.epochUs("ts").as("ts_us"),
            col("event_type")),
        "user_id", "ts_us", "event_type",
        Seq("signup", "view", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
             |  FROM events e JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
             |  GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
             |  FROM events e JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
             |  GROUP BY e.user_id)
             |SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
             |       COUNT(*) AS n_entities FROM s1
             |UNION ALL SELECT 1, 'view', COUNT(*) FROM s2
             |UNION ALL SELECT 2, 'purchase', COUNT(*) FROM s3""".stripMargin)),

    // ------------------------------------------------- cohort retention
    // Users cohorted by the week bucket of their first event; per
    // (cohort, offset) the count still active — integer week buckets so
    // both engines bucket identically.
    Q("q_cohort_retention",
      (s, dir) => graft.operators.Relational.cohortRetention(
        Tables.df(s, dir, "events")
          .select(col("user_id"), graft.util.TimeCols.epochUs("ts").as("ts_us")),
        "user_id", "ts_us", bucketWidth = 7L * 86400 * 1000000),
      Some("""WITH f AS (SELECT user_id,
             |    CAST(FLOOR(MIN(epoch_us(ts)) / 604800000000) AS BIGINT)
             |      AS cohort_bucket
             |  FROM events GROUP BY user_id),
             |a AS (SELECT DISTINCT user_id,
             |    CAST(FLOOR(epoch_us(ts) / 604800000000) AS BIGINT) AS b
             |  FROM events)
             |SELECT f.cohort_bucket, a.b - f.cohort_bucket AS bucket_offset,
             |       COUNT(*) AS n_active
             |FROM f JOIN a ON f.user_id = a.user_id
             |GROUP BY f.cohort_bucket, a.b - f.cohort_bucket""".stripMargin)),

    // --------------------------------------------------- exact percentiles
    // Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    // standard linear-interpolation definition (h = (n-1)q over the sorted
    // values) — interpolated on the raw parquet doubles, so the results are
    // bit-identical and hash-checkable.
    Q("q_percentiles",
      (s, dir) => Tables.df(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.25)").as("p25"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90")),
      Some("""SELECT event_type,
             |  quantile_cont(value, 0.25) AS p25,
             |  quantile_cont(value, 0.5) AS p50,
             |  quantile_cont(value, 0.9) AS p90
             |FROM events GROUP BY event_type""".stripMargin)),

    // ------------------------- fuzzy entity matching (sorted neighborhood)
    // Near-identical part names (edit distance ≤ 2) via the
    // sorted-neighborhood scale path: distributed sort, global positions,
    // bucketed range join over the next-10 window — O(n·w) comparisons, and
    // the pair set is a pure function of the sort order, so the oracle
    // reproduces it exactly. (The blocked variant lives in RelationalSpec —
    // a coarse block key degenerates to O(block²) on this fixture.)
    Q("q_fuzzy_pairs",
      (s, dir) => graft.operators.Relational.sortedNeighborPairs(
        Tables.df(s, dir, "part"), "p_partkey", "p_name",
        windowSize = 10, maxDistance = 2),
      Some("""WITH s AS (SELECT p_partkey, p_name,
             |    row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS pos
             |  FROM part)
             |SELECT LEAST(a.p_partkey, b.p_partkey) AS id_a,
             |       GREATEST(a.p_partkey, b.p_partkey) AS id_b,
             |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             |FROM s a JOIN s b ON b.pos BETWEEN a.pos + 1 AND a.pos + 10
             |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin)),

    // -------------------------------------- SCD Type-2 version history
    // Two snapshot increments (events split at a time boundary, reduced to
    // latest-per-user) folded into a version history: changed users close
    // their old version and open a new one, unchanged keep the original
    // valid_from, new users open their first. The oracle reconstructs the
    // exact fold semantics with joins over the two snapshots.
    Q("q_scd2_history",
      (s, dir) => {
        import graft.operators.Relational
        val boundary = 1705276800000000L // 2024-01-15 in epoch-µs
        val ev = Tables.df(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            graft.util.TimeCols.epochUs("ts").as("ts_us"), col("event_id"))
        val h1 = Relational.scd2Apply(None,
          ev.filter(col("ts_us") < boundary),
          Seq("user_id"), "ts_us", Seq("event_type"), Seq("event_id"))
        Relational.scd2Apply(Some(h1),
          ev.filter(col("ts_us") >= boundary),
          Seq("user_id"), "ts_us", Seq("event_type"), Seq("event_id"))
      },
      Some("""WITH c1 AS (
             |  SELECT user_id, event_type, tsu FROM (
             |    SELECT user_id, event_type, epoch_us(ts) AS tsu,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             |    FROM events WHERE epoch_us(ts) < 1705276800000000) t
             |  WHERE rn = 1),
             |c2 AS (
             |  SELECT user_id, event_type, tsu FROM (
             |    SELECT user_id, event_type, epoch_us(ts) AS tsu,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             |    FROM events WHERE epoch_us(ts) >= 1705276800000000) t
             |  WHERE rn = 1)
             |SELECT a.user_id, a.event_type, a.tsu AS valid_from,
             |       CAST(NULL AS BIGINT) AS valid_to
             |FROM c1 a WHERE NOT EXISTS (
             |  SELECT 1 FROM c2 b WHERE b.user_id = a.user_id)
             |UNION ALL
             |SELECT b.user_id, b.event_type, b.tsu, CAST(NULL AS BIGINT)
             |FROM c2 b WHERE NOT EXISTS (
             |  SELECT 1 FROM c1 a WHERE a.user_id = b.user_id)
             |UNION ALL
             |SELECT a.user_id, a.event_type, a.tsu, CAST(NULL AS BIGINT)
             |FROM c1 a JOIN c2 b
             |  ON a.user_id = b.user_id AND a.event_type = b.event_type
             |UNION ALL
             |SELECT a.user_id, a.event_type, a.tsu, b.tsu
             |FROM c1 a JOIN c2 b
             |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
             |UNION ALL
             |SELECT b.user_id, b.event_type, b.tsu, CAST(NULL AS BIGINT)
             |FROM c1 a JOIN c2 b
             |  ON a.user_id = b.user_id AND a.event_type <> b.event_type"""
        .stripMargin)),

    // -------------------------------------------- explicit GROUPING SETS
    // Arbitrary (non-hierarchical) grouping-set list — the shape ROLLUP and
    // CUBE cannot express: (priority, status), (status), and grand total,
    // skipping the (priority) level.
    Q("q_agg_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
          FROM orders
          GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                  (o_orderstatus), ())""")
      },
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
             |                        (o_orderstatus), ())""".stripMargin)),

    // ------------------------------------------------ snapshot diff audit
    // Row-level change report between two versions of a table (the "what
    // did this sync change" audit): added/removed keys + changed rows
    // with the differing column names. One full-outer key join; unchanged
    // rows never reach the output.
    Q("q_snapshot_diff",
      (s, dir) => {
        val orders = Tables.df(s, dir, "orders")
        val old = orders.filter(col("o_orderkey") % 7 =!= 0)
        val nw = orders.filter(col("o_orderkey") % 11 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")))
        graft.operators.Relational.snapshotDiff(old, nw,
          keys = Seq("o_orderkey"),
          compareCols = Seq("o_totalprice", "o_orderstatus"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus
             |           FROM orders WHERE o_orderkey % 7 != 0),
             |n AS (SELECT o_orderkey,
             |        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
             |             ELSE o_totalprice END AS o_totalprice,
             |        o_orderstatus
             |      FROM orders WHERE o_orderkey % 11 != 0),
             |d AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |        CASE WHEN o.o_orderkey IS NULL THEN 'added'
             |             WHEN n.o_orderkey IS NULL THEN 'removed'
             |             ELSE 'changed' END AS change_type,
             |        CASE WHEN o.o_orderkey IS NOT NULL
             |              AND n.o_orderkey IS NOT NULL THEN
             |          array_to_string(list_filter([
             |            CASE WHEN o.o_totalprice IS DISTINCT FROM
             |              n.o_totalprice THEN 'o_totalprice' END,
             |            CASE WHEN o.o_orderstatus IS DISTINCT FROM
             |              n.o_orderstatus THEN 'o_orderstatus' END],
             |            x -> x IS NOT NULL), ',')
             |        ELSE '' END AS changed_cols
             |      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
             |SELECT o_orderkey, change_type, changed_cols FROM d
             |WHERE change_type != 'changed' OR changed_cols != ''"""
        .stripMargin)),

    // -------------------------- recursive CTE shape: gap-filled exp. EMA
    // The one analytic shape windows genuinely cannot express: an
    // exponentially-smoothed series (each row depends on the previous
    // OUTPUT, not the previous input). Monthly revenue densifies over the
    // [min,max] month index (missing months contribute 0) and folds
    // ema_n = ½·x_n + ½·ema_{n−1}. Month revenue sums as DECIMAL(18,2)
    // (exact), the ½ coefficients are exactly representable, and both
    // engines run the SAME linear recursion — bit-identical until the
    // final display round.
    //
    // The oracle keeps DuckDB's WITH RECURSIVE; the Spark side is a
    // SINGLE-PASS plan (round-14 ask #4). Spark's UnionLoop pays a full
    // plan round-trip + job per iteration — measured 2.9 s wall for
    // 1.8 exec-s on a 12-row output, pure driver latency. The recursion's
    // input is TIME-DIMENSION-BOUNDED (months in the window — data volume
    // changes the aggregation's cost, never the series length), so the
    // whole spine fits one row: collect the month map + bounds in a global
    // aggregate, densify with transform(sequence(lo,hi)), and run the
    // recurrence as an `aggregate` higher-order fold. The fold applies the
    // identical left-to-right 0.5·x + 0.5·prev IEEE-double steps as the
    // UnionLoop/DuckDB recursion, so bit-identity is preserved; the heavy
    // orders aggregation stays fully distributed, and the plan is one job
    // with no per-iteration round-trips.
    Q("q_sql_recursive_ema",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          WITH mr AS (
            SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS x
            FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
          one AS (
            SELECT MIN(mi) AS lo, MAX(mi) AS hi,
                   map_from_entries(collect_list(struct(mi, x))) AS m
            FROM mr),
          arr AS (
            SELECT lo,
                   transform(sequence(lo, hi), i -> coalesce(m[i], 0.0D))
                     AS xs
            FROM one WHERE lo IS NOT NULL),
          f AS (
            SELECT lo, xs,
                   aggregate(xs,
                     named_struct('emas', cast(array() AS array<double>),
                                  'prev', 0.0D),
                     (acc, x) -> named_struct(
                       'emas', concat(acc.emas, array(
                         if(size(acc.emas) = 0, x,
                            0.5D * x + 0.5D * acc.prev))),
                       'prev', if(size(acc.emas) = 0, x,
                                  0.5D * x + 0.5D * acc.prev)),
                     acc -> acc.emas) AS emas
            FROM arr)
          SELECT lo + pos AS mi, round(xs[pos], 2) AS x2,
                 round(ema, 4) AS ema4
          FROM f LATERAL VIEW posexplode(emas) t AS pos, ema""")
      },
      Some("""WITH RECURSIVE mr AS (
             |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
             |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |              AS DOUBLE) AS x
             |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
             |b AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM mr),
             |ema(mi, x, ema) AS (
             |  SELECT b.lo, COALESCE(m.x, 0.0), COALESCE(m.x, 0.0)
             |  FROM b LEFT JOIN mr m ON m.mi = b.lo
             |  UNION ALL
             |  SELECT e.mi + 1, COALESCE(m.x, 0.0),
             |         0.5 * COALESCE(m.x, 0.0) + 0.5 * e.ema
             |  FROM ema e JOIN b ON e.mi < b.hi
             |  LEFT JOIN mr m ON m.mi = e.mi + 1)
             |SELECT mi, round(x, 2) AS x2, round(ema, 4) AS ema4 FROM ema"""
        .stripMargin))
  )
}
