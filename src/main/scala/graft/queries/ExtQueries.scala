package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.Skew
import graft.streaming.StreamingPipeline

/** Driver queries for the multimodal, streaming, and skew-mitigation
  * surfaces. */
object ExtQueries {

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------- salted skew join
    // The salted plan must be ROW-IDENTICAL to the plain join — so the oracle
    // is simply the unsalted SQL join.
    Q("q_join_salted",
      (s, dir) => Skew.saltedJoin(
        Tables.df(s, dir, "orders"),
        Tables.df(s, dir, "customer")
          .withColumnRenamed("c_custkey", "o_custkey")
          .select(col("o_custkey"), col("c_name")),
        keys = Seq("o_custkey"), saltFactor = 8)
        .select(col("o_orderkey"), col("c_name")),
      Some("""SELECT o_orderkey, c_name FROM orders
             |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ----------------------------------------------------- data profiling
    // Exact slice of Relational.profile (approx_distinct is HLL → dropped
    // for the oracle; the full profile is exercised in RelationalSpec).
    Q("q_profile_orders",
      (s, dir) => graft.operators.Relational.profile(
        Tables.df(s, dir, "orders"),
        Seq("o_orderkey", "o_orderstatus", "o_orderdate"))
        .select(col("column").as("col_name"), col("row_count"),
          col("null_count"), col("min_value"), col("max_value")),
      Some("""SELECT 'o_orderkey' AS col_name, COUNT(*) AS row_count,
             |  COUNT(*) - COUNT(o_orderkey) AS null_count,
             |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
             |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM orders
             |UNION ALL
             |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
             |  CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
             |FROM orders
             |UNION ALL
             |SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
             |  CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
             |FROM orders""".stripMargin)),

    // ------------------------------------------------- multimodal metadata
    // byte_len is the real (oracle-checkable) part of the stubbed decode
    // path: utf-8 payload length through the binary column + mapPartitions
    // batch plumbing. The pseudo-decode fields ride along in the rows-only
    // q_mm_frame_sample below.
    Q("q_mm_metadata",
      (s, dir) => Multimodal.extractMetadata(s, Tables.df(s, dir, "documents"))
        .toDF().select(col("doc_id"), col("byte_len")),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len
             |FROM documents""".stripMargin)),

    // ------------------------------------- multimodal frame-sample (rows-only:
    // frame counts come from the deterministic decode STUB, which DuckDB
    // cannot reproduce; the plumbing invariants live in MultimodalSpec)
    Q("q_mm_frame_sample",
      (s, dir) => Multimodal.frameSamplePlan(
        Multimodal.extractMetadata(s, Tables.df(s, dir, "documents")),
        stride = 30),
      None),

    // --------------------------------- native session_window (batch form)
    // Session end = last event + gap (the operator's semantics); the oracle
    // reproduces that from the same lag-flag construction as q_sessionize.
    Q("q_session_window",
      (s, dir) => StreamingPipeline.sessionWindows(
        Tables.df(s, dir, "events"), gapMinutes = 30),
      Some("""WITH flagged AS (
             |  SELECT user_id, epoch_us(ts) AS tsu,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)))
             |SELECT user_id,
             |  MIN(tsu) AS session_start_us,
             |  MAX(tsu) + 1800000000 AS session_end_us,
             |  COUNT(*) AS n_events
             |FROM (
             |  SELECT user_id, tsu, SUM(new_session) OVER (
             |    PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING)
             |    AS session_seq
             |  FROM flagged)
             |GROUP BY user_id, session_seq""".stripMargin)),

    // --------------------------------------------- streaming hourly rollup
    // A REAL readStream→window agg→writeStream pass (AvailableNow, update-mode
    // foreachBatch → parquet, checkpointed) whose final table is checked
    // against plain SQL.
    Q("q_stream_hourly_rollup",
      (s, dir) => {
        Tables.df(s, dir, "events") // ensures nanosAsLong is set first
        val name = s"rollup_${System.nanoTime()}"
        StreamingPipeline.hourlyEventRollup(s, s"$dir/events.parquet",
          Tables.scratchDir("ckpt"), name)
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // --------------------------------- stateful mapGroupsWithState totals
    // Custom keyed state (GroupState) through a real checkpointed streaming
    // run: with a fresh checkpoint the post-run totals are exactly the batch
    // per-user counts, so the opaque state function IS oracle-checkable.
    Q("q_stream_user_totals",
      (s, dir) => {
        Tables.df(s, dir, "events") // ensures nanosAsLong is set first
        StreamingPipeline.statefulUserCounts(s, s"$dir/events.parquet",
          Tables.scratchDir("state_ckpt"),
          s"user_totals_${System.nanoTime()}")
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS user_id,
             |  COUNT(*) AS total_events
             |FROM events GROUP BY user_id""".stripMargin))
  )
}
