package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.model._

/** SURVEY §7.4.2 resumability property: splitting a (ts,id) stream into
  * arbitrary chunk sizes via the hybrid keyset predicate reproduces exactly
  * the full scan — including across equal-timestamp runs (the reference's
  * historical equal-ts bug, base.py:450). Uses scalacheck generators sampled
  * with fixed seeds (the scalatest/scalacheck bridge artifact isn't on the
  * offline classpath). */
class CdcChunkingSpec extends AnyFunSuite with SparkTestBase {

  private def mkDf(rows: Seq[(java.sql.Timestamp, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("ts", "id")
  }

  // timestamps drawn from a TINY pool so equal-ts runs are common
  private val genCase: Gen[(List[Int], Int)] = for {
    n <- Gen.choose(1, 40)
    ts <- Gen.listOfN(n, Gen.choose(0, 5))
    chunk <- Gen.choose(1, 7)
  } yield (ts, chunk)

  private def runChunked(df: org.apache.spark.sql.DataFrame,
                         strategy: CdcStrategy, nRows: Int): Set[Long] = {
    var cursor = Cursor()
    var seen = Set.empty[Long]
    var iterations = 0
    var done = false
    while (!done && iterations < nRows + 2) {
      val batch = strategy.scanSpec(cursor)(df)
      val ids = batch.select("id").collect().map(_.getLong(0)).toSet
      if (ids.isEmpty) done = true
      else {
        assert((seen & ids).isEmpty, "chunk re-emitted already-seen rows")
        seen ++= ids
        cursor = strategy.extractCursor(batch)
      }
      iterations += 1
    }
    seen
  }

  test("hybrid keyset chunking reproduces the full scan for any split") {
    val cfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("ts"), idColumn = Some("id"))
    (1 to 10).foreach { i =>
      val (tsList, chunkSize) =
        genCase(Gen.Parameters.default, Seed(i.toLong)).get
      val rows = tsList.zipWithIndex.map { case (t, idx) =>
        (java.sql.Timestamp.valueOf(f"2026-01-01 00:00:0$t%d"), idx.toLong)
      }
      val df = mkDf(rows).cache()
      try {
        val strategy = CdcStrategy(cfg.copy(maxRowsPerRun = Some(chunkSize.toLong)))
        val seen = runChunked(df, strategy, rows.size)
        assert(seen == rows.map(_._2).toSet,
          s"chunked union != full scan (seed=$i chunk=$chunkSize)")
      } finally df.unpersist()
    }
  }

  test("hybrid keyset chunking survives MILLISECOND timestamps (cursor keeps " +
    "sub-second precision)") {
    // Before CdcStrategy.CursorTsFormat carried micros, the cursor was
    // truncated to the second, so rows later in the same second were
    // re-extracted next chunk — the `(seen & ids).isEmpty` assert catches it.
    val cfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("ts"), idColumn = Some("id"))
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    (1 to 10).foreach { i =>
      val (tsList, chunkSize) =
        genCase(Gen.Parameters.default, Seed(100L + i)).get
      // timestamps a few MILLISECONDS apart (equal-ms runs still common)
      val rows = tsList.zipWithIndex.map { case (t, idx) =>
        (new java.sql.Timestamp(base + t), idx.toLong)
      }
      val df = mkDf(rows).cache()
      try {
        val strategy = CdcStrategy(cfg.copy(maxRowsPerRun = Some(chunkSize.toLong)))
        val seen = runChunked(df, strategy, rows.size)
        assert(seen == rows.map(_._2).toSet,
          s"chunked union != full scan (seed=${100 + i} chunk=$chunkSize)")
      } finally df.unpersist()
    }
  }

  test("id-only chunking reproduces the full scan") {
    val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("id"),
      maxRowsPerRun = Some(3L))
    val rows = (0L until 11L).map(i =>
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), i))
    val df = mkDf(rows)
    val seen = runChunked(df, CdcStrategy(cfg), rows.size)
    assert(seen == (0L until 11L).toSet)
  }

  test("unix-epoch timestamp variant: scan + cursor round-trip") {
    // S1 variant: the CDC column is epoch SECONDS as a long
    // (ref cdc_strategy_engine.py:224-251 `ts > UNIX_TIMESTAMP(:wm)`)
    val s = spark
    import s.implicits._
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val df = (0L until 10L).map(i => (base + i * 3600, i)).toDF("ts", "id")
    val cfg = CdcConfig(CdcStrategyKind.TimestampOnly,
      timestampColumn = Some("ts"), timestampIsUnixEpoch = true)
    val strategy = CdcStrategy(cfg)
    // full scan from empty cursor, then resume after consuming everything
    val full = strategy.scanSpec(Cursor())(df)
    assert(full.count() == 10)
    val cursor = strategy.extractCursor(df)
    assert(cursor.lastTimestamp.contains("2024-01-01 09:00:00"))
    assert(strategy.scanSpec(cursor)(df).count() == 0)
    // resume mid-stream: cursor at hour 4 → 5 rows remain
    val mid = strategy.scanSpec(Cursor(Some("2024-01-01 04:00:00")))(df)
    assert(mid.select("id").collect().map(_.getLong(0)).toSet ==
      Set(5L, 6L, 7L, 8L, 9L))
  }

  test("HYBRID unix-epoch variant: keyset scan + cursor round-trip") {
    // the hybrid cursor reduction must take the same epoch branch the
    // timestamp-only strategy does — date_format on the raw BIGINT fails
    // analysis, so every hybrid+epoch extract would die after staging
    val s = spark
    import s.implicits._
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val df = (0L until 10L).map(i => (base + (i / 2) * 3600, i)).toDF("ts", "id")
    val cfg = CdcConfig(CdcStrategyKind.Hybrid,
      timestampColumn = Some("ts"), idColumn = Some("id"),
      timestampIsUnixEpoch = true)
    val strategy = CdcStrategy(cfg)
    assert(strategy.scanSpec(Cursor())(df).count() == 10)
    val cursor = strategy.extractCursor(df)
    assert(cursor.lastTimestamp.contains("2024-01-01 04:00:00"))
    assert(cursor.lastId.contains(9L))
    assert(strategy.scanSpec(cursor)(df).count() == 0)
    // resume at an equal-timestamp boundary: (04:00, id=8) → only id 9 left
    val mid = strategy.scanSpec(
      Cursor(Some("2024-01-01 04:00:00"), Some(8L)))(df)
    assert(mid.select("id").collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("full_sync ignores max_rows_per_run (pagination dissolved by design)") {
    val cfg = CdcConfig(CdcStrategyKind.FullSync, maxRowsPerRun = Some(3L))
    val spec = CdcStrategy(cfg).scanSpec(Cursor())
    assert(spec.limit.isEmpty,
      "a row cap on a full snapshot would re-stage the same arbitrary subset forever")
  }

  test("scan limit clamps Long caps instead of wrapping to negative") {
    val s = spark
    import s.implicits._
    val df = (1L to 5L).toDF("id")
    val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("id"),
      maxRowsPerRun = Some(3000000000L)) // toInt would wrap negative
    assert(CdcStrategy(cfg).scanSpec(Cursor())(df).count() == 5)
  }

  test("timestamp-only chunking converges (coarse cursor, no dup guarantee lost)") {
    // ts-only CANNOT split equal-ts runs safely; verify it still covers all
    // rows when chunk boundaries align with distinct timestamps
    val cfg = CdcConfig(CdcStrategyKind.TimestampOnly,
      timestampColumn = Some("ts"), maxRowsPerRun = None)
    val rows = (0 until 9).map(i =>
      (java.sql.Timestamp.valueOf(f"2026-01-01 00:00:0${i % 10}%d"), i.toLong))
    val df = mkDf(rows)
    val strategy = CdcStrategy(cfg)
    val full = strategy.scanSpec(Cursor())(df).count()
    assert(full == 9)
    // after consuming everything, the next scan is empty
    val cursor = strategy.extractCursor(df)
    assert(strategy.scanSpec(cursor)(df).count() == 0)
  }
}
