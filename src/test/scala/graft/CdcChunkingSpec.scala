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

  test("id-only chunking reproduces the full scan") {
    val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("id"),
      maxRowsPerRun = Some(3L))
    val rows = (0L until 11L).map(i =>
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), i))
    val df = mkDf(rows)
    val seen = runChunked(df, CdcStrategy(cfg), rows.size)
    assert(seen == (0L until 11L).toSet)
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
