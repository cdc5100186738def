package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown reaching the scan, map-side partial aggregation,
  * broadcast dimensions, column pruning) must survive refactors. */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def executedString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collectLeaves().flatMap(_.collect {
      case s: FileSourceScanExec => s
    })

  test("hybrid keyset predicate pushes down to the parquet scan") {
    val scan = scans(q("q_cdc_hybrid_scan")).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("Or(GreaterThan(o_orderdate"),
      s"keyset OR not pushed: $pushed")
    assert(pushed.contains("GreaterThan(o_orderkey,750)"))
  }

  test("q1 aggregation is two-phase (map-side partial before the exchange)") {
    val plan = executedString(q("q1_pricing_summary"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "missing partial+final HashAggregate pair")
    assert("Exchange".r.findAllIn(plan).size == 1,
      "q1 should shuffle exactly once (group-by exchange)")
  }

  test("star join broadcasts the dimension tables") {
    val plan = executedString(q("q_star_join_revenue"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "nation/region should broadcast")
  }

  test("projection prunes the parquet read schema") {
    // q_cdc_id_scan selects 3 columns of events — the scan must not read more
    val scan = scans(q("q_cdc_id_scan")).head
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("event_id") && readSchema.contains("event_type"))
    assert(!readSchema.contains("value"), s"unpruned scan: $readSchema")
    assert(!readSchema.contains("ts"), s"unpruned scan: $readSchema")
  }

  test("minhash candidate generation shuffles only ids and band keys") {
    val df = graft.functions.DedupFunctions.minhashCandidatePairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("sh") && !cols.contains("hs"),
        s"payload column rides an exchange: $cols")
    }
  }

  test("top-k is TakeOrdered, not a global sort") {
    val plan = executedString(q("q_topk_customers"))
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT+ORDER BY should be top-k, not full sort")
  }
}
