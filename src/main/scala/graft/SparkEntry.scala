package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, EtlQueries, ExtQueries, LlmQueries, OlapQueries, Tables}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all.find(_.name == "q_star_join_revenue").get
      .fn(spark, "/root/testdata/sf0.001")

  private def allQ =
    CoreQueries.all ++ LlmQueries.all ++ EtlQueries.all ++ ExtQueries.all ++
      OlapQueries.all

  /** One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
