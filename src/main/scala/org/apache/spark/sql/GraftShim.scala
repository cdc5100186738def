package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions in Spark 4.x
  * (classic `ExpressionUtils`), so graft's custom Catalyst expressions can be
  * exposed as `Column`s. This is the same access pattern third-party Spark
  * extensions (Delta, Sedona, etc.) use. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the listener bus (`private[spark]`): after this returns, every
    * event of already-completed jobs has reached registered listeners —
    * the bench's per-query stage-metric attribution needs a precise cut
    * between queries. */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** The persisted RDD behind a `localCheckpoint`ed DataFrame (its analyzed
    * plan is a `LogicalRDD`), or None for non-checkpointed frames. Lets
    * iterative operators unpersist SUPERSEDED checkpoints eagerly instead of
    * leaking every iteration's blocks until the ContextCleaner happens by. */
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** The session's function registry (`sessionState` is `private[sql]`) —
    * lets graft register its custom expressions as SQL functions into a
    * session it did not build (the driver owns session construction). */
  def functionRegistry(
      spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.sessionState.functionRegistry
}
