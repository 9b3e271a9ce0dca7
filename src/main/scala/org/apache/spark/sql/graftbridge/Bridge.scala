package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (the Column API became backend-agnostic in SPARK-44111's
  * sql-api split), so third-party Catalyst expressions need a shim inside
  * the org.apache.spark.sql package tree — the same pattern libraries like
  * frameless use. No Spark internals are modified; this only re-exports
  * two conversion functions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the storage behind a `localCheckpoint()`ed frame. The checkpoint
    * materializes the plan into a persisted internal RDD wrapped in a
    * LogicalRDD scan; `Dataset.unpersist` can't reach it (the cache
    * manager never registered it), so iterative algorithms that checkpoint
    * per round would otherwise pin every round's blocks in executor
    * storage until the RDD happens to be GC'd on the driver.
    */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Runtime function registration on a live session (the session-build
    * path is SparkSessionExtensions.injectFunction; this is the attach
    * form used by tests/notebooks).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
