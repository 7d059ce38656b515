package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * Spark 4 backs `Column` by ColumnNode, so extension libraries need this
  * one-hop package to lift a custom Catalyst `Expression` into a `Column`
  * (the conventional pattern for Spark-native extension libs). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a Dataset. */
  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Drain the async listener bus (`private[spark]` API): the bench's
    * per-key executor-CPU attribution reads an accumulating
    * SparkListener, and without a drain between keys the task-end
    * events of key N's last stage can post after key N+1's snapshot —
    * CPU bleeding across keys. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
