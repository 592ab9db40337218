package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals (Column <-> Expression
  * conversion and the session FunctionRegistry). Lives under
  * org.apache.spark.sql so the accessors resolve; everything else in
  * graft stays in its own namespace.
  */
object SparkShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  def logicalPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].logicalPlan

  def ofRows(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until all queued listener events are delivered, so task
    * metrics accumulated by a SparkListener are complete for the jobs
    * that have already finished (the bus is async). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Serializable wrapper for a Hadoop Configuration (the class Spark
    * itself ships to tasks that do filesystem work; it is
    * `private[spark]`, hence surfaced through this shim). */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration):
      org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
