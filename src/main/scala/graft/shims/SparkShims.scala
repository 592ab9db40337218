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

  /** Spark's own ANALYZE column-stats aggregate (ONE distributed job
    * over the plan): (rowCount, per-attribute NDV/min/max/nulls/len)
    * — the CommandUtils seam AnalyzeColumnCommand itself rides. */
  def computeColumnStats(spark: SparkSession, plan: LogicalPlan,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : (Long, Map[org.apache.spark.sql.catalyst.expressions.Attribute,
        org.apache.spark.sql.catalyst.plans.logical.ColumnStat]) =
    org.apache.spark.sql.execution.command.CommandUtils.computeColumnStats(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan, attrs)

  /** Block until all queued listener events are delivered, so task
    * metrics accumulated by a SparkListener are complete for the jobs
    * that have already finished (the bus is async). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Re-tag a batch DataFrame as STREAMING — what a v1
    * `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`; FileStreamSource does exactly this via the same
    * `internalCreateDataFrame(…, isStreaming = true)` seam). The rows
    * and schema are the batch plan's own; only the flag changes. */
  def asStreamingDataFrame(
      df0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val df = df0.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    df.sparkSession.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse of [[asStreamingDataFrame]]: materialize a v1
    * `Sink.addBatch` micro-batch (a STREAMING-tagged plan the plain
    * DataFrame writer refuses) as a batch DataFrame over the same
    * rows — the seam FileStreamSink-style sinks write through. */
  def asBatchDataFrame(
      df0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val df = df0.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    df.sparkSession.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** `Dataset.localCheckpoint` drops the physical layout's
    * partitioning at the LogicalRDD boundary when AQE is on (the
    * adaptive root reports no outputPartitioning), so an iterative
    * operator that checkpoints per-round state pays a re-Exchange of
    * that state in the next round's join even though the rows already
    * sit hash-partitioned on the join key. This mirrors the eager
    * localCheckpoint but captures the FINAL adaptive plan's TRUE
    * outputPartitioning and outputOrdering into the LogicalRDD —
    * downstream joins/aggs on the same key then reuse the layout
    * (including AQE's CoalescedHashPartitioning, which still
    * satisfies the clustered distribution). The declared layout is
    * read from the executed plan itself, never asserted, so it
    * cannot misdescribe the rows. */
  def localCheckpointKeepingLayout(
      df0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val df = df0.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val spark = df.sparkSession
    val qe = df.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager, like localCheckpoint(true): lineage flattens NOW
    val finalPlan = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // NOTE (r14, measured): a bare LogicalRDD reports
    // defaultSizeInBytes, so joins downstream of a checkpoint lose
    // broadcast eligibility. Passing originStats =
    // Some(qe.optimizedPlan.stats) here was tried and MEASURED WORSE
    // on the iterative graph family (g2 standalone: 40.9 MB shuffle
    // write / 3.98 s vs 34.2 MB / 3.37 s without) — the restored
    // estimates flip per-round joins to broadcast, repaying the
    // build-side broadcast with per-round rebuilds.
    // NOTE (r15, measured): the CAPPED estimate min(originStats,
    // autoBroadcastJoinThreshold + 1) — restore a size signal without
    // making a larger-than-threshold checkpoint broadcast-eligible —
    // was A/B'd twice on the checkpoint-heavy set (g2/g4/g7/g8/g11/
    // g12/g17/x32, BENCH_ONLY sf0.1/32c): stats-less 36.4/33.2 s,
    // capped 34.1/41.4 s — flat within host noise, slightly worse on
    // average, and per-query winners flipped between repeats. Default
    // stays stats-less; the env gate (SPARK_GRAFT_CKPT_CAPPED_STATS=1)
    // remains for re-measurement on a quieter host.
    val originStats =
      if (!sys.env.get("SPARK_GRAFT_CKPT_CAPPED_STATS").contains("1")) None
      else {
        val thresh = spark.asInstanceOf[
          org.apache.spark.sql.classic.SparkSession]
          .sessionState.conf.autoBroadcastJoinThreshold
        Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = qe.optimizedPlan.stats.sizeInBytes
            .min(BigInt(thresh) + 1)))
      }
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD(
        qe.analyzed.output, rdd, finalPlan.outputPartitioning,
        finalPlan.outputOrdering, false, None)(spark,
        originStats = originStats).newInstance())
  }

  /** Serializable wrapper for a Hadoop Configuration (the class Spark
    * itself ships to tasks that do filesystem work; it is
    * `private[spark]`, hence surfaced through this shim). */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration):
      org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
