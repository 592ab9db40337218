package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Idempotent delivery for the data-contract alert stream
  * ([[graft.operators.Expectations.alertStream]]): a `foreachBatch`
  * sink whose unit of delivery is the MICRO-BATCH, keyed by the
  * streaming engine's batchId.
  *
  * Structured Streaming's foreachBatch contract is at-least-once — a
  * crash after the sink ran but before the checkpoint committed
  * REDELIVERS the same batchId with the same rows on restart. Writing
  * each batch to its own `batch=<id>` directory with overwrite turns
  * that replay into a no-op (the rewrite is byte-equivalent), so the
  * sink is exactly-once end to end without any channel coordination —
  * the same determinism-plus-idempotence discipline as [[CdcApply]],
  * minus the merge (alerts are immutable facts, not state).
  *
  * A consumer tailing the directory reads whole batch partitions; a
  * partially-written batch directory is never visible under the final
  * name because parquet commits through the Hadoop output committer's
  * temporary path, and a torn batch left by a crash is overwritten
  * verbatim on redelivery. Alert identity for cross-batch dedup (a
  * window can only alert once: append-mode emission is watermark-
  * final) is (window_start, rule, column) — [[readDelivered]] exposes
  * the batch id as a column so consumers can also resume by it.
  */
object AlertSink {
  /** Deliver one batch: overwrite exactly this batch's directory.
    * Redelivery of a batchId rewrites the same path — idempotent. */
  def deliverBatch(alerts: DataFrame, dir: String, batchId: Long): Unit =
    alerts.write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** Wire an alert stream (the output of `Expectations.alertStream`)
    * into the idempotent sink. */
  def run(alerts: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    alerts.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        deliverBatch(batch.toDF(), dir, id)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** All delivered alerts; `batch` rides along as a partition column
    * so consumers can resume from the last batch they processed. */
  def readDelivered(spark: SparkSession, dir: String): DataFrame = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) spark.emptyDataFrame
    else spark.read.parquet(dir)
  }
}
