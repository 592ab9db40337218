package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.FileManifest

/** STREAM-STATIC enrichment against a GOVERNED dimension: each
  * micro-batch re-resolves a named branch of the dimension's version
  * store and joins the facts against the version it points at — the
  * Delta/Iceberg stream-static contract (the static side is
  * re-planned per batch, so a one-marker `fastForward` publish
  * becomes visible to the NEXT micro-batch, atomically, with zero
  * coordination between the publisher and the running stream).
  * Composed with c5's write-audit-publish this closes the loop: a
  * batch lands on the audit branch, the audit gate publishes, and
  * every running enrichment stream picks up the new snapshot at its
  * next batch — unaudited data is never joined.
  *
  * The join itself is the reference's enrichment shape
  * (StreamingJob.java:94-105) with the dimension read through the
  * manifest (partition + footer-stat pruned scan). A dimension that
  * fits the broadcast threshold broadcasts per batch; a huge one
  * shuffles — either way semantics are per-batch-snapshot.
  */
object GovernedEnrich {
  /** One batch's enrichment — shared verbatim by the batch query
    * entry and the per-micro-batch closure, so the streaming path
    * cannot drift from the oracle-checked batch path. */
  def enrichBatch(spark: SparkSession, facts: DataFrame, vroot: String,
      ref: String, factKey: String, dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    val dim = FileManifest.readPrunedPartitioned(spark,
        FileManifest.loadRef(spark, vroot, ref), None, Long.MinValue,
        Long.MaxValue)
      .select((dimKey +: dimCols).map(col): _*)
    facts.join(dim, facts(factKey) === dim(dimKey)).drop(dimKey)
  }

  /** Run the continuous enrichment: facts stream → per-batch
    * branch-resolved join → `sink(batchDf, batchId)`. The sink
    * receives each enriched micro-batch (idempotence is the sink's
    * contract, as in AlertSink). */
  def stream(spark: SparkSession, facts: DataFrame, vroot: String,
      ref: String, factKey: String, dimKey: String, dimCols: Seq[String],
      checkpoint: String)(sink: (DataFrame, Long) => Unit)
      : StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(enrichBatch(spark, batch, vroot, ref, factKey, dimKey,
          dimCols), id)
      }
      .start()
}
