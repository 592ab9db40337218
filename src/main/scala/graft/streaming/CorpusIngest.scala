package graft.streaming

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextAnalysis}

/** Continuous corpus ingestion: the batch LLM-pipeline operators
  * composed as ONE Structured Streaming flow, proving the text ops are
  * streaming-safe (they are pure codegen'd column expressions, so the
  * same columns the batch x1/x2/x3/x8 queries produce appear on a
  * stream with no code changes).
  *
  * Stages per micro-batch:
  *   1. PII scrub (staged email/phone/IPv4 masking, `CorpusOps.maskPii`)
  *   2. language ID + quality metrics + token counts over the MASKED
  *      text (`TextAnalysis`)
  *   3. exact streaming dedup on the normalized content hash via
  *      `dropDuplicatesWithinWatermark` — same normalization as the
  *      batch `Dedup.exact`, but with state GC'd by the watermark, so
  *      state size tracks the watermark window, not the stream length
  *      (the scale requirement for an unbounded stream)
  *   4. a quality gate (keep docs above `minQuality`)
  *
  * Downstream, `throughput` windows the accepted docs per language —
  * the monitoring aggregate an ingestion service alarms on.
  */
object CorpusIngest {
  case class Doc(doc_id: Long, ingest_ts: java.sql.Timestamp, text: String)

  /** docs(doc_id, ingest_ts, text) -> accepted docs with analysis
    * columns. Works identically on batch and streaming frames. */
  def pipeline(docs: DataFrame, watermark: Duration,
      minQuality: Double = 0.0): DataFrame = {
    val masked = CorpusOps.maskPii(docs, "text")
    val scored = TextAnalysis.withQualityMetrics(
        masked.withColumn("lang_pred", TextAnalysis.langId(col("masked"))),
        "masked")
      .withColumn("content_hash", xxhash64(lower(trim(col("text")))))
    val deduped =
      if (docs.isStreaming)
        scored.withWatermark("ingest_ts", s"${watermark.toMillis} milliseconds")
          .dropDuplicatesWithinWatermark("content_hash")
      else scored.dropDuplicates("content_hash")
    deduped.where(col("quality_score") >= minQuality)
      .select("doc_id", "ingest_ts", "masked", "lang_pred", "n_tokens",
        "quality_score", "n_emails", "n_phones", "n_ips", "content_hash")
  }

  /** Tumbling-window accepted-doc counts per predicted language. */
  def throughput(accepted: DataFrame, window: Duration): DataFrame =
    accepted
      .groupBy(org.apache.spark.sql.functions.window(col("ingest_ts"),
        s"${window.toMillis} milliseconds"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
}
