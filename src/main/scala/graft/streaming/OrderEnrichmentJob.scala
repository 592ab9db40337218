package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.GraftFunctions.timestamp_to_string
import graft.operators.IntervalJoin
import graft.sources.Json

/** The reference job (StreamingJob.java) recreated Spark-native.
  *
  * Reference pipeline: two Kinesis JSON streams -> POJO mapping ->
  * ascending-timestamp watermarks -> dynamic tables -> SQL interval
  * join -> append stream -> JSON sink. Here: two raw JSON sources
  * (any readStream: kafka/file/socket/memory — anything with a
  * string `value` column) -> `from_json` with explicit schemas ->
  * `withWatermark` -> stream-stream interval join with an event-time
  * constraint (Spark GC's join state from the watermark + bound) ->
  * `to_json` sink.
  *
  * `enrich` is engine-agnostic: given batch frames it produces the
  * identical result via the time-bucketed batch interval join
  * (IntervalJoin.bucketed), which is the 100 TB-safe plan.
  */
object OrderEnrichmentJob {
  /** Reference POJOs (Order.java, ExchangeRate.java, Result.java). */
  case class Order(id: Int, orderTime: java.sql.Timestamp, amount: Int, currency: String)
  case class ExchangeRate(exchangeRateTime: java.sql.Timestamp, currency: String, rate: Int)
  case class Result(id: Int, orderTime: String, originalAmount: Int, convertedAmount: Int)

  /** The reference's exact query (StreamingJob.java:94-105): LEFT
    * interval join on currency with rate time in (orderTime - delta,
    * orderTime], projecting the Result shape. Plus `rate_time` so the
    * output has a deterministic total order (an order can match
    * several rates).
    */
  def enrich(orders: DataFrame, rates: DataFrame, delta: Duration): DataFrame = {
    val r = rates.withColumnRenamed("currency", "r_currency")
    val joined =
      if (orders.isStreaming || rates.isStreaming) {
        // Stream-stream: express the bound directly on the watermarked
        // timestamp columns so Spark derives state-cleanup thresholds.
        val cond = orders("currency") === r("r_currency") &&
          r("exchangeRateTime") <= orders("orderTime") &&
          r("exchangeRateTime") > orders("orderTime") - expr(
            s"INTERVAL ${delta.toMillis} MILLISECOND")
        orders.join(r, cond, "left_outer")
      } else {
        IntervalJoin.bucketed(orders, r, "currency", "r_currency",
          "orderTime", "exchangeRateTime", delta, "left_outer")
      }
    joined.select(
      col("id"),
      timestamp_to_string(col("orderTime")).as("order_time"),
      col("amount").as("original_amount"),
      (col("amount") * col("rate")).as("converted_amount"),
      timestamp_to_string(col("exchangeRateTime")).as("rate_time"))
  }

  /** Full streaming pipeline from raw JSON-line sources to a JSON-line
    * output stream; returns the unstarted output frame. */
  def pipeline(rawOrders: DataFrame, rawRates: DataFrame,
      delta: Duration = Duration.ofSeconds(5),
      watermark: String = "10 seconds"): DataFrame = {
    val orders = Json.parse(rawOrders, Json.orderSchema)
      .withWatermark("orderTime", watermark)
    val rates = Json.parse(rawRates, Json.exchangeRateSchema)
      .withWatermark("exchangeRateTime", watermark)
    Json.toJsonLines(enrich(orders, rates, delta))
  }

  /** Start the pipeline against file-based JSON directories (swap for
    * kafka options in production; Spark's source API is uniform). */
  def run(spark: SparkSession, ordersDir: String, ratesDir: String,
      outDir: String, checkpointDir: String,
      delta: Duration = Duration.ofSeconds(5)): StreamingQuery = {
    val rawOrders = spark.readStream.format("text").load(ordersDir)
    val rawRates = spark.readStream.format("text").load(ratesDir)
    pipeline(rawOrders, rawRates, delta)
      .writeStream.format("text")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .start()
  }
}
