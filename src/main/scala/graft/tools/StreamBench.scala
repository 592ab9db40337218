package graft.tools

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.streaming.OrderEnrichmentJob
import graft.streaming.OrderEnrichmentJob.{ExchangeRate, Order}

/** Streaming throughput benchmark: pushes a large batch of orders +
  * rates through the watermarked stream-stream enrichment join and
  * reports sustained records/second. The reference runs this workload
  * at 100 orders/s + 1 rate/s (README "Generate the Sample Data"); a
  * single local node should clear that by orders of magnitude.
  */
object StreamBench {
  def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  def main(args: Array[String]): Unit = {
    val nOrders = args.headOption.map(_.toInt).getOrElse(200000)
    val nRates = nOrders / 100
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val currencies = Array("EUR", "USD", "GBP", "AUD", "CAD")
    val orders = MemoryStream[Order]
    val rates = MemoryStream[ExchangeRate]
    val enriched = OrderEnrichmentJob.enrich(
      orders.toDS().toDF().withWatermark("orderTime", "10 seconds"),
      rates.toDS().toDF().withWatermark("exchangeRateTime", "10 seconds"),
      Duration.ofSeconds(5))
    val q = enriched.writeStream.format("memory").queryName("sb")
      .outputMode("append").start()

    // warmup batch
    orders.addData((0 until 1000).map(i =>
      Order(i, ts(1 + i / 100), 100, currencies(i % 5))))
    rates.addData((0 until 10).map(i =>
      ExchangeRate(ts(1 + i), currencies(i % 5), 2 + i)))
    q.processAllAvailable()

    val t0 = System.nanoTime()
    orders.addData((0 until nOrders).map(i =>
      Order(i + 1000000, ts(100 + i / 100), 100 + i % 900, currencies(i % 5))))
    rates.addData((0 until nRates).map(i =>
      ExchangeRate(ts(100 + i), currencies(i % 5), 2 + i % 98)))
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val outRows = spark.sql("SELECT count(*) FROM sb").collect().head.getLong(0)
    println(f"""{"streaming_orders":$nOrders,"rates":$nRates,"seconds":$secs%.2f,"orders_per_sec":${nOrders / secs}%.0f,"output_rows":$outRows}""")
    q.stop(); spark.stop()
  }
}
