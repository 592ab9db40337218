package graft

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{OrderEnrichmentJob, StatefulOps}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("stream-stream interval join pipeline (MemoryStream end to end)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[String]
    val rates = MemoryStream[String]
    val out = OrderEnrichmentJob.pipeline(
      orders.toDF().toDF("value"), rates.toDF().toDF("value"),
      Duration.ofSeconds(5))
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      rates.addData("""{"exchangeRateTime": "2024-01-01T00:00:00Z", "currency": "EUR", "rate": 3}""")
      orders.addData("""{"id": 7, "orderTime": "2024-01-01T00:00:02Z", "amount": 10, "currency": "EUR"}""")
      q.processAllAvailable()
      val rows = spark.sql("SELECT value FROM enriched").as[String].collect()
      assert(rows.exists(r => r.contains("\"id\":7") && r.contains("\"converted_amount\":30")),
        s"expected enriched order, got ${rows.mkString("; ")}")
    } finally q.stop()
  }

  test("stateful sessionization emits finalized sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulOps.Evt]
    val sessions = StatefulOps.sessionize(
      in.toDS().withWatermark("ts", "0 seconds").as[StatefulOps.Evt],
      Duration.ofMinutes(10))
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: two events 1 min apart; then a gap > 10 min.
      // (start away from epoch 0: the initial watermark is 0 and rows
      // at-or-before the watermark are dropped as late)
      in.addData(StatefulOps.Evt(1L, ts(1000), 2.0), StatefulOps.Evt(1L, ts(1060), 3.0))
      q.processAllAvailable()
      // new event far beyond the gap closes session 1 in-stream
      in.addData(StatefulOps.Evt(1L, ts(4600), 5.0))
      q.processAllAvailable()
      // watermark push: unrelated user event advances event time so the
      // timeout finalizes session 2
      in.addData(StatefulOps.Evt(2L, ts(99999), 1.0))
      q.processAllAvailable()
      in.addData(StatefulOps.Evt(2L, ts(999999), 1.0))
      q.processAllAvailable()

      val rows = spark.sql("SELECT * FROM sessions WHERE user_id = 1")
        .as[StatefulOps.SessionOut].collect().sortBy(_.session_start.getTime)
      assert(rows.length == 2, s"expected 2 closed sessions, got ${rows.toSeq}")
      assert(rows(0).n_events == 2 && rows(0).total_value == 5.0)
      assert(rows(1).n_events == 1 && rows(1).total_value == 5.0)
    } finally q.stop()
  }

  test("streaming as-of join: watermark-correct matching incl. late rates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[OrderEnrichmentJob.Order]
    val rates = MemoryStream[OrderEnrichmentJob.ExchangeRate]
    val out = StatefulOps.asOfEnrich(orders.toDS(), rates.toDS(), "5 seconds")
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // rate@100, order@110 arrive; order NOT emitted yet (wm behind)
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(100), "EUR", 3))
      orders.addData(OrderEnrichmentJob.Order(1, ts(110), 10, "EUR"))
      q.processAllAvailable()
      // a LATE rate@107 (above the watermark of 110-5=105, so not
      // dropped) arrives before the watermark passes 110 -> must win
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(107), "EUR", 7))
      q.processAllAvailable()
      // advance the watermark well past 110 via a later rate tick
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(500), "EUR", 9))
      q.processAllAvailable()
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(900), "EUR", 11))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, rate, converted FROM asof_stream").collect()
      assert(rows.length == 1, s"expected exactly one enriched order, got ${rows.toSeq}")
      assert(rows(0).getInt(1) == 7 && rows(0).getInt(2) == 70,
        s"late rate@107 must win: ${rows(0)}")
      // order on a key with no prior rate (ts above current watermark
      // so it is not dropped as late) -> null-extended once wm passes
      orders.addData(OrderEnrichmentJob.Order(2, ts(1000), 5, "GBP"))
      q.processAllAvailable()
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(2000), "GBP", 2))
      q.processAllAvailable()
      rates.addData(OrderEnrichmentJob.ExchangeRate(ts(3000), "GBP", 2))
      q.processAllAvailable()
      val gbp = spark.sql("SELECT rate FROM asof_stream WHERE id = 2").collect()
      assert(gbp.length == 1 && gbp(0).isNullAt(0), s"no-prior-rate order must null-extend: ${gbp.toSeq}")
    } finally q.stop()
  }

  test("streaming tumbling-window aggregation with watermark (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulOps.Evt]
    val agg = in.toDF().withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val q = agg.writeStream.format("memory").queryName("tumbled")
      .outputMode("append").start()
    try {
      in.addData(StatefulOps.Evt(1, ts(10), 1.0), StatefulOps.Evt(2, ts(20), 2.0))
      q.processAllAvailable()
      // watermark must pass the window end before append emits it
      in.addData(StatefulOps.Evt(3, ts(7200), 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT n, total FROM tumbled").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 2 && rows(0).getDouble(1) == 3.0,
        s"expected finalized first window, got ${rows.mkString(";")}")
    } finally q.stop()
  }
}
