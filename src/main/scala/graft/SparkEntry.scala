package graft

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GraftFunctions._
import graft.operators._
import graft.sources.{Json, RefTables, Tables}
import graft.streaming.OrderEnrichmentJob

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Oracle-parity rules (SURVEY §5): aggregate doubles through
  * DECIMAL(18,2) (the data is 2-decimal, so decimal aggregation is
  * exact and engine-independent) and cast back to double at the edge;
  * timestamps leave as strings/dates; every output totally ordered
  * with NULLS FIRST spelled out in the SQL (DuckDB defaults differ).
  */
object SparkEntry {
  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private val d2 = DecimalType(18, 2)
  /** exact 2-decimal sum, emitted as double */
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(d2)).cast("double")
  private val FMT = "%Y-%m-%d %H:%M:%S.%g"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ref_interval_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 reference surface -------------------------------------
    "ref_json_ingest" -> ((s, dir) => {
      val parsed = Json.parse(Json.toJsonLines(RefTables.orders(T(s, dir, "events"))),
        Json.orderSchema)
      parsed.groupBy("currency")
        .agg(count(lit(1)).as("n_orders"), sum("amount").as("total_amount"))
        .orderBy("currency")
    }),
    "ref_interval_join" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val o = RefTables.orders(e)
      val r = RefTables.rates(e).withColumnRenamed("currency", "r_currency")
      IntervalJoin.bucketed(o, r, "currency", "r_currency",
          "orderTime", "exchangeRateTime", Duration.ofHours(6), "left_outer")
        .select(col("id"),
          timestamp_to_string(col("orderTime")).as("order_time"),
          col("amount").as("original_amount"),
          (col("amount") * col("rate")).as("converted_amount"),
          timestamp_to_string(col("exchangeRateTime")).as("rate_time"))
        .orderBy(col("id").asc, col("rate_time").asc_nulls_first)
    }),
    "ref_asof_join" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val o = RefTables.orders(e)
      val r = RefTables.rates(e)
      AsOfJoin.backward(o, r, "currency", "orderTime", "exchangeRateTime",
          Seq("rate", "exchangeRateTime"))
        .select(col("id"),
          col("amount").as("original_amount"),
          col("rate"),
          (col("amount") * col("rate")).as("converted_amount"),
          timestamp_to_string(col("exchangeRateTime")).as("rate_time"))
        .orderBy("id")
    }),
    "ref_timestamp_to_string" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"), timestamp_to_string(col("ts")).as("ts_str"))
        .orderBy("event_id")),
    "ref_json_sink" -> ((s, dir) =>
      Json.toJsonLines(RefTables.orders(T(s, dir, "events"))
          .select("id", "amount", "currency"))
        .orderBy("value")),
    "ref_streaming_pipeline" -> ((s, dir) => {
      val e = T(s, dir, "events")
      OrderEnrichmentJob.enrich(RefTables.orders(e), RefTables.rates(e),
          Duration.ofHours(6))
        .orderBy(col("id").asc, col("rate_time").asc_nulls_first)
    }),

    // ---- §2.2 relational core ---------------------------------------
    "q1_agg" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(d2) * (lit(1).cast(d2) - col("l_discount").cast(d2)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q2_filter_project" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),
    "q3_join_broadcast" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("n_name")
    }),
    "q6_outer_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("spent"))
        .orderBy("c_custkey")
    }),

    // ---- §2.3 event/time-series -------------------------------------
    "t1_tumble" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")),
  )

  /** DuckDB-dialect oracle for each query above. */
  def oracleSql: Map[String, String] = Map(
    "ref_json_ingest" ->
      s"""WITH o AS (${RefTables.ordersSql})
         |SELECT currency, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(amount) AS BIGINT) AS total_amount
         |FROM o GROUP BY currency ORDER BY currency""".stripMargin,
    "ref_interval_join" ->
      s"""WITH o AS (${RefTables.ordersSql}), r AS (${RefTables.ratesSql})
         |SELECT o.id, strftime(o.order_ts, '$FMT') AS order_time,
         |  o.amount AS original_amount, o.amount * r.rate AS converted_amount,
         |  strftime(r.rate_ts, '$FMT') AS rate_time
         |FROM o LEFT JOIN r ON o.currency = r.currency
         |  AND r.rate_ts <= o.order_ts
         |  AND r.rate_ts > o.order_ts - INTERVAL 6 HOUR
         |ORDER BY id ASC, rate_time ASC NULLS FIRST""".stripMargin,
    "ref_asof_join" ->
      s"""WITH o AS (${RefTables.ordersSql}), r AS (${RefTables.ratesSql})
         |SELECT o.id, o.amount AS original_amount, rr.rate,
         |  o.amount * rr.rate AS converted_amount,
         |  strftime(rr.rate_ts, '$FMT') AS rate_time
         |FROM o LEFT JOIN LATERAL (
         |  SELECT r.rate, r.rate_ts FROM r
         |  WHERE r.currency = o.currency AND r.rate_ts <= o.order_ts
         |  ORDER BY r.rate_ts DESC LIMIT 1) rr ON TRUE
         |ORDER BY id""".stripMargin,
    "ref_timestamp_to_string" ->
      s"""SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '$FMT') AS ts_str
         |FROM events ORDER BY event_id""".stripMargin,
    "ref_json_sink" ->
      s"""WITH o AS (${RefTables.ordersSql})
         |SELECT '{"id":' || id || ',"amount":' || amount ||
         |  ',"currency":"' || currency || '"}' AS value
         |FROM o ORDER BY value""".stripMargin,
    "ref_streaming_pipeline" ->
      s"""WITH o AS (${RefTables.ordersSql}), r AS (${RefTables.ratesSql})
         |SELECT o.id, strftime(o.order_ts, '$FMT') AS order_time,
         |  o.amount AS original_amount, o.amount * r.rate AS converted_amount,
         |  strftime(r.rate_ts, '$FMT') AS rate_time
         |FROM o LEFT JOIN r ON o.currency = r.currency
         |  AND r.rate_ts <= o.order_ts
         |  AND r.rate_ts > o.order_ts - INTERVAL 6 HOUR
         |ORDER BY id ASC, rate_time ASC NULLS FIRST""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_broadcast" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q6_outer_join" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "t1_tumble" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |    '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
