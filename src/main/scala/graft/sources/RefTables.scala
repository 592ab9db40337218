package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic derivation of the reference's two stream tables
  * (Orders / ExchangeRates, README "Generate the Sample Data") from
  * the shared `events` table, so the enrichment queries are
  * oracle-checkable in DuckDB over the same parquet. `purchase`
  * events become orders; `click` events become exchange-rate ticks;
  * currency is a deterministic function of user_id.
  *
  * The SQL fragments below are the DuckDB-dialect mirrors — keep the
  * two in lockstep.
  */
object RefTables {
  val currencies: Seq[String] = Seq("EUR", "USD", "GBP", "AUD", "CAD")

  private def currencyCol = element_at(
    array(currencies.map(lit): _*), (col("user_id") % 5).cast("int") + 1)

  /** Order(id, orderTime, amount, currency) — Order.java:4-9 shape. */
  def orders(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase").select(
      col("event_id").cast("int").as("id"),
      col("ts").as("orderTime"),
      floor(col("value")).cast("int").as("amount"),
      currencyCol.as("currency"))

  /** ExchangeRate(exchangeRateTime, currency, rate) — ExchangeRate.java:5-10. */
  def rates(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click").select(
      col("ts").as("exchangeRateTime"),
      currencyCol.as("currency"),
      (floor(col("value")).cast("int") % 100 + 2).as("rate"))

  private val currencySql =
    "(['EUR','USD','GBP','AUD','CAD'])[CAST(user_id % 5 AS INT) + 1]"

  /** DuckDB CTE mirroring `orders`. */
  val ordersSql: String =
    s"""SELECT CAST(event_id AS INT) AS id, CAST(ts AS TIMESTAMP) AS order_ts,
       | CAST(floor(value) AS INT) AS amount, $currencySql AS currency
       | FROM events WHERE event_type = 'purchase'""".stripMargin.replace("\n", "")

  /** DuckDB CTE mirroring `rates`. */
  val ratesSql: String =
    s"""SELECT CAST(ts AS TIMESTAMP) AS rate_ts, $currencySql AS currency,
       | CAST(floor(value) AS INT) % 100 + 2 AS rate
       | FROM events WHERE event_type = 'click'""".stripMargin.replace("\n", "")
}
