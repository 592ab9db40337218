package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series feature preparation over event streams: fixed-grid
  * resampling with forward fill, and OHLC bar downsampling — the two
  * shapes every feature-store / training-data pipeline needs to turn
  * irregular event logs into fixed-cadence model inputs.
  *
  * Reference context: the reference job's use case (README; enrich
  * each order with "the rate applicable at the time of the
  * transaction", StreamingJob.java:94-105) is exactly a
  * last-observation-carried-forward lookup; these operators
  * materialize the same carry-forward semantics onto a regular grid
  * (resample) and compress it into per-bucket summaries (bars).
  *
  * Scale notes: both are one shuffle on the grouping key. The grid is
  * generated ARITHMETICALLY per entity (`sequence` + `explode` — no
  * driver-side calendar, no cross join against a date dimension), so
  * grid size is (entity span / cadence) rows and the forward fill is
  * a single window pass per entity, partition-local after the one
  * hash exchange. Entity histories are the natural partition unit at
  * 100 TB — no global sort anywhere.
  */
object TimeSeries {

  /** Daily-grid resample with forward fill (pandas
    * `resample('1D').last().ffill()` semantics, entity-scoped): one
    * row per `keyCol` per calendar day from the entity's first to its
    * last event day; `filled_value` carries the value of the LATEST
    * event up to that day's end (ties on ts broken by `idCol` — the
    * repo's determinism discipline), `is_gap` marks days with no
    * observation of their own (the carried rows).
    *
    * @return (key, day "yyyy-MM-dd", filled_value, is_gap)
    */
  def resampleDailyFfill(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val span = events
      .groupBy(col(keyCol).as("k"))
      .agg(to_date(min(col(tsCol))).as("d0"),
        to_date(max(col(tsCol))).as("d1"))
    val grid = span.select(col("k"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
    // last observation per (entity, day): argmax by (ts, id) — id
    // breaks same-timestamp ties deterministically
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        struct(col(tsCol), col(idCol), col(valueCol).as("v")).as("obs"))
      .groupBy("k", "day").agg(max(col("obs")).as("obs"))
      .select(col("k"), col("day"), col("obs.v").as("day_value"))
    val w = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("k", "day"), "left")
      .select(col("k").as(keyCol),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        last(col("day_value"), ignoreNulls = true).over(w)
          .as("filled_value"),
        col("day_value").isNull.as("is_gap"))
  }

  /** DuckDB mirror of [[resampleDailyFfill]]: generate_series per
    * entity + the same argmax + last_value IGNORE NULLS window. The
    * value column is CARRIED, never computed on — double parity is
    * bit-exact. */
  def resampleOracleSql(table: String, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): String =
    s"""WITH span AS (SELECT $keyCol AS k,
      |    CAST(min($tsCol) AS DATE) AS d0, CAST(max($tsCol) AS DATE) AS d1
      |  FROM $table GROUP BY 1),
      |grid AS (SELECT k, CAST(gs.g AS DATE) AS day FROM span,
      |  LATERAL (SELECT unnest(generate_series(d0, d1,
      |    INTERVAL 1 DAY)) AS g) gs),
      |ranked AS (SELECT $keyCol AS k, CAST($tsCol AS DATE) AS day,
      |    $valueCol AS v,
      |    row_number() OVER (PARTITION BY $keyCol, CAST($tsCol AS DATE)
      |      ORDER BY $tsCol DESC, $idCol DESC) AS rn
      |  FROM $table),
      |daily AS (SELECT k, day, v AS day_value FROM ranked WHERE rn = 1)
      |SELECT grid.k AS $keyCol, strftime(grid.day, '%Y-%m-%d') AS day,
      |  last_value(daily.day_value IGNORE NULLS) OVER (
      |    PARTITION BY grid.k ORDER BY grid.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  daily.day_value IS NULL AS is_gap
      |FROM grid LEFT JOIN daily ON daily.k = grid.k AND daily.day = grid.day
      |ORDER BY $keyCol, day""".stripMargin

  /** Daily-grid resample with LINEAR INTERPOLATION (pandas
    * `resample('1D').interpolate(method='time')` semantics,
    * entity-scoped) — the gap-fill for continuous signals where
    * [[resampleDailyFfill]]'s step function is wrong (sensor drift,
    * prices between quotes, usage counters): a gap day between
    * observations (d₀,v₀) and (d₁,v₁) takes the straight line
    * v₀ + (v₁−v₀)·(d−d₀)/(d₁−d₀). The grid spans each entity's first
    * to last event day, so every gap day has BOTH neighbors by
    * construction; observation days pass their own value through
    * exactly (the d₁=d₀ guard, no float work at all on them). Per-day
    * observation = the latest event of that day, ties on ts broken by
    * `idCol` (the determinism discipline, shared with ffill).
    *
    * Float parity: the interpolation is the ONE arithmetic the
    * operator performs, written as the same expression tree on both
    * engines — exact integer day deltas cast to double, one divide,
    * one multiply, one add — so IEEE results are bit-identical (the
    * repo's never-round discipline). Same scale shape as ffill: grid
    * generated arithmetically per entity, two window passes after one
    * hash exchange, no global sort.
    *
    * @return (key, day "yyyy-MM-dd", interp_value, is_gap)
    */
  def resampleDailyInterp(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val span = events
      .groupBy(col(keyCol).as("k"))
      .agg(to_date(min(col(tsCol))).as("d0"),
        to_date(max(col(tsCol))).as("d1"))
    val grid = span.select(col("k"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        struct(col(tsCol), col(idCol), col(valueCol).as("v")).as("obs"))
      .groupBy("k", "day").agg(max(col("obs")).as("obs"))
      .select(col("k"), col("day"), col("obs.v").as("day_value"))
    val wPrev = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq("k", "day"), "left")
      .withColumn("day_i",
        datediff(col("day"), lit("1970-01-01").cast("date")))
      .withColumn("obs_pt", when(col("day_value").isNotNull,
        struct(col("day_i").as("d"), col("day_value").as("v"))))
      .withColumn("prev", last(col("obs_pt"), ignoreNulls = true).over(wPrev))
      .withColumn("next", first(col("obs_pt"), ignoreNulls = true).over(wNext))
      .select(col("k").as(keyCol),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        when(col("next.d") === col("prev.d"), col("prev.v"))
          .otherwise(col("prev.v") + (col("next.v") - col("prev.v")) *
            ((col("day_i") - col("prev.d")).cast("double") /
              (col("next.d") - col("prev.d")).cast("double")))
          .as("interp_value"),
        col("day_value").isNull.as("is_gap"))
  }

  /** DuckDB mirror of [[resampleDailyInterp]]: the t10 grid + argmax
    * chain, then the SAME window pair (last/first IGNORE NULLS) and
    * the SAME expression tree for the line — bit-exact doubles. */
  def interpOracleSql(table: String, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): String =
    s"""WITH span AS (SELECT $keyCol AS k,
      |    CAST(min($tsCol) AS DATE) AS d0, CAST(max($tsCol) AS DATE) AS d1
      |  FROM $table GROUP BY 1),
      |grid AS (SELECT k, CAST(gs.g AS DATE) AS day FROM span,
      |  LATERAL (SELECT unnest(generate_series(d0, d1,
      |    INTERVAL 1 DAY)) AS g) gs),
      |ranked AS (SELECT $keyCol AS k, CAST($tsCol AS DATE) AS day,
      |    $valueCol AS v,
      |    row_number() OVER (PARTITION BY $keyCol, CAST($tsCol AS DATE)
      |      ORDER BY $tsCol DESC, $idCol DESC) AS rn
      |  FROM $table),
      |daily AS (SELECT k, day, v AS day_value FROM ranked WHERE rn = 1),
      |g AS (SELECT grid.k, grid.day, daily.day_value,
      |    grid.day - DATE '1970-01-01' AS day_i,
      |    last_value(CASE WHEN daily.day_value IS NOT NULL
      |        THEN grid.day - DATE '1970-01-01' END IGNORE NULLS) OVER (
      |      PARTITION BY grid.k ORDER BY grid.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
      |    last_value(daily.day_value IGNORE NULLS) OVER (
      |      PARTITION BY grid.k ORDER BY grid.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
      |    first_value(CASE WHEN daily.day_value IS NOT NULL
      |        THEN grid.day - DATE '1970-01-01' END IGNORE NULLS) OVER (
      |      PARTITION BY grid.k ORDER BY grid.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d,
      |    first_value(daily.day_value IGNORE NULLS) OVER (
      |      PARTITION BY grid.k ORDER BY grid.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
      |  FROM grid LEFT JOIN daily ON daily.k = grid.k
      |    AND daily.day = grid.day)
      |SELECT k AS $keyCol, strftime(day, '%Y-%m-%d') AS day,
      |  CASE WHEN next_d = prev_d THEN prev_v
      |       ELSE prev_v + (next_v - prev_v) *
      |         (CAST(day_i - prev_d AS DOUBLE) /
      |           CAST(next_d - prev_d AS DOUBLE)) END AS interp_value,
      |  day_value IS NULL AS is_gap
      |FROM g ORDER BY $keyCol, day""".stripMargin

  /** OHLC bar downsampling: per (group, calendar day) emit the
    * opening value (first observation by (ts, id)), high, low,
    * closing value (last by (ts, id)), and the observation count —
    * candlestick compression of an irregular series into fixed
    * buckets. Open/close use the argmin/argmax-by-(ts,id) determinism
    * discipline; high/low are plain min/max. All values CARRIED
    * doubles — no float arithmetic, so oracle parity is bit-exact.
    *
    * @return (group, day "yyyy-MM-dd", open, high, low, close, n_obs)
    */
  def ohlcBars(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame =
    events
      .select(col(groupCol).as("g"), to_date(col(tsCol)).as("day"),
        struct(col(tsCol), col(idCol), col(valueCol).as("v")).as("obs"),
        col(valueCol).as("v"))
      .groupBy("g", "day")
      .agg(min(col("obs")).as("o"), max(col("obs")).as("c"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        count(lit(1)).as("n_obs"))
      .select(col("g").as(groupCol),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("o.v").as("open"), col("high"), col("low"),
        col("c.v").as("close"), col("n_obs"))

  /** DuckDB mirror of [[ohlcBars]] via ordered-aggregate first/last. */
  def ohlcOracleSql(table: String, groupCol: String, tsCol: String,
      idCol: String, valueCol: String): String =
    s"""SELECT $groupCol, strftime(CAST($tsCol AS DATE), '%Y-%m-%d') AS day,
      |  first($valueCol ORDER BY $tsCol, $idCol) AS open,
      |  max($valueCol) AS high, min($valueCol) AS low,
      |  last($valueCol ORDER BY $tsCol, $idCol) AS close,
      |  CAST(count(*) AS BIGINT) AS n_obs
      |FROM $table GROUP BY $groupCol, CAST($tsCol AS DATE)
      |ORDER BY $groupCol, day""".stripMargin
}
