package graft.operators

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based session windows, expressed with lag/flag/cumulative-sum
  * window functions so the semantics are portable (identical SQL runs
  * on any engine — this is also what makes the DuckDB oracle exact).
  * One shuffle on the key; session assignment is a linear scan within
  * each key partition. (Spark's built-in `session_window` agg gives
  * the same tumbling-gap semantics for the streaming path.)
  */
object SessionWindow {
  /** Adds `session_id` (1-based per key, ordered by time). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gap: Duration): DataFrame = {
    val gapUs = gap.toMillis * 1000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1).otherwise(0)
    df.withColumn("__g_new", isNew)
      .withColumn("session_id",
        sum(col("__g_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__g_new")
  }

  /** Session aggregate: start/end/duration/event count per session. */
  def aggregate(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gap: Duration): DataFrame =
    sessionize(df, keyCol, tsCol, idCol, gap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("duration_us"))
}
