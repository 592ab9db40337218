package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-controlled replay of a batch table as a stream — the analogue
  * of the reference's Kinesis Data Generator workflow (README
  * "Generate the Sample Data": orders at 100 records/s, rates at
  * 1 record/s). Spark's `rate` source provides the clock; a
  * stream-static equi-join on the tick index releases one buffered
  * row per tick, so any parquet table can drive the streaming
  * pipeline at a chosen rate for load tests and demos.
  */
object Replay {
  /** Emit `df`'s rows (ordered by `orderCol`) at `rowsPerSecond`.
    * Output schema = df's columns plus `replay_time` (the tick's
    * processing timestamp). */
  def stream(spark: SparkSession, df: DataFrame, orderCol: String,
      rowsPerSecond: Int): DataFrame = {
    val indexed = df.withColumn("__g_idx",
      row_number().over(Window.orderBy(col(orderCol))).cast("long") - 1L)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withColumnRenamed("timestamp", "replay_time")
      .join(indexed, col("value") === col("__g_idx"))
      .drop("value", "__g_idx")
  }
}
