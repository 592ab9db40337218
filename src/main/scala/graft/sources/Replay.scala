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
    * processing timestamp).
    *
    * The global release index is TWO-PHASE (the x15/x16 cumsum
    * discipline), never a partitionless window: rows range-partition
    * by the order column (partition order = key order), rank locally,
    * and shift by the exclusive prefix of per-partition counts — a
    * #partitions-row frame joined back broadcast. A global
    * `row_number() OVER (ORDER BY ...)` would drag the whole table
    * through ONE task; a replay tool exists to drive load tests, so
    * it must not be the bottleneck it is supposed to measure. */
  def stream(spark: SparkSession, df: DataFrame, orderCol: String,
      rowsPerSecond: Int, indexPartitions: Int = 32): DataFrame = {
    val indexed = globalIndex(df, orderCol, indexPartitions)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withColumnRenamed("timestamp", "replay_time")
      .join(indexed, col("value") === col("__g_idx"))
      .drop("value", "__g_idx")
  }

  /** df plus a 0-based `__g_idx` dense global rank by `orderCol`,
    * computed distributed (range partition -> local rank -> broadcast
    * prefix offsets). */
  def globalIndex(df: DataFrame, orderCol: String,
      indexPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .repartitionByRange(indexPartitions, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(col(orderCol))))
    val counts = parts.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val cum = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offsetDf = broadcast(cum.init.map(_._2).zip(cum.tail.map(_._1))
      .map { case (off, pid) => (pid, off) }.toSeq.toDF("__pid", "__off"))
    parts.join(offsetDf, "__pid")
      .withColumn("__g_idx", col("__lr").cast("long") - 1L + col("__off"))
      .drop("__pid", "__lr", "__off")
  }
}
