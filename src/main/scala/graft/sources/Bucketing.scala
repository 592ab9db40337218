package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: persisting both sides of a recurring join
  * bucketed (and sorted) by the join key lets every subsequent join
  * run shuffle-free — each task sort-merges co-located buckets. At
  * 100 TB this converts the dominant repeated cost (full-table
  * exchange) into a one-time write-side cost; the bucketed layout is
  * also what keeps incremental daily joins cheap.
  *
  * Uses Spark's native DataSource bucketing (no Hive metastore
  * needed); `buckets` should be sized so one bucket of the largest
  * table fits an executor's memory at target scale.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(buckets, keyCol)
    (if (sorted) w.sortBy(keyCol) else w).saveAsTable(table)
  }

  /** Co-located join of two bucketed tables on their bucket key —
    * with matching bucket counts the plan contains no Exchange. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
