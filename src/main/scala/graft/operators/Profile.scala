package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.kmv_distinct

/** Single-pass column profiler for data audits: null counts, distinct
  * estimates (graft's KMV sketch — works for any hashable type
  * including arrays/binary), and min/max, computed for every column in
  * ONE aggregation over the table (4 x n_cols aggregates, all partial
  * map-side). The 1-row result is reshaped driver-side — no data-sized
  * driver work. The first thing to run against an unknown 100 TB drop.
  */
object Profile {
  def profile(df: DataFrame, distinctK: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        kmv_distinct(c, distinctK).as(s"${f.name}__distinct"),
        min(c.cast("string")).as(s"${f.name}__min"),
        max(c.cast("string")).as(s"${f.name}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val out = cols.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        row.getLong(i * 5), row.getLong(i * 5 + 1),
        math.round(row.getDouble(i * 5 + 2)),
        row.getString(i * 5 + 3), row.getString(i * 5 + 4))
    }
    val schema = StructType(Seq(
      StructField("column", StringType), StructField("type", StringType),
      StructField("n_rows", LongType), StructField("n_nulls", LongType),
      StructField("approx_distinct", LongType),
      StructField("min_value", StringType), StructField("max_value", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq), schema)
  }
}
