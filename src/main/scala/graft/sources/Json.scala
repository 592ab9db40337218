package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON ingestion and serialization — the reference's source/sink
  * surface re-expressed. The reference deserializes Kinesis JSON
  * records into POJOs (StreamingJob.java:33-63 via
  * JsonNodeDeserializationSchema + ObjectMapper); here a raw
  * stream/batch of JSON strings is parsed with an *explicit* schema
  * (`from_json`), so parsing is codegen'd and malformed records become
  * nulls instead of exceptions. The sink mirrors
  * StreamingJob.java:113-133 (ObjectMapper.writeValueAsString) with
  * `to_json(struct(*))`.
  */
object Json {
  /** Order POJO schema (reference Order.java:4-9). */
  val orderSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("orderTime", TimestampType),
    StructField("amount", IntegerType),
    StructField("currency", StringType)))

  /** ExchangeRate POJO schema (reference ExchangeRate.java:5-10). */
  val exchangeRateSchema: StructType = StructType(Seq(
    StructField("exchangeRateTime", TimestampType),
    StructField("currency", StringType),
    StructField("rate", IntegerType)))

  /** Parse a column of JSON strings into typed columns. Works on both
    * batch DataFrames and streaming DataFrames (readStream). */
  def parse(raw: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), schema).as("__j")).select("__j.*")

  /** Serialize every column into one JSON-line string column `value`. */
  def toJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
