package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink mirror: schema-EXPLICIT reads (never inferSchema —
  * inference re-scans the data and can flip types between drops;
  * production ingestion pins the schema), RFC-4180 quoting so
  * embedded commas/newlines round-trip, and header output so files
  * are self-describing for downstream non-Spark readers.
  */
object Csv {
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"") // RFC 4180: quotes escape by doubling
      .csv(path)

  // multiLine parses quoted embedded newlines correctly but makes each
  // FILE the split unit (no intra-file parallelism) — at scale, write
  // many moderate files (Spark's one-file-per-task write does) rather
  // than few huge ones
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .schema(schema)
      .csv(path)
}
