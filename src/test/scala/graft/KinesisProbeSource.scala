package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** TEST-ONLY connector-boundary probe for the reference's OWN
  * transport, service-registered under the public
  * `spark-sql-kinesis-connector`'s shortName "aws-kinesis" (the jar
  * is environmentally absent here — no egress — and would be
  * ambiguous with this probe if both were present).
  *
  * The reference job's entire Kinesis surface is a stream name plus
  * region/initial-position consumer properties
  * (StreamingJob.java:26-41); this probe lets the spec pin OUR side
  * of that seam: `OrderEnrichmentJob.source(KinesisSource(...))`
  * hands the standard connector exactly the options it documents
  * (`kinesis.streamName`, `kinesis.region`,
  * `kinesis.startingPosition`), and the pipeline composes against
  * the connector's REAL read schema (data binary + stream metadata).
  * What remains unverified is only the jar's own internals — on a
  * real deployment nothing changes but the classpath.
  *
  * Schema-resolution only: `createSource` throws by design — the
  * probe asserts the contract, it does not fake a stream. */
class KinesisProbeSource extends DataSourceRegister with StreamSourceProvider {
  override def shortName(): String = "aws-kinesis"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    KinesisProbeSource.captured = parameters
    ("aws-kinesis-probe", KinesisProbeSource.kinesisSchema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    throw new UnsupportedOperationException(
      "KinesisProbeSource verifies the connector contract only; " +
        "running a stream needs the real spark-sql-kinesis-connector jar")
}

object KinesisProbeSource {
  @volatile var captured: Map[String, String] = Map.empty

  /** The public Kinesis connector's read schema — what
    * `spark.readStream.format("aws-kinesis").load()` presents for
    * any stream: the record payload plus shard metadata. */
  val kinesisSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))
}
