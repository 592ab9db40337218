package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** TEST-ONLY connector-boundary probe, service-registered under the
  * shortName "kafka" (META-INF/services on the test classpath; the
  * real `spark-sql-kafka-0-10` jar is environmentally absent here and
  * would be ambiguous with this probe if both were present — this
  * class exists precisely because the jar cannot).
  *
  * It lets the spec suite verify everything on OUR side of the
  * connector seam: that `OrderEnrichmentJob.source` hands the standard
  * connector exactly the options it documents
  * (`kafka.bootstrap.servers`, `subscribe`, `startingOffsets`), and
  * that the pipeline composes against the connector's REAL fixed read
  * schema (key/value binary, topic, partition, offset, timestamp,
  * timestampType — the schema the public connector presents for any
  * topic). What remains unverified is only the jar's own internals.
  *
  * Schema-resolution only: starting a query through it is
  * unsupported by design (`createSource` throws) — the probe asserts
  * the contract, it does not fake a broker.
  */
class KafkaProbeSource extends DataSourceRegister with StreamSourceProvider {
  override def shortName(): String = "kafka"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    KafkaProbeSource.captured = parameters
    ("kafka-probe", KafkaProbeSource.kafkaSchema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    throw new UnsupportedOperationException(
      "KafkaProbeSource verifies the connector contract only; " +
        "running a stream needs the real spark-sql-kafka jar")
}

object KafkaProbeSource {
  @volatile var captured: Map[String, String] = Map.empty

  /** The public Kafka connector's fixed read schema — what
    * `spark.readStream.format("kafka").load()` presents regardless of
    * topic contents. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}
