package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time inside
  * partitions.
  *
  * The Spark-side machinery here is real and tested: schema, typed
  * Datasets, partition-parallel batched processing (the Scala
  * equivalent of `mapInPandas` batches), feature-column output shape.
  * The *codec* is a clearly marked STUB — real image/audio decode
  * libraries are intentionally absent from this environment, so
  * `decodeStub` computes deterministic byte-level statistics standing
  * in for "decode + feature-extract". Swapping in a real decoder means
  * replacing ONLY `decodeStub`'s body (signature and plumbing stay).
  */
object Multimodal {
  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], width: Int,
      height: Int, fmt: String)

  /** Extracted features for one record. */
  case class MediaFeatures(doc_id: Long, byte_len: Int, mean_byte: Double,
      checksum: Long, frame_hashes: Seq[Long])

  /** Build a media table from `documents`: the UTF-8 payload of the
    * text stands in for an encoded image; metadata is derived
    * deterministically. */
  def fromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      ((col("n_chars") * 7) % 480 + 16).cast("int").as("height"),
      when(col("source") < "src5", "png").otherwise("jpg").as("fmt"))

  /** STUB decoder =========================================== STUB ===
    * Stands in for image decode + feature extraction (no codec libs in
    * this environment). Deterministic byte statistics + "frame sample"
    * hashes of `frames` evenly spaced 64-byte windows. Replace this
    * body with a real decoder to productionize; everything around it
    * (batching, partitioning, schema) is production-shaped. */
  def decodeStub(rec: MediaRecord, frames: Int): MediaFeatures = {
    val bytes = rec.media
    var sum = 0L; var ck = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      ck = ck * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val fh = (0 until frames).map { f =>
      val off = if (bytes.length <= 64) 0 else f * math.max((bytes.length - 64) / math.max(frames - 1, 1), 1)
      var h = 0xcbf29ce484222325L
      var j = off
      val end = math.min(off + 64, bytes.length)
      while (j < end) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      h
    }
    MediaFeatures(rec.doc_id,
      bytes.length,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      ck, fh)
  }

  /** Partition-parallel batched decode: records are pulled in batches
    * of `batchSize` (bounding peak memory per task to batchSize x
    * payload, the same contract as arrow-batch UDFs) and features are
    * emitted per record. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, frames: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would run vectorized
        batch.map(decodeStub(_, frames))
      }
    }
  }
}
