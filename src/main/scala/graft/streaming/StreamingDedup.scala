package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection — the LSH-band shape of the
  * batch `Dedup.minhashLsh`, continuous: docs are banded into
  * (band, band-hash) buckets exactly like the batch operator, each
  * bucket holds its recent members in keyed state, and an arriving doc
  * is exact-verified (sorted shingle-hash merge, same math as the
  * batch verify) against only its bucket's members. State per bucket
  * is bounded twice over: an event-time TTL drops buckets the
  * watermark has passed, and `maxBucket` caps members per bucket
  * (oldest evicted) so a degenerate bucket cannot grow without bound.
  *
  * The same true pair can surface from several bands; emission is
  * deduplicated per bucket (a pair meets at most once per band), and
  * callers wanting global uniqueness aggregate downstream —
  * `.dropDuplicates` in batch backfills, or a keyed consumer on
  * (id_a, id_b) in pure streams (chaining a second stateful dedup
  * operator after flatMapGroupsWithState is restricted by Spark).
  */
object StreamingDedup {
  case class BandedDoc(band_key: Long, doc_id: Long,
      ingest_ts: java.sql.Timestamp, shh: Seq[Long])
  case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double,
      ingest_ts: java.sql.Timestamp)
  case class BucketState(docs: List[(Long, Seq[Long])], lastTs: Long)

  /** Exact Jaccard from two ASCENDING distinct hash arrays. */
  private def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** docs(doc_id, ingest_ts, text) — streaming or batch — to verified
    * near-dup pairs. `bucketTtl` is how long a bucket's members stay
    * eligible as match partners after their event time. */
  def nearDupStream(docs: DataFrame, watermarkDelay: Duration,
      bucketTtl: Duration, shingleWords: Int = 3, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      maxBucket: Int = 256): Dataset[NearDupPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import graft.functions.GraftFunctions.{minhash_signature, shingle_hashes}
    import docs.sparkSession.implicits._
    val r = numHashes / bands
    val ttlMs = bucketTtl.toMillis
    val base = docs.select(col("doc_id"), col("ingest_ts"),
      shingle_hashes(col("text"), shingleWords).as("shh"),
      minhash_signature(col("text"), shingleWords, numHashes).as("__g_sig"))
    val withWm =
      if (docs.isStreaming)
        base.withWatermark("ingest_ts", s"${watermarkDelay.toMillis} milliseconds")
      else base
    val banded = withWm.select(col("doc_id"), col("ingest_ts"), col("shh"),
        explode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("__g_sig"), b * r + 1, r))): _*)).as("band_key"))
      .select(col("band_key"), col("doc_id"), col("ingest_ts"), col("shh"))
      .as[BandedDoc]

    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDupPair]
    val isStream = docs.isStreaming
    def fn(key: Long, it: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var held = state.getOption.map(_.docs).getOrElse(Nil)
      var lastTs = state.getOption.map(_.lastTs).getOrElse(Long.MinValue)
      var out = List.empty[NearDupPair]
      it.toSeq.sortBy(d => (d.ingest_ts.getTime, d.doc_id)).foreach { d =>
        held.foreach { case (oid, oshh) =>
          if (oid != d.doc_id) {
            val j = jaccard(oshh, d.shh)
            if (j >= threshold)
              out ::= NearDupPair(math.min(oid, d.doc_id),
                math.max(oid, d.doc_id), j, d.ingest_ts)
          }
        }
        held = ((d.doc_id, d.shh) :: held).take(maxBucket)
        lastTs = math.max(lastTs, d.ingest_ts.getTime)
      }
      state.update(BucketState(held, lastTs))
      if (isStream && lastTs != Long.MinValue)
        state.setTimeoutTimestamp(lastTs + ttlMs)
      out.reverseIterator
    }

    if (isStream)
      banded.groupByKey(_.band_key)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
    else
      banded.groupByKey(_.band_key)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
