package graft.tools

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession
import graft.streaming.CorpusIngest

/** Throughput of the streaming corpus-ingest pipeline (PII scrub →
  * langid/quality → watermark-GC'd exact dedup → gate) on one node:
  * real documents from the test corpus, replicated with fresh ids and
  * a 10% planted duplicate rate, fed through MemoryStream in batches.
  * Prints docs/s plus the accepted/duplicate split.
  */
object CorpusStreamBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

    val in = MemoryStream[CorpusIngest.Doc]
    val q = CorpusIngest.pipeline(in.toDF(), Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("csb").outputMode("append").start()

    // warmup
    in.addData(base.take(500).map { case (id, t) => CorpusIngest.Doc(id, ts(1), t) })
    q.processAllAvailable()

    val t0 = System.nanoTime()
    var sent = 0L
    for (r <- 1 to reps) {
      val docs = base.zipWithIndex.map { case ((id, t), i) =>
        // every 10th doc repeats the previous doc's text -> exact dup
        val text = if (i % 10 == 9) base((i - 1) % base.length)._2 else t
        CorpusIngest.Doc(id + r * 10000000L, ts(r), text)
      }
      in.addData(docs.toIndexedSeq)
      sent += docs.length
      q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val accepted = spark.sql("SELECT count(*) FROM csb").head().getLong(0) - 500
    println(f"""{"metric":"corpus_ingest_docs_per_sec","value":${sent / sec}%.0f,"sent":$sent,"accepted":$accepted,"sec":$sec%.2f}""")
    q.stop()
    spark.stop()
  }
}
