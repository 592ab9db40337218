package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Scratch stage-cost profiler for the round's hot queries (dev tool). */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, sf, "documents")
    val emb = Tables.load(spark, sf, "embeddings")
    def time(label: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    import graft.functions.GraftFunctions.shingle_hashes
    for (w <- Seq(2, 3)) {
      val base = docs.select(col("doc_id").as("id"),
        shingle_hashes(col("text"), w).as("shh")).withColumn("n", size(col("shh")))
      val posts = base.select(col("id"), explode(col("shh")).as("h"))
      time(s"w=$w dfreq distinct shingles")(posts.groupBy("h").agg(count(lit(1))).count())
      time(s"w=$w full prefixRare")(Dedup.jaccardJoinPrefixRare(docs, "doc_id", "text", w, 0.5).count())
      time(s"w=$w full prefix")(Dedup.jaccardJoinPrefix(docs, "doc_id", "text", w, 0.5).count())
      time(s"w=$w broadcast")(Dedup.jaccardJoin(docs, "doc_id", "text", w, 0.5).count())
    }
    for (bits <- Seq(4, 5, 6, 8)) {
      time(s"d5 bits=$bits full")(Similarity.nearDupPairsBlocked(emb, 0.45, bits = bits).count())
    }
    spark.stop()
  }
}
