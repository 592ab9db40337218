package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

object BenchD4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    time("broadcast jaccardJoin")(Dedup.jaccardJoin(docs, "doc_id", "text", 2, 0.5).count())
    time("prefix jaccardJoinPrefix")(Dedup.jaccardJoinPrefix(docs, "doc_id", "text", 2, 0.5).count())
    time("prefix-rare jaccardJoinPrefixRare")(Dedup.jaccardJoinPrefixRare(docs, "doc_id", "text", 2, 0.5).count())
    spark.stop()
  }
}
