package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiler for the exact jaccard join. */
object DebugD4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val base = docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      .withColumn("n", size(col("sh")))
    time("shingles only")(base.agg(sum("n")).collect())

    val a = base.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a"))
      .repartition(col("id_a"))
    val b = base.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b"))
    val pairs = a.join(broadcast(b),
      col("id_a") < col("id_b") &&
        col("n_a") <= col("n_b") * 2.0 && col("n_b") <= col("n_a") * 2.0)
    time("ratio pairs count")(println("pairs=" + pairs.count()))

    val full = Dedup.jaccardJoin(docs, "doc_id", "text", 2, 0.5)
    full.explain("formatted")
    time("full jaccard join")(println("result=" + full.count()))
    spark.stop()
  }
}
