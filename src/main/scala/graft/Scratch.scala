package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    emb.count()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    val refs = graft.operators.Quantize.pqCodebook(emb, "vec_id", "embedding", 16)
    time("codebook-again") {
      graft.operators.Quantize.pqCodebook(emb, "vec_id", "embedding", 16).length.toLong
    }
    val codes = emb.withColumn("__g_codes",
      graft.operators.Quantize.pqCodesColumn(col("embedding"), refs, 8))
    for (_ <- 1 to 3) time("encode-forced") {
      codes.select(sum(element_at(col("__g_codes"), 1))).collect(); 2000L
    }
    val rv = codes.withColumn("__g_rv",
      graft.operators.Quantize.pqReconstructFromCodes(col("__g_codes"), refs, 8))
    for (_ <- 1 to 3) time("reconstruct-forced") {
      rv.select(sum(element_at(col("__g_rv"), 1))).collect(); 2000L
    }
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("__g_asim").desc, col("vec_id").asc)
    val joined = rv.join(broadcast(q), col("query_id") =!= col("vec_id"))
    for (_ <- 1 to 2) time("joined")(joined.count())
    val asim = joined.withColumn("__g_asim",
      graft.functions.GraftFunctions.cosine_similarity_d(
        col("query_vec").cast("array<double>"), col("__g_rv")))
    for (_ <- 1 to 2) time("asim")(asim.count())
    val topC = asim.withColumn("__g_cr", org.apache.spark.sql.functions.row_number().over(wc))
      .where(col("__g_cr") <= 50)
    for (_ <- 1 to 2) time("topC")(topC.count())
    val full = graft.operators.Similarity.pqTopK(q, emb, 5, 8, 16, 50)
    for (_ <- 1 to 3) time("full-pq")(full.count())
    spark.stop()
  }
}
