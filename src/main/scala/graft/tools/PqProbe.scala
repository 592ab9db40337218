package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Quantize, Similarity}
import graft.sources.Tables

/** Scratch diagnostics for PQ codebook quality (dev tool). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

    val norms = emb.select(sqrt(aggregate(transform(col("embedding"),
      x => x * x), lit(0.0d), (a, x) => a + x)).as("n"))
      .agg(min("n"), avg("n"), max("n")).collect()(0)
    println(s"norms: min=${norms.getDouble(0)} avg=${norms.getDouble(1)} max=${norms.getDouble(2)}")

    val first = Quantize.pqCodebook(emb, "vec_id", "embedding", 16)
    val km = Quantize.pqCodebookKMeans(emb, "vec_id", "embedding", 16, 8)
    def stats(tag: String, refs: Array[Array[Double]]): Unit = {
      val cn = refs.map(r => math.sqrt(r.map(x => x * x).sum))
      println(f"$tag codeword norms: min=${cn.min}%.3f avg=${cn.sum / cn.length}%.3f max=${cn.max}%.3f")
      val errs = emb.select(
        graft.functions.GraftFunctions.cosine_similarity_d(
          col("embedding").cast("array<double>"),
          Quantize.pqReconstructColumn(col("embedding"), refs, 8)).as("cs"))
        .collect().map(r => 1.0 - r.getDouble(0))
      println(f"$tag cosine err: avg=${errs.sum / errs.length}%.4f max=${errs.max}%.4f")
      // reconstruction norm (shrinkage indicator)
      val rn = emb.select(sqrt(aggregate(transform(
        Quantize.pqReconstructColumn(col("embedding"), refs, 8).cast("array<double>"),
        x => x * x), lit(0.0d), (a, x) => a + x)).as("n"))
        .agg(avg("n")).collect()(0).getDouble(0)
      println(f"$tag avg reconstruction norm: $rn%.3f")
    }
    stats("first", first)
    stats("kmeans", km)

    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(tag: String, rows: Array[org.apache.spark.sql.Row]): Unit = {
      val r = rows.map(x => (x.getLong(0), x.getLong(2))).count(exact.contains)
        .toDouble / exact.size
      println(f"$tag recall: $r%.3f")
    }
    for (c <- Seq(20, 50)) {
      recall(s"first  c=$c", Similarity.pqTopK(q, emb, 5, candidates = c).collect())
      recall(s"kmeans c=$c", Similarity.ivfPqTopK(q, emb, 5, clusters = 16,
        nprobe = 16, candidates = c).collect())
    }

    // hypothesis: dot-product (ADC) scoring fixes the shrinkage bias
    import org.apache.spark.sql.expressions.Window
    def dotTopC(refs: Array[Array[Double]], c: Int): Array[org.apache.spark.sql.Row] = {
      val wc = Window.partitionBy(col("query_id"))
        .orderBy(col("__g_asim").desc, col("vec_id").asc)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      emb.withColumn("__g_codes", Quantize.pqCodesColumn(col("embedding"), refs, 8))
        .withColumn("__g_rv", Quantize.pqReconstructFromCodes(col("__g_codes"), refs, 8))
        .join(broadcast(q), col("query_id") =!= col("vec_id"))
        .withColumn("__g_asim", aggregate(zip_with(
          col("query_vec").cast("array<double>"), col("__g_rv"), (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x))
        .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= c)
        .withColumn("sim", graft.functions.GraftFunctions.cosine_similarity(
          col("query_vec"), col("embedding")))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("sim"))
        .collect()
    }
    for (c <- Seq(20, 50)) {
      recall(s"first-dot  c=$c", dotTopC(first, c))
      recall(s"kmeans-dot c=$c", dotTopC(km, c))
    }

    // clustered corpus, tight candidate budget: codebook quality IS the
    // ranking quality when candidates == k
    import spark.implicits._
    def noise(i: Int, j: Int): Float = (math.sin(i * 37.0 + j * 101.0) * 0.15).toFloat
    val planted = (0 until 320).map { i =>
      val c = i % 16
      (i.toLong, Array.tabulate(32)(j => (if (j == c) 1.0f else 0.0f) + noise(i, j)))
    }.toDF("vec_id", "embedding")
    val pq2 = planted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val pExact = Similarity.bruteForceTopK(pq2, planted, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def pRecall(tag: String, rows: Array[org.apache.spark.sql.Row]): Unit = {
      val r = rows.map(x => (x.getLong(0), x.getLong(2))).count(pExact.contains)
        .toDouble / pExact.size
      println(f"planted $tag recall: $r%.3f")
    }
    val pFirst = Quantize.pqCodebook(planted, "vec_id", "embedding", 16)
    val pKm = Quantize.pqCodebookKMeans(planted, "vec_id", "embedding", 16, 8)
    println(f"planted first err: ${1.0}%s") // placeholder alignment
    for (c <- Seq(5, 10, 20)) {
      pRecall(s"first  c=$c", Similarity.pqTopK(pq2, planted, 5,
        subspaces = 8, codewords = 16, candidates = c).collect())
      pRecall(s"kmeans c=$c", Similarity.ivfPqTopK(pq2, planted, 5, clusters = 16,
        nprobe = 16, candidates = c, subspaces = 8, codewords = 16).collect())
    }
    spark.stop()
  }
}
