package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** Empirical scale-linearity check: replicate the sf0.1 tables N-fold
  * with copy-DISTINCT content (new keys, salted shingles, rotated
  * vectors — so dedup/similarity structure grows linearly instead of
  * exploding across copies), then run the real `SparkEntry.queries`
  * entries at each factor and report seconds + output rows per factor.
  *
  * A linear operator should show sec(f)/sec(1) ~ f (modulo fixed
  * overhead); the exact grid similarity join should show ~f^2 compute
  * with flat per-task memory — that quadratic-but-sharded profile is
  * the honest cost of a complete similarity join.
  *
  * Usage: runMain graft.tools.ScaleBench [outBase] — env
  * SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_FACTORS
  * (default "1,4,16"), SPARK_GRAFT_QUAD_FACTORS (default "1,2,4").
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = args.headOption.getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val quadFactors = sys.env.getOrElse("SPARK_GRAFT_QUAD_FACTORS", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val SHIFT = 100000000L // key offset between copies

    /** N copies of a frame, `remap` applied to copy i (fresh keys etc). */
    def replicate(df: DataFrame, n: Int)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => remap(df, i)).reduce(_ unionAll _)

    def materialize(factor: Int): String = {
      val dir = s"$outBase/x$factor"
      if (new java.io.File(s"$dir/_done").exists) return dir
      val docs = Tables.load(spark, base, "documents")
      // salt every word so every shingle differs between copies: text
      // similarity structure within a copy is preserved, across copies
      // nothing matches (no cross-copy near-dup explosion)
      replicate(docs, factor) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + lit(i * SHIFT))
          .withColumn("text", array_join(
            transform(split(col("text"), " "), w => concat(w, lit(s"_$i"))), " "))
      }.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = Tables.load(spark, base, "embeddings")
      // rotating the vector preserves the norm and pairwise sims within
      // a copy but decorrelates copies (dims are i.i.d. here)
      replicate(emb, factor) { (e, i) =>
        val rot = i % 64
        e.withColumn("vec_id", col("vec_id") + lit(i * SHIFT))
          .withColumn("embedding",
            concat(slice(col("embedding"), rot + 1, 64 - rot),
              slice(col("embedding"), 1, rot)))
      }.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val ev = Tables.load(spark, base, "events")
      replicate(ev, factor) { (e, i) =>
        e.withColumn("event_id", col("event_id") + lit(i * SHIFT))
          .withColumn("user_id", col("user_id") + lit(i * SHIFT))
      }.withColumn("ts", expr("unix_micros(ts) * 1000")) // back to i64 nanos
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val li = Tables.load(spark, base, "lineitem")
      replicate(li, factor) { (l, i) =>
        l.withColumn("l_orderkey", col("l_orderkey") + lit(i * SHIFT))
      }.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      new java.io.File(s"$dir/_done").createNewFile()
      dir
    }

    def time(op: String, dir: String): (Double, Long) = {
      val q = SparkEntry.queries(op)
      q(spark, dir).count() // warmup (codegen, footer reads)
      val t0 = System.nanoTime()
      val rows = q(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val linearOps = Seq("q1_agg", "t1_tumble", "d1_dedup_exact",
      "d2_dedup_minhash", "d4_ngram_jaccard", "d7_decontam",
      "d8_dedup_groups", "d9_decontam_bloom", "x3_tokens",
      "x7_repetition", "x8_pii", "x9_sample", "x10_chunk", "x11_pack",
      "a4_quantiles", "s5_quantize", "s6_ann_sq", "s7_ann_ivfsq",
      "t7_rolling", "m1_multimodal",
      "ref_interval_join", "ref_asof_merge", "ref_asof_join")
    val quadOps = Seq("d5_embed_neardup", "s1_ann_bruteforce")
    for (f <- (factors ++ quadFactors).distinct.sorted) materialize(f)
    val results = (for (op <- linearOps; f <- factors) yield (op, f)) ++
      (for (op <- quadOps; f <- quadFactors) yield (op, f))
    results.foreach { case (op, f) =>
      val (sec, rows) = time(op, s"$outBase/x$f")
      println(f"""{"op":"$op","factor":$f,"sec":$sec%.3f,"rows":$rows}""")
    }
    spark.stop()
  }
}
