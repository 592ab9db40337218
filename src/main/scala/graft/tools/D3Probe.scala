package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Scratch stage-cost breakdown for d3 (dev tool). */
object D3Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    import graft.functions.GraftFunctions.{md5_simhash64, simhash64}
    def time(tag: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
    }
    time("md5 simhash only")(docs.select(md5_simhash64(col("text")).as("s"))
      .agg(max(col("s"))).collect().head.getLong(0) & 0L | docs.count())
    time("fnv simhash only")(docs.select(simhash64(col("text")).as("s"))
      .agg(max(col("s"))).collect().head.getLong(0) & 0L | docs.count())
    val sigs = docs.select(col("doc_id"), md5_simhash64(col("text")).as("sh"))
    val banded = sigs.select(col("doc_id"), col("sh"),
      explode(array((0 until 8).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), b * 8).bitwiseAND(lit(255L)).as("bv"))): _*)).as("b"))
      .select(col("doc_id"), col("sh"), col("b.band").as("band"), col("b.bv").as("bv"))
    val l = banded.select(col("band"), col("bv"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band").as("band2"), col("bv").as("bv2"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val coll = l.join(r, l("band") === r("band2") && l("bv") === r("bv2") &&
      l("id_a") < r("id_b"))
    time("band collisions")(coll.count())
    val ham = coll.select(col("id_a"), col("id_b"),
      bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .where(col("hamming") <= 7)
    time("after hamming")(ham.count())
    time("after distinct")(ham.dropDuplicates("id_a", "id_b").count())
    time("full d3")(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text",
      8, 7, md5Hash = true).count())
    time("distinct signatures")(sigs.select(col("sh")).distinct().count())
    spark.stop()
  }
}
