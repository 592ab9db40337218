package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MATERIALIZED inverted index: positional postings written as a
  * term-BUCKETED parquet layout, plus doc-length and corpus-stats side
  * tables — the index-build batch job a retrieval system runs once so
  * queries never re-derive postings from raw text.
  *
  * The layout is the point: postings land under
  * `bucket=pmod(xxhash64(term), buckets)` partitions, so a query
  * filters to its own terms' buckets and PARTITION PRUNING drops every
  * other directory before any file opens — at 100 TB the per-query
  * read is |query terms| buckets of postings, not the corpus. Doc
  * lengths aggregate once at build; corpus stats (N, total tokens, the
  * bucket count) are one bounded row. Scoring then matches
  * [[graft.operators.TextRank.bm25TopK]] exactly — same tf/df/dl
  * arithmetic, same rank-only output — so the index path shares the
  * ad-hoc path's DuckDB oracle verbatim.
  */
object TextIndex {
  /** Build the index at `path`: bucketed positional postings
    * (doc_id, pos, term), doc lengths, one stats row. Positions ride
    * along so phrase/proximity queries can run from the same index. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 64): Unit = {
    require(buckets >= 1)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    toks
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets)))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    dl.write.mode(SaveMode.Overwrite).parquet(s"$path/doclen")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .withColumn("buckets", lit(buckets))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** BM25 top-k over the MATERIALIZED index — same semantics and
    * output as `TextRank.bm25TopK`, but the postings scan opens only
    * the query terms' buckets (partition pruning; the bucket predicate
    * is derived from the same hash the build used, read back from the
    * stats row so a mismatched bucket count cannot silently read
    * nothing). */
  def bm25TopK(spark: SparkSession, path: String,
      queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty))
    val stats = spark.read.parquet(s"$path/stats").head
    val (nDocs, totTok, buckets) =
      (stats.getAs[Long]("n_docs"), stats.getAs[Long]("total_tokens"),
        stats.getAs[Int]("buckets"))
    require(nDocs > 0, "empty index")
    val avgdl = totTok.toDouble / nDocs
    val allTerms = queries.flatMap(_._2).distinct
    // bucket values computed by the same xxhash64 expression the build
    // column used (one bounded local job), then pushed as a partition
    // filter
    val termBuckets = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("bucket").isin(termBuckets: _*) &&
        col("term").isInCollection(allTerms))
    val qt = queries.flatMap { case (qid, ts) => ts.map(tm => (qid, tm)) }
      .toDF("query_id", "term")
    val tf = postings.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$path/doclen")
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .join(broadcast(qt), "term")
      .withColumn("s",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val agg = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum("s").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    agg.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }
}
