package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus: BM25 for a literal query
  * set and per-document TF-IDF top terms — the retrieval/feature side
  * of a training-data pipeline (RAG indexing, near-duplicate query
  * mining, keyword extraction).
  *
  * Plan shape at 100 TB: the corpus-side work is two shuffle
  * aggregations with map-side combine (doc length by doc_id; term
  * frequency by (doc_id, term) — the latter pre-filtered to query
  * terms for BM25, so only matching postings ever shuffle). Query
  * terms and their document frequencies are tiny and broadcast. No
  * driver-side loops; the only collected state is two scalar corpus
  * statistics (bounded like the IVF centroid sample).
  *
  * Outputs carry (query/doc, rank, id) but NOT the floating score:
  * scores of distinct (tf, dl, df) inputs differ by far more than any
  * last-ulp libm divergence between engines, and identical inputs give
  * identical scores within each engine, so rank + id tie-break is
  * engine-portable while a raw double column would not be.
  */
object TextRank {
  private def tokens(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")

  /** BM25 top-k docs per query; `queries` is a literal (id, terms) set.
    * N and avgdl are taken over docs with at least one token. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = tokens(docs, idCol, textCol)
    val dl = t.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val Row(nDocs: Long, totTok: Long) =
      dl.agg(count(lit(1)), sum(col("dl"))).head
    val avgdl = totTok.toDouble / nDocs
    val allTerms = queries.flatMap(_._2).distinct
    val qt = queries.flatMap { case (qid, ts) => ts.map(tm => (qid, tm)) }
      .toDF("query_id", "term")
    val tf = t.filter(col("term").isInCollection(allTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .join(broadcast(qt), "term")
      .withColumn("s",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val agg = scored.groupBy(col("query_id"), col(idCol))
      .agg(sum("s").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    agg.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** Top-n TF-IDF terms per document (score = tf * ln(N/df), N = docs
    * with at least one token), ties broken by term ascending. */
  def tfidfTopTerms(docs: DataFrame, topN: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(docs, idCol, textCol)
    val tf = t.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = tf.select(col(idCol)).distinct().count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .withColumn("score",
        col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= topN)
      .select(col(idCol), col("rank"), col("term"))
  }
}
