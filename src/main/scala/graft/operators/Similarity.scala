package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_similarity, hyperplane_lsh}

/** Similarity search over embedding columns (array<float>).
  *
  * Scale design: `bruteForceTopK` is the exact baseline — broadcast
  * the (small) query set against the partitioned corpus and reduce
  * top-k in two stages, so no shuffle ever carries more than
  * (#partitions x #queries x k) rows. `lshTopK` is the 100 TB path:
  * random-hyperplane signatures bucket the corpus; only bucket
  * collisions get exact re-ranking.
  */
object Similarity {
  /** Exact top-k cosine neighbors for each query vector.
    *
    * Two-stage reduction: stage 1 takes a local top-k inside each
    * scan partition (window over (query, partition-id) — no shuffle
    * of the full similarity matrix), stage 2 merges the per-partition
    * winners (a shuffle of only #partitions*k rows per query).
    * Deterministic tie-break: higher sim first, then lower id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    val sims = corpus.join(broadcast(queries), col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("__g_pid", spark_partition_id())
    val local = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("sim").desc, col(corpusId).asc)
    val global = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col(corpusId).asc)
    sims.withColumn("__g_lr", row_number().over(local)).where(col("__g_lr") <= k)
      .withColumn("rank", row_number().over(global)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** k-NN join: for every row of `left`, its top-k cosine neighbors in
    * `right`. Same two-stage shape; `left` is broadcast when small
    * (caller controls by passing a filtered frame). */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int,
      leftId: String, leftVec: String, rightId: String, rightVec: String): DataFrame =
    bruteForceTopK(
      left.select(col(leftId).as("query_id"), col(leftVec).as("query_vec")),
      right.select(col(rightId).as("vec_id"), col(rightVec).as("embedding")), k)

  /** Embedding-cosine near-duplicate pairs above a threshold.
    * Exact (all-pairs within length-balanced blocks); use for modest
    * corpora or as the verify stage after `lshTopK` bucketing. */
  def nearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine_similarity(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF (inverted-file) ANN index: partition the corpus into
    * `clusters` Voronoi cells around centroids (deterministic seeds =
    * lowest-id vectors, refined by one Lloyd iteration — enough to
    * spread seeds; more iterations are a drop-in), then answer queries
    * by exact search over only the `nprobe` nearest cells.
    *
    * Scale: centroids are tiny and broadcast; cell assignment is one
    * linear scan; a query touches ~corpus*nprobe/clusters vectors.
    * Everything is DataFrame ops (posexplode/avg/max_by), so the
    * index build is shuffle-shaped, not driver-side. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int = 16, nprobe: Int = 4, iterations: Int = 1,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && iterations >= 1)
    // deterministic seeds: the `clusters` lowest-id vectors
    val seeds = corpus.orderBy(col(corpusId)).limit(clusters)
      .select(col(corpusId).as("cid0"), col(corpusVec).as("cvec0"))
      .withColumn("cid", row_number().over(Window.orderBy(col("cid0"))) - 1)
      .select("cid", "cvec0")
    // Lloyd iterations: assign -> elementwise mean per cell -> repeat
    def recenter(cents: DataFrame, vecCol: String): DataFrame =
      corpus.crossJoin(broadcast(cents))
        .withColumn("__sim", cosine_similarity(col(corpusVec), col(vecCol)))
        .groupBy(col(corpusId), col(corpusVec))
        .agg(max_by(col("cid"), col("__sim")).as("cid"))
        .select(col("cid"), posexplode(col(corpusVec)).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg("v").as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("cvec"))
    var centroids = recenter(seeds, "cvec0")
    for (_ <- 1 until iterations) centroids = recenter(centroids, "cvec")
    val indexed = corpus.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine_similarity(col(corpusVec), col("cvec")))
      .groupBy(col(corpusId), col(corpusVec))
      .agg(max_by(col("cid"), col("__sim")).as("cid"))
    // probe: each query searches its nprobe nearest cells
    val pw = Window.partitionBy(col(queryId)).orderBy(col("__csim").desc, col("cid").asc)
    val probes = broadcast(queries).crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine_similarity(col(queryVec), col("cvec")))
      .withColumn("__pr", row_number().over(pw)).where(col("__pr") <= nprobe)
      .select(col(queryId), col(queryVec), col("cid"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    probes.join(indexed, Seq("cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"), col("sim"))
  }

  /** Approximate top-k via random-hyperplane LSH: `tables` independent
    * `bits`-bit signatures; a corpus vector is a candidate for a query
    * if any signature matches exactly; candidates are re-ranked by
    * exact cosine. Recall grows with tables, cost with bucket size
    * (corpus/2^bits per table in expectation). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 12, tables: Int = 4,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    def sig(df: DataFrame, vec: String, pfx: String): DataFrame =
      df.withColumn(s"${pfx}t", explode(sequence(lit(0), lit(tables - 1))))
        .withColumn(s"${pfx}sig", hyperplane_lsh(col(vec), bits, col(s"${pfx}t")))
    val qs = sig(broadcast(queries), queryVec, "__gq_")
    val cs = sig(corpus, corpusVec, "__gc_")
    val cand = cs.join(qs,
        col("__gc_t") === col("__gq_t") && col("__gc_sig") === col("__gq_sig") &&
          col(queryId) =!= col(corpusId))
      .dropDuplicates(queryId, corpusId)
      .withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }
}
