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

  /** Exact top-k over the QUANTIZED domain — the flat-scan tier of the
    * probe-cost planner ([[graft.plans.AnnPlanner]]): same
    * floor(x*scale) integer cosine, tie-breaks, and output schema as
    * [[ivfBalancedTopK]], with NO training and NO pruning — every
    * corpus row is scored for every query, two-stage top-k reduction.
    * Identical results to ivfBalancedTopK at nprobe = clusters (the
    * candidate set is the whole corpus either way), which is what lets
    * the planner switch tiers without changing answer semantics. */
  /** EXACT MAXIMUM-INNER-PRODUCT top-k (MIPS) — the recommender-
    * scoring ranking (score = ⟨user, item⟩, UNNORMALIZED: a
    * high-norm item legitimately outranks a near-parallel low-norm
    * one, which is exactly what cosine ANN cannot serve; the spec
    * proves the two rankings genuinely differ on the corpus).
    * Quantized exact-integer dots, the s1 two-stage local-top-k
    * reduction and tie rules ((ip desc, id asc)); `ip` is the exact
    * BIGINT score, which is what lets the oracle hash-check it. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      scale: Int = 1024, queryId: String = "query_id",
      queryVec: String = "query_vec", corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    val q = queries.select(col(queryId), quant(col(queryVec)).as("__qq"))
    val c = corpus.select(col(corpusId).cast("long").as("vec_id"),
      quant(col(corpusVec)).as("__cq"))
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("ip").desc, col("vec_id").asc)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("ip").desc, col("vec_id").asc)
    c.join(broadcast(q), col(queryId) =!= col("vec_id"))
      .withColumn("ip", dot(col("__qq"), col("__cq")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl))
      .where(col("__g_lc") <= k)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("vec_id").as("neighbor_id"),
        col("ip"))
  }

  /** MIPS served by the COSINE machinery via NORM AUGMENTATION
    * (Bachrach et al. '14 / Neyshabur & Srebro '15): append ONE
    * dimension a_x = √(M² − |x|²) to every corpus vector (M = the max
    * corpus norm) and 0 to every query — augmented corpus norms are
    * all M, so augmented-cosine ORDER equals inner-product ORDER and
    * any cosine ANN index can serve MIPS. Candidates come from
    * [[ivfBalancedTopK]] over the augmented vectors (capacity-bounded
    * cells, the s15 probe discipline), then an EXACT integer-IP
    * re-rank of just the candidates on the ORIGINAL vectors — so
    * quantization error in the augmented dimension can stage but
    * never mis-SCORE. At full probe with candidates ≥ the probed
    * rows the staging is lossless and the result EQUALS [[mipsTopK]]
    * (spec-asserted); pruned probes trade recall for the usual
    * nprobe × capacity read bound (spec-measured). The max-norm M²
    * is one bounded aggregate (a driver scalar). */
  def mipsIvfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int, nprobe: Int, iterations: Int, capacity: Long,
      maxRounds: Int = 8, scale: Int = 1024, candidates: Int = 50,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(candidates >= k)
    val cd = corpus.select(col(corpusId),
        col(corpusVec).cast(ArrayType(DoubleType)).as("__v"))
      .withColumn("__n2",
        aggregate(transform(col("__v"), x => x * x), lit(0.0), _ + _))
    val m2 = cd.agg(max("__n2")).head().getDouble(0)
    val aug = cd.select(col(corpusId),
      concat(col("__v"),
        array(sqrt(greatest(lit(m2) - col("__n2"), lit(0.0)))))
        .as(corpusVec))
    val qaug = queries.select(col(queryId),
      concat(col(queryVec).cast(ArrayType(DoubleType)), array(lit(0.0)))
        .as(queryVec))
    val cand = ivfBalancedTopK(qaug, aug, k = candidates,
        clusters = clusters, nprobe = nprobe, iterations = iterations,
        capacity = capacity, maxRounds = maxRounds, scale = scale,
        candidates = candidates, queryId = queryId, queryVec = queryVec,
        corpusId = corpusId, corpusVec = corpusVec)
      .select(col(queryId), col("neighbor_id").as("vec_id"))
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    val qq = queries.select(col(queryId), quant(col(queryVec)).as("__qq"))
    val cc = corpus.select(col(corpusId).cast("long").as("vec_id"),
      quant(col(corpusVec)).as("__cq"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("ip").desc, col("vec_id").asc)
    cand.join(cc, "vec_id").join(broadcast(qq), Seq(queryId))
      .withColumn("ip", dot(col("__qq"), col("__cq")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("vec_id").as("neighbor_id"),
        col("ip"))
  }

  def bruteForceQuantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      scale: Int = 1024, queryId: String = "query_id",
      queryVec: String = "query_vec", corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    def sqnorm(a: Column) = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val q = queries.select(col(queryId), quant(col(queryVec)).as("__qq"))
      .withColumn("__qna", sqnorm(col("__qq")))
    val c = corpus.select(col(corpusId).cast("long").as("vec_id"),
        quant(col(corpusVec)).as("__cq"))
      .withColumn("__cna", sqnorm(col("__cq")))
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col("vec_id").asc)
    c.join(broadcast(q), col(queryId) =!= col("vec_id"))
      .withColumn("sim", dot(col("__qq"), col("__cq")).cast("double") /
        sqrt(col("__qna").cast("double") * col("__cna")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl))
      .where(col("__g_lc") <= k)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("vec_id").as("neighbor_id"),
        col("sim"))
  }

  /** md5-derived ±1 sign for a Johnson-Lindenstrauss projection cell:
    * parity of the first hex digit of md5("salt:j:i"). Computed ONCE
    * driver-side per (row, column) of the tiny outDim×dim matrix and
    * shipped as a literal — the per-row work is pure integer
    * arithmetic — while staying bit-reproducible by any engine that
    * can md5 a string (the DuckDB oracle re-derives the same matrix
    * in SQL). */
  def rpSign(salt: String, j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** Johnson-Lindenstrauss random-projection sketch: each embedding
    * maps from `dim` floats to `outDim` exact BIGINTs via a ±1 sign
    * matrix ([[rpSign]]). Input coordinates quantize to fixed-point
    * floor(x·scale) FIRST, so every projected coordinate is an exact
    * integer sum — no float addition order anywhere, identical on any
    * engine and under any partitioning. The sketch is the 100 TB
    * shrink step: a 64-dim float corpus becomes outDim longs (4x
    * fewer cells at outDim=16) that downstream search scans with pure
    * integer dot products. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int = 64, outDim: Int = 16, scale: Int = 1048576,
      salt: String = "rp"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(outDim >= 1 && dim >= 1)
    val signs = Array.tabulate(outDim, dim)((j, i) => rpSign(salt, j, i))
    val q = transform(col(vecCol).cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    // the sign matrix is known at PLAN time: each projected
    // coordinate is one zip_with/aggregate loop against its ±1 row
    // literal — a small expression tree that stays inside codegen
    // (both a per-cell element_at fold and a fully-unrolled ±term sum
    // blew the tree up and fell out of codegen, 20x slower); terms
    // are exact BIGINTs, so fold order is irrelevant to the value
    val projCols = (0 until outDim).map { j =>
      aggregate(zip_with(col("__q"), typedlit(signs(j).toSeq), _ * _),
        lit(0L), _ + _)
    }
    df.select(col(idCol), q.as("__q"))
      .select(col(idCol), array(projCols: _*).as("proj"))
  }

  /** Top-k maximum-inner-product search in the projected space: both
    * sides pass through [[randomProjection]] (same salt → same
    * matrix), then the exact-integer dot product ranks candidates
    * with the usual two-stage top-k reduction (per-partition winners,
    * then a merge of #partitions×k rows — the full score matrix never
    * shuffles). JL preserves inner products to ±ε with outDim ~
    * O(log n / ε²), so this is the cheap first pass a re-ranker
    * refines; recall vs the exact scan is spec-measured. */
  def rpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, outDim: Int = 16, scale: Int = 1048576,
      salt: String = "rp", queryId: String = "query_id",
      queryVec: String = "query_vec", corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame = {
    val qp = randomProjection(queries, queryId, queryVec, dim, outDim,
      scale, salt).withColumnRenamed("proj", "__qp")
    val cp = randomProjection(corpus, corpusId, corpusVec, dim, outDim,
      scale, salt).withColumnRenamed("proj", "__cp")
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("dot_q").desc, col(corpusId).asc)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("dot_q").desc, col(corpusId).asc)
    cp.join(broadcast(qp), col(queryId) =!= col(corpusId))
      .withColumn("dot_q",
        aggregate(zip_with(col("__qp"), col("__cp"), _ * _), lit(0L), _ + _))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lr", row_number().over(wl)).where(col("__g_lr") <= k)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("dot_q"))
  }

  /** Two-stage sketch-and-refine ANN: [[rpTopK]] retrieves a
    * `candidates`-deep pool per query in the projected space (cheap
    * integer dots over outDim coords), then ONLY those candidates are
    * re-scored with the exact fixed-point dot in the original space
    * and reduced to top-k. The corpus-scale pass touches the sketch;
    * the full-width vectors are read for queries×candidates rows via
    * a broadcast of the (tiny) candidate list — the classic
    * sketch-then-rerank shape. Note the honest JL ledger: shrinking
    * 64 dims to 16 carries ε ≈ √(8·ln n / outDim) distortion, so at
    * these widths this is a coarse filter whose recall the spec
    * MEASURES (≥0.35 on the test corpus) — the sketch pays off when
    * the input dimension (or corpus size) is large relative to the
    * sketch width, exactly the 100 TB regime. */
  def rpRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      candidates: Int = 50, dim: Int = 64, outDim: Int = 16,
      scale: Int = 1048576, salt: String = "rp",
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(candidates >= k)
    val cand = rpTopK(queries, corpus, candidates, dim, outDim, scale, salt,
        queryId, queryVec, corpusId, corpusVec)
      .select(col(queryId), col("neighbor_id"))
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    val q = queries.select(col(queryId), quant(col(queryVec)).as("__qq"))
    val c = corpus.select(col(corpusId), quant(col(corpusVec)).as("__cq"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("dot_q").desc, col("neighbor_id").asc)
    c.join(broadcast(cand), col(corpusId) === col("neighbor_id"))
      .join(broadcast(q), Seq(queryId))
      .withColumn("dot_q",
        aggregate(zip_with(col("__qq"), col("__cq"), _ * _), lit(0L), _ + _))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("neighbor_id"), col("dot_q"))
  }

  /** MMR-DIVERSIFIED top-k (Carbonell & Goldstein '98): retrieve a
    * `candidates`-deep exact quantized-cosine pool per query, then
    * greedily select k results maximizing
    * `lambdaRel·rel(c) − lambdaDiv·max_{s∈S} sim(c, s)` — relevance
    * traded against redundancy with what's already picked, the
    * standard de-duplicating re-rank for RAG result sets. Both
    * weights are EXPLICIT literals (never `1 − lambdaRel`: the float
    * 1−0.7 is 0.30000000000000004, not the 0.3 an oracle writes).
    * First pick is pure argmax relevance (S empty); ties break by id
    * ascending. All sims are the engine-portable floor(x·scale)
    * integer-dot cosine of [[bruteForceQuantizedTopK]].
    *
    * Plan shape: the corpus-scale work is exactly one candidate
    * retrieval (two-stage top-C); everything after runs on
    * queries × C rows (pairwise: × C²) — both localCheckpointed once,
    * so the k greedy rounds (each a tiny max-agg + anti-join +
    * per-query argmax) never re-touch the corpus. Driver holds no
    * data; rounds are chained tiny shuffles like the balanced-k-means
    * acceptance rounds. */
  def mmrDiversifyTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      candidates: Int = 20, lambdaRel: Double = 0.7,
      lambdaDiv: Double = 0.3, scale: Int = 1024,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(k >= 1 && candidates >= k)
    val cand = bruteForceQuantizedTopK(queries, corpus, candidates, scale,
        queryId, queryVec, corpusId, corpusVec)
      .select(col(queryId), col("neighbor_id").as("cid"),
        col("sim").as("rel"))
      // queries x C rows: collapse to a few partitions so the k greedy
      // round stages don't pay 32 near-empty tasks per shuffle
      .coalesce(4)
      .localCheckpoint()
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    def sqnorm(a: Column) = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val cv = corpus.select(col(corpusId).cast("long").as("vid"),
        quant(col(corpusVec)).as("v"))
      .withColumn("nv", sqnorm(col("v")))
    val ca = cand.select(col(queryId), col("cid"))
      .join(cv, col("cid") === col("vid"))
      .select(col(queryId), col("cid"), col("v").as("va"), col("nv").as("nva"))
    val cb = cand.select(col(queryId), col("cid").as("bcid"))
      .join(cv, col("bcid") === col("vid"))
      .select(col(queryId), col("bcid"), col("v").as("vb"), col("nv").as("nvb"))
    val pairs = ca.join(cb, Seq(queryId))
      .where(col("cid") =!= col("bcid"))
      .withColumn("psim", dot(col("va"), col("vb")).cast("double") /
        sqrt(col("nva").cast("double") * col("nvb")))
      .select(col(queryId), col("cid"), col("bcid"), col("psim"))
      .coalesce(4)
      .localCheckpoint()
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col("cid").asc)
    // each round's selection is localCheckpointed: sel feeds THREE
    // consumers next round (max-sim join, anti-join, union) and an
    // unmaterialized union chain would re-execute every earlier
    // round's shuffles — O(k^2) stages instead of O(k)
    var sel = cand
      .withColumn("score", lit(lambdaRel) * col("rel"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(queryId), col("cid"), col("score"), lit(1).as("pick"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val ms = pairs
        .join(sel.select(col(queryId), col("cid").as("bcid")),
          Seq(queryId, "bcid"))
        .groupBy(col(queryId), col("cid")).agg(max("psim").as("msim"))
      val next = cand.join(ms, Seq(queryId, "cid"))
        .join(sel.select(col(queryId), col("cid")),
          Seq(queryId, "cid"), "left_anti")
        .withColumn("score",
          lit(lambdaRel) * col("rel") - lit(lambdaDiv) * col("msim"))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col(queryId), col("cid"), col("score"), lit(r).as("pick"))
      sel = sel.unionByName(next).localCheckpoint()
    }
    sel.select(col(queryId), col("pick").cast("int").as("pick"),
      col("cid").as("neighbor_id"), col("score").as("mmr_score"))
  }

  /** k-NN join: for every row of `left`, its top-k cosine neighbors in
    * `right`. Same two-stage shape; `left` is broadcast when small
    * (caller controls by passing a filtered frame). */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int,
      leftId: String, leftVec: String, rightId: String, rightVec: String): DataFrame =
    bruteForceTopK(
      left.select(col(leftId).as("query_id"), col(leftVec).as("query_vec")),
      right.select(col(rightId).as("vec_id"), col(rightVec).as("embedding")), k)

  /** kNN-CLASSIFIER weak labeling — the semi-supervised labeling pass
    * a training-data pipeline runs when a small labeled seed set must
    * annotate the rest of the corpus (the classic transductive kNN /
    * label-spreading step): each unlabeled vector takes the MAJORITY
    * label among its k nearest labeled neighbors by cosine, ties to
    * the smallest label (the repo's determinism discipline — integer
    * votes, integer tiebreak, no float scoring beyond the ranked
    * cosine both engines already compute bit-equally).
    *
    * The neighbor search here is the exact [[bruteForceTopK]] (the
    * oracle regime); at scale the candidate stage swaps for the
    * shared materialized index's probe ([[graft.sources.VectorIndex]])
    * exactly as s16/s26 serve their queries — the vote aggregation is
    * unchanged either way.
    *
    * @return (query_id, label_pred, votes, top_sim) — votes = how
    *         many of the k neighbors carry the winning label; top_sim
    *         = the best cosine among them (a confidence signal).
    */
  def knnClassify(queries: DataFrame, labeled: DataFrame, k: Int,
      labelCol: String, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame = {
    val nn = bruteForceTopK(queries,
      labeled.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("embedding")), k)
    // a null label would sort FIRST in the argmin struct and win every
    // vote tie — unlabeled rows do not belong in the seed set
    val votes = nn.join(
        labeled.select(col(corpusId).as("neighbor_id"),
          col(labelCol).cast("long").as("__lbl"))
          .where(col("__lbl").isNotNull), "neighbor_id")
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"), max(col("sim")).as("top_sim"))
    votes.groupBy("query_id")
      .agg(min(struct((-col("votes")).as("nv"), col("__lbl").as("l"),
        (-col("top_sim")).as("ns"))).as("pick"))
      .select(col("query_id"), col("pick.l").as("label_pred"),
        (-col("pick.nv")).as("votes"), (-col("pick.ns")).as("top_sim"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold —
    * VERIFY-STAGE-ONLY: this is an all-pairs nested-loop join (O(n^2),
    * broadcast of one whole side). Use `nearDupPairsBlocked` as the
    * pipeline operator; keep this for candidate verification or
    * corpora that fit one executor. */
  def nearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine_similarity(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** EXACT all-pairs near-duplicate join via GRID sharding (the
    * 1-Bucket-Theta shape from the published theta-join literature):
    * rows hash into `blocks` groups; every unordered block pair (i,j)
    * becomes one equi-join key, the left side replicating each row to
    * its keys (i, j>=i) and the right to (i<=j, j). The join is a plain
    * shuffle equi-join on the block-pair key — NO broadcast, NO nested
    * loop — and every id pair is examined exactly once (diagonal blocks
    * order by id; off-diagonal pairs meet at exactly one key).
    *
    * Exact O(n^2) compute is unavoidable for a guaranteed-complete
    * similarity join at permissive thresholds; what scale demands is
    * that the n^2 work be SHARDED EVENLY with bounded memory, which the
    * grid gives: each task holds two blocks (~2n/blocks rows) and
    * shuffle volume is n*(blocks+1)/2 rows. Pick blocks ~ a small
    * multiple of sqrt(cluster cores) (task count grows as blocks^2/2).
    * At high thresholds prefer `nearDupPairsBlocked`, whose LSH buckets
    * actually prune. */
  def nearDupPairsGrid(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blocks: Int = 16): DataFrame = {
    require(blocks >= 1)
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)).cast("int"))
    val a = ids.withColumn("bj", explode(sequence(col("blk"), lit(blocks - 1))))
      .select(col("blk").as("bi"), col("bj"),
        col("id").as("id_x"), col("vec").as("vec_x"))
    val b = ids.withColumn("bi2", explode(sequence(lit(0), col("blk"))))
      .select(col("bi2"), col("blk").as("bj2"),
        col("id").as("id_y"), col("vec").as("vec_y"))
    // diagonal keys see both orderings of an in-block pair: keep one.
    // off-diagonal pairs meet at exactly one key, either ordering.
    val once = (col("bi") =!= col("bj")) || (col("id_x") < col("id_y"))
    a.join(b, col("bi") === col("bi2") && col("bj") === col("bj2") &&
        col("id_x") =!= col("id_y") && once)
      .withColumn("sim", cosine_similarity(col("vec_x"), col("vec_y")))
      .where(col("sim") >= threshold)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"), col("sim"))
  }

  /** LSH-blocked near-duplicate pairs: candidates come from an
    * EQUALITY self-join on (table, hyperplane-signature) buckets —
    * shuffle-partitioned, no broadcast, no nested loop — then only
    * bucket collisions get the exact cosine verify.
    *
    * The table count is DERIVED from the threshold: a pair at cosine t
    * collides on one sign-bit with prob p = 1 - acos(t)/pi, on one
    * `bits`-bit table with p^bits, and is missed by all tables with
    * (1 - p^bits)^tables <= maxMissProb. Signatures are deterministic
    * (hash-seeded hyperplanes), so output is stable run to run.
    *
    * Cost model (honest): at production thresholds (0.85+) buckets
    * prune aggressively and this is strictly the 100 TB shape. At
    * permissive thresholds (~0.45, near-random in high dims) blocking
    * cannot prune much — the win is distribution: work partitions by
    * 64-bit bucket key across the cluster instead of broadcasting the
    * corpus into one executor's nested loop. Raising `bits` lowers
    * candidate volume per table but raises the derived table count
    * (signature cost); 4 bits balances the two around t~0.5. */
  def nearDupPairsBlocked(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 4, maxMissProb: Double = 1e-6): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0, 1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pBand = math.pow(p, bits)
    val tables = math.max(1,
      math.ceil(math.log(maxMissProb) / math.log1p(-pBand)).toInt)
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sigs = ids
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .select(col("id"), col("t"),
        hyperplane_lsh(col("vec"), bits, col("t")).as("sig"))
    val a = sigs.select(col("t").as("ta"), col("sig").as("siga"), col("id").as("id_a"))
    val b = sigs.select(col("t").as("tb"), col("sig").as("sigb"), col("id").as("id_b"))
    // ids only through the band join + dedup; vectors re-attached to
    // the (much smaller) distinct candidate set by equi-join
    val cand = a.join(b, col("ta") === col("tb") && col("siga") === col("sigb") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    cand
      .join(ids.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(ids.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("sim", cosine_similarity(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF (inverted-file) ANN index: partition the corpus into
    * `clusters` Voronoi cells around centroids (trained by Lloyd
    * iterations on a bounded deterministic sample), then answer
    * queries by exact search over only the `nprobe` nearest cells.
    *
    * Scale: the index is clusters x dim floats and the training set is
    * capped at `trainSample` vectors — BOTH independent of corpus size
    * — so training happens driver-side on the sample (the standard IVF
    * practice: FAISS trains coarse quantizers on a subsample of
    * 39..256 points per centroid, not the full corpus). The cluster
    * only does the two scans that must see all data: one TakeOrdered
    * pass to draw the hash-ordered sample, and the map-only assignment
    * projection, where the trained centroids are embedded as LITERALS
    * in a codegen'd argmax — no join, no shuffle keyed on the embedding
    * array. The probe is a broadcast hash join of the (small) query set
    * against the assigned corpus; a query touches
    * ~corpus*nprobe/clusters vectors.
    *
    * Determinism: the sample is drawn by (xxhash64(id), id) order and
    * driver-side Lloyd accumulates sequentially in that order, so the
    * centroids — and hence every assignment — are identical run to run
    * at any parallelism. Ties on assignment break to the lowest cell
    * id both in training and in the literal argmax. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int = 16, nprobe: Int = 4, iterations: Int = 5,
      trainSample: Int = 8192,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && iterations >= 1 && trainSample >= clusters)
    val cents = trainCentroids(corpus, clusters, iterations, trainSample,
      corpusId, corpusVec)
    val indexed = corpus.withColumn("__g_cid", cidOf(col(corpusVec), cents))
    val probes = probeCells(queries, cents, nprobe, queryId, queryVec)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    broadcast(probes).join(indexed, Seq("__g_cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"), col("sim"))
  }

  /** Lloyd-trained centroids over a bounded deterministic sample (hash
    * order spreads it uniformly over the corpus regardless of storage
    * layout) — the driver-side state is `clusters x dim` floats however
    * large the corpus. */
  def trainCentroids(corpus: DataFrame, clusters: Int, iterations: Int,
      trainSample: Int, corpusId: String, corpusVec: String): Array[Array[Float]] = {
    val sample: Array[Array[Float]] = corpus
      .orderBy(xxhash64(col(corpusId)), col(corpusId)).limit(trainSample)
      .select(col(corpusVec)).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "trainCentroids: empty corpus")
    val dim = sample.head.length
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val nc = math.min(clusters, sample.length)
    val cents: Array[Array[Float]] = sample.take(nc).map(_.clone())
    for (_ <- 0 until iterations) {
      val sums = Array.fill(nc)(new Array[Double](dim))
      val counts = new Array[Long](nc)
      sample.foreach { v =>
        var best = 0; var bs = -2.0; var c = 0
        while (c < nc) { val s = cos(v, cents(c)); if (s > bs) { bs = s; best = c }; c += 1 }
        counts(best) += 1
        val su = sums(best); var i = 0
        while (i < dim) { su(i) += v(i); i += 1 }
      }
      // empty cells keep their previous centroid
      for (c <- 0 until nc if counts(c) > 0; i <- 0 until dim)
        cents(c)(i) = (sums(c)(i) / counts(c)).toFloat
    }
    cents
  }

  /** Map-only cell assignment against the trained centroid literals:
    * argmax by (sim, -cid) via lexicographic array_max over structs. */
  def cidOf(vec: Column, cents: Array[Array[Float]]): Column = array_max(array(
    cents.zipWithIndex.map { case (cv, i) =>
      struct(cosine_similarity(vec, lit(cv)).as("sim"),
        lit(-i).as("negcid"), lit(i).as("cid"))
    }: _*)).getField("cid")

  /** Each query row exploded to its nprobe nearest cells (sim desc,
    * cid asc ties — encoded as ascending (-sim, cid) struct sort). */
  private def probeCells(queries: DataFrame, cents: Array[Array[Float]],
      nprobe: Int, queryId: String, queryVec: String): DataFrame =
    queries.withColumn("__g_pc", explode(slice(array_sort(array(
        cents.zipWithIndex.map { case (cv, i) =>
          struct((-cosine_similarity(col(queryVec), lit(cv))).as("negsim"),
            lit(i).as("cid"))
        }: _*)), 1, nprobe)))
      .select(col(queryId), col(queryVec), col("__g_pc.cid").as("__g_cid"))

  /** Asymmetric SQ8 exhaustive top-k: the corpus is scanned as
    * dequantized 8-bit codes (4x less memory traffic at the scan — the
    * FAISS-SQ trade), queries stay exact. Same two-stage reduction and
    * tie-break as [[bruteForceTopK]]; `sim` is the approximate
    * (quantized-corpus) cosine. */
  def sqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    val (mns, mxs) = Quantize.minMaxRanges(corpus, corpusVec)
    val sims = corpus
      .withColumn("__g_dv", Quantize.dequantizeColumn(col(corpusVec), mns, mxs))
      .join(broadcast(queries), col(queryId) =!= col(corpusId))
      .withColumn("sim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_dv")))
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

  /** PQ search: codes are `subspaces` nibble-sized indices per vector
    * (64-dim float32 -> 8 nibbles at the defaults: the scanned payload
    * shrinks 64x), approximate scoring runs against the PQ
    * reconstruction, and an EXACT re-rank of the top `candidates`
    * recovers true neighbors. Deterministic codebook (see
    * [[Quantize.pqCodebook]]) keeps the whole pipeline mirrorable. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      subspaces: Int = 8, codewords: Int = 16, candidates: Int = 50,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(candidates >= k)
    val refs = Quantize.pqCodebook(corpus, corpusId, corpusVec, codewords)
    // Two-stage candidate reduction, same shape as [[bruteForceTopK]]:
    // a local top-C inside each scan partition keeps the global
    // candidate rank from shuffling the full corpus x queries fan-out —
    // the shuffle carries only (#partitions x C) rows per query.
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val wc = Window.partitionBy(col(queryId))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    // Encode once per corpus row (its own projection, so the argmin
    // over codewords runs N times, not N x queries x subspaces), then
    // reconstruct from the tiny codes array before fanning out per
    // query below the join.
    val topC = corpus
      .withColumn("__g_codes",
        Quantize.pqCodesColumn(col(corpusVec), refs, subspaces))
      .withColumn("__g_rv",
        Quantize.pqReconstructFromCodes(col("__g_codes"), refs, subspaces))
      .join(broadcast(queries), col(queryId) =!= col(corpusId))
      .withColumn("__g_asim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_rv")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl)).where(col("__g_lc") <= candidates)
      .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= candidates)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    topC.withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** IVF-SQ: IVF cell pruning + SQ8 approximate scoring to pick
    * `candidates` per query, then an EXACT re-rank of just those — the
    * production ANN shape at 100 TB (index prunes cells, quantized scan
    * prunes candidates cheaply, exact math touches only `candidates`
    * rows per query). With nprobe = clusters the candidate stage is
    * deterministic over the whole corpus, which is what the oracle
    * checks; the pruning regime is spec-bounded by recall. */
  def ivfSqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int = 16, nprobe: Int = 4, candidates: Int = 20,
      iterations: Int = 5, trainSample: Int = 8192,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && candidates >= k)
    val cents = trainCentroids(corpus, clusters, iterations, trainSample,
      corpusId, corpusVec)
    val (mns, mxs) = Quantize.minMaxRanges(corpus, corpusVec)
    val indexed = corpus.withColumn("__g_cid", cidOf(col(corpusVec), cents))
      .withColumn("__g_dv", Quantize.dequantizeColumn(col(corpusVec), mns, mxs))
    val probes = probeCells(queries, cents, nprobe, queryId, queryVec)
    // Two-stage candidate reduction (see [[pqTopK]]): local top-C per
    // scan partition first, so the per-query rank shuffle carries
    // (#partitions x C) rows, not the whole probed-cell fan-out.
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val wc = Window.partitionBy(col(queryId))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val topC = broadcast(probes).join(indexed, Seq("__g_cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__g_asim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_dv")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl)).where(col("__g_lc") <= candidates)
      .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= candidates)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    topC.withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** IVF-PQ: the production ANN composition (FAISS's IndexIVFPQ shape)
    * — IVF cell pruning bounds which corpus rows are scored at all, PQ
    * codes (k-means-refined codebooks, [[Quantize.pqCodebookKMeans]])
    * score those cheaply from a `subspaces`-nibble payload, and an
    * EXACT cosine re-rank of the top `candidates` per query recovers
    * true neighbors. Candidate ranking is the same two-stage
    * (partition-local then global) reduction as [[pqTopK]], so no
    * shuffle ever carries the probed-cell fan-out.
    *
    * All trained state (centroids + codebook) is bounded driver-side
    * sample arithmetic embedded as literals — the scan stays map-only
    * and codegen'd at any corpus size. With nprobe = clusters and an
    * unbounded candidate budget the result is exactly brute force
    * (the oracle regime); the pruned regime is spec-bounded by recall
    * against [[bruteForceTopK]]. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int = 16, nprobe: Int = 4, candidates: Int = 50,
      subspaces: Int = 8, codewords: Int = 16,
      iterations: Int = 5, trainSample: Int = 8192,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && candidates >= k)
    val cents = trainCentroids(corpus, clusters, iterations, trainSample,
      corpusId, corpusVec)
    val refs = Quantize.pqCodebookKMeans(corpus, corpusId, corpusVec,
      codewords, subspaces, iterations, trainSample)
    val indexed = corpus.withColumn("__g_cid", cidOf(col(corpusVec), cents))
      .withColumn("__g_codes",
        Quantize.pqCodesColumn(col(corpusVec), refs, subspaces))
      .withColumn("__g_rv",
        Quantize.pqReconstructFromCodes(col("__g_codes"), refs, subspaces))
    val probes = probeCells(queries, cents, nprobe, queryId, queryVec)
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val wc = Window.partitionBy(col(queryId))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val topC = broadcast(probes).join(indexed, Seq("__g_cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__g_asim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_rv")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl)).where(col("__g_lc") <= candidates)
      .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= candidates)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    topC.withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** RESIDUAL IVF-PQ — the full FAISS IndexIVFPQ design: PQ encodes
    * each vector's RESIDUAL to its cell centroid (v - c), not v
    * itself, and reconstruction adds the centroid back (c + decode).
    * Residuals are what remains AFTER the coarse quantizer explains
    * the corpus's cluster structure, so their distribution is tighter
    * than the raw vectors' and the same codeword budget reconstructs
    * more accurately — the reason the published index encodes
    * residuals. One shared residual codebook (trained on the
    * cell-assigned residuals of the bounded sample) keeps the scan a
    * map-only projection: a per-cell codebook would be clusters x
    * codewords x dim of literal state and is the classic memory/recall
    * trade this parameterization leaves out.
    *
    * Plan shape is identical to [[ivfPqTopK]]: trained state as
    * literals, residual/encode/reconstruct as per-row projections,
    * two-stage candidate reduction, exact re-rank. Oracle regime
    * likewise: nprobe = clusters + unbounded candidates reduces to
    * exact top-k whatever the codes did. */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int = 16, nprobe: Int = 4, candidates: Int = 50,
      subspaces: Int = 8, codewords: Int = 16,
      iterations: Int = 5, trainSample: Int = 8192,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && candidates >= k)
    val cents = trainCentroids(corpus, clusters, iterations, trainSample,
      corpusId, corpusVec)
    val refs = residualCodebook(corpus, cents, codewords, subspaces,
      iterations, trainSample, corpusId, corpusVec)
    val centLits = array(cents.map(c => lit(c.map(_.toDouble))): _*)
    val indexed = corpus
      .withColumn("__g_cid", cidOf(col(corpusVec), cents))
      .withColumn("__g_cent", element_at(centLits, col("__g_cid") + 1))
      .withColumn("__g_res", zip_with(col(corpusVec).cast("array<double>"),
        col("__g_cent"), (a, b) => a - b))
      .withColumn("__g_codes",
        Quantize.pqCodesColumn(col("__g_res"), refs, subspaces))
      .withColumn("__g_rv", zip_with(col("__g_cent"),
        Quantize.pqReconstructFromCodes(col("__g_codes"), refs, subspaces),
        (a, b) => a + b))
    val probes = probeCells(queries, cents, nprobe, queryId, queryVec)
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val wc = Window.partitionBy(col(queryId))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val topC = broadcast(probes).join(indexed, Seq("__g_cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__g_asim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_rv")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl)).where(col("__g_lc") <= candidates)
      .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= candidates)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    topC.withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** PER-CELL residual IVF-PQ behind an EXPLICIT memory budget — the
    * classic memory/recall trade [[ivfPqResidualTopK]]'s shared book
    * leaves out, made governable: each coarse cell trains its OWN
    * residual codebook (cell residual distributions differ, so a
    * dedicated book reconstructs tighter than one shared book at the
    * same codeword count), and the total trained state — clusters x
    * codewords x dim doubles, the only term that scales with both
    * knobs — must fit `memoryBudgetBytes` or the codeword count is
    * CLAMPED down to fit (loud failure below 2: a budget that cannot
    * hold 2 codewords per cell cannot index at all). The budget is the
    * broadcast/reference-data ceiling an operator carries to every
    * task, which is exactly the number an operator at 1000 executors
    * must bound up front.
    *
    * Hot path stays map-only codegen: the per-row book is one
    * element_at on the constant-folded nested literal, the encode is
    * the SAME compiled [[graft.functions.PqEncode]] loop (book as a
    * column child instead of a literal), reconstruction slices the
    * row's own book. Cells the bounded sample never hit fall back to
    * the global residual book. Candidate staging and the exact
    * re-rank match the rest of the ladder, so the oracle regime is
    * unchanged (full probe + unbounded candidates = exact). */
  def ivfPqResidualPerCellTopK(queries: DataFrame, corpus: DataFrame,
      k: Int, clusters: Int = 16, nprobe: Int = 4, candidates: Int = 50,
      subspaces: Int = 8, codewords: Int = 16,
      iterations: Int = 5, trainSample: Int = 8192,
      memoryBudgetBytes: Long = 1L << 26,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe <= clusters && candidates >= k)
    val cents = trainCentroids(corpus, clusters, iterations, trainSample,
      corpusId, corpusVec)
    val dim = cents.head.length
    val cwBudget = memoryBudgetBytes / (clusters.toLong * dim * 8L)
    val cwEff = math.min(codewords.toLong, cwBudget).toInt
    require(cwEff >= 2,
      s"memory budget $memoryBudgetBytes B holds $cwBudget codewords per " +
        s"cell (< 2) at $clusters cells x $dim dims; raise the budget or " +
        "lower clusters")
    val sub = dim / subspaces
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    // one bounded sample, assigned once; each cell trains on ITS
    // residuals, empty cells take the global book
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col(corpusId)), col(corpusId)).limit(trainSample)
      .select(col(corpusVec).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "ivfPqResidualPerCellTopK: empty corpus")
    val byCell = Array.fill(clusters)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    sample.foreach { v =>
      var best = 0; var bs = -2.0; var c = 0
      while (c < cents.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          dot += v(i) * cents(c)(i); na += v(i) * v(i)
          nb += cents(c)(i).toDouble * cents(c)(i); i += 1
        }
        val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
        if (s > bs) { bs = s; best = c }
        c += 1
      }
      byCell(best) += v.indices.map(i => v(i) - cents(best)(i)).toArray
    }
    val globalBook = Quantize.pqCodebookKMeansFromSample(
      byCell.flatten.toArray, cwEff, subspaces, iterations)
    val books: Array[Array[Array[Double]]] = byCell.map { rs =>
      if (rs.isEmpty) globalBook
      else Quantize.pqCodebookKMeansFromSample(rs.toArray, cwEff,
        subspaces, iterations)
    }
    val booksLit = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val centLits = array(cents.map(c => lit(c.map(_.toDouble))): _*)
    val recon = concat((0 until subspaces).map { j =>
      slice(element_at(col("__g_book"),
        element_at(col("__g_codes"), j + 1) + 1), j * sub + 1, sub)
    }: _*)
    val indexed = corpus
      .withColumn("__g_cid", cidOf(col(corpusVec), cents))
      .withColumn("__g_cent", element_at(centLits, col("__g_cid") + 1))
      .withColumn("__g_res", zip_with(col(corpusVec).cast("array<double>"),
        col("__g_cent"), (a, b) => a - b))
      .withColumn("__g_book", element_at(booksLit, col("__g_cid") + 1))
      .withColumn("__g_codes", graft.functions.GraftFunctions
        .pq_encode_book(col("__g_res"), col("__g_book"), subspaces))
      .withColumn("__g_rv", zip_with(col("__g_cent"), recon, (a, b) => a + b))
    val probes = probeCells(queries, cents, nprobe, queryId, queryVec)
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val wc = Window.partitionBy(col(queryId))
      .orderBy(col("__g_asim").desc, col(corpusId).asc)
    val topC = broadcast(probes).join(indexed, Seq("__g_cid"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__g_asim", graft.functions.GraftFunctions.cosine_similarity_d(
        col(queryVec).cast("array<double>"), col("__g_rv")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl)).where(col("__g_lc") <= candidates)
      .withColumn("__g_cr", row_number().over(wc)).where(col("__g_cr") <= candidates)
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId).asc)
    topC.withColumn("sim", cosine_similarity(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId).as("neighbor_id"),
        col("sim"))
  }

  /** Residual PQ codebook: assign each SAMPLE vector to its cell with
    * the same (sim desc, cid asc) rule the scan uses, subtract the
    * centroid, train per-subspace Lloyd on the residuals. Bounded
    * driver-side work, deterministic by the sample's hash order. */
  def residualCodebook(corpus: DataFrame, cents: Array[Array[Float]],
      codewords: Int, subspaces: Int, iterations: Int = 5,
      trainSample: Int = 8192, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col(corpusId)), col(corpusId)).limit(trainSample)
      .select(col(corpusVec).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "residualCodebook: empty corpus")
    val residuals = sample.map { v =>
      var best = 0; var bs = -2.0; var c = 0
      while (c < cents.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          dot += v(i) * cents(c)(i); na += v(i) * v(i)
          nb += cents(c)(i).toDouble * cents(c)(i); i += 1
        }
        val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
        if (s > bs) { bs = s; best = c }
        c += 1
      }
      v.indices.map(i => v(i) - cents(best)(i)).toArray
    }
    Quantize.pqCodebookKMeansFromSample(residuals, codewords, subspaces,
      iterations)
  }

  /** Number of `bits`-bit LSH tables needed so a pair at cosine
    * `minSim` is missed by ALL tables with probability <= maxMissProb:
    * per-bit collision p = 1 - acos(s)/pi, per-table p^bits, miss
    * (1-p^bits)^T. This is the actual LSH guarantee — data-independent,
    * unlike an IVF index whose recall depends on cluster structure. */
  def lshTablesFor(minSim: Double, bits: Int, maxMissProb: Double): Int = {
    require(minSim > 0.0 && minSim < 1.0 && maxMissProb > 0.0 && maxMissProb < 1.0)
    val p = 1.0 - math.acos(minSim) / math.Pi
    val pBand = math.pow(p, bits)
    math.max(1, math.ceil(math.log(maxMissProb) / math.log1p(-pBand)).toInt)
  }

  /** Approximate top-k via random-hyperplane LSH: independent
    * `bits`-bit signatures; a corpus vector is a candidate for a query
    * if any signature matches exactly; candidates are re-ranked by
    * exact cosine. The table count is DERIVED from (`minSim`,
    * `maxMissProb`) via `lshTablesFor` — any true neighbor with cosine
    * >= minSim is found with prob >= 1 - maxMissProb, whatever the
    * corpus looks like (signatures are hash-seeded, so the output is
    * deterministic). Pruning pays when true-neighbor sims are high
    * (real embedding corpora); on isotropic data the candidate set
    * approaches the corpus and this degrades gracefully into a
    * *distributed* brute force — still equality-join shaped, never a
    * broadcast nested loop. Pass `tablesOverride` to pin the count. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, minSim: Double = 0.2, maxMissProb: Double = 1e-4,
      tablesOverride: Option[Int] = None,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    val tables = tablesOverride.getOrElse(lshTablesFor(minSim, bits, maxMissProb))
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

  /** Deterministic distributed k-means over fixed-point embeddings.
    *
    * Embeddings quantize to `scale`-step integers (floor(x*scale)), so
    * every dot product and norm is an exact integer small enough to be
    * exact in a double as well — spherical-cosine assignment is then
    * bit-reproducible across engines, partitionings, and cluster
    * sizes, which is what makes a clustering job auditable. Centroids
    * stay UNNORMALIZED integer sum-vectors (cosine is scale-invariant,
    * so dividing by the member count would only launder exact integers
    * into doubles). Exactness bound: the centroid norm is at most
    * dim*(scale*m)^2 for an m-member cluster, so with scale=1024 and
    * dim=64 it stays double-exact (< 2^53) up to m ~ 11.5k members —
    * recompute() enforces the bound loudly instead of letting cosines
    * silently degrade (size clusters via k, or lower `scale`, to stay
    * inside it; scale=256 lifts the bound to ~46k).
    *
    * Plan shape per iteration: one MAP-ONLY assignment pass against
    * centroid literals — unrolled scalar literals for small k, one
    * array-of-structs literal folded per row for large k (unrolling
    * there would exceed codegen's method limits; the literal is data,
    * so codegen stays small at any k) — + one posexplode/groupBy
    * whose map-side partials reduce the shuffle to k*dim rows per
    * partition; driver state is k*dim longs. Seeds are the first k
    * vectors by id — deterministic, no RNG.
    */
  def kmeansQuantized(corpus: DataFrame, k: Int, iterations: Int,
      scale: Int = 1024, idCol: String = "vec_id",
      vecCol: String = "embedding",
      initialSeeds: Option[Seq[(Long, Array[Long])]] = None): DataFrame = {
    require(k >= 2 && iterations >= 1)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val quant = transform(col(vecCol).cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    val e = corpus.select(col(idCol).cast("long").as("vec_id"),
      quant.as("q"))
    // default seeds: first k vectors by id — deterministic under ANY
    // id distribution (a `vec_id < k` filter would silently under-seed
    // a corpus slice with offset or sparse ids). Callers wanting
    // spread-out seeds pass [[kmeansPlusPlusSeeds]] instead.
    val seeds = initialSeeds.map(_.sortBy(_._1).toArray).getOrElse {
      e.orderBy(col("vec_id")).limit(k)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    }
    require(seeds.length == k,
      s"kmeansQuantized: ${seeds.length} seed vectors for k=$k")
    val dim = seeds.head._2.length
    val en = e // query norm is computed inside the assignment expression

    // argmax-cosine assignment; ties -> lowest cid. ALWAYS map-only —
    // no join, no shuffle, at any k: ONE codegen'd CentroidArgmax
    // expression carrying the centroids as reference data, so the
    // generated code is a tight k*dim loop whether k is 8 or 8000
    // (unrolled literals die at codegen's method limits near k~100;
    // a transform/aggregate fold over an array literal is interpreted
    // per row — measured 15.5 s vs 1.9 s for d11 at sf0.1).
    def assign(cents: Seq[(Long, Array[Long])]): DataFrame = {
      val expr = graft.functions.CentroidArgmax(
        org.apache.spark.sql.graftshim.SparkShims.expression(col("q")),
        cents.map(_._1).toArray,
        cents.map(_._2).toArray,
        cents.map(_._2.map(x => x * x).sum.toDouble).toArray) // exact (< 2^53)
      en.withColumn("cid",
        org.apache.spark.sql.graftshim.SparkShims.column(expr))
    }

    var cents: Seq[(Long, Array[Long])] = seeds.toSeq
    var assigned = assign(cents)
    for (_ <- 2 to iterations) {
      cents = recomputeCentroids(assigned, dim, scale)
      assigned = assign(cents)
    }
    assigned.select(col("vec_id"), col("cid").as("cluster"))
  }

  /** One Lloyd recompute: per-cluster integer sum-vectors from an
    * assignment (map-side-combined k*dim-row shuffle, k*dim longs of
    * driver state), with the double-exactness bound enforced loudly. */
  private def recomputeCentroids(assigned: DataFrame, dim: Int,
      scale: Int): Seq[(Long, Array[Long])] = {
    val sums = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("cid", "i").agg(sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    sums.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, ds) =>
      val arr = new Array[Long](dim)
      ds.foreach { case (_, i, s) => arr(i) = s }
      // keep the centroid norm double-exact: Σ c_d^2 < 2^53 requires
      // |c_d| <= sqrt(2^53 / dim); beyond it cosines silently lose
      // bit-reproducibility (and eventually overflow Long) — fail
      // loudly so the caller raises k or lowers `scale`
      val bound = math.sqrt(9007199254740992.0 / dim).toLong
      arr.foreach(c => require(math.abs(c) <= bound,
        s"cluster $cid too heavy for exact arithmetic at scale=$scale " +
          s"(|component| ${arr.map(math.abs).max} > $bound); " +
          "raise k or lower scale"))
      (cid, arr)
    }
  }

  /** BALANCED k-means: the same deterministic quantized training as
    * [[kmeansQuantized]], but assignment respects a hard per-cluster
    * `capacity` — no cluster ends over it, ever. The knob that turns
    * the d11 pair-budget guard from a loud failure into a structural
    * guarantee: capacity-bounded clusters mean capacity-bounded
    * quadratic work downstream, whatever the embedding distribution
    * does (the collapse case where half the corpus lands in one cell
    * is exactly when unbalanced SemDeDup melts).
    *
    * Assignment is DEFERRED ACCEPTANCE, deterministic end to end:
    * each round, every unassigned point proposes to its best OPEN
    * centroid (argmax cosine over centroids with capacity left — the
    * same codegen'd scan as the unbalanced path, restricted to the
    * open subset); each centroid accepts its top-`remaining`
    * proposals by (cosine desc, vec_id asc) PERMANENTLY; rejected
    * points re-propose next round. Each round at least one centroid
    * fills or every proposal is accepted, so the loop provably ends;
    * `maxRounds` fails loudly rather than silently truncating.
    *
    * Per round: one map-only proposal pass (two codegen'd expressions
    * against the open-centroid literals), a TWO-PHASE top-`remaining`
    * per centroid (rank within (cid, bucket) first, so no single task
    * ever sorts a whole centroid's proposals — survivors are at most
    * buckets*remaining), one anti-join for the rejects, and a k-row
    * driver update of remaining capacities. Requires k*capacity >= n
    * (one count) up front. */
  def kmeansBalanced(corpus: DataFrame, k: Int, iterations: Int,
      capacity: Long, maxRounds: Int = 8, scale: Int = 1024,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initialSeeds: Option[Seq[(Long, Array[Long])]] = None): DataFrame =
    kmeansBalancedWithCentroids(corpus, k, iterations, capacity, maxRounds,
      scale, idCol, vecCol, initialSeeds)._1

  /** [[kmeansBalanced]] plus the FINAL trained centroids — the coarse
    * quantizer [[ivfBalancedTopK]] probes against. */
  def kmeansBalancedWithCentroids(corpus: DataFrame, k: Int, iterations: Int,
      capacity: Long, maxRounds: Int = 8, scale: Int = 1024,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initialSeeds: Option[Seq[(Long, Array[Long])]] = None)
      : (DataFrame, Seq[(Long, Array[Long])]) = {
    require(k >= 2 && iterations >= 1 && capacity >= 1 && maxRounds >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val quant = transform(col(vecCol).cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    val e = corpus.select(col(idCol).cast("long").as("vec_id"),
      quant.as("q"))
    val n = e.count()
    require(k * capacity >= n,
      s"kmeansBalanced: k*capacity = ${k * capacity} < $n rows")
    val seeds = initialSeeds.map(_.sortBy(_._1).toArray).getOrElse {
      e.orderBy(col("vec_id")).limit(k)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    }
    require(seeds.length == k,
      s"kmeansBalanced: ${seeds.length} seed vectors for k=$k")
    val dim = seeds.head._2.length
    // the same training loop as kmeansQuantized — balancing constrains
    // the FINAL assignment only, centroids train unconstrained
    var cents: Seq[(Long, Array[Long])] = seeds.toSeq
    for (_ <- 2 to iterations) {
      val expr = graft.functions.CentroidArgmax(
        org.apache.spark.sql.graftshim.SparkShims.expression(col("q")),
        cents.map(_._1).toArray, cents.map(_._2).toArray,
        cents.map(_._2.map(x => x * x).sum.toDouble).toArray)
      cents = recomputeCentroids(e.withColumn("cid",
        org.apache.spark.sql.graftshim.SparkShims.column(expr)), dim, scale)
    }

    val accepted = balancedAssign(e, cents,
      cents.map(_._1 -> capacity).toMap, maxRounds)
    (accepted.select(col("vec_id"), col("cid").as("cluster")), cents)
  }

  /** The DEFERRED-ACCEPTANCE assignment rounds of [[kmeansBalanced]],
    * factored out so an incremental index append can run them against
    * FROZEN centroids with per-cell remaining capacity carried over
    * from the already-materialized cells ([[graft.sources.VectorIndex]]).
    * Input `e` is (vec_id, q: quantized array<long>); returns every
    * row assigned as (vec_id, cid), or fails loudly when capacity
    * cannot absorb the rows within `maxRounds`. */
  private[graft] def balancedAssign(e: DataFrame,
      cents: Seq[(Long, Array[Long])], remaining0: Map[Long, Long],
      maxRounds: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val buckets = 32
    var remaining: Map[Long, Long] = remaining0
    var unassigned = e.localCheckpoint(true)
    var left = unassigned.count()
    if (left == 0) // an empty batch assigns to nothing
      return e.select(col("vec_id"), lit(0L).as("cid")).where(lit(false))
    var accepted: Option[DataFrame] = None
    var round = 0
    while (left > 0 && round < maxRounds) {
      round += 1
      val open = cents.filter(c => remaining(c._1) > 0)
      require(open.nonEmpty,
        s"balancedAssign: $left rows left but every cell is full")
      val argmax = org.apache.spark.sql.graftshim.SparkShims.column(
        graft.functions.CentroidArgmax(
          org.apache.spark.sql.graftshim.SparkShims.expression(col("q")),
          open.map(_._1).toArray, open.map(_._2).toArray,
          open.map(_._2.map(x => x * x).sum.toDouble).toArray))
      val maxcos = org.apache.spark.sql.graftshim.SparkShims.column(
        graft.functions.CentroidMaxCos(
          org.apache.spark.sql.graftshim.SparkShims.expression(col("q")),
          open.map(_._1).toArray, open.map(_._2).toArray,
          open.map(_._2.map(x => x * x).sum.toDouble).toArray))
      val props = unassigned
        .withColumn("cid", argmax).withColumn("__cos", maxcos)
      val remDf = broadcast(
        open.map(c => (c._1, remaining(c._1))).toDF("cid", "__rem"))
      // two-phase acceptance: a point in a centroid's global
      // top-remaining is in the top-remaining of its bucket, so the
      // bucket-local rank prunes before any single-task per-cid sort
      val local = props
        .withColumn("__b", pmod(xxhash64(col("vec_id")), lit(buckets)))
        .withColumn("__lr", row_number().over(
          Window.partitionBy(col("cid"), col("__b"))
            .orderBy(col("__cos").desc, col("vec_id").asc)))
        .join(remDf, "cid")
        .where(col("__lr") <= col("__rem"))
      val acc = local
        .withColumn("__r", row_number().over(Window.partitionBy(col("cid"))
          .orderBy(col("__cos").desc, col("vec_id").asc)))
        .where(col("__r") <= col("__rem"))
        .select(col("vec_id"), col("cid"))
        .localCheckpoint(true)
      accepted = Some(accepted.map(_.unionByName(acc)).getOrElse(acc))
      val taken = acc.groupBy("cid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      remaining = remaining ++ taken.map { case (cid, t) =>
        cid -> (remaining(cid) - t) }
      left -= taken.map(_._2).sum
      if (left > 0) unassigned = unassigned
        .join(acc, Seq("vec_id"), "left_anti").localCheckpoint(true)
    }
    require(left == 0,
      s"balancedAssign: $left rows unassigned after $maxRounds rounds; " +
        "raise maxRounds or capacity")
    accepted.get
  }

  /** BALANCED IVF ANN: the coarse quantizer assigns the corpus under a
    * hard per-cell `capacity` ([[kmeansBalanced]]'s deferred
    * acceptance), so EVERY inverted list is capacity-bounded — probe
    * cost per query is structurally ≤ nprobe × capacity however skewed
    * the embedding distribution is. Plain IVF's failure mode at scale
    * is exactly the hot cell holding half the corpus: one probe of it
    * approaches brute force and its per-cell state blows any memory
    * budget; the balanced quantizer turns that tail risk into an
    * invariant the planner can size for.
    *
    * The price is recall at the margin: a vector can be displaced from
    * its nearest (full) cell into its best OPEN one, so a query
    * probing the vector's nearest cells may miss it; nprobe buys the
    * displacement back.
    *
    * All scoring is EXACT-INTEGER cosine over the quantized domain
    * (dot products and norms are longs; only the final division is
    * floating), so assignment, probe, and ranking are bit-reproducible
    * and the whole pipeline — training rounds, acceptance rounds,
    * probe, search — replays in the oracle CTE by CTE. The local
    * top-C stage keeps per-partition state bounded without changing
    * the global top-k (C ≥ k is lossless). */
  def ivfBalancedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int, nprobe: Int, iterations: Int, capacity: Long,
      maxRounds: Int = 8, scale: Int = 1024, candidates: Int = 50,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nprobe <= clusters && candidates >= k)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val (assigned, cents) = kmeansBalancedWithCentroids(corpus, clusters,
      iterations, capacity, maxRounds, scale, corpusId, corpusVec)
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    def sqnorm(a: Column) = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val indexed = corpus
      .select(col(corpusId).cast("long").as("vec_id"),
        quant(col(corpusVec)).as("__cq"))
      .withColumn("__cna", sqnorm(col("__cq")))
      .join(assigned, "vec_id")
    // nprobe best cells by the same exact-integer cosine, ties to the
    // lowest cell id — the centroids ride as literals, map-only
    val probes = queries
      .select(col(queryId), quant(col(queryVec)).as("__qq"))
      .withColumn("__qna", sqnorm(col("__qq")))
      .withColumn("__pc", explode(slice(array_sort(array(
        cents.map { case (cid, cv) =>
          val nc = cv.map(x => x * x).sum.toDouble
          struct((-(dot(col("__qq"), lit(cv)).cast("double") /
            sqrt(col("__qna").cast("double") * lit(nc)))).as("negcos"),
            lit(cid).as("cid"))
        }: _*)), lit(1), lit(nprobe))))
      .select(col(queryId), col("__qq"), col("__qna"),
        col("__pc.cid").as("cluster"))
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col("vec_id").asc)
    broadcast(probes).join(indexed, Seq("cluster"))
      .where(col(queryId) =!= col("vec_id"))
      .withColumn("sim", dot(col("__qq"), col("__cq")).cast("double") /
        sqrt(col("__qna").cast("double") * col("__cna")))
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl))
      .where(col("__g_lc") <= candidates)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("vec_id").as("neighbor_id"),
        col("sim"))
  }

  /** Deterministic k-means++-style FARTHEST-POINT seeding over the
    * quantized domain: seed 1 is the minimum-id vector; each next seed
    * is the vector with the LARGEST squared-L2 distance to its nearest
    * existing seed (ties -> lowest id) — the classic k-center greedy,
    * which is k-means++ with the D^2 sampling made deterministic by
    * taking the argmax instead of drawing from it. First-k-by-id
    * seeding can plant every centroid inside one dense region and
    * leave clusters degenerate; farthest-point spreads them by
    * construction.
    *
    * All arithmetic is exact (quantized longs; squared distances fit a
    * long at any realistic scale/dim), so the seed SET is
    * bit-reproducible across engines and partitionings — DuckDB can
    * replay the whole greedy chain CTE by CTE. Each round is one
    * map-only pass (codegen'd [[graft.functions.CentroidMinDist]]
    * against seed literals) + a TakeOrdered(1): k rounds total,
    * bounded driver state of k vectors — the standard seeding cost,
    * paid once per training run. */
  def kmeansPlusPlusSeeds(corpus: DataFrame, k: Int, scale: Int = 1024,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Long, Array[Long])] = {
    require(k >= 2)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val quant = transform(col(vecCol).cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    val e = corpus.select(col(idCol).cast("long").as("vec_id"),
      quant.as("q"))
    val first = e.orderBy(col("vec_id")).limit(1).collect()
    require(first.nonEmpty, "kmeansPlusPlusSeeds: empty corpus")
    var seeds = Vector(
      (first.head.getLong(0), first.head.getSeq[Long](1).toArray))
    while (seeds.size < k) {
      val minDist = org.apache.spark.sql.graftshim.SparkShims.column(
        graft.functions.CentroidMinDist(
          org.apache.spark.sql.graftshim.SparkShims.expression(col("q")),
          seeds.map(_._2).toArray))
      val pick = e.select(col("vec_id"), col("q"), minDist.as("__d"))
        .orderBy(col("__d").desc, col("vec_id").asc).limit(1)
        .collect().head
      seeds :+= ((pick.getLong(0), pick.getSeq[Long](1).toArray))
    }
    seeds
  }

  /** SemDeDup-shaped semantic deduplication: cluster the embedding
    * space (deterministic quantized k-means), then compute exact
    * cosine pairs ONLY within clusters — the published recipe for
    * embedding-level dedup at corpus scale, where all-pairs is
    * unpayable and near-duplicates co-cluster by construction.
    *
    * Per-cluster work is O(|c|^2), so `k` sets the cost/recall trade:
    * size k so clusters fit a task (SemDeDup's own regime is k in the
    * tens of thousands on web corpora) — [[semanticDedupPairsAuto]]
    * derives it from the corpus size so a growing corpus cannot
    * silently slide into quadratic clusters. The within-cluster join
    * is a plain shuffle equi-join on the cluster id; recall vs the
    * exact grid join (d5) is spec-bounded on this corpus.
    *
    * `maxPairsPerCluster` is a loud guard, not a truncation: if any
    * cluster's |c|*(|c|-1)/2 exceeds it (k too small for the corpus,
    * or a degenerate embedding collapse), the call FAILS naming the
    * cluster, instead of submitting a join that would quietly run for
    * hours at 100 TB. */
  def semanticDedupPairs(corpus: DataFrame, k: Int, iterations: Int,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxPairsPerCluster: Long = 1L << 24): DataFrame = {
    val assigned = kmeansQuantized(corpus, k, iterations, idCol = idCol,
      vecCol = vecCol)
    // pair-budget guard: k-row aggregate, checked before the join runs
    val maxSize = math.floor((1.0 + math.sqrt(1.0 + 8.0 * maxPairsPerCluster)) / 2).toLong
    val oversized = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n")).where(col("n") > maxSize)
      .orderBy(col("n").desc).limit(1).collect()
    require(oversized.isEmpty, {
      val r = oversized.head
      s"semanticDedupPairs: cluster ${r.getLong(0)} has ${r.getLong(1)} " +
        s"members (> $maxSize => over the $maxPairsPerCluster pair " +
        "budget); raise k / lower targetClusterSize"
    })
    // kmeansQuantized normalizes the id column name to vec_id
    val withC = corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol))
      .join(assigned, "vec_id")
    val a = withC.select(col("cluster"), col("vec_id").as("id_a"),
      col(vecCol).as("__va"))
    val b = withC.select(col("cluster"), col("vec_id").as("id_b"),
      col(vecCol).as("__vb"))
    a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine_similarity(col("__va"), col("__vb")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SemDeDup over the BALANCED assignment: [[kmeansBalanced]] caps
    * every cluster at `targetClusterSize`, so per-cluster pair work is
    * ≤ tcs·(tcs−1)/2 STRUCTURALLY — no pair-budget guard, no failure
    * mode, whatever the embedding distribution does. This is the
    * 100 TB-safe form: [[semanticDedupPairsAuto]] fails loudly when a
    * degenerate corpus collapses into one cell; this one cannot have
    * an oversized cell in the first place (the trade: vectors spilled
    * out of a full cluster pair against their second-best cell, so
    * recall near over-capacity boundaries dips where the unbalanced
    * form would instead blow the budget). k = ceil(n / tcs), capacity
    * = tcs, so k·capacity ≥ n always holds. */
  def semanticDedupPairsBalanced(corpus: DataFrame, targetClusterSize: Int,
      iterations: Int, threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", maxRounds: Int = 8): DataFrame = {
    require(targetClusterSize >= 2)
    val n = corpus.count()
    val k = math.max(2L,
      (n + targetClusterSize - 1) / targetClusterSize).toInt
    val assigned = kmeansBalanced(corpus, k, iterations,
      capacity = targetClusterSize, maxRounds = maxRounds,
      idCol = idCol, vecCol = vecCol)
    val withC = corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol))
      .join(assigned, "vec_id")
    val a = withC.select(col("cluster"), col("vec_id").as("id_a"),
      col(vecCol).as("__va"))
    val b = withC.select(col("cluster"), col("vec_id").as("id_b"),
      col(vecCol).as("__vb"))
    a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine_similarity(col("__va"), col("__vb")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** [[semanticDedupPairs]] with k derived from the corpus size —
    * SemDeDup's own regime: k ~ n / `targetClusterSize`, so expected
    * per-cluster pair work stays ~targetClusterSize^2/2 as the corpus
    * grows (total pair yield O(n * targetClusterSize), linear in n,
    * never quadratic). A fixed k is a time bomb: correct at the size
    * it was tuned for, quadratic at 100x that. Costs one count() to
    * read n. */
  def semanticDedupPairsAuto(corpus: DataFrame, targetClusterSize: Int,
      iterations: Int, threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxPairsPerCluster: Long = 1L << 24): DataFrame = {
    require(targetClusterSize >= 1)
    val n = corpus.count()
    val k = math.max(2L,
      (n + targetClusterSize - 1) / targetClusterSize).toInt
    semanticDedupPairs(corpus, k, iterations, threshold, idCol, vecCol,
      maxPairsPerCluster)
  }
}
