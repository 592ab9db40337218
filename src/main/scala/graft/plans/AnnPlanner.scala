package graft.plans

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Probe-cost PLANNER for ANN top-k: chooses the flat exact scan or
  * balanced-IVF probing from TABLE STATISTICS, the way a cost-based
  * optimizer picks a join strategy — callers state the search
  * (queries, corpus, k, recall dial) and the planner owns the
  * strategy, instead of every call site hand-picking a tier.
  *
  * The two tiers share one answer semantic (exact-integer cosine over
  * the same quantized domain, same tie-breaks, same output schema), so
  * the choice changes COST, and — only when nprobe < clusters —
  * recall at the margin; at nprobe = clusters the tiers are
  * bit-identical and the choice is pure cost.
  *
  * Cost model (rows touched, the shuffle-free currency both plans
  * share):
  *  - flat: every query scores every corpus row -> nq x n.
  *  - IVF:  training pays `iterations` argmax passes + up to
  *    `maxRounds` acceptance passes over the corpus, each one a
  *    map-only pass scoring `clusters` centroids per row; probing then
  *    costs nq x (clusters + nprobe x capacity) — the capacity bound
  *    makes this a GUARANTEE, not an average (the balanced quantizer's
  *    whole point: no hot cell can blow the estimate).
  * Training amortizes over the query batch, so the flip sits where
  * nq x n outgrows (iterations + rounds) x n x clusters — small query
  * sets against any corpus keep the flat scan, standing/batched query
  * load flips to the index. Corpus cardinality comes from Catalyst's
  * logical stats (`rowCount` when available, else sizeInBytes over an
  * estimated row width) — the same numbers a planner rule sees.
  */
object AnnPlanner {

  /** The decision with both cost estimates — exposed so specs and
    * operators can audit WHY a tier was chosen. */
  final case class Choice(useIvf: Boolean, flatCost: Double, ivfCost: Double)

  /** Pure cost model; unit = rows scored. */
  def choose(corpusRows: Long, nQueries: Long, clusters: Int, nprobe: Int,
      capacity: Long, iterations: Int, maxRounds: Int): Choice = {
    require(corpusRows >= 0 && nQueries >= 0 && clusters >= 1 && nprobe >= 1)
    val flat = nQueries.toDouble * corpusRows
    val train =
      (iterations.toDouble + maxRounds) * corpusRows * clusters
    val probe = nQueries.toDouble * (clusters + nprobe.toDouble * capacity)
    Choice(useIvf = train + probe < flat, flatCost = flat,
      ivfCost = train + probe)
  }

  /** Catalyst-stats row estimate: exact `rowCount` when the plan
    * carries one, else sizeInBytes over the plan's own per-row size
    * estimate — the statistics a planner rule would read; the operator
    * never runs a counting job just to plan. */
  def estimatedRows(df: DataFrame): Long = {
    val plan = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.optimizedPlan
    val stats = plan.stats
    stats.rowCount.map(_.toLong).getOrElse {
      val width = math.max(1L,
        plan.output.map(a => a.dataType.defaultSize.toLong).sum)
      (stats.sizeInBytes / width).toLong
    }
  }

  /** Plan and run ANN top-k: flat exact scan or balanced-IVF probing,
    * chosen by [[choose]] over [[estimatedRows]]. Parameters mirror
    * [[Similarity.ivfBalancedTopK]]; with nprobe = clusters the two
    * tiers return identical rows, below that IVF trades recall at the
    * margin for the probe bound. */
  def topKAuto(queries: DataFrame, corpus: DataFrame, k: Int,
      clusters: Int, nprobe: Int, iterations: Int, capacity: Long,
      maxRounds: Int = 8, scale: Int = 1024, candidates: Int = 50,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    // corpus cardinality from stats (the 100 TB side is never counted
    // to plan); the QUERY batch is the driver-bounded side and the
    // amortization decision rides on its exact size, so count it —
    // without CBO, size-based stats cannot see filter selectivity and
    // a 3-row batch would read as hundreds of rows
    val c = choose(estimatedRows(corpus), queries.count(),
      clusters, nprobe, capacity, iterations, maxRounds)
    if (c.useIvf)
      Similarity.ivfBalancedTopK(queries, corpus, k, clusters, nprobe,
        iterations, capacity, maxRounds, scale, candidates,
        queryId, queryVec, corpusId, corpusVec)
    else
      Similarity.bruteForceQuantizedTopK(queries, corpus, k, scale,
        queryId, queryVec, corpusId, corpusVec)
  }
}
