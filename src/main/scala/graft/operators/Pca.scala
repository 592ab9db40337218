package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** PRINCIPAL DIRECTION of an embedding corpus by deterministic
  * fixed-point POWER ITERATION — the first step of the
  * PCA/whitening/ABTT ("all-but-the-top") family of embedding
  * post-processing a training-data pipeline runs over its vector
  * columns (dominant-direction removal measurably improves embedding
  * isotropy; the dominant direction itself is a corpus-drift /
  * dataset-fingerprint signal).
  *
  * v_{k+1} ∝ (QᵀQ) v_k computed as two passes without ever
  * materializing the dim×dim Gram matrix:
  *   1. dots: d_i = ⟨q_i, v⟩ — map-only (v rides as a literal array),
  *      optionally floor-shifted by `dotShift` bits for overflow
  *      headroom at large n;
  *   2. new direction: w_d = Σ_i q_id · d_i — one posexplode +
  *      per-dim aggregation with map-side partial combine (the
  *      shuffle carries ≤ partitions × dim rows, never the corpus);
  *   3. rescale: v'_d = sign(w_d) · (|w_d| · scale div max|w|) — the
  *      max is a dim-length driver scalar (bounded collect); the
  *      division is applied to the ABSOLUTE value so its rounding is
  *      sign-symmetric and unambiguous across engines (floor vs
  *      truncate differ on negatives — the classic cross-engine
  *      integer-division trap; non-negative operands make them the
  *      same operation).
  * Everything is integer (embeddings quantize to floor(x·scale), the
  * s10 discipline), so the whole iteration is a deterministic pure
  * function of the corpus — independent of partitioning and summation
  * order — and a DuckDB oracle unrolls it round by round.
  *
  * Overflow ledger: |q| ≤ scale, |d_i| ≤ dim·scale², |w_d| ≤
  * n·scale·max|d| / 2^dotShift and the rescale multiplies by scale —
  * with the defaults (scale 1024, dim 64) the iteration is exact up
  * to n ≈ 10⁸ rows at dotShift 0; at larger corpora raise `dotShift`
  * (each bit halves w, costing ~1 bit of direction precision per
  * round, bought back by the rescale).
  *
  * Convergence is the usual power-iteration story (ratio of top two
  * eigenvalues of the uncentered second moment) — fast on corpora
  * with a dominant direction, slow on near-isotropic ones (the spec
  * measures the monotone profile on the test corpus); the output is
  * DEFINED as the direction after exactly `iterations` rounds, the
  * bounded-round discipline the graph family uses, so the oracle
  * replays it converged or not. The direction is UNCENTERED by
  * construction — subtract the mean first if the centered principal
  * component is wanted. The fixed all-ones start makes the sign
  * deterministic.
  *
  * @return (dim INT — 1-based, v BIGINT) — `scale`-normalized
  *         direction after exactly `iterations` rounds. */
object Pca {
  def principalDirection(corpus: DataFrame, iterations: Int,
      scale: Int = 1024, dotShift: Int = 0,
      vecCol: String = "embedding"): DataFrame = {
    require(iterations >= 1 && scale >= 1 && dotShift >= 0)
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val q = corpus.select(
        transform(col(vecCol).cast(ArrayType(DoubleType)),
          x => floor(x * scale).cast("long")).as("q"))
      .localCheckpoint(true) // quantized once; every round re-reads it
    var v: Array[Long] = Array.fill(dim)(scale.toLong)
    for (_ <- 1 to iterations) {
      val vLit = typedLit(v.toSeq)
      val dot: Column =
        aggregate(zip_with(col("q"), vLit, _ * _), lit(0L), _ + _)
      // sign-symmetric shift (round toward zero): |d| >> k is floor ==
      // truncate on the non-negative value, then the sign re-applies
      val shifted =
        if (dotShift == 0) dot
        else when(dot < 0, -shiftright(-dot, dotShift))
          .otherwise(shiftright(dot, dotShift))
      val w = q.select(col("q"), shifted.as("d"))
        .select(posexplode(col("q")).as(Seq("dim0", "qv")), col("d"))
        .groupBy("dim0").agg(sum(col("qv") * col("d")).as("w"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val warr = (0 until dim).map(d => w.getOrElse(d, 0L)).toArray
      val m = warr.map(math.abs).max
      require(m > 0, "degenerate corpus: zero second moment")
      // multiplyExact: the oracle's `//` rescale errors LOUDLY past
      // 2^63 — silent JVM wrap here would diverge with wrong values
      // instead of matching that failure mode (driver-side, dim-length)
      v = warr.map(x =>
        math.signum(x) * (Math.multiplyExact(math.abs(x), scale.toLong) / m))
    }
    v.zipWithIndex
      .map { case (x, d) => (d + 1, x) }.toSeq
      .toDF("dim", "v")
  }

  /** TOP-DIRECTION REMOVAL + retrieval — the projection step of
    * "All-but-the-Top" (Mu & Viswanath '18: common dominant
    * directions carry corpus-frequency signal, not meaning; removing
    * them measurably improves embedding isotropy and retrieval).
    * Composes [[principalDirection]]: the corpus's dominant direction
    * v is computed once, every vector (corpus AND queries) replaces
    * itself with its EXACT scaled residual
    *   r = q·⟨v,v⟩ − ⟨q,v⟩·v
    * (the orthogonal projection times the positive scalar ⟨v,v⟩ —
    * cosine is scale-invariant, so ranking on r equals ranking on the
    * true residual while every component stays an exact BIGINT), and
    * top-k cosine runs on the residuals with the s1 tie rules.
    *
    * `scale` defaults to 64 here — the value that keeps the WHOLE
    * composition inside exact 64-bit arithmetic (|r| ≤ 2·dim·scale³,
    * residual dots ≤ dim·|r|² < 2⁶³ at dim 64); the final cosine is
    * one deterministic IEEE divide like every quantized-cosine op.
    * Map-only after the direction: the residual projection and
    * scoring add NO shuffle beyond the s1 two-stage top-k. */
  def abttTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      iterations: Int, scale: Int = 64,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vDir = principalDirection(corpus, iterations, scale,
        vecCol = corpusVec)
      .orderBy("dim").collect().map(_.getLong(1))
    val vv = vDir.map(x => x * x).sum
    val vLit = typedLit(vDir.toSeq)
    def quant(c: Column) = transform(c.cast(ArrayType(DoubleType)),
      x => floor(x * scale).cast("long"))
    def residual(qc: Column): Column = {
      val d = aggregate(zip_with(qc, vLit, _ * _), lit(0L), _ + _)
      zip_with(qc, vLit, (q, v) => q * vv - d * v)
    }
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    def sqnorm(a: Column) = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val q = queries.select(col(queryId),
        residual(quant(col(queryVec))).as("__qr"))
      .withColumn("__qn", sqnorm(col("__qr")))
    val c = corpus.select(col(corpusId).cast("long").as("vec_id"),
        residual(quant(col(corpusVec))).as("__cr"))
      .withColumn("__cn", sqnorm(col("__cr")))
    val wl = Window.partitionBy(col(queryId), col("__g_pid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col("vec_id").asc)
    c.join(broadcast(q), col(queryId) =!= col("vec_id"))
      .withColumn("sim", dot(col("__qr"), col("__cr")).cast("double") /
        sqrt(col("__qn").cast("double") * col("__cn")))
      .where(col("__qn") > 0 && col("__cn") > 0)
      .withColumn("__g_pid", spark_partition_id())
      .withColumn("__g_lc", row_number().over(wl))
      .where(col("__g_lc") <= k)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("vec_id").as("neighbor_id"),
        col("sim"))
  }

  /** The unrolled DuckDB mirror of [[abttTopK]]: the
    * [[principalDirectionOracleSql]] chain at the same (scale,
    * iterations), then the residual arithmetic and the s1-style
    * ranked cosine — every residual component an exact BIGINT, the
    * final divide one deterministic IEEE op. */
  def abttTopKOracleSql(dim: Int, iterations: Int, k: Int,
      scale: Int = 64, queryPred: String = "vec_id < 10"): String = {
    // reuse the direction chain's CTEs (strip its trailing SELECT)
    val dirSql = principalDirectionOracleSql(dim, iterations, scale)
    val ctes = dirSql.substring(0, dirSql.lastIndexOf("\nSELECT"))
    s"""$ctes,
       |vvn AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv
       |  FROM v$iterations),
       |dq AS (SELECT eq.vec_id,
       |    CAST(sum(eq.qv * v.v) AS BIGINT) AS d
       |  FROM eq JOIN v$iterations v USING (dim)
       |  GROUP BY 1),
       |r AS (SELECT eq.vec_id, eq.dim,
       |    CAST(eq.qv * vvn.vv - dq.d * v.v AS BIGINT) AS rv
       |  FROM eq JOIN dq USING (vec_id) JOIN v$iterations v USING (dim)
       |  CROSS JOIN vvn),
       |rn AS (SELECT vec_id, CAST(sum(rv * rv) AS BIGINT) AS n2
       |  FROM r GROUP BY 1),
       |qids AS (SELECT vec_id FROM embeddings WHERE $queryPred),
       |ps AS (SELECT ra.vec_id AS qid, rb.vec_id AS cid,
       |    CAST(sum(ra.rv * rb.rv) AS BIGINT) AS d
       |  FROM r ra JOIN qids q ON q.vec_id = ra.vec_id
       |  JOIN r rb ON rb.dim = ra.dim AND rb.vec_id <> ra.vec_id
       |  GROUP BY 1, 2),
       |s AS (SELECT p.qid AS query_id, p.cid AS vec_id,
       |    CAST(p.d AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) AS sim
       |  FROM ps p JOIN rn na ON na.vec_id = p.qid
       |  JOIN rn nb ON nb.vec_id = p.cid
       |  WHERE na.n2 > 0 AND nb.n2 > 0)
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id ASC) AS INT) AS "rank",
       |  vec_id AS neighbor_id, sim
       |FROM s QUALIFY "rank" <= $k ORDER BY query_id, "rank"""".stripMargin
  }
  def principalDirectionOracleSql(dim: Int, iterations: Int,
      scale: Int = 1024, dotShift: Int = 0): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e AS (SELECT vec_id,
      |  list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * $scale) AS BIGINT)) AS q FROM embeddings),
      |eq AS MATERIALIZED (SELECT vec_id, CAST(u.i AS INT) AS dim,
      |    q[CAST(u.i AS INT)] AS qv
      |  FROM e, range(1, ${dim + 1}) u(i)),
      |v0 AS (SELECT CAST(u.i AS INT) AS dim, CAST($scale AS BIGINT) AS v
      |  FROM range(1, ${dim + 1}) u(i))""".stripMargin)
    val dRaw = "CAST(sum(eq.qv * v.v) AS BIGINT)"
    val dExpr = if (dotShift == 0) dRaw
      else { val s = 1L << dotShift
        s"CASE WHEN $dRaw < 0 THEN -((-($dRaw)) // $s) ELSE ($dRaw) // $s END" }
    for (k <- 1 to iterations) {
      sb.append(s""",
        |d$k AS (SELECT vec_id, $dExpr AS d
        |  FROM eq JOIN v${k - 1} v USING (dim) GROUP BY vec_id),
        |w$k AS (SELECT eq.dim, CAST(sum(eq.qv * d.d) AS BIGINT) AS w
        |  FROM eq JOIN d$k d USING (vec_id) GROUP BY 1),
        |m$k AS (SELECT max(abs(w)) AS m FROM w$k),
        |v$k AS (SELECT dim, CAST(CASE WHEN w < 0
        |    THEN -(((-w) * $scale) // m) ELSE (w * $scale) // m END
        |    AS BIGINT) AS v
        |  FROM w$k CROSS JOIN m$k)""".stripMargin)
    }
    sb.append(s"\nSELECT dim, v FROM v$iterations ORDER BY dim")
    sb.toString
  }
}
