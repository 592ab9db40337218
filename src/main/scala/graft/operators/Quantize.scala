package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization for embedding columns: float vectors to 8-bit
  * codes, the standard 4x memory cut (float32 -> uint8) applied before
  * an ANN corpus is pinned in RAM (what FAISS calls SQ8).
  *
  * Two phases, both scale-shaped:
  *   1. per-dimension [min, max] ranges — ONE partially-aggregated
  *      reduction (posexplode + groupBy(dim)); its output is `dims`
  *      rows no matter how many billion vectors feed it, so collecting
  *      the ranges to the driver and re-broadcasting them as literals
  *      is the same bounded-state move as IVF's centroid literals.
  *   2. encoding — a map-only codegen'd pass over the vectors; no
  *      shuffle, embarrassingly parallel at any corpus size.
  *
  * Codes are `floor((x - mn) * 255 / (mx - mn))` clamped to [0, 255]
  * (so the max element maps to 255 whether the scaled value lands on
  * 255.0 exactly or a hair above). Reconstruction at the bin midpoint
  * bounds the per-element error by half a bin width. */
object Quantize {
  /** Per-dimension (min, max) over the corpus — phase 1. */
  def minMaxRanges(emb: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("dim").collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Codes column expression against literal ranges — phase 2. A
    * constant dimension (mx == mn) would otherwise produce 0/0 = NaN
    * (whose least/greatest ordering differs between engines); it
    * carries no information, so its code is pinned to 0. */
  def codesColumn(vec: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnL = lit(mns); val mxL = lit(mxs)
    transform(vec, (x, i) =>
      when(element_at(mxL, i + 1) === element_at(mnL, i + 1), lit(0))
        .otherwise(least(lit(255), greatest(lit(0),
          floor((x.cast("double") - element_at(mnL, i + 1)) * 255.0 /
            (element_at(mxL, i + 1) - element_at(mnL, i + 1)))))).cast("int"))
  }

  /** (id, codes array<int>) for every vector. */
  def minMaxQuantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mns, mxs) = minMaxRanges(emb, vecCol)
    emb.select(col(idCol), codesColumn(col(vecCol), mns, mxs).as("codes"))
  }

  /** Midpoint reconstruction of one code, for error analysis/specs.
    * Bins are (mx-mn)/255 wide, so the midpoint is within half a bin
    * of any value that quantized into the code. */
  def dequantize(code: Int, mn: Double, mx: Double): Double =
    mn + (code + 0.5) * (mx - mn) / 255.0

  /** Midpoint reconstruction of STORED codes (the serving-side decode
    * when the codes already sit in an index and the raw vector does
    * not travel with them) — same IEEE arithmetic as [[dequantize]]. */
  def decodeColumn(codes: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnL = lit(mns); val mxL = lit(mxs)
    transform(codes, (c, i) =>
      when(element_at(mxL, i + 1) === element_at(mnL, i + 1),
        element_at(mnL, i + 1))
        .otherwise(element_at(mnL, i + 1) + (c + lit(0.5)) *
          (element_at(mxL, i + 1) - element_at(mnL, i + 1)) / lit(255.0)))
  }

  /** Quantize-then-midpoint-reconstruct as one column expression:
    * array<double> of the same IEEE arithmetic as [[dequantize]], for
    * approximate scoring over SQ8 codes (asymmetric distance). */
  def dequantizeColumn(vec: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnL = lit(mns); val mxL = lit(mxs)
    // mx == mn reconstructs to mn exactly (its code is pinned to 0 and
    // the bin width is 0, so midpoint arithmetic degenerates cleanly).
    transform(codesColumn(vec, mns, mxs), (c, i) =>
      when(element_at(mxL, i + 1) === element_at(mnL, i + 1),
        element_at(mnL, i + 1))
        .otherwise(element_at(mnL, i + 1) + (c + lit(0.5)) *
          (element_at(mxL, i + 1) - element_at(mnL, i + 1)) / lit(255.0)))
  }

  // ---- product quantization (PQ) -----------------------------------
  // The vector splits into `subspaces` contiguous sub-vectors; each is
  // replaced by the index of its nearest codeword (L2, tie -> lowest
  // index). With 8 subspaces x 16 codewords a 64-dim float32 vector
  // becomes 8 nibbles: 64x compression of the scanned payload. The
  // codebook here is DETERMINISTIC — the sub-vectors of the first
  // `codewords` rows by id — so the whole encode/reconstruct/score
  // pipeline is reproducible arithmetic an external oracle can mirror
  // (k-means-refined codebooks would score better but embed
  // non-mirrorable training state; the production upgrade swaps
  // `pqCodebook` only).

  /** Deterministic codebook: full vectors of the first `codewords`
    * rows by `idCol` (driver-side state: codewords x dim doubles). */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      codewords: Int): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(codewords)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Lloyd-refined PQ codebook: per subspace, k-means over the
    * sub-vectors of a bounded deterministic sample (same hash-ordered
    * draw and sequential accumulation as IVF's
    * [[graft.operators.Similarity.trainCentroids]], so the codebook is
    * identical run to run at any parallelism). Returned in the same
    * packed layout [[pqCodebook]] uses — `codewords` full-dim rows
    * whose slice j is subspace j's codeword — so [[pqCodesColumn]] /
    * [[pqReconstructFromCodes]] consume it unchanged. Distances are
    * squared L2 with ties to the lowest index, matching the encode
    * rule. Trains on raw vectors (not cell residuals): residual PQ
    * would need a per-cell codebook join on the hot path.
    *
    * Measured honestly (tools/PqProbe, sf0.001): refinement lowers
    * mean reconstruction cosine error (0.32 vs 0.43) and wins ranking
    * on CLUSTERED corpora (planted 16-cluster data, candidates=k:
    * recall 1.00 vs 0.96) — the regime real embedding corpora live in.
    * On purely isotropic noise nothing clusters, and the first-rows
    * codebook (actual unit-norm sample rows) can rank better at loose
    * budgets; ADC dot-product scoring was also measured and does not
    * close that gap. Pick [[pqCodebook]] for mirrorable arithmetic,
    * this for production recall on clustered data.
    *
    * Driver-side state: `trainSample x dim` doubles in, `codewords x
    * dim` out — both independent of corpus size. */
  def pqCodebookKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      codewords: Int, subspaces: Int, iterations: Int = 10,
      trainSample: Int = 8192): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(trainSample)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    pqCodebookKMeansFromSample(sample, codewords, subspaces, iterations)
  }

  /** [[pqCodebookKMeans]] over a caller-provided training sample — the
    * residual-PQ path hands in cell residuals instead of raw vectors
    * (the codebook then spends its codewords on the residual
    * distribution, which is tighter than the raw one wherever the
    * coarse cells capture structure). Same determinism contract: the
    * sample's order decides seeding and accumulation order. */
  def pqCodebookKMeansFromSample(sample: Array[Array[Double]],
      codewords: Int, subspaces: Int,
      iterations: Int = 10): Array[Array[Double]] = {
    require(sample.nonEmpty, "pqCodebookKMeans: empty sample")
    val dim = sample.head.length
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val sub = dim / subspaces
    val nc = math.min(codewords, sample.length)
    val refs = Array.fill(codewords)(new Array[Double](dim))
    var j = 0
    while (j < subspaces) {
      val xs = sample.map(_.slice(j * sub, (j + 1) * sub))
      // seed: sub-slices of the first rows of the sample (the same
      // seeding family as trainCentroids), then Lloyd refinement
      val cents = xs.take(nc).map(_.clone())
      for (_ <- 0 until iterations) {
        val sums = Array.fill(nc)(new Array[Double](sub))
        val counts = new Array[Long](nc)
        xs.foreach { v =>
          var best = 0; var bd = Double.PositiveInfinity; var c = 0
          while (c < nc) {
            var s = 0.0; var i = 0
            while (i < sub) { val d = v(i) - cents(c)(i); s += d * d; i += 1 }
            if (s < bd) { bd = s; best = c }
            c += 1
          }
          counts(best) += 1
          val su = sums(best); var i = 0
          while (i < sub) { su(i) += v(i); i += 1 }
        }
        for (c <- 0 until nc if counts(c) > 0; i <- 0 until sub)
          cents(c)(i) = sums(c)(i) / counts(c)
      }
      // corpora smaller than `codewords` repeat the last centroid —
      // encode ties break low, so duplicates are never selected
      for (c <- 0 until codewords; i <- 0 until sub)
        refs(c)(j * sub + i) = cents(math.min(c, nc - 1))(i)
      j += 1
    }
    refs
  }

  /** PQ codes: array of `subspaces` codeword indices — argmin by
    * (squared L2, index), i.e. the nearest codeword slice with the
    * lowest index winning ties. A native codegen'd expression
    * ([[graft.functions.PqEncode]]): the naive Column formulation
    * (per-codeword struct + array_sort argmin) unrolls to an
    * O(subspaces x codewords x dims) expression tree that Spark
    * evaluates interpreted at ~1ms/row; the compiled loop does the
    * identical left-associated double arithmetic in microseconds. */
  def pqCodesColumn(vec: Column, refs: Array[Array[Double]],
      subspaces: Int): Column =
    graft.functions.GraftFunctions.pq_encode(vec, refs, subspaces)

  /** Reconstruction from an already-computed codes COLUMN: per
    * subspace, the selected codeword's slice, concatenated back to
    * full dimension. Taking the codes as a column (not re-deriving
    * them from the vector) matters for the plan: the argmin encode is
    * the expensive part, and referencing it through its own projected
    * alias keeps it evaluated once per row — CollapseProject refuses
    * to inline a non-cheap alias consumed `subspaces` times, whereas
    * inlining the encode expression here would duplicate it 8x. */
  def pqReconstructFromCodes(codes: Column, refs: Array[Array[Double]],
      subspaces: Int): Column = {
    val sub = refs.head.length / subspaces
    concat((0 until subspaces).map { j =>
      val bookJ = array(refs.map(r =>
        lit(r.slice(j * sub, (j + 1) * sub))): _*)
      element_at(bookJ, element_at(codes, j + 1) + 1)
    }: _*)
  }

  /** Reconstructed vector straight from the float vector (encode +
    * decode in one expression) — spec/oracle convenience; hot paths
    * should project [[pqCodesColumn]] first and use
    * [[pqReconstructFromCodes]]. */
  def pqReconstructColumn(vec: Column, refs: Array[Array[Double]],
      subspaces: Int): Column =
    pqReconstructFromCodes(pqCodesColumn(vec, refs, subspaces), refs, subspaces)
}
