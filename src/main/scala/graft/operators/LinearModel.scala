package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-probe training — the classifier-based quality
  * filter of the GPT-3/CCNet lineage, reduced to engine primitives.
  *
  * Full-batch gradient descent on a least-squares objective, where
  * every round is ONE partially-aggregated scan: each row's gradient
  * contribution quantizes to fixed-point BIGINTs (floor(err·x_j·2^20))
  * and the round's gradient is their exact integer sum — associative,
  * so partition order, task retries, and engine choice cannot change
  * it. Weights live as Q20 fixed-point integers on the driver (a few
  * dozen longs — bounded state, like the k-means centroids); the float
  * work per row is a fixed left-associative expression over exact
  * rationals, so any IEEE-754 engine replays training bit-for-bit —
  * the DuckDB oracle unrolls all rounds as CTEs and matches exactly.
  *
  * Scale: a round is a map-side-combined agg of nFeatures longs —
  * shuffle bytes independent of corpus size; rounds are sequential
  * scans (cache the projected features upstream for many rounds).
  */
object LinearModel {
  val Q = 1048576L // 2^20 fixed-point scale: *Q and /Q are exact in doubles

  /** Feature columns: bias + the first nFeatures-1 vector coords. */
  private def features(vecCol: String, nFeatures: Int): Seq[Column] =
    lit(1.0d) +: (1 until nFeatures).map(i =>
      element_at(col(vecCol), i).cast("double"))

  /** Left-associative score expression for fixed-point weights `wq`:
    * (wq_0/Q)·x_0 + (wq_1/Q)·x_1 + … — wq_j/Q is an exact double, so
    * the expression value is engine-independent. */
  private def scoreExpr(fs: Seq[Column], wq: Array[Long]): Column =
    fs.zipWithIndex.map { case (f, j) =>
      (lit(wq(j)).cast("double") / lit(Q.toDouble)) * f
    }.reduce(_ + _)

  /** Train `rounds` full-batch GD steps of a linear probe predicting
    * `yCol` (0.0/1.0) from [1, vec(1..nFeatures-1)]. Returns the final
    * Q20 weights. */
  def fitLinearProbe(df: DataFrame, vecCol: String, yCol: Column,
      nFeatures: Int, lr: Double, rounds: Int): Array[Long] = {
    val fs = features(vecCol, nFeatures)
    val base = df.select((yCol.cast("double").as("__y") +: fs.zipWithIndex
      .map { case (f, j) => f.as(s"__x$j") }): _*)
    val xs = (0 until nFeatures).map(j => col(s"__x$j"))
    var wq = Array.fill(nFeatures)(0L)
    var n = -1L
    for (_ <- 0 until rounds) {
      val err = scoreExpr(xs, wq) - col("__y")
      val aggs = xs.zipWithIndex.map { case (x, j) =>
        sum(floor(err * x * lit(Q.toDouble))).as(s"g$j")
      } :+ count(lit(1)).as("n")
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      if (n < 0) n = row.getLong(nFeatures)
      wq = Array.tabulate(nFeatures) { j =>
        val w = wq(j).toDouble / Q.toDouble
        val g = row.getLong(j).toDouble / Q.toDouble
        math.floor((w - lr * g / n) * Q.toDouble).toLong
      }
    }
    wq
  }

  /** Score + classify every row with trained weights: score_q is the
    * Q20-quantized linear score, pred thresholds at 0.5 (= Q/2).
    * Map-only, codegen'd — the filter pass over the full corpus. */
  def scoreWith(df: DataFrame, idCol: String, vecCol: String,
      yCol: Column, wq: Array[Long]): DataFrame = {
    val fs = features(vecCol, wq.length)
    df.select(col(idCol), yCol.cast("int").as("y"),
        floor(scoreExpr(fs, wq) * lit(Q.toDouble)).as("score_q"))
      .withColumn("pred",
        when(col("score_q") >= lit(Q / 2), 1).otherwise(0))
  }

  /** Train then score in one call (the oracle-checked entry shape). */
  def qualityClassifier(df: DataFrame, idCol: String, vecCol: String,
      yCol: Column, nFeatures: Int = 16, lr: Double = 0.5,
      rounds: Int = 6): DataFrame = {
    val wq = fitLinearProbe(df, vecCol, yCol, nFeatures, lr, rounds)
    scoreWith(df, idCol, vecCol, yCol, wq)
  }
}
