package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hll

/** Windowed streaming COUNT DISTINCT via mergeable HLL registers —
  * the unbounded-cardinality aggregate exact distinct cannot provide
  * under streaming state bounds: exact per-window distinct holds every
  * key in state (O(keys) per open window); the register table holds
  * exactly 2^p small ints per window regardless of cardinality.
  *
  * Shape: the register maintenance IS a plain watermarked windowed
  * `max` aggregation — (window, bucket) → max(rho) — so the streaming
  * engine merges partials across micro-batches and partitions through
  * its own aggregation state (the KLL-window discipline), and append
  * mode emits each window's registers FINAL at watermark close.
  * Estimation is a separate batch read over the emitted registers
  * (streaming allows one aggregation per query; the estimate's second
  * aggregation belongs on the serving side, where it also densifies
  * the buckets append mode never touched).
  *
  * Exactly the a9 engine-replayable HLL (same md5 hash, buckets, rho,
  * fixed-point harmonic sum) — the batch mirror of this pipeline is
  * hash-checked against the DuckDB oracle as t9. */
object StreamingDistinct {

  /** Watermarked per-window register maintenance: one windowed max
    * aggregation, append-mode-final at watermark close. Output:
    * (ws TIMESTAMP window start, b, r). */
  def registerStream(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermarkDelay: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, "hll: p in [4, 16]")
    events.where(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), windowDur).as("win"),
        Hll.bucketExpr(col(keyCol), p).as("b"),
        Hll.rhoExpr(col(keyCol), p).as("rho"))
      .groupBy(col("win"), col("b")).agg(max("rho").as("r"))
      .select(col("win.start").as("ws"), col("b"), col("r"))
  }

  /** Per-window estimate from streamed registers. Buckets append mode
    * never touched are DENSIFIED ARITHMETICALLY instead of via a
    * bucket-grid join: an absent bucket is r = 0, contributing
    * exactly 2^(w+1) to the fixed-point harmonic sum and one zero
    * register — so one aggregation computes the same s_fixed /
    * zero_regs the materialized-grid estimator ([[Hll.estimate]] over
    * [[Hll.registers]]) produces, bit for bit (spec-asserted).
    * Output: (ws, est_distinct, zero_regs). */
  def estimate(regs: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    regs.groupBy("ws")
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - r)"))
          .as("__g_sp"),
        count(lit(1)).as("__g_np"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("__g_zp"))
      .select(col("ws"),
        floor(lit(alpha * m.toDouble * m.toDouble) /
          ((col("__g_sp") + (lit(m.toLong) - col("__g_np")) *
            lit(1L << (w + 1))).cast("double") /
            lit(math.pow(2.0, (w + 1).toDouble)))).as("est_distinct"),
        (lit(m.toLong) - col("__g_np") + col("__g_zp")).as("zero_regs"))
  }
}
