package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog from first principles as a plain DataFrame — the
  * engine-replayable counterpart to `approx_count_distinct` (whose
  * HLL++ internals no external engine can mirror; that entry is
  * rows-only by design, this one is hash-checked).
  *
  * The register table IS a (group, b, r) DataFrame: bucket b = low
  * `p` bits of a 60-bit md5 hash, rho = leading-zero rank of the
  * remaining bits, r = max(rho) per bucket — one partially-aggregated
  * groupBy (max is associative, so the shuffle carries ≤ m rows per
  * group per partition), and two sketches merge by union + re-max.
  * The harmonic sum is computed in FIXED POINT: Σ 2^(W+1−r) as exact
  * BIGINTs (W = 60−p), so no float-addition order exists anywhere;
  * the final α·m²/Z division is one deterministic double op. The
  * standard raw-regime estimator (no small-range branch) — callers
  * with n ≲ 2.5·m should use exact counting; the error spec bounds
  * the estimating regime at ~1.04/√m. */
object Hll {
  /** 60-bit md5 hash of the (stringified) key, same convention as
    * [[CountMin.bucketExpr]]. */
  def hashExpr(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register table (groupCols*, b, r) with ALL m = 2^p registers
    * present per group (absent buckets at r = 0, so merges and
    * estimates need no densify step). */
  /** The register BUCKET of a key: low p hash bits. */
  def bucketExpr(key: Column, p: Int): Column =
    hashExpr(key).bitwiseAND((1 << p) - 1)

  /** rho = 1 + leading zeros of the (60−p)-bit hash remainder:
    * (w+1) when the remainder is 0, else (w+1) − bit_length (bin()
    * has no leading zeros, identically in DuckDB). */
  def rhoExpr(key: Column, p: Int): Column = {
    val w = 60 - p
    val rest = shiftright(hashExpr(key), p)
    when(rest === 0L, lit(w + 1)).otherwise(lit(w + 1) - length(bin(rest)))
  }

  def registers(df: DataFrame, groupCol: String, keyCol: String,
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, "hll: p in [4, 16]")
    val m = 1 << p
    val got = df.where(col(keyCol).isNotNull)
      .select(col(groupCol), bucketExpr(col(keyCol), p).as("b"),
        rhoExpr(col(keyCol), p).as("rho"))
      .groupBy(groupCol, "b").agg(max("rho").as("r"))
    val all = df.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0), lit(m - 1))).as("b"))
    all.join(got, Seq(groupCol, "b"), "left")
      .select(col(groupCol), col("b"), coalesce(col("r"), lit(0)).as("r"))
  }

  /** Merge register tables built with the same p: element-wise max. */
  def merge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(groupCol, "b").agg(max("r").as("r"))

  /** Raw-regime HLL estimate per group: α_m·m²/Z with the harmonic
    * sum carried as the exact integer Σ 2^(W+1−r). Output:
    * (groupCol, est_distinct, zero_regs). */
  def estimate(regs: DataFrame, groupCol: String, p: Int = 6): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // scale the harmonic terms by 2^(w+1) so the largest rho (w+1)
    // still lands on a non-negative shift: Σ ≤ m·2^(w+1) < 2^63
    regs.groupBy(groupCol)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - r)"))
          .as("s_fixed"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("zero_regs"))
      .select(col(groupCol),
        floor(lit(alpha * m.toDouble * m.toDouble) /
          (col("s_fixed").cast("double") /
            lit(math.pow(2.0, (w + 1).toDouble)))).as("est_distinct"),
        col("zero_regs"))
  }
}
