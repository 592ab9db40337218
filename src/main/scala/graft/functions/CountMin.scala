package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a plain DataFrame: `depth × width` integer
  * counters built by one hash-bucketed aggregation.
  *
  * The sketch IS a (r, bucket, c) table, so everything Spark gives a
  * `groupBy` applies for free: map-side partial sums mean the shuffle
  * carries at most `depth × width` rows per input partition no matter
  * the corpus size, two sketches merge by union + re-sum (counter
  * matrices add element-wise), and incremental maintenance is just
  * sketching the delta batch and merging. Estimation is the textbook
  * `min` over the `depth` row counters a key hashes to; every estimate
  * overcounts or is exact, never undercounts, with
  * P[err > 2N/width] < (1/2)^depth for the default rows.
  *
  * Bucket hashes are md5-derived (60-bit hex prefix mod width) so an
  * external engine reproduces the exact counter matrix — the DuckDB
  * oracle replays build + estimate bit-for-bit; the error bound is
  * property-spec'd separately.
  */
object CountMin {

  /** Row-`r` bucket for a (stringified) key: 60 md5 bits mod `width`.
    * Non-negative by construction (15 hex chars < 2^60). */
  def bucketExpr(r: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", r, key)), 1, 15), 16, 10)
      .cast("long") % width

  /** Build the sketch table (r, bucket, c) over `keyCol`. One explode
    * (×depth) + one partial-aggregated groupBy; output ≤ depth·width
    * rows total. */
  def sketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, "countmin: depth >= 1, width >= 2")
    df.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__k"))
      .groupBy(col("r"), bucketExpr(col("r"), col("__k"), width).as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketches built with the same (depth, width): counter
    * matrices add element-wise. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum("c").as("c"))

  /** Point-estimate counts for `keys(keyCol)`: min over the depth row
    * counters. The sketch side is ≤ depth·width rows, so the join
    * broadcasts; absent buckets count 0. Output: (keyCol, est). */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = keys.select(col(keyCol)).distinct()
      .select(col(keyCol), col(keyCol).cast("string").as("__k"))
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("r"),
        col("__k"))
      .select(col(keyCol), col("r"),
        bucketExpr(col("r"), col("__k"), width).as("bucket"))
    probes.join(broadcast(sk), Seq("r", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
