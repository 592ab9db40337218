package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Base-2 DDSketch: relative-error quantiles from EXACT integer
  * power-of-two buckets — the a8/a9 discipline (a sketch as a plain
  * mergeable DataFrame) applied to the DDSketch idea (Masson et al.,
  * VLDB'19: bucket by ⌊log_γ x⌋, answer quantiles from bucket
  * counts, relative error bounded by γ). γ = 2 makes the bucket
  * index EXACTLY computable in integers — bucket(x) = bit-length of
  * the value in cents (length of its binary string, the
  * engine-portable ⌊log₂⌋+1) — so unlike a float-log DDSketch, both
  * engines agree bit-for-bit at every boundary, and the quantile
  * answer carries a PROVEN guarantee: the true q-quantile lies in
  * [2^(b−1), 2^b − 1] of the reported bucket b (≤ 2× relative
  * error), checked by the spec against exact sorts.
  *
  * The bucket table IS the sketch: (group, bucket, cnt) — mergeable
  * by summing counts (associative, partitioning-invariant), O(groups
  * × 64) rows however large the input, the shape a 1000-executor
  * scan reduces map-side. [[ddsketchQuantiles]] finalizes: one
  * cumulative window + one conditional-min aggregation per
  * percentile, all integer comparisons (cum·100 ≥ p·tot — no
  * division, no doubles anywhere).
  */
object DdSketch {
  /** The mergeable sketch: per-group power-of-two bucket counts over
    * `valueCol` in cents (values ≤ 0 are excluded — a log-bucket
    * sketch is defined on positives, same as the reference
    * DDSketch). */
  def ddsketchBuckets(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * 100)
      .cast("long")
    // filter on the DERIVED cents, not the raw value: a positive in
    // (0, 0.005) rounds to 0 cents and would land in bucket 1 whose
    // declared bounds [1, 1] exclude it — excluding sub-cent values
    // keeps the "true quantile lies in [2^(b-1), 2^b - 1]" guarantee
    df.where(cents > 0)
      .select(col(groupCol), length(bin(cents)).cast("int").as("bucket"))
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches: same bucket space, counts sum. */
  def ddsketchMerge(a: DataFrame, b: DataFrame, groupCol: String)
      : DataFrame =
    a.unionByName(b).groupBy(groupCol, "bucket")
      .agg(sum("cnt").as("cnt"))

  /** Finalize: per group, total count and for each percentile the
    * smallest bucket whose cumulative count reaches p% — with the
    * bucket's [lo, hi] cent bounds, between which the true
    * q-quantile provably lies. */
  def ddsketchQuantiles(buckets: DataFrame, groupCol: String,
      percents: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val w = Window.partitionBy(groupCol).orderBy("bucket")
    val cum = buckets
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(Window.partitionBy(groupCol)))
    val aggs = percents.map { p =>
      min(when(col("cum") * 100 >= col("tot") * p, col("bucket")))
        .as(s"p${p}_bucket")
    }
    val grouped = cum.groupBy(groupCol)
      .agg(max(col("tot")).as("n"), aggs: _*)
    percents.foldLeft(grouped) { (d, p) =>
      d.withColumn(s"p${p}_lo",
          expr(s"shiftleft(CAST(1 AS BIGINT), p${p}_bucket - 1)"))
        .withColumn(s"p${p}_hi",
          expr(s"shiftleft(CAST(1 AS BIGINT), p${p}_bucket) - 1"))
    }
  }

  /** Build + finalize in one call — the query-entry form. */
  def ddsketch(df: DataFrame, groupCol: String, valueCol: String,
      percents: Seq[Int] = Seq(50, 95, 99)): DataFrame =
    ddsketchQuantiles(ddsketchBuckets(df, groupCol, valueCol),
      groupCol, percents)
}
