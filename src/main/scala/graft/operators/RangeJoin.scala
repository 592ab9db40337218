package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic RANGE JOIN: pair points with the intervals containing them
  * (`p BETWEEN lo AND hi`), with NO equality key to hash on.
  *
  * Spark's own planner has nothing to grab here — a pure inequality
  * condition plans as BroadcastNestedLoopJoin (or a cartesian), which
  * is O(|points| x |intervals|) work however large the sides: the
  * classic range-join failure at scale. The scalable plan manufactures
  * the missing equi-key by BUCKETING the domain:
  *
  *  - each interval explodes into the buckets it overlaps
  *    (floor(hi/w) − floor(lo/w) + 1 copies at bucket width w);
  *  - each point hashes to its own single bucket;
  *  - the join is a plain shuffle EQUI-join on the bucket id with the
  *    exact BETWEEN as a residual filter.
  *
  * A (point, interval) pair meets in EXACTLY one bucket — the point's
  * — so no duplicates arise and no dedup pass is needed. Join work
  * becomes O(matches + collisions-in-bucket); the bucket width trades
  * interval replication (≈ avg_len/w copies per interval) against
  * bucket collision density, and [[widthFor]] derives it from the
  * interval-length distribution (the median length is the classic
  * near-optimal choice: short intervals replicate ~2x, the long tail
  * pays proportionally to its own length — there is no width that
  * beats that asymmetry).
  *
  * This composes with, not replaces, [[IntervalJoin]]: the interval
  * join exploits a BOUNDED delta (every interval the same length, so
  * the bucket pair is static); this operator handles arbitrary
  * per-row interval lengths.
  */
object RangeJoin {

  /** Median interval length as the bucket width (at least 1): the
    * standard width heuristic, computed with one bounded aggregate
    * (approx-percentile over lengths — a sketch, deterministic for a
    * given dataset). */
  def widthFor(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val m = intervals
      .agg(expr(s"approx_percentile($hiCol - $loCol, 0.5)").cast("long"))
      .head
    math.max(1L, if (m.isNullAt(0)) 1L else m.getLong(0))
  }

  /** Bucketed point-in-interval join over LONG domains.
    *
    * @param points    side carrying `pointCol` (one bucket per row)
    * @param intervals side carrying [lo, hi] (inclusive bounds; a row
    *                  with hi < lo matches nothing and is dropped
    *                  before exploding)
    * @param width     bucket width; 0 (default) derives [[widthFor]]
    * @param joinType  "inner" or "left_outer" (points side never
    *                  duplicated — outer semantics are safe)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      width: Long = 0L, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported join type $joinType")
    val w = if (width > 0) width else widthFor(intervals, loCol, hiCol)
    def bucket(c: Column): Column =
      call_function("div", c - pmod(c, lit(w)), lit(w))
    val p = points.withColumn("__g_rb", bucket(col(pointCol).cast("long")))
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__g_lo_b", bucket(col(loCol).cast("long")))
      .withColumn("__g_hi_b", bucket(col(hiCol).cast("long")))
      .withColumn("__g_rb",
        explode(sequence(col("__g_lo_b"), col("__g_hi_b"))))
      .drop("__g_lo_b", "__g_hi_b")
    p.join(iv,
        p("__g_rb") === iv("__g_rb") &&
          p(pointCol) >= iv(loCol) && p(pointCol) <= iv(hiCol),
        joinType)
      .drop("__g_rb")
  }
}
