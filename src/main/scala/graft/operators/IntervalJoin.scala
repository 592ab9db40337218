package graft.operators

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join: pairs (l, r) with l.key = r.key and
  * r.time in (l.time - delta, l.time].
  *
  * This is the reference's flagship operator (StreamingJob.java:94-105:
  * `o.currency = r.currency AND o.eventtime >= r.eventtime AND
  * r.eventtime > o.eventtime - INTERVAL '5' SECOND`).
  *
  * Scale design: the naive plan equi-joins on the key alone. With a
  * low-cardinality key (5 currencies) that assigns entire key domains
  * to single shuffle partitions — at 100 TB, 5 partitions own all the
  * data. `bucketed` instead hashes both sides into time buckets of
  * width delta (each right row duplicated into buckets [b, b+1], the
  * only two a left row in-bucket b can see), and joins on
  * (key, bucket): join cardinality now scales with the time domain,
  * so 1000 executors all get work regardless of key skew. The exact
  * range predicate is applied post-join; each matching pair satisfies
  * it in exactly one bucket copy, so no duplicates arise and
  * left-outer semantics are preserved (the left side is never
  * duplicated).
  */
object IntervalJoin {
  /** Exact integer floor-div bucket — `(x - pmod(x, d)) div d` — the
    * SAME formulation as `plans.RewriteIntervalJoin.bucket`, so the
    * operator and the optimizer rewrite can never disagree on a
    * boundary row. `floor(x / d)` over doubles loses exactness past
    * 2^52 µs and can misbucket a boundary timestamp. */
  private[graft] def bucketCol(t: org.apache.spark.sql.Column, deltaUs: Long) = {
    val x = unix_micros(t)
    val d = lit(deltaUs)
    call_function("div", x - pmod(x, d), d)
  }

  /** Time-bucketed interval join (the 100 TB plan).
    *
    * @param joinType "inner" or "left_outer" (left side never duplicated)
    * @param leftKey/rightKey  equality key column names
    * @param leftTime/rightTime timestamp column names
    */
  def bucketed(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      delta: Duration, joinType: String = "inner"): DataFrame = {
    val deltaUs = delta.toMillis * 1000L
    require(deltaUs > 0, "delta must be positive")
    val lb = left.withColumn("__graft_bucket_op", bucketCol(col(leftTime), deltaUs))
    val rb = right
      .withColumn("__graft_bucket_rb", bucketCol(col(rightTime), deltaUs))
      .withColumn("__graft_bucket_op", explode(array(col("__graft_bucket_rb"), col("__graft_bucket_rb") + 1)))
      .drop("__graft_bucket_rb")
    val cond = lb(leftKey) === rb(rightKey) &&
      lb("__graft_bucket_op") === rb("__graft_bucket_op") &&
      unix_micros(rb(rightTime)) <= unix_micros(lb(leftTime)) &&
      unix_micros(rb(rightTime)) > unix_micros(lb(leftTime)) - deltaUs
    lb.join(rb, cond, joinType)
      .drop(lb("__graft_bucket_op")).drop(rb("__graft_bucket_op"))
  }

  /** Naive plan (equi-join on key + range filter). Correct, and fine
    * when the key is high-cardinality; used in tests as the oracle for
    * `bucketed`. */
  def naive(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      delta: Duration, joinType: String = "inner"): DataFrame = {
    val deltaUs = delta.toMillis * 1000L
    val cond = left(leftKey) === right(rightKey) &&
      unix_micros(right(rightTime)) <= unix_micros(left(leftTime)) &&
      unix_micros(right(rightTime)) > unix_micros(left(leftTime)) - deltaUs
    left.join(right, cond, joinType)
  }
}
