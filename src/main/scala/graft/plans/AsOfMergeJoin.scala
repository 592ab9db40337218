package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator as-of join: logical node + planner strategy +
  * physical sort-merge exec, registered through GraftExtensions
  * (preference tier (c) — Spark has no as-of join operator).
  *
  * Semantics (backward as-of, LEFT): every left row paired with the
  * single LATEST right row having the same key and right.time <=
  * left.time, or nulls if none. This is the reference enrichment's
  * intent ("the rate applicable at the time of the transaction",
  * README use-case; StreamingJob.java:94-105 approximates it with an
  * interval join).
  *
  * Physical plan: both sides hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then
  * ONE forward merge pass per partition: the right cursor never moves
  * backwards, state is a single buffered row. Compared with the
  * union+window formulation (AsOfJoin.backward) this avoids widening
  * every row to the union schema and the window's full-frame pass.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long] = None) extends BinaryNode {
  require(toleranceUs.forall(_ >= 0), "as-of tolerance must be >= 0")
  // input contract, enforced at construction (the API hands us
  // already-resolved expressions): the merge exec reads times as long
  // micros, so anything but TimestampType/LongType would silently
  // produce wrong matches rather than an analysis error
  private def timeOk(e: Expression): Boolean =
    !e.resolved || e.dataType == org.apache.spark.sql.types.TimestampType ||
      e.dataType == org.apache.spark.sql.types.LongType
  require(timeOk(leftTime) && timeOk(rightTime),
    s"as-of time columns must be TIMESTAMP or BIGINT, got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")
  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (l, r) =>
      !l.resolved || !r.resolved || l.dataType == r.dataType },
    "as-of join keys must match in count and type")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    toleranceUs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // every output row is a left row (possibly null-extended), produced
  // in place: the left child's hash partitioning and (key, time) sort
  // survive, so a downstream aggregation or window on the same key
  // plans with ZERO additional Exchange/Sort (asserted in
  // PlanShapeSpec) — at scale that's a whole shuffle saved per
  // enrich-then-aggregate pipeline
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIter.buffered

      val tolUs = toleranceUs.getOrElse(Long.MaxValue)
      var lastKey: UnsafeRow = null
      var lastRight: InternalRow = null
      var lastRightT = Long.MinValue

      lIter.map { lRow =>
        numOutputRows += 1
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        // null-time policy: a left row with null time matches nothing
        // (null-extend); right rows with null time are skipped. Reading
        // a null slot as getLong would silently mean "epoch 0".
        if (lTimeRow.isNullAt(0)) {
          joined(lRow, nullRight)
        } else {
          val lT = lTimeRow.getLong(0)
          // invalidate the held row if the key moved on
          if (lastKey == null || keyOrd.compare(lastKey, lKey) != 0) {
            lastKey = lKey.copy(); lastRight = null
          }
          // advance the right cursor: skip smaller keys, absorb rows of
          // this key with time <= lT (keeping the latest), stop otherwise
          var advance = true
          while (advance && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) { rBuf.next() }
            else if (c == 0) {
              val rTimeRow = rTimeProj(rBuf.head)
              if (rTimeRow.isNullAt(0)) { rBuf.next() }
              else if (rTimeRow.getLong(0) <= lT) {
                lastRightT = rTimeRow.getLong(0)
                lastRight = rBuf.next().copy()
              } else advance = false
            } else advance = false
          }
          // staleness bound: the matched right row must be within
          // tolerance of THIS left row's time (checked per left row —
          // a held row can be fresh for one order and stale for the
          // next). Strict (<) to agree with backward()'s rt > lt - tol
          // — i.e. the (t - tol, t] validity window of the reference's
          // interval join.
          if (lastRight != null && lT - lastRightT < tolUs) joined(lRow, lastRight)
          else joined(lRow, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfMergeJoinExec =
    copy(left = l, right = r)
}
