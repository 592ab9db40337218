package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

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
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
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

      var lastKey: UnsafeRow = null
      var lastRight: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeProj(lRow).getLong(0)
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
          else if (c == 0 && rTimeProj(rBuf.head).getLong(0) <= lT) {
            lastRight = rBuf.next().copy()
          } else advance = false
        }
        if (lastRight != null) joined(lRow, lastRight)
        else joined(lRow, nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfMergeJoinExec =
    copy(left = l, right = r)
}
