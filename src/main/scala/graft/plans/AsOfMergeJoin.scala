package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
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
    toleranceUs: Option[Long] = None) extends BinaryExecNode with CodegenSupport {

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
      // consumers (collect, exchanges) expect UnsafeRow from a
      // top-level operator; SMJ does the same result projection
      val resultProj = UnsafeProjection.create(output, output)
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
        resultProj(if (lTimeRow.isNullAt(0)) {
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
        })
      }
    }
  }

  // ---- whole-stage codegen ------------------------------------------
  // Same two-input produce shape Spark's SortMergeJoinExec uses: the
  // exec is the HEAD of its codegen stage, driving both sorted child
  // iterators itself (children end at their exchange/sort boundary
  // either way), and pushes each joined row straight into the
  // downstream compiled pipeline via consume() — no per-row iterator
  // hop between the join and whatever projects/aggregates follow it.
  // The generated merge is the same single-cursor walk as doExecute:
  // cross-row state is three fields (right head, held right row, held
  // right time); held-row validity is re-derived by comparing the
  // held row's OWN key to the current left key, which spares the
  // generated code a per-type lastKey snapshot.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // exactly one output row per left row, assembled fresh each
  // iteration — nothing downstream can observe a reused buffer
  override def needCopyResult: Boolean = false

  /** null-safe ascending comparison of two ExprCode value lists
    * (nulls first, null == null — RowOrdering's natural order, so the
    * generated merge agrees with the interpreted path). */
  private def genKeyCompare(ctx: CodegenContext, dts: Seq[org.apache.spark.sql.types.DataType],
      a: Seq[ExprCode], b: Seq[ExprCode]): (String, String) = {
    val cmp = ctx.freshName("cmp")
    val checks = dts.zipWithIndex.map { case (dt, i) =>
      s"""if ($cmp == 0) {
         |  if (${a(i).isNull} && ${b(i).isNull}) { /* equal */ }
         |  else if (${a(i).isNull}) $cmp = -1;
         |  else if (${b(i).isNull}) $cmp = 1;
         |  else $cmp = ${ctx.genComp(dt, a(i).value.toString, b(i).value.toString)};
         |}""".stripMargin
    }.mkString("\n")
    (cmp, s"int $cmp = 0;\n$checks")
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];", forceInline = true)
    // cross-left-row merge state. rightHead is the UNCONSUMED right
    // cursor row: it is only held while no further next() is issued on
    // its iterator, so sorter row reuse cannot invalidate it. The held
    // match is an explicit copy.
    val rightHead = ctx.addMutableState("InternalRow", "asofRightHead")
    val lastRight = ctx.addMutableState("InternalRow", "asofLastRight")
    val lastRightT = ctx.addMutableState("long", "asofLastRightT")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val tolUs = toleranceUs.getOrElse(Long.MaxValue)

    val leftRow = ctx.freshName("asofLeftRow")
    val matched = ctx.freshName("asofMatched")
    val lT = ctx.freshName("asofLeftT")
    val advance = ctx.freshName("asofAdvance")

    // left-side evaluations, bound to the current left row
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lKeyVars = leftKeys.map(BindReferences.bindReference(_, left.output).genCode(ctx))
    val lTimeVar = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    // held-row key, evaluated from the held right row itself
    ctx.INPUT_ROW = lastRight
    val heldKeyVars = rightKeys.map(BindReferences.bindReference(_, right.output).genCode(ctx))
    val (heldCmp, heldCmpCode) =
      genKeyCompare(ctx, leftKeys.map(_.dataType), heldKeyVars, lKeyVars)

    // right-cursor key + time, evaluated from the unconsumed head
    ctx.INPUT_ROW = rightHead
    val rKeyVars = rightKeys.map(BindReferences.bindReference(_, right.output).genCode(ctx))
    val rTimeVar = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val (headCmp, headCmpCode) =
      genKeyCompare(ctx, leftKeys.map(_.dataType), rKeyVars, lKeyVars)

    // right-side output columns: null-extended unless matched, read
    // from the held copy
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val get = CodeGenerator.getValue(lastRight, a.dataType, i.toString)
      val c =
        code"""boolean $isNull = true;
              |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
              |if ($matched) {
              |  $isNull = $lastRight.isNullAt($i);
              |  if (!$isNull) $value = $get;
              |}""".stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    s"""while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lTimeVar.code}
       |  ${lKeyVars.map(_.code.toString).mkString("\n")}
       |  boolean $matched = false;
       |  if (!${lTimeVar.isNull}) {
       |    long $lT = ${lTimeVar.value};
       |    if ($lastRight != null) {
       |      ${heldKeyVars.map(_.code.toString).mkString("\n")}
       |      $heldCmpCode
       |      if ($heldCmp != 0) $lastRight = null;
       |    }
       |    boolean $advance = true;
       |    while ($advance) {
       |      if ($rightHead == null) {
       |        if ($rightInput.hasNext()) $rightHead = (InternalRow) $rightInput.next();
       |        else break;
       |      }
       |      ${rKeyVars.map(_.code.toString).mkString("\n")}
       |      $headCmpCode
       |      if ($headCmp < 0) { $rightHead = null; }
       |      else if ($headCmp == 0) {
       |        ${rTimeVar.code}
       |        if (${rTimeVar.isNull}) { $rightHead = null; }
       |        else if (${rTimeVar.value} <= $lT) {
       |          $lastRightT = ${rTimeVar.value};
       |          $lastRight = $rightHead.copy();
       |          $rightHead = null;
       |        } else $advance = false;
       |      } else $advance = false;
       |    }
       |    $matched = $lastRight != null && $lT - $lastRightT < ${tolUs}L;
       |  }
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}""".stripMargin
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfMergeJoinExec =
    copy(left = l, right = r)
}
