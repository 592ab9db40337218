package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** METADATA-ONLY `COUNT(*)` — the Delta/Iceberg "answer counts from
  * the log" optimization: an unfiltered, ungrouped `SELECT count(*)
  * FROM t` over a graft table needs NO data IO, because the committed
  * manifest already carries every file's exact footer row count and
  * every committing site (append, INSERT, CoW DELETE/UPDATE/MERGE,
  * OPTIMIZE) maintains those entries — the sum over the snapshot IS
  * the answer. At 100 TB that is the difference between a full scan
  * and a driver-side fold over catalog rows the planner has already
  * loaded. Time-traveled relations qualify too: a pinned snapshot's
  * manifest is immutable and exact.
  *
  * Deliberately NARROW — the rewrite fires only when metadata provably
  * answers the query:
  *  - no grouping, no filter, the aggregate child IS the relation
  *    (any Filter/Project in between falls through to the scan);
  *  - every aggregate is exactly `count(1)` / `count(*)` (a
  *    `count(col)` must see NULLs, a distinct must see values).
  * Everything else keeps Spark's normal plan, so the rule can only
  * ever remove IO, never change an answer. */
case class GraftMetadataCountRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def isCountStar(e: org.apache.spark.sql.catalyst.expressions
      .NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete,
        false, None, _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case a @ Aggregate(Nil, aggs, child, _)
          if a.resolved && aggs.nonEmpty && aggs.forall(isCountStar) =>
        GraftDml.graftRelation(child) match {
          case Some((_, idx)) =>
            val n = idx.currentSnapshot.partitions.valuesIterator
              .flatten.map(_.rows).sum
            LocalRelation(a.output,
              Seq(InternalRow(aggs.map(_ => n): _*)))
          case None => a
        }
    }
}
