package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.sources.FileManifest

/** METADATA-ONLY aggregates — the Delta/Iceberg "answer from the log"
  * optimization (and Spark's own `OptimizeMetadataOnlyQuery` role,
  * which never fires on a custom FileIndex): the committed manifest
  * carries every file's exact footer row count AND the clustering
  * column's [min, max], keyed by directory-encoded partition values,
  * and every committing site (append, INSERT, CoW DELETE/UPDATE/
  * MERGE, OPTIMIZE) maintains those entries — so these query shapes
  * need NO data IO:
  *
  *  - `SELECT count(*) FROM t` — the sum over the snapshot's rows;
  *  - `SELECT min(c), max(c) FROM t` for the CLUSTERING column — the
  *    fold over the snapshot's footer ranges. Sound w.r.t. NULLs by
  *    construction: SQL min/max ignore NULLs, parquet footer min/max
  *    are over non-null values, and the manifest builder REFUSES a
  *    file whose column has no non-null value — every entry's range
  *    is backed by real values, so the fold equals the scan;
  *  - `SELECT DISTINCT p[, p2]` / `SELECT p, count(*) … GROUP BY p` /
  *    per-group min/max of the clustering column — GROUPED BY
  *    partition columns only: the groups ARE the directory keys, the
  *    per-group folds run over each key's entries, and groups exist
  *    exactly where rows do (a partition directory is never empty in
  *    a committed manifest);
  *  - any of the above `WHERE <partition-only predicate>` — partition
  *    values decide whole directories EXACTLY (partition pruning made
  *    sufficient, not just necessary). No matching partition → the
  *    global form answers count 0 / min NULL (one row), the grouped
  *    form answers zero rows — both exactly the scan's answer.
  *
  * At 100 TB these are the difference between a full scan and a
  * driver-side fold over catalog rows the planner already loaded.
  * Time-traveled relations qualify too: a pinned snapshot's manifest
  * is immutable and exact.
  *
  * Deliberately NARROW — the rewrite fires only when metadata provably
  * answers the query:
  *  - grouping expressions, if any, are plain partition-column
  *    attributes; the aggregate child is the relation, optionally
  *    under ONE Filter whose condition is deterministic and references
  *    ONLY partition columns;
  *  - every output is a grouping attribute, `count(1)`/`count(*)`, or
  *    `min`/`max` of exactly the clustering column with an INT/BIGINT
  *    type (the manifest's stats domain — no distinct, no agg-level
  *    filter);
  *  - `count(col)` must see NULLs → falls through; any other filter,
  *    projection, or expression shape falls through to the scan.
  * Everything else keeps Spark's normal plan, so the rule can only
  * ever remove IO, never change an answer. */
case class GraftMetadataCountRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private sealed trait MetaOut
  private case class GroupKey(ordinal: Int) extends MetaOut
  private case object CountStar extends MetaOut
  private case object MinCluster extends MetaOut
  private case object MaxCluster extends MetaOut

  private def classify(e: NamedExpression, clusterCol: String,
      groupIds: Map[Long, Int]): Option[MetaOut] = e match {
    case a: AttributeReference if groupIds.contains(a.exprId.id) =>
      Some(GroupKey(groupIds(a.exprId.id)))
    case Alias(a: AttributeReference, _)
        if groupIds.contains(a.exprId.id) =>
      Some(GroupKey(groupIds(a.exprId.id)))
    case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete,
        false, None, _), _) => Some(CountStar)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete,
        false, None, _), _)
        if a.name == clusterCol &&
          (a.dataType == IntegerType || a.dataType == LongType) =>
      Some(MinCluster)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete,
        false, None, _), _)
        if a.name == clusterCol &&
          (a.dataType == IntegerType || a.dataType == LongType) =>
      Some(MaxCluster)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      // `SELECT DISTINCT p[, p2]` — still a Distinct node at
      // resolution time (ReplaceDistinctWithAggregate is an optimizer
      // rule); rewrite to the equivalent partition-grouped Aggregate
      // and let the case below decide whether metadata answers it
      case d @ org.apache.spark.sql.catalyst.plans.logical.Distinct(
          p @ org.apache.spark.sql.catalyst.plans.logical
            .Project(pl, _))
          if d.resolved && pl.nonEmpty &&
            pl.forall(_.isInstanceOf[AttributeReference]) =>
        apply(Aggregate(pl, pl, p))
      case a @ Aggregate(grouping, aggs, child, _)
          if a.resolved && aggs.nonEmpty =>
        // strip attribute-only Projects (row-preserving — DISTINCT
        // desugars to Aggregate over Project) and at most one Filter
        def unwrap(p: LogicalPlan, cond: Option[Expression])
            : (Option[Expression], LogicalPlan) = p match {
          case org.apache.spark.sql.catalyst.plans.logical
              .Project(pl, gc)
              if pl.forall(_.isInstanceOf[AttributeReference]) =>
            unwrap(gc, cond)
          case Filter(c, gc) if cond.isEmpty => unwrap(gc, Some(c))
          case other => (cond, other)
        }
        val (cond, relChild) = unwrap(child, None)
        GraftDml.graftRelation(relChild) match {
          case Some((_, idx))
              if cond.forall(c => c.deterministic &&
                c.references.nonEmpty &&
                c.references.forall(x =>
                  idx.partitionColumns.contains(x.name))) =>
            // grouping keys: plain, distinct partition-column attrs
            val groupAttrs = grouping.map {
              case g: AttributeReference
                  if idx.partitionColumns.contains(g.name) => Some(g)
              case _ => None
            }
            if (groupAttrs.exists(_.isEmpty) ||
                groupAttrs.flatten.map(_.name).distinct.size !=
                  groupAttrs.size) a
            else {
              val gAttrs = groupAttrs.flatten
              val groupIds = gAttrs.zipWithIndex
                .map { case (g, i) => g.exprId.id -> i }.toMap
              val classified = aggs.map(
                classify(_, idx.clusterColumn, groupIds))
              if (classified.exists(_.isEmpty)) a
              else {
                val groups = idx.metadataGroups(cond, gAttrs.map(_.name))
                val clusterType = relChild.output
                  .find(_.name == idx.clusterColumn).map(_.dataType)
                def statVal(v: Option[Long]): Any =
                  v.map(x => clusterType match {
                    case Some(IntegerType) => x.toInt
                    case _ => x
                  }).orNull
                val rows: Seq[InternalRow] =
                  if (groups.isEmpty && grouping.nonEmpty) Nil
                  else if (groups.isEmpty)
                    // ungrouped global aggregate over an empty set:
                    // ONE row — count 0, min/max NULL
                    Seq(InternalRow(classified.flatten.map {
                      case CountStar => 0L
                      case _ => null
                    }: _*))
                  else groups.map { case (keyVals, st) =>
                    InternalRow(classified.flatten.map {
                      case GroupKey(i) => keyVals(i)
                      case CountStar => st.rows
                      case MinCluster => statVal(st.min)
                      case MaxCluster => statVal(st.max)
                    }: _*)
                  }
                LocalRelation(a.output, rows)
              }
            }
          case _ => a
        }
    }
}

/** Snapshot-fold result: exact row count and clustering-column range
  * of a (partition-filtered, possibly grouped) entry set; min/max
  * None when the set is empty (SQL NULL). */
private[graft] final case class GraftMetadataStats(rows: Long,
    min: Option[Long], max: Option[Long])
