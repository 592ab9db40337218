package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression, Literal, NamedExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.sources.FileManifest

/** METADATA-ONLY aggregates — the Delta/Iceberg "answer from the log"
  * optimization: the committed manifest carries every file's exact
  * footer row count AND the clustering column's [min, max], and every
  * committing site (append, INSERT, CoW DELETE/UPDATE/MERGE, OPTIMIZE)
  * maintains those entries, so three query shapes need NO data IO:
  *
  *  - `SELECT count(*) FROM t` — the sum over the snapshot's rows;
  *  - `SELECT min(c), max(c) FROM t` for the CLUSTERING column — the
  *    fold over the snapshot's footer ranges. Sound w.r.t. NULLs by
  *    construction: SQL min/max ignore NULLs, parquet footer min/max
  *    are over non-null values, and the manifest builder REFUSES a
  *    file whose column has no non-null value (footerStats'
  *    hasNonNullValue require) — so every manifest entry's range is
  *    backed by real values and the fold equals the scan;
  *  - any of the above `WHERE <partition-only predicate>` — partition
  *    values are directory-encoded, so a predicate over the partition
  *    column alone decides whole directories EXACTLY (every row in a
  *    directory has that value; this is partition pruning made
  *    sufficient, not just necessary), and the same fold runs over the
  *    surviving partitions' entries. No matching partition → count 0,
  *    min/max NULL, exactly the scan's answer.
  *
  * At 100 TB these are the difference between a full scan and a
  * driver-side fold over catalog rows the planner already loaded.
  * Time-traveled relations qualify too: a pinned snapshot's manifest
  * is immutable and exact.
  *
  * Deliberately NARROW — the rewrite fires only when metadata provably
  * answers the query:
  *  - no grouping; the aggregate child is the relation, optionally
  *    under ONE Filter whose condition is deterministic and references
  *    ONLY the partition column;
  *  - every aggregate is `count(1)`/`count(*)`, or `min`/`max` of
  *    exactly the clustering column with an INT/BIGINT type (the
  *    manifest's stats domain — no distinct, no agg-level filter);
  *  - `count(col)` must see NULLs → falls through; any other filter
  *    or projection shape falls through to the scan.
  * Everything else keeps Spark's normal plan, so the rule can only
  * ever remove IO, never change an answer. */
case class GraftMetadataCountRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  private case object MinCluster extends MetaAgg
  private case object MaxCluster extends MetaAgg

  private def classify(e: NamedExpression,
      clusterCol: String): Option[MetaAgg] = e match {
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
      case a @ Aggregate(Nil, aggs, child, _)
          if a.resolved && aggs.nonEmpty =>
        val (cond, relChild) = child match {
          case Filter(c, gc) => (Some(c), gc)
          case gc => (None, gc)
        }
        GraftDml.graftRelation(relChild) match {
          case Some((_, idx))
              if cond.forall(c => c.deterministic &&
                c.references.nonEmpty &&
                c.references.forall(a =>
                  idx.partitionColumns.contains(a.name))) =>
            val classified = aggs.map(classify(_, idx.clusterColumn))
            if (classified.exists(_.isEmpty)) a
            else {
              val stats = idx.metadataStats(cond)
              val clusterType = relChild.output
                .find(_.name == idx.clusterColumn).map(_.dataType)
              val values: Seq[Any] = classified.flatten.map {
                case CountStar => stats.rows
                case MinCluster => stats.min.map(v => clusterType match {
                  case Some(IntegerType) => v.toInt
                  case _ => v
                }).orNull
                case MaxCluster => stats.max.map(v => clusterType match {
                  case Some(IntegerType) => v.toInt
                  case _ => v
                }).orNull
              }
              LocalRelation(a.output, Seq(InternalRow(values: _*)))
            }
          case _ => a
        }
    }
}

/** Snapshot-fold result: exact row count and clustering-column range
  * of the (partition-filtered) snapshot; min/max None when the
  * filtered set is empty (SQL NULL). */
private[graft] final case class GraftMetadataStats(rows: Long,
    min: Option[Long], max: Option[Long])
