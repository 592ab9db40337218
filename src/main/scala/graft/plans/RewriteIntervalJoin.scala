package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrites a naive event-time interval join
  *
  *   L JOIN R ON L.k = R.k AND R.t <= L.t AND R.t > L.t - INTERVAL d
  *
  * into the time-bucketed form (see graft.operators.IntervalJoin): both
  * sides gain `floor(unix_micros(t) / d)` bucket columns, the right
  * side is exploded into buckets [b, b+1], and the join gains a bucket
  * equality. The planner then extracts (k, bucket) as composite
  * equi-join keys, so shuffle cardinality scales with the *time
  * domain* instead of the key domain — a SQL user writing the
  * reference's query (StreamingJob.java:94-105) against a
  * 5-currency key gets 1000-executor parallelism automatically.
  *
  * Exactness: a right row in bucket b can only satisfy the range
  * against left rows in buckets b or b+1, and satisfies it for exactly
  * one of its two copies, so result multiplicity is unchanged; the
  * left side is never duplicated, preserving LEFT OUTER semantics.
  * The original range predicates are kept.
  *
  * Matched shapes (post-parse/optimize):
  *   upper:  R.t <= L.t   |  L.t >= R.t
  *   lower:  R.t >  L.t + INTERVAL '-d'  |  R.t >= L.t + INTERVAL '-d'
  * with d a pure day-time interval (months = 0).
  *
  * Disable with `SET spark.graft.rewriteIntervalJoins=false`.
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] {
  private val MARKER = "__graft_bucket"

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewriteIntervalJoins", "true") == "true"

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case x => Seq(x)
  }

  /** floor-div that is exact for negative micros too:
    * (x - pmod(x, d)) div d */
  private def bucket(t: Expression, deltaUs: Long): Expression = {
    val x = UnixMicros(t)
    val d = Literal(deltaUs, LongType)
    IntegralDivide(Subtract(x, Pmod(x, d)), d)
  }

  private case class Bounds(lt: Expression, rt: Expression, deltaUs: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, jt @ (Inner | LeftOuter), Some(cond), hint)
          if !cond.exists { case a: Attribute => a.name.startsWith(MARKER); case _ => false } =>
        val conjuncts = splitAnd(cond)
        val fromLeft = (e: Expression) => e.references.subsetOf(left.outputSet) && e.references.nonEmpty
        val fromRight = (e: Expression) => e.references.subsetOf(right.outputSet) && e.references.nonEmpty

        // at least one plain equality across sides (the skewable key)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
          case _ => false
        }

        // upper bound: rt <= lt
        val upper: Option[(Expression, Expression)] = conjuncts.collectFirst {
          case LessThanOrEqual(rt, lt)
              if rt.dataType == TimestampType && fromRight(rt) && fromLeft(lt) => (lt, rt)
          case GreaterThanOrEqual(lt, rt)
              if rt.dataType == TimestampType && fromLeft(lt) && fromRight(rt) => (lt, rt)
        }

        // lower bound: rt > lt + (-d)  (parser turns `lt - INTERVAL d` into TimestampAddInterval)
        def negInterval(e: Expression): Option[Long] = e match {
          // ANSI day-time interval: long micros
          case Literal(micros: Long, _: DayTimeIntervalType) if micros < 0 =>
            Some(-micros)
          case Literal(iv: CalendarInterval, CalendarIntervalType)
              if iv.months == 0 && (iv.days * 86400000000L + iv.microseconds) < 0 =>
            Some(-(iv.days * 86400000000L + iv.microseconds))
          case _ => None
        }
        val lower: Option[Bounds] = conjuncts.collectFirst(Function.unlift {
          case GreaterThan(rt, TimestampAddInterval(lt, iv, _)) if fromRight(rt) && fromLeft(lt) =>
            negInterval(iv).map(Bounds(lt, rt, _))
          case GreaterThanOrEqual(rt, TimestampAddInterval(lt, iv, _)) if fromRight(rt) && fromLeft(lt) =>
            negInterval(iv).map(Bounds(lt, rt, _))
          case _ => None
        })

        val rewrite = for {
          (ult, urt) <- upper
          b <- lower
          if hasEqui && b.lt.semanticEquals(ult) && b.rt.semanticEquals(urt)
        } yield {
          val lAlias = Alias(bucket(b.lt, b.deltaUs), s"${MARKER}_l")()
          val newLeft = Project(left.output :+ lAlias, left)
          val rbAlias = Alias(bucket(b.rt, b.deltaUs), s"${MARKER}_rb")()
          val rightProj = Project(right.output :+ rbAlias, right)
          val genOut = AttributeReference(s"${MARKER}_r", LongType,
            nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(rbAlias.toAttribute,
              Add(rbAlias.toAttribute, Literal(1L, LongType))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = rightProj)
          val newCond = And(EqualTo(lAlias.toAttribute, genOut), cond)
          Project(left.output ++ right.output,
            Join(newLeft, gen, jt, Some(newCond), hint))
        }
        rewrite.getOrElse(j)
    }
  }
}
