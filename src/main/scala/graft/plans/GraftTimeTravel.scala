package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}

import graft.sources.GraftStreamSource

/** SQL-surface TIME TRAVEL and BATCH CDC for graft tables — the two
  * read-side idioms Delta/Iceberg users reach for:
  *
  *   SELECT … FROM t VERSION AS OF 3
  *   SELECT … FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'
  *   SELECT … FROM table_changes('t', 1, 3)
  *
  * Spark's grammar already parses the temporal clause (into
  * [[RelationTimeTravel]]) but its analyzer supports it only for DSv2
  * catalogs — a v1 session-catalog table throws
  * UNSUPPORTED_FEATURE.TIME_TRAVEL *during* resolution, before any
  * injected resolution rule can run. So the rewrite lives at the
  * parser seam the engine already owns ([[GraftSqlParser]]): after
  * Spark's parser returns, [[GraftTimeTravel.rewrite]] swaps every
  * RelationTimeTravel over a graft front-door table for the graft
  * relation pinned at that version (the same `version`/`timestampAsOf`
  * OPTIONS surface the Scala API uses — `loadVersion`/`loadAsOf`
  * resolve the snapshot). Non-graft tables, temp views, and every
  * other statement pass through untouched, Spark's errors included.
  *
  * `table_changes` is a real table-valued function (injected via
  * `injectTableFunction`, the supported TVF registry), resolving to
  * [[GraftStreamSource.tableChanges]] — the batch change feed of a
  * committed version range, rows tagged (`_graft_version`,
  * `_change_type` I/D). The version chain is immutable, so the same
  * range always returns the same rows; an incremental batch consumer
  * checkpoints nothing but the last version it folded.
  *
  * DML/maintenance on a time-traveled relation stays refused by the
  * commands themselves (the relation carries `timeTraveled = true`).
  */
object GraftTimeTravel {

  /** The catalog root of `parts` IF it names a graft front-door table
    * (CREATE TABLE … USING graft); None for temp views, non-graft
    * tables, unknown names, and >2-part identifiers. */
  private[plans] def graftRootOf(spark: SparkSession,
      parts: Seq[String]): Option[String] = {
    val catalog = spark.sessionState.catalog
    if (catalog.isTempView(parts)) return None
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _ => return None
    }
    if (!catalog.tableExists(ident)) return None
    val meta = catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) return None
    // the CREATE TABLE … OPTIONS (path '…') option is normalized into
    // storage.locationUri by Spark's datasource-table path handling
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(u =>
        new org.apache.hadoop.fs.Path(u).toString))
  }

  /** Evaluate a parsed `TIMESTAMP AS OF` expression to epoch millis.
    * Only literal timestamps make sense here (the snapshot must be
    * decidable at plan time), so anything non-foldable refuses. */
  private def timestampMillis(spark: SparkSession, e: Expression): Long = {
    require(e.resolved && e.foldable,
      s"TIMESTAMP AS OF over a graft table needs a literal timestamp, " +
        s"got: ${e.sql}")
    val cast = Cast(e, TimestampType,
      Option(spark.sessionState.conf.sessionLocalTimeZone))
    cast.eval() match {
      case micros: java.lang.Long => micros / 1000L
      case null => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF: cannot interpret ${e.sql} as a timestamp")
    }
  }

  /** Parse-time rewrite: every RelationTimeTravel whose relation is a
    * graft front-door table becomes the graft relation pinned at that
    * version/timestamp; everything else is untouched. */
  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        graftRootOf(spark, u.multipartIdentifier) match {
          case Some(root) =>
            val reader = spark.read.format("graft").option("path", root)
            val pinned = (ver, ts) match {
              case (Some(v), _) => reader.option("version", v)
              case (None, Some(e)) => reader.option("timestampAsOf",
                timestampMillis(spark, e).toString)
              case _ => reader
            }
            SubqueryAlias(u.multipartIdentifier.last,
              pinned.load().queryExecution.analyzed)
          case None => tt // not ours: Spark's own semantics (and errors)
        }
    }

  /** `table_changes('t', from[, to])` — the Delta-CDF batch read as a
    * registered table-valued function. `to` defaults to the latest
    * committed version. */
  val tableChangesFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("table_changes"),
    new ExpressionInfo(GraftTimeTravel.getClass.getCanonicalName,
      "table_changes"),
    (args: Seq[Expression]) => {
      val spark = SparkSession.active
      def longArg(e: Expression, what: String): Long = e match {
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Long, LongType) => v
        case other => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer literal, got " +
            other.sql)
      }
      val (name, from, to) = args match {
        case Seq(Literal(t, StringType), f) =>
          (t.toString, longArg(f, "fromVersion"), None)
        case Seq(Literal(t, StringType), f, u) =>
          (t.toString, longArg(f, "fromVersion"),
            Some(longArg(u, "toVersion")))
        case _ => throw new IllegalArgumentException(
          "usage: table_changes('<graft table>', fromVersion[, toVersion])")
      }
      val parts = name.split('.').toSeq
      val root = graftRootOf(spark, parts).getOrElse(
        throw new IllegalArgumentException(
          s"table_changes: `$name` is not a graft front-door table " +
            "(CREATE TABLE … USING graft OPTIONS (path '<catalogRoot>'))"))
      SubqueryAlias(parts.last,
        GraftStreamSource.tableChanges(spark, root, from, to)
          .queryExecution.analyzed)
    })
}
