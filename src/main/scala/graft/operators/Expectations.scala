package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ-style contract
  * check that gates a corpus drop before it reaches training): each
  * check contributes one violation-count aggregate, ALL checks run in
  * a single scan + one global aggregation row, and the result unpivots
  * into one row per check — audit cost is one pass however many
  * constraints are attached.
  *
  * Null handling: nulls violate only `notNull`; range/set/format
  * checks skip them (three-valued logic keeps each rule's concern
  * separate, and both engines agree on it).
  */
object Expectations {
  final case class Check(rule: String, column: String, violations: Column)

  /** SQL string literal with quotes doubled — rule/column names splice
    * into the stack() expression and must not break parsing. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  def notNull(c: String): Check =
    Check("not_null", c, sum(when(col(c).isNull, 1L).otherwise(0L)))
  /** Duplicate non-null values (count - distinct). */
  def unique(c: String): Check =
    Check("unique", c, count(col(c)) - countDistinct(col(c)))
  def inRange(c: String, lo: Long, hi: Long): Check =
    Check("in_range", c,
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)))
  def inSet(c: String, values: Seq[String]): Check =
    Check("in_set", c,
      sum(when(!col(c).isInCollection(values), 1L).otherwise(0L)))
  def nonEmpty(c: String): Check =
    Check("non_empty", c,
      sum(when(length(trim(col(c))) === 0, 1L).otherwise(0L)))

  /** The audit reshaped over event-time windows: same mergeable
    * violation aggregates per tumbling window, so the identical
    * declarative body runs batch or streaming (the continuous
    * data-contract monitor for an arriving corpus). One row per
    * (window, check). */
  def auditWindowed(df: DataFrame, tsCol: String, windowDuration: String,
      checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val keyed = checks.zipWithIndex
    val aggCols = keyed.map { case (c, i) =>
      coalesce(c.violations.cast("long"), lit(0L)).as(s"__v$i")
    }
    val agged = df
      .groupBy(window(col(tsCol), windowDuration).as("__w"))
      .agg(count(lit(1)).as("__n"), aggCols: _*)
    val stacked = keyed
      .map { case (c, i) => s"${sqlLit(c.rule)}, ${sqlLit(c.column)}, __v$i" }
      .mkString(", ")
    agged
      .select(col("__w.start").as("window_start"), col("__n"),
        expr(s"stack(${checks.size}, $stacked)")
          .as(Seq("rule", "column", "n_violations")))
      .select(col("window_start"), col("rule"), col("column"),
        col("n_violations"), col("__n").as("n_rows"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** ALERTS: only the failing (window, check) rows of a windowed audit
    * — the stream a pager/alert topic actually consumes (a healthy
    * corpus emits nothing, so sink volume is bounded by violations,
    * not by windows x checks). */
  def alerts(audited: DataFrame): DataFrame = audited.filter(!col("passed"))

  /** Continuous data-contract ALERTING: watermark -> tumbling-window
    * audit -> failing rows only. Append-mode streaming: each window's
    * alerts emit exactly once, when the watermark closes the window —
    * so an alert is final (counts cannot grow after emission), which
    * is the contract an alerting sink needs. Attach any sink via
    * `.writeStream` on the result. */
  def alertStream(stream: DataFrame, tsCol: String, watermarkDelay: String,
      windowDuration: String, checks: Seq[Check]): DataFrame =
    alerts(auditWindowed(stream.withWatermark(tsCol, watermarkDelay),
      tsCol, windowDuration, checks))

  /** One row per check: (rule, column, n_violations, n_rows, passed). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(c => (c.rule, c.column)).distinct.size == checks.size,
      "duplicate (rule, column) check")
    val keyed = checks.zipWithIndex
    val aggCols = keyed.map { case (c, i) =>
      coalesce(c.violations.cast("long"), lit(0L)).as(s"__v$i")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggCols: _*)
    val stacked = keyed
      .map { case (c, i) => s"${sqlLit(c.rule)}, ${sqlLit(c.column)}, __v$i" }
      .mkString(", ")
    row
      .select(col("__n"),
        expr(s"stack(${checks.size}, $stacked)")
          .as(Seq("rule", "column", "n_violations")))
      .select(col("rule"), col("column"), col("n_violations"),
        col("__n").as("n_rows"), (col("n_violations") === 0L).as("passed"))
  }
}
