package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse dimension maintenance: build a slowly-changing-dimension
  * type-2 history from an attribute-change event stream.
  *
  * Consecutive duplicate values collapse (only real changes open a new
  * version); each version's validity interval is [its change time, the
  * next change's time), the final version per key stays open
  * (valid_to null, is_current true).
  *
  * Plan shape: both window passes partition by the dimension key with
  * the same ordering, so Catalyst plans ONE shuffle + sort and runs
  * lag and lead over it back to back — per-key history processing with
  * no driver state, which is the SCD build a 100 TB fact table needs.
  */
object Dimensions {
  /** MERGE INTO semantics on plain DataFrames (the Delta/Iceberg upsert,
    * expressed as one full-outer join): apply a changeset to a snapshot —
    * matched rows update (or delete when `deleteCol` is true), unmatched
    * changeset rows insert, untouched snapshot rows pass through.
    *
    * Plan shape: ONE shuffle per side on the merge key (or a broadcast
    * when the changeset is small — the common CDC case); no driver
    * state. This is the nightly-dimension-refresh shape: snapshot is
    * 100 TB, changeset is the day's CDC feed.
    *
    * The changeset must carry AT MOST ONE row per key — real MERGE
    * INTO rejects an ambiguous multi-match rather than fanning the
    * join out into duplicated target rows, and so does this (checked
    * up front with one aggregate over the changeset — negligible next
    * to the merge join itself). Streaming callers get the collapse for
    * free from CdcApply.latestPerKey. */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      deleteCol: String): DataFrame = {
    val dataCols = snapshot.columns.filter(_ != keyCol)
    require(changes.columns.toSet == snapshot.columns.toSet + deleteCol,
      "changeset must carry the snapshot schema plus the delete flag")
    // count_distinct ignores NULLs, so a count(*)-vs-distinct check
    // would misreport a null-key row as a "duplicate"; count nulls
    // and genuine multi-row keys separately and name each honestly
    val chk = changes.agg(
      count(lit(1)).as("n"),
      count(col(keyCol)).as("nonnull"),
      count_distinct(col(keyCol)).as("keys")).head()
    val nNull = chk.getLong(0) - chk.getLong(1)
    require(nNull == 0, s"changeset has $nNull row(s) with NULL `$keyCol`; " +
      "MERGE semantics require a non-null merge key on every row")
    val nDup = chk.getLong(1) - chk.getLong(2)
    require(nDup == 0, s"changeset has $nDup duplicate " +
      s"key rows on `$keyCol`; MERGE semantics require one row per key " +
      "(collapse with CdcApply.latestPerKey or equivalent first)")
    val s = snapshot.as("s")
    val c = changes.as("c")
    s.join(c, col(s"s.$keyCol") === col(s"c.$keyCol"), "full_outer")
      // a matched delete drops the row entirely
      .filter(col(s"c.$keyCol").isNull || !col(s"c.$deleteCol"))
      .select(
        coalesce(col(s"c.$keyCol"), col(s"s.$keyCol")).as(keyCol) +:
          dataCols.map(d =>
            when(col(s"c.$keyCol").isNotNull, col(s"c.$d"))
              .otherwise(col(s"s.$d")).as(d)): _*)
  }

  /** `seqCol` breaks ordering ties for same-timestamp events (any
    * unique, monotone-per-ingest column works — an event id here). */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("__tus"), col(seqCol))
    events
      .withColumn("__tus", expr(s"unix_micros($tsCol)"))
      .withColumn("__prev", lag(col(attrCol), 1).over(ord))
      .filter(!(col("__prev") <=> col(attrCol)))
      .withColumn("valid_to_us", lead(col("__tus"), 1).over(ord))
      .select(col(keyCol), col(attrCol).as("attr"),
        col("__tus").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }
}
