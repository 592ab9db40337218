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
