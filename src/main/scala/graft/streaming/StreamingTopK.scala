package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-window top-k ("trending keys this hour") with
  * BOUNDED state: each open window holds one Misra-Gries summary of at
  * most `capacity` counters per group key, merged incrementally as
  * micro-batches arrive, and the window's final top-k is emitted
  * exactly once when the event-time watermark closes it.
  *
  * The Misra-Gries discipline is what makes this a 100 TB streaming
  * operator: state per window is O(capacity), NOT O(distinct keys) —
  * a hot window with a million distinct keys costs the same bytes as
  * a calm one. Below capacity the summary is exact, so the streaming
  * result equals the batch mirror whenever `capacity` ≥ the window's
  * distinct-key count (the spec's regime); above it, the usual MG
  * guarantee holds (undercount ≤ n/capacity, true heavy hitters
  * survive).
  *
  * The BATCH mirror ([[topKPerWindow]]) is the oracle-checkable form:
  * one shuffled count aggregation (partial map-side) + a per-window
  * rank — at most windows × k rows out however large the input.
  */
object StreamingTopK {
  case class TopKRow(window_start: java.sql.Timestamp, key: String,
      n: Long, rank: Int)
  // the watermarked event-time column must ride into the grouped
  // Dataset (Spark requires it present for event-time timeouts);
  // public: Catalyst's generated (de)serializers cannot touch
  // private classes
  case class Ev(ws: java.sql.Timestamp, key: String,
      ts: java.sql.Timestamp)
  case class MgState(counts: Map[String, Long], closeAtMs: Long)

  /** Batch tumbling-window top-k keys by count; ties break on key
    * ascending so the ranking is total and engine-mirrorable. */
  def topKPerWindow(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, k: Int): DataFrame = {
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("key").asc)
    events
      .groupBy(window(col(tsCol), windowDur).getField("start")
          .as("window_start"),
        col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Merge one key occurrence into a Misra-Gries summary of bounded
    * width (the same decrement-all discipline as the batch a6
    * aggregate): present → increment; room → insert; full → decrement
    * every counter, dropping zeros. */
  private def mgAdd(counts: Map[String, Long], key: String,
      capacity: Int): Map[String, Long] =
    counts.get(key) match {
      case Some(n) => counts.updated(key, n + 1)
      case None if counts.size < capacity => counts.updated(key, 1L)
      case None =>
        counts.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** Streaming form: `events` (streaming DataFrame with `tsCol`,
    * `keyCol`) → one final top-k emission per tumbling window, when
    * the watermark passes the window end. Output is append-mode
    * (each window's rows appear exactly once, after it closes). */
  def topKPerWindowStream(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: Duration, watermarkDelay: Duration, k: Int,
      capacity: Int = 1024): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    val durStr = s"${windowDur.toMillis} milliseconds"
    val winMs = windowDur.toMillis
    def fn(ws: java.sql.Timestamp, it: Iterator[Ev],
        state: GroupState[MgState]): Iterator[TopKRow] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        st.counts.toSeq
          .sortBy { case (key, n) => (-n, key) }
          .take(k).zipWithIndex
          .map { case ((key, n), i) => TopKRow(ws, key, n, i + 1) }
          .iterator
      } else if (ws.getTime + winMs <= state.getCurrentWatermarkMs()) {
        // post-close straggler: flatMapGroupsWithState does NOT
        // auto-drop late rows, so a row for a window whose timeout
        // already fired would otherwise recreate empty state here and
        // the clamped timeout below would emit a SECOND, undercounted
        // top-k row set for the same window_start — breaking the
        // exactly-once final emission. Drop the batch: emit nothing,
        // create/update no state. This also matches Spark's windowed-
        // aggregation late-row rule when live state exists (the
        // timeout fires after data within the same trigger): a row
        // later than the watermark never counts, so the one emission
        // reflects only in-watermark rows.
        Iterator.empty
      } else {
        val prev = state.getOption.getOrElse(
          MgState(Map.empty, ws.getTime + winMs))
        val merged = it.foldLeft(prev.counts)((m, e) =>
          mgAdd(m, e.key, capacity))
        state.update(MgState(merged, prev.closeAtMs))
        // fire once the watermark passes the window END (the delay is
        // already the watermark's own lag — no double margin needed);
        // clamped above the current watermark so a straggler that
        // slipped past late-row filtering cannot set an already-past
        // timeout (Spark rejects those)
        state.setTimeoutTimestamp(
          math.max(prev.closeAtMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty
      }
    }
    events
      .withWatermark(tsCol, s"${watermarkDelay.toMillis} milliseconds")
      .select(window(col(tsCol), durStr).getField("start").as("ws"),
        col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .as[Ev]
      .groupByKey(_.ws)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
