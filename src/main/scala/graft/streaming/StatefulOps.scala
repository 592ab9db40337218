package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization over an unbounded
  * stream via flatMapGroupsWithState with event-time timeouts — the
  * Structured Streaming analogue of Flink's keyed ProcessFunction
  * state (the mechanism a Flink Table API user would reach for beyond
  * SQL; the reference job itself stays in SQL but runs on exactly this
  * keyed-state machinery underneath).
  *
  * Semantics: events for a user belong to one session while
  * consecutive-event gaps stay <= gap; a session is emitted when a
  * later event arrives beyond the gap, or when the event-time
  * watermark passes session_end + gap (timeout), so results are final
  * and state is GC'd — bounded state at any corpus rate.
  */
object StatefulOps {
  case class Evt(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Requires `events` to already carry a watermark on `ts`. */
  def sessionize(events: Dataset[Evt], gap: Duration): Dataset[SessionOut] = {
    val gapMs = gap.toMillis
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]

    def close(user: Long, s: SessionState): SessionOut =
      SessionOut(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
        s.n, s.total)

    def fn(user: Long, it: Iterator[Evt], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _)).iterator
        state.remove()
        return out
      }
      var emitted = List.empty[SessionOut]
      var cur = state.getOption
      // within one micro-batch events are unordered; sort by event time
      it.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
          case Some(s) =>
            emitted ::= close(user, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // timeout fires once the watermark passes session_end + gap
          state.setTimeoutTimestamp(s.end + gapMs)
        case None => ()
      }
      emitted.reverseIterator
    }

    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
