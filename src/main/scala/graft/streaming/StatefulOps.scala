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

  // ---- streaming as-of join (event-time temporal join) --------------

  /** Union-tagged event for the keyed co-processing stream. */
  case class AsOfEvent(key: String, isRate: Boolean, ts: java.sql.Timestamp,
      rate: Int, id: Int, amount: Int)
  case class AsOfState(rates: List[(Long, Int)], pending: List[(Long, Int, Int)])
  case class AsOfEnriched(id: Int, key: String, order_time: java.sql.Timestamp,
      amount: Int, rate: Option[Int], converted: Option[Int])

  /** Streaming backward as-of join with full event-time correctness:
    * orders are held in keyed state until the watermark passes their
    * event time (so every rate that could precede them has arrived),
    * then matched against the latest rate <= order time and emitted —
    * the streaming analogue of Flink's event-time temporal join, which
    * the reference's interval join approximates (StreamingJob.java:
    * 94-105).
    *
    * State is bounded per key: the rate buffer keeps only rates newer
    * than the watermark plus the single latest rate at-or-before it
    * (any older rate can never again be "the latest <= some future
    * order"); pending orders drain as the watermark advances (flushed
    * by event-time timeout when a key receives no further traffic).
    *
    * Across keys, by DEFAULT the latest rate per key is retained
    * indefinitely — that IS the temporal-join contract (an order
    * arriving years later still matches the last known rate), so total
    * state grows with key cardinality. For unbounded key domains pass
    * `idleTtl`: a key with no pending orders whose watermark-idle time
    * exceeds the TTL is dropped entirely; orders arriving after that
    * see no rate until a fresh rate arrives. Pick per workload —
    * correctness-forever vs bounded state.
    *
    * `orders` and `rates` must each carry a watermark on their time
    * column before being tagged into `events` (see `asOfEnrich`). */
  def asOfEnrichStream(events: Dataset[AsOfEvent],
      idleTtl: Option[Duration] = None): Dataset[AsOfEnriched] = {
    implicit val outEnc = Encoders.product[AsOfEnriched]
    implicit val stEnc = Encoders.product[AsOfState]

    def flush(key: String, st: AsOfState, wm: Long): (AsOfState, List[AsOfEnriched]) = {
      val (ready, hold) = st.pending.partition(_._1 <= wm)
      val out = ready.sortBy(_._1).map { case (ts, id, amount) =>
        val m = st.rates.filter(_._1 <= ts).lastOption
        AsOfEnriched(id, key, new java.sql.Timestamp(ts), amount,
          m.map(_._2), m.map(amount * _._2))
      }
      // prune: latest rate <= wm plus everything after it
      val keepFrom = st.rates.lastIndexWhere(_._1 <= wm)
      val rates = if (keepFrom <= 0) st.rates else st.rates.drop(keepFrom)
      (AsOfState(rates, hold), out)
    }

    def fn(key: String, it: Iterator[AsOfEvent],
        state: GroupState[AsOfState]): Iterator[AsOfEnriched] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(AsOfState(Nil, Nil))
      // an idle-TTL wakeup with nothing pending means the key went
      // quiescent for the whole TTL: drop its state
      if (state.hasTimedOut && st0.pending.isEmpty && idleTtl.isDefined) {
        state.remove()
        return Iterator.empty
      }
      val st1 = if (state.hasTimedOut) st0 else {
        val evs = it.toSeq
        val newRates = evs.filter(_.isRate).map(e => (e.ts.getTime, e.rate))
        val newOrders = evs.filterNot(_.isRate).map(e => (e.ts.getTime, e.id, e.amount))
        AsOfState((st0.rates ++ newRates).sortBy(_._1),
          st0.pending ++ newOrders)
      }
      val (st2, out) = flush(key, st1, wm)
      if (st2.rates.isEmpty && st2.pending.isEmpty) state.remove()
      else {
        state.update(st2)
        if (st2.pending.nonEmpty) {
          // wake when the watermark can release the oldest held order
          state.setTimeoutTimestamp(math.max(st2.pending.map(_._1).min, wm + 1))
        } else idleTtl.foreach { ttl =>
          // wake after TTL of watermark-idleness to GC the key
          state.setTimeoutTimestamp(math.max(wm, 0L) + ttl.toMillis)
        }
      }
      out.iterator
    }

    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Convenience wrapper from the reference's two POJO streams; the
    * watermark is set on the unified tag stream's `ts`. */
  def asOfEnrich(orders: Dataset[OrderEnrichmentJob.Order],
      rates: Dataset[OrderEnrichmentJob.ExchangeRate],
      watermark: String = "10 seconds"): Dataset[AsOfEnriched] = {
    val spark = orders.sparkSession
    import spark.implicits._
    val o = orders.map(x => AsOfEvent(x.currency, isRate = false, x.orderTime, 0, x.id, x.amount))
    val r = rates.map(x => AsOfEvent(x.currency, isRate = true, x.exchangeRateTime, x.rate, 0, 0))
    asOfEnrichStream(o.union(r).withWatermark("ts", watermark))
  }

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

  // ---- streaming SCD type-2 (dimension upsert) ----------------------

  case class ScdEvent(user_id: Long, ts: java.sql.Timestamp, attr: String,
      seq: Long)
  case class ScdState(attr: String, validFromUs: Long)
  /** A CLOSED version — append mode can only emit finals; the open
    * version per key lives in state until the next change closes it. */
  case class ScdVersion(user_id: Long, attr: String, valid_from_us: Long,
      valid_to_us: Long)

  /** Streaming counterpart of `Dimensions.scd2`: keyed state carries
    * each dimension key's OPEN version; an attribute change closes it
    * (emitting the finalized validity interval) and opens the next.
    * Consecutive duplicates collapse exactly as in batch.
    *
    * Ordering contract: within a micro-batch events sort by (event
    * time, seq); ACROSS batches per-key event time must not regress
    * (enforce upstream with a watermark + sorted replay, as the spec
    * does) — the same contract any streaming upsert sink imposes.
    * State is one small record per key — bounded by key cardinality,
    * not stream length. */
  def scd2Stream(events: Dataset[ScdEvent]): Dataset[ScdVersion] = {
    implicit val outEnc = Encoders.product[ScdVersion]
    implicit val stEnc = Encoders.product[ScdState]

    // java.sql.Timestamp.getTime truncates to millis; getNanos carries
    // the full sub-second — combine for true micros so the stream's
    // ordering and emitted intervals match batch unix_micros exactly
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def fn(user: Long, it: Iterator[ScdEvent],
        state: GroupState[ScdState]): Iterator[ScdVersion] = {
      var emitted = List.empty[ScdVersion]
      var cur = state.getOption
      it.toSeq.sortBy(e => (micros(e.ts), e.seq)).foreach { e =>
        val tus = micros(e.ts)
        cur match {
          case Some(s) if s.attr == e.attr => () // no change, collapse
          case Some(s) =>
            emitted ::= ScdVersion(user, s.attr, s.validFromUs, tus)
            cur = Some(ScdState(e.attr, tus))
          case None =>
            cur = Some(ScdState(e.attr, tus))
        }
      }
      cur.foreach(state.update)
      emitted.reverseIterator
    }

    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
