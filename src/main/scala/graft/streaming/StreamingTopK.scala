package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-key top-k maintenance on `transformWithState` ListState —
  * the serving-side "best k per entity" view (top purchases per user, best
  * k candidate documents per query, ...) kept incrementally current as the
  * stream flows, instead of recomputed by a batch window job.
  *
  * State is the per-key top-k LIST (≤ k rows per key — bounded by
  * construction, no TTL needed for boundedness), held in a TWS
  * [[ListState]] on RocksDB. Each input batch merges into the list and
  * emits the key's CURRENT top-k (update semantics). The union of emitted
  * snapshots is a superset of the final top-k that re-ranking collapses
  * exactly: a true top-k element's rank at arrival time is at most its
  * final rank (competitors only accumulate), so every true top-k element
  * is emitted at its arrival batch — the same collapse convention as
  * q11's latest-per-key (and q135's oracle is the plain batch window
  * row_number ≤ k).
  *
  * Ordering: value DESC, event_id DESC tiebreak — total and deterministic.
  */
object StreamingTopK {

  /** One kept row of a key's top-k list. */
  case class Scored(user_id: Long, value: Double, event_id: Long)

  def topKPerKey(events: Dataset[KeyedEvent], k: Int): Dataset[Scored] = {
    require(k > 0, "k must be positive")
    import events.sparkSession.implicits._
    // encoder materialized on the driver (see StreamingLatest.latestPerKeyTWS:
    // per-task reflection serializes on a global TypeTag lock)
    val enc = implicitly[Encoder[Scored]]
    events.groupByKey(_.user_id)
      .transformWithState(new TopKProcessor(k, enc),
        TimeMode.None(), OutputMode.Update())
  }

  private class TopKProcessor(k: Int, enc: Encoder[Scored])
      extends StatefulProcessor[Long, KeyedEvent, Scored] {
    @transient private var top: ListState[Scored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Scored]("topk", enc, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[Scored] = {
      val incoming = rows.map(e => Scored(e.user_id, e.value, e.event_id))
      val merged = (top.get() ++ incoming).toArray
        .sortBy(s => (-s.value, -s.event_id)).distinct.take(k)
      top.put(merged)
      merged.iterator
    }
  }
}

/** Streaming per-key PROFILE on `transformWithState` MapState — the
  * third TWS state shape: a per-user map of event_type → running count,
  * incremented in place per batch (only touched entries are written —
  * MapState's point updates are what distinguish it from rewriting a
  * whole ValueState blob at 100 TB key cardinalities). Emits the UPDATED
  * (user, type, count) entries each batch; counts only grow, so the final
  * profile collapses as max(count) per (user, type) — and equals the
  * plain batch groupBy count, which is the q137 oracle. */
object StreamingProfile {

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  def profilePerKey(events: Dataset[KeyedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    val encK = implicitly[Encoder[String]]
    val encV = implicitly[Encoder[Long]]
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(encK, encV),
        TimeMode.None(), OutputMode.Update())
  }

  private class ProfileProcessor(encK: Encoder[String], encV: Encoder[Long])
      extends StatefulProcessor[Long, KeyedEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts", encK, encV, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val delta = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      delta.map { case (tpe, d) =>
        val n = (if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L) + d
        counts.updateValue(tpe, n)
        TypeCount(key, tpe, n)
      }.iterator
    }
  }
}

/** Streaming INACTIVITY detection on `transformWithState` EVENT-TIME
  * TIMERS — the TWS feature the other three operators don't touch: a key
  * that stays quiet for `gapMs` of event time past its last event emits a
  * (key, last_ts) record exactly once, when the watermark proves no
  * earlier event can still arrive. This is the churn/session-expiry/
  * SLA-alert primitive; timers move the "has anyone gone quiet?" question
  * from a periodic full state scan to an engine-maintained expiry index.
  *
  * Exact semantics (mirrored by q139's oracle in integer millisecond
  * algebra): a key fires iff
  *   floor_ms(last_event_ts) + gapMs <= watermark_ms
  * where watermark_ms = floor_ms(max event ts) − delay — Spark registers
  * and fires timers in whole milliseconds (`registerTimer`,
  * `getExpiredTimers` uses `timerTs <= watermark`), so the boundary is an
  * integer compare on both engines, no fp anywhere.
  *
  * Caller must put a `.withWatermark` on the input (event-time mode
  * requires it); out-of-order input is handled by keeping the ARGMAX
  * event time per key (a late older event must not re-arm the timer
  * later than the true last event... nor earlier: argmax, not
  * last-arrival).
  */
object StreamingInactivity {

  case class Inactive(user_id: Long, last_ts: java.sql.Timestamp)

  def inactiveKeys(events: Dataset[KeyedEvent], gapMs: Long): Dataset[Inactive] = {
    require(gapMs > 0, "gapMs must be positive")
    import events.sparkSession.implicits._
    val enc = implicitly[Encoder[Inactive]]
    events.groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gapMs, enc),
        TimeMode.EventTime(), OutputMode.Update())
  }

  private class InactivityProcessor(gapMs: Long, enc: Encoder[Inactive])
      extends StatefulProcessor[Long, KeyedEvent, Inactive] {
    @transient private var last: ValueState[Inactive] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Inactive]("last", enc, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[Inactive] = {
      val incomingMax = rows.map(_.ts).maxBy(_.getTime)
      val prev = Option(last.get())
      val best = prev match {
        case Some(p) if p.last_ts.getTime >= incomingMax.getTime => p.last_ts
        case _ => incomingMax
      }
      // re-arm: one live timer per key (the previous one, if any, is
      // deleted — otherwise a stale earlier timer would fire a false alarm)
      prev.foreach(p => getHandle.deleteTimer(p.last_ts.getTime + gapMs))
      getHandle.registerTimer(best.getTime + gapMs)
      last.update(Inactive(key, best))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Inactive] = {
      val out = Option(last.get()).iterator
      last.clear() // emit once; a later event would re-arm from cold
      out
    }
  }
}
