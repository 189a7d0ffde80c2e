package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed session: emitted EXACTLY ONCE, when the event-time watermark
  * passes the session's last event + gap. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** The open-session state: bounds in epoch MICROS (events carry microsecond
  * timestamps; millis state would silently truncate bounds) + event count. */
case class OpenSession(startUs: Long, endUs: Long, n: Long)

/** Gap-based STREAMING sessionization with closed-session emission — the
  * custom-state sibling of [[graft.operators.Sessionize]] (batch) and q42's
  * built-in `session_window` (windowed aggregation): use this form when a
  * session must carry arbitrary state and emit once on close (abandoned-cart
  * triggers, session-summary feature writes). `flatMapGroupsWithState` with
  * an event-time timeout keeps ONE open session per key in the state store —
  * state is O(active keys), not O(events) — and the timeout fires when the
  * WATERMARK (not wall clock) passes last-event + gap, so out-of-order
  * arrival within the watermark delay cannot close a session early.
  *
  * Within a micro-batch, rows are sorted by (event-time, id) and gap-split,
  * so a batch spanning several sessions emits the interior ones immediately.
  * An event arriving AFTER its session closed (later than watermark + gap)
  * starts a fresh session — the bounded-state trade every streaming
  * sessionizer makes; the watermark delay is the knob.
  */
object StreamingSessionize {

  /** Timestamp ↔ epoch-micros, exact (getTime alone floors to millis). */
  private def toUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromUs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def byGap(
      events: Dataset[KeyedEvent],
      watermarkDelay: String,
      gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[KeyedEvent], state: GroupState[OpenSession]) =>
          def toClosed(s: OpenSession) =
            ClosedSession(user, fromUs(s.startUs), fromUs(s.endUs), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toClosed)
            state.remove()
            out.iterator
          } else {
            val closed = ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            rows.toSeq.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
              val t = toUs(e.ts)
              open match {
                case Some(s) if t - s.endUs <= gapUs =>
                  open = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
                case Some(s) =>
                  closed += toClosed(s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when the watermark passes end + gap; base must sit
              // above the current watermark (engine requirement) for a
              // late-arriving extension. Timeout API is millis — round the
              // micros bound UP so the timeout never fires a hair early.
              state.setTimeoutTimestamp(
                math.max(Math.floorDiv(s.endUs + gapUs + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
