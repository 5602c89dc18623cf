package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event (typed view of the `events` table / stream). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** Microsecond timestamp conversions shared by the stateful streaming
  * operators ([[SessionStream]], [[AsofStream]]) — one definition, so
  * the two state machines cannot drift on boundary arithmetic. */
private[streaming] object Micros {
  def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L) // whole seconds
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }
}

/** Unsealed per-user event buffer held between micro-batches: event
  * times in micros plus the money value in 6-dp fixed point (the same
  * per-event DECIMAL(18,6) rounding the batch operator applies, so the
  * streamed session_value is bit-equal to batch). */
final case class SessionBuffer(events: List[(Long, Long)])

/** One closed session (output). */
final case class Session(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Long,
                         session_value: Double)

/** True streaming sessionization with custom state:
  * `flatMapGroupsWithState` keyed by user. Events buffer per user until
  * the WATERMARK passes a session's gap horizon — only then is the
  * session sealed and emitted. Sealing strictly by watermark (not by
  * in-batch gaps) is what makes the operator correct under
  * OUT-OF-ORDER arrival: an event may arrive late-but-within-watermark
  * and land before, inside, or between previously seen events; since
  * nothing is emitted until no admissible event could still change it,
  * the stream's output equals [[EventOps.sessionize]] over the
  * completed log regardless of arrival order. (The previous
  * implementation kept only an open-session tail and merged late events
  * by end-distance — a 10:30 arrival after a 12:00 event produced a
  * session whose start postdated one of its events.)
  *
  * State per user is O(events within the unsealed horizon) — evicted as
  * the watermark advances, same bound as [[AsofStream]]'s buffers; the
  * event-time timeout wakes the group exactly when its earliest open
  * session becomes sealable, so idle users emit without new input.
  *
  * Money parity: each event's value is fixed to 6-dp half-up on entry
  * (Spark's `cast(value AS DECIMAL(18,6))`), summed exactly in Long
  * micro-units, and rounded half-up to 2 dp on emit — bit-equal to the
  * batch `round(sum(money(value)), 2)`.
  */
object SessionStream {
  import Micros._

  val GapMicros: Long = 1800L * 1000000L

  /** Per-event money fix-point: DECIMAL(18,6) half-up, as Long micros. */
  private def moneyMicros(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** (startUs, endUs, n, valueMicros) of one gap-delimited run. */
  private def sessionsOf(sorted: List[(Long, Long)])
      : List[(Long, Long, Long, Long)] = {
    val out = List.newBuilder[(Long, Long, Long, Long)]
    var start = -1L; var end = -1L; var n = 0L; var v = 0L
    sorted.foreach { case (t, m) =>
      if (n == 0L) { start = t; end = t; n = 1L; v = m }
      else if (t - end > GapMicros) {
        out += ((start, end, n, v)); start = t; end = t; n = 1L; v = m
      } else { end = math.max(end, t); n += 1L; v += m }
    }
    if (n > 0L) out += ((start, end, n, v))
    out.result()
  }

  private def toSession(userId: Long, s: (Long, Long, Long, Long)): Session =
    Session(userId, tsFromMicros(s._1), tsFromMicros(s._2), s._3,
      java.math.BigDecimal.valueOf(s._4, 6)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())

  private def step(userId: Long, events: Iterator[Event],
                   state: GroupState[SessionBuffer]): Iterator[Session] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val incoming = events.map(e => (micros(e.ts), moneyMicros(e.value))).toList
    val buffered = state.getOption.map(_.events).getOrElse(Nil) ++ incoming
    if (buffered.isEmpty) { state.remove(); return Iterator.empty }
    val sorted = buffered.sortBy(_._1)
    val sessions = sessionsOf(sorted)
    // session ends strictly increase, so sealable sessions are a prefix
    val (closed, open) = sessions.span { case (_, end, _, _) =>
      end + GapMicros <= wmUs
    }
    if (open.isEmpty) state.remove()
    else {
      // keep only events belonging to still-open sessions
      val cut = open.head._1
      state.update(SessionBuffer(sorted.dropWhile(_._1 < cut)))
      // wake when the earliest open session becomes sealable (+1 ms: the
      // timeout must be strictly past the watermark after truncation)
      state.setTimeoutTimestamp((open.head._2 + GapMicros) / 1000L + 1L)
    }
    closed.map(toSession(userId, _)).iterator
  }

  /** Continuous sessions from a watermarked stream of [[Event]]s. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
