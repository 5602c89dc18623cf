package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event (typed view of the `events` table / stream). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** Open-session state held per user between micro-batches. */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, value: Double)

/** One closed session (output). */
final case class Session(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Long,
                         session_value: Double)

/** True streaming sessionization with custom state:
  * `flatMapGroupsWithState` keyed by user, one [[OpenSession]] per active
  * user, closed either by an in-batch gap > 30 min or by event-time
  * timeout once the watermark passes the gap horizon.
  *
  * This is the stateful-streaming twin of [[EventOps.sessionize]] (same
  * gap rule, same output shape): batch answers "what were the sessions",
  * this answers it continuously with O(active users) state. Use a
  * watermark on `ts` upstream; state eviction rides the watermark, so
  * unbounded-state leaks are structurally impossible.
  */
object SessionStream {

  val GapMicros: Long = 1800L * 1000000L

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L) // whole seconds
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  private def toSession(userId: Long, s: OpenSession): Session =
    Session(userId, tsFromMicros(s.startUs), tsFromMicros(s.endUs), s.n,
            math.rint(s.value * 100) / 100)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  /** Fold a (sorted) batch of events into the open session, emitting every
    * session that a gap closes along the way. */
  private def step(userId: Long, events: Iterator[Event],
                   state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      open match {
        case Some(s) if t - s.endUs > GapMicros =>
          closed += toSession(userId, s)
          open = Some(OpenSession(t, t, 1, e.value))
        case Some(s) =>
          open = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1,
                                  s.value + e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // close once the watermark is one gap past the session's end
        state.setTimeoutTimestamp(s.endUs / 1000 + GapMicros / 1000)
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Continuous sessions from a watermarked stream of [[Event]]s. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
