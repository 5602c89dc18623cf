package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One match: a purchase finalized against the user's latest view
  * at-or-before it (None when no view precedes). */
final case class AsofMatch(event_id: Long, user_id: Long,
                           purchase_ts: Timestamp,
                           view_event_id: Option[Long],
                           gap_seconds: Option[Long])

/** Per-user as-of state between micro-batches. `lastView` folds every
  * view already final under the watermark (only the latest can ever
  * matter for FUTURE purchases); `views`/`purchases` buffer rows the
  * watermark has not yet sealed. All pairs are (event_id, micros). */
final case class AsofBuf(purchases: List[(Long, Long)],
                         views: List[(Long, Long)],
                         lastView: Option[(Long, Long)])

/** Streaming twin of [[graft.ops.Temporal.asofJoin]] for the
  * purchase←view attribution shape: continuous, watermark-correct as-of
  * matching with `flatMapGroupsWithState`.
  *
  * Why not the batch union+window trick: a running window over an
  * unbounded stream never closes. Instead each user's group holds the
  * event-time buffer, and a purchase is FINALIZED only once the
  * watermark passes its timestamp — at that point no earlier view can
  * still arrive (Spark drops rows older than the watermark before they
  * reach the state function), so the emitted match equals what the
  * batch operator computes over the completed log.
  *
  * State per user is O(unsealed horizon) for the buffers (evicted as
  * the watermark advances, like [[SessionStream]]) plus ONE folded
  * latest-view cell retained as long as the user exists — retained by
  * design, because batch as-of attributes a purchase to a view
  * arbitrarily far back; bounding user cardinality is an upstream
  * concern (TTL-filter the view stream), not an eviction here. Users
  * with only the folded cell left hold no timeout, so they cost no
  * wakeups. Ties follow the batch operator exactly: view at the same
  * instant as the purchase counts; equal-instant views resolve to the
  * max event_id. */
object AsofStream {

  import Micros.{micros, tsFromMicros} // shared with SessionStream

  /** Latest view at-or-before `pUs` among the folded and buffered views;
    * (ts, id) max — the batch tiebreak. */
  private def bestView(s: AsofBuf, pUs: Long): Option[(Long, Long)] = {
    val cands = s.lastView.toList ++ s.views.filter(_._2 <= pUs)
    if (cands.isEmpty) None else Some(cands.maxBy { case (id, us) => (us, id) })
  }

  private def finalize(userId: Long, s: AsofBuf, wmUs: Long)
      : (List[AsofMatch], AsofBuf) = {
    val (ripe, pending) = s.purchases.partition(_._2 <= wmUs)
    val out = ripe.sortBy { case (id, us) => (us, id) }.map { case (pid, pUs) =>
      val v = bestView(s, pUs)
      AsofMatch(pid, userId, tsFromMicros(pUs), v.map(_._1),
                v.map { case (_, vUs) => (pUs - vUs) / 1000000L })
    }
    // views sealed by the watermark collapse into the single latest one
    val (sealedViews, liveViews) = s.views.partition(_._2 <= wmUs)
    val folded = (s.lastView.toList ++ sealedViews) match {
      case Nil => None
      case vs  => Some(vs.maxBy { case (id, us) => (us, id) })
    }
    (out, AsofBuf(pending, liveViews, folded))
  }

  private def step(userId: Long, events: Iterator[Event],
                   state: GroupState[AsofBuf]): Iterator[AsofMatch] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val s0 = state.getOption.getOrElse(AsofBuf(Nil, Nil, None))
    val s1 = events.foldLeft(s0) { (s, e) =>
      val pair = (e.event_id, micros(e.ts))
      e.event_type match {
        case "purchase" => s.copy(purchases = pair :: s.purchases)
        case "view"     => s.copy(views = pair :: s.views)
        case _          => s
      }
    }
    val (out, s2) = finalize(userId, s1, wmUs)
    if (s2.purchases.isEmpty && s2.views.isEmpty && s2.lastView.isEmpty) {
      state.remove()
    } else {
      state.update(s2)
      // wake when the watermark seals the oldest unsealed row; with only
      // the folded lastView left there is nothing to emit, so set NO
      // timeout — the state then sleeps without wakeups until the user's
      // next event. lastView itself is retained indefinitely by DESIGN:
      // batch as-of semantics attribute a purchase to a view arbitrarily
      // far back, so evicting it would break stream==batch equality.
      // Retention is therefore O(active users) for the folded cell plus
      // O(unsealed horizon) for the buffers; a deployment that wants
      // bounded user cardinality caps attribution with an upstream TTL
      // filter on views, not by evicting state here.
      (s2.purchases.map(_._2) ++ s2.views.map(_._2)) match {
        case Nil => () // only lastView: no pending emission, no wakeup
        case ts  => state.setTimeoutTimestamp(ts.min / 1000L + 1L)
      }
    }
    out.iterator
  }

  /** Continuous as-of matches from a watermarked stream of [[Event]]s
    * (only `view` and `purchase` rows are consumed). */
  def matches(events: Dataset[Event]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofBuf, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
