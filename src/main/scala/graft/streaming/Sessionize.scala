package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Stateful streaming sessionization — the `mapGroupsWithState`
  * surface (custom per-key state across micro-batches), twin of the
  * batch gap-sessionizer (`SparkEntry.q_sessionize`: a new session
  * starts when the gap to the previous event exceeds `gapSec`,
  * ordered by (ts, event_id) per user).
  *
  * Per-user state is three longs — last event time, session count,
  * event count — so state size is O(users), independent of event
  * volume, and every update emits the user's running totals
  * (OutputMode.Update). Within a micro-batch, arrival order is
  * arbitrary and the group iterator is sorted by (ts, event_id),
  * matching the batch window spec exactly.
  *
  * Cross-batch contract: a user's events must not regress in event
  * time across batch boundaries (the same per-key monotonicity every
  * running-state sessionizer needs) — late data beyond a batch
  * boundary belongs upstream in watermark buffering or in the staging
  * path's keep-latest merge ([[StreamingIngest.stagedCorpus]]).
  * StreamingSpec pins batch-split invariance: chronological chunking
  * of one stream yields final counts identical to the batch window
  * plan over the union.
  */
object Sessionize {

  /** Event-time seconds keep the gap arithmetic identical to the
    * batch plan's `unix_timestamp` difference.
    */
  case class SessionEvent(user_id: Long, event_id: Long, tsSec: Long)
  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class SessionCounts(user_id: Long, n_sessions: Long, n_events: Long)

  def sessionize(
      events: Dataset[SessionEvent],
      gapSec: Long = 1800L): Dataset[SessionCounts] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionCounts](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val isNew = st.lastTs == Long.MinValue || e.tsSec - st.lastTs > gapSec
            st = SessionState(e.tsSec,
              st.nSessions + (if (isNew) 1L else 0L),
              st.nEvents + 1L)
          }
          state.update(st)
          SessionCounts(uid, st.nSessions, st.nEvents)
      }
  }
}
