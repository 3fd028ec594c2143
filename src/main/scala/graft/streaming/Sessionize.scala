package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the `flatMapGroupsWithState`
  * surface (custom per-key state across micro-batches), twin of the
  * batch gap-sessionizer (`SparkEntry.q_sessionize`: a new session
  * starts when the gap to the previous event exceeds `gapSec`,
  * ordered by (ts, event_id) per user).
  *
  * Per-user state is four longs — last event time, session count,
  * event count, late count — so state size is O(users), independent
  * of event volume, and every batch that touches a user emits the
  * user's running totals (OutputMode.Update). Within a micro-batch,
  * arrival order is arbitrary and the group iterator is sorted by
  * (ts, event_id), matching the batch window spec exactly.
  *
  * Late-data policy (pinned, deterministic): an event whose time
  * REGRESSES the user's state clock — `tsSec < lastTs` after the
  * in-batch sort — is DROPPED and counted in `n_late`, never folded
  * into the gap arithmetic. Rationale: folding a regressed event
  * would require session re-segmentation (unbounded state: the whole
  * event history), and silently folding it forward would make
  * `n_sessions` depend on delivery batching. Dropping keeps the fold
  * split-invariant: for an in-order stream `n_late` = 0 and the
  * result equals the batch window plan over the union, however the
  * stream is chunked (StreamingSpec pins both: batch-split invariance
  * and the cross-boundary late event). Equal timestamps do not count
  * as late (gap 0 — same session), so intra-batch ties fold
  * identically to the batch plan. Upstream watermark buffering
  * (or the staging path's keep-latest merge,
  * [[StreamingIngest.stagedCorpus]]) remains the place to REORDER
  * data; this operator's job is to make whatever still arrives out
  * of order visible and harmless rather than silently corrupting
  * counts.
  */
object Sessionize {

  /** Event-time seconds keep the gap arithmetic identical to the
    * batch plan's `unix_timestamp` difference.
    */
  case class SessionEvent(user_id: Long, event_id: Long, tsSec: Long)
  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long, nLate: Long)
  case class SessionCounts(user_id: Long, n_sessions: Long, n_events: Long, n_late: Long)

  def sessionize(
      events: Dataset[SessionEvent],
      gapSec: Long = 1800L): Dataset[SessionCounts] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionCounts](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L, 0L))
          sorted.foreach { e =>
            if (e.tsSec < st.lastTs) // regressed clock: late, dropped
              st = st.copy(nLate = st.nLate + 1L)
            else {
              val isNew = st.lastTs == Long.MinValue || e.tsSec - st.lastTs > gapSec
              st = SessionState(e.tsSec,
                st.nSessions + (if (isNew) 1L else 0L),
                st.nEvents + 1L, st.nLate)
            }
          }
          state.update(st)
          Iterator.single(SessionCounts(uid, st.nSessions, st.nEvents, st.nLate))
      }
  }
}
