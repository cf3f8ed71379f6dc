package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(session_id: String, user_id: String,
                        timestamp: Timestamp, is_ended: Boolean)

case class SessionSummary(session_id: String, user_id: String,
                          start_ts: Timestamp, end_ts: Timestamp,
                          n_events: Long, ended_by_flag: Boolean)

private[streaming] case class SessionState(user_id: String, start: Long, last: Long, n: Long)

/** Flag-driven sessionization (SURVEY §7 hard part 5): the reference
  * marks session end with `session_events.is_ended` (migrations/007:18),
  * not by inactivity gap, so the built-in `session_window` can't express
  * it — this is the custom-state case for flatMapGroupsWithState.
  *
  * State per session_id is O(1) (start/last/count), emitted when the
  * is_ended flag arrives or when the session is abandoned — bounded state
  * at any scale. Abandonment is EVENT-time: a session times out when the
  * stream's watermark passes `last event + timeoutMs`, which is
  * deterministic, replayable, and keeps the engine quiescent between
  * batches. (A processing-time timeout would also force the engine into a
  * permanent batch-scheduling loop just to poll the wall clock — with a
  * 1-second trigger that is one no-op stateful batch per second forever.)
  * Works in batch mode too (each group processed once, no timeout path).
  */
object Sessions {

  private[streaming] def summarize(events: Iterator[SessionEvent],
                state: SessionState): (SessionState, Option[SessionSummary]) = {
    var st = state
    var ended = false
    events.foreach { e =>
      val t = e.timestamp.getTime
      st = SessionState(e.user_id,
        if (st.n == 0) t else math.min(st.start, t),
        math.max(st.last, t), st.n + 1)
      ended ||= e.is_ended
    }
    if (ended)
      (st, Some(SessionSummary("", st.user_id, new Timestamp(st.start),
        new Timestamp(st.last), st.n, ended_by_flag = true)))
    else (st, None)
  }

  private def flatMapFn(timeoutMs: Long)(
      sessionId: String, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionSummary] = {
    if (state.hasTimedOut) {
      // Abandoned session: emit what we have, clear state.
      val st = state.get
      state.remove()
      Iterator.single(SessionSummary(sessionId, st.user_id,
        new Timestamp(st.start), new Timestamp(st.last), st.n,
        ended_by_flag = false))
    } else {
      val st0 = state.getOption.getOrElse(SessionState("", Long.MaxValue, 0L, 0L))
      val (st, out) = summarize(events, st0)
      out match {
        case Some(summary) =>
          state.remove()
          Iterator.single(summary.copy(session_id = sessionId))
        case None =>
          state.update(st)
          // abandoned when the watermark passes last-seen + timeout.
          // Clamped to the CURRENT watermark (the FunnelStream guard):
          // late-event admission uses the previous batch's watermark, so
          // a watermark jump larger than the timeout would otherwise ask
          // for a timestamp already below the eviction watermark and
          // crash the query with IllegalArgumentException
          if (timeoutMs > 0) state.setTimeoutTimestamp(
            math.max(st.last, state.getCurrentWatermarkMs()) + timeoutMs)
          Iterator.empty
      }
    }
  }

  /** is_ended-driven sessions; `timeoutMs` bounds abandoned-session state
    * via an event-time timeout (streaming input must carry a watermark on
    * `timestamp`; pass 0 in batch — no timeout path). */
  def flagSessions(ds: Dataset[SessionEvent],
                   timeoutMs: Long = 0L): Dataset[SessionSummary] = {
    implicit val enc = Encoders.product[SessionSummary]
    implicit val stEnc = Encoders.product[SessionState]
    val timeout: GroupStateTimeout =
      if (timeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.session_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(flatMapFn(timeoutMs))
  }
}
