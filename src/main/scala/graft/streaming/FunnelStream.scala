package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

/** Emitted in each micro-batch where a user's funnel level INCREASED,
  * carrying the new level — a multi-level jump inside one batch collapses
  * to a single row with the final level (FunnelStreamSpec pins this).
  * Latest row per user = current level. */
case class FunnelUpdate(user_id: Long, funnel_level: Int, at: Timestamp)

private[streaming] case class FunnelChainState(mins: Seq[Long], emitted: Int)

/** Incremental `windowFunnel` (O-A15's streaming form): the per-user
  * funnel level maintained across micro-batches with
  * `flatMapGroupsWithState` — the analytics the batch operator computes
  * over history, kept current as events arrive (the piece a
  * query-at-rest engine cannot express; SURVEY §2.9's stateful family).
  *
  * Semantics: the UNBOUNDED-window EXISTS chain of
  * [[graft.operators.EventAnalytics.funnelLevels]] (window = None). That
  * variant is chosen deliberately: its reachability state collapses to
  * ONE timestamp per stage — mins(k) = the minimum stage-k timestamp that
  * extends a chain — by the same dominance argument as the batch
  * operator (extending a chain only cares about how EARLY the previous
  * stage completed). K longs per user, O(1) per event, at any history
  * length.
  *
  * Ordering: events are applied in (ts) order WITHIN each group batch
  * (sorted here), so intra-batch disorder is handled; an event arriving
  * in a LATER batch with an earlier timestamp than already-consumed
  * history can under-count (the stage-k events it would have unlocked are
  * forgotten) — the standard incremental-funnel trade. The batch operator
  * over the full log remains the exact reference; FunnelStreamSpec pins
  * agreement on in-order streams.
  *
  * State boundedness: entries exist only for users with a chain START (a
  * drive-by user who never hits stage 1 stores nothing), and
  * `idleTimeoutMs` adds event-time eviction of stale chains for unbounded
  * user populations.
  */
object FunnelStream {

  private[streaming] def advance(stages: Seq[String], st: FunnelChainState,
                                 events: Seq[FunnelEvent]): FunnelChainState = {
    val mins = st.mins.toArray
    events.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      var j = stages.indexOf(e.event_type)
      while (j >= 0) { // an event type may appear at multiple stages
        if (j == 0) mins(0) = math.min(mins(0), t)
        else if (mins(j - 1) < t) mins(j) = math.min(mins(j), t)
        j = stages.indexOf(e.event_type, j + 1)
      }
    }
    FunnelChainState(mins.toSeq, st.emitted)
  }

  private[streaming] def level(mins: Seq[Long]): Int =
    mins.takeWhile(_ != Long.MaxValue).size

  private def flatMapFn(stages: Seq[String], idleTimeoutMs: Long)(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelChainState]): Iterator[FunnelUpdate] = {
    if (state.hasTimedOut) {
      // idle user evicted: a funnel this stale is reported history, not
      // live state; if the user returns, the chain restarts from scratch
      state.remove()
      return Iterator.empty
    }
    val st0 = state.getOption.getOrElse(
      FunnelChainState(Seq.fill(stages.size)(Long.MaxValue), 0))
    val evs = events.toSeq
    val st1 = advance(stages, st0, evs)
    val lvl = level(st1.mins)
    val out =
      if (lvl > st1.emitted) {
        // the level-lvl chain completed at the stage-(lvl-1) min timestamp
        state.update(st1.copy(emitted = lvl))
        Iterator.single(FunnelUpdate(userId, lvl, new Timestamp(st1.mins(lvl - 1))))
      } else if (lvl > 0) {
        state.update(st1)
        Iterator.empty
      } else {
        // no stage-1 event yet ⇒ all-MaxValue state: nothing worth
        // remembering (later stages can't chain without a start), so
        // don't create a store entry for every drive-by user
        Iterator.empty
      }
    if (idleTimeoutMs > 0 && state.exists)
      state.setTimeoutTimestamp(
        math.max(evs.map(_.ts.getTime).max, state.getCurrentWatermarkMs()) +
          idleTimeoutMs)
    out
  }

  /** Update feed per the [[FunnelUpdate]] contract; works on a streaming
    * OR batch Dataset (batch: each group visited once, final level
    * emitted). `idleTimeoutMs > 0` bounds the state store on unbounded
    * user populations by evicting users idle past the watermark horizon —
    * the streaming input must then carry a watermark on `ts`; pass 0 to
    * keep every user's chain forever (bounded populations / batch). */
  def funnelUpdates(ds: Dataset[FunnelEvent], stages: Seq[String],
                    idleTimeoutMs: Long = 0L): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    implicit val enc = Encoders.product[FunnelUpdate]
    implicit val stEnc = Encoders.product[FunnelChainState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        flatMapFn(stages, idleTimeoutMs))
  }
}
