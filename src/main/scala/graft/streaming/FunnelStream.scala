package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

/** Emitted whenever a user's funnel level INCREASES (Update-style feed of
  * `funnelLevels` — one row per advance, latest row per user = current). */
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
  * forgotten) — the standard incremental-funnel trade, bounded in
  * practice by the source watermark. The batch operator over the full
  * log remains the exact reference; FunnelStreamSpec pins agreement on
  * in-order streams.
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

  private def flatMapFn(stages: Seq[String])(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelChainState]): Iterator[FunnelUpdate] = {
    val st0 = state.getOption.getOrElse(
      FunnelChainState(Seq.fill(stages.size)(Long.MaxValue), 0))
    val evs = events.toSeq
    val st1 = advance(stages, st0, evs)
    val lvl = level(st1.mins)
    if (lvl > st1.emitted) {
      // the level-lvl chain completed at the stage-(lvl-1) min timestamp
      state.update(st1.copy(emitted = lvl))
      Iterator.single(FunnelUpdate(userId, lvl, new Timestamp(st1.mins(lvl - 1))))
    } else {
      state.update(st1)
      Iterator.empty
    }
  }

  /** One update row per (user, level advance); works on a streaming OR
    * batch Dataset (batch: each group visited once, final level emitted). */
  def funnelUpdates(ds: Dataset[FunnelEvent],
                    stages: Seq[String]): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    implicit val enc = Encoders.product[FunnelUpdate]
    implicit val stEnc = Encoders.product[FunnelChainState]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        flatMapFn(stages))
  }
}
