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

/** Incremental `window_funnel` state: `best(k)` = max chain start among
  * level-(k+1) chains over CONSUMED events, plus the tie-group frontier —
  * `lastTs` (the latest consumed event time) and `prevBest` (the best
  * array as it stood BEFORE any event at `lastTs` applied). The frontier
  * is what keeps the strict-before tie rule exact when a micro-batch cut
  * splits an equal-timestamp group: a same-`lastTs` event arriving in a
  * LATER batch chains against `prevBest` (state strictly before its
  * time), never against a raise its own tie group produced. */
private[streaming] case class WindowedFunnelState(
    best: Seq[Long], lastTs: Long, prevBest: Seq[Long], emitted: Int)

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

  private def flatMapFn(stages: Seq[String], idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator)(
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
    StreamGauges.noteGroupEvents(peakAcc, evs.size)
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
    val (peakAcc, _) = StreamGauges.acquire()
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        flatMapFn(stages, idleTimeoutMs, peakAcc))
  }

  // ---- WINDOWED streaming funnel: the `window_funnel` SQL surface's
  // streaming twin ----------------------------------------------------

  /** The SQL aggregate's max-chain-start dominance pass
    * ([[graft.functions.WindowFunnel.level]]), run INCREMENTALLY:
    * best(k) = the maximum chain start among level-k chains seen so
    * far — one long per stage, O(1) per event. Equal-timestamp events
    * apply against the state STRICTLY BEFORE their timestamp (the
    * strict-before tie rule the SQL aggregate pins) — within a batch by
    * grouping ties in the sorted pass, and ACROSS a micro-batch cut
    * through the persisted tie-group frontier ([[WindowedFunnelState]]
    * `lastTs`/`prevBest`): a stage-k event whose timestamp equals the
    * previous batch's high mark chains against `prevBest`, so it can
    * neither ride a same-timestamp raise from that batch nor lose a
    * strictly-earlier one. In-order streams therefore reproduce the
    * batch aggregate exactly, tie-split cuts included. A LATE event
    * (older than `lastTs`) may only open a stage-1 chain — chaining it
    * against `best` would consult raises from its FUTURE (and a
    * negative gap passes `t - start <= window` vacuously), turning the
    * documented under-count trade into an over-count. Millisecond
    * resolution (`Timestamp.getTime`). */
  private[streaming] def advanceWindowed(stages: Seq[String], windowMs: Long,
      st: WindowedFunnelState, events: Seq[FunnelEvent]): WindowedFunnelState = {
    val MIN = Long.MinValue
    val best = st.best.toArray
    var prevBest = st.prevBest.toArray
    var lastTs = st.lastTs
    val sorted = events.sortBy(_.ts.getTime).toIndexedSeq
    var i = 0
    while (i < sorted.size) {
      val t = sorted(i).ts.getTime
      val late = t < lastTs
      if (t > lastTs) { prevBest = best.clone(); lastTs = t }
      // t == lastTs after the advance, so prevBest IS the strictly-before
      // state for this tie group — freshly cloned in-batch, restored from
      // the persisted frontier when the group straddles a batch cut
      val cand = Array.fill(stages.size)(MIN)
      var j = i
      while (j < sorted.size && sorted(j).ts.getTime == t) {
        var s = stages.indexOf(sorted(j).event_type)
        while (s >= 0) { // an event type may appear at multiple stages
          if (s == 0) { if (t > cand(0)) cand(0) = t }
          else if (!late && prevBest(s - 1) != MIN &&
                   t - prevBest(s - 1) <= windowMs &&
                   prevBest(s - 1) > cand(s)) cand(s) = prevBest(s - 1)
          s = stages.indexOf(sorted(j).event_type, s + 1)
        }
        j += 1
      }
      var s = 0
      while (s < stages.size) {
        if (cand(s) > best(s)) best(s) = cand(s)
        s += 1
      }
      i = j
    }
    WindowedFunnelState(best.toSeq, lastTs, prevBest.toSeq, st.emitted)
  }

  private def flatMapWindowedFn(stages: Seq[String], windowMs: Long,
      idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator)(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[WindowedFunnelState]): Iterator[FunnelUpdate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st0 = state.getOption.getOrElse(
      WindowedFunnelState(Seq.fill(stages.size)(Long.MinValue),
        Long.MinValue, Seq.fill(stages.size)(Long.MinValue), 0))
    val evs = events.toSeq
    StreamGauges.noteGroupEvents(peakAcc, evs.size)
    val st1 = advanceWindowed(stages, windowMs, st0, evs)
    val lvl = st1.best.takeWhile(_ != Long.MinValue).size
    val out =
      if (lvl > st1.emitted) {
        state.update(st1.copy(emitted = lvl))
        // `at` = when we learned it: the batch's event-time high mark
        Iterator.single(FunnelUpdate(userId, lvl,
          new Timestamp(evs.map(_.ts.getTime).max)))
      } else if (lvl > 0) {
        state.update(st1)
        Iterator.empty
      } else Iterator.empty // no chain start yet: store nothing
    if (idleTimeoutMs > 0 && state.exists)
      state.setTimeoutTimestamp(
        math.max(evs.map(_.ts.getTime).max, state.getCurrentWatermarkMs()) +
          idleTimeoutMs)
    out
  }

  /** Incremental WINDOWED `windowFunnel` — the streaming twin of the
    * `window_funnel` SQL aggregate (o_a15f), closing the loop between
    * the SQL surface and the streaming half: the per-user windowed
    * funnel level kept current per micro-batch, with
    * [[levelDistribution]] reshaping the update feed into o_a15f's
    * exact result schema. Same [[FunnelUpdate]] contract as
    * [[funnelUpdates]]; state is stages.size longs per user. Spec-pinned
    * (FunnelStreamSpec): streamed == the batch SQL aggregate across
    * random micro-batch cuts AND across a checkpoint restart. */
  def windowedFunnelUpdates(ds: Dataset[FunnelEvent], stages: Seq[String],
                            windowMs: Long,
                            idleTimeoutMs: Long = 0L): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowMs > 0, "windowed funnel needs a positive window " +
      "(the window_funnel convention); use funnelUpdates for unbounded")
    implicit val enc = Encoders.product[FunnelUpdate]
    implicit val stEnc = Encoders.product[WindowedFunnelState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val (peakAcc, _) = StreamGauges.acquire()
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        flatMapWindowedFn(stages, windowMs, idleTimeoutMs, peakAcc))
  }

  /** o_a15f's result shape from an update feed: levels only ever
    * increase per user, so current level = max emitted; counted per
    * level. Run over the sink table the update stream writes. */
  def levelDistribution(updates: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    updates.groupBy("user_id")
      .agg(max("funnel_level").as("funnel_level"))
      .groupBy("funnel_level")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_level")
  }
}
