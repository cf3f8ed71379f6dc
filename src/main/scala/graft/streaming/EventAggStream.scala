package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event with an explicit tie-break — the engine's determinism
  * convention for row-order semantics (the `sequence_count` aggregate's
  * (ts, tie) total order; the catalog uses event_id). */
case class TaggedEvent(user_id: Long, event_type: String, ts: Timestamp,
                       tie: Long)

/** Emitted in each micro-batch where a user's retention flags CHANGED;
  * `flags` follows the `retention` SQL aggregate's contract exactly
  * (r(0) = cond1 seen; r(i) = cond1 AND cond(i+1) seen). Latest row per
  * user = current flags (each flag is monotone non-decreasing). */
case class RetentionUpdate(user_id: Long, flags: Seq[Int], at: Timestamp)

/** Emitted in each micro-batch where a user's greedy pair count GREW;
  * latest row per user = current count. */
case class SeqCountUpdate(user_id: Long, seq_count: Long, at: Timestamp)

private[streaming] case class RetentionState(mask: Int)

/** The `sequence_count` lag-collapse frontier: the (us, tie) of the last
  * CONSUMED condition-matching event, whether it armed the automaton,
  * and the fired count — O(1) per user at any history length (the
  * collapse is a left fold; this IS its entire fold state). */
private[streaming] case class SeqCountState(
    lastUs: Long, lastTie: Long, lastIsA: Boolean, count: Long)

/** Incremental twins of the parametric SQL aggregates `retention` and
  * `sequence_count` (o_a16b / o_a18d·e's streaming forms), completing
  * the batch↔stream loop [[FunnelStream]] opened for `window_funnel`:
  * the same per-user analytics kept current per micro-batch with
  * `flatMapGroupsWithState`.
  *
  *  - retention: state is ONE Int bitmask (the aggregate's own buffer),
  *    and the bitmask OR is commutative and idempotent, so the streamed
  *    final flags equal the batch aggregate on ANY arrival order and
  *    ANY micro-batch cut — no in-order caveat at all (the one
  *    parametric twin with no incremental trade).
  *  - sequence_count: the greedy non-overlapping automaton collapses to
  *    a left fold over the (ts, tie) order with state (prevArmed,
  *    prevTime) — persisted here as the frontier, so in-order streams
  *    (each batch at or past the frontier) reproduce the batch
  *    aggregate EXACTLY across any cuts, ties included (equal
  *    timestamps order by the explicit tie, and a tie group split
  *    across batches still folds in tie order because the frontier
  *    carries the tie). A LATE event — strictly behind the consumed
  *    frontier — is DROPPED: it would rewrite the "immediately
  *    preceding" relation of already-consumed events, which no O(1)
  *    state can replay (the [[FunnelStream]] trade, stated; the batch
  *    aggregate over the full log stays the exact reference).
  *
  * Millisecond resolution (`Timestamp.getTime`-based micros), matching
  * [[FunnelStream]]. State boundedness: retention stores nothing until
  * a condition matches; sequence_count stores nothing for users whose
  * matching history is unarmed with count 0 (an unarmed frontier is
  * fold-equivalent to the init state); `idleTimeoutMs > 0` adds
  * event-time eviction like the funnel.
  */
object EventAggStream {

  /** The `retention` aggregate's eval contract over a bitmask. */
  private[streaming] def retentionFlags(mask: Int, n: Int): Seq[Int] = {
    val c1 = (mask & 1) != 0
    (0 until n).map { i =>
      if (i == 0) { if (c1) 1 else 0 }
      else if (c1 && (mask & (1 << i)) != 0) 1 else 0
    }
  }

  private def retentionFn(conds: Seq[FunnelEvent => Boolean],
      idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator)(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[RetentionState]): Iterator[RetentionUpdate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st0 = state.getOption.getOrElse(RetentionState(0))
    val evs = events.toSeq
    StreamGauges.noteGroupEvents(peakAcc, evs.size)
    var mask = st0.mask
    evs.foreach { e =>
      var k = 0
      while (k < conds.size) {
        if ((mask & (1 << k)) == 0 && conds(k)(e)) mask |= 1 << k
        k += 1
      }
    }
    val out =
      if (mask != st0.mask) {
        state.update(RetentionState(mask))
        val before = retentionFlags(st0.mask, conds.size)
        val after = retentionFlags(mask, conds.size)
        // emit only when the VISIBLE flags move (a cond(i>0) bit without
        // cond1 changes the mask but not the contract's flags)
        if (after != before)
          Iterator.single(RetentionUpdate(userId, after,
            new Timestamp(evs.map(_.ts.getTime).max)))
        else Iterator.empty
      } else Iterator.empty // unchanged; a zero mask was never stored
    if (idleTimeoutMs > 0 && state.exists)
      state.setTimeoutTimestamp(
        math.max(evs.map(_.ts.getTime).max, state.getCurrentWatermarkMs()) +
          idleTimeoutMs)
    out
  }

  /** Update feed for the `retention` SQL aggregate's streaming twin;
    * conditions are per-event predicates (time enters through them, the
    * CH idiom). Works on streaming or batch Datasets. */
  def retentionUpdates(ds: Dataset[FunnelEvent],
                       conds: Seq[FunnelEvent => Boolean],
                       idleTimeoutMs: Long = 0L): Dataset[RetentionUpdate] = {
    require(conds.nonEmpty && conds.size <= 32,
      "retention needs 1-32 conditions (bitmask bound)")
    implicit val enc = Encoders.product[RetentionUpdate]
    implicit val stEnc = Encoders.product[RetentionState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val (peakAcc, _) = StreamGauges.acquire()
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        retentionFn(conds, idleTimeoutMs, peakAcc))
  }

  private def seqCountFn(first: TaggedEvent => Boolean,
      second: TaggedEvent => Boolean, windowMicros: Long, idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator,
      lateAcc: org.apache.spark.util.LongAccumulator)(
      userId: Long, events: Iterator[TaggedEvent],
      state: GroupState[SeqCountState]): Iterator[SeqCountUpdate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st0 = state.getOption.getOrElse(
      SeqCountState(Long.MinValue, Long.MinValue, lastIsA = false, 0L))
    val evs = events.toSeq
    StreamGauges.noteGroupEvents(peakAcc, evs.size)
    var lastUs = st0.lastUs
    var lastTie = st0.lastTie
    var lastIsA = st0.lastIsA
    var count = st0.count
    // matching events only (the aggregate buffers exactly these; both
    // conditions ⇒ first: arms, never fires), in (us, tie) order,
    // late-dropped behind the consumed frontier — each drop counted on
    // the StreamGauges late gauge (the stated trade, made observable;
    // only condition-MATCHING events count, mirroring what the batch
    // aggregate would have buffered)
    val (keep, late) = evs.iterator
      .map(e => (e.ts.getTime * 1000L, e.tie, e))
      .filter { case (_, _, e) => first(e) || second(e) }
      .toSeq.partition { case (us, tie, _) =>
        us > st0.lastUs || (us == st0.lastUs && tie > st0.lastTie) }
    StreamGauges.noteLate(lateAcc, late.size)
    keep.sortBy(t => (t._1, t._2))
      .foreach { case (us, tie, e) =>
        val a = first(e)
        if (!a && lastIsA &&
            (windowMicros == 0 || us - lastUs <= windowMicros)) count += 1
        lastIsA = a; lastUs = us; lastTie = tie
      }
    // store when the fold state moved AND is worth keeping: an unarmed
    // zero-count frontier is fold-equivalent to the init state (prevA
    // false either way), so drive-by users create no store entry
    val changed = count != st0.count || lastUs != st0.lastUs ||
      lastTie != st0.lastTie || lastIsA != st0.lastIsA
    if (changed && (state.exists || count > 0 || lastIsA))
      state.update(SeqCountState(lastUs, lastTie, lastIsA, count))
    val out =
      if (count > st0.count)
        Iterator.single(SeqCountUpdate(userId, count,
          new Timestamp(evs.map(_.ts.getTime).max)))
      else Iterator.empty
    if (idleTimeoutMs > 0 && state.exists)
      state.setTimeoutTimestamp(
        math.max(evs.map(_.ts.getTime).max, state.getCurrentWatermarkMs()) +
          idleTimeoutMs)
    out
  }

  /** Update feed for the `sequence_count` SQL aggregate's streaming
    * twin — greedy non-overlapping first→second pairs, optionally
    * gap-bounded (`windowMicros = 0` unbounded, the aggregate's
    * convention). */
  def seqCountUpdates(ds: Dataset[TaggedEvent],
                      first: TaggedEvent => Boolean,
                      second: TaggedEvent => Boolean,
                      windowMicros: Long = 0L,
                      idleTimeoutMs: Long = 0L): Dataset[SeqCountUpdate] = {
    require(windowMicros >= 0, "windowMicros must be >= 0 (0 = unbounded)")
    implicit val enc = Encoders.product[SeqCountUpdate]
    implicit val stEnc = Encoders.product[SeqCountState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val (peakAcc, lateAcc) = StreamGauges.acquire()
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        seqCountFn(first, second, windowMicros, idleTimeoutMs,
          peakAcc, lateAcc))
  }
}
