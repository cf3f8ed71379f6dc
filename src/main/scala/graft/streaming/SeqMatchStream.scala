package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.SequenceMatchPattern
import graft.functions.SequenceMatchPattern.{Adjacent, AnyRun, Exactly, Gap, Step}

/** Emitted once per user, in the micro-batch where the pattern first
  * matched (matching is monotone: events only append to the buffered
  * stream and feasibility never revokes, so `matched` is terminal). */
case class SeqMatchUpdate(user_id: Long, matched: Boolean, at: Timestamp)

/** The online feasible-set DP frontier plus the tie-group frontier —
  * everything [[SeqMatchStream]] persists per user:
  *
  *  - `ringUs`/`ringMask`/`ringFeas` — the last `maxOff` consumed
  *    events (timestamp µs, condition bitmask, per-step feasibility
  *    bitmask), the only history fixed-offset separators (adjacent /
  *    `.`-runs) and their gap/negation checks ever look back at;
  *  - `agg` — one running aggregate per `.*` step (any-feasible flag,
  *    latest or earliest feasible time), carrying the negation-reset
  *    discipline of the batch DP;
  *  - `tieUs`/`tieTie`/`tieMask` — the OPEN tie group: every consumed
  *    event at the maximum seen timestamp, kept replayable so a
  *    same-timestamp event arriving in a later batch still folds in
  *    (ts, tie) order (the [[FunnelStream]] boundary-tie treatment).
  *    The DP fields above are the state STRICTLY BEFORE `tieUs`.
  *
  * O(pattern) longs per user plus one tie group — never O(events). */
private[streaming] case class SeqMatchState(
    matched: Boolean,
    ringUs: Seq[Long], ringMask: Seq[Int], ringFeas: Seq[Long],
    agg: Seq[Long],
    tieUs: Long, tieTie: Seq[Long], tieMask: Seq[Int])

/** Incremental twin of the `sequence_match` pattern aggregate
  * ([[graft.functions.SequenceMatchPatternAgg]], o_a17b–e's SQL surface)
  * — the last parametric aggregate without a streaming form (r17
  * VERDICT #4). The batch aggregate buffers every condition-matching
  * event and runs a feasible-set DP at eval; here the SAME DP runs
  * forward-only, one event at a time in the (ts, tie) total order, so
  * the per-user state is the DP's frontier instead of the event log:
  *
  *  - feas(j, k) depends only on events strictly before j (fixed-offset
  *    steps read the event `off` back; `.*` steps read a running
  *    aggregate of earlier feasible times), so consuming events in
  *    order and keeping {last `maxOff` events' feasibility bitmasks +
  *    one running aggregate per `.*` step} reproduces the batch DP's
  *    truth table bit for bit — O(pattern), not O(events), per user.
  *  - `.*` negation resets ride along exactly: the batch pass clears
  *    the running aggregate when a forbidden event goes by and admits
  *    the event's own prev-step feasibility after the clear; the online
  *    consume does the same compute-clear-add dance per event.
  *
  * EXACT GRAMMAR SUBSET (stated, enforced loudly): every pattern the
  * batch aggregate accepts EXCEPT `.*` combined with `(?t==n)` — that
  * pair's DP aggregate is the set of ALL feasible times in the prefix
  * (corpus-sized, not O(1)); the batch aggregate remains the reference
  * for it. Fixed-offset `==` gaps stream fine (they read one ring slot).
  *
  * Ordering contract (the [[EventAggStream]] twins' in-order trade,
  * with the tie treatment the r16 windowed funnel fix introduced): each
  * batch's events must be at or past the previous batches' maximum
  * timestamp; equal-timestamp events may straddle any cut — the open
  * tie group is persisted un-consumed and re-folded with late siblings
  * in (ts, tie) order. An event STRICTLY behind the open tie group is
  * dropped and counted on the [[StreamGauges]] late-drop gauge; the
  * batch aggregate over the full log stays the exact reference.
  * Millisecond resolution (`Timestamp.getTime`-based µs); `(?t OP n)`
  * is in seconds, the aggregate's TIMESTAMP reading. */
object SeqMatchStream {

  /** Mutable working form of [[SeqMatchState]]'s DP half. */
  private[streaming] final class Dp(val K: Int, val maxOff: Int) {
    val ringUs = new ArrayBuffer[Long]()
    val ringMask = new ArrayBuffer[Int]()
    val ringFeas = new ArrayBuffer[Long]()
    var agg: Array[Long] = null
    var matched = false
  }

  private[streaming] def initAgg(steps: Vector[Step]): Array[Long] =
    steps.zipWithIndex.map {
      case (Step(_, gap, AnyRun, _), _) => gap match {
        case None => 0L
        case Some(Gap("<" | "<=", _)) => Long.MinValue
        case Some(Gap(">" | ">=", _)) => Long.MaxValue
        case Some(g) => throw new IllegalStateException(
          s"unstreamable gap op ${g.op} past the surface check")
      }
      case _ => 0L
    }.toArray

  private[streaming] def maxOffset(steps: Vector[Step]): Int =
    steps.drop(1).map(_.skip match {
      case Adjacent => 1
      case Exactly(m) => m + 1
      case AnyRun => 0
    }).foldLeft(0)(math.max)

  /** Consume ONE buffered event (mask != 0) in (ts, tie) order —
    * the online transliteration of [[SequenceMatchPattern.matches]]'
    * per-position work, byte-compared against it in SeqMatchStreamSpec. */
  private[streaming] def consume(dp: Dp, steps: Vector[Step],
                                 unitMicros: Long, us: Long,
                                 mask: Int): Unit = {
    val K = steps.length
    def condOk(c: Int): Boolean = (mask & (1 << c)) != 0
    def gapOk(g: Gap, from: Long): Boolean = {
      val d = us - from
      val v = g.value * unitMicros
      g.op match {
        case "<" => d < v
        case "<=" => d <= v
        case ">" => d > v
        case ">=" => d >= v
        case "==" => d == v
      }
    }
    var feas = 0L
    if (condOk(steps.head.cond)) feas |= 1L
    var k = 1
    while (k < K) {
      val st = steps(k)
      val fbit = st.neg.map(f => 1 << f).getOrElse(0)
      val ok = st.skip match {
        case Adjacent | Exactly(_) =>
          val off = st.skip match { case Exactly(m) => m + 1; case _ => 1 }
          val sz = dp.ringUs.size
          if (sz < off || !condOk(st.cond)) false
          else {
            val idx = sz - off
            var good = (dp.ringFeas(idx) & (1L << (k - 1))) != 0 &&
              st.gap.forall(g => gapOk(g, dp.ringUs(idx)))
            if (good && fbit != 0) {
              // forbidden events strictly between: ring slots idx+1..sz-1
              var j = idx + 1
              while (good && j < sz) {
                if ((dp.ringMask(j) & fbit) != 0) good = false
                j += 1
              }
            }
            good
          }
        case AnyRun =>
          val a = dp.agg(k)
          st.gap match {
            case None => a != 0L && condOk(st.cond)
            case Some(g @ Gap("<" | "<=", _)) =>
              a != Long.MinValue && condOk(st.cond) && gapOk(g, a)
            case Some(g @ Gap(">" | ">=", _)) =>
              a != Long.MaxValue && condOk(st.cond) && gapOk(g, a)
            case Some(g) => throw new IllegalStateException(
              s"unstreamable gap op ${g.op} past the surface check")
          }
      }
      if (ok) feas |= 1L << k
      k += 1
    }
    // the batch pass's per-position epilogue for `.*` aggregates:
    // compute (above) → clear on forbidden → add own prev-step feasibility
    k = 1
    while (k < K) {
      val st = steps(k)
      if (st.skip == AnyRun) {
        val fbit = st.neg.map(f => 1 << f).getOrElse(0)
        if (fbit != 0 && (mask & fbit) != 0) dp.agg(k) = st.gap match {
          case None => 0L
          case Some(Gap("<" | "<=", _)) => Long.MinValue
          case _ => Long.MaxValue
        }
        if ((feas & (1L << (k - 1))) != 0) st.gap match {
          case None => dp.agg(k) = 1L
          case Some(Gap("<" | "<=", _)) =>
            dp.agg(k) = math.max(dp.agg(k), us)
          case _ => dp.agg(k) = math.min(dp.agg(k), us)
        }
      }
      k += 1
    }
    if (dp.maxOff > 0) {
      dp.ringUs += us; dp.ringMask += mask; dp.ringFeas += feas
      if (dp.ringUs.size > dp.maxOff) {
        dp.ringUs.remove(0); dp.ringMask.remove(0); dp.ringFeas.remove(0)
      }
    }
    if ((feas & (1L << (K - 1))) != 0) dp.matched = true
  }

  private def load(st: SeqMatchState, steps: Vector[Step]): Dp = {
    val dp = new Dp(steps.length, maxOffset(steps))
    dp.ringUs ++= st.ringUs; dp.ringMask ++= st.ringMask
    dp.ringFeas ++= st.ringFeas
    dp.agg = if (st.agg.nonEmpty) st.agg.toArray else initAgg(steps)
    dp.matched = st.matched
    dp
  }

  private def emptyState(steps: Vector[Step]): SeqMatchState =
    SeqMatchState(matched = false, Nil, Nil, Nil,
      initAgg(steps).toSeq, Long.MinValue, Nil, Nil)

  private def seqMatchFn(steps: Vector[Step],
      conds: Seq[TaggedEvent => Boolean], unitMicros: Long,
      idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator,
      lateAcc: org.apache.spark.util.LongAccumulator)(
      userId: Long, events: Iterator[TaggedEvent],
      state: GroupState[SeqMatchState]): Iterator[SeqMatchUpdate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st0 = state.getOption.getOrElse(emptyState(steps))
    val evs = events.toSeq
    if (st0.matched) {
      // terminal: the store keeps only the flag (shrunk at match time)
      if (idleTimeoutMs > 0 && state.exists && evs.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(evs.map(_.ts.getTime).max,
            state.getCurrentWatermarkMs()) + idleTimeoutMs)
      return Iterator.empty
    }
    // buffered view: condition bitmask per event, mask-0 events are
    // invisible (the aggregate never buffers them — neither chain steps
    // nor negation violations, since (?!N) names a listed condition)
    val tagged = evs.flatMap { e =>
      var m = 0
      var c = 0
      while (c < conds.size) {
        if (conds(c)(e)) m |= 1 << c
        c += 1
      }
      if (m != 0) Some((e.ts.getTime * 1000L, e.tie, m)) else None
    }
    val (keep, late) = tagged.partition(_._1 >= st0.tieUs)
    StreamGauges.noteLate(lateAcc, late.size)
    if (keep.isEmpty) {
      if (idleTimeoutMs > 0 && state.exists && evs.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(evs.map(_.ts.getTime).max,
            state.getCurrentWatermarkMs()) + idleTimeoutMs)
      return Iterator.empty
    }
    // re-open the persisted tie group and fold everything in (us, tie)
    // order; events strictly before the new maximum close into the DP
    // frontier, the new maximum's tie group stays replayable
    val carried = st0.tieTie.indices.map(i =>
      (st0.tieUs, st0.tieTie(i), st0.tieMask(i)))
    val all = (carried ++ keep).sortBy(t => (t._1, t._2))
    StreamGauges.noteGroupEvents(peakAcc, all.size)
    val newMax = all.last._1
    val dp = load(st0, steps)
    all.foreach { case (us, _, m) =>
      if (us < newMax) consume(dp, steps, unitMicros, us, m)
    }
    val pre = (dp.ringUs.toSeq, dp.ringMask.toSeq, dp.ringFeas.toSeq,
      dp.agg.toSeq)
    val group = all.filter(_._1 == newMax)
    group.foreach { case (us, _, m) => consume(dp, steps, unitMicros, us, m) }
    val st1 =
      if (dp.matched) // terminal: shrink to the flag
        SeqMatchState(matched = true, Nil, Nil, Nil, Nil, newMax, Nil, Nil)
      else SeqMatchState(matched = false, pre._1, pre._2, pre._3, pre._4,
        newMax, group.map(_._2), group.map(_._3))
    state.update(st1)
    if (idleTimeoutMs > 0 && state.exists)
      state.setTimeoutTimestamp(
        math.max(evs.map(_.ts.getTime).max, state.getCurrentWatermarkMs()) +
          idleTimeoutMs)
    if (dp.matched)
      Iterator.single(SeqMatchUpdate(userId, matched = true,
        new Timestamp(evs.map(_.ts.getTime).max)))
    else Iterator.empty
  }

  /** Update feed for the `sequence_match` aggregate's streaming twin.
    * `pattern` is the aggregate's grammar verbatim
    * ([[SequenceMatchPattern.parse]] — same parser, same loud errors);
    * conditions are per-event predicates. Works on streaming or batch
    * Datasets; `idleTimeoutMs > 0` adds event-time eviction. */
  def seqMatchUpdates(ds: Dataset[TaggedEvent], pattern: String,
                      conds: Seq[TaggedEvent => Boolean],
                      idleTimeoutMs: Long = 0L): Dataset[SeqMatchUpdate] = {
    require(conds.nonEmpty && conds.size <= 30,
      "sequence_match needs 1-30 conditions (bitmask bound)")
    val steps = SequenceMatchPattern.parse(pattern, conds.size)
    require(steps.size <= 62,
      "streaming sequence_match supports at most 62 pattern steps " +
        "(feasibility bitmask bound)")
    require(!steps.exists(s => s.skip == AnyRun && s.gap.exists(_.op == "==")),
      s"streaming sequence_match pattern '$pattern': '.*' combined with " +
        "'(?t==n)' needs the full feasible-time set — corpus-sized, not " +
        "O(1) state; use the batch sequence_match aggregate for this " +
        "pattern (fixed-offset '==' gaps stream fine)")
    val unitMicros = 1000000L // TaggedEvent.ts is TIMESTAMP: (?t n) in seconds
    require(steps.forall(_.gap.forall(_.value <= Long.MaxValue / unitMicros)),
      s"sequence_match pattern '$pattern': a time bound exceeds the " +
        "representable range (would overflow at microsecond scaling)")
    val (peakAcc, lateAcc) = StreamGauges.acquire()
    implicit val enc = Encoders.product[SeqMatchUpdate]
    implicit val stEnc = Encoders.product[SeqMatchState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        seqMatchFn(steps, conds, unitMicros, idleTimeoutMs, peakAcc, lateAcc))
  }
}
