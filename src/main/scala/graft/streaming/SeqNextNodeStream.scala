package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Emitted whenever a user's CURRENT answer changed in a micro-batch;
  * latest row per user == the batch `sequence_next_node` aggregate over
  * the consumed prefix. `has_chain` disambiguates "no chain matched"
  * (false, next_node null) from a matched chain whose next event carries
  * a NULL value (true, next_node null); `next_node = 'NONE'` is the
  * aggregate's own traversal-end marker (chain matched at the stream
  * edge). `seq` = events consumed for this user so far — STRICTLY
  * increasing across a user's emissions (every emission follows at
  * least one new event), so "latest" is a deterministic max(seq) even
  * when tie groups straddling batch cuts repeat the event-time mark
  * `at`. */
case class SeqNextNodeUpdate(user_id: Long, has_chain: Boolean,
                             next_node: String, seq: Long, at: Timestamp)

/** O(chain) frontier: the last N (N+1 for backward+tail) events' chain
  * masks/values before the open tie group, the running answer, and the
  * tie-group frontier (the [[SeqMatchStream]] treatment). `consumed`
  * counts events strictly before the tie group — `head` needs it to know
  * whether the fixed anchor has been decided. */
private[streaming] case class SeqNextNodeState(
    finalDone: Boolean, hasChain: Boolean, answer: String,
    pending: Boolean, consumed: Long,
    ringMask: Seq[Int], ringValue: Seq[String],
    tieUs: Long, tieTie: Seq[Long], tieMask: Seq[Int], tieValue: Seq[String],
    // what the user last SAW (post-tie-group), distinct from the
    // replayable pre-group DP fields above: the answer is not monotone
    // (last_match / backward+tail can flip), so emit-on-change must
    // compare against the emitted pair, not the pre-group one — a late
    // tie sibling can break a chain and the pre-group answer would then
    // mask the retraction
    emitChain: Boolean = false, emitAnswer: String = null)

/** Incremental twin of the `sequence_next_node` aggregate
  * ([[graft.functions.SequenceNextNodeAgg]], o_a21b–e's SQL surface) —
  * the per-user "what happens next after the pattern" kept current per
  * micro-batch, EXACT against the batch aggregate on EVERY consumed
  * prefix (the spec's law), for the direction×base combos whose answer
  * depends on a BOUNDED window of the stream:
  *
  *  - `forward`+`first_match` — matches are detected in anchor order as
  *    events arrive (the chain is N consecutive events in the (ts, tie)
  *    total order, interventions included, so a sliding window of the
  *    last N events decides); the first detection is terminal once its
  *    successor event arrives.
  *  - `forward`+`last_match` — same window, the LATEST detection wins;
  *    the answer flips between 'NONE' (a fresh match at the stream
  *    edge) and the successor's value as the stream grows, never final.
  *  - `forward`+`head` — the chain must sit at the fixed stream head:
  *    the first N+1 events decide everything; terminal after them (or
  *    as soon as a prefix event breaks the chain).
  *  - `backward`+`tail` — CH's canonical backward pairing reads the
  *    chain back from the stream END: the answer is a pure function of
  *    the last N+1 events, recomputed as each arrives, never final.
  *
  * `backward`+`first_match`/`last_match` scan arbitrarily deep into
  * history from the moving stream end — no O(1) state reproduces them —
  * and are rejected loudly, naming the batch aggregate (the stated
  * subset, like [[SeqMatchStream]]'s `==`-gap corner). The degenerate
  * forward+tail / backward+head pairings are rejected exactly like the
  * aggregate.
  *
  * Ordering contract: the [[SeqMatchStream]] in-order trade with the
  * persisted tie-group frontier — equal-timestamp events may straddle
  * any cut; an event strictly behind the open tie group drops onto the
  * [[StreamGauges]] late counter. Adjacency is in the FULL stream, so
  * (unlike the condition-filtered twins) EVERY event is consumed, and a
  * late drop can hide a chain break the batch aggregate would see — the
  * batch form over the full log stays the exact reference. */
object SeqNextNodeStream {

  /** Mutable working state for one user. */
  private[streaming] final class Dp(val N: Int, val fwd: Boolean) {
    // ring of the last `cap` events (mask bit k = cond k+1; bit 30 =
    // base condition), oldest first
    val cap: Int = if (fwd) N else N + 1
    val ringMask = new scala.collection.mutable.ArrayBuffer[Int]()
    val ringValue = new scala.collection.mutable.ArrayBuffer[String]()
    var consumed = 0L
    var finalDone = false
    var hasChain = false
    var answer: String = null
    var pending = false // forward: chain matched, successor not yet seen
  }

  private val BASE_BIT = graft.functions.SequenceNextNode.BASE_BIT

  /** Consume one event in (ts, tie) order — transliterates the batch
    * eval's chainAt/anchor walk into a forward-only pass, prefix-exact
    * (pinned against the aggregate in SeqNextNodeStreamSpec). */
  private[streaming] def consume(dp: Dp, base: String, hasBase: Boolean,
                                 mask: Int, value: String): Unit = {
    if (dp.finalDone) return
    dp.consumed += 1
    if (dp.fwd) {
      // did the N-window ending at THIS event match (anchor gate on its
      // first position)?
      def windowMatches: Boolean = {
        if (dp.ringMask.size < dp.N - 1) return false
        val sz = dp.ringMask.size
        // positions: ring(sz-N+1 .. sz-1) then the current event
        if (hasBase) {
          val anchorMask =
            if (dp.N == 1) mask else dp.ringMask(sz - (dp.N - 1))
          if ((anchorMask & BASE_BIT) == 0) return false
        }
        var i = 0
        var ok = true
        while (ok && i < dp.N - 1) {
          ok = (dp.ringMask(sz - (dp.N - 1) + i) & (1 << i)) != 0
          i += 1
        }
        ok && (mask & (1 << (dp.N - 1))) != 0
      }
      base match {
        case "head" =>
          // the first N+1 events decide; a broken prefix is final NULL
          val pos = dp.consumed - 1 // 0-based position of this event
          if (pos < dp.N) {
            if ((mask & (1 << pos.toInt)) == 0 ||
                (hasBase && pos == 0 && (mask & BASE_BIT) == 0)) {
              dp.finalDone = true // chain can never match at the head
            } else if (pos == dp.N - 1) {
              dp.hasChain = true; dp.answer = "NONE"; dp.pending = true
            }
          } else { // pos == N: the successor
            dp.answer = value; dp.pending = false; dp.finalDone = true
          }
        case "first_match" =>
          if (dp.pending) { // successor of the FIRST match: terminal
            dp.answer = value; dp.pending = false; dp.finalDone = true
          } else if (windowMatches) {
            dp.hasChain = true; dp.answer = "NONE"; dp.pending = true
          }
        case "last_match" =>
          // a fresh match at the stream edge OVERRIDES an older answer;
          // otherwise a pending match resolves to this event's value
          if (windowMatches) {
            dp.hasChain = true; dp.answer = "NONE"; dp.pending = true
          } else if (dp.pending) {
            dp.answer = value; dp.pending = false
          }
        case other =>
          throw new IllegalStateException(s"unstreamable base $other")
      }
    }
    // maintain the ring (head also uses it only through `consumed`;
    // backward+tail recomputes from it after the batch)
    dp.ringMask += mask; dp.ringValue += value
    if (dp.ringMask.size > dp.cap) { dp.ringMask.remove(0); dp.ringValue.remove(0) }
    if (!dp.fwd) recomputeBackwardTail(dp, hasBase)
  }

  /** backward+tail: the chain reads c1..cN from the NEWEST event
    * backward; the answer is the value one further back ('NONE' when the
    * stream holds exactly N events). A pure function of the ring. */
  private def recomputeBackwardTail(dp: Dp, hasBase: Boolean): Unit = {
    val sz = dp.ringMask.size
    dp.hasChain = false; dp.answer = null
    if (dp.consumed < dp.N) return
    if (hasBase && (dp.ringMask(sz - 1) & BASE_BIT) == 0) return
    var i = 0
    var ok = true
    while (ok && i < dp.N) {
      ok = (dp.ringMask(sz - 1 - i) & (1 << i)) != 0
      i += 1
    }
    if (!ok) return
    dp.hasChain = true
    dp.answer =
      if (dp.consumed == dp.N) "NONE"
      else dp.ringValue(sz - 1 - dp.N) // consumed > N => ring holds N+1
  }

  private def load(st: SeqNextNodeState, n: Int, fwd: Boolean): Dp = {
    val dp = new Dp(n, fwd)
    dp.ringMask ++= st.ringMask; dp.ringValue ++= st.ringValue
    dp.consumed = st.consumed; dp.finalDone = st.finalDone
    dp.hasChain = st.hasChain; dp.answer = st.answer; dp.pending = st.pending
    dp
  }

  private def emptyState: SeqNextNodeState =
    SeqNextNodeState(finalDone = false, hasChain = false, answer = null,
      pending = false, 0L, Nil, Nil, Long.MinValue, Nil, Nil, Nil,
      emitChain = false, emitAnswer = null)

  private def fn(base: String, conds: Seq[TaggedEvent => Boolean],
      eventCol: TaggedEvent => String, baseCond: Option[TaggedEvent => Boolean],
      fwd: Boolean, idleTimeoutMs: Long,
      peakAcc: graft.functions.ParametricAgg.MaxAccumulator,
      lateAcc: org.apache.spark.util.LongAccumulator)(
      userId: Long, events: Iterator[TaggedEvent],
      state: GroupState[SeqNextNodeState]): Iterator[SeqNextNodeUpdate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st0 = state.getOption.getOrElse(emptyState)
    val evs = events.toSeq
    def setTimeout(): Unit =
      if (idleTimeoutMs > 0 && state.exists && evs.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(evs.map(_.ts.getTime).max,
            state.getCurrentWatermarkMs()) + idleTimeoutMs)
    if (st0.finalDone) { setTimeout(); return Iterator.empty }
    // EVERY event is consumed (full-stream adjacency): mask + value
    val tagged = evs.map { e =>
      var m = 0
      var c = 0
      while (c < conds.size) {
        if (conds(c)(e)) m |= 1 << c
        c += 1
      }
      baseCond.foreach(bc => if (bc(e)) m |= BASE_BIT)
      (e.ts.getTime * 1000L, e.tie, m, eventCol(e))
    }
    val (keep, late) = tagged.partition(_._1 >= st0.tieUs)
    StreamGauges.noteLate(lateAcc, late.size)
    if (keep.isEmpty) { setTimeout(); return Iterator.empty }
    val carried = st0.tieTie.indices.map(i =>
      (st0.tieUs, st0.tieTie(i), st0.tieMask(i), st0.tieValue(i)))
    val all = (carried ++ keep).sortBy(t => (t._1, t._2))
    StreamGauges.noteGroupEvents(peakAcc, all.size)
    val newMax = all.last._1
    val hasBase = baseCond.isDefined
    val dp = load(st0, conds.size, fwd)
    all.foreach { case (us, _, m, v) =>
      if (us < newMax) consume(dp, base, hasBase, m, v)
    }
    val pre = (dp.ringMask.toSeq, dp.ringValue.toSeq, dp.consumed,
      dp.finalDone, dp.hasChain, dp.answer, dp.pending)
    val group = all.filter(_._1 == newMax)
    group.foreach { case (_, _, m, v) => consume(dp, base, hasBase, m, v) }
    val changed = dp.hasChain != st0.emitChain || dp.answer != st0.emitAnswer
    state.update(SeqNextNodeState(pre._4, pre._5, pre._6, pre._7, pre._3,
      pre._1, pre._2, newMax,
      group.map(_._2), group.map(_._3), group.map(_._4),
      emitChain = dp.hasChain, emitAnswer = dp.answer))
    setTimeout()
    if (changed)
      Iterator.single(SeqNextNodeUpdate(userId, dp.hasChain, dp.answer,
        dp.consumed, new Timestamp(evs.map(_.ts.getTime).max)))
    else Iterator.empty
  }

  /** Update feed for the `sequence_next_node` aggregate's streaming
    * twin. `direction`/`base` take the aggregate's literals; `eventCol`
    * is the value column (the aggregate's STRING `value` argument);
    * `baseCond` adds the CH base_condition anchor gate. Works on
    * streaming or batch Datasets. */
  def seqNextNodeUpdates(ds: Dataset[TaggedEvent], direction: String,
      base: String, conds: Seq[TaggedEvent => Boolean],
      eventCol: TaggedEvent => String,
      baseCond: Option[TaggedEvent => Boolean] = None,
      idleTimeoutMs: Long = 0L): Dataset[SeqNextNodeUpdate] = {
    require(conds.nonEmpty && conds.size <= 30,
      "sequence_next_node needs 1-30 conditions (bitmask bound)")
    require(graft.functions.SequenceNextNode.directions(direction),
      s"direction '$direction' must be 'forward' | 'backward'")
    require(graft.functions.SequenceNextNode.bases(base),
      s"base '$base' must be 'head' | 'tail' | 'first_match' | 'last_match'")
    require(!(direction == "forward" && base == "tail") &&
      !(direction == "backward" && base == "head"),
      s"sequence_next_node('$direction', '$base'): the anchor sits at " +
        "the END of the traversal, so no chain can ever be followed")
    require(!(direction == "backward" &&
        (base == "first_match" || base == "last_match")),
      s"streaming sequence_next_node('backward', '$base') scans " +
        "arbitrarily deep history from the moving stream end — no O(1) " +
        "state reproduces it; use the batch sequence_next_node " +
        "aggregate (backward+tail and every forward base stream fine)")
    val (peakAcc, lateAcc) = StreamGauges.acquire()
    implicit val enc = Encoders.product[SeqNextNodeUpdate]
    implicit val stEnc = Encoders.product[SeqNextNodeState]
    val timeout: GroupStateTimeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        fn(base, conds, eventCol, baseCond, direction == "forward",
          idleTimeoutMs, peakAcc, lateAcc))
  }
}
