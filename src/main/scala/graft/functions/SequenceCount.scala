package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `sequenceCount('(?1).*(?2)')` / `('(?1)(?t<=w)(?2)')` as a
  * SQL aggregate — the SQL-surface twin of
  * [[graft.operators.EventAnalytics.sequenceCount]] /
  * [[graft.operators.EventAnalytics.sequenceCountWindowed]] (CH 22.3
  * parametric-aggregate family, next to
  * [[WindowFunnelAgg]]). Same greedy non-overlapping semantics, proved
  * by the shared oracles: the automaton collapses to "count events
  * matching `second` whose immediately preceding condition-matching
  * event matches `first`" (proof at the library form), optionally gap-
  * bounded.
  *
  * `sequence_count(window_us, ts, tie, first, second)` → BIGINT.
  * `window_us = 0` means UNBOUNDED (the `.*` pattern — no time
  * constraint); positive w is the `(?t<=w)` bound. `tie` is an explicit
  * BIGINT tie-break for equal timestamps: CH leaves tie order
  * engine-private, but this engine's determinism rules (and the DuckDB
  * differential) demand a total order, so the caller names it — the
  * catalog uses event_id, exactly like the library form's default.
  * An event matching BOTH conditions counts as `first` (arms, never
  * fires), matching the library form. Events matching neither carry no
  * information and are not buffered; state is O(matching events per
  * group), the CH trade — the one-shuffle lag() library form is the
  * scale path.
  */
object SequenceCount {

  /** Buffered (micros, tie, first?) triples. */
  final class State {
    var us = new Array[Long](8)
    var tie = new Array[Long](8)
    var isA = new Array[Boolean](8)
    var n = 0
    def add(t: Long, k: Long, a: Boolean): Unit = {
      if (n == us.length) {
        us = java.util.Arrays.copyOf(us, n * 2)
        tie = java.util.Arrays.copyOf(tie, n * 2)
        isA = java.util.Arrays.copyOf(isA, n * 2)
      }
      us(n) = t; tie(n) = k; isA(n) = a; n += 1
    }
  }

  /** The lag-collapse pass over the (ts, tie) total order. */
  def count(s: State, windowMicros: Long): Long = {
    if (s.n == 0) return 0L
    val idx = ParametricAgg.sortedIdx(s.us, s.tie, s.n)
    var fired = 0L
    var prevA = false
    var prevUs = 0L
    var i = 0
    while (i < s.n) {
      val j = idx(i)
      if (!s.isA(j) && prevA &&
          (windowMicros == 0 || s.us(j) - prevUs <= windowMicros))
        fired += 1
      prevA = s.isA(j); prevUs = s.us(j)
      i += 1
    }
    fired
  }

  def serialize(s: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + s.n * 17)
    buf.putInt(s.n)
    var i = 0
    while (i < s.n) {
      buf.putLong(s.us(i)); buf.putLong(s.tie(i))
      buf.put(if (s.isA(i)) 1.toByte else 0.toByte)
      i += 1
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val s = new State
    var n = buf.getInt
    while (n > 0) { s.add(buf.getLong, buf.getLong, buf.get() == 1); n -= 1 }
    s
  }
}

/** `sequence_count(window_us, ts, tie, first, second)` → BIGINT. */
case class SequenceCountAgg(
    windowMicros: Long,
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SequenceCount.State] {

  def this(es: Seq[Expression]) =
    this(DDSketch.foldableDouble(es.head, "sequence_count window_us").toLong,
      es)

  require(windowMicros >= 0,
    s"sequence_count: window $windowMicros us must be >= 0 (0 = unbounded)")
  require(children.size == 5,
    "sequence_count(window_us, ts, tie, first, second) takes 5 arguments")

  private def tsExpr = children(1)
  private def tieExpr = children(2)
  private def firstExpr = children(3)
  private def secondExpr = children(4)

  // shared peak-buffer gauge, acquired on the driver, shipped to tasks
  private val peakAcc = ParametricAgg.acquire()

  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = tsExpr.dataType == TimestampType || tsExpr.dataType == LongType
    val ok = tsOk && tieExpr.dataType == LongType &&
      firstExpr.dataType == BooleanType && secondExpr.dataType == BooleanType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (foldable window_us, TIMESTAMP|BIGINT ts, " +
        s"BIGINT tie, BOOLEAN first, BOOLEAN second), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sequence_count"

  override def createAggregationBuffer(): SequenceCount.State =
    new SequenceCount.State

  override def update(b: SequenceCount.State,
                      row: InternalRow): SequenceCount.State = {
    ParametricAgg.guard(b.n, prettyName,
      "graft.operators.EventAnalytics.sequenceCount / sequenceCountChunked")
    val t = tsExpr.eval(row)
    val k = tieExpr.eval(row)
    if (t != null && k != null) {
      val f = firstExpr.eval(row)
      val sec = secondExpr.eval(row)
      val isF = f != null && f.asInstanceOf[Boolean]
      val isS = sec != null && sec.asInstanceOf[Boolean]
      // both ⇒ first (arms, never fires) — the library form's rule
      if (isF || isS)
        b.add(t.asInstanceOf[Long], k.asInstanceOf[Long], isF)
    }
    ParametricAgg.notePeak(peakAcc, b.n)
    b
  }

  override def merge(b: SequenceCount.State,
                     o: SequenceCount.State): SequenceCount.State = {
    ParametricAgg.guard(b.n + o.n - 1, prettyName,
      "graft.operators.EventAnalytics.sequenceCount / sequenceCountChunked")
    var i = 0
    while (i < o.n) { b.add(o.us(i), o.tie(i), o.isA(i)); i += 1 }
    ParametricAgg.notePeak(peakAcc, b.n)
    b
  }

  override def eval(b: SequenceCount.State): Any =
    SequenceCount.count(b, windowMicros)

  override def serialize(b: SequenceCount.State): Array[Byte] =
    SequenceCount.serialize(b)
  override def deserialize(bytes: Array[Byte]): SequenceCount.State =
    SequenceCount.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceCountAgg =
    copy(children = newChildren)
}
