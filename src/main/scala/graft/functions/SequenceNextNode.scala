package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `sequenceNextNode(forward, head)(ts, value, cond1, cond2)`
  * as a SQL aggregate — the exploratory sibling of sequenceMatch ("what
  * happens NEXT after the pattern"), the SQL-surface twin of the o_a21
  * library formulation: per group, find the FIRST consecutive
  * cond1→cond2 pair in (ts, tie) stream order over ALL buffered rows
  * (consecutive = adjacent in the full stream, interventions of any
  * kind break the pair — so every row is buffered, like
  * `window_funnel('strict_order')`), and return the `value` of the
  * event immediately after it ('NONE' at stream end, NULL when the
  * group has no such pair — the matched-users result universe o_a21
  * pins).
  *
  * `sequence_next_node(ts, tie, value, cond1, cond2)` → STRING. The
  * explicit BIGINT tie is this engine's determinism convention (CH
  * leaves same-second order private). State buffers (us, tie, value?,
  * flags) per row under the [[ParametricAgg]] cap; the one-shuffle
  * lead()-window library form (o_a21) remains the scale path.
  */
object SequenceNextNode {

  /** Buffered (micros, tie, value-or-null, cond flags) rows. */
  final class State {
    var us = new Array[Long](8)
    var tie = new Array[Long](8)
    var value = new Array[String](8)
    var flag = new Array[Byte](8) // bit0 = cond1, bit1 = cond2
    var n = 0
    def add(t: Long, k: Long, v: String, f: Byte): Unit = {
      if (n == us.length) {
        us = java.util.Arrays.copyOf(us, n * 2)
        tie = java.util.Arrays.copyOf(tie, n * 2)
        value = java.util.Arrays.copyOf(value, n * 2)
        flag = java.util.Arrays.copyOf(flag, n * 2)
      }
      us(n) = t; tie(n) = k; value(n) = v; flag(n) = f; n += 1
    }
  }

  def serialize(s: State): Array[Byte] = {
    val vb = new Array[Array[Byte]](s.n)
    var bytes = 4
    var i = 0
    while (i < s.n) {
      vb(i) = if (s.value(i) == null) null
              else s.value(i).getBytes(StandardCharsets.UTF_8)
      bytes += 21 + (if (vb(i) == null) 0 else vb(i).length)
      i += 1
    }
    val buf = ByteBuffer.allocate(bytes)
    buf.putInt(s.n)
    i = 0
    while (i < s.n) {
      buf.putLong(s.us(i)); buf.putLong(s.tie(i)); buf.put(s.flag(i))
      if (vb(i) == null) buf.putInt(-1)
      else { buf.putInt(vb(i).length); buf.put(vb(i)) }
      i += 1
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val s = new State
    var n = buf.getInt
    while (n > 0) {
      val t = buf.getLong; val k = buf.getLong; val f = buf.get()
      val len = buf.getInt
      val v = if (len < 0) null else {
        val a = new Array[Byte](len); buf.get(a)
        new String(a, StandardCharsets.UTF_8)
      }
      s.add(t, k, v, f)
      n -= 1
    }
    s
  }
}

/** `sequence_next_node(ts, tie, value, cond1, cond2)` → STRING. */
case class SequenceNextNodeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SequenceNextNode.State] {

  require(children.size == 5,
    "sequence_next_node(ts, tie, value, cond1, cond2) takes 5 arguments")

  private def tsExpr = children(0)
  private def tieExpr = children(1)
  private def valExpr = children(2)
  private def cond1 = children(3)
  private def cond2 = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = tsExpr.dataType == TimestampType || tsExpr.dataType == LongType
    val ok = tsOk && tieExpr.dataType == LongType &&
      valExpr.dataType == StringType &&
      cond1.dataType == BooleanType && cond2.dataType == BooleanType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (TIMESTAMP|BIGINT ts, BIGINT tie, STRING " +
        s"value, BOOLEAN cond1, BOOLEAN cond2), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_next_node"

  override def createAggregationBuffer(): SequenceNextNode.State =
    new SequenceNextNode.State

  override def update(b: SequenceNextNode.State,
                      row: InternalRow): SequenceNextNode.State = {
    ParametricAgg.guard(b.n, prettyName,
      "the o_a21 lead()-window formulation (operators.EventAnalytics)")
    val t = tsExpr.eval(row)
    val k = tieExpr.eval(row)
    if (t != null && k != null) {
      val v = valExpr.eval(row)
      val c1 = cond1.eval(row)
      val c2 = cond2.eval(row)
      var f = 0
      if (c1 != null && c1.asInstanceOf[Boolean]) f |= 1
      if (c2 != null && c2.asInstanceOf[Boolean]) f |= 2
      b.add(t.asInstanceOf[Long], k.asInstanceOf[Long],
        if (v == null) null else v.toString, f.toByte)
    }
    b
  }

  override def merge(b: SequenceNextNode.State,
                     o: SequenceNextNode.State): SequenceNextNode.State = {
    ParametricAgg.guard(b.n + o.n - 1, prettyName,
      "the o_a21 lead()-window formulation (operators.EventAnalytics)")
    var i = 0
    while (i < o.n) { b.add(o.us(i), o.tie(i), o.value(i), o.flag(i)); i += 1 }
    b
  }

  override def eval(b: SequenceNextNode.State): Any = {
    if (b.n == 0) return null
    val idx = ParametricAgg.sortedIdx(b.us, b.tie, b.n)
    var i = 0
    while (i + 1 < b.n) {
      if ((b.flag(idx(i)) & 1) != 0 && (b.flag(idx(i + 1)) & 2) != 0) {
        val v = if (i + 2 < b.n) b.value(idx(i + 2)) else null
        return UTF8String.fromString(if (v == null) "NONE" else v)
      }
      i += 1
    }
    null
  }

  override def serialize(b: SequenceNextNode.State): Array[Byte] =
    SequenceNextNode.serialize(b)
  override def deserialize(bytes: Array[Byte]): SequenceNextNode.State =
    SequenceNextNode.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SequenceNextNodeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceNextNodeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceNextNodeAgg =
    copy(children = newChildren)
}
