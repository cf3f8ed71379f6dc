package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** ClickHouse `groupBitmap` family — EXACT id-set aggregation with set
  * algebra over the aggregated states (`bitmapCardinality`, `bitmapAnd`,
  * `bitmapOr`, `bitmapAndnot`): the segment-analysis workhorse ("users who
  * did A and B but not C") computed on compact per-group states instead of
  * row joins.
  *
  * State: a hash set of longs while aggregating; serialized as the SORTED
  * distinct values (8-byte big-endian each) — deterministic bytes for any
  * insertion order, and the sorted form makes every binary set operation a
  * linear merge, no deserialization into a set needed. (CH uses Roaring
  * bitmaps; a sorted array is the same exactness contract and the right
  * baseline without a compression dependency — swap the codec behind
  * `serialize`/`sortedValues` to upgrade.)
  *
  * Scale shape: states are O(distinct ids per group) — same as CH; they
  * merge map-side like any TypedImperativeAggregate, so a rollup from
  * (date, type) partials to per-type segments never revisits raw rows.
  * The set-algebra expressions then run on one row per GROUP, not per
  * event — the whole point of the pattern at 100 TB.
  */
object BitmapSet {

  final class State {
    val values = new java.util.HashSet[java.lang.Long]()
    def insert(x: Long): Unit = values.add(x)
    def mergeFrom(o: State): Unit = values.addAll(o.values)
  }

  def serialize(s: State): Array[Byte] = {
    val arr = new Array[Long](s.values.size)
    val it = s.values.iterator
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val buf = ByteBuffer.allocate(4 + 8 * arr.length)
    buf.putInt(arr.length)
    arr.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val s = new State
    sortedValues(bytes).foreach(s.insert)
    s
  }

  /** Zero-copy view of the serialized sorted ids. */
  def sortedValues(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    Array.fill(n)(buf.getLong)
  }

  def cardinality(bytes: Array[Byte]): Long =
    ByteBuffer.wrap(bytes).getInt.toLong

  /** Linear merges over the sorted encodings. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val (x, y) = (sortedValues(a), sortedValues(b))
    var i = 0; var j = 0; var n = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }

  def orCount(a: Array[Byte], b: Array[Byte]): Long =
    cardinality(a) + cardinality(b) - andCount(a, b)

  /** |A \ B| — CH `bitmapAndnotCardinality`. */
  def andnotCount(a: Array[Byte], b: Array[Byte]): Long =
    cardinality(a) - andCount(a, b)
}

/** `bitmap_agg(x)` → binary exact-set state over BIGINT ids. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapSet.State] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.sql} (cast first)")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_agg"

  override def createAggregationBuffer(): BitmapSet.State = new BitmapSet.State
  override def update(b: BitmapSet.State, row: InternalRow): BitmapSet.State = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }
  override def merge(b: BitmapSet.State, o: BitmapSet.State): BitmapSet.State = {
    b.mergeFrom(o); b
  }
  override def eval(b: BitmapSet.State): Any = BitmapSet.serialize(b)
  override def serialize(b: BitmapSet.State): Array[Byte] = BitmapSet.serialize(b)
  override def deserialize(bytes: Array[Byte]): BitmapSet.State = BitmapSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapAgg = copy(child = c)
}

/** `bitmap_merge(state)` → binary union state (rollup to coarser groups). */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapSet.State] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY bitmap state, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge"

  override def createAggregationBuffer(): BitmapSet.State = new BitmapSet.State
  override def update(b: BitmapSet.State, row: InternalRow): BitmapSet.State = {
    val v = child.eval(row)
    if (v != null) b.mergeFrom(BitmapSet.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: BitmapSet.State, o: BitmapSet.State): BitmapSet.State = {
    b.mergeFrom(o); b
  }
  override def eval(b: BitmapSet.State): Any = BitmapSet.serialize(b)
  override def serialize(b: BitmapSet.State): Array[Byte] = BitmapSet.serialize(b)
  override def deserialize(bytes: Array[Byte]): BitmapSet.State = BitmapSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeAgg = copy(child = c)
}

/** `bitmap_count(state)` → BIGINT cardinality. */
case class BitmapCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY state")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_count"
  protected override def nullSafeEval(state: Any): Any =
    BitmapSet.cardinality(state.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): BitmapCount = copy(child = c)
}

/** `bitmap_and_count(a, b)` / `bitmap_or_count` / `bitmap_andnot_count`. */
abstract class BitmapBinaryCount extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two BINARY states")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

case class BitmapAndCount(left: Expression, right: Expression) extends BitmapBinaryCount {
  override def prettyName: String = "bitmap_and_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitmapSet.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BitmapOrCount(left: Expression, right: Expression) extends BitmapBinaryCount {
  override def prettyName: String = "bitmap_or_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitmapSet.orCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BitmapAndnotCount(left: Expression, right: Expression) extends BitmapBinaryCount {
  override def prettyName: String = "bitmap_andnot_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitmapSet.andnotCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
