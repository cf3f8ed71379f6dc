package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DDSketch-style mergeable quantile sketch — the ClickHouse
  * `quantileState` / `quantileMerge` AggregatingMergeTree combinator
  * (CH 22.3 capability [implied] by the reference's event tables; cf. the
  * migration DDLs' ORDER BY time layouts that exist to serve exactly
  * these rollups) re-expressed as a Catalyst `TypedImperativeAggregate`.
  *
  * Sketch model (Masson, Rim, Lee: "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019): positive
  * values map to log-scaled bins `k = ceil(ln(x)/ln(gamma))`,
  * `gamma = (1+alpha)/(1-alpha)`; a bin's midpoint estimates any member
  * within relative error `alpha`. Non-positive values land in a dedicated
  * underflow count. Merging is bin-wise counter addition — associative,
  * commutative, and ORDER-INSENSITIVE, so partials from any batching of
  * the same rows merge to byte-identical sketches (the property the
  * incremental-rollup pattern needs at 100 TB: per-batch partials reduce
  * a fact stream to KB-scale state, re-aggregation never revisits raw
  * data). Quantile queries return the BIN INDEX (an int) — integer output
  * keeps cross-engine oracle comparison exact; callers recover the value
  * estimate with [[DDSketch.binValue]].
  *
  * Scale posture: bins for a [1e-9, 1e9] value range at alpha=0.01 fit in
  * ~2100 counters (~25 KB serialized) — safe to carry per group through a
  * shuffle, unlike an exact quantile's full value buffer.
  */
object DDSketch {

  /** Growth factor for the log-scaled bins. */
  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Bin index of a positive value. The 1e-11 nudge before ceil() makes
    * the bin function robust to libm rounding differences across engines:
    * a log-ratio landing within ~1 ulp of an integer would otherwise flip
    * ceil() between this JVM and the DuckDB oracle's libm and flake the
    * o_a13 hash compare. The nudge shifts every boundary by a relative
    * 1e-11 — far below alpha's accuracy guarantee — and is applied
    * IDENTICALLY in the oracle SQL (IncrementalRollup.oracles), so both
    * engines bin every representable value the same way. */
  def bin(x: Double, gamma: Double): Int =
    math.ceil(math.log(x) / math.log(gamma) - 1e-11).toInt

  /** Midpoint value estimate of a bin (within alpha of any member). */
  def binValue(k: Int, alpha: Double): Double =
    2 * math.pow(gamma(alpha), k) / (gamma(alpha) + 1)

  /** Mutable aggregation state: underflow count + sorted bin counters.
    * alpha rides along (NaN = not yet bound, for merge-only buffers). */
  final class State(var alpha: Double) {
    var zero: Long = 0L
    val bins = new java.util.TreeMap[Int, java.lang.Long]()
    def add(k: Int, c: Long): Unit = {
      val cur = bins.get(k)
      bins.put(k, if (cur == null) c else cur.longValue + c)
    }
    def insert(x: Double): Unit =
      if (x > 0) add(bin(x, gamma(alpha)), 1L) else zero += 1
    def total: Long = {
      var t = zero
      val it = bins.values.iterator
      while (it.hasNext) t += it.next().longValue
      t
    }
    def mergeFrom(o: State): Unit = {
      if (alpha.isNaN) alpha = o.alpha
      else if (!o.alpha.isNaN)
        require(alpha == o.alpha, s"ddsketch merge: alpha $alpha != ${o.alpha}")
      zero += o.zero
      val it = o.bins.entrySet.iterator
      while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue.longValue) }
    }
  }

  /** [double alpha][long zero][int n][(int k, long c) * n], bins in
    * ascending k — sorted map ⇒ byte-identical sketches for any merge
    * order of the same rows. */
  def serialize(s: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 8 + 4 + 12 * s.bins.size)
    buf.putDouble(s.alpha).putLong(s.zero).putInt(s.bins.size)
    val it = s.bins.entrySet.iterator
    while (it.hasNext) { val e = it.next(); buf.putInt(e.getKey).putLong(e.getValue.longValue) }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val s = new State(buf.getDouble)
    s.zero = buf.getLong
    var n = buf.getInt
    while (n > 0) { s.add(buf.getInt, buf.getLong); n -= 1 }
    s
  }

  /** Quantile bin: smallest k whose cumulative count reaches
    * `max(1, ceil(q * N))`, counting the underflow bucket first
    * (underflow wins ⇒ Int.MinValue). Null on an empty sketch. */
  def quantileBin(s: State, q: Double): Any = {
    val n = s.total
    if (n == 0L) return null
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = s.zero
    if (cum >= target) return Int.MinValue
    val it = s.bins.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      cum += e.getValue.longValue
      if (cum >= target) return e.getKey.intValue
    }
    null // unreachable: target <= n
  }

  private[functions] def foldableDouble(e: Expression, what: String): Double = e match {
    case lit: Literal if lit.foldable && lit.value != null =>
      lit.value match {
        case d: Double => d
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case i: java.lang.Number => i.doubleValue
        case v => throw new IllegalArgumentException(s"$what: not numeric: $v")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }
}

/** `ddsketch_agg(x, alpha)` → binary sketch (the quantileState step). */
case class DDSketchAgg(
    child: Expression,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch.State] with UnaryLike[Expression] {

  def this(child: Expression, alphaExpr: Expression) =
    this(child, DDSketch.foldableDouble(alphaExpr, "ddsketch_agg alpha"))

  require(alpha > 0 && alpha < 1, s"ddsketch_agg: alpha $alpha outside (0,1)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.sql} (cast first)")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_agg"

  override def createAggregationBuffer(): DDSketch.State = new DDSketch.State(alpha)
  override def update(b: DDSketch.State, row: InternalRow): DDSketch.State = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Double])
    b
  }
  override def merge(b: DDSketch.State, o: DDSketch.State): DDSketch.State = {
    b.mergeFrom(o); b
  }
  override def eval(b: DDSketch.State): Any = DDSketch.serialize(b)
  override def serialize(b: DDSketch.State): Array[Byte] = DDSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): DDSketch.State = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): DDSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DDSketchAgg = copy(child = c)
}

/** `ddsketch_merge(sketch)` → binary sketch (the quantileMerge step —
  * re-aggregates partial sketches to coarser groups). */
case class DDSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch.State] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY ddsketch state, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_merge"

  override def createAggregationBuffer(): DDSketch.State = new DDSketch.State(Double.NaN)
  override def update(b: DDSketch.State, row: InternalRow): DDSketch.State = {
    val v = child.eval(row)
    if (v != null) b.mergeFrom(DDSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: DDSketch.State, o: DDSketch.State): DDSketch.State = {
    b.mergeFrom(o); b
  }
  override def eval(b: DDSketch.State): Any = DDSketch.serialize(b)
  override def serialize(b: DDSketch.State): Array[Byte] = DDSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): DDSketch.State = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): DDSketchMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DDSketchMergeAgg = copy(child = c)
}

/** `ddsketch_quantile(sketch, q)` → int bin index (null on empty sketch).
  * Scalar finalizer, runs once per group row — CodegenFallback is off the
  * hot path by construction. */
case class DDSketchQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, DOUBLE q)")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_quantile"

  protected override def nullSafeEval(sketch: Any, q: Any): Any =
    DDSketch.quantileBin(
      DDSketch.deserialize(sketch.asInstanceOf[Array[Byte]]),
      q.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchQuantile =
    copy(left = newLeft, right = newRight)
}
