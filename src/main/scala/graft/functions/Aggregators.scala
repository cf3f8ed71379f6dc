package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed argMax over (payload, ordinal) pairs — the `Aggregator[IN, BUF,
  * OUT]` extension-point demo (ClickHouse `argMax`; the untyped path uses
  * the built-in `max_by`, see Relational o_a5_argmax). Merge is
  * associative/commutative with an order tiebreak on the payload, so the
  * result is deterministic under any partial-aggregation plan. */
class ArgMaxLong extends Aggregator[(Long, Long), (Long, Long, Boolean), Long] {
  override def zero: (Long, Long, Boolean) = (0L, Long.MinValue, false)

  private def pick(a: (Long, Long, Boolean), value: Long, ord: Long): (Long, Long, Boolean) =
    if (!a._3 || ord > a._2 || (ord == a._2 && value > a._1)) (value, ord, true) else a

  override def reduce(b: (Long, Long, Boolean), in: (Long, Long)): (Long, Long, Boolean) =
    pick(b, in._1, in._2)

  override def merge(x: (Long, Long, Boolean), y: (Long, Long, Boolean)): (Long, Long, Boolean) =
    if (!y._3) x else pick(x, y._1, y._2)

  override def finish(r: (Long, Long, Boolean)): Long = r._1

  override def bufferEncoder: Encoder[(Long, Long, Boolean)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
