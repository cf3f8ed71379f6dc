package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text — a native Catalyst
  * Expression with whole-stage codegen (no UDF serialization, stays
  * inside the generated loop).
  *
  * Algorithm (Charikar 2002, public): per token, a 64-bit hash votes
  * ±1 on each bit position; the sign of each accumulated position forms
  * the fingerprint. Token hash is FNV-1a-64 finalized with a splitmix64
  * mix — deterministic and dependency-free.
  *
  * Capability target: near-dup fingerprinting the reference delegates to
  * its OLAP layer (SURVEY §2.10 — custom scalar is the justified
  * extension point; everything else stays built-in).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var h = 0xcbf29ce484222325L // FNV-1a offset basis
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val b = if (i < bytes.length) bytes(i) else ' '.toByte
      if (b == ' '.toByte || b == '\n'.toByte || b == '\t'.toByte) {
        if (inTok) {
          val th = mix(h)
          var bit = 0
          while (bit < 64) {
            votes(bit) += (if (((th >>> bit) & 1L) == 1L) 1 else -1)
            bit += 1
          }
          h = 0xcbf29ce484222325L
          inTok = false
        }
      } else {
        h = (h ^ (b & 0xffL)) * 0x100000001b3L // FNV-1a step
        inTok = true
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** Polynomial rolling-hash document fingerprint (Rabin-Karp style) over
  * the raw bytes — order-sensitive counterpart to the sorted-word-set
  * fingerprint in TextAnalysis. Codegen'd like SimHash64. */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash64"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }
}
