package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two `Array[Float]` columns in double precision —
  * the per-pair hot operation of every embedding workload (cosine top-k,
  * near-dup thresholding, IVF probe ranking).
  *
  * The composable form `aggregate(zip_with(a, b, (x,y) -> ...), 0D, +)`
  * is codegen'd but MATERIALIZES the zipped product array for every pair
  * before folding it; this expression is a single allocation-free loop.
  * Accumulation is sequential in index order, exactly like the fold, so
  * results are bit-identical to the composable form (the DuckDB oracles
  * keep matching). `norm(v) = sqrt(float_dot(v, v))` — same IEEE ordering
  * as the transform+fold it replaces. Null elements are not expected
  * (embedding vectors are dense); lengths are clamped to the shorter
  * input. */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires two ARRAY<FLOAT> inputs")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}
