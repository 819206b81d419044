package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Scalar helper callable from generated code. Accumulates in index
  * order with each float widened to double first — bit-identical to the
  * zip_with/aggregate higher-order form in functions.VectorOps (which
  * stays as the tier-a reference implementation and the DuckDB mirror). */
object VecMath {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** float-left, double-right variant (recomputed k-means centroids are
    * array<double>); same index order and widening as the HOF form. */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native dot product over two `array<float>` columns: a tight primitive
  * loop inside whole-stage codegen instead of ~3 interpreted lambda
  * evaluations per row (zip_with + aggregate are not codegen'd).
  * Registered as `graft_dot(a, b)`. The ANN hot path (SURVEY §2D). */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VecMath.dotFF($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native dot product of an `array<float>` column against an
  * `array<double>` column — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), 0d, +)`,
  * which runs as ~3 interpreted lambdas per row. */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_fd"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VecMath.dotFD($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
