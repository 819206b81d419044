package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Merge-walk |a ∩ b| for SORTED distinct long arrays — zero allocation,
  * O(|a|+|b|). Callable from generated code. */
object SetMath {
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Native |a ∩ b| over two pre-sorted distinct `array<bigint>` columns.
  * The set-similarity verify stage runs hundreds of thousands of
  * intersections per job; Spark's generic ArrayIntersect builds a hash
  * set per invocation — this is a primitive merge loop inside whole-stage
  * codegen. Inputs MUST be sorted distinct (e.g. sort_array(collect_set)).
  * Registered as `graft_intersect_count(a, b)`. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetMath.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SetMath.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
