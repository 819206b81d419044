package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Scalar web-mercator tile math shared by the native expressions and any
  * JVM-side callers — EXACTLY the op order of the composed Column form in
  * geo.QuadKey (Catalyst's trig expressions call java.lang.Math too, so
  * native and composed agree bit-for-bit). */
object TileMath {
  def tileX(lng: Double, z: Int): Long = {
    val n = 1L << z
    val t = math.floor((lng + 180) / 360 * n).toLong
    math.min(math.max(t, 0L), n - 1)
  }

  def tileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val r = lat * math.Pi / 180
    val f = (1 - math.log(math.tan(r) + 1 / math.cos(r)) / math.Pi) / 2 * n
    val t = math.floor(f).toLong
    math.min(math.max(t, 0L), n - 1)
  }
}

/** Native tile-x: one static call inside whole-stage codegen instead of a
  * ~8-node arithmetic subtree per point (SURVEY §4 extension ladder,
  * tier b). Registered as `graft_tile_x(lng, z)`. Reference analog:
  * mercantile tiling (/root/reference/src/ubdc_airbnb/ubdc_airbnb/
  * models.py:308 model_from_tile). */
case class TileX(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_tile_x"

  override protected def nullSafeEval(lng: Any, z: Any): Any =
    TileMath.tileX(lng.asInstanceOf[Double], z.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lng, z) =>
      s"${ev.value} = graft.expressions.TileMath.tileX($lng, $z);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native tile-y (mercator): one static call replacing a ~15-node trig
  * subtree per point. Registered as `graft_tile_y(lat, z)`. */
case class TileY(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_tile_y"

  override protected def nullSafeEval(lat: Any, z: Any): Any =
    TileMath.tileY(lat.asInstanceOf[Double], z.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, z) =>
      s"${ev.value} = graft.expressions.TileMath.tileY($lat, $z);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
