package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared scalar math (plain object → static forwarder, callable from
  * generated Java). Same op order as geo.Distance.haversineKm, so the
  * native expression and the composed-Column form produce bit-identical
  * doubles. */
object GeoMath {
  final val TwoR = 2 * 6371.0088

  def haversineKm(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val dLat = (lat2 - lat1) * math.Pi / 180 / 2
    val dLng = (lng2 - lng1) * math.Pi / 180 / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(lat1 * math.Pi / 180) * math.cos(lat2 * math.Pi / 180) *
        math.sin(dLng) * math.sin(dLng)
    math.asin(math.sqrt(a)) * TwoR
  }
}

/** Native Catalyst haversine — the (b)-tier extension path from SURVEY §4:
  * when a scalar needs to run inside whole-stage codegen as ONE call
  * instead of a ~20-node sin/cos expression tree. `doGenCode` emits a
  * single static invocation, so the generated Java stays small (codegen
  * splits methods at 8k bytecode) and constant-folds like any built-in.
  * Registered as SQL function `graft_haversine` by [[GraftExtensions]].
  *
  * Reference analog: postgis_distance_a_to_b
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/spatial.py:179). */
case class HaversineKm(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  // children are cast to double by the GraftExtensions function builder
  // (ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine"

  override protected def nullSafeEval(lat1: Any, lng1: Any, lat2: Any, lng2: Any): Any =
    GeoMath.haversineKm(lat1.asInstanceOf[Double], lng1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lng2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat1, lng1, lat2, lng2) =>
      s"${ev.value} = graft.expressions.GeoMath.haversineKm($lat1, $lng1, $lat2, $lng2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
