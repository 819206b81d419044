package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** SparkSessionExtensions hook wiring graft's native expressions into the
  * SQL function registry (SURVEY §4 extension ladder, tier b/c). Applied
  * by GraftSession.builder; also usable via
  * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_haversine"),
      new ExpressionInfo(classOf[HaversineKm].getName, "graft_haversine"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_haversine(lat1, lng1, lat2, lng2)")
        val Seq(a, b, c, d) = children.map(Cast(_, DoubleType))
        HaversineKm(a, b, c, d)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tile_x"),
      new ExpressionInfo(classOf[TileX].getName, "graft_tile_x"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_tile_x(lng, z)")
        TileX(Cast(children(0), DoubleType), Cast(children(1), IntegerType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_intersect_count(sorted array<bigint> x2)")
        SortedIntersectCount(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(array<float>, array<float>)")
        FloatVecDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long"),
      new ExpressionInfo(classOf[Md5Long].getName, "graft_md5long"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_md5long(string)")
        Md5Long(Cast(children(0), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_cdc_chunks(string)")
        CdcChunks(Cast(children(0), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tile_y"),
      new ExpressionInfo(classOf[TileY].getName, "graft_tile_y"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_tile_y(lat, z)")
        TileY(Cast(children(0), DoubleType), Cast(children(1), IntegerType))
      }))
  }
}
