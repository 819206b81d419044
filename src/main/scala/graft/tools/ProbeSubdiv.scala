package graft.tools

import graft.{GraftSession, Tables}
import graft.geo.{QuadKey, SyntheticGeo}
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q22 subdivide pipeline. */
object ProbeSubdiv {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-subdiv")
    val pts = Tables.t(spark, dir, "events")
      .withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      time(s"run$i deepest-agg") {
        pts.select(QuadKey.tileX(col("lng"), 7).as("x"), QuadKey.tileY(col("lat"), 7).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c")).count()
      }
      time(s"run$i full-subdivide") {
        graft.operators.GridOps.subdivide(pts, col("lng"), col("lat"), 3, 7, 200).count()
      }
      spark.catalog.clearCache()
    }
    graft.operators.GridOps.subdivide(pts, col("lng"), col("lat"), 3, 7, 200)
      .explain("formatted")
    spark.stop()
  }
}
