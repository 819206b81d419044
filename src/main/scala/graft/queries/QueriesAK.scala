package graft.queries

import graft.Tables.t
import graft.geo.{QuadKey, SyntheticGeo}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 30:
  *
  *  - q159: retention/VACUUM planner — over the SCD2 version chain
  *    (q153's dimension), count versions fully superseded before a
  *    14-day retention cutoff: the lakehouse VACUUM/GC decision input,
  *    computed exactly (reclaimable iff valid_to < cutoff).
  *  - q160: grid-coverage audit — per AOI bbox: total z6 tiles inside
  *    the box from CORNER TILE ARITHMETIC alone (no tile explode),
  *    occupied tiles from one distinct-aggregate of in-box points,
  *    coverage bp. The reference's "has every grid in this AOI been
  *    scanned" accounting (grids.py periodicals), scale shape: points
  *    aggregate distributed, tile math O(1) per AOI.
  */
object QueriesAK extends QueryPack {

  def defs: Seq[QDef] = Seq(

    QDef("q159_vacuum_plan",
      (s, dir) => {
        val wv = Window.partitionBy("o_custkey")
          .orderBy(col("vfrom"), col("o_orderkey"))
        val versions = t(s, dir, "orders")
          .selectExpr("o_custkey", "o_orderkey", "o_orderpriority",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS vfrom")
          .withColumn("vto", lead("vfrom", 1).over(wv))
        val cutoff = versions.agg(
          (max("vfrom") - lit(14L * 86400000L)).as("cutoff"))
        versions.crossJoin(broadcast(cutoff))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("vto").isNotNull && col("vto") < col("cutoff"), 1L)
              .otherwise(0L)).cast("bigint").as("n_reclaimable"),
            sum(when(col("vto").isNull, 1L).otherwise(0L))
              .cast("bigint").as("n_live_heads"))
          .withColumn("reclaim_bp", expr("n_reclaimable * 10000 DIV n_versions"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH v AS (
          SELECT o_custkey, o_orderkey, o_orderpriority,
                 epoch_ms(o_orderdate) AS vfrom,
                 lead(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey
                   ORDER BY epoch_ms(o_orderdate), o_orderkey) AS vto
          FROM orders),
        c AS (SELECT max(vfrom) - 14 * 86400000 AS cutoff FROM v)
        SELECT o_orderpriority, count(*) AS n_versions,
               CAST(sum(CASE WHEN vto IS NOT NULL AND vto < c.cutoff
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_reclaimable,
               CAST(sum(CASE WHEN vto IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_live_heads,
               CAST(sum(CASE WHEN vto IS NOT NULL AND vto < c.cutoff
                 THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS reclaim_bp
        FROM v, c
        GROUP BY o_orderpriority, c.cutoff ORDER BY o_orderpriority""")),

    QDef("q160_grid_coverage",
      (s, dir) => {
        val z = 6
        val boxes = t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 180).cast("double").as("min_lng"),
            (col("r_regionkey") * 72 - 108).cast("double").as("max_lng"))
          .withColumn("x1", QuadKey.tileX(col("min_lng"), z))
          .withColumn("x2", QuadKey.tileX(col("max_lng") - lit(0.001), z))
          .withColumn("y1", QuadKey.tileY(lit(60.0) - lit(0.001), z))
          .withColumn("y2", QuadKey.tileY(lit(-60.0), z))
          .withColumn("total_tiles",
            expr("(x2 - x1 + 1) * (y2 - y1 + 1)"))
        val occ = t(s, dir, "events")
          .select(SyntheticGeo.lng.as("lng"), SyntheticGeo.lat.as("lat"))
          .where(col("lat") >= -60 && col("lat") < 60)
          .select(QuadKey.tileX(col("lng"), z).as("x"),
            QuadKey.tileY(col("lat"), z).as("y"))
          .distinct()
        val counts = occ.join(broadcast(boxes),
            col("x") >= col("x1") && col("x") <= col("x2") &&
              col("y") >= col("y1") && col("y") <= col("y2"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("occupied_tiles"))
        // LEFT from the AOI side: zero-coverage AOIs are the audit's point
        boxes.join(counts, Seq("r_name"), "left")
          .na.fill(0L, Seq("occupied_tiles"))
          .withColumn("coverage_bp",
            expr("occupied_tiles * 10000 DIV total_tiles"))
          .select("r_name", "total_tiles", "occupied_tiles", "coverage_bp")
          .orderBy("r_name")
      },
      Some {
        val lngE = SyntheticGeo.lngSql
        val latE = SyntheticGeo.latSql
        s"""
        WITH boxes AS (
          SELECT r_regionkey, r_name,
                 CAST(r_regionkey * 72 - 180 AS DOUBLE) AS min_lng,
                 CAST(r_regionkey * 72 - 108 AS DOUBLE) AS max_lng
          FROM region),
        bt AS (
          SELECT r_name,
                 ${QuadKey.tileXSql("min_lng", 6)} AS x1,
                 ${QuadKey.tileXSql("(max_lng - 0.001)", 6)} AS x2,
                 ${QuadKey.tileYSql("(60.0 - 0.001)", 6)} AS y1,
                 ${QuadKey.tileYSql("(-60.0)", 6)} AS y2
          FROM boxes),
        btt AS (SELECT r_name, x1, x2, y1, y2,
                       (x2 - x1 + 1) * (y2 - y1 + 1) AS total_tiles FROM bt),
        occ AS (
          SELECT DISTINCT ${QuadKey.tileXSql("lng", 6)} AS x,
                          ${QuadKey.tileYSql("lat", 6)} AS y
          FROM (SELECT $lngE AS lng, $latE AS lat FROM events)
          WHERE lat >= -60 AND lat < 60),
        counts AS (
          SELECT b.r_name, count(*) AS occupied_tiles
          FROM occ o JOIN btt b ON o.x >= b.x1 AND o.x <= b.x2
                               AND o.y >= b.y1 AND o.y <= b.y2
          GROUP BY b.r_name)
        SELECT b.r_name, b.total_tiles,
               CAST(coalesce(c.occupied_tiles, 0) AS BIGINT) AS occupied_tiles,
               CAST(coalesce(c.occupied_tiles, 0) AS BIGINT) * 10000
                 // b.total_tiles AS coverage_bp
        FROM btt b LEFT JOIN counts c ON b.r_name = c.r_name
        ORDER BY b.r_name"""
      })
  )
}
