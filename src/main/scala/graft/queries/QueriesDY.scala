package graft.queries

import graft.Tables.t
import graft.geo.PolyUnion
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 122 — geometry dissolve (the last
  * reference gap VERDICT r4 ranked #1):
  *
  *  - q503: AOI ST_Union / dissolve — per region, the union AREA of
  *    overlapping L-shaped AOI footprints (each nation contributes two
  *    overlapping integer rectangles), via the exact slab-sweep union
  *    in [[graft.geo.PolyUnion]]: sum-of-parts area (double-counts
  *    overlap) vs dissolved union area, and the overlap savings in bp.
  *    Reference analog: managers.py:221 `aggregate(union=
  *    ST_Union("geom_3857"))` — the dissolved-AOI coverage report the
  *    predicate-only q83 semi-join could not reproduce.
  *
  * Scale shape: AOI geometry is dimension-sized (a Django table in the
  * reference); all sweep windows are partitioned by (region, slab) and
  * the slab side of the cover join is broadcast. Facts never enter the
  * dissolve — they join against its output.
  */
object QueriesDY extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q503
    QDef("q503_aoi_union",
      (s, dir) => {
        val nat = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .selectExpr("r_regionkey", "r_name")), expr("n_regionkey = r_regionkey"))
          .selectExpr("r_name AS grp",
            "CAST((n_nationkey * 37) % 500 AS BIGINT) * 100 AS bx",
            "CAST((n_nationkey * 53) % 300 AS BIGINT) * 100 AS by")
        val rects = nat.select(col("grp"), explode(expr(
            """array(
               struct(bx AS x0, bx + 700 AS x1, by AS y0, by + 400 AS y1),
               struct(bx + 300 AS x0, bx + 1000 AS x1,
                      by + 200 AS y0, by + 600 AS y1))""")).as("r"))
          .select(col("grp"), col("r.x0"), col("r.x1"), col("r.y0"), col("r.y1"))
        PolyUnion.dissolveArea(rects, Seq("grp"))
          .selectExpr("grp AS region", "n_parts", "sum_part_area", "union_area",
            "(sum_part_area - union_area) * 10000 DIV sum_part_area AS overlap_bp")
          .orderBy("region")
      },
      Some(s"""
        WITH nat AS (
          SELECT r.r_name AS grp,
                 CAST((n.n_nationkey * 37) % 500 AS BIGINT) * 100 AS bx,
                 CAST((n.n_nationkey * 53) % 300 AS BIGINT) * 100 AS by
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
        rects AS (
          SELECT grp, bx AS x0, bx + 700 AS x1, by AS y0, by + 400 AS y1
          FROM nat
          UNION ALL
          SELECT grp, bx + 300, bx + 1000, by + 200, by + 600 FROM nat),
        dissolved AS (${PolyUnion.dissolveAreaSql("rects")})
        SELECT grp AS region, n_parts, sum_part_area, union_area,
               CAST((sum_part_area - union_area) * 10000 // sum_part_area
                 AS BIGINT) AS overlap_bp
        FROM dissolved ORDER BY region""")),

    // --------------------------------------------------------------- q504
    // WKT AOI ingestion end-to-end (add-aoi.py analog): WKT polygon
    // strings are BUILT from nation integers, pushed through
    // GeoIngest.parseWktPolygons → edge table → shoelace area, with a
    // deterministic corrupt cohort (nationkey % 7 == 3 gets a truncated
    // string) landing in the quarantine. The oracle computes the same
    // report straight from the source integers — a hash match proves
    // the parse→edges→shoelace round-trip reproduces ground truth.
    QDef("q504_wkt_aoi_ingest",
      (s, dir) => {
        val nat = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .selectExpr("r_regionkey", "r_name")),
            expr("n_regionkey = r_regionkey"))
          .selectExpr("n_nationkey AS id", "r_name AS region",
            "CAST((n_nationkey * 37) % 500 AS BIGINT) AS x0",
            "CAST((n_nationkey * 53) % 300 AS BIGINT) AS y0")
          .selectExpr("id", "region", "x0", "x0 + 7 AS x1", "y0", "y0 + 5 AS y1")
        val wkt = nat.withColumn("wkt",
          when(col("id") % 7 === 3, lit("POLYGON ((broken"))
            .otherwise(expr("""concat('POLYGON ((',
              x0, ' ', y0, ', ', x1, ' ', y0, ', ', x1, ' ', y1, ', ',
              x0, ' ', y1, ', ', x0, ' ', y0, '))')""")))
        val (verts, corrupt) =
          graft.sources.GeoIngest.parseWktPolygons(wkt, "id", "wkt")
        val segs = graft.sources.GeoIngest.edges(verts, "id")
        val perAoi = segs.groupBy("id").agg(
          count(lit(1)).as("n_edges"),
          sum(expr("CAST(x1 * y2 - x2 * y1 AS BIGINT)")).as("area2"))
        val okByRegion = nat.select("id", "region")
          .join(perAoi, "id")
          .groupBy("region").agg(count(lit(1)).as("n_ok"),
            sum("n_edges").cast("bigint").as("n_edges"),
            sum("area2").cast("bigint").as("area2_sum"))
        val corruptByRegion = nat.select("id", "region")
          .join(corrupt.select("id"), "id")
          .groupBy("region").agg(count(lit(1)).as("n_corrupt"))
        nat.select("region").distinct()
          .join(okByRegion, Seq("region"), "left")
          .join(corruptByRegion, Seq("region"), "left")
          .selectExpr("region",
            "coalesce(n_ok, CAST(0 AS BIGINT)) AS n_ok",
            "coalesce(n_corrupt, CAST(0 AS BIGINT)) AS n_corrupt",
            "coalesce(n_edges, CAST(0 AS BIGINT)) AS n_edges",
            "coalesce(area2_sum, CAST(0 AS BIGINT)) AS area2_sum")
          .orderBy("region")
      },
      Some("""
        WITH nat AS (
          SELECT n.n_nationkey AS id, r.r_name AS region
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey)
        SELECT region,
               CAST(sum(CASE WHEN id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ok,
               CAST(sum(CASE WHEN id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_corrupt,
               CAST(sum(CASE WHEN id % 7 <> 3 THEN 4 ELSE 0 END) AS BIGINT)
                 AS n_edges,
               CAST(sum(CASE WHEN id % 7 <> 3 THEN 70 ELSE 0 END) AS BIGINT)
                 AS area2_sum
        FROM nat GROUP BY 1 ORDER BY region""")),

    // --------------------------------------------------------------- q505
    // ST_Intersection with geometry output (managers.py:308's grid∩AOI,
    // clipped-shape form): each region's AOI footprint clipped by a
    // per-region viewport (itself two overlapping rects — the clip
    // side needs no pre-dissolve, the final dissolve collapses all
    // overlap). Per region: footprint area, viewport area, exact
    // intersection area, and the share of footprint inside (bp).
    QDef("q505_aoi_intersection",
      (s, dir) => {
        val nat = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .selectExpr("r_regionkey", "r_name")),
            expr("n_regionkey = r_regionkey"))
          .selectExpr("r_name AS grp", "r_regionkey AS rk",
            "CAST((n_nationkey * 37) % 500 AS BIGINT) * 100 AS bx",
            "CAST((n_nationkey * 53) % 300 AS BIGINT) * 100 AS by")
        val foot = nat.select(col("grp"), explode(expr(
            """array(
               struct(bx AS x0, bx + 700 AS x1, by AS y0, by + 400 AS y1),
               struct(bx + 300 AS x0, bx + 1000 AS x1,
                      by + 200 AS y0, by + 600 AS y1))""")).as("r"))
          .select(col("grp"), col("r.x0"), col("r.x1"), col("r.y0"), col("r.y1"))
        val win = nat.select(col("grp"), col("rk")).distinct()
          .select(col("grp"), explode(expr(
            """array(
               struct(rk * 9000 AS x0, rk * 9000 + 20000 AS x1,
                      rk * 5000 AS y0, rk * 5000 + 15000 AS y1),
               struct(rk * 9000 + 4000 AS x0, rk * 9000 + 24000 AS x1,
                      rk * 5000 + 3000 AS y0, rk * 5000 + 18000 AS y1))""")).as("r"))
          .selectExpr("grp", "CAST(r.x0 AS BIGINT) AS x0",
            "CAST(r.x1 AS BIGINT) AS x1", "CAST(r.y0 AS BIGINT) AS y0",
            "CAST(r.y1 AS BIGINT) AS y1")
        val SR = graft.geo.PolyUnion
        val footArea = SR.dissolveArea(foot, Seq("grp"))
          .selectExpr("grp", "union_area AS foot_area")
        val winArea = SR.dissolveArea(win, Seq("grp"))
          .selectExpr("grp", "union_area AS win_area")
        val inter = SR.intersectionArea(foot, win, Seq("grp"))
        footArea.join(winArea, "grp")
          .join(inter, Seq("grp"), "left")
          .selectExpr("grp AS region", "foot_area", "win_area",
            "coalesce(intersection_area, CAST(0 AS BIGINT)) AS inter_area",
            "coalesce(intersection_area, CAST(0 AS BIGINT)) * 10000 DIV foot_area AS inside_bp")
          .orderBy("region")
      },
      Some(s"""
        WITH nat AS (
          SELECT r.r_name AS grp, r.r_regionkey AS rk,
                 CAST((n.n_nationkey * 37) % 500 AS BIGINT) * 100 AS bx,
                 CAST((n.n_nationkey * 53) % 300 AS BIGINT) * 100 AS by
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
        foot AS (
          SELECT grp, bx AS x0, bx + 700 AS x1, by AS y0, by + 400 AS y1
          FROM nat
          UNION ALL
          SELECT grp, bx + 300, bx + 1000, by + 200, by + 600 FROM nat),
        win AS (
          SELECT grp, CAST(rk * 9000 AS BIGINT) AS x0,
                 CAST(rk * 9000 + 20000 AS BIGINT) AS x1,
                 CAST(rk * 5000 AS BIGINT) AS y0,
                 CAST(rk * 5000 + 15000 AS BIGINT) AS y1
          FROM (SELECT DISTINCT grp, rk FROM nat)
          UNION ALL
          SELECT grp, CAST(rk * 9000 + 4000 AS BIGINT),
                 CAST(rk * 9000 + 24000 AS BIGINT),
                 CAST(rk * 5000 + 3000 AS BIGINT),
                 CAST(rk * 5000 + 18000 AS BIGINT)
          FROM (SELECT DISTINCT grp, rk FROM nat)),
        clipped AS (
          SELECT f.grp, greatest(f.x0, w.x0) AS x0, least(f.x1, w.x1) AS x1,
                 greatest(f.y0, w.y0) AS y0, least(f.y1, w.y1) AS y1
          FROM foot f JOIN win w ON f.grp = w.grp
          WHERE greatest(f.x0, w.x0) < least(f.x1, w.x1)
            AND greatest(f.y0, w.y0) < least(f.y1, w.y1)),
        fa AS (${graft.geo.PolyUnion.dissolveAreaSql("foot")}),
        wa AS (${graft.geo.PolyUnion.dissolveAreaSql("win")}),
        ia AS (${graft.geo.PolyUnion.dissolveAreaSql("clipped")})
        SELECT fa.grp AS region, fa.union_area AS foot_area,
               wa.union_area AS win_area,
               CAST(coalesce(ia.union_area, 0) AS BIGINT) AS inter_area,
               CAST(coalesce(ia.union_area, 0) * 10000 // fa.union_area
                 AS BIGINT) AS inside_bp
        FROM fa JOIN wa ON fa.grp = wa.grp
        LEFT JOIN ia ON fa.grp = ia.grp
        ORDER BY region"""))
  )
}
