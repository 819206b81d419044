package graft.queries

import graft.Tables.t
import graft.geo.{Distance, Mercator, QuadKey, SyntheticGeo}
import graft.operators.GridOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2B geospatial — PostGIS/mercantile semantics re-expressed as Catalyst
  * column math over synthetic deterministic geography (SURVEY.md §3).
  * Reference analogs per query in SURVEY.md §2B. */
object QueriesB extends QueryPack {
  import Q._

  private val lngE = SyntheticGeo.lngSql
  private val latE = SyntheticGeo.latSql
  /** events + synthetic point columns (shared projection) */
  private def pts(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "events").withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q20
    // Point-in-bbox spatial join (listing∩AOI, managers.py:200): bbox dims
    // derived from region keys; dim side broadcast → no shuffle of points.
    QDef("q20_point_in_bbox_join",
      (s, dir) => {
        val boxes = t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 180).as("min_lng"),
            (col("r_regionkey") * 72 - 108).as("max_lng"))
        pts(s, dir)
          .join(broadcast(boxes),
            col("lng") >= col("min_lng") && col("lng") < col("max_lng") &&
              col("lat") >= -60 && col("lat") < 60)
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_points"), dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy("r_name")
      },
      Some(s"""
        WITH boxes AS (
          SELECT r_regionkey, r_name, r_regionkey*72 - 180 AS min_lng,
                 r_regionkey*72 - 108 AS max_lng FROM region),
        p AS (SELECT *, $lngE AS lng, $latE AS lat FROM events)
        SELECT r_name, count(*) AS n_points,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
        FROM p JOIN boxes ON lng >= min_lng AND lng < max_lng
                         AND lat >= -60 AND lat < 60
        GROUP BY r_name
        ORDER BY r_name""")),

    // ---------------------------------------------------------------- q21
    // lng/lat → z6 quadkey (bit-interleave) + per-tile rollup
    // (mercantile tiling, models.py:308 model_from_tile).
    QDef("q21_quadkey_agg",
      (s, dir) => {
        val z = 6
        pts(s, dir)
          .select(QuadKey.tileX(col("lng"), z).as("x"), QuadKey.tileY(col("lat"), z).as("y"),
            col("value"))
          .withColumn("qk", QuadKey.qkNum(col("x"), col("y"), z))
          .groupBy("qk", "x", "y")
          .agg(count(lit(1)).as("n"), dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy(col("n").desc, col("qk").asc)
          .limit(50)
      },
      Some(s"""
        WITH p AS (SELECT value, ${QuadKey.tileXSql(lngE, 6)} AS x,
                          ${QuadKey.tileYSql(latE, 6)} AS y FROM events),
        g AS (SELECT ${QuadKey.qkNumSql("x", "y", 6)} AS qk, x, y,
                     count(*) AS n, CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
              FROM p GROUP BY 1, 2, 3)
        SELECT qk, x, y, n, sum_value FROM g
        ORDER BY n DESC, qk ASC
        LIMIT 50""")),

    // ---------------------------------------------------------------- q22
    // Quadtree refinement (op_estimate_listings_or_divide, grids.py:20;
    // the quadkey→AOI-row CLI shell management/commands/
    // create-test-area.py:1 seeds the same tile universe):
    // split tiles with count > threshold into children, z3 → z7.
    QDef("q22_grid_subdivide",
      (s, dir) => {
        GridOps.subdivide(pts(s, dir), col("lng"), col("lat"), z0 = 3, zMax = 7, threshold = 200)
          .orderBy("z", "x", "y")
      },
      Some(GridOps.subdivideSql("SELECT $lngE AS lng, $latE AS lat FROM events"
          .replace("$lngE", lngE).replace("$latE", latE),
          "lng", "lat", z0 = 3, zMax = 7, threshold = 200) +
        " ORDER BY z, x, y")),

    // ---------------------------------------------------------------- q23
    // EPSG:4326 → 3857 forward + inverse roundtrip (utils/spatial.py:225).
    QDef("q23_reproject",
      (s, dir) => {
        pts(s, dir)
          .select(col("event_id"),
            round(Mercator.x3857(col("lng")), 2).as("x3857"),
            round(Mercator.y3857(col("lat")), 2).as("y3857"),
            (abs(Mercator.latOf(Mercator.y3857(col("lat"))) - col("lat")) < 1e-9 &&
              abs(Mercator.lngOf(Mercator.x3857(col("lng"))) - col("lng")) < 1e-9)
              .as("roundtrip_ok"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH p AS (SELECT event_id, $lngE AS lng, $latE AS lat FROM events)
        SELECT event_id,
               round(${Mercator.x3857Sql("lng")}, 2) AS x3857,
               round(${Mercator.y3857Sql("lat")}, 2) AS y3857,
               (abs(${Mercator.latOfSql(Mercator.y3857Sql("lat"))} - lat) < 1e-9 AND
                abs(${Mercator.lngOfSql(Mercator.x3857Sql("lng"))} - lng) < 1e-9) AS roundtrip_ok
        FROM p
        ORDER BY event_id""")),

    // ---------------------------------------------------------------- q25
    // The 100 TB spatial-join path: bboxes expand to covering z4 tiles,
    // points map to their z4 tile, EQUI-join on (x, y) + exact refilter —
    // no nested-loop scan, shuffles hash-partition on tile. Same output
    // as q20 (which keeps the broadcast-NLJ form for small dim sides).
    QDef("q25_tile_join",
      (s, dir) => {
        val z = 4
        val boxes = t(s, dir, "region")
          .select(col("r_name"),
            (col("r_regionkey") * 72 - 180).as("min_lng"),
            (col("r_regionkey") * 72 - 108).as("max_lng"))
        val tiles = boxes
          .withColumn("x", explode(sequence(
            QuadKey.tileX(col("min_lng"), z), QuadKey.tileX(col("max_lng"), z))))
          .withColumn("y", explode(sequence(
            QuadKey.tileY(lit(60.0), z), QuadKey.tileY(lit(-60.0), z))))
        val p = pts(s, dir)
          .withColumn("x", QuadKey.tileX(col("lng"), z))
          .withColumn("y", QuadKey.tileY(col("lat"), z))
        p.join(broadcast(tiles), Seq("x", "y"))
          .filter(col("lng") >= col("min_lng") && col("lng") < col("max_lng") &&
            col("lat") >= -60 && col("lat") < 60)
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_points"), dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy("r_name")
      },
      Some(s"""
        WITH boxes AS (
          SELECT r_name, r_regionkey*72 - 180 AS min_lng,
                 r_regionkey*72 - 108 AS max_lng FROM region),
        tiles AS (
          SELECT r_name, min_lng, max_lng, tx.x AS x, ty.y AS y
          FROM boxes,
               unnest(range(${QuadKey.tileXSql("min_lng", 4)},
                            ${QuadKey.tileXSql("max_lng", 4)} + 1)) AS tx(x),
               unnest(range(${QuadKey.tileYSql("60", 4)},
                            ${QuadKey.tileYSql("-60", 4)} + 1)) AS ty(y)),
        p AS (SELECT value, $lngE AS lng, $latE AS lat,
                     ${QuadKey.tileXSql(lngE, 4)} AS x,
                     ${QuadKey.tileYSql(latE, 4)} AS y
              FROM events)
        SELECT r_name, count(*) AS n_points,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
        FROM p JOIN tiles USING (x, y)
        WHERE lng >= min_lng AND lng < max_lng AND lat >= -60 AND lat < 60
        GROUP BY r_name
        ORDER BY r_name""")),

    // ---------------------------------------------------------------- q26
    // Spatial upsert — the faithful register_listings_from_response
    // (workunits.py:124): per-user latest position per epoch; merge where
    // "moved" means PLANAR EPSG:3857 distance > threshold (meters), with
    // the movement record (from/to distance) the reference stores in
    // `notes`. q06 is the generic value-delta form of the same operator.
    QDef("q26_spatial_upsert",
      (s, dir) => {
        val thresholdM = 500 * 1000.0 // 500 km in 3857 meters
        val splitMs = Q.millisOf("2024-01-15 00:00:00")
        val ev = pts(s, dir).withColumn("ts_ms", expr(Q.tsMs))
        def latest(df: org.apache.spark.sql.DataFrame, px: String, py: String) =
          graft.operators.Relational.latestSnapshot(df,
              Seq(col("user_id")), Seq(col("ts_ms"), col("event_id")))
            .select(col("user_id"),
              Mercator.x3857(col("lng")).as(px), Mercator.y3857(col("lat")).as(py))
        val cur = latest(ev.filter(col("ts_ms") < splitMs), "cx", "cy")
        val upd = latest(ev.filter(col("ts_ms") >= splitMs), "ux", "uy")
        val dist = sqrt((col("ux") - col("cx")) * (col("ux") - col("cx")) +
          (col("uy") - col("cy")) * (col("uy") - col("cy")))
        upd.join(cur.withColumn("_matched", lit(true)), Seq("user_id"), "left_outer")
          .withColumn("dist_m", round(dist, 3))
          .withColumn("status",
            when(col("_matched").isNull, lit("created"))
              .when(col("dist_m") > thresholdM, lit("moved"))
              .otherwise(lit("unchanged")))
          .select(col("user_id"), col("status"), col("dist_m"),
            round(col("cx"), 2).as("from_x"), round(col("cy"), 2).as("from_y"),
            round(col("ux"), 2).as("to_x"), round(col("uy"), 2).as("to_y"))
          .orderBy("user_id")
      },
      Some {
        def latestSql(cond: String) = s"""
          SELECT user_id, ${Mercator.x3857Sql("lng")} AS px, ${Mercator.y3857Sql("lat")} AS py
          FROM (SELECT user_id, $lngE AS lng, $latE AS lat,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
                FROM events WHERE $cond)
          WHERE rn = 1"""
        s"""
        WITH cur AS (${latestSql("epoch_ms(ts) < epoch_ms(TIMESTAMP '2024-01-15 00:00:00')")}),
        upd AS (${latestSql("epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-15 00:00:00')")}),
        m AS (
          SELECT u.user_id AS user_id, c.px AS cx, c.py AS cy, u.px AS ux, u.py AS uy,
                 round(sqrt((u.px - c.px) * (u.px - c.px) + (u.py - c.py) * (u.py - c.py)), 3) AS dist_m,
                 c.user_id IS NULL AS is_new
          FROM upd u LEFT JOIN cur c ON u.user_id = c.user_id)
        SELECT user_id,
               CASE WHEN is_new THEN 'created'
                    WHEN dist_m > ${500 * 1000.0} THEN 'moved'
                    ELSE 'unchanged' END AS status,
               dist_m,
               round(cx, 2) AS from_x, round(cy, 2) AS from_y,
               round(ux, 2) AS to_x, round(uy, 2) AS to_y
        FROM m
        ORDER BY user_id"""
      }),

    // ---------------------------------------------------------------- q27
    // Estimated-listings validity guard (workunits.py qk_estimated_
    // listings): a tile's estimate only counts when its price-histogram
    // sum is positive — otherwise the metadata is deemed invalid and the
    // estimate is zeroed. Histogram sum from the purchase-value proxy.
    QDef("q27_estimate_guard",
      (s, dir) => {
        val z = 6
        pts(s, dir)
          .select(QuadKey.tileX(col("lng"), z).as("x"), QuadKey.tileY(col("lat"), z).as("y"),
            col("event_type"), col("value"))
          .groupBy("x", "y")
          .agg(count(lit(1)).as("estimated"),
            dec38(sum(when(col("event_type") === "purchase", dec(col("value")))
              .otherwise(lit(0).cast(decSql.toLowerCase)))).as("hist_sum"))
          .withColumn("validated_estimate",
            when(col("hist_sum") > 0, col("estimated")).otherwise(lit(0L)))
          .orderBy("x", "y")
      },
      Some(s"""
        WITH p AS (SELECT event_type, value, ${QuadKey.tileXSql(lngE, 6)} AS x,
                          ${QuadKey.tileYSql(latE, 6)} AS y FROM events),
        g AS (SELECT x, y, count(*) AS estimated,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN CAST(value AS $decSql) ELSE CAST(0 AS $decSql) END)
                          AS $dec38Sql) AS hist_sum
              FROM p GROUP BY x, y)
        SELECT x, y, estimated, hist_sum,
               CASE WHEN hist_sum > 0 THEN estimated ELSE 0 END AS validated_estimate
        FROM g
        ORDER BY x, y""")),

    // ---------------------------------------------------------------- q28
    // ST_Union analog (managers.py aoi_shapes union): merge overlapping
    // per-user activity intervals into islands (cumulative-max window —
    // one shuffle on the key, no pairwise interval join) and report the
    // covered/total extent. Interval ends are pure integer arithmetic so
    // the merge is oracle-exact.
    QDef("q28_interval_union",
      (s, dir) => {
        val iv = t(s, dir, "events")
          .withColumn("ts_ms", expr(Q.tsMs))
          .select(col("user_id"), col("ts_ms").as("s"),
            (col("ts_ms") + (col("event_id") % 3600 + 60) * 1000L).as("e"))
        val wOrd = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
        val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        iv
          .withColumn("prev_e", max(col("e")).over(wPrev))
          .withColumn("new_island",
            when(col("prev_e").isNull || col("s") > col("prev_e"), 1).otherwise(0))
          .withColumn("island", sum(col("new_island")).over(wRun))
          .groupBy("user_id", "island")
          .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("is_e") - col("is_s")).cast("bigint").as("covered_ms"),
            (max(col("is_e")) - min(col("is_s"))).as("span_ms"))
          .orderBy("user_id")
      },
      Some("""
        WITH iv AS (
          SELECT user_id, epoch_ms(ts) AS s,
                 epoch_ms(ts) + (event_id % 3600 + 60) * 1000 AS e
          FROM events),
        flagged AS (
          SELECT user_id, s, e,
                 max(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
          FROM iv),
        isl AS (
          SELECT user_id, s, e,
                 CAST(sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
          FROM flagged),
        islands AS (
          SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
          FROM isl GROUP BY user_id, island)
        SELECT user_id, count(*) AS n_islands,
               CAST(sum(is_e - is_s) AS BIGINT) AS covered_ms,
               max(is_e) - min(is_s) AS span_ms
        FROM islands
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q24
    // Consecutive-position movement per user: haversine distance + the
    // significally-moved threshold (spatial.py:179, workunits.py:124).
    QDef("q24_distance",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(expr("ts DIV 1000000"), col("event_id"))
        val moved = pts(s, dir)
          .withColumn("p_lat", lag(col("lat"), 1).over(w))
          .withColumn("p_lng", lag(col("lng"), 1).over(w))
          .filter(col("p_lat").isNotNull)
          .withColumn("km", round(
            Distance.haversineKm(col("p_lat"), col("p_lng"), col("lat"), col("lng")), 3))
        moved.groupBy("user_id")
          .agg(count(lit(1)).as("n_moves"),
            count(when(col("km") > 100.0, 1)).as("n_big_moves"),
            dec38(sum(col("km").cast("decimal(18,3)"))).as("sum_km"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, $lngE AS lng, $latE AS lat
                   FROM events),
        m AS (SELECT user_id,
                lag(lat) OVER w AS p_lat, lag(lng) OVER w AS p_lng, lat, lng
              FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        d AS (SELECT user_id,
                round(${Distance.haversineKmSql("p_lat", "p_lng", "lat", "lng")}, 3) AS km
              FROM m WHERE p_lat IS NOT NULL)
        SELECT user_id, count(*) AS n_moves,
               count(CASE WHEN km > 100.0 THEN 1 END) AS n_big_moves,
               CAST(sum(CAST(km AS DECIMAL(18,3))) AS $dec38Sql) AS sum_km
        FROM d
        GROUP BY user_id
        ORDER BY user_id""")),
  )
}
