package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 83 — geospatial statistics and
  * grid-index operations on the integer synthetic coordinates (the
  * numerators of SyntheticGeo — exact in both engines):
  *
  *  - q355: grid-accelerated spatial kNN — nearest 3 events to each of
  *    10 anchor cells via 3×3 candidate-cell rings then exact integer
  *    squared distance; the spatial-index kNN shape (brute force never
  *    leaves the ring).
  *  - q356: Moran's I spatial autocorrelation of event counts over a
  *    36×17 coarse grid with rook adjacency — centered values scaled by
  *    n (z = n·x−Σx) so the whole statistic is exact BIGINT up to one
  *    final quantized division. THE spatial-clustering test statistic.
  *  - q357: quadkey compaction — the INVERSE of q22's subdivision:
  *    complete sibling quads merged into their parent, three levels
  *    (z10→z7), per-level tile counts + coverage conservation; the
  *    reference's parent/child grid dedup
  *    (/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/grids.py:22).
  *  - q358: compass-sector profile — octant classification of events
  *    around a fixed center by pure integer comparisons (|dx| vs |dy|
  *    and signs — no atan2, no IEEE trig), counts + mean squared
  *    distance per sector.
  *
  * Reference analog: nearest listings to an AOI centroid, listing
  * clustering significance, grid compaction after estimate-driven
  * subdivision, directional survey coverage.
  */
object QueriesCL extends QueryPack {
  import Q._

  private val ixE = "(user_id * 47 + event_id * 13) % 36000"
  private val iyE = "(user_id * 31 + event_id * 7) % 17000"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q355
    QDef("q355_spatial_knn",
      (s, dir) => {
        val pts = t(s, dir, "events")
          .selectExpr("event_id", s"$ixE AS ix", s"$iyE AS iy")
          .withColumn("cx", expr("ix DIV 1000"))
          .withColumn("cy", expr("iy DIV 1000"))
        // 10 anchors at fixed cell centers spread over the grid
        val anchors = (0 until 10).map { a =>
          (a.toLong, (a * 3400 + 1700) % 36000L, (a * 1500 + 800) % 17000L)
        }
        val aDf = s.createDataFrame(anchors).toDF("a_id", "ax", "ay")
          .withColumn("acx", expr("ax DIV 1000"))
          .withColumn("acy", expr("ay DIV 1000"))
          .withColumn("dcx", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dcy", explode(array(lit(-1), lit(0), lit(1))))
          .selectExpr("a_id", "ax", "ay", "acx + dcx AS cx", "acy + dcy AS cy")
        val w = Window.partitionBy("a_id").orderBy(col("d2"), col("event_id"))
        pts.join(aDf, Seq("cx", "cy"))
          .withColumn("d2",
            expr("(ix - ax) * (ix - ax) + (iy - ay) * (iy - ay)"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 3)
          .select(col("a_id"), col("rn"), col("event_id"), col("d2"))
          .orderBy("a_id", "rn")
      },
      Some {
        val anchors = (0 until 10).map { a =>
          s"(${a}, ${(a * 3400 + 1700) % 36000}, ${(a * 1500 + 800) % 17000})"
        }.mkString(", ")
        s"""
        WITH pts AS (
          SELECT event_id, $ixE AS ix, $iyE AS iy,
                 ($ixE) // 1000 AS cx, ($iyE) // 1000 AS cy
          FROM events),
        anchors AS (
          SELECT a_id, ax, ay, ax // 1000 + dcx AS cx, ay // 1000 + dcy AS cy
          FROM (VALUES $anchors) a(a_id, ax, ay),
               (VALUES (-1), (0), (1)) dx(dcx),
               (VALUES (-1), (0), (1)) dy(dcy)),
        scored AS (
          SELECT a_id, event_id,
                 (ix - ax) * (ix - ax) + (iy - ay) * (iy - ay) AS d2
          FROM pts JOIN anchors USING (cx, cy)),
        ranked AS (
          SELECT a_id, event_id, d2,
                 CAST(row_number() OVER (PARTITION BY a_id
                   ORDER BY d2, event_id) AS BIGINT) AS rn
          FROM scored)
        SELECT CAST(a_id AS BIGINT) AS a_id, rn, event_id, d2
        FROM ranked WHERE rn <= 3 ORDER BY a_id, rn"""
      }),

    // --------------------------------------------------------------- q356
    QDef("q356_morans_i",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .selectExpr(s"($ixE) DIV 1000 AS gx", s"($iyE) DIV 1000 AS gy")
          .groupBy("gx", "gy").agg(count(lit(1)).as("x")).cache()
        cells.count()
        val tot = cells.agg(count(lit(1)).as("n"),
          sum("x").cast("bigint").as("sx"))
        val z = cells.crossJoin(broadcast(tot))
          .selectExpr("gx", "gy", "n * x - sx AS z", "n", "sx")
        val pairs = z.toDF("gx", "gy", "z", "n", "sx")
          .join(z.selectExpr("gx AS hx", "gy AS hy", "z AS zn"),
            expr("""(abs(gx - hx) = 1 AND gy = hy)
                 OR (gx = hx AND abs(gy - hy) = 1)"""))
        val num = pairs.agg(count(lit(1)).as("w_sum"),
          expr("CAST(sum(z * zn) AS BIGINT)").as("cross_sum"))
        val den = z.agg(expr("CAST(sum(z * z) AS BIGINT)").as("z2_sum"),
          max("n").cast("bigint").as("n"))
        num.crossJoin(broadcast(den))
          .selectExpr("n", "w_sum", "cross_sum", "z2_sum",
            """CAST(floor(CAST(n AS DOUBLE) * CAST(cross_sum AS DOUBLE)
               / CAST(w_sum AS DOUBLE) / CAST(z2_sum AS DOUBLE)
               * 1000000) AS BIGINT) AS morans_i_micro""")
      },
      Some(s"""
        WITH cells AS (
          SELECT ($ixE) // 1000 AS gx, ($iyE) // 1000 AS gy, count(*) AS x
          FROM events GROUP BY 1, 2),
        tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM cells),
        z AS (SELECT gx, gy, n * x - sx AS z FROM cells, tot),
        pairs AS (
          SELECT a.z AS z, b.z AS zn
          FROM z a JOIN z b
            ON (abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
            OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1)),
        num AS (
          SELECT count(*) AS w_sum, CAST(sum(z * zn) AS BIGINT) AS cross_sum
          FROM pairs),
        den AS (
          SELECT CAST(sum(z * z) AS BIGINT) AS z2_sum,
                 CAST(max(n) AS BIGINT) AS n
          FROM z, tot GROUP BY n)
        SELECT n, w_sum, cross_sum, z2_sum,
               CAST(floor(CAST(n AS DOUBLE) * CAST(cross_sum AS DOUBLE)
                 / CAST(w_sum AS DOUBLE) / CAST(z2_sum AS DOUBLE)
                 * 1000000) AS BIGINT) AS morans_i_micro
        FROM num, den""")),

    // --------------------------------------------------------------- q357
    QDef("q357_quadkey_compact",
      (s, dir) => {
        val z10 = t(s, dir, "events")
          .selectExpr(s"($ixE) * 1024 DIV 36000 AS tx",
            s"($iyE) * 1024 DIV 17000 AS ty")
          .distinct()
        // the distinct tile census is bounded by the z10 grid itself
        // (≤ 1024² tiles BY CONSTRUCTION, whatever the event volume), so
        // one distributed distinct feeds a driver-side 3-level compaction
        // (the q625 driver-finish pattern). The prior per-level
        // DataFrame chain re-evaluated each level's two subtrees —
        // exponential subtree blowup measured at 3.1 s of pure job
        // overhead at sf0.1 (all on a few-thousand-row census).
        // multiset semantics throughout (the SQL UNION ALL): a merged
        // parent can numerically collide with a kept child tile from the
        // finer zoom — both rows survive, exactly as in the oracle
        var cur: Seq[(Long, Long)] = z10.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val levels = Seq("z09", "z08", "z07").map { name =>
          // .iterator BEFORE .collect: collect on a Map with a
          // pair-producing function rebuilds a MAP and silently collapses
          // parents sharing a px — the sf1 parity gate caught this (1024
          // full parents -> 446 "distinct px" at the dense sf1 census)
          val full = cur.groupBy { case (x, y) => (x / 2, y / 2) }
            .iterator.collect { case (p, ch) if ch.size == 4 => p }.toSet
          val kept = cur.filterNot { case (x, y) => full.contains((x / 2, y / 2)) }
          cur = full.toSeq ++ kept
          (name, cur.size.toLong, full.size.toLong)
        }
        val sc0 = s
        import sc0.implicits._
        levels.toDF("level", "n_tiles", "n_merged")
          .orderBy(col("level").desc)
      },
      Some(s"""
        WITH z10 AS (
          SELECT DISTINCT ($ixE) * 1024 // 36000 AS tx,
                 ($iyE) * 1024 // 17000 AS ty
          FROM events),
        f9 AS (SELECT tx // 2 AS px, ty // 2 AS py FROM z10
               GROUP BY 1, 2 HAVING count(*) = 4),
        l9 AS (SELECT px AS tx, py AS ty FROM f9
               UNION ALL
               SELECT tx, ty FROM z10
               WHERE NOT EXISTS (SELECT 1 FROM f9
                 WHERE px = tx // 2 AND py = ty // 2)),
        f8 AS (SELECT tx // 2 AS px, ty // 2 AS py FROM l9
               GROUP BY 1, 2 HAVING count(*) = 4),
        l8 AS (SELECT px AS tx, py AS ty FROM f8
               UNION ALL
               SELECT tx, ty FROM l9
               WHERE NOT EXISTS (SELECT 1 FROM f8
                 WHERE px = tx // 2 AND py = ty // 2)),
        f7 AS (SELECT tx // 2 AS px, ty // 2 AS py FROM l8
               GROUP BY 1, 2 HAVING count(*) = 4),
        l7 AS (SELECT px AS tx, py AS ty FROM f7
               UNION ALL
               SELECT tx, ty FROM l8
               WHERE NOT EXISTS (SELECT 1 FROM f7
                 WHERE px = tx // 2 AND py = ty // 2))
        SELECT 'z09' AS level, (SELECT count(*) FROM l9) AS n_tiles,
               (SELECT count(*) FROM f9) AS n_merged
        UNION ALL
        SELECT 'z08', (SELECT count(*) FROM l8), (SELECT count(*) FROM f8)
        UNION ALL
        SELECT 'z07', (SELECT count(*) FROM l7), (SELECT count(*) FROM f7)
        ORDER BY level DESC""")),

    // --------------------------------------------------------------- q358
    QDef("q358_compass_sectors",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr(s"($ixE) - 18000 AS dx", s"($iyE) - 8500 AS dy")
          .where(expr("NOT (dx = 0 AND dy = 0)"))
          .selectExpr(
            """CASE
               WHEN dy >= 0 AND dx > 0 AND dy < dx THEN 'E-NE'
               WHEN dx > 0 AND dy >= dx THEN 'NE-N'
               WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 'N-NW'
               WHEN dy > 0 AND dy <= -dx THEN 'NW-W'
               WHEN dy <= 0 AND dx < 0 AND dy > dx THEN 'W-SW'
               WHEN dx < 0 AND dy <= dx THEN 'SW-S'
               WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 'S-SE'
               ELSE 'SE-E' END AS sector""",
            "dx * dx + dy * dy AS d2")
          .groupBy("sector")
          .agg(count(lit(1)).as("n"),
            expr("CAST(sum(d2) AS BIGINT)").as("sum_d2"))
          .selectExpr("sector", "n", "sum_d2", "sum_d2 DIV n AS mean_d2")
          .orderBy("sector")
      },
      Some(s"""
        WITH rel AS (
          SELECT ($ixE) - 18000 AS dx, ($iyE) - 8500 AS dy
          FROM events),
        cls AS (
          SELECT CASE
                 WHEN dy >= 0 AND dx > 0 AND dy < dx THEN 'E-NE'
                 WHEN dx > 0 AND dy >= dx THEN 'NE-N'
                 WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 'N-NW'
                 WHEN dy > 0 AND dy <= -dx THEN 'NW-W'
                 WHEN dy <= 0 AND dx < 0 AND dy > dx THEN 'W-SW'
                 WHEN dx < 0 AND dy <= dx THEN 'SW-S'
                 WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 'S-SE'
                 ELSE 'SE-E' END AS sector,
                 dx * dx + dy * dy AS d2
          FROM rel WHERE NOT (dx = 0 AND dy = 0))
        SELECT sector, count(*) AS n, CAST(sum(d2) AS BIGINT) AS sum_d2,
               CAST(sum(d2) AS BIGINT) // count(*) AS mean_d2
        FROM cls GROUP BY 1 ORDER BY 1"""))
  )
}
