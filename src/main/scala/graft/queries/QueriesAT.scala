package graft.queries

import graft.Tables.t
import graft.geo.{QuadKey, SyntheticGeo}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 39 — robust stats, pyramid rollups,
  * graph structure:
  *
  *  - q182: winsorized mean — per event_type, clamp cents at exact-rank
  *    p05/p95 (percentile_disc ranks, `(n·p + 99) DIV 100` ceil), then
  *    integer means of raw vs clamped values. The outlier-resistant mean
  *    beside q131's MAD and q121's Tukey fences; all BIGINT.
  *  - q183: tile-pyramid rollup — z10 tile counts aggregated ONCE from
  *    points, then z8/z6 levels derived from the z10 aggregate by
  *    coordinate shift (`x >> 2` per 2-zoom hop) — the finest level is
  *    the only scan of the fact table; parents never rescan points.
  *    Conservation is visible in-output: total_points identical at every
  *    zoom. The slippy-map/heatmap serving layout (models.py:308 tiles).
  *  - q184: degree assortativity — Pearson r of endpoint degrees over the
  *    support≥2 co-occurrence graph (q140's edges), component sums exact
  *    BIGINT, one fixed IEEE op order for the final r (q133 pattern),
  *    floor-quantized micro. Positive r = hubs link hubs.
  *  - q185: triangle census — oriented a<b<c two-hop join + closing-edge
  *    semi-join over the same bounded graph; wedges from degrees; global
  *    clustering coefficient in exact bp. The oriented-edge join is the
  *    standard distributed triangle-count shape (work bounded by
  *    degree-ordered wedges, never all pairs).
  *
  * Reference analog: winsorize = price-outlier-resistant reporting;
  * pyramid = per-zoom grid count serving (grids.py); assortativity +
  * triangles = listing co-visibility graph structure (hub detection
  * beside q95's degree distribution).
  */
object QueriesAT extends QueryPack {
  import Q._

  private val lngE = SyntheticGeo.lngSql
  private val latE = SyntheticGeo.latSql

  /** support≥2 co-occurrence edges (a<b) over parts in the same order. */
  private def edges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    t(s, dir, "lineitem")
      // basket-array pair build (q140/q390 pattern): one collect_set
      // shuffle, pairs map-side from the <=7-part sorted basket
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
        .as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select("a", "b")
  }
  private val edgesSql = """
    lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)"""

  def defs: Seq[QDef] = Seq(

    QDef("q182_winsorize",
      (s, dir) => {
        val v = t(s, dir, "events").where(col("value").isNotNull)
          .selectExpr("event_type", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val ranked = v
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("vc", "event_id")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val cuts = ranked.groupBy("event_type")
          .agg(max("n").cast("bigint").as("n"),
            max(when(expr("rn = greatest(1, (n * 5 + 99) DIV 100)"), col("vc"))).as("p05_cents"),
            max(when(expr("rn = (n * 95 + 99) DIV 100"), col("vc"))).as("p95_cents"),
            sum("vc").cast("bigint").as("sraw"))
        v.join(broadcast(cuts), "event_type")
          .selectExpr("event_type", "n", "p05_cents", "p95_cents", "sraw",
            "least(greatest(vc, p05_cents), p95_cents) AS cv")
          .groupBy("event_type")
          .agg(max("n").as("n"), max("p05_cents").as("p05_cents"),
            max("p95_cents").as("p95_cents"),
            expr("max(sraw) DIV max(n)").as("mean_cents"),
            expr("CAST(sum(cv) AS BIGINT) DIV max(n)").as("wmean_cents"))
          .orderBy("event_type")
      },
      Some("""
        WITH v AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL),
        r AS (
          SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        cuts AS (
          SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                 max(CASE WHEN rn = greatest(1, (n * 5 + 99) // 100) THEN vc END) AS p05_cents,
                 max(CASE WHEN rn = (n * 95 + 99) // 100 THEN vc END) AS p95_cents,
                 CAST(sum(vc) AS BIGINT) AS sraw
          FROM r GROUP BY 1)
        SELECT v.event_type AS event_type, max(c.n) AS n,
               max(c.p05_cents) AS p05_cents, max(c.p95_cents) AS p95_cents,
               max(c.sraw) // max(c.n) AS mean_cents,
               CAST(sum(least(greatest(v.vc, c.p05_cents), c.p95_cents)) AS BIGINT)
                 // max(c.n) AS wmean_cents
        FROM v JOIN cuts c ON v.event_type = c.event_type
        GROUP BY 1 ORDER BY 1""")),

    QDef("q183_tile_pyramid",
      (s, dir) => {
        val g10 = t(s, dir, "events")
          .withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)
          .select(QuadKey.tileX(col("lng"), 10).as("x"),
            QuadKey.tileY(col("lat"), 10).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n"))
        def level(zoom: Int, shift: Int) = {
          val base = if (shift == 0) g10
            else g10.groupBy(expr(s"x DIV ${1 << shift}").as("px"),
              expr(s"y DIV ${1 << shift}").as("py"))
              .agg(sum("n").cast("bigint").as("n"))
          base.agg(count(lit(1)).as("n_tiles"),
              max("n").cast("bigint").as("max_tile_n"),
              sum("n").cast("bigint").as("total_points"))
            .select(lit(zoom.toLong).as("zoom"), col("n_tiles"),
              col("max_tile_n"), col("total_points"))
        }
        level(10, 0).unionAll(level(8, 2)).unionAll(level(6, 4)).orderBy("zoom")
      },
      Some(s"""
        WITH p AS (SELECT ${QuadKey.tileXSql(lngE, 10)} AS x,
                          ${QuadKey.tileYSql(latE, 10)} AS y FROM events),
        g10 AS (SELECT x, y, count(*) AS n FROM p GROUP BY 1, 2),
        g8 AS (SELECT x // 4 AS x, y // 4 AS y, CAST(sum(n) AS BIGINT) AS n
               FROM g10 GROUP BY 1, 2),
        g6 AS (SELECT x // 16 AS x, y // 16 AS y, CAST(sum(n) AS BIGINT) AS n
               FROM g10 GROUP BY 1, 2),
        lv AS (
          SELECT CAST(10 AS BIGINT) AS zoom, count(*) AS n_tiles,
                 CAST(max(n) AS BIGINT) AS max_tile_n,
                 CAST(sum(n) AS BIGINT) AS total_points FROM g10
          UNION ALL
          SELECT 8, count(*), CAST(max(n) AS BIGINT), CAST(sum(n) AS BIGINT) FROM g8
          UNION ALL
          SELECT 6, count(*), CAST(max(n) AS BIGINT), CAST(sum(n) AS BIGINT) FROM g6)
        SELECT zoom, n_tiles, max_tile_n, total_points FROM lv ORDER BY zoom""")),

    QDef("q184_assortativity",
      (s, dir) => {
        val e = edges(s, dir)
        e.cache()
        val nEdges = e.count()
        if (nEdges <= 2000000L) {
          // dual-path (the q457/q225 recipe, r11): degrees and the six
          // sufficient statistics run driver-side over the collected
          // repeat-pair census — one job instead of deg + 2 joins + agg.
          // Long arithmetic and double order match the frames below.
          val half = e.collect().map(r => (r.getLong(0), r.getLong(1)))
          val deg = (half.map(_._1) ++ half.map(_._2))
            .groupMapReduce(identity)(_ => 1L)(_ + _)
          var m = 0L; var sx = 0L; var sxx = 0L; var sxy = 0L
          half.foreach { case (a, b) =>
            val (x, y) = (deg(a), deg(b))
            // sym union: each edge contributes (x,y) and (y,x), so the
            // x- and y-marginals coincide
            m += 2; sx += x + y; sxx += x * x + y * y; sxy += 2 * x * y
          }
          val sc2 = s
          import sc2.implicits._
          if (m == 0) Seq((0L, Option.empty[Long]))
            .toDF("n_edges", "assort_micro")
          else {
            val num = m * sxy - sx * sx
            val dx = m * sxx - sx * sx
            val assort =
              if (dx > 0) Some(math.floor(num.toDouble /
                math.sqrt(dx.toDouble) / math.sqrt(dx.toDouble) * 1000000).toLong)
              else None
            Seq((m / 2, assort)).toDF("n_edges", "assort_micro")
          }
        } else {
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val pts = e
          .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
          .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
          .selectExpr("da AS x", "db AS y")
        val sym = pts.unionAll(pts.selectExpr("y AS x", "x AS y"))
        sym.agg(count(lit(1)).as("m"),
            sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
            sum(expr("x * x")).cast("bigint").as("sxx"),
            sum(expr("y * y")).cast("bigint").as("syy"),
            sum(expr("x * y")).cast("bigint").as("sxy"))
          .selectExpr("m DIV 2 AS n_edges",
            "m * sxy - sx * sy AS num",
            "m * sxx - sx * sx AS dx", "m * syy - sy * sy AS dy")
          .selectExpr("n_edges",
            """CASE WHEN dx > 0 AND dy > 0 THEN CAST(floor(
                 CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE))
                   / sqrt(CAST(dy AS DOUBLE)) * 1000000) AS BIGINT)
               ELSE NULL END AS assort_micro""")
        }
      },
      Some(s"""
        WITH $edgesSql,
        deg AS (
          SELECT v, count(*) AS deg FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          GROUP BY 1),
        p AS (
          SELECT d1.deg AS x, d2.deg AS y
          FROM e JOIN deg d1 ON e.a = d1.v JOIN deg d2 ON e.b = d2.v),
        sym AS (SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p),
        c AS (
          SELECT count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM sym),
        nd AS (
          SELECT m // 2 AS n_edges, m * sxy - sx * sy AS num,
                 m * sxx - sx * sx AS dx, m * syy - sy * sy AS dy
          FROM c)
        SELECT CAST(n_edges AS BIGINT) AS n_edges,
               CASE WHEN dx > 0 AND dy > 0 THEN CAST(floor(
                 CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE))
                   / sqrt(CAST(dy AS DOUBLE)) * 1000000) AS BIGINT)
               ELSE NULL END AS assort_micro
        FROM nd""")),

    QDef("q185_triangles",
      (s, dir) => {
        val e = edges(s, dir).cache()
        val nEdges = e.count()
        // r11-advice gate: the driver loop enumerates oriented a→b→c
        // paths, so its work is wedge-bounded, not edge-bounded — a
        // near-complete graph under the 2M-edge gate would still stall
        // the driver for minutes. Compute wedges from the collected
        // degree map FIRST and only then enter the loop; a dense census
        // falls back to the distributed self-join below.
        val driverHalf = if (nEdges <= 2000000L)
          Some(e.collect().map(r => (r.getLong(0), r.getLong(1))))
        else None
        val driverDeg = driverHalf.map { half =>
          (half.map(_._1) ++ half.map(_._2))
            .groupMapReduce(identity)(_ => 1L)(_ + _)
        }
        val driverWedges = driverDeg.map(
          _.valuesIterator.map(d => d * (d - 1) / 2).sum)
        if (driverWedges.exists(_ <= 100000000L)) {
          // dual-path (the q457/q225 recipe, r11): wedges, the oriented
          // triangle count and the clustering ratio run driver-side over
          // the collected repeat-pair census — one job instead of the
          // e1⋈e2 self-join + semi-join + 3 rollups.
          val half = driverHalf.get
          val deg = driverDeg.get
          val wedges = driverWedges.get
          val eset = half.toSet
          val byA = half.groupMap(_._1)(_._2)
          var triangles = 0L
          for ((a, b) <- half;
               c <- byA.getOrElse(b, Array.empty[Long]) if eset((a, c)))
            triangles += 1
          val clustering =
            if (wedges > 0) 3L * triangles * 10000L / wedges else 0L
          val sc2 = s
          import sc2.implicits._
          Seq((deg.size.toLong, nEdges, wedges, triangles, clustering))
            .toDF("n_nodes", "n_edges", "wedges", "triangles",
              "clustering_bp")
        } else {
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val degStats = deg.agg(count(lit(1)).as("n_nodes"),
          sum(expr("deg * (deg - 1) DIV 2")).cast("bigint").as("wedges"))
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.b") === col("e2.a"))
          .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
          .join(e.selectExpr("a AS a", "b AS c"), Seq("a", "c"), "left_semi")
          .agg(count(lit(1)).as("triangles"))
        val ne = e.agg(count(lit(1)).as("n_edges"))
        degStats.crossJoin(tri).crossJoin(ne)
          .selectExpr("coalesce(n_nodes, 0) AS n_nodes", "n_edges",
            "coalesce(wedges, 0) AS wedges", "triangles",
            """CASE WHEN coalesce(wedges, 0) > 0
               THEN 3 * triangles * 10000 DIV wedges ELSE 0 END AS clustering_bp""")
        }
      },
      Some(s"""
        WITH $edgesSql,
        deg AS (
          SELECT v, count(*) AS deg FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          GROUP BY 1),
        ds AS (
          SELECT count(*) AS n_nodes,
                 CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges
          FROM deg),
        tri AS (
          SELECT count(*) AS triangles
          FROM e e1 JOIN e e2 ON e1.b = e2.a
          WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
        ne AS (SELECT count(*) AS n_edges FROM e)
        SELECT CAST(coalesce(n_nodes, 0) AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               coalesce(wedges, 0) AS wedges,
               CAST(triangles AS BIGINT) AS triangles,
               CASE WHEN coalesce(wedges, 0) > 0
                 THEN 3 * triangles * 10000 // wedges ELSE 0 END AS clustering_bp
        FROM ds, tri, ne"""))
  )
}
