package graft.queries

import graft.Tables.t
import graft.dedup.Components
import graft.functions.TextFunctions
import graft.geo.{QuadKey, SyntheticGeo}
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 25:
  *
  *  - q143: LM likelihood scoring — per-document mean bigram conditional
  *    probability under the corpus bigram model (q57's table), all in
  *    exact basis-point arithmetic (no log/FP): the LM-based quality
  *    filter of a training-data pipeline, minus FP drift.
  *  - q144: one power-iteration step (w = Xᵀ(X·v₀)) over the embedding
  *    matrix with QUANTIZED-EXACT accumulation: inputs floor-quantized to
  *    milli-units, so every sum is an exact order-independent BIGINT —
  *    distributed matvec without FP nondeterminism. The PCA/top-eigenvector
  *    building block.
  *  - q145: spatial hotspot clustering — z6 tile counts over the synthetic
  *    point cloud, cells above an adaptive threshold, 8-neighbor adjacency
  *    edges, connected components (Components.labelPropagation both sides).
  *    DBSCAN-lite on a grid; the AOI-discovery shape.
  *  - q146: stream-stream LEFT OUTER interval join accounting (batch form):
  *    clicks matched by a purchase within 1 h vs timed-out, per day —
  *    the watermark-timeout accounting of StreamOps.intervalJoin; bucketed
  *    equi-join + exact refilter, never an inequality-only join.
  */
object QueriesAF extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q143_lm_score",
      (s, dir) => {
        val ex = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"), col("w"),
            explode(sequence(lit(0), size(col("w")) - 2)).as("i"))
          .select(col("doc_id"), expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
        val big = ex.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val uni = big.groupBy("w1").agg(sum("c2").cast("bigint").as("c1"))
        ex.join(big, Seq("w1", "w2")).join(uni, "w1")
          .withColumn("p_bp", expr("c2 * 10000 DIV c1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            expr("CAST(sum(p_bp) AS BIGINT) DIV count(*)").as("score_bp"))
          .orderBy(col("score_bp").desc, col("doc_id"))
          .limit(20)
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        s"""
        WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
        ex AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
               FROM d, unnest(range(1, len(w))) AS t(i)
               WHERE len(w) >= 2),
        big AS (SELECT w1, w2, count(*) AS c2 FROM ex GROUP BY 1, 2),
        uni AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM big GROUP BY 1)
        SELECT e.doc_id, count(*) AS n_bigrams,
               CAST(sum(b.c2 * 10000 // u.c1) AS BIGINT) // count(*) AS score_bp
        FROM ex e JOIN big b ON e.w1 = b.w1 AND e.w2 = b.w2
                  JOIN uni u ON e.w1 = u.w1
        GROUP BY 1
        ORDER BY score_bp DESC, doc_id
        LIMIT 20"""
      }),

    QDef("q144_power_iteration",
      (s, dir) => {
        val ex = t(s, dir, "embeddings")
          .select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("dim").cast("bigint").as("dim"),
            expr("CAST(floor(CAST(xf AS DOUBLE) * 1000) AS BIGINT)").as("xq"))
          .withColumn("v0", expr("(dim * 37) % 100 - 50"))
          .cache()
        ex.count() // eager: read twice below
        val sv = ex.groupBy("vec_id")
          .agg(sum(expr("xq * v0")).as("sv"))
        ex.join(sv, "vec_id")
          .groupBy("dim")
          .agg(sum(expr("xq * sv")).cast("bigint").as("w"))
          .orderBy("dim")
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq,
                 ((i - 1) * 37) % 100 - 50 AS v0
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        sv AS (SELECT vec_id, CAST(sum(xq * v0) AS BIGINT) AS sv
               FROM ex GROUP BY 1)
        SELECT ex.dim, CAST(sum(ex.xq * sv.sv) AS BIGINT) AS w
        FROM ex JOIN sv ON ex.vec_id = sv.vec_id
        GROUP BY 1 ORDER BY 1""")),

    QDef("q145_hotspot_cluster",
      (s, dir) => {
        val z = 6
        val cells = t(s, dir, "events")
          .select(SyntheticGeo.lng.as("lng"), SyntheticGeo.lat.as("lat"))
          .select(QuadKey.tileX(col("lng"), z).as("x"),
            QuadKey.tileY(col("lat"), z).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n"))
        val tot = cells.agg(sum("n").as("tot"))
        val hot = cells.crossJoin(broadcast(tot))
          .where(expr("n >= tot DIV 2048 + 2"))
          .withColumn("id", expr("x * 64 + y"))
          .cache()
        hot.count() // eager: used for edges AND stats below
        val nine = hot.select(col("id"), col("x"), col("y"),
          explode(expr("array(-1, 0, 1)")).as("dx"))
          .select(col("id"), col("y"), (col("x") + col("dx")).as("nx"),
            explode(expr("array(-1, 0, 1)")).as("dy"))
          .select(col("id"), col("nx"), (col("y") + col("dy")).as("ny"))
        val edges = nine
          .join(hot.select(col("id").as("nid"), col("x").as("nx"), col("y").as("ny")),
            Seq("nx", "ny"))
          .where(col("id") <= col("nid"))
          .select(col("id").as("id_a"), col("nid").as("id_b"))
        // node domain ≤ 4^z by construction → one-task union-find finish
        Components.unionFindBounded(edges, "id_a", "id_b")
          .join(hot.select(col("id"), col("n")), "id")
          .groupBy(col("lbl").as("cluster"))
          .agg(count(lit(1)).as("n_cells"),
            sum("n").cast("bigint").as("n_points"))
          .orderBy(col("n_cells").desc, col("cluster"))
          .limit(20)
      },
      Some {
        val edgesSql = s"""
          WITH pts_ AS (SELECT ${QuadKey.tileXSql(SyntheticGeo.lngSql, 6)} AS x,
                               ${QuadKey.tileYSql(SyntheticGeo.latSql, 6)} AS y
                        FROM events),
          cells_ AS (SELECT x, y, count(*) AS n FROM pts_ GROUP BY 1, 2),
          tot_ AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells_),
          hot_ AS (SELECT x, y, n, x * 64 + y AS id FROM cells_, tot_
                   WHERE n >= tot // 2048 + 2),
          nine_ AS (SELECT h.id, h.x + dx.dx AS nx, h.y + dy.dy AS ny
                    FROM hot_ h,
                         (VALUES (-1), (0), (1)) dx(dx),
                         (VALUES (-1), (0), (1)) dy(dy))
          SELECT n9.id AS id_a, h2.id AS id_b
          FROM nine_ n9 JOIN hot_ h2 ON n9.nx = h2.x AND n9.ny = h2.y
          WHERE n9.id <= h2.id"""
        s"""
        WITH pts2_ AS (SELECT ${QuadKey.tileXSql(SyntheticGeo.lngSql, 6)} AS x,
                              ${QuadKey.tileYSql(SyntheticGeo.latSql, 6)} AS y
                       FROM events),
        cells2_ AS (SELECT x, y, count(*) AS n FROM pts2_ GROUP BY 1, 2),
        tot2_ AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells2_),
        hot2_ AS (SELECT x, y, n, x * 64 + y AS id FROM cells2_, tot2_
                  WHERE n >= tot // 2048 + 2),
        lbls_ AS (${Components.labelPropagationSql(edgesSql)})
        SELECT l.lbl AS cluster, count(*) AS n_cells,
               CAST(sum(h.n) AS BIGINT) AS n_points
        FROM lbls_ l JOIN hot2_ h ON l.id = h.id
        GROUP BY 1
        ORDER BY n_cells DESC, cluster
        LIMIT 20"""
      }),

    QDef("q146_stream_outer_join",
      (s, dir) => {
        val h = 3600000L
        val ev = t(s, dir, "events")
        val clicks = ev.where(col("event_type") === "click")
          .selectExpr("user_id", s"$tsMs AS c_ts")
        val purch = ev.where(col("event_type") === "purchase")
          .selectExpr("user_id", s"$tsMs AS p_ts")
          .withColumn("bucket",
            explode(array(expr(s"p_ts DIV $h"), expr(s"p_ts DIV $h - 1"))))
        val withB = clicks.withColumn("bucket", expr(s"c_ts DIV $h"))
        val matched = withB.join(purch,
            withB("user_id") === purch("user_id") &&
              withB("bucket") === purch("bucket") &&
              purch("p_ts") > withB("c_ts") &&
              purch("p_ts") <= withB("c_ts") + h,
            "left_semi")
          .selectExpr(s"c_ts DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("n_matched"))
        clicks.selectExpr("c_ts DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("n_clicks"))
          .join(matched, Seq("day"), "left")
          .na.fill(0L, Seq("n_matched"))
          .selectExpr("day", "n_clicks", "n_matched",
            "n_clicks - n_matched AS n_timeout",
            "n_matched * 10000 DIV n_clicks AS match_bp")
          .orderBy("day")
      },
      Some("""
        WITH c AS (
          SELECT user_id, epoch_ms(ts) AS c_ts FROM events
          WHERE event_type = 'click'),
        p AS (
          SELECT user_id, epoch_ms(ts) AS p_ts FROM events
          WHERE event_type = 'purchase'),
        m AS (
          SELECT c.c_ts // 86400000 AS day, count(*) AS n_matched
          FROM c WHERE EXISTS (
            SELECT 1 FROM p WHERE p.user_id = c.user_id
              AND p.p_ts > c.c_ts AND p.p_ts <= c.c_ts + 3600000)
          GROUP BY 1),
        a AS (
          SELECT c_ts // 86400000 AS day, count(*) AS n_clicks FROM c GROUP BY 1)
        SELECT a.day, a.n_clicks,
               CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
               a.n_clicks - CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_timeout,
               CAST(coalesce(m.n_matched, 0) AS BIGINT) * 10000 // a.n_clicks AS match_bp
        FROM a LEFT JOIN m ON a.day = m.day
        ORDER BY a.day"""))
  )
}
