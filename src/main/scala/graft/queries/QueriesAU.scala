package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions.{words, wordsSql}
import graft.geo.{QuadKey, SyntheticGeo}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 40 — raster algebra, contamination,
  * bipartite structure, windowed ranking:
  *
  *  - q186: focal (3×3 neighborhood) smoothing over the z6 tile raster —
  *    map-algebra focal sum via a 9-offset explode + re-aggregate (each
  *    tile SCATTERS its count to its neighbors, one shuffle on tile key;
  *    never a 9-way self-join). Top-50 hottest smoothed tiles. The
  *    raster counterpart of q145's hotspot clustering.
  *  - q187: train/eval contamination audit — documents hash-split with
  *    q55's portable split (train = h<80, eval = rest); per language, the
  *    share of the eval side's DISTINCT word-trigrams that also occur in
  *    train (contained_bp) and the novelty complement. The decontamination
  *    gate an LLM corpus pipeline runs before accepting an eval set.
  *  - q188: bipartite butterfly census on the order–part graph —
  *    butterflies (4-cycles) = Σ (support choose 2) over part pairs
  *    (support from q140's bounded pair fan-out); caterpillars (3-paths)
  *    = Σ over edges (deg_order−1)·(deg_part−1); bipartite clustering =
  *    4·butterflies / caterpillars in exact bp. Cohesion measure that
  *    needs no one-mode projection materialized.
  *  - q189: windowed top-k — tumbling 6-hour windows, top-3 event types
  *    per window by count (deterministic tiebreak). The batch-equivalent
  *    of a streaming per-window leaderboard materialized view (q71's
  *    windows + q02's ranking).
  *
  * Reference analog: focal smoothing = neighborhood-weighted grid heat
  * for AOI discovery; contamination = review-corpus eval hygiene;
  * butterflies = listing–user co-engagement cohesion; windowed top-k =
  * per-cycle hottest harvest targets.
  */
object QueriesAU extends QueryPack {
  import Q._

  private val lngE = SyntheticGeo.lngSql
  private val latE = SyntheticGeo.latSql

  def defs: Seq[QDef] = Seq(

    QDef("q186_focal_smooth",
      (s, dir) => {
        val tiles = t(s, dir, "events")
          .withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)
          .select(QuadKey.tileX(col("lng"), 6).as("x"),
            QuadKey.tileY(col("lat"), 6).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n"))
        val contrib = tiles
          .select(col("x"), col("y"), col("n"),
            explode(expr("sequence(-1, 1)")).as("dx"))
          .select(col("x"), col("y"), col("n"), col("dx"),
            explode(expr("sequence(-1, 1)")).as("dy"))
          .selectExpr("x + dx AS fx", "y + dy AS fy", "n",
            "CASE WHEN dx = 0 AND dy = 0 THEN 0 ELSE 1 END AS is_nb")
        val focal = contrib.groupBy("fx", "fy")
          .agg(sum("n").cast("bigint").as("focal_n"),
            sum(expr("is_nb * n")).cast("bigint").as("nb_n"),
            sum("is_nb").cast("bigint").as("n_nb_occupied"))
        tiles.join(focal,
            tiles("x") === focal("fx") && tiles("y") === focal("fy"))
          .selectExpr("x", "y", "n", "focal_n", "nb_n", "n_nb_occupied")
          .orderBy(col("focal_n").desc, col("x"), col("y"))
          .limit(50)
      },
      Some(s"""
        WITH p AS (SELECT ${QuadKey.tileXSql(lngE, 6)} AS x,
                          ${QuadKey.tileYSql(latE, 6)} AS y FROM events),
        tiles AS (SELECT x, y, count(*) AS n FROM p GROUP BY 1, 2),
        contrib AS (
          SELECT t.x + dx.d AS fx, t.y + dy.d AS fy, t.n,
                 CASE WHEN dx.d = 0 AND dy.d = 0 THEN 0 ELSE 1 END AS is_nb
          FROM tiles t,
               (SELECT unnest([-1, 0, 1]) AS d) dx,
               (SELECT unnest([-1, 0, 1]) AS d) dy),
        focal AS (
          SELECT fx, fy, CAST(sum(n) AS BIGINT) AS focal_n,
                 CAST(sum(is_nb * n) AS BIGINT) AS nb_n,
                 CAST(sum(is_nb) AS BIGINT) AS n_nb_occupied
          FROM contrib GROUP BY 1, 2)
        SELECT t.x AS x, t.y AS y, CAST(t.n AS BIGINT) AS n,
               f.focal_n AS focal_n, f.nb_n AS nb_n,
               f.n_nb_occupied AS n_nb_occupied
        FROM tiles t JOIN focal f ON t.x = f.fx AND t.y = f.fy
        ORDER BY focal_n DESC, x, y
        LIMIT 50""")),

    QDef("q187_contamination",
      (s, dir) => {
        val h = graft.functions.PortableHash.md5Long(col("doc_id"), salt = "split~") % 100
        val tri = t(s, dir, "documents")
          .withColumn("split", when(h < 80, "train").otherwise("eval"))
          .withColumn("w", words(col("text")))
          .where(size(col("w")) >= 3)
          .select(col("lang"), col("split"),
            explode(expr("sequence(0, size(w) - 3)")).as("i"), col("w"))
          .selectExpr("lang", "split",
            "concat_ws(' ', w[i], w[i+1], w[i+2]) AS tri")
          .distinct()
        val ev = tri.where(col("split") === "eval").select("lang", "tri")
        val tr = tri.where(col("split") === "train").select("lang", "tri")
        val contaminated = ev.join(tr, Seq("lang", "tri"), "left_semi")
          .groupBy("lang").agg(count(lit(1)).as("n_contained"))
        ev.groupBy("lang").agg(count(lit(1)).as("n_eval_trigrams"))
          .join(contaminated, Seq("lang"), "left")
          .selectExpr("lang", "n_eval_trigrams",
            "coalesce(n_contained, 0) AS n_contained",
            "coalesce(n_contained, 0) * 10000 DIV n_eval_trigrams AS contained_bp",
            "(n_eval_trigrams - coalesce(n_contained, 0)) * 10000 DIV n_eval_trigrams AS novelty_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT lang, doc_id, ${wordsSql("text")} AS w,
                 CASE WHEN ${graft.functions.PortableHash.md5LongSql(
                   "CAST(doc_id AS VARCHAR)", salt = "split~")} % 100 < 80
                   THEN 'train' ELSE 'eval' END AS split
          FROM documents),
        tri AS (
          SELECT DISTINCT lang, split,
                 w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
          FROM d, unnest(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        ev AS (SELECT lang, tri FROM tri WHERE split = 'eval'),
        tr AS (SELECT lang, tri FROM tri WHERE split = 'train'),
        cont AS (
          SELECT ev.lang AS lang, count(*) AS n_contained
          FROM ev WHERE EXISTS (
            SELECT 1 FROM tr WHERE tr.lang = ev.lang AND tr.tri = ev.tri)
          GROUP BY 1),
        tot AS (SELECT lang, count(*) AS n_eval_trigrams FROM ev GROUP BY 1)
        SELECT t.lang AS lang, t.n_eval_trigrams AS n_eval_trigrams,
               CAST(coalesce(c.n_contained, 0) AS BIGINT) AS n_contained,
               coalesce(c.n_contained, 0) * 10000 // t.n_eval_trigrams AS contained_bp,
               (t.n_eval_trigrams - coalesce(c.n_contained, 0)) * 10000
                 // t.n_eval_trigrams AS novelty_bp
        FROM tot t LEFT JOIN cont c ON t.lang = c.lang
        ORDER BY lang""")),

    QDef("q188_butterflies",
      (s, dir) => {
        // basket-array form (r11, the q140/q390 pattern): ONE ok-keyed
        // collect_set shuffle replaces the distinct exchange AND the
        // ok-keyed self-join — wedge pairs are enumerated MAP-SIDE from
        // the ≤7-part sorted basket, and the order degree is simply the
        // basket size (the r10 plan shuffled lp three more times for
        // pairs/dOrd/counts).
        val baskets = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .cache()
        baskets.count()
        val pairs = baskets
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"""))
            .as("pr"))
          .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("s"))
        val bf = pairs.agg(
          sum(expr("s * (s - 1) DIV 2")).cast("bigint").as("butterflies"))
        val lp = baskets.select(col("ok"), size(col("ps")).cast("bigint").as("do"),
          explode(col("ps")).as("pk"))
        val dPart = lp.groupBy("pk").agg(count(lit(1)).as("dp"))
        val cat = lp.join(dPart, "pk")
          .agg(count(lit(1)).as("n_edges"),
            sum(expr("(do - 1) * (dp - 1)")).cast("bigint").as("caterpillars"))
        val counts = baskets.agg(count(lit(1)).as("n_orders"))
          .crossJoin(dPart.agg(count(lit(1)).as("n_parts")))
        counts.crossJoin(bf).crossJoin(cat)
          .selectExpr("n_orders", "n_parts", "n_edges",
            "coalesce(butterflies, 0) AS butterflies",
            "coalesce(caterpillars, 0) AS caterpillars",
            """CASE WHEN coalesce(caterpillars, 0) > 0
               THEN 4 * coalesce(butterflies, 0) * 10000 DIV caterpillars
               ELSE 0 END AS bcc_bp""")
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        pairs AS (
          SELECT a.pk AS p1, b.pk AS p2, count(*) AS s
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2),
        bf AS (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS butterflies FROM pairs),
        do_ AS (SELECT ok, count(*) AS dord FROM lp GROUP BY 1),
        dp_ AS (SELECT pk, count(*) AS dpart FROM lp GROUP BY 1),
        cat AS (
          SELECT count(*) AS n_edges,
                 CAST(sum((dord - 1) * (dpart - 1)) AS BIGINT) AS caterpillars
          FROM lp JOIN do_ ON lp.ok = do_.ok JOIN dp_ ON lp.pk = dp_.pk),
        cnt AS (SELECT count(DISTINCT ok) AS n_orders,
                       count(DISTINCT pk) AS n_parts FROM lp)
        SELECT CAST(n_orders AS BIGINT) AS n_orders,
               CAST(n_parts AS BIGINT) AS n_parts,
               CAST(n_edges AS BIGINT) AS n_edges,
               coalesce(butterflies, 0) AS butterflies,
               coalesce(caterpillars, 0) AS caterpillars,
               CASE WHEN coalesce(caterpillars, 0) > 0
                 THEN 4 * coalesce(butterflies, 0) * 10000 // caterpillars
                 ELSE 0 END AS bcc_bp
        FROM cnt, bf, cat""")),

    QDef("q189_stream_topk",
      (s, dir) => {
        val win = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 21600000 * 21600000 AS w_start")
          .groupBy("w_start", "event_type").agg(count(lit(1)).as("n"))
        win.withColumn("rk", row_number().over(
            Window.partitionBy("w_start").orderBy(col("n").desc, col("event_type"))))
          .where(col("rk") <= 3)
          .selectExpr("w_start", "CAST(rk AS BIGINT) AS rk", "event_type", "n")
          .orderBy("w_start", "rk")
      },
      Some("""
        WITH w AS (
          SELECT epoch_ms(ts) // 21600000 * 21600000 AS w_start, event_type,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT w_start, event_type, n,
                 row_number() OVER (PARTITION BY w_start
                   ORDER BY n DESC, event_type) AS rk
          FROM w)
        SELECT w_start, CAST(rk AS BIGINT) AS rk, event_type, CAST(n AS BIGINT) AS n
        FROM r WHERE rk <= 3 ORDER BY w_start, rk"""))
  )
}
