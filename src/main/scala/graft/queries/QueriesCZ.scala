package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 97 — weighted graph distance,
  * inventory economics, unseen-species estimation, reliability:
  *
  *  - q411: bounded Bellman–Ford single-source shortest paths over the
  *    weighted co-purchase graph (support≥2, integer weight
  *    1000 DIV support so stronger ties are shorter). Four relaxation
  *    rounds from the max-degree hub — each round is ONE equi-join +
  *    ONE min-aggregate (the Pregel/BSP shape: at 100 TB every round is
  *    a bounded shuffle keyed by vertex, never an all-pairs product).
  *    Oracle chains four explicit relaxation CTEs.
  *  - q412: newsvendor critical-fractile stocking — per-brand daily
  *    demand, q* = percentile_disc(cu/(cu+co)) with cu=3, co=1 by exact
  *    integer rank math (4·rn ≥ 3·n), then realized underage/overage
  *    cost at q* in exact BIGINT units. The inventory-economics twin of
  *    q311's knapsack.
  *  - q413: Chao1 unseen-vocabulary estimate per language — frequencies
  *    of frequencies (f1 singletons, f2 doubletons) from the corpus tf
  *    table; bias-corrected chao1 = V + f1·(f1−1) DIV (2·(f2+1)) and
  *    Good–Turing coverage 10000 − f1·10⁴ DIV N, all BIGINT. The "is
  *    more scraping going to find new vocabulary" gate beside q249's
  *    novelty curve.
  *  - q414: MTBF reliability ledger — per-user inter-error gaps (lag
  *    over (ms, event_id)), log2-binned gap minutes via
  *    `length(bin(x))` (zero FP); per-bin gap count, affected users,
  *    exact mean gap ms. The failure-cadence profile behind q238's
  *    error-budget burn.
  *
  * Reference analog: scrape-target reachability over co-visibility
  * links, harvest-capacity stocking per area, review-vocabulary
  * saturation, scraper failure-interval accounting.
  */
object QueriesCZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q411
    QDef("q411_bellman_ford",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          // basket-array pair build (q140/q390 pattern): one collect_set
          // shuffle, pairs map-side from the <=7-part sorted basket
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
            .as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2)
          .selectExpr("a", "b", "1000 DIV cnt AS w")
        e.cache()
        val nEdges = e.count()
        if (nEdges <= 2000000L) {
          // dual-path (the q457/q225 recipe, r11): the repeat-pair census
          // is tiny, so the 4 relaxation rounds run driver-side over the
          // collected weighted edge list — one job instead of 4 ×
          // (join + union + agg + checkpoint) rounds of pure job floor.
          // Integer math identical to the frames below.
          val half = e.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          val adjM = (half.map { case (a, b, w) => (a, (b, w)) } ++
            half.map { case (a, b, w) => (b, (a, w)) }).groupMap(_._1)(_._2)
          val sc2 = s
          import sc2.implicits._
          if (adjM.isEmpty) Seq.empty[(Long, Long)].toDF("node", "dist")
          else {
            val src = adjM.toSeq.map { case (u, vs) => (u, vs.size) }
              .minBy { case (u, d) => (-d, u) }._1
            var dist = Map(src -> 0L)
            for (_ <- 1 to 4) {
              val relax = dist.toSeq.flatMap { case (n, d) =>
                adjM.getOrElse(n, Array.empty[(Long, Long)])
                  .map { case (v, w) => (v, d + w) }
              }
              dist = (dist.toSeq ++ relax)
                .groupMapReduce(_._1)(_._2)(math.min)
            }
            dist.toSeq.map { case (n, d) => (n, d) }
              .sortBy { case (n, d) => (d, n) }.take(25)
              .toDF("node", "dist")
          }
        } else {
        val adj = e.select(col("a").as("u"), col("b").as("v"), col("w"))
          .union(e.select(col("b").as("u"), col("a").as("v"), col("w")))
        // cache: every relaxation round scans the adjacency; without it
        // the co-purchase aggregation re-derives 2^rounds times
        adj.cache(); adj.count()
        val src = adj.groupBy("u").agg(count(lit(1)).as("deg"))
          .orderBy(col("deg").desc, col("u")).limit(1)
          .select(col("u").as("node"), lit(0L).as("dist"))
        var dist = src
        for (_ <- 1 to 4) {
          val relax = dist.as("d")
            .join(adj.as("adj"), col("d.node") === col("adj.u"))
            .select(col("adj.v").as("node"),
              (col("d.dist") + col("adj.w")).as("dist"))
          // checkpoint per round: the union+agg otherwise doubles the
          // plan each iteration (the q426 lesson)
          dist = dist.union(relax)
            .groupBy("node").agg(min("dist").cast("bigint").as("dist"))
            .localCheckpoint()
        }
        dist.orderBy(col("dist"), col("node")).limit(25)
        }
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS cnt
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        ew AS (SELECT a, b, 1000 // cnt AS w FROM e),
        adj AS (SELECT a AS u, b AS v, w FROM ew
                UNION ALL SELECT b, a, w FROM ew),
        src AS (
          SELECT u AS node FROM (SELECT u, count(*) AS deg FROM adj GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 1),
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM src),
        d1 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT node, dist FROM d0
          UNION ALL SELECT adj.v, d0.dist + adj.w FROM d0 JOIN adj ON d0.node = adj.u)
          GROUP BY 1),
        d2 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT node, dist FROM d1
          UNION ALL SELECT adj.v, d1.dist + adj.w FROM d1 JOIN adj ON d1.node = adj.u)
          GROUP BY 1),
        d3 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT node, dist FROM d2
          UNION ALL SELECT adj.v, d2.dist + adj.w FROM d2 JOIN adj ON d2.node = adj.u)
          GROUP BY 1),
        d4 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT node, dist FROM d3
          UNION ALL SELECT adj.v, d3.dist + adj.w FROM d3 JOIN adj ON d3.node = adj.u)
          GROUP BY 1)
        SELECT node, dist FROM d4 ORDER BY dist, node LIMIT 25""")),

    // --------------------------------------------------------------- q412
    QDef("q412_newsvendor",
      (s, dir) => {
        val dem = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr("p_brand",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS d",
            "CAST(l_quantity AS BIGINT) AS q")
          .groupBy("p_brand", "d").agg(sum("q").cast("bigint").as("dd"))
        val wN = Window.partitionBy("p_brand")
        val wR = wN.orderBy(col("dd"), col("d"))
        val qs = dem
          .withColumn("rn", row_number().over(wR).cast("long"))
          .withColumn("n", count(lit(1)).over(wN).cast("long"))
          .where(col("rn") * 4 >= col("n") * 3)
          .groupBy("p_brand")
          .agg(min("dd").as("qstar"), max("n").as("n_days"))
        dem.join(qs, "p_brand")
          .groupBy("p_brand")
          .agg(max("n_days").as("n_days"), max("qstar").as("qstar"),
            sum(greatest(col("dd") - col("qstar"), lit(0L)) * 3)
              .cast("bigint").as("under_cost"),
            sum(greatest(col("qstar") - col("dd"), lit(0L)))
              .cast("bigint").as("over_cost"))
          .withColumn("total_cost",
            (col("under_cost") + col("over_cost")).cast("long"))
          .orderBy("p_brand")
      },
      Some("""
        WITH dem AS (
          SELECT p_brand, epoch_ms(l_shipdate) // 86400000 AS d,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dd
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        rk AS (
          SELECT p_brand, d, dd,
                 row_number() OVER (PARTITION BY p_brand ORDER BY dd, d) AS rn,
                 count(*) OVER (PARTITION BY p_brand) AS n
          FROM dem),
        qs AS (
          SELECT p_brand, min(dd) AS qstar, max(n) AS n_days
          FROM rk WHERE rn * 4 >= n * 3 GROUP BY 1)
        SELECT dem.p_brand,
               CAST(max(n_days) AS BIGINT) AS n_days,
               CAST(max(qstar) AS BIGINT) AS qstar,
               CAST(sum(greatest(dd - qstar, 0) * 3) AS BIGINT) AS under_cost,
               CAST(sum(greatest(qstar - dd, 0)) AS BIGINT) AS over_cost,
               CAST(sum(greatest(dd - qstar, 0) * 3)
                    + sum(greatest(qstar - dd, 0)) AS BIGINT) AS total_cost
        FROM dem JOIN qs ON dem.p_brand = qs.p_brand
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q413
    QDef("q413_chao1",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("lang"),
            explode(TextFunctions.words(col("text"))).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
          .groupBy("lang").agg(
            count(lit(1)).cast("long").as("vocab"),
            sum("tf").cast("bigint").as("n_tok"),
            sum(when(col("tf") === 1, 1L).otherwise(0L))
              .cast("bigint").as("f1"),
            sum(when(col("tf") === 2, 1L).otherwise(0L))
              .cast("bigint").as("f2"))
          .selectExpr("lang", "vocab", "n_tok", "f1", "f2",
            "vocab + (f1 * (f1 - 1)) DIV (2 * (f2 + 1)) AS chao1",
            "10000 - (f1 * 10000 DIV n_tok) AS coverage_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS tok
          FROM documents),
        tf AS (SELECT lang, tok, count(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(tf) AS BIGINT) AS n_tok,
               CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
               CAST(count(*)
                 + (sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
                    * (sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) - 1))
                   // (2 * (sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) + 1))
                 AS BIGINT) AS chao1,
               CAST(10000 - (sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) * 10000
                    // sum(tf)) AS BIGINT) AS coverage_bp
        FROM tf GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q414
    QDef("q414_mtbf",
      (s, dir) => {
        val err = t(s, dir, "events")
          .where(col("event_type") === "error")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ms"), col("event_id"))
        err.withColumn("prev", lag("ms", 1).over(w))
          .where(col("prev").isNotNull)
          .selectExpr("user_id", "ms - prev AS gap")
          .selectExpr("user_id", "gap",
            "CAST(length(bin((gap DIV 60000) + 1)) - 1 AS BIGINT) AS b")
          .groupBy("b").agg(
            count(lit(1)).cast("long").as("gaps"),
            countDistinct("user_id").cast("long").as("users"),
            sum("gap").cast("bigint").as("sum_gap_ms"))
          .withColumn("mean_gap_ms",
            expr("sum_gap_ms DIV gaps").cast("long"))
          .orderBy("b")
      },
      Some("""
        WITH err AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id
          FROM events WHERE event_type = 'error'),
        g AS (
          SELECT user_id,
                 ms - lag(ms, 1) OVER (PARTITION BY user_id
                                       ORDER BY ms, event_id) AS gap
          FROM err),
        b AS (
          SELECT user_id, gap,
                 length(bin((gap // 60000) + 1)) - 1 AS b
          FROM g WHERE gap IS NOT NULL)
        SELECT CAST(b AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS gaps,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users,
               CAST(sum(gap) AS BIGINT) AS sum_gap_ms,
               CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_ms
        FROM b GROUP BY 1 ORDER BY 1"""))
  )
}
