package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 101 — maximum subarray by prefix
  * windows, graph 2-colorability, robust location, system reliability:
  *
  *  - q427: maximum-subarray (Kadane) via the PREFIX-WINDOW form — the
  *    recurrence max_end(j) = max(0, max_end(j−1)) + x_j rewrites as
  *    pre_j − min(0, min_{i<j} pre_i), i.e. one running sum + one
  *    running min: fully window-parallel, no mapPartitions recurrence
  *    needed. Per type over centered daily counts; winner stretch
  *    (start/end day, sum) with earliest-end tiebreak and the start
  *    recovered by matching the end's running-min prefix. The "best
  *    harvest streak" report.
  *  - q428: bipartite / odd-cycle audit — BFS hop parity as a 2-coloring
  *    over the co-purchase graph (4 hops from the max-degree hub, q205's
  *    layers): a BFS edge joins equal or adjacent layers, so any
  *    SAME-LAYER edge witnesses an odd cycle. Per-layer intra edges +
  *    verdict. One dist build + one edge join.
  *  - q429: Hodges–Lehmann location estimator per type — lower median
  *    of all 465 Walsh averages (xᵢ+xⱼ)/2, i ≤ j, over the BOUNDED
  *    per-type daily aggregate, kept exact in doubled units; the
  *    rank-based robust center beside q131's MAD and q135's weighted
  *    median (this one is the R-estimator the Wilcoxon test inverts).
  *  - q430: k-of-n reliability — per hour-of-day, each monitor feed's
  *    presence rate p_c (days the (type,hour) cell saw traffic / days
  *    observed, micro), then P(≥2 of 3 feeds up) by inclusion–exclusion
  *    p₁p₂+p₁p₃+p₂p₃−2p₁p₂p₃ with floor-per-term integer divisions —
  *    redundancy math for the collection fleet's monitoring quorum.
  *
  * Reference analog: best uninterrupted harvest window, co-visibility
  * graph structure, robust per-type volume center, monitoring-quorum
  * availability per hour.
  */
object QueriesDD extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q427
    QDef("q427_kadane",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val base = daily
          .withColumn("mean_flr", expr(
            "sum(c) OVER (PARTITION BY event_type) DIV count(*) OVER (PARTITION BY event_type)"))
          .selectExpr("event_type", "d", "c - mean_flr AS delta")
        val wOrd = Window.partitionBy("event_type").orderBy("d")
        val pre = base
          .withColumn("pre", sum("delta").over(wOrd).cast("long"))
          .withColumn("runmin", least(lit(0L),
            coalesce(min("pre").over(
              wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))))
          .withColumn("best", col("pre") - col("runmin"))
        val win = pre
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("best").desc, col("d"))))
          .where(col("rk") === 1)
          .select(col("event_type"), col("d").as("end_d"),
            col("best").as("best_sum"), col("runmin").as("rm"))
        val start = win.as("w")
          .join(pre.as("p"), col("w.event_type") === col("p.event_type") &&
            col("p.d") < col("w.end_d") && col("p.pre") === col("w.rm"))
          .groupBy(col("w.event_type").as("event_type"))
          .agg(min(col("p.d")).as("after_min"))
        val minD = daily.groupBy("event_type").agg(min("d").as("d0"))
        win.join(start.withColumnRenamed("event_type", "et"),
            col("event_type") === col("et"), "left")
          .join(minD.withColumnRenamed("event_type", "et2"),
            col("event_type") === col("et2"))
          .selectExpr("event_type", "best_sum",
            "coalesce(after_min + 1, d0) AS start_d", "end_d")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        base AS (
          SELECT event_type, d,
                 c - (sum(c) OVER (PARTITION BY event_type)
                      // count(*) OVER (PARTITION BY event_type)) AS delta
          FROM daily),
        pre AS (
          SELECT event_type, d,
                 sum(delta) OVER (PARTITION BY event_type ORDER BY d) AS pre
          FROM base),
        pre2 AS (
          SELECT event_type, d, pre,
                 least(0, coalesce(min(pre) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                   AS runmin
          FROM pre),
        scored AS (
          SELECT event_type, d, pre, runmin, pre - runmin AS best,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY pre - runmin DESC, d) AS rk
          FROM pre2),
        win AS (SELECT event_type, d AS end_d, best AS best_sum, runmin AS rm
                FROM scored WHERE rk = 1),
        strt AS (
          SELECT w.event_type, min(p.d) AS after_min
          FROM win w JOIN pre2 p ON w.event_type = p.event_type
            AND p.d < w.end_d AND p.pre = w.rm
          GROUP BY 1),
        mind AS (SELECT event_type, min(d) AS d0 FROM daily GROUP BY 1)
        SELECT win.event_type, CAST(best_sum AS BIGINT) AS best_sum,
               CAST(coalesce(after_min + 1, d0) AS BIGINT) AS start_d,
               CAST(end_d AS BIGINT) AS end_d
        FROM win LEFT JOIN strt ON win.event_type = strt.event_type
                 JOIN mind ON win.event_type = mind.event_type
        ORDER BY win.event_type""")),

    // --------------------------------------------------------------- q428
    QDef("q428_bipartite_audit",
      (s, dir) => {
        // edge build via collect_set per order (the q464 pattern): one
        // map-side-combinable shuffle + a pair rollup replaces
        // distinct + ok-keyed self-join
        val e = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey"))
          .groupBy("ok")
          .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
          .select(col("pks"), posexplode(col("pks")).as(Seq("i", "a")))
          .select(col("a"), explode(slice(col("pks"), col("i") + lit(2),
            size(col("pks")))).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2).select("a", "b")
        e.cache()
        val nEdges = e.count()
        if (nEdges <= 2000000L) {
          // dual-path (the q216/Components pattern): the repeat-pair
          // census is orders of magnitude smaller than lineitem, so the
          // 4-hop BFS + per-layer edge rollup run driver-side — one job
          // instead of 4 × (join + distinct + anti-join) shuffle rounds
          // (r8: 3.2 s of job floors). Output is ≤ 5 layer rows.
          val half = e.collect().map(r => (r.getLong(0), r.getLong(1)))
          val adj = (half ++ half.map(_.swap))
            .groupMap(_._1)(_._2)
          val hop = scala.collection.mutable.Map.empty[Long, Long]
          if (adj.nonEmpty) {
            val hub = adj.map { case (u, vs) => (u, vs.size) }
              .minBy { case (u, d) => (-d, u) }._1
            hop(hub) = 0L
            var frontier = Seq(hub)
            for (h <- 1 to 4) {
              frontier = frontier.flatMap(adj(_)).distinct
                .filterNot(hop.contains)
              frontier.foreach(v => hop(v) = h.toLong)
            }
          }
          val rows = half.flatMap { case (a, b) =>
            for (ha <- hop.get(a); hb <- hop.get(b))
              yield (math.max(ha, hb), if (ha == hb) 1L else 0L)
          }
          val sc2 = s
          import sc2.implicits._
          rows.groupMapReduce(_._1)(r => (1L, r._2)) {
              case ((c1, i1), (c2, i2)) => (c1 + c2, i1 + i2) }
            .toSeq.map { case (layer, (edges, intra)) =>
              (layer, edges, intra, intra > 0) }
            .sortBy(_._1)
            .toDF("layer", "edges", "intra_edges", "odd_cycle_here")
        } else {
          // scale fallback: distributed BFS over the adjacency frame
          val adj = e.select(col("a").as("u"), col("b").as("v"))
            .union(e.select(col("b").as("u"), col("a").as("v")))
          val hub = adj.groupBy("u").agg(count(lit(1)).as("deg"))
            .orderBy(col("deg").desc, col("u")).limit(1)
            .select(col("u").as("node"), lit(0L).as("hop"))
            .localCheckpoint()
          var dist = hub
          for (h <- 1 to 4) {
            val nxt = dist.where(col("hop") === (h - 1))
              .withColumnRenamed("node", "u").join(adj, Seq("u"))
              .select(col("v").as("cand")).distinct()
              .join(dist, col("cand") === col("node"), "left_anti")
              .select(col("cand").as("node"), lit(h.toLong).as("hop"))
            dist = dist.union(nxt).localCheckpoint()
          }
          val du = dist.select(col("node").as("a"), col("hop").as("ha"))
          val dv = dist.select(col("node").as("b"), col("hop").as("hb"))
          val classified = e.join(du, Seq("a")).join(dv, Seq("b"))
            .selectExpr("ha", "hb",
              "CASE WHEN ha = hb THEN 1 ELSE 0 END AS intra")
          classified
            .groupBy(greatest(col("ha"), col("hb")).as("layer"))
            .agg(count(lit(1)).cast("long").as("edges"),
              sum("intra").cast("long").as("intra_edges"))
            .withColumn("odd_cycle_here", col("intra_edges") > 0)
            .orderBy("layer")
        }
      },
      Some("""
        WITH lp AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e AS MATERIALIZED (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS MATERIALIZED (
          SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        hub AS MATERIALIZED (
          SELECT u AS node FROM (SELECT u, count(*) AS deg FROM adj GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 1),
        h1 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN hub ON adj.u = hub.node
          WHERE adj.v NOT IN (SELECT node FROM hub)),
        v1 AS MATERIALIZED (SELECT node FROM hub UNION SELECT v FROM h1),
        h2 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN h1 ON adj.u = h1.v
          WHERE adj.v NOT IN (SELECT node FROM v1)),
        v2 AS MATERIALIZED (SELECT node FROM v1 UNION SELECT v FROM h2),
        h3 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN h2 ON adj.u = h2.v
          WHERE adj.v NOT IN (SELECT node FROM v2)),
        v3 AS MATERIALIZED (SELECT node FROM v2 UNION SELECT v FROM h3),
        h4 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN h3 ON adj.u = h3.v
          WHERE adj.v NOT IN (SELECT node FROM v3)),
        dist AS MATERIALIZED (
          SELECT node, CAST(0 AS BIGINT) AS hop FROM hub
          UNION ALL SELECT v, 1 FROM h1
          UNION ALL SELECT v, 2 FROM h2
          UNION ALL SELECT v, 3 FROM h3
          UNION ALL SELECT v, 4 FROM h4)
        SELECT greatest(du.hop, dv.hop) AS layer,
               CAST(count(*) AS BIGINT) AS edges,
               CAST(sum(CASE WHEN du.hop = dv.hop THEN 1 ELSE 0 END)
                 AS BIGINT) AS intra_edges,
               (sum(CASE WHEN du.hop = dv.hop THEN 1 ELSE 0 END) > 0)
                 AS odd_cycle_here
        FROM e JOIN dist du ON e.a = du.node
               JOIN dist dv ON e.b = dv.node
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q429
    QDef("q429_hodges_lehmann",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val walsh = daily.as("x")
          .join(daily.as("y"), col("x.event_type") === col("y.event_type") &&
            col("x.d") <= col("y.d"))
          .select(col("x.event_type").as("event_type"),
            (col("x.c") + col("y.c")).as("w2"))
        val ranked = walsh
          .withColumn("rn", row_number().over(Window
            .partitionBy("event_type").orderBy(col("w2"))).cast("long"))
          .withColumn("np", count(lit(1)).over(Window
            .partitionBy("event_type")).cast("long"))
        ranked.where(col("rn") * 2 === col("np") + (col("np") % 2))
          .groupBy("event_type")
          .agg(max("np").as("n_pairs"), min("w2").as("hl_twice"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        walsh AS (
          SELECT x.event_type, x.c + y.c AS w2
          FROM daily x JOIN daily y
            ON x.event_type = y.event_type AND x.d <= y.d),
        rk AS (
          SELECT event_type, w2,
                 row_number() OVER (PARTITION BY event_type ORDER BY w2) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS np
          FROM walsh)
        SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
               CAST(min(w2) AS BIGINT) AS hl_twice
        FROM rk WHERE rn * 2 = np + (np % 2)
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q430
    QDef("q430_quorum_reliability",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .where(col("event_type").isin("view", "click", "purchase"))
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d",
            s"(($tsMs) DIV 3600000) % 24 AS h")
          .distinct()
        val days = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS d")
          .agg(countDistinct("d").as("nd"))
        val p = cells.groupBy("h").agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("bigint").as("dv"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("bigint").as("dc"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("bigint").as("dp"))
          .crossJoin(broadcast(days))
          .selectExpr("h", "dv * 1000000 DIV nd AS p1",
            "dc * 1000000 DIV nd AS p2",
            "dp * 1000000 DIV nd AS p3")
        p.selectExpr("h", "p1", "p2", "p3",
          "((p1*p2 + p1*p3 + p2*p3) DIV 1000000) - ((2*p1*p2*p3) DIV 1000000000000) AS p2of3_micro")
          .orderBy("h")
      },
      Some("""
        WITH cells AS (
          SELECT DISTINCT event_type, epoch_ms(ts) // 86400000 AS d,
                 (epoch_ms(ts) // 3600000) % 24 AS h
          FROM events
          WHERE event_type IN ('view', 'click', 'purchase')),
        days AS (
          SELECT count(DISTINCT epoch_ms(ts) // 86400000) AS nd FROM events),
        p AS (
          SELECT h,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   * 1000000 // (SELECT nd FROM days) AS p1,
                 sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   * 1000000 // (SELECT nd FROM days) AS p2,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   * 1000000 // (SELECT nd FROM days) AS p3
          FROM cells GROUP BY 1)
        SELECT CAST(h AS BIGINT) AS h, CAST(p1 AS BIGINT) AS p1,
               CAST(p2 AS BIGINT) AS p2, CAST(p3 AS BIGINT) AS p3,
               CAST(((p1*p2 + p1*p3 + p2*p3) // 1000000)
                 - ((2*p1*p2*p3) // 1000000000000) AS BIGINT) AS p2of3_micro
        FROM p ORDER BY h"""))
  )
}
