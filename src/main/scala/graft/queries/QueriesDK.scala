package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 108 — feature selection, model
  * application, boosting, random-cut anomaly scores:
  *
  *  - q451: mutual-information feature ranking — MI(F; returned) for
  *    four categorical features (brand, size band, priority,
  *    linestatus) from exact BIGINT cell/marginal counts; per-cell
  *    c·ln(c·N/(c_f·c_y)) floor-micro (products stay exact in DOUBLE —
  *    all < 2⁵³), summed exactly, MI = Σ DIV N. The filter-method
  *    feature selector beside q405's split gain.
  *  - q452: partial-dependence profile — the global two-feature OLS
  *    (q289's Cramer solve: quantity on discount + size) APPLIED over
  *    an 11-point discount grid at the mean size: the train-then-score
  *    shape, coefficients floor-micro once, grid predictions in exact
  *    integer micro thereafter.
  *  - q453: two-round gradient-boosted stumps — squared-loss stump on
  *    discount (11 candidate thresholds) fits returned-flag milli
  *    outcome; residuals feed a second stump on size. Gains compared in
  *    fixed-order DOUBLE floor-micro (exact-integer cross terms would
  *    overflow BIGINT), predictions and SSE exact in milli integers.
  *    Each round: one aggregate per candidate threshold (running-sum
  *    window over the bounded distinct-value domain), one argmax.
  *  - q454: random-cut (isolation-lite) anomaly scores — 4 hash-seeded
  *    "trees", each two exact-rank percentile cuts over order totals
  *    → 3 cells; score = Σ tree cell-occupancy shares (micro, smaller
  *    = lonelier); per-segment score stats + anomaly counts. The
  *    density-free anomaly mechanism beside q131/q158/q434.
  *
  * Reference analog: which listing attributes predict problem
  * responses, price-response curves, boosted quality filters,
  * isolation-style odd-listing detection.
  */
object QueriesDK extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q451
    QDef("q451_mutual_information",
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .selectExpr("p_brand AS brand",
            "CAST(p_size DIV 10 AS STRING) AS sizeband",
            "o_orderpriority AS priority", "l_linestatus AS linestatus",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y")
        // ALL FOUR features in one exploded census pass (the per-feature
        // mi() pipelines were ~18 small jobs of pure overhead at sf0.1):
        // one (feature, f, y) shuffle, then bounded-domain marginal joins
        val cells = base
          .select(explode(expr(
            """array(struct('brand' AS feature, brand AS f),
                     struct('sizeband' AS feature, sizeband AS f),
                     struct('priority' AS feature, priority AS f),
                     struct('linestatus' AS feature, linestatus AS f))""")).as("e"),
            col("y"))
          .select(col("e.feature").as("feature"), col("e.f").as("f"), col("y"))
          .groupBy("feature", "f", "y")
          .agg(count(lit(1)).cast("bigint").as("cfy"))
          .collect() // bounded BY CONSTRUCTION: (25 brands + ≤6 sizebands
                     // + 5 priorities + 2 linestatuses) × 2 labels ≤ ~80
                     // rows at ANY scale — the q463 collect argument.
        // r12: the marginals (cf, cy, nn) and the MI terms re-aggregate
        // the same tiny census, so they finish driver-side — one census
        // job instead of cache + count + 3 marginal aggregations + a
        // 3-join term pass (~5 jobs). Same IEEE op order as the frames:
        // (cfy·ln((cfy·nn)/(cf·cy)))·1e6, floor, BIGINT sums, trunc DIV.
        val sc2 = s
        import sc2.implicits._
        val byFeature = cells.map(r => (r.getString(0), r.getString(1),
          r.getInt(2), r.getLong(3))).groupBy(_._1)
        byFeature.toSeq.sortBy(_._1).map { case (feature, g) =>
          val cf = g.groupMapReduce(_._2)(_._4)(_ + _)
          val cy = g.groupMapReduce(_._3)(_._4)(_ + _)
          val nn = g.iterator.map(_._4).sum
          var sumTerms = 0L
          g.foreach { case (_, f, y, cfy) =>
            val term = math.floor(cfy.toDouble *
              math.log((cfy.toDouble * nn.toDouble) /
                (cf(f).toDouble * cy(y).toDouble)) * 1e6).toLong
            sumTerms += term
          }
          (feature, g.length.toLong, sumTerms, sumTerms / nn)
        }.toDF("feature", "cells", "sum_terms", "mi_micro")
      },
      Some {
        def miSql(f: String): String = s"""
          SELECT '$f' AS feature, CAST(count(*) AS BIGINT) AS cells,
                 CAST(sum(term) AS BIGINT) AS sum_terms,
                 CAST(sum(term) // max(nn) AS BIGINT) AS mi_micro
          FROM (
            SELECT CAST(floor(CAST(cfy AS DOUBLE)
                     * ln((CAST(cfy AS DOUBLE) * CAST(nn AS DOUBLE))
                          / (CAST(cf AS DOUBLE) * CAST(cy AS DOUBLE))) * 1e6)
                   AS BIGINT) AS term, nn
            FROM (SELECT f, y, count(*) AS cfy FROM base_$f GROUP BY 1, 2) c
            JOIN (SELECT f, count(*) AS cf FROM base_$f GROUP BY 1) fm USING (f)
            JOIN (SELECT y, count(*) AS cy FROM base_$f GROUP BY 1) ym USING (y)
            CROSS JOIN (SELECT count(*) AS nn FROM base_$f) n)"""
        s"""
        WITH base AS MATERIALIZED (
          SELECT p_brand AS brand, CAST(p_size // 10 AS VARCHAR) AS sizeband,
                 o_orderpriority AS priority, l_linestatus AS linestatus,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey),
        base_brand AS (SELECT brand AS f, y FROM base),
        base_sizeband AS (SELECT sizeband AS f, y FROM base),
        base_priority AS (SELECT priority AS f, y FROM base),
        base_linestatus AS (SELECT linestatus AS f, y FROM base)
        ${miSql("brand")}
        UNION ALL ${miSql("sizeband")}
        UNION ALL ${miSql("priority")}
        UNION ALL ${miSql("linestatus")}
        ORDER BY feature"""
      }),

    // --------------------------------------------------------------- q452
    QDef("q452_partial_dependence",
      (s, dir) => {
        val rows = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr(
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1",
            "CAST(p_size AS BIGINT) AS x2",
            "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS y")
        val comp = rows.agg(
          count(lit(1)).cast("bigint").as("n"),
          sum("x1").cast("bigint").as("sx1"), sum("x2").cast("bigint").as("sx2"),
          sum("y").cast("bigint").as("sy"),
          sum(col("x1") * col("x1")).cast("bigint").as("s11"),
          sum(col("x2") * col("x2")).cast("bigint").as("s22"),
          sum(col("x1") * col("x2")).cast("bigint").as("s12"),
          sum(col("x1") * col("y")).cast("bigint").as("s1y"),
          sum(col("x2") * col("y")).cast("bigint").as("s2y"))
          .selectExpr("n", "sx1", "sx2", "sy",
            "n * s11 - sx1 * sx1 AS a11", "n * s22 - sx2 * sx2 AS a22",
            "n * s12 - sx1 * sx2 AS a12",
            "n * s1y - sx1 * sy AS b1", "n * s2y - sx2 * sy AS b2")
          .selectExpr("n", "sx1", "sx2", "sy",
            "CAST(floor((CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) - CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / (CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1e6) AS BIGINT) AS b1_micro",
            "CAST(floor((CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) - CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / (CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1e6) AS BIGINT) AS b2_micro")
          .selectExpr("n", "sx2", "b1_micro", "b2_micro",
            "(sy DIV n) * 1000000 - b1_micro * (sx1 DIV n) - b2_micro * (sx2 DIV n) AS a_pico_ish")
        val grid = comp.select(col("n"), col("sx2"), col("b1_micro"),
            col("b2_micro"), col("a_pico_ish"),
            explode(sequence(lit(0L), lit(10L))).as("i"))
          .selectExpr("i", "i AS x1_pct", "b1_micro", "b2_micro",
            "(a_pico_ish + b1_micro * i + b2_micro * (sx2 DIV n)) DIV 1000000 AS pd_centi")
        grid.select("i", "x1_pct", "b1_micro", "b2_micro", "pd_centi")
          .orderBy("i")
      },
      Some("""
        WITH rows0 AS (
          SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1,
                 CAST(p_size AS BIGINT) AS x2,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        comp AS (
          SELECT count(*) AS n, sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
                 sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
                 sum(x1 * x2) AS s12, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
          FROM rows0),
        aa AS (
          SELECT n, sx1, sx2, sy,
                 n * s11 - sx1 * sx1 AS a11, n * s22 - sx2 * sx2 AS a22,
                 n * s12 - sx1 * sx2 AS a12,
                 n * s1y - sx1 * sy AS b1, n * s2y - sx2 * sy AS b2
          FROM comp),
        sol AS (
          SELECT n, sx1, sx2, sy,
                 CAST(floor((CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE)
                     - CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE))
                   / (CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE)
                     - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1e6)
                   AS BIGINT) AS b1_micro,
                 CAST(floor((CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE)
                     - CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE))
                   / (CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE)
                     - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1e6)
                   AS BIGINT) AS b2_micro
          FROM aa),
        ic AS (
          SELECT n, sx2, b1_micro, b2_micro,
                 (sy // n) * 1000000 - b1_micro * (sx1 // n)
                   - b2_micro * (sx2 // n) AS a_pico_ish
          FROM sol)
        SELECT CAST(g.i AS BIGINT) AS i, CAST(g.i AS BIGINT) AS x1_pct,
               CAST(b1_micro AS BIGINT) AS b1_micro,
               CAST(b2_micro AS BIGINT) AS b2_micro,
               CAST((a_pico_ish + b1_micro * g.i
                 + b2_micro * (sx2 // n)) // 1000000 AS BIGINT) AS pd_centi
        FROM ic, generate_series(0, 10) g(i)
        ORDER BY i""")),

    // --------------------------------------------------------------- q453
    QDef("q453_stump_boost",
      (s, dir) => {
        // DRIVER COMPACTION over the bounded joint census (r10): x1 is
        // bp-quantized discount (<=10001 values), x2 = p_size (small
        // int), y binary -- so (x1, x2, y, cnt) is a by-construction-
        // bounded census and both stumps, both residual passes and both
        // SSEs are plain arithmetic over it in Scala. The r9 form ran
        // ~10 sequential jobs at the ~0.3s job floor (the documented
        // sf0.1 exemption). Scala Long / == Spark DIV on these values;
        // the gain doubles use the oracle's exact op order.
        val sc3 = s
        import sc3.implicits._
        val cen = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr(
            "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x1",
            "CAST(p_size AS BIGINT) AS x2",
            "CASE WHEN l_returnflag = 'R' THEN CAST(1000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y")
          .groupBy("x1", "x2", "y").agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq
        // (thresh, n_left, n_right, pred_left, pred_right); None when no
        // split candidate exists (empty input or a single distinct value
        // — the oracle's s1/s2 CTEs go empty the same way)
        def stump(vals: Seq[(Long, Long, Long)]): Option[(Long, Long, Long, Long, Long)] = {
          val byV = vals.groupBy(_._1).toSeq
            .map { case (v, rs) => (v, rs.map(_._2).sum, rs.map(_._3).sum) }
            .sortBy(_._1)
          val nt = byV.map(_._2).sum
          val st = byV.map(_._3).sum
          var nl = 0L
          var sl = 0L
          val cands = byV.flatMap { case (v, c, sv) =>
            nl += c; sl += sv
            if (nl < nt) {
              val gain = math.floor((sl.toDouble * sl.toDouble / nl.toDouble +
                (st - sl).toDouble * (st - sl).toDouble / (nt - nl).toDouble)
                * 1e6).toLong
              Some((v, nl, sl, gain))
            } else None
          }
          if (cands.isEmpty) None
          else {
            val (v, nlB, slB, _) = cands.minBy { case (cv, _, _, g) => (-g, cv) }
            Some((v, nlB, nt - nlB, slB / nlB, (st - slB) / (nt - nlB)))
          }
        }
        val out = stump(cen.map { case (x1, _, y, c) => (x1, c, y * c) })
          .toSeq.flatMap { case (t1, nl1, nr1, pl1, pr1) =>
            val resid = cen.map { case (x1, x2, y, c) =>
              (x2, y - (if (x1 <= t1) pl1 else pr1), c)
            }
            val sse1 = resid.map { case (_, r, c) => r * r * c }.sum
            val r1 = (1L, "x1_discount_bp", t1, nl1, nr1, pl1, pr1, sse1)
            val r2 = stump(resid.map { case (x2, r, c) => (x2, c, r * c) })
              .map { case (t2, nl2, nr2, pl2, pr2) =>
                val sse2 = resid.map { case (x2, r, c) =>
                  val d = r - (if (x2 <= t2) pl2 else pr2)
                  d * d * c
                }.sum
                (2L, "x2_size", t2, nl2, nr2, pl2, pr2, sse2)
              }
            r1 +: r2.toSeq
          }
        out.toDF("round", "feature", "thresh", "n_left", "n_right",
          "pred_left", "pred_right", "sse_after")
      },
      Some("""
        WITH data0 AS MATERIALIZED (
          SELECT CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x1,
                 CAST(p_size AS BIGINT) AS x2,
                 CASE WHEN l_returnflag = 'R' THEN 1000 ELSE 0 END AS y
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        byv1 AS (SELECT x1 AS v, count(*) AS c, sum(y) AS sv
                 FROM data0 GROUP BY 1),
        cand1 AS (
          SELECT v,
                 sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
                 sum(sv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS sl,
                 (SELECT sum(c) FROM byv1) AS nt,
                 (SELECT sum(sv) FROM byv1) AS st
          FROM byv1),
        scored1 AS (
          SELECT v, nl, sl, nt, st,
                 CAST(floor((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                     / CAST(nl AS DOUBLE)
                   + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                     / CAST(nt - nl AS DOUBLE)) * 1e6) AS BIGINT) AS gain
          FROM cand1 WHERE nl < nt),
        s1 AS (
          SELECT v AS thresh, nl AS n_left, nt - nl AS n_right,
                 sl // nl AS pred_left, (st - sl) // (nt - nl) AS pred_right
          FROM scored1 ORDER BY gain DESC, v LIMIT 1),
        resid AS MATERIALIZED (
          SELECT x2, y - CASE WHEN x1 <= (SELECT thresh FROM s1)
                          THEN (SELECT pred_left FROM s1)
                          ELSE (SELECT pred_right FROM s1) END AS r
          FROM data0),
        sse1 AS (SELECT sum(r * r) AS sse FROM resid),
        byv2 AS (SELECT x2 AS v, count(*) AS c, sum(r) AS sv
                 FROM resid GROUP BY 1),
        cand2 AS (
          SELECT v,
                 sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
                 sum(sv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS sl,
                 (SELECT sum(c) FROM byv2) AS nt,
                 (SELECT sum(sv) FROM byv2) AS st
          FROM byv2),
        scored2 AS (
          SELECT v, nl, sl, nt, st,
                 CAST(floor((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                     / CAST(nl AS DOUBLE)
                   + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                     / CAST(nt - nl AS DOUBLE)) * 1e6) AS BIGINT) AS gain
          FROM cand2 WHERE nl < nt),
        s2 AS (
          SELECT v AS thresh, nl AS n_left, nt - nl AS n_right,
                 sl // nl AS pred_left, (st - sl) // (nt - nl) AS pred_right
          FROM scored2 ORDER BY gain DESC, v LIMIT 1),
        sse2 AS (
          SELECT sum((r - CASE WHEN x2 <= (SELECT thresh FROM s2)
                           THEN (SELECT pred_left FROM s2)
                           ELSE (SELECT pred_right FROM s2) END)
                     * (r - CASE WHEN x2 <= (SELECT thresh FROM s2)
                           THEN (SELECT pred_left FROM s2)
                           ELSE (SELECT pred_right FROM s2) END)) AS sse
          FROM resid)
        SELECT CAST(1 AS BIGINT) AS round, 'x1_discount_bp' AS feature,
               CAST(thresh AS BIGINT) AS thresh,
               CAST(n_left AS BIGINT) AS n_left,
               CAST(n_right AS BIGINT) AS n_right,
               CAST(pred_left AS BIGINT) AS pred_left,
               CAST(pred_right AS BIGINT) AS pred_right,
               (SELECT CAST(sse AS BIGINT) FROM sse1) AS sse_after
        FROM s1
        UNION ALL
        SELECT 2, 'x2_size', CAST(thresh AS BIGINT), CAST(n_left AS BIGINT),
               CAST(n_right AS BIGINT), CAST(pred_left AS BIGINT),
               CAST(pred_right AS BIGINT),
               (SELECT CAST(sse AS BIGINT) FROM sse2)
        FROM s2
        ORDER BY round""")),

    // --------------------------------------------------------------- q454
    QDef("q454_random_cut",
      (s, dir) => {
        val vals = t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v")
        // quantile cuts from ONE distinct-value cumsum; the cents domain
        // is generator-fixed at any SF (bounded §5 aggwin class 1), so a
        // plain window over the aggregated census replaces the ScaleRank
        // frame and its checkpoint pin
        val SR = graft.operators.ScaleRank
        val wCum = org.apache.spark.sql.expressions.Window.orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val cum = vals.groupBy("v").agg(count(lit(1)).as("c"))
          .withColumn("cumv", sum("c").over(wCum))
          .crossJoin(broadcast(vals.agg(count(lit(1)).cast("bigint").as("n"))))
        // ALL 8 cut points in ONE aggregation pass over the cumsum frame
        // (the per-tree agg-pair form recomputed the uncached two-phase
        // frame 8 times — 3.9 s of pure job overhead at sf0.1), then
        // stack the single row back into (tree, c1, c2)
        val cutAggs = (1 to 4).flatMap { tree =>
          val h1 = math.abs((tree * 2654435761L + 17) % 80) + 10
          val h2 = math.abs((tree * 40503L + 5381) % 80) + 10
          val (lo, hi) = (math.min(h1, h2), math.max(h1, h2) + 1)
          Seq(min(when(expr(s"cumv * 100 >= n * $lo"), col("v"))).as(s"c1_$tree"),
            min(when(expr(s"cumv * 100 >= n * $hi"), col("v"))).as(s"c2_$tree"))
        }
        val stacked = (1 to 4)
          .map(t => s"CAST($t AS BIGINT), c1_$t, c2_$t").mkString(", ")
        val cuts = cum.agg(cutAggs.head, cutAggs.tail: _*)
          .selectExpr(s"stack(4, $stacked) AS (tree, c1, c2)")
        val ranked = SR.withTotals(vals,
          Seq(count(lit(1)).cast("long").as("n")))
        ranked.cache(); ranked.count()
        val cells = ranked.crossJoin(broadcast(cuts))
          .selectExpr("o_orderkey", "o_custkey", "tree", "n",
            "CASE WHEN v < c1 THEN 0 WHEN v < c2 THEN 1 ELSE 2 END AS cell")
        // occ is ≤ 4 trees × 3 cells = 12 rows: broadcast it so scoring
        // is a map-side join instead of a full shuffle of cells
        val occ = cells.groupBy("tree", "cell")
          .agg(count(lit(1)).cast("bigint").as("cn"))
        val scored = cells.join(broadcast(occ), Seq("tree", "cell"))
          .groupBy("o_orderkey", "o_custkey")
          .agg(sum(expr("cn * 1000000 DIV n")).cast("bigint").as("score"))
        scored
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(
            count(lit(1)).cast("long").as("n_orders"),
            min("score").cast("long").as("min_score"),
            sum("score").cast("bigint").as("sum_score"),
            sum(when(col("score") <= 400000L, 1L).otherwise(0L))
              .cast("bigint").as("anomalies"))
          .selectExpr("c_mktsegment", "n_orders", "min_score",
            "sum_score DIV n_orders AS mean_score_micro", "anomalies")
          .orderBy("c_mktsegment")
      },
      Some {
        def cutSql(tree: Int): String = {
          val h1 = math.abs((tree * 2654435761L + 17) % 80) + 10
          val h2 = math.abs((tree * 40503L + 5381) % 80) + 10
          val (lo, hi) = (math.min(h1, h2), math.max(h1, h2) + 1)
          s"""SELECT CAST($tree AS BIGINT) AS tree,
               (SELECT min(v) FROM ranked WHERE rn * 100 >= n * $lo) AS c1,
               (SELECT min(v) FROM ranked WHERE rn * 100 >= n * $hi) AS c2"""
        }
        s"""
        WITH vals AS (
          SELECT o_orderkey, o_custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
          FROM orders),
        ranked AS MATERIALIZED (
          SELECT o_orderkey, o_custkey, v,
                 row_number() OVER (ORDER BY v, o_orderkey) AS rn,
                 count(*) OVER () AS n
          FROM vals),
        cuts AS (${(1 to 4).map(cutSql).mkString(" UNION ALL ")}),
        cells AS (
          SELECT o_orderkey, o_custkey, tree, n,
                 CASE WHEN v < c1 THEN 0 WHEN v < c2 THEN 1 ELSE 2 END AS cell
          FROM ranked, cuts),
        occ AS (SELECT tree, cell, count(*) AS cn FROM cells GROUP BY 1, 2),
        scored AS (
          SELECT o_orderkey, o_custkey,
                 sum(cn * 1000000 // n) AS score
          FROM cells JOIN occ USING (tree, cell)
          GROUP BY 1, 2)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(min(score) AS BIGINT) AS min_score,
               CAST(sum(score) // count(*) AS BIGINT) AS mean_score_micro,
               CAST(sum(CASE WHEN score <= 400000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS anomalies
        FROM scored JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1"""
      })
  )
}
