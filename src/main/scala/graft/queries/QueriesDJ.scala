package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 107 — distribution-free prediction
  * intervals, windowed ER blocking, kernel densities, payments audit:
  *
  *  - q447: split-conformal interval coverage — seasonal-naive forecast
  *    (q218's c(d−7)), absolute residuals split by day order into a
  *    60% calibration / 40% evaluation set; q̂ = the ⌈(n+1)·0.9⌉-th
  *    smallest calibration residual by exact integer rank, then the
  *    empirical coverage of |resid| ≤ q̂ on held-out days (bp). The
  *    finite-sample-valid uncertainty wrapper for ANY forecaster —
  *    distribution-free, pure rank math.
  *  - q448: sorted-neighborhood entity-resolution blocking — part names
  *    sorted once, each name compared only to its 3 window successors
  *    (levenshtein ≤ 3 ⇒ match): O(n·w) candidate pairs vs q214's
  *    block-then-compare and q39's deletion neighborhoods; per-initial
  *    compared/matched accounting.
  *  - q449: triangular-kernel density estimate on a 50-point grid —
  *    pre-aggregated value counts joined to the generated grid,
  *    density_i = Σ c·max(0, h − |v − g_i|) entirely in BIGINT (the
  *    smooth upgrade of q08's histogram; no FP anywhere).
  *  - q450: duplicate-payment audit — same customer, order totals
  *    within 5% of each other (exact cross-multiplied predicate),
  *    order dates within 5 days, distinct keys: the classic finance
  *    double-pay sweep as one equi-join on customer + band filters
  *    (pairs bounded by per-customer order counts, never a cross
  *    join), rolled up per market segment with value-at-risk.
  *
  * Reference analog: harvest-volume prediction bands, listing-title
  * near-duplicate sweeps, price-density smoothing for dashboards,
  * double-booked quote detection.
  */
object QueriesDJ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q447
    QDef("q447_conformal",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val resid = daily.as("a")
          .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
            col("a.d") === col("b.d") + 7)
          .selectExpr("a.event_type AS event_type", "a.d AS d",
            "abs(a.c - b.c) AS r")
        val wOrd = Window.partitionBy("event_type").orderBy("d")
        val tagged = resid
          .withColumn("i", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy("event_type")).cast("long"))
          .withColumn("is_cal", col("i") * 10 <= col("n") * 6)
        val cal = tagged.where(col("is_cal"))
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type").orderBy("r", "d")).cast("long"))
          .withColumn("ncal", count(lit(1)).over(
            Window.partitionBy("event_type")).cast("long"))
          .where(col("rk") * 10 >= (col("ncal") + 1) * 9)
          .groupBy("event_type")
          .agg(min("r").as("qhat"), max("ncal").as("n_cal"))
        tagged.where(!col("is_cal"))
          .join(cal, "event_type")
          .groupBy("event_type").agg(
            max("n_cal").as("n_cal"),
            count(lit(1)).cast("long").as("n_eval"),
            max("qhat").cast("long").as("qhat"),
            sum(when(col("r") <= col("qhat"), 1L).otherwise(0L))
              .cast("bigint").as("covered"))
          .selectExpr("event_type", "n_cal", "n_eval", "qhat", "covered",
            "covered * 10000 DIV n_eval AS cover_bp")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        resid AS (
          SELECT a.event_type, a.d, abs(a.c - b.c) AS r
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d = b.d + 7),
        tagged AS (
          SELECT event_type, d, r,
                 row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM resid),
        t2 AS (SELECT *, (i * 10 <= n * 6) AS is_cal FROM tagged),
        calr AS (
          SELECT event_type, r,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY r, d) AS rk,
                 count(*) OVER (PARTITION BY event_type) AS ncal
          FROM t2 WHERE is_cal),
        cal AS (
          SELECT event_type, min(r) AS qhat, max(ncal) AS n_cal
          FROM calr WHERE rk * 10 >= (ncal + 1) * 9 GROUP BY 1)
        SELECT t2.event_type, CAST(max(n_cal) AS BIGINT) AS n_cal,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(max(qhat) AS BIGINT) AS qhat,
               CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT)
                 AS covered,
               CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS cover_bp
        FROM t2 JOIN cal ON t2.event_type = cal.event_type
        WHERE NOT is_cal
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q448
    QDef("q448_sorted_neighborhood",
      (s, dir) => {
        val names = t(s, dir, "part")
          .select(col("p_partkey"), col("p_name")).distinct()
        // two-phase sorted neighborhood: global row_number via
        // ScaleRank, then an equi-join on rn+k replaces the three
        // global lead() windows (which serialized all names)
        val ranked = graft.operators.ScaleRank.withGlobalRowNumber(
          names, Seq(col("p_name"), col("p_partkey")), "rn")
        val pairs = ranked.select(col("p_name"), col("rn"))
          .withColumn("k", explode(expr("array(1L, 2L, 3L)")))
          .withColumn("rn2", col("rn") + col("k"))
          .join(ranked.select(col("rn").as("rn2"), col("p_name").as("cand")),
            "rn2")
          .withColumn("dist", levenshtein(col("p_name"), col("cand")))
        pairs.groupBy(substring(col("p_name"), 1, 1).as("initial")).agg(
          count(lit(1)).cast("long").as("compared"),
          sum(when(col("dist") <= 3, 1L).otherwise(0L))
            .cast("bigint").as("matched"),
          min(when(col("dist") <= 3, col("dist"))).cast("long").as("best_dist"))
          .selectExpr("initial", "compared", "matched",
            "coalesce(best_dist, -1) AS best_dist",
            "matched * 10000 DIV compared AS match_bp")
          .orderBy("initial")
      },
      Some("""
        WITH names AS (
          SELECT DISTINCT p_partkey, p_name FROM part),
        sq AS (
          SELECT p_name,
                 lead(p_name, 1) OVER (ORDER BY p_name, p_partkey) AS n1,
                 lead(p_name, 2) OVER (ORDER BY p_name, p_partkey) AS n2,
                 lead(p_name, 3) OVER (ORDER BY p_name, p_partkey) AS n3
          FROM names),
        pairs AS (
          SELECT p_name, cand, levenshtein(p_name, cand) AS dist FROM (
            SELECT p_name, n1 AS cand FROM sq
            UNION ALL SELECT p_name, n2 FROM sq
            UNION ALL SELECT p_name, n3 FROM sq)
          WHERE cand IS NOT NULL)
        SELECT substr(p_name, 1, 1) AS initial,
               CAST(count(*) AS BIGINT) AS compared,
               CAST(sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS matched,
               CAST(coalesce(min(CASE WHEN dist <= 3 THEN dist END), -1)
                 AS BIGINT) AS best_dist,
               CAST(sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS match_bp
        FROM pairs GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q449
    QDef("q449_kde_grid",
      (s, dir) => {
        val vals = t(s, dir, "orders")
          .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v")
          .groupBy("v").agg(count(lit(1)).cast("bigint").as("c"))
        val bounds = vals.agg(min("v").as("lo"), max("v").as("hi"))
          .selectExpr("lo", "hi", "(hi - lo) DIV 10 AS h")
        val grid = bounds.select(col("lo"), col("hi"), col("h"),
            explode(sequence(lit(0L), lit(49L))).as("i"))
          .selectExpr("i", "lo + (i * (hi - lo)) DIV 49 AS g", "h")
        val dens = grid.crossJoin(vals)
          .selectExpr("i", "g", "h",
            "c * greatest(0, h - abs(v - g)) AS w")
          .groupBy("i", "g").agg(sum("w").cast("bigint").as("density"))
        val tot = dens.agg(sum("density").cast("bigint").as("td"))
        dens.crossJoin(broadcast(tot))
          .selectExpr("i", "g", "density",
            "CASE WHEN td > 0 THEN density * 100000 DIV td ELSE 0 END AS share_c5")
          .orderBy("i")
      },
      Some("""
        WITH vals AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
                 count(*) AS c
          FROM orders GROUP BY 1),
        bounds AS (
          SELECT min(v) AS lo, max(v) AS hi, (max(v) - min(v)) // 10 AS h
          FROM vals),
        grid AS (
          SELECT CAST(gs.i AS BIGINT) AS i,
                 lo + (gs.i * (hi - lo)) // 49 AS g, h
          FROM bounds, generate_series(0, 49) gs(i)),
        dens AS (
          SELECT i, g, CAST(sum(c * greatest(0, h - abs(v - g))) AS BIGINT)
                   AS density
          FROM grid, vals GROUP BY 1, 2),
        tot AS (SELECT sum(density) AS td FROM dens)
        SELECT i, CAST(g AS BIGINT) AS g, density,
               CAST(CASE WHEN td > 0 THEN density * 100000 // td
                    ELSE 0 END AS BIGINT) AS share_c5
        FROM dens, tot ORDER BY i""")),

    // --------------------------------------------------------------- q450
    QDef("q450_dup_payments",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d")
        val pairs = o.as("x").join(o.as("y"),
            col("x.o_custkey") === col("y.o_custkey") &&
              col("x.o_orderkey") < col("y.o_orderkey") &&
              abs(col("x.d") - col("y.d")) <= 5 &&
              abs(col("x.cents") - col("y.cents")) * 100 <=
                least(col("x.cents"), col("y.cents")) * 5)
          .select(col("x.o_custkey").as("cust"), col("x.cents").as("cents"))
        pairs
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("cust") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(
            count(lit(1)).cast("long").as("n_pairs"),
            countDistinct("cust").cast("long").as("customers"),
            sum("cents").cast("bigint").as("cents_at_risk"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 epoch_ms(o_orderdate) // 86400000 AS d
          FROM orders),
        pairs AS (
          SELECT x.o_custkey AS cust, x.cents
          FROM o x JOIN o y
            ON x.o_custkey = y.o_custkey
           AND x.o_orderkey < y.o_orderkey AND abs(x.d - y.d) <= 5
           AND abs(x.cents - y.cents) * 100 <= least(x.cents, y.cents) * 5)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT cust) AS BIGINT) AS customers,
               CAST(sum(cents) AS BIGINT) AS cents_at_risk
        FROM pairs JOIN customer ON cust = c_custkey
        GROUP BY 1 ORDER BY 1"""))
  )
}
