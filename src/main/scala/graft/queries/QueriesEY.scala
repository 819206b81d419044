package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 148 — equivalence testing, exact
  * distributed CvM drift, l-diversity, and forecast reconciliation:
  *
  *  - q605: TOST equivalence test (two one-sided Welch t's) per nation
  *    between two customer segments' order values — the "are these the
  *    SAME" complement of q515's difference test. Exact decimal Σ/Σy²
  *    (q515's discipline), one fixed IEEE formula text per side.
  *  - q606: two-sample Cramér–von Mises drift per event type between
  *    the two halves of the timeline. Fully exact group-side math: the
  *    Σ(rank−index)² terms reduce to closed-form integer sums per
  *    (type, value) census row (doubled ranks keep tie-averages
  *    integer; squared-sum accumulators in DECIMAL(38,0)), so the
  *    statistic needs ONE census shuffle + a per-type window — no
  *    per-row ranking join, and no FP at all: the final normalization
  *    is exact integer division over the common denominator 12nm(n+m).
  *  - q607: l-diversity census over QI groups (nation × acctbal band)
  *    with c_mktsegment sensitive — the diversity dimension q462's
  *    k-anonymity and q596's lattice don't measure.
  *  - q608: hierarchical forecast reconciliation backtest: per-nation
  *    seasonal-naive (bottom-up) vs total forecast allocated top-down
  *    by trailing revenue share (integer bp allocation) — per-nation
  *    MAE of both paths in exact cents.
  *
  * Scale shapes: q605/q608 are fact-scan → bounded-domain aggs (nation
  * ≤ 25); q606's census is one shuffle on (type, value) with the
  * window over the bounded distinct-value domain per type; q607 is one
  * hash-agg over QI groups then a rollup over the tiny l domain.
  */
object QueriesEY extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q605
    QDef("q605_tost_equivalence",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")),
            expr("o_custkey = c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .selectExpr("c_nationkey AS nk",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS y",
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g")
        o.groupBy("nk").agg(
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === 1, col("y")).otherwise(0L)).cast("long").as("s1"),
            sum(when(col("g") === 1, expr("y*y")).otherwise(0L)
              .cast("decimal(38,0)")).as("ss1"),
            sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("g") === 0, col("y")).otherwise(0L)).cast("long").as("s0"),
            sum(when(col("g") === 0, expr("y*y")).otherwise(0L)
              .cast("decimal(38,0)")).as("ss0"))
          .where(expr("n1 > 1 AND n0 > 1"))
          .selectExpr("nk", "n1", "n0",
            "(CAST(ss1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1) / n1 / (n1 - 1) AS v1",
            "(CAST(ss0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0) / n0 / (n0 - 1) AS v0",
            "CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS diff")
          .selectExpr("nk", "n1", "n0", "diff",
            "sqrt(v1 / n1 + v0 / n0) AS se")
          .selectExpr("nk", "n1", "n0",
            "CAST(floor(diff * 1000) AS BIGINT) AS diff_milli",
            "CAST(floor((diff + 20000.0) / se * 1000) AS BIGINT) AS t_lo_milli",
            "CAST(floor((20000.0 - diff) / se * 1000) AS BIGINT) AS t_hi_milli",
            """CAST(CASE WHEN (diff + 20000.0) / se > 1.645
                 AND (20000.0 - diff) / se > 1.645
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent""")
          .orderBy("nk")
      },
      Some("""
        WITH o AS (
          SELECT c_nationkey AS nk,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS y,
                 CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
        c AS (
          SELECT nk,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
                 CAST(sum(CASE WHEN g = 1 THEN y*y ELSE 0 END) AS DECIMAL(38,0)) AS ss1,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
                 CAST(sum(CASE WHEN g = 0 THEN y*y ELSE 0 END) AS DECIMAL(38,0)) AS ss0
          FROM o GROUP BY 1),
        v AS (
          SELECT nk, n1, n0,
                 (CAST(ss1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1) / n1 / (n1 - 1) AS v1,
                 (CAST(ss0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0) / n0 / (n0 - 1) AS v0,
                 CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS diff
          FROM c WHERE n1 > 1 AND n0 > 1),
        w AS (SELECT nk, n1, n0, diff, sqrt(v1 / n1 + v0 / n0) AS se FROM v)
        SELECT nk, n1, n0,
               CAST(floor(diff * 1000) AS BIGINT) AS diff_milli,
               CAST(floor((diff + 20000.0) / se * 1000) AS BIGINT) AS t_lo_milli,
               CAST(floor((20000.0 - diff) / se * 1000) AS BIGINT) AS t_hi_milli,
               CAST(CASE WHEN (diff + 20000.0) / se > 1.645
                 AND (20000.0 - diff) / se > 1.645
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
        FROM w ORDER BY nk""")),

    // --------------------------------------------------------------- q606
    QDef("q606_cvm_drift",
      (s, dir) => {
        val cutoff = millisOf("2024-01-29 00:00:00")
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type AS et",
            "CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v",
            s"CASE WHEN ($tsMs) < ${cutoff}L THEN 1 ELSE 0 END AS a")
        val census = ev.groupBy("et", "v").agg(
          sum(when(col("a") === 1, 1L).otherwise(0L)).cast("long").as("ca"),
          sum(when(col("a") === 0, 1L).otherwise(0L)).cast("long").as("cb"))
        val w = Window.partitionBy("et").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        // closed-form Σ over this value's instances of (2·avgrank − 2·idx)²:
        // with R = 2·cumBefore + c + 1 (doubled average rank, integer) and
        // a0 = R − 2·groupCumBefore, the sum over t=1..cg of (a0 − 2t)² is
        //   cg·a0² − 2·a0·cg·(cg+1) + 2·cg·(cg+1)·(2cg+1)/3
        // — all integer; accumulated in DECIMAL(38,0) (n·Σ crosses int64).
        val terms = census
          .withColumn("cumA", coalesce(sum("ca").over(w), lit(0L)))
          .withColumn("cumB", coalesce(sum("cb").over(w), lit(0L)))
          .selectExpr("et", "ca", "cb",
            "2 * (cumA + cumB) + (ca + cb) + 1 AS r2",
            "cumA", "cumB")
          .selectExpr("et", "ca", "cb",
            "r2 - 2 * cumA AS a0", "r2 - 2 * cumB AS b0")
          // ×3 form: no division anywhere in the exact accumulation
          // (Spark decimal '/' is true division, DuckDB '//' truncates —
          // the only portable integer path is to not divide at all)
          .selectExpr("et", "ca", "cb",
            """CAST(3 AS DECIMAL(38,0)) * ca * a0 * a0
               - CAST(6 AS DECIMAL(38,0)) * a0 * ca * (ca + 1)
               + CAST(2 AS DECIMAL(38,0)) * ca * (ca + 1) * (2*ca + 1)
               AS ta""",
            """CAST(3 AS DECIMAL(38,0)) * cb * b0 * b0
               - CAST(6 AS DECIMAL(38,0)) * b0 * cb * (cb + 1)
               + CAST(2 AS DECIMAL(38,0)) * cb * (cb + 1) * (2*cb + 1)
               AS tb""")
        terms.groupBy("et").agg(
            sum("ca").cast("long").as("n"),
            sum("cb").cast("long").as("m"),
            sum("ta").as("sa"), sum("tb").as("sb"))
          .where(expr("n > 0 AND m > 0"))
          // T = U/(n·m·(n+m)) − (4nm−1)/(6(n+m)) with U = (n·Σa3+m·Σb3)/12
          // (undoing ×3 terms and doubled ranks). Over a common denominator
          // D = 12nm(n+m) the numerator is Nm = n·Σa3+m·Σb3 − 2nm(4nm−1),
          // so micro = (Nm·10⁶) intdiv D stays EXACT integer end to end —
          // an IEEE floor() here landed on opposite sides of the boundary
          // between engines (1-ulp, 262553 vs 262554). Spark `div` and
          // DuckDB `//` both truncate toward zero.
          .selectExpr("et", "n", "m",
            """((CAST(n AS DECIMAL(38,0)) * sa + CAST(m AS DECIMAL(38,0)) * sb
                 - CAST(2 AS DECIMAL(38,0)) * n * m
                   * (CAST(4 AS DECIMAL(38,0)) * n * m - 1)) * 1000000)
               DIV (CAST(12 AS DECIMAL(38,0)) * n * m * (n + m))
               AS t_cvm_micro""")
          .orderBy("et")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type AS et,
                 CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v,
                 CASE WHEN epoch_ms(ts) < epoch_ms(TIMESTAMP '2024-01-29 00:00:00')
                   THEN 1 ELSE 0 END AS a
          FROM events WHERE value IS NOT NULL),
        census AS (
          SELECT et, v,
                 CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM ev GROUP BY 1, 2),
        cum AS (
          SELECT et, ca, cb,
                 coalesce(sum(ca) OVER (PARTITION BY et ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumA,
                 coalesce(sum(cb) OVER (PARTITION BY et ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumB
          FROM census),
        ab AS (
          SELECT et, ca, cb,
                 2 * (cumA + cumB) + (ca + cb) + 1 - 2 * cumA AS a0,
                 2 * (cumA + cumB) + (ca + cb) + 1 - 2 * cumB AS b0
          FROM cum),
        terms AS (
          SELECT et, ca, cb,
                 CAST(3 AS HUGEINT) * ca * a0 * a0
                 - CAST(6 AS HUGEINT) * a0 * ca * (ca + 1)
                 + CAST(2 AS HUGEINT) * ca * (ca + 1) * (2*ca + 1) AS ta,
                 CAST(3 AS HUGEINT) * cb * b0 * b0
                 - CAST(6 AS HUGEINT) * b0 * cb * (cb + 1)
                 + CAST(2 AS HUGEINT) * cb * (cb + 1) * (2*cb + 1) AS tb
          FROM ab),
        agg AS (
          SELECT et, CAST(sum(ca) AS BIGINT) AS n, CAST(sum(cb) AS BIGINT) AS m,
                 sum(ta) AS sa, sum(tb) AS sb
          FROM terms GROUP BY 1)
        SELECT et, n, m,
               CAST(((CAST(n AS HUGEINT) * sa + CAST(m AS HUGEINT) * sb
                      - CAST(2 AS HUGEINT) * n * m
                        * (CAST(4 AS HUGEINT) * n * m - 1)) * 1000000)
                 // (CAST(12 AS HUGEINT) * n * m * (n + m)) AS BIGINT)
               AS t_cvm_micro
        FROM agg WHERE n > 0 AND m > 0
        ORDER BY et""")),

    // --------------------------------------------------------------- q607
    QDef("q607_ldiversity",
      (s, dir) => {
        val groups = t(s, dir, "customer")
          .selectExpr("c_nationkey AS nk",
            "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS band",
            "c_mktsegment AS seg")
          .groupBy("nk", "band")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct("seg").as("l"))
        groups.groupBy("l").agg(
            count(lit(1)).cast("long").as("n_groups"),
            sum("n_rows").cast("long").as("n_rows"),
            min(expr("n_rows")).cast("long").as("min_group_sz"))
          .orderBy("l")
      },
      Some("""
        WITH g AS (
          SELECT c_nationkey AS nk,
                 CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS band,
                 count(*) AS n_rows,
                 count(DISTINCT c_mktsegment) AS l
          FROM customer GROUP BY 1, 2)
        SELECT CAST(l AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(min(n_rows) AS BIGINT) AS min_group_sz
        FROM g GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q608
    QDef("q608_forecast_reconcile",
      (s, dir) => {
        // daily revenue cents per nation; backtest seasonal-naive f(d) =
        // rev(d−7) bottom-up vs total split top-down by trailing share
        val day0 = "o_orderdate" // DATE column
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
            expr("o_custkey = c_custkey"))
          .selectExpr("c_nationkey AS nk",
            "datediff(o_orderdate, DATE '2024-01-01') AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS usd")
          .groupBy("nk", "d").agg(sum("usd").cast("long").as("rev"))
        rev.cache(); rev.count()
        val tot = rev.groupBy("d").agg(sum("rev").cast("long").as("trev"))
        // trailing share bp per nation over the WHOLE horizon (stable mix)
        val share = rev.groupBy("nk").agg(sum("rev").cast("long").as("nrev"))
          .crossJoin(broadcast(
            rev.agg(sum("rev").cast("long").as("grev"))))
          .selectExpr("nk", "nrev * 10000 DIV grev AS share_bp")
        val bu = rev.as("cur").join(
            rev.selectExpr("nk", "d + 7 AS d", "rev AS fc_bu"), Seq("nk", "d"))
        val td = bu.join(
            tot.selectExpr("d + 7 AS d", "trev AS tfc"), Seq("d"))
          .join(broadcast(share), Seq("nk"))
          .selectExpr("nk", "d", "rev", "fc_bu",
            "tfc * share_bp DIV 10000 AS fc_td")
        td.groupBy("nk").agg(
            count(lit(1)).cast("long").as("n_days"),
            sum(abs(col("rev") - col("fc_bu"))).cast("long").as("mae_bu_usd"),
            sum(abs(col("rev") - col("fc_td"))).cast("long").as("mae_td_usd"))
          .selectExpr("nk", "n_days",
            "mae_bu_usd DIV n_days AS mae_bu_usd",
            "mae_td_usd DIV n_days AS mae_td_usd",
            """CAST(CASE WHEN mae_bu_usd <= mae_td_usd THEN 1 ELSE 0 END
               AS BIGINT) AS bu_wins""")
          .orderBy("nk")
      },
      Some("""
        WITH rev AS (
          SELECT c_nationkey AS nk,
                 datediff('day', DATE '2024-01-01', o_orderdate) AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)
                   AS BIGINT) AS rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        tot AS (SELECT d, CAST(sum(rev) AS BIGINT) AS trev FROM rev GROUP BY 1),
        share AS (
          SELECT nk, CAST(sum(rev) AS BIGINT) * 10000
                   // (SELECT CAST(sum(rev) AS BIGINT) FROM rev) AS share_bp
          FROM rev GROUP BY 1),
        bu AS (
          SELECT cur.nk, cur.d, cur.rev, prev.rev AS fc_bu
          FROM rev cur JOIN rev prev
            ON cur.nk = prev.nk AND cur.d = prev.d + 7),
        td AS (
          SELECT bu.nk, bu.d, bu.rev, bu.fc_bu,
                 t.trev * s.share_bp // 10000 AS fc_td
          FROM bu
          JOIN (SELECT d + 7 AS d, trev FROM tot) t ON bu.d = t.d
          JOIN share s ON bu.nk = s.nk)
        SELECT nk, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(rev - fc_bu)) // count(*) AS BIGINT) AS mae_bu_usd,
               CAST(sum(abs(rev - fc_td)) // count(*) AS BIGINT) AS mae_td_usd,
               CAST(CASE WHEN sum(abs(rev - fc_bu)) <= sum(abs(rev - fc_td))
                 THEN 1 ELSE 0 END AS BIGINT) AS bu_wins
        FROM td GROUP BY 1 ORDER BY 1"""))
  )
}
