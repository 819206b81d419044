package graft.queries

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 103 — k-group and blocked rank tests,
  * iterative outlier peeling:
  *
  *  - q432: Kruskal–Wallis rank test of daily revenue across day-of-week
  *    groups — q303's doubled-midrank machinery generalized to k groups:
  *    H = 3·Σ(R²ⱼ/nⱼ)/(N(N+1)) − 3(N+1) kept integer by the shared
  *    ×2520 common-denominator trick (2520 divides by every group size a
  *    ≤70-day span can produce), micro-quantized once at the end.
  *    Uncorrected for ties (documented; ties in cent-grain revenue are
  *    measure-thin and identical in both engines either way).
  *  - q433: Friedman blocked rank test — days are blocks, the 5 event
  *    types are treatments ranked WITHIN each complete day (doubled
  *    midranks 2·rank + eq − 1); χ² = 3·Σr2²ⱼ·10⁶ DIV (n·k·(k+1)) − (r2 = doubled ranks, = 12ΣR²)
  *    3n(k+1)·10⁶. The repeated-measures companion of q432 (blocks
  *    remove the day-level volume nuisance).
  *  - q434: generalized-ESD outlier peeling — three rounds of "flag and
  *    remove the max-deviation day": deviation and threshold compared
  *    entirely in BIGINT via (n·x−S1)² vs 9·(n·S2−S1²) (q219's
  *    cross-multiplied 3σ), recomputing moments on the shrinking set
  *    each round. Catches masked outliers a single 3σ pass misses —
  *    each round is one aggregate + one argmax window + one anti-join.
  *
  * Reference analog: does weekday drive harvest revenue; do surfaces
  * rank consistently within days; masked volume-anomaly days.
  */
object QueriesDF extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q432
    QDef("q432_kruskal_wallis",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS d",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("d").agg(sum("cents").cast("bigint").as("v"))
          .selectExpr("(d + 4) % 7 AS dow", "v")
        val vals = daily.groupBy("v").agg(count(lit(1)).as("c"))
          .withColumn("rank2", expr(
            "2 * sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1"))
        val byGroup = daily.groupBy("dow", "v").agg(count(lit(1)).as("cj"))
          .join(vals.select("v", "rank2"), "v")
          .groupBy("dow").agg(
            sum("cj").cast("bigint").as("n_days"),
            sum(col("cj") * col("rank2")).cast("bigint").as("r2_sum"))
        val tot = byGroup.agg(
          sum("n_days").cast("bigint").as("nn"),
          sum(expr("(r2_sum * r2_sum) * (2520 DIV n_days)"))
            .cast("bigint").as("qi"))
          .selectExpr("nn",
            "(3 * qi * 1000000) DIV (2520 * nn * (nn + 1)) - 3 * (nn + 1) * 1000000 AS h_micro")
        byGroup.crossJoin(broadcast(tot))
          .selectExpr("dow", "n_days", "r2_sum",
            "r2_sum * 1000 DIV (2 * n_days) AS mean_rank_milli",
            "nn AS n_total", "h_micro")
          .orderBy("dow")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS v
          FROM events GROUP BY 1),
        dd AS (SELECT (d + 4) % 7 AS dow, v FROM daily),
        vals AS (
          SELECT v, count(*) AS c FROM dd GROUP BY 1),
        ranked AS (
          SELECT v, 2 * sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                 - c + 1 AS rank2
          FROM vals),
        grp AS (
          SELECT dow, sum(cj) AS n_days, sum(cj * rank2) AS r2_sum
          FROM (SELECT dow, dd.v, count(*) AS cj FROM dd GROUP BY 1, 2) g
          JOIN ranked ON g.v = ranked.v
          GROUP BY 1),
        tot AS (
          SELECT sum(n_days) AS nn,
                 sum((r2_sum * r2_sum) * (2520 // n_days)) AS qi
          FROM grp),
        h AS (
          SELECT nn, (3 * qi * 1000000) // (2520 * nn * (nn + 1))
                     - 3 * (nn + 1) * 1000000 AS h_micro
          FROM tot)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
               CAST(r2_sum AS BIGINT) AS r2_sum,
               CAST(r2_sum * 1000 // (2 * n_days) AS BIGINT)
                 AS mean_rank_milli,
               CAST(nn AS BIGINT) AS n_total,
               CAST(h_micro AS BIGINT) AS h_micro
        FROM grp, h ORDER BY dow""")),

    // --------------------------------------------------------------- q433
    QDef("q433_friedman",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val k = daily.agg(countDistinct("event_type").as("k"))
        val complete = daily
          .withColumn("types_today", count(lit(1)).over(
            Window.partitionBy("d")).cast("long"))
          .crossJoin(broadcast(k))
          .where(col("types_today") === col("k"))
        val ranked = complete
          .withColumn("mr", rank().over(
            Window.partitionBy("d").orderBy("c")).cast("long"))
          .withColumn("eq", count(lit(1)).over(
            Window.partitionBy("d", "c")).cast("long"))
          .selectExpr("event_type", "d", "k", "2 * mr + eq - 1 AS rank2")
        val byType = ranked.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n_days"),
          max("k").cast("long").as("k"),
          sum("rank2").cast("bigint").as("r2_sum"))
        val chi = byType.agg(
          max("n_days").as("n"), max("k").as("kk"),
          sum(col("r2_sum") * col("r2_sum")).cast("bigint").as("q"))
          .selectExpr(
            "(3 * q * 1000000) DIV (n * kk * (kk + 1)) - 3 * n * (kk + 1) * 1000000 AS chi2_micro")
        byType.crossJoin(broadcast(chi))
          .selectExpr("event_type", "n_days", "r2_sum",
            "r2_sum * 1000 DIV (2 * n_days) AS mean_rank_milli",
            "chi2_micro")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        k AS (SELECT count(DISTINCT event_type) AS k FROM daily),
        complete AS (
          SELECT daily.*, k.k FROM daily, k
          WHERE d IN (SELECT d FROM daily GROUP BY d
                      HAVING count(*) = (SELECT k FROM k))),
        ranked AS (
          SELECT event_type, d, k,
                 2 * rank() OVER (PARTITION BY d ORDER BY c)
                 + count(*) OVER (PARTITION BY d, c) - 1 AS rank2
          FROM complete),
        bt AS (
          SELECT event_type, count(*) AS n_days, max(k) AS k,
                 sum(rank2) AS r2_sum
          FROM ranked GROUP BY 1),
        chi AS (
          SELECT (3 * sum(r2_sum * r2_sum) * 1000000)
                   // (max(n_days) * max(k) * (max(k) + 1))
                 - 3 * max(n_days) * (max(k) + 1) * 1000000 AS chi2_micro
          FROM bt)
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               CAST(r2_sum AS BIGINT) AS r2_sum,
               CAST(r2_sum * 1000 // (2 * n_days) AS BIGINT)
                 AS mean_rank_milli,
               CAST(chi2_micro AS BIGINT) AS chi2_micro
        FROM bt, chi ORDER BY event_type""")),

    // --------------------------------------------------------------- q434
    QDef("q434_esd_peel",
      (s, dir) => {
        val daily0 = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("x"))
        var remaining = daily0
        var out: Seq[DataFrame] = Nil
        for (round <- 1 to 3) {
          val m = remaining.groupBy("event_type").agg(
            count(lit(1)).cast("long").as("n"),
            sum("x").cast("bigint").as("s1"),
            sum(col("x") * col("x")).cast("bigint").as("s2"))
          val scored = remaining.join(m, "event_type")
            .selectExpr("event_type", "d", "x", "n",
              "(n * x - s1) * (n * x - s1) AS d2",
              "9 * (n * s2 - s1 * s1) AS thresh2")
          val winner = scored
            .withColumn("rk", row_number().over(Window
              .partitionBy("event_type")
              .orderBy(col("d2").desc, col("d"))))
            .where(col("rk") === 1)
            .select(col("event_type"), lit(round.toLong).as("round"),
              col("d"), col("x"), (col("d2") > col("thresh2")).as("flagged"))
          out = out :+ winner
          remaining = remaining.as("r")
            .join(winner.select(col("event_type").as("et"), col("d").as("wd")),
              col("r.event_type") === col("et") && col("r.d") === col("wd"),
              "left_anti")
        }
        out.reduce(_ union _).orderBy("event_type", "round")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        m1 AS (SELECT event_type, count(*) AS n, sum(x) AS s1,
                      sum(x * x) AS s2 FROM daily GROUP BY 1),
        s1c AS (
          SELECT daily.event_type, d, x,
                 (n * x - s1) * (n * x - s1) AS d2,
                 9 * (n * s2 - s1 * s1) AS thresh2,
                 row_number() OVER (PARTITION BY daily.event_type
                   ORDER BY (n * x - s1) * (n * x - s1) DESC, d) AS rk
          FROM daily JOIN m1 ON daily.event_type = m1.event_type),
        w1 AS (SELECT event_type, d, x, (d2 > thresh2) AS flagged
               FROM s1c WHERE rk = 1),
        r1 AS (SELECT daily.* FROM daily
               WHERE NOT EXISTS (SELECT 1 FROM w1
                 WHERE w1.event_type = daily.event_type AND w1.d = daily.d)),
        m2 AS (SELECT event_type, count(*) AS n, sum(x) AS s1,
                      sum(x * x) AS s2 FROM r1 GROUP BY 1),
        s2c AS (
          SELECT r1.event_type, d, x,
                 (n * x - s1) * (n * x - s1) AS d2,
                 9 * (n * s2 - s1 * s1) AS thresh2,
                 row_number() OVER (PARTITION BY r1.event_type
                   ORDER BY (n * x - s1) * (n * x - s1) DESC, d) AS rk
          FROM r1 JOIN m2 ON r1.event_type = m2.event_type),
        w2 AS (SELECT event_type, d, x, (d2 > thresh2) AS flagged
               FROM s2c WHERE rk = 1),
        r2 AS (SELECT r1.* FROM r1
               WHERE NOT EXISTS (SELECT 1 FROM w2
                 WHERE w2.event_type = r1.event_type AND w2.d = r1.d)),
        m3 AS (SELECT event_type, count(*) AS n, sum(x) AS s1,
                      sum(x * x) AS s2 FROM r2 GROUP BY 1),
        s3c AS (
          SELECT r2.event_type, d, x,
                 (n * x - s1) * (n * x - s1) AS d2,
                 9 * (n * s2 - s1 * s1) AS thresh2,
                 row_number() OVER (PARTITION BY r2.event_type
                   ORDER BY (n * x - s1) * (n * x - s1) DESC, d) AS rk
          FROM r2 JOIN m3 ON r2.event_type = m3.event_type),
        w3 AS (SELECT event_type, d, x, (d2 > thresh2) AS flagged
               FROM s3c WHERE rk = 1)
        SELECT event_type, CAST(1 AS BIGINT) AS round, CAST(d AS BIGINT) AS d,
               CAST(x AS BIGINT) AS x, flagged
        FROM w1
        UNION ALL SELECT event_type, 2, d, x, flagged FROM w2
        UNION ALL SELECT event_type, 3, d, x, flagged FROM w3
        ORDER BY event_type, round"""))
  )
}
