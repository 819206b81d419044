package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 48 — forecasting baselines, process
  * control, ML feature encoding and evaluation:
  *
  *  - q218: seasonal-naive backtest — forecast(day) = count(day-7),
  *    evaluated per event type in exact integer milli (MAE + signed
  *    bias). The baseline every fancier forecaster (q174 OLS, q210
  *    Holt) must beat; a self-equi-join on (type, day-7), never a
  *    window over gappy days.
  *  - q219: SPC rule-1 control chart — days where (n·y − S1)² >
  *    9·(n·S2 − S1²), i.e. |y − μ| > 3σ, decided ENTIRELY in BIGINT
  *    (the variance inequality is cross-multiplied; no sqrt, no FP).
  *    Per-type violation counts + the peak squared-deviation ratio.
  *  - q220: smoothed target encoding — per-brand mean retail price with
  *    Laplace/shrinkage smoothing enc = (Σcents + m·g) ÷ (n + m),
  *    m=10, g = global mean cents: the leakage-safe categorical
  *    encoder at corpus scale (one agg + one broadcast scalar).
  *  - q221: decile lift/capture curve — q208's deterministic hash score
  *    binned to deciles, ordered best-first: cumulative capture bp and
  *    lift pct in exact integers (cross-multiplied ratios). The model-
  *    evaluation report that consumes q208's calibration bins.
  *
  * Reference analog: seasonal-naive = weekday-pattern harvest-volume
  * check (pairs q139/q199); SPC = survey-throughput anomaly alarm;
  * target encoding = price-level feature per listing category; lift =
  * responder-targeting audit of the estimated-listings score.
  */
object QueriesBC extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q218
    QDef("q218_seasonal_naive",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
        val prev = daily.select(col("event_type"),
          (col("day") + 7L).as("day"), col("y").as("y7"))
        daily.join(prev, Seq("event_type", "day"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("y") - col("y7"))).cast("bigint").as("sae"),
            sum(col("y") - col("y7")).cast("bigint").as("sse"))
          .selectExpr("event_type", "n_eval",
            "sae * 1000 DIV n_eval AS mae_milli",
            "sse * 1000 DIV n_eval AS bias_milli")
          .orderBy("event_type")
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
          FROM events GROUP BY 1, 2),
        j AS (
          SELECT a.event_type, a.y, b.y AS y7
          FROM d a JOIN d b
            ON a.event_type = b.event_type AND a.day = b.day + 7)
        SELECT event_type, count(*) AS n_eval,
               CAST(sum(abs(y - y7)) AS BIGINT) * 1000 // count(*) AS mae_milli,
               CAST(sum(y - y7) AS BIGINT) * 1000 // count(*) AS bias_milli
        FROM j GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q219
    QDef("q219_spc_rules",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("y").cast("bigint").as("s1"),
            sum(col("y") * col("y")).cast("bigint").as("s2"))
        daily.join(stats, "event_type")
          .withColumn("dev2", expr("(n * y - s1) * (n * y - s1)"))
          .withColumn("var_n2", expr("n * s2 - s1 * s1"))
          .groupBy("event_type")
          .agg(max("n").as("n_days"),
            sum(when(col("dev2") > lit(9L) * col("var_n2"), 1L).otherwise(0L))
              .cast("bigint").as("n_viol"),
            max("dev2").as("max_dev2"), max("var_n2").as("var_n2"))
          .selectExpr("event_type", "n_days", "n_viol",
            "CASE WHEN var_n2 > 0 THEN 100 * max_dev2 DIV var_n2 END AS max_z2_pct")
          .orderBy("event_type")
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(y) AS BIGINT) AS s1,
                 CAST(sum(y * y) AS BIGINT) AS s2
          FROM d GROUP BY 1),
        j AS (
          SELECT d.event_type,
                 (st.n * d.y - st.s1) * (st.n * d.y - st.s1) AS dev2,
                 st.n * st.s2 - st.s1 * st.s1 AS var_n2, st.n
          FROM d JOIN st ON d.event_type = st.event_type)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN dev2 > 9 * var_n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol,
               CASE WHEN max(var_n2) > 0
                    THEN 100 * max(dev2) // max(var_n2) END AS max_z2_pct
        FROM j GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q220
    QDef("q220_target_encoding",
      (s, dir) => {
        val p = t(s, dir, "part")
          .selectExpr("p_brand",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents")
        val g = p.agg(expr("CAST(sum(cents) AS BIGINT) DIV count(1)").as("gmean"))
        p.groupBy("p_brand")
          .agg(count(lit(1)).as("n"), sum("cents").cast("bigint").as("sum_cents"))
          .crossJoin(broadcast(g))
          .selectExpr("p_brand", "n",
            "sum_cents DIV n AS mean_cents",
            "(sum_cents + 10 * gmean) DIV (n + 10) AS enc_cents")
          .orderBy("p_brand")
      },
      Some("""
        WITH p AS (
          SELECT p_brand, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
          FROM part),
        g AS (SELECT CAST(sum(cents) AS BIGINT) // count(*) AS gmean FROM p)
        SELECT p_brand, count(*) AS n,
               CAST(sum(cents) AS BIGINT) // count(*) AS mean_cents,
               (CAST(sum(cents) AS BIGINT) + 10 * g.gmean) // (count(*) + 10) AS enc_cents
        FROM p CROSS JOIN g
        GROUP BY p_brand, g.gmean ORDER BY p_brand""")),

    // --------------------------------------------------------------- q221
    QDef("q221_lift_curve",
      (s, dir) => {
        val sc = t(s, dir, "events")
          .select(
            (PortableHash.md5Long(col("event_id").cast("string"), salt = "score~")
              % 10000).as("score_bp"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit"))
          .selectExpr("score_bp DIV 1000 AS bin", "hit")
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("hit").cast("bigint").as("hits"))
        val w = Window.orderBy(col("bin").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.orderBy(col("bin").desc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        sc.withColumn("cum_n", sum("n").over(w))
          .withColumn("cum_hits", sum("hits").over(w))
          .withColumn("tot_n", sum("n").over(tot))
          .withColumn("tot_hits", sum("hits").over(tot))
          .selectExpr("bin", "n", "hits",
            "cum_hits * 10000 DIV tot_hits AS capture_bp",
            "100 * (cum_hits * tot_n) DIV (cum_n * tot_hits) AS lift_pct")
          .orderBy(col("bin").desc)
      },
      Some(s"""
        WITH sc AS (
          SELECT ${PortableHash.md5LongSql("CAST(event_id AS VARCHAR)", salt = "score~")}
                   % 10000 AS score_bp,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
          FROM events),
        b AS (
          SELECT score_bp // 1000 AS bin, count(*) AS n,
                 CAST(sum(hit) AS BIGINT) AS hits
          FROM sc GROUP BY 1),
        c AS (
          SELECT bin, n, hits,
                 sum(n) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                 sum(hits) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hits,
                 sum(n) OVER () AS tot_n, sum(hits) OVER () AS tot_hits
          FROM b)
        SELECT bin, n, hits,
               CAST(cum_hits * 10000 // tot_hits AS BIGINT) AS capture_bp,
               CAST(100 * (cum_hits * tot_n) // (cum_n * tot_hits) AS BIGINT) AS lift_pct
        FROM c ORDER BY bin DESC"""))
  )
}
