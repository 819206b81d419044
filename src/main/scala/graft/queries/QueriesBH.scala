package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 53 — SLO accounting, causal
  * analysis, ensemble anomaly detection, fulfillment aging:
  *
  *  - q238: error-budget burn — daily error-event share (bp) vs a
  *    2100 bp budget, per week: days over budget, worst day, total
  *    burn. The SRE report over the scraper's failure stream.
  *  - q239: difference-in-differences — deterministic treatment split
  *    (odd user_id) × pre/post 2024-01-16: purchase-share bp per cell
  *    and the DiD estimate, all truncating-integer rates computed with
  *    ONE shared formula. The A/B-with-trend-control analysis (q133's
  *    chi-square tells significance; this tells effect size).
  *  - q240: consensus anomaly — days flagged by BOTH detectors the
  *    engine already ships: |y−μ| > 3σ (q219's cross-multiplied SPC
  *    inequality) AND |y − y(d−7)| > 2·MAE (q218's seasonal-naive
  *    error): per type the flag counts of each detector and their
  *    intersection. Ensemble voting cuts false positives — the
  *    monitoring pattern at fleet scale.
  *  - q241: fulfillment aging — last-ship minus order date bucketed
  *    (≤7d / ≤30d / ≤90d / >90d / never-shipped) per order priority
  *    with exact mean age. One orders⋈lineitem max-agg join.
  *
  * Reference analog: error budget = scraper failure-rate SLO; DiD =
  * scheduling-policy change impact on collection yield; consensus
  * anomaly = harvest-volume alarm with fewer pages; aging = task
  * creation→completion latency ledger (q91's retry view, order side).
  */
object QueriesBH extends QueryPack {
  import Q._

  private val SplitMs = millisOf("2024-01-16 00:00:00")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q238
    QDef("q238_error_budget",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS day",
            "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err")
          .groupBy("day")
          .agg(count(lit(1)).as("n"), sum("is_err").cast("bigint").as("errs"))
          .withColumn("err_bp", expr("errs * 10000 DIV n"))
        daily.withColumn("week", expr("day DIV 7"))
          .groupBy("week")
          .agg(count(lit(1)).as("n_days"),
            sum(when(col("err_bp") > 2100L, 1L).otherwise(0L))
              .cast("bigint").as("n_over"),
            max("err_bp").as("worst_bp"),
            sum(when(col("err_bp") > 2100L, col("err_bp") - 2100L).otherwise(0L))
              .cast("bigint").as("burn_bp"))
          .orderBy("week")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n,
                 CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
          FROM events GROUP BY 1),
        d2 AS (SELECT day, n, errs, errs * 10000 // n AS err_bp FROM daily)
        SELECT day // 7 AS week, count(*) AS n_days,
               CAST(sum(CASE WHEN err_bp > 2100 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
               max(err_bp) AS worst_bp,
               CAST(sum(CASE WHEN err_bp > 2100 THEN err_bp - 2100 ELSE 0 END) AS BIGINT)
                 AS burn_bp
        FROM d2 GROUP BY 1 ORDER BY week""")),

    // --------------------------------------------------------------- q239
    QDef("q239_did_analysis",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .selectExpr("user_id % 2 AS treated",
            s"CASE WHEN ($tsMs) >= ${SplitMs}L THEN 1 ELSE 0 END AS post",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit")
          .groupBy("treated", "post")
          .agg(count(lit(1)).as("n"), sum("hit").cast("bigint").as("hits"))
          .withColumn("rate_bp", expr("hits * 10000 DIV n"))
        val wide = cells.groupBy()
          .agg(
            max(when(col("treated") === 1L && col("post") === 1L, col("rate_bp"))).as("t1"),
            max(when(col("treated") === 1L && col("post") === 0L, col("rate_bp"))).as("t0"),
            max(when(col("treated") === 0L && col("post") === 1L, col("rate_bp"))).as("c1"),
            max(when(col("treated") === 0L && col("post") === 0L, col("rate_bp"))).as("c0"))
          .selectExpr("t0 AS treat_pre_bp", "t1 AS treat_post_bp",
            "c0 AS ctrl_pre_bp", "c1 AS ctrl_post_bp",
            "(t1 - t0) - (c1 - c0) AS did_bp")
        wide
      },
      Some(s"""
        WITH cells AS (
          SELECT user_id % 2 AS treated,
                 CASE WHEN epoch_ms(ts) >= $SplitMs THEN 1 ELSE 0 END AS post,
                 count(*) AS n,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                   AS hits
          FROM events GROUP BY 1, 2),
        r AS (SELECT treated, post, hits * 10000 // n AS rate_bp FROM cells)
        SELECT
          max(CASE WHEN treated = 1 AND post = 0 THEN rate_bp END) AS treat_pre_bp,
          max(CASE WHEN treated = 1 AND post = 1 THEN rate_bp END) AS treat_post_bp,
          max(CASE WHEN treated = 0 AND post = 0 THEN rate_bp END) AS ctrl_pre_bp,
          max(CASE WHEN treated = 0 AND post = 1 THEN rate_bp END) AS ctrl_post_bp,
          max(CASE WHEN treated = 1 AND post = 1 THEN rate_bp END)
            - max(CASE WHEN treated = 1 AND post = 0 THEN rate_bp END)
            - (max(CASE WHEN treated = 0 AND post = 1 THEN rate_bp END)
               - max(CASE WHEN treated = 0 AND post = 0 THEN rate_bp END)) AS did_bp
        FROM r""")),

    // --------------------------------------------------------------- q240
    QDef("q240_consensus_anomaly",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
          .cache()
        daily.count() // eager: three subtrees
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("y").cast("bigint").as("s1"),
            sum(col("y") * col("y")).cast("bigint").as("s2"))
        val naive = daily.select(col("event_type"),
          (col("day") + 7L).as("day"), col("y").as("y7"))
        val mae = daily.join(naive, Seq("event_type", "day"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("y") - col("y7"))).cast("bigint").as("sae"))
        daily.join(stats, "event_type")
          .join(naive, Seq("event_type", "day"), "left")
          .join(mae, "event_type")
          .withColumn("spc_flag",
            expr("CASE WHEN (n*y - s1)*(n*y - s1) > 9*(n*s2 - s1*s1) THEN 1 ELSE 0 END"))
          .withColumn("naive_flag",
            expr("CASE WHEN y7 IS NOT NULL AND abs(y - y7) * n_eval > 2 * sae THEN 1 ELSE 0 END"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum("spc_flag").cast("bigint").as("n_spc"),
            sum("naive_flag").cast("bigint").as("n_naive"),
            sum(col("spc_flag") * col("naive_flag")).cast("bigint").as("n_both"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s1,
                 CAST(sum(y * y) AS BIGINT) AS s2
          FROM daily GROUP BY 1),
        naive AS (SELECT event_type, day + 7 AS day, y AS y7 FROM daily),
        mae AS (
          SELECT d.event_type, count(*) AS n_eval,
                 CAST(sum(abs(d.y - nv.y7)) AS BIGINT) AS sae
          FROM daily d JOIN naive nv
            ON d.event_type = nv.event_type AND d.day = nv.day
          GROUP BY 1),
        f AS (
          SELECT d.event_type,
                 CASE WHEN (st.n*d.y - st.s1)*(st.n*d.y - st.s1)
                           > 9*(st.n*st.s2 - st.s1*st.s1) THEN 1 ELSE 0 END AS spc_flag,
                 CASE WHEN nv.y7 IS NOT NULL
                           AND abs(d.y - nv.y7) * m.n_eval > 2 * m.sae
                      THEN 1 ELSE 0 END AS naive_flag
          FROM daily d
          JOIN st ON st.event_type = d.event_type
          LEFT JOIN naive nv ON nv.event_type = d.event_type AND nv.day = d.day
          JOIN mae m ON m.event_type = d.event_type)
        SELECT event_type, count(*) AS n_days,
               CAST(sum(spc_flag) AS BIGINT) AS n_spc,
               CAST(sum(naive_flag) AS BIGINT) AS n_naive,
               CAST(sum(spc_flag * naive_flag) AS BIGINT) AS n_both
        FROM f GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q241
    QDef("q241_order_aging",
      (s, dir) => {
        val lastShip = t(s, dir, "lineitem")
          .selectExpr("l_orderkey",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) AS ship_ms")
          .groupBy("l_orderkey").agg(max("ship_ms").as("last_ship"))
        t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_orderpriority",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ord_ms")
          .join(lastShip, col("o_orderkey") === col("l_orderkey"), "left")
          .withColumn("age_days",
            expr("(last_ship - ord_ms) DIV 86400000"))
          .selectExpr("o_orderpriority", "age_days", """
            CASE WHEN age_days IS NULL THEN 'e_never'
                 WHEN age_days <= 7 THEN 'a_le_7d'
                 WHEN age_days <= 30 THEN 'b_le_30d'
                 WHEN age_days <= 90 THEN 'c_le_90d'
                 ELSE 'd_gt_90d' END AS bucket""")
          .groupBy("o_orderpriority", "bucket")
          .agg(count(lit(1)).as("n_orders"),
            coalesce(expr("CAST(sum(age_days) AS BIGINT) * 1000 DIV count(age_days)"),
              lit(-1L)).as("mean_age_milli"))
          .orderBy("o_orderpriority", "bucket")
      },
      Some("""
        WITH ls AS (
          SELECT l_orderkey, max(epoch_ms(l_shipdate)) AS last_ship
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT o.o_orderpriority,
                 (ls.last_ship - epoch_ms(o.o_orderdate)) // 86400000 AS age_days
          FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey),
        b AS (
          SELECT o_orderpriority, age_days,
                 CASE WHEN age_days IS NULL THEN 'e_never'
                      WHEN age_days <= 7 THEN 'a_le_7d'
                      WHEN age_days <= 30 THEN 'b_le_30d'
                      WHEN age_days <= 90 THEN 'c_le_90d'
                      ELSE 'd_gt_90d' END AS bucket
          FROM j)
        SELECT o_orderpriority, bucket, count(*) AS n_orders,
               COALESCE(CAST(sum(age_days) AS BIGINT) * 1000 // count(age_days), -1)
                 AS mean_age_milli
        FROM b GROUP BY 1, 2 ORDER BY o_orderpriority, bucket"""))
  )
}
