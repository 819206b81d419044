package graft.queries

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 4 — the analytics shapes a reporting
  * surface needs beyond plain joins/aggregations:
  *
  *  - q88: decorrelated scalar subquery (above-group-average filter) with
  *    an EXACT decimal cross-multiply comparison (no double division on
  *    the predicate path).
  *  - q90: time-series gap filling with LOCF imputation (count-over
  *    grouping trick — portable, no IGNORE NULLS dependence).
  *  - q93: funnel analysis — strictly-ordered stage sequence
  *    (view → click → purchase) per user with conversion rates.
  *  - q94: cohort retention — first-activity cohort × week offset matrix
  *    in long form.
  *
  * All integer/decimal arithmetic; outputs follow SURVEY §4's
  * OUTPUT-TYPE RULE.
  */
object QueriesK extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q88
    // Above-segment-average customers (the TPC-H Q17/Q22 scalar-subquery
    // shape, decorrelated): per-segment totals join back to rows; the
    // predicate compares bal * n_seg > sum_seg in EXACT decimal
    // arithmetic — no average is ever materialized as a double. At scale:
    // the per-segment aggregate is tiny → broadcast; rows scan once.
    QDef("q88_above_avg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val segs = c.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_seg"), sum(dec(col("c_acctbal"))).as("sum_seg"))
        c.join(broadcast(segs), "c_mktsegment")
          .filter(dec(col("c_acctbal")) * col("n_seg") > col("sum_seg"))
          .groupBy(col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("n_above"),
            max(col("c_acctbal")).as("max_bal"))
          .join(broadcast(segs.select(col("c_mktsegment").as("seg"), col("n_seg"))), "seg")
          .select(col("seg"), col("n_above"), col("n_seg"),
            expr("n_above * 10000 DIV n_seg").as("share_bp"), col("max_bal"))
          .orderBy("seg")
      },
      Some(s"""
        WITH segs AS (
          SELECT c_mktsegment, count(*) AS n_seg,
                 sum(CAST(c_acctbal AS $decSql)) AS sum_seg
          FROM customer GROUP BY 1),
        above AS (
          SELECT c.c_mktsegment AS seg, count(*) AS n_above, max(c_acctbal) AS max_bal
          FROM customer c JOIN segs s ON c.c_mktsegment = s.c_mktsegment
          WHERE CAST(c_acctbal AS $decSql) * n_seg > sum_seg
          GROUP BY 1)
        SELECT seg, CAST(n_above AS BIGINT) AS n_above, CAST(n_seg AS BIGINT) AS n_seg,
               CAST(n_above * 10000 // n_seg AS BIGINT) AS share_bp, max_bal
        FROM above JOIN segs ON above.seg = segs.c_mktsegment
        ORDER BY seg""")),

    // ---------------------------------------------------------------- q90
    // Gap-filled daily series with LOCF imputation: per-user day spine
    // (sequence explode between first and last active day), observed
    // daily sums left-join on, gaps carry the last observation forward.
    // The grouping trick — grp = running count of non-null observations,
    // fill = max within (user, grp) — is pure window algebra: portable,
    // and at scale one shuffle on user (spine explode is map-side).
    QDef("q90_gap_fill",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("user_id") < 20)
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day", "value")
          .groupBy("user_id", "day")
          .agg(sum(dec(col("value"))).as("v"))
        val spine = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
        val wRun = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val filled = spine.join(daily, Seq("user_id", "day"), "left_outer")
          .withColumn("grp", count(col("v")).over(wRun))
          .withColumn("fv", max(col("v")).over(Window.partitionBy("user_id", "grp")))
        filled.groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            count(col("v")).as("n_observed"),
            (count(lit(1)) - count(col("v"))).as("n_filled"),
            dec38(sum(col("fv"))).as("sum_filled"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH daily AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS day,
                 sum(CAST(value AS $decSql)) AS v
          FROM events WHERE user_id < 20 GROUP BY 1, 2),
        spine AS (
          SELECT user_id, unnest(range(min(day), max(day) + 1)) AS day
          FROM daily GROUP BY user_id),
        joined AS (
          SELECT s.user_id, s.day, d.v,
                 count(d.v) OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day),
        filled AS (
          SELECT user_id, day, v,
                 max(v) OVER (PARTITION BY user_id, grp) AS fv
          FROM joined)
        SELECT user_id, count(*) AS n_days,
               CAST(count(v) AS BIGINT) AS n_observed,
               CAST(count(*) - count(v) AS BIGINT) AS n_filled,
               CAST(sum(fv) AS $dec38Sql) AS sum_filled
        FROM filled
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q93
    // Funnel analysis with STRICT stage ordering: stage 2 counts only
    // clicks after the user's first view; stage 3 only purchases after
    // that click. Sequential dependency = one aggregation per stage with
    // a join on the previous stage's timestamp (shuffles hash-partition
    // on user_id and reuse the same key every stage — co-partitioned at
    // scale). Conversion basis points vs the previous stage.
    QDef("q93_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events").selectExpr("user_id", "event_type", s"$tsMs AS ts_ms")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("tv"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts_ms") > col("tv"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("tc"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts_ms") > col("tc"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("tp"))
        def stage(n: Int, name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).cast("bigint").as("n_users"))
            .select(lit(n).cast("bigint").as("stage"), lit(name).as("name"), col("n_users"))
        val s1 = stage(1, "view", v)
        val s2 = stage(2, "click_after_view", c)
        val s3 = stage(3, "purchase_after_click", p)
        val all = s1.union(s2).union(s3)
        val wLag = Window.orderBy("stage")
        all
          .withColumn("prev", lag(col("n_users"), 1).over(wLag))
          // prev = 0 only on an empty stage (possible on empty partitions
          // at scale): define conversion-out-of-nothing as 100%
          .withColumn("conv_bp",
            expr("CASE WHEN prev IS NULL OR prev = 0 THEN 10000 " +
              "ELSE n_users * 10000 DIV prev END"))
          .drop("prev")
          .orderBy("stage")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        v AS (SELECT user_id, min(ts_ms) AS tv FROM ev WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(ts_ms) AS tc FROM ev e JOIN v ON e.user_id = v.user_id
              WHERE event_type = 'click' AND ts_ms > tv GROUP BY 1),
        p AS (SELECT e.user_id, min(ts_ms) AS tp FROM ev e JOIN c ON e.user_id = c.user_id
              WHERE event_type = 'purchase' AND ts_ms > tc GROUP BY 1),
        stages AS (
          SELECT 1 AS stage, 'view' AS name, count(*) AS n_users FROM v
          UNION ALL SELECT 2, 'click_after_view', count(*) FROM c
          UNION ALL SELECT 3, 'purchase_after_click', count(*) FROM p)
        SELECT CAST(stage AS BIGINT) AS stage, name, CAST(n_users AS BIGINT) AS n_users,
               CAST(CASE WHEN prev IS NULL OR prev = 0 THEN 10000
                    ELSE n_users * 10000 // prev END AS BIGINT) AS conv_bp
        FROM (SELECT *, lag(n_users) OVER (ORDER BY stage) AS prev FROM stages)
        ORDER BY stage""")),

    // ---------------------------------------------------------------- q94
    // Cohort retention in long form: users cohorted by first-activity
    // week; per (cohort_week, week_offset) distinct actives and retention
    // vs the cohort size. Two shuffles (first-activity per user, then the
    // cohort×offset rollup) — both partial-aggregated; the cohort-size
    // join side is tiny → broadcast.
    QDef("q94_cohort_retention",
      (s, dir) => {
        val weekMs = 7L * 86400000L
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV $weekMs AS week")
        val firstW = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
        val active = ev.join(firstW, "user_id")
          .select(col("cohort_week"), (col("week") - col("cohort_week")).as("offset"),
            col("user_id"))
          .filter(col("offset") <= 4)
          .groupBy("cohort_week", "offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
        val sizes = firstW.groupBy("cohort_week")
          .agg(countDistinct(col("user_id")).as("cohort_size"))
        active.join(broadcast(sizes), "cohort_week")
          .select(col("cohort_week"), col("offset"), col("n_active"), col("cohort_size"),
            expr("n_active * 10000 DIV cohort_size").as("retention_bp"))
          .orderBy("cohort_week", "offset")
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
        firstw AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
        active AS (
          SELECT cohort_week, week - cohort_week AS "offset",
                 count(DISTINCT e.user_id) AS n_active
          FROM ev e JOIN firstw f ON e.user_id = f.user_id
          WHERE week - cohort_week <= 4
          GROUP BY 1, 2),
        sizes AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
                  FROM firstw GROUP BY 1)
        SELECT a.cohort_week AS cohort_week, "offset",
               CAST(n_active AS BIGINT) AS n_active,
               CAST(cohort_size AS BIGINT) AS cohort_size,
               CAST(n_active * 10000 // cohort_size AS BIGINT) AS retention_bp
        FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
        ORDER BY cohort_week, "offset""""))
  )
}
