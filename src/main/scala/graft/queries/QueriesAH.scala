package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 27:
  *
  *  - q150: OHLC candlesticks — per (event_type, day): open/close via
  *    rank-1 conditional aggregation (deterministic first/last by
  *    (ts, event_id)), high/low/n. The monitoring time-series rollup.
  *  - q151: rolling 7-day distinct actives (WAU) — sliding-window
  *    DISTINCT via the cover trick: each (user, active-day) row covers
  *    the 7 window-ends it contributes to (bounded ×7 fan-out, one
  *    dedup + one count — no per-window rescan), plus same-day DAU and
  *    stickiness bp. The growth-analytics staple, exactly.
  *  - q152: survival curve (life table) — signup→first-purchase latency
  *    with right-censoring at the observation horizon: per latency day,
  *    at-risk / converted / censored counts and the conversion hazard in
  *    bp. All integer; the cohort time-to-event operator.
  *  - q153: SCD2 temporal lookup join — events joined to the order-derived
  *    dimension VERSION valid at event time ([valid_from, valid_to) from
  *    lead() with deterministic tiebreak). The warehouse point-in-time
  *    dimension enrichment (complements q05 build / q115 reconstruct).
  */
object QueriesAH extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q150_ohlc",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day",
            s"$tsMs AS ts_ms", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val wAsc = Window.partitionBy("event_type", "day")
          .orderBy(col("ts_ms"), col("event_id"))
        val wDesc = Window.partitionBy("event_type", "day")
          .orderBy(col("ts_ms").desc, col("event_id").desc)
        ev.withColumn("rf", row_number().over(wAsc))
          .withColumn("rl", row_number().over(wDesc))
          .groupBy("event_type", "day")
          .agg(max(when(col("rf") === 1, col("vc"))).as("open_cents"),
            max(when(col("rl") === 1, col("vc"))).as("close_cents"),
            max("vc").as("high_cents"), min("vc").as("low_cents"),
            count(lit(1)).as("n"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 epoch_ms(ts) AS ts_ms, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY event_type, day
                   ORDER BY ts_ms, event_id) AS rf,
                 row_number() OVER (PARTITION BY event_type, day
                   ORDER BY ts_ms DESC, event_id DESC) AS rl
          FROM ev)
        SELECT event_type, day,
               max(CASE WHEN rf = 1 THEN vc END) AS open_cents,
               max(CASE WHEN rl = 1 THEN vc END) AS close_cents,
               max(vc) AS high_cents, min(vc) AS low_cents,
               count(*) AS n
        FROM r GROUP BY 1, 2 ORDER BY 1, 2""")),

    QDef("q151_rolling_distinct",
      (s, dir) => {
        val ud = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day")
          .distinct()
        val wau = ud
          .select(col("user_id"),
            explode(expr("sequence(day, day + 6)")).as("wend"))
          .distinct()
          .groupBy("wend").agg(count(lit(1)).as("wau"))
        val dau = ud.groupBy(col("day").as("wend"))
          .agg(count(lit(1)).as("dau"))
        wau.join(dau, Seq("wend"), "left")
          .na.fill(0L, Seq("dau"))
          .selectExpr("wend", "wau", "dau",
            "dau * 10000 DIV wau AS stickiness_bp")
          .orderBy("wend")
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        cover AS (
          SELECT DISTINCT user_id, day + d AS wend
          FROM ud, unnest(range(0, 7)) AS t(d)),
        wau AS (SELECT wend, count(*) AS wau FROM cover GROUP BY 1),
        dau AS (SELECT day AS wend, count(*) AS dau FROM ud GROUP BY 1)
        SELECT w.wend, w.wau,
               CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
               CAST(coalesce(d.dau, 0) AS BIGINT) * 10000 // w.wau AS stickiness_bp
        FROM wau w LEFT JOIN dau d ON w.wend = d.wend
        ORDER BY w.wend""")),

    QDef("q152_survival_curve",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val horizon = ev.agg(max(expr(tsMs)).as("hz"))
        val s0 = ev.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min(expr(tsMs)).as("s0"))
        val p0 = ev.where(col("event_type") === "purchase")
          .selectExpr("user_id", s"$tsMs AS pts")
        val users = s0
          .join(p0, s0("user_id") === p0("user_id") && p0("pts") >= s0("s0"),
            "left")
          .drop(p0("user_id"))
          .groupBy("user_id", "s0").agg(min("pts").as("p1"))
          .crossJoin(broadcast(horizon))
          .selectExpr("user_id",
            "CASE WHEN p1 IS NULL THEN NULL ELSE (p1 - s0) DIV 86400000 END AS lat",
            "(hz - s0) DIV 86400000 AS cens")
        users
          .crossJoin(broadcast(
            users.sparkSession.range(0, 15).selectExpr("id AS d")))
          .groupBy("d")
          .agg(
            sum(when((col("lat").isNull && col("cens") >= col("d")) ||
              (col("lat").isNotNull && col("lat") >= col("d")), 1L)
              .otherwise(0L)).cast("bigint").as("at_risk"),
            sum(when(col("lat") === col("d"), 1L).otherwise(0L))
              .cast("bigint").as("converted"),
            sum(when(col("lat").isNull && col("cens") === col("d"), 1L)
              .otherwise(0L)).cast("bigint").as("censored"))
          .withColumn("hazard_bp",
            when(col("at_risk") > 0,
              expr("converted * 10000 DIV at_risk")))
          .orderBy("d")
      },
      Some("""
        WITH hz AS (SELECT max(epoch_ms(ts)) AS hz FROM events),
        s0 AS (
          SELECT user_id, min(epoch_ms(ts)) AS s0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        p0 AS (
          SELECT user_id, epoch_ms(ts) AS pts FROM events
          WHERE event_type = 'purchase'),
        u AS (
          SELECT s0.user_id, s0.s0, min(p0.pts) AS p1
          FROM s0 LEFT JOIN p0 ON s0.user_id = p0.user_id
            AND p0.pts >= s0.s0
          GROUP BY 1, 2),
        lc AS (
          SELECT user_id,
                 CASE WHEN p1 IS NULL THEN NULL
                      ELSE (p1 - s0) // 86400000 END AS lat,
                 (hz.hz - s0) // 86400000 AS cens
          FROM u, hz),
        days AS (SELECT unnest(range(0, 15)) AS d)
        SELECT d.d,
               CAST(sum(CASE WHEN (lat IS NULL AND cens >= d.d)
                 OR (lat IS NOT NULL AND lat >= d.d) THEN 1 ELSE 0 END)
                 AS BIGINT) AS at_risk,
               CAST(sum(CASE WHEN lat = d.d THEN 1 ELSE 0 END)
                 AS BIGINT) AS converted,
               CAST(sum(CASE WHEN lat IS NULL AND cens = d.d THEN 1 ELSE 0 END)
                 AS BIGINT) AS censored,
               CASE WHEN sum(CASE WHEN (lat IS NULL AND cens >= d.d)
                 OR (lat IS NOT NULL AND lat >= d.d) THEN 1 ELSE 0 END) > 0
                 THEN CAST(sum(CASE WHEN lat = d.d THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000 // CAST(sum(CASE WHEN (lat IS NULL AND cens >= d.d)
                   OR (lat IS NOT NULL AND lat >= d.d) THEN 1 ELSE 0 END) AS BIGINT)
                 END AS hazard_bp
        FROM lc, days d
        GROUP BY 1 ORDER BY 1""")),

    QDef("q153_scd2_lookup",
      (s, dir) => {
        val wv = Window.partitionBy("o_custkey")
          .orderBy(col("vfrom"), col("o_orderkey"))
        val dim = t(s, dir, "orders")
          .selectExpr("o_custkey", "o_orderkey", "o_orderpriority",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS vfrom")
          .withColumn("vto", lead("vfrom", 1).over(wv))
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ets",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        ev.join(dim, ev("user_id") === dim("o_custkey") &&
            ev("ets") >= dim("vfrom") &&
            (dim("vto").isNull || ev("ets") < dim("vto")))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_events"),
            sum("vc").cast("bigint").as("sum_cents"),
            countDistinct("o_orderkey").as("n_versions"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH dim AS (
          SELECT o_custkey, o_orderkey, o_orderpriority,
                 epoch_ms(o_orderdate) AS vfrom,
                 lead(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey
                   ORDER BY epoch_ms(o_orderdate), o_orderkey) AS vto
          FROM orders),
        ev AS (
          SELECT user_id, epoch_ms(ts) AS ets,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events)
        SELECT d.o_orderpriority, count(*) AS n_events,
               CAST(sum(e.vc) AS BIGINT) AS sum_cents,
               CAST(count(DISTINCT d.o_orderkey) AS BIGINT) AS n_versions
        FROM ev e JOIN dim d ON e.user_id = d.o_custkey
          AND e.ets >= d.vfrom AND (d.vto IS NULL OR e.ets < d.vto)
        GROUP BY 1 ORDER BY 1"""))
  )
}
