package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 51 — conversion funnels in time,
  * abandonment, dedup threshold tuning, leaderboard churn:
  *
  *  - q230: time-to-convert distribution — per user, first view → first
  *    subsequent purchase latency, bucketed (<1h / <1d / <7d / ≥7d /
  *    never), with exact mean latency per bucket. Two conditional min
  *    aggregates per user, one groupBy — no event self-join.
  *  - q231: daily abandonment — user-days with clicks but no purchase,
  *    weekly abandonment bp. The conversion-leak monitor (q93's funnel
  *    at day grain, rolling).
  *  - q232: dedup threshold sweep — q33's blocked 3-gram Jaccard pairs
  *    re-aggregated into per-lang counts at ≥20/40/60/80% thresholds.
  *    The tuning report that picks the near-dup cutoff BEFORE a
  *    full-corpus dedup run commits to one (pairs with q38's estimator
  *    accuracy gate).
  *  - q233: leaderboard churn — weekly top-5 parts by revenue, then
  *    consecutive-week set overlap (Jaccard bp). Windowed rank + one
  *    self-equi-join on (part, week+1) over the tiny ranked set.
  *
  * Reference analog: time-to-convert = listing-discovery→booking lag;
  * abandonment = calendar-check-without-quote sessions; threshold sweep
  * = response near-dup cutoff calibration; leaderboard churn =
  * week-over-week top-listings stability report.
  */
object QueriesBF extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q230
    QDef("q230_time_to_convert",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"$tsMs AS ts_ms")
        val perUser = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts_ms"))).as("first_view"),
            min(when(col("event_type") === "purchase", col("ts_ms"))).as("any_purchase"))
        val conv = ev.where(col("event_type") === "purchase")
          .join(perUser.where(col("first_view").isNotNull), "user_id")
          .where(col("ts_ms") >= col("first_view"))
          .groupBy("user_id", "first_view")
          .agg(min("ts_ms").as("first_conv"))
          .withColumn("lat_ms", col("first_conv") - col("first_view"))
        perUser.where(col("first_view").isNotNull)
          .join(conv.select("user_id", "lat_ms"), Seq("user_id"), "left")
          .selectExpr("""
            CASE WHEN lat_ms IS NULL THEN 'e_never'
                 WHEN lat_ms < 3600000 THEN 'a_lt_1h'
                 WHEN lat_ms < 86400000 THEN 'b_lt_1d'
                 WHEN lat_ms < 604800000 THEN 'c_lt_7d'
                 ELSE 'd_ge_7d' END AS bucket""", "lat_ms")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_users"),
            coalesce(expr("CAST(sum(lat_ms) AS BIGINT) DIV count(lat_ms)"), lit(-1L))
              .as("mean_lat_ms"))
          .orderBy("bucket")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        pu AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts_ms END) AS first_view
          FROM ev GROUP BY 1),
        conv AS (
          SELECT e.user_id, min(e.ts_ms) - pu.first_view AS lat_ms
          FROM ev e JOIN pu ON e.user_id = pu.user_id
          WHERE e.event_type = 'purchase' AND pu.first_view IS NOT NULL
            AND e.ts_ms >= pu.first_view
          GROUP BY e.user_id, pu.first_view),
        b AS (
          SELECT CASE WHEN c.lat_ms IS NULL THEN 'e_never'
                      WHEN c.lat_ms < 3600000 THEN 'a_lt_1h'
                      WHEN c.lat_ms < 86400000 THEN 'b_lt_1d'
                      WHEN c.lat_ms < 604800000 THEN 'c_lt_7d'
                      ELSE 'd_ge_7d' END AS bucket, c.lat_ms
          FROM pu LEFT JOIN conv c ON pu.user_id = c.user_id
          WHERE pu.first_view IS NOT NULL)
        SELECT bucket, count(*) AS n_users,
               COALESCE(CAST(sum(lat_ms) AS BIGINT) // count(lat_ms), -1) AS mean_lat_ms
        FROM b GROUP BY 1 ORDER BY bucket""")),

    // --------------------------------------------------------------- q231
    QDef("q231_abandonment",
      (s, dir) => {
        val ud = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day", "event_type")
          .groupBy("user_id", "day")
          .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicked"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"))
          .where(col("clicked") === 1L)
        ud.withColumn("week", expr("day DIV 7"))
          .groupBy("week")
          .agg(count(lit(1)).as("click_days"),
            sum(when(col("purchased") === 0L, 1L).otherwise(0L))
              .cast("bigint").as("abandoned_days"))
          .withColumn("abandon_bp", expr("abandoned_days * 10000 DIV click_days"))
          .orderBy("week")
      },
      Some("""
        WITH ud AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS day,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
          FROM events GROUP BY 1, 2)
        SELECT day // 7 AS week, count(*) AS click_days,
               CAST(sum(CASE WHEN purchased = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS abandoned_days,
               CAST(sum(CASE WHEN purchased = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // count(*) AS abandon_bp
        FROM ud WHERE clicked = 1
        GROUP BY 1 ORDER BY week""")),

    // --------------------------------------------------------------- q232
    QDef("q232_threshold_sweep",
      (s, dir) => {
        // q33's blocked 3-gram Jaccard pipeline, re-aggregated as a
        // threshold-sensitivity report. The r8 plan evaluated Jaccard on
        // EVERY in-block pair (O(Σ block²) with fixed (lang, band)
        // blocks — 20.8 s at sf1, quadratic at 100 TB), but only the
        // thresholded counts need pair identification: n_pairs is pure
        // block-size arithmetic, and every pair with jac_bp ≥ 2000 ⟺
        // jac ≥ 1/5 is provably generated by one q33 PPJoin rung at
        // t = 1/5 (prefix+size+positional filters, exact verify).
        // native one-pass shingle-set build (the q33 r10 fix: O(len) walk,
        // gram→hash memo, no explode/collect_set shuffle)
        val docs = t(s, dir, "documents")
          .filter(length(col("text")) >= 3)
          .select(col("lang"), expr("n_chars DIV 50").as("blk"), col("doc_id"),
            Dedup.shingleSetHash(col("text"), 3).as("g"))
          .withColumn("sz", size(col("g")).cast("bigint"))
          // restore parallelism lost to the map-only build's single
          // parquet-scan partition (see q198)
          .repartition(col("doc_id"))
          .cache()
        docs.count() // eager: census, ranked build, and both verify sides
        val nPairs = docs.groupBy("lang", "blk").agg(count(lit(1)).as("n"))
          .groupBy("lang")
          .agg(sum(expr("n * (n - 1) DIV 2")).cast("bigint").as("n_pairs"))
          .where(col("n_pairs") > 0) // langs with no in-block pair emit no row
        val rk = docs.select(explode(col("g")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("df"))
        val ranked = docs
          .select(col("lang"), col("blk"), col("doc_id"), col("sz"),
            explode(col("g")).as("h"))
          // no broadcast hint: rk is the shingle document-frequency table
          // and grows with vocabulary — AQE broadcasts it while small and
          // keeps a shuffle join on a real web corpus (q-bigram precedent)
          .join(rk, "h")
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")))
          .select("lang", "blk", "doc_id", "sz", "h", "rn")
        val (p, q) = (1L, 5L)
        val pre = ranked.where(
          col("rn") <= col("sz") - expr(s"($p*sz + ${q - 1}) DIV $q") + 1)
        val cand = pre.as("a").join(pre.as("b"),
            col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
              col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
              col("b.sz") * q >= col("a.sz") * p &&
              col("a.sz") * q >= col("b.sz") * p &&
              (lit(1L) + least(col("a.sz") - col("a.rn"),
                col("b.sz") - col("b.rn"))) * (p + q) >=
                (col("a.sz") + col("b.sz")) * p)
          .select(col("a.lang").as("lang"), col("a.doc_id").as("id_a"),
            col("b.doc_id").as("id_b"))
          .distinct()
        val ge = cand
          .join(docs.select(col("doc_id").as("id_a"), col("g").as("g_a"),
            col("sz").as("sz_a")), Seq("id_a"))
          .join(docs.select(col("doc_id").as("id_b"), col("g").as("g_b"),
            col("sz").as("sz_b")), Seq("id_b"))
          .withColumn("inter", Dedup.sortedIntersectCount("g_a", "g_b"))
          .where(col("inter") * (p + q) >= (col("sz_a") + col("sz_b")) * p)
          .withColumn("jac_bp",
            Dedup.jaccardBpFromInter(col("inter"), "g_a", "g_b"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("bigint").as("ge_2000"),
            sum(when(col("jac_bp") >= 4000, 1L).otherwise(0L)).cast("bigint").as("ge_4000"),
            sum(when(col("jac_bp") >= 6000, 1L).otherwise(0L)).cast("bigint").as("ge_6000"),
            sum(when(col("jac_bp") >= 8000, 1L).otherwise(0L)).cast("bigint").as("ge_8000"))
        nPairs.join(ge, Seq("lang"), "left")
          .na.fill(0L, Seq("ge_2000", "ge_4000", "ge_6000", "ge_8000"))
          .select("lang", "n_pairs", "ge_2000", "ge_4000", "ge_6000", "ge_8000")
          .orderBy("lang")
      },
      Some(s"""
        WITH docs0 AS (
          SELECT lang, doc_id, n_chars // 50 AS blk,
                 list_distinct(${TextFunctions.charNgramsSql("text", 3)}) AS g0
          FROM documents),
        d AS (SELECT lang, doc_id, blk,
                     list_distinct(${Dedup.shingleHashesSql("g0")}) AS g
              FROM docs0 WHERE len(g0) > 0),
        p AS (
          SELECT a.lang, ${Dedup.jaccardBpSql("a.g", "b.g")} AS jac_bp
          FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id)
        SELECT lang, count(*) AS n_pairs,
               CAST(sum(CASE WHEN jac_bp >= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS ge_2000,
               CAST(sum(CASE WHEN jac_bp >= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS ge_4000,
               CAST(sum(CASE WHEN jac_bp >= 6000 THEN 1 ELSE 0 END) AS BIGINT) AS ge_6000,
               CAST(sum(CASE WHEN jac_bp >= 8000 THEN 1 ELSE 0 END) AS BIGINT) AS ge_8000
        FROM p GROUP BY 1 ORDER BY lang""")),

    // --------------------------------------------------------------- q233
    QDef("q233_topk_drift",
      (s, dir) => {
        val weekly = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 604800000 AS week",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("week", "l_partkey").agg(sum("cents").cast("bigint").as("rev"))
        val w = Window.partitionBy("week").orderBy(col("rev").desc, col("l_partkey"))
        val top = weekly.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5).select("week", "l_partkey").cache()
        top.count()
        val prev = top.select((col("week") + 1L).as("week"), col("l_partkey"))
        val inter = top.join(prev, Seq("week", "l_partkey"))
          .groupBy("week").agg(count(lit(1)).as("n_common"))
        val weeks = top.select("week").distinct()
        weeks.join(weeks.select((col("week") + 1L).as("week")).distinct(), "week")
          .join(inter, Seq("week"), "left")
          .na.fill(0L, Seq("n_common"))
          .selectExpr("week", "n_common",
            "n_common * 10000 DIV (10 - n_common) AS jaccard_bp")
          .orderBy("week")
      },
      Some("""
        WITH weekly AS (
          SELECT epoch_ms(l_shipdate) // 604800000 AS week, l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM lineitem GROUP BY 1, 2),
        top5 AS (
          SELECT week, l_partkey
          FROM (SELECT week, l_partkey,
                       row_number() OVER (PARTITION BY week
                         ORDER BY rev DESC, l_partkey) AS rk
                FROM weekly)
          WHERE rk <= 5),
        inter AS (
          SELECT a.week, count(*) AS n_common
          FROM top5 a JOIN top5 b
            ON a.l_partkey = b.l_partkey AND a.week = b.week + 1
          GROUP BY 1),
        pairs AS (
          SELECT DISTINCT a.week
          FROM top5 a JOIN top5 b ON a.week = b.week + 1)
        SELECT p.week, COALESCE(i.n_common, 0) AS n_common,
               COALESCE(i.n_common, 0) * 10000
                 // (10 - COALESCE(i.n_common, 0)) AS jaccard_bp
        FROM pairs p LEFT JOIN inter i ON p.week = i.week
        ORDER BY p.week"""))
  )
}
