package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 110 — change detection sketches,
  * optimal histograms, temporal self-excitation, privacy audits:
  *
  *  - q459: heavy-CHANGE detection — per-user activity counts in the
  *    first-15-days vs remaining half, true top-10 |Δ| alongside
  *    per-half Count-Min estimates (3×64 portable-hash cells, q96's
  *    sketch): per-half one-sidedness (est ≥ true) visible per row.
  *    The deltoid/change-hitter shape: at 100 TB the two sketches
  *    merge map-side; only candidate keys are ever exact-counted.
  *  - q460: V-optimal histogram by bounded enumeration — the 4-bucket
  *    partition of each type's 24-hour load profile minimizing total
  *    within-bucket SSE: all C(23,3) = 1771 cut triples enumerated
  *    declaratively (generated cut domain × conditional aggregation),
  *    SSE in fixed-order DOUBLE floor-micro, deterministic argmin;
  *    improvement over the equi-width 6/12/18 baseline in bp. The
  *    DB-internals histogram builder beside q141/q202's equi-grids.
  *  - q461: temporal self-excitation — per type, share of inter-event
  *    gaps under 5 min vs the Poisson expectation 1 − e^(−λ·300s) at
  *    the type's observed rate; ratio > 1 ⇒ bursty arrival clustering
  *    (q248's Fano factor at the gap grain).
  *  - q462: k-anonymity audit — quasi-identifier equivalence classes on
  *    customers at three generalization levels (segment+nation+balance
  *    band → drop band → drop nation): class count, minimum k, share of
  *    rows in classes below k=5. The re-identification risk gate beside
  *    q442 (DP) and q382 (pseudonymization).
  *
  * Reference analog: which listings' activity jumped between survey
  * waves, hourly-load histogram compression for dashboards, scrape-burst
  * clustering, published-profile re-identification risk.
  */
object QueriesDM extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q459
    QDef("q459_cms_change",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS d")
        val minD = ev.agg(min("d").as("d0"))
        val tagged = ev.crossJoin(broadcast(minD))
          .selectExpr("user_id", "CASE WHEN d - d0 < 15 THEN 0 ELSE 1 END AS half")
        val exact = tagged.groupBy("user_id").agg(
          sum(when(col("half") === 0, 1L).otherwise(0L))
            .cast("bigint").as("c1"),
          sum(when(col("half") === 1, 1L).otherwise(0L))
            .cast("bigint").as("c2"))
        def cms(half: Int) = {
          val rows = (0 until 3).map { r =>
            tagged.where(col("half") === half)
              .withColumn("cell",
                pmod(PortableHash.md5Long(col("user_id"), salt = s"cms$r~"),
                  lit(64L)))
              .groupBy("cell").agg(count(lit(1)).cast("bigint").as("cnt"))
              .selectExpr(s"CAST($r AS BIGINT) AS r", "cell", "cnt")
          }
          rows.reduce(_ union _)
        }
        val sk1 = cms(0); val sk2 = cms(1)
        def estimate(keyed: org.apache.spark.sql.DataFrame, sk: org.apache.spark.sql.DataFrame,
                     out: String) = {
          val probes = (0 until 3).map { r =>
            keyed.withColumn("r", lit(r.toLong))
              .withColumn("cell",
                pmod(PortableHash.md5Long(col("user_id"), salt = s"cms$r~"),
                  lit(64L)))
          }.reduce(_ union _)
          probes.join(sk, Seq("r", "cell"), "left")
            .groupBy("user_id")
            .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as(out))
        }
        val top = exact
          .withColumn("delta", abs(col("c1") - col("c2")))
          .orderBy(col("delta").desc, col("user_id")).limit(10)
        val keys = top.select("user_id")
        val est = estimate(keys, sk1, "est1")
          .join(estimate(keys, sk2, "est2"), "user_id")
        top.join(est, "user_id")
          .selectExpr("user_id", "c1", "c2", "delta", "est1", "est2",
            "est1 - c1 AS over1", "est2 - c2 AS over2")
          .orderBy(col("delta").desc, col("user_id"))
      },
      Some {
        def cellSql(r: Int) =
          s"${PortableHash.md5LongSql("user_id", s"cms$r~")} % 64"
        s"""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events),
        tagged AS (
          SELECT user_id,
                 CASE WHEN d - (SELECT min(d) FROM ev) < 15 THEN 0 ELSE 1 END
                   AS half
          FROM ev),
        exact AS (
          SELECT user_id,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
          FROM tagged GROUP BY 1),
        sk AS (
          SELECT half, r, cell, count(*) AS cnt FROM (
            SELECT half, 0 AS r, ${cellSql(0)} AS cell, user_id FROM tagged
            UNION ALL
            SELECT half, 1, ${cellSql(1)}, user_id FROM tagged
            UNION ALL
            SELECT half, 2, ${cellSql(2)}, user_id FROM tagged)
          GROUP BY 1, 2, 3),
        top AS (
          SELECT user_id, c1, c2, abs(c1 - c2) AS delta
          FROM exact ORDER BY delta DESC, user_id LIMIT 10),
        probes AS (
          SELECT user_id, 0 AS r, ${cellSql(0)} AS cell FROM top
          UNION ALL SELECT user_id, 1, ${cellSql(1)} FROM top
          UNION ALL SELECT user_id, 2, ${cellSql(2)} FROM top),
        est AS (
          SELECT p.user_id,
                 min(coalesce(s1.cnt, 0)) AS est1,
                 min(coalesce(s2.cnt, 0)) AS est2
          FROM probes p
          LEFT JOIN sk s1 ON s1.half = 0 AND s1.r = p.r AND s1.cell = p.cell
          LEFT JOIN sk s2 ON s2.half = 1 AND s2.r = p.r AND s2.cell = p.cell
          GROUP BY 1)
        SELECT top.user_id, CAST(c1 AS BIGINT) AS c1,
               CAST(c2 AS BIGINT) AS c2, CAST(delta AS BIGINT) AS delta,
               CAST(est1 AS BIGINT) AS est1, CAST(est2 AS BIGINT) AS est2,
               CAST(est1 - c1 AS BIGINT) AS over1,
               CAST(est2 - c2 AS BIGINT) AS over2
        FROM top JOIN est ON top.user_id = est.user_id
        ORDER BY delta DESC, top.user_id"""
      }),

    // --------------------------------------------------------------- q460
    QDef("q460_vopt_histogram",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .selectExpr("event_type", s"(($tsMs) DIV 3600000) % 24 AS h")
          .groupBy("event_type", "h").agg(count(lit(1)).cast("long").as("y"))
        val hours = t(s, dir, "events").select("event_type").distinct()
          .select(col("event_type"), explode(sequence(lit(0L), lit(23L))).as("h"))
          .join(hourly, Seq("event_type", "h"), "left")
          .selectExpr("event_type", "h", "coalesce(y, 0) AS y")
        val cuts = hours.select("event_type").distinct()
          .select(col("event_type"), explode(sequence(lit(1L), lit(23L))).as("c1"))
          .select(col("event_type"), col("c1"),
            explode(sequence(lit(2L), lit(23L))).as("c2"))
          .where(col("c2") > col("c1"))
          .select(col("event_type"), col("c1"), col("c2"),
            explode(sequence(lit(3L), lit(23L))).as("c3"))
          .where(col("c3") > col("c2"))
        def sseExpr(seg: Int): String = {
          val cond = seg match {
            case 0 => "h < c1"; case 1 => "h >= c1 AND h < c2"
            case 2 => "h >= c2 AND h < c3"; case _ => "h >= c3"
          }
          s"""(CAST(sum(CASE WHEN $cond THEN y * y ELSE 0 END) AS DOUBLE)
             - CAST(sum(CASE WHEN $cond THEN y ELSE 0 END) AS DOUBLE)
               * CAST(sum(CASE WHEN $cond THEN y ELSE 0 END) AS DOUBLE)
               / CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS DOUBLE))"""
        }
        val scored = cuts.join(hours, "event_type")
          .groupBy("event_type", "c1", "c2", "c3")
          .agg(expr(s"CAST(floor((${sseExpr(0)} + ${sseExpr(1)} + ${sseExpr(2)} + ${sseExpr(3)}) * 1e6) AS BIGINT)").as("sse_micro"))
        val best = scored
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(col("sse_micro"), col("c1"), col("c2"), col("c3"))))
          .where(col("rk") === 1)
        val equi = scored
          .where(col("c1") === 6 && col("c2") === 12 && col("c3") === 18)
          .select(col("event_type"), col("sse_micro").as("equi_sse_micro"))
        best.join(equi, "event_type")
          .selectExpr("event_type", "c1", "c2", "c3", "sse_micro",
            "equi_sse_micro",
            "CASE WHEN equi_sse_micro > 0 THEN (equi_sse_micro - sse_micro) * 10000 DIV equi_sse_micro ELSE 0 END AS improvement_bp")
          .orderBy("event_type")
      },
      Some {
        def sseSql(seg: Int): String = {
          val cond = seg match {
            case 0 => "h < c1"; case 1 => "h >= c1 AND h < c2"
            case 2 => "h >= c2 AND h < c3"; case _ => "h >= c3"
          }
          s"""(CAST(sum(CASE WHEN $cond THEN y * y ELSE 0 END) AS DOUBLE)
             - CAST(sum(CASE WHEN $cond THEN y ELSE 0 END) AS DOUBLE)
               * CAST(sum(CASE WHEN $cond THEN y ELSE 0 END) AS DOUBLE)
               / CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS DOUBLE))"""
        }
        s"""
        WITH hourly AS (
          SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS h,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        hours AS (
          SELECT t.event_type, g.h, coalesce(hourly.y, 0) AS y
          FROM (SELECT DISTINCT event_type FROM hourly) t
          CROSS JOIN (SELECT unnest(range(0, 24)) AS h) g
          LEFT JOIN hourly ON hourly.event_type = t.event_type
                          AND hourly.h = g.h),
        cuts AS (
          SELECT t.event_type, a.c1, b.c2, c.c3
          FROM (SELECT DISTINCT event_type FROM hourly) t
          CROSS JOIN (SELECT unnest(range(1, 24)) AS c1) a
          CROSS JOIN (SELECT unnest(range(2, 24)) AS c2) b
          CROSS JOIN (SELECT unnest(range(3, 24)) AS c3) c
          WHERE b.c2 > a.c1 AND c.c3 > b.c2),
        scored AS (
          SELECT cuts.event_type, c1, c2, c3,
                 CAST(floor((${sseSql(0)} + ${sseSql(1)} + ${sseSql(2)}
                   + ${sseSql(3)}) * 1e6) AS BIGINT) AS sse_micro
          FROM cuts JOIN hours ON cuts.event_type = hours.event_type
          GROUP BY 1, 2, 3, 4),
        best AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY sse_micro, c1, c2, c3) AS rk FROM scored)
          WHERE rk = 1),
        equi AS (
          SELECT event_type, sse_micro AS equi_sse_micro FROM scored
          WHERE c1 = 6 AND c2 = 12 AND c3 = 18)
        SELECT best.event_type, CAST(c1 AS BIGINT) AS c1,
               CAST(c2 AS BIGINT) AS c2, CAST(c3 AS BIGINT) AS c3,
               CAST(sse_micro AS BIGINT) AS sse_micro,
               CAST(equi_sse_micro AS BIGINT) AS equi_sse_micro,
               CAST(CASE WHEN equi_sse_micro > 0
                 THEN (equi_sse_micro - sse_micro) * 10000 // equi_sse_micro
                 ELSE 0 END AS BIGINT) AS improvement_bp
        FROM best JOIN equi ON best.event_type = equi.event_type
        ORDER BY best.event_type"""
      }),

    // --------------------------------------------------------------- q461
    QDef("q461_self_excitation",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type", s"$tsMs AS ms", "event_id")
        val w = Window.partitionBy("event_type").orderBy("ms", "event_id")
        val gaps = ev.withColumn("nxt", lead("ms", 1).over(w))
          .where(col("nxt").isNotNull)
          .selectExpr("event_type", "nxt - ms AS g")
        val span = ev.groupBy("event_type").agg(
          (max("ms") - min("ms")).as("span_ms"),
          count(lit(1)).cast("bigint").as("n"))
        gaps.groupBy("event_type").agg(
          count(lit(1)).cast("bigint").as("n_gaps"),
          sum(when(col("g") < 300000L, 1L).otherwise(0L))
            .cast("bigint").as("short_gaps"))
          .join(span, "event_type")
          .selectExpr("event_type", "n", "n_gaps", "short_gaps",
            "short_gaps * 10000 DIV n_gaps AS p_obs_bp",
            "CAST(floor((1.0 - exp(-(CAST(n AS DOUBLE) / CAST(span_ms AS DOUBLE)) * 300000.0)) * 10000) AS BIGINT) AS p_exp_bp")
          .selectExpr("event_type", "n", "n_gaps", "short_gaps", "p_obs_bp",
            "p_exp_bp",
            "CASE WHEN p_exp_bp > 0 THEN p_obs_bp * 1000 DIV p_exp_bp ELSE -1 END AS ratio_milli")
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) AS ms, event_id FROM events),
        gaps AS (
          SELECT event_type,
                 lead(ms) OVER (PARTITION BY event_type
                                ORDER BY ms, event_id) - ms AS g
          FROM ev),
        gg AS (SELECT event_type, g FROM gaps WHERE g IS NOT NULL),
        span AS (
          SELECT event_type, max(ms) - min(ms) AS span_ms, count(*) AS n
          FROM ev GROUP BY 1),
        agg AS (
          SELECT event_type, count(*) AS n_gaps,
                 sum(CASE WHEN g < 300000 THEN 1 ELSE 0 END) AS short_gaps
          FROM gg GROUP BY 1)
        SELECT agg.event_type, CAST(n AS BIGINT) AS n,
               CAST(n_gaps AS BIGINT) AS n_gaps,
               CAST(short_gaps AS BIGINT) AS short_gaps,
               CAST(short_gaps * 10000 // n_gaps AS BIGINT) AS p_obs_bp,
               CAST(floor((1.0 - exp(-(CAST(n AS DOUBLE)
                 / CAST(span_ms AS DOUBLE)) * 300000.0)) * 10000) AS BIGINT)
                 AS p_exp_bp,
               CAST(CASE WHEN floor((1.0 - exp(-(CAST(n AS DOUBLE)
                 / CAST(span_ms AS DOUBLE)) * 300000.0)) * 10000) > 0
                 THEN (short_gaps * 10000 // n_gaps) * 1000
                      // CAST(floor((1.0 - exp(-(CAST(n AS DOUBLE)
                        / CAST(span_ms AS DOUBLE)) * 300000.0)) * 10000)
                        AS BIGINT)
                 ELSE -1 END AS BIGINT) AS ratio_milli
        FROM agg JOIN span ON agg.event_type = span.event_type
        ORDER BY agg.event_type""")),

    // --------------------------------------------------------------- q462
    QDef("q462_kanonymity",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .selectExpr("c_mktsegment AS seg",
            "CAST(c_nationkey AS BIGINT) AS nat",
            "CAST(floor(c_acctbal + 0.5) AS BIGINT) DIV 2000 AS band")
        def audit(level: Int, cols: Seq[String], desc: String) = {
          val classes = c.groupBy(cols.map(col): _*)
            .agg(count(lit(1)).cast("long").as("k"))
          classes.agg(
            count(lit(1)).cast("long").as("classes"),
            min("k").cast("long").as("k_min"),
            sum(when(col("k") < 5, col("k")).otherwise(0L))
              .cast("bigint").as("rows_lt5"),
            sum("k").cast("bigint").as("n"))
            .selectExpr(s"CAST($level AS BIGINT) AS level", s"'$desc' AS qi",
              "classes", "k_min", "rows_lt5",
              "rows_lt5 * 10000 DIV n AS risk_bp")
        }
        audit(0, Seq("seg", "nat", "band"), "seg+nation+band")
          .union(audit(1, Seq("seg", "nat"), "seg+nation"))
          .union(audit(2, Seq("seg"), "seg"))
          .orderBy("level")
      },
      Some("""
        WITH c AS (
          SELECT c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat,
                 CAST(floor(c_acctbal + 0.5) AS BIGINT) // 2000 AS band
          FROM customer),
        l0 AS (SELECT seg, nat, band, count(*) AS k FROM c GROUP BY 1, 2, 3),
        l1 AS (SELECT seg, nat, count(*) AS k FROM c GROUP BY 1, 2),
        l2 AS (SELECT seg, count(*) AS k FROM c GROUP BY 1)
        SELECT CAST(0 AS BIGINT) AS level, 'seg+nation+band' AS qi,
               CAST(count(*) AS BIGINT) AS classes,
               CAST(min(k) AS BIGINT) AS k_min,
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
                 AS rows_lt5,
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000 // sum(k)
                 AS BIGINT) AS risk_bp
        FROM l0
        UNION ALL
        SELECT 1, 'seg+nation', CAST(count(*) AS BIGINT),
               CAST(min(k) AS BIGINT),
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000 // sum(k)
                 AS BIGINT)
        FROM l1
        UNION ALL
        SELECT 2, 'seg', CAST(count(*) AS BIGINT), CAST(min(k) AS BIGINT),
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000 // sum(k)
                 AS BIGINT)
        FROM l2
        ORDER BY level"""))
  )
}
