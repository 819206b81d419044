package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 68 — seasonal forecasting and curve
  * geometry:
  *
  *  - q297: Holt–Winters additive triple smoothing (level + trend +
  *    7-slot seasonal) over per-type daily counts — a NINE-state coupled
  *    recurrence on the secondary-sort mapPartitions scale path, exact
  *    integer milli with truncating division; the recursive-CTE oracle
  *    carries the seasonal ring as seven explicit columns. Init: level =
  *    mean of the first 7 days, seasonals = deviations from it;
  *    recurrence (alpha=.3, beta=.2, gamma=.3) from day 8; one-step
  *    backtest SAE over the evaluated days. Completes the forecasting
  *    ladder q179 (1 state) → q210 (2) → here (9).
  *  - q298: seasonal strength (STL-style): per type, 1 − SS(resid)/
  *    SS(detrended) in bp decided by exact cross-multiplied BIGINTs over
  *    q199's centered-MA decomposition — the "is there a weekly pattern
  *    worth modeling" gate in front of q297/q218.
  *  - q299: knee/elbow detection (Kneedle-lite): the part-count k where
  *    the cumulative revenue-share curve is farthest above the straight
  *    chord — argmax of the exact cross-multiplied chord gap, the
  *    standard "how many top parts are enough" cutoff pick.
  *
  * Reference analog: harvest-volume forecasting with weekly shape;
  * scheduling model-selection; "how many hot grids cover most listings".
  */
object QueriesBW extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class HwIn(event_type: String, day: Long, y: Long)
  case class HwOut(event_type: String, n_days: Long, level_milli: Long,
      trend_milli: Long, forecast_milli: Long, sae_milli: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q297
    QDef("q297_holt_winters",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
          .as[HwIn]
        daily.repartition(col("event_type"))
          .sortWithinPartitions("event_type", "day")
          .mapPartitions { it =>
            new Iterator[HwOut] {
              private var pending: Option[HwOut] = None
              private var cur: String = null
              private val buf = new scala.collection.mutable.ArrayBuffer[Long](7)
              private val sea = new Array[Long](7)
              private var lv = 0L; private var tr = 0L
              private var sae = 0L; private var n = 0L
              private def flush(): Option[HwOut] = {
                val r = if (n >= 8) Some(HwOut(cur, n, lv, tr,
                  lv + tr + sea((n % 7).toInt), sae)) else None
                cur = null; r
              }
              private def init(): Unit = {
                lv = buf.map(_ * 1000L).sum / 7L
                var j = 0
                while (j < 7) { sea(j) = buf(j) * 1000L - lv; j += 1 }
                tr = 0L
              }
              private def step(y: Long): Unit = {
                val idx = ((n - 1) % 7).toInt // this obs's seasonal slot
                val f = lv + tr + sea(idx)
                sae += math.abs(y * 1000L - f)
                // Long `/` truncates toward zero == DuckDB `//`
                val nl = (300L * (y * 1000L - sea(idx)) + 700L * (lv + tr)) / 1000L
                val nb = (200L * (nl - lv) + 800L * tr) / 1000L
                sea(idx) = (300L * (y * 1000L - nl) + 700L * sea(idx)) / 1000L
                lv = nl; tr = nb
              }
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.event_type != cur) {
                    if (cur != null) pending = flush()
                    cur = e.event_type
                    buf.clear(); buf += e.y; n = 1L
                    lv = 0L; tr = 0L; sae = 0L
                  } else {
                    n += 1L
                    if (n <= 7) { buf += e.y; if (n == 7) init() }
                    else step(e.y)
                  }
                }
                if (pending.isEmpty && cur != null) pending = flush()
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): HwOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("event_type")
      },
      Some {
        val sIdx = "CASE (r.rn - 1) % 7 " +
          (0 until 7).map(j => s"WHEN $j THEN h.s$j").mkString(" ") + " END"
        val nl = s"((300 * (r.y * 1000 - ($sIdx)) + 700 * (h.lv + h.tr)) // 1000)"
        val sCols = (0 until 7).map { j =>
          s"CASE WHEN (r.rn - 1) % 7 = $j THEN ((300 * (r.y * 1000 - $nl) + 700 * (h.s$j)) // 1000) ELSE h.s$j END"
        }.mkString(",\n                 ")
        val sInit = (0 until 7).map(j => s"y$j * 1000 - l0 AS s$j").mkString(", ")
        val yInit = (0 until 7)
          .map(j => s"min(CASE WHEN rn = ${j + 1} THEN y END) AS y$j").mkString(", ")
        val fNext = "CASE cnt % 7 " +
          (0 until 7).map(j => s"WHEN $j THEN s$j").mkString(" ") + " END"
        s"""
        WITH RECURSIVE d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, y,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM d),
        init0 AS (
          SELECT event_type, max(cnt) AS cnt, $yInit
          FROM r WHERE rn <= 7 GROUP BY 1),
        init1 AS (
          SELECT event_type, cnt,
                 (y0+y1+y2+y3+y4+y5+y6) * 1000 // 7 AS l0
          FROM init0),
        h AS (
          SELECT i1.event_type, CAST(7 AS BIGINT) AS rn, i1.cnt,
                 l0 AS lv, CAST(0 AS BIGINT) AS tr, CAST(0 AS BIGINT) AS sae,
                 $sInit
          FROM init1 i1 JOIN init0 i0 ON i1.event_type = i0.event_type
          WHERE i1.cnt >= 8
          UNION ALL
          SELECT r.event_type, r.rn, h.cnt,
                 $nl,
                 (200 * ($nl - h.lv) + 800 * h.tr) // 1000,
                 h.sae + abs(r.y * 1000 - (h.lv + h.tr + ($sIdx))),
                 $sCols
          FROM h JOIN r ON r.event_type = h.event_type AND r.rn = h.rn + 1)
        SELECT event_type, CAST(cnt AS BIGINT) AS n_days, lv AS level_milli,
               tr AS trend_milli,
               lv + tr + ($fNext) AS forecast_milli, sae AS sae_milli
        FROM h WHERE rn = cnt ORDER BY event_type"""
      }),

    // --------------------------------------------------------------- q298
    QDef("q298_seasonal_strength",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val wd = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-3, 3)
        val wt = Window.partitionBy("event_type")
        // centered 7-day MA trend (full windows only), q199's decomposition
        val det = daily
          .withColumn("nw", count(lit(1)).over(wd))
          .withColumn("tsum", sum("y").over(wd))
          .where(col("nw") === 7)
          .selectExpr("event_type", "d", "7 * y - tsum AS det7") // 7x-scaled detrended
        val seas = det
          .withColumn("dow", expr("d % 7"))
          .withColumn("ns", count(lit(1)).over(Window.partitionBy("event_type", "dow")))
          .withColumn("ssum", sum("det7").over(Window.partitionBy("event_type", "dow")))
          // residual, scaled by 7·ns: r = ns·det7 − ssum
          .selectExpr("event_type", "ns * det7 - ssum AS res", "ns * det7 AS dets",
            "ns")
        seas.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(expr("res * res")).cast("bigint").as("ss_res"),
            sum(expr("dets * dets")).cast("bigint").as("ss_det"))
          .selectExpr("event_type", "n_days",
            """CASE WHEN ss_det = 0 THEN NULL
               ELSE 10000 - (ss_res * 10000 DIV ss_det) END AS strength_bp""")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        ma AS (
          SELECT event_type, d, y,
                 count(*) OVER w AS nw, sum(y) OVER w AS tsum
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        det AS (
          SELECT event_type, d, 7 * y - tsum AS det7
          FROM ma WHERE nw = 7),
        seas AS (
          SELECT event_type,
                 count(*) OVER (PARTITION BY event_type, d % 7) * det7
                   - sum(det7) OVER (PARTITION BY event_type, d % 7) AS res,
                 count(*) OVER (PARTITION BY event_type, d % 7) * det7 AS dets
          FROM det)
        SELECT event_type, count(*) AS n_days,
               CASE WHEN CAST(sum(dets * dets) AS BIGINT) = 0 THEN NULL
                 ELSE 10000 - (CAST(sum(res * res) AS BIGINT) * 10000
                   // CAST(sum(dets * dets) AS BIGINT)) END AS strength_bp
        FROM seas GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q299
    QDef("q299_knee_detection",
      (s, dir) => {
        val revExpr =
          "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
        val perPart = t(s, dir, "lineitem")
          .selectExpr("l_partkey", s"$revExpr AS rev")
          .groupBy("l_partkey").agg(sum("rev").cast("bigint").as("v"))
        val SR = graft.operators.ScaleRank
        val curve = SR.withTotals(
            SR.withGlobalRankAndSum(perPart,
              Seq(col("v").desc, col("l_partkey")), col("v"), "k", "cum"),
            Seq(count(lit(1)).as("n"), sum("v").cast("bigint").as("tot")))
          // chord from (0,0) to (n, tot): gap(k) ∝ n·cum − k·tot, exact
          // in DECIMAL(38,0) — n·cum crossed int64 at 10x sf0.1
          // (ProbeScaleAll); reported in rank units (gap/tot ≤ n),
          // which stays int64-safe at any SF
          .selectExpr("k", "cum", "n", "tot",
            """CAST(n AS DECIMAL(38,0)) * cum
               - CAST(k AS DECIMAL(38,0)) * tot AS gap""")
        curve
          .crossJoin(broadcast(curve.agg(max("gap").as("mx"))))
          .where(col("gap") === col("mx"))
          .orderBy("k").limit(1)
          .selectExpr("CAST(k AS BIGINT) AS knee_k", "CAST(n AS BIGINT) AS n_parts",
            // cum*10000 crosses int64 once tot > ~9.2e14 (hit at the sf1
            // replica mirror's knee); DECIMAL(38,0) DIV truncates like
            // DuckDB's HUGEINT // — the q625 common-denominator pattern
            "CAST(CAST(cum AS DECIMAL(38,0)) * 10000 DIV tot AS BIGINT) AS share_at_knee_bp",
            """CAST(floor(CAST(gap AS DOUBLE) / CAST(tot AS DOUBLE) * 1000)
               AS BIGINT) AS gap_rank_milli""")
      },
      Some(s"""
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                   AS BIGINT) AS v
          FROM lineitem GROUP BY 1),
        curve AS (
          SELECT row_number() OVER (ORDER BY v DESC, l_partkey) AS k,
                 sum(v) OVER (ORDER BY v DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 count(*) OVER () AS n, sum(v) OVER () AS tot
          FROM per_part),
        g AS (
          SELECT k, cum, n, tot,
                 CAST(n AS HUGEINT) * cum - CAST(k AS HUGEINT) * tot AS gap,
                 max(CAST(n AS HUGEINT) * cum - CAST(k AS HUGEINT) * tot)
                   OVER () AS mx
          FROM curve),
        best AS (
          SELECT *, row_number() OVER (ORDER BY k) AS rk
          FROM g WHERE gap = mx)
        SELECT CAST(k AS BIGINT) AS knee_k, CAST(n AS BIGINT) AS n_parts,
               CAST(cum * 10000 // tot AS BIGINT) AS share_at_knee_bp,
               CAST(floor(CAST(gap AS DOUBLE) / CAST(tot AS DOUBLE) * 1000)
                 AS BIGINT) AS gap_rank_milli
        FROM best WHERE rk = 1"""))
  )
}
