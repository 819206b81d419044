package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 36:
  *
  *  - q174: trend forecast — per event_type, fit daily counts with OLS
  *    (closed form from exact BIGINT component sums Sx/Sy/Sxx/Sxy, the
  *    q84 machinery) and forecast the NEXT day entirely in integer
  *    arithmetic: forecast = ((Sy·Sxx − Sx·Sxy) + (n·Sxy − Sx·Sy)·d) /
  *    (n·Sxx − Sx²), emitted in sign-normalized micro units (trunc
  *    division on |num|/|den| so both engines agree on negatives).
  *    The capacity-planning forecast op — the one family (prediction)
  *    the inventory didn't yet cover.
  */
object QueriesAQ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q174_trend_forecast",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val d0 = ev.agg(min(expr(s"($tsMs) DIV 86400000")).as("d0"))
        val daily = ev.selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .crossJoin(broadcast(d0))
          .selectExpr("event_type", "day - d0 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("d").cast("bigint").as("sx"),
            sum("y").cast("bigint").as("sy"),
            sum(expr("d * d")).cast("bigint").as("sxx"),
            sum(expr("d * y")).cast("bigint").as("sxy"),
            (max("d") + 1).as("dnext"))
          .selectExpr("event_type", "n", "sy",
            "(sy * sxx - sx * sxy) + (n * sxy - sx * sy) * dnext AS num",
            "n * sxx - sx * sx AS den")
          .selectExpr("event_type", "n", "sy AS total_events",
            """CASE WHEN den = 0 THEN NULL
               ELSE (CASE WHEN num * den >= 0 THEN 1 ELSE -1 END)
                 * (abs(num) * 1000000 DIV abs(den)) END AS forecast_micro""")
          .orderBy("event_type")
      },
      Some("""
        WITH d0 AS (SELECT min(epoch_ms(ts) // 86400000) AS d0 FROM events),
        daily AS (
          SELECT event_type, (epoch_ms(ts) // 86400000) - d0.d0 AS d,
                 count(*) AS y
          FROM events, d0 GROUP BY 1, 2),
        comp AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(d) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(d * d) AS BIGINT) AS sxx,
                 CAST(sum(d * y) AS BIGINT) AS sxy,
                 max(d) + 1 AS dnext
          FROM daily GROUP BY 1),
        nd AS (
          SELECT event_type, n, sy,
                 (sy * sxx - sx * sxy) + (n * sxy - sx * sy) * dnext AS num,
                 n * sxx - sx * sx AS den
          FROM comp)
        SELECT event_type, n, sy AS total_events,
               CASE WHEN den = 0 THEN NULL
                 ELSE (CASE WHEN num * den >= 0 THEN 1 ELSE -1 END)
                   * (abs(num) * 1000000 // abs(den)) END AS forecast_micro
        FROM nd ORDER BY event_type"""))
  )
}
