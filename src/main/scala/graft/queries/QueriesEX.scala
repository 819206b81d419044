package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 147 — the bookings harvest chain.
  *
  *  - q603: bookings-chain cost planner, the reference's
  *    `op_get_booking_detail_periodical` (operations/bookings.py:40-94)
  *    composed with the per-listing chain cost of
  *    `op_get_booking_detail_for_listing_id` (bookings.py:17-37, "Costs
  *    is 2 API calls per action": calendar refresh then booking detail).
  *    Eligible listings are AOI-gated (AOIShape.collect_bookings=True →
  *    nation flag here), stale when the last calendar harvest predates
  *    start-of-today − age_hours or never happened
  *    (calendar_updated_at IS NULL), ordered ASC NULLS FIRST on the
  *    last-harvest time (bookings.py:68) and capped at how_many=500.
  *    Output is the per-AOI API-call budget the batch will spend.
  *
  * Scale shape: one events scan → hash-agg per user (map-side partial);
  * nation is a broadcast dim; the how_many cap is a global top-K
  * (TakeOrderedAndProject — no global window, no single-task sort); the
  * final rollup runs on ≤500 rows. At 100 TB the only shuffles are the
  * per-user aggregate and the ≤500-row top-K merge.
  */
object QueriesEX extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q603
    QDef("q603_bookings_chain",
      (s, dir) => {
        val cutoffMs = millisOf("2024-01-31 01:00:00") // start-of-day − 23h
        // last calendar harvest per listing: purchase events are the
        // completed calendar refreshes (q12's universe convention)
        val lastCal = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("c_custkey"))
          .agg(max(expr(tsMs)).as("last_cal_ms"))
        // AOI gate: nations flagged for booking collection
        val aoi = t(s, dir, "nation")
          .filter(col("n_nationkey") % 3 === 0)
          .select(col("n_nationkey"), col("n_name"))
        val selected = t(s, dir, "customer")
          .join(broadcast(aoi), expr("c_nationkey = n_nationkey"))
          .join(lastCal, Seq("c_custkey"), "left")
          .filter(col("last_cal_ms").isNull || col("last_cal_ms") < cutoffMs)
          .orderBy(col("last_cal_ms").asc_nulls_first, col("c_custkey"))
          .limit(500)
        selected.groupBy("n_name")
          .agg(count(lit(1)).as("n_selected"),
            count(when(col("last_cal_ms").isNull, 1)).as("n_never"),
            (count(lit(1)) * 2).cast("bigint").as("api_calls"),
            min("last_cal_ms").cast("bigint").as("oldest_ms"))
          .orderBy("n_name")
      },
      Some(s"""
        WITH last_cal AS (
          SELECT user_id AS c_custkey, max(epoch_ms(ts)) AS last_cal_ms
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        aoi AS (
          SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 = 0),
        selected AS (
          SELECT a.n_name, l.last_cal_ms, c.c_custkey
          FROM customer c
          JOIN aoi a ON c.c_nationkey = a.n_nationkey
          LEFT JOIN last_cal l ON c.c_custkey = l.c_custkey
          WHERE l.last_cal_ms IS NULL
             OR l.last_cal_ms < epoch_ms(TIMESTAMP '2024-01-31 01:00:00')
          ORDER BY l.last_cal_ms ASC NULLS FIRST, c.c_custkey
          LIMIT 500)
        SELECT n_name, count(*) AS n_selected,
               count(CASE WHEN last_cal_ms IS NULL THEN 1 END) AS n_never,
               CAST(count(*) * 2 AS BIGINT) AS api_calls,
               CAST(min(last_cal_ms) AS BIGINT) AS oldest_ms
        FROM selected GROUP BY 1 ORDER BY 1"""))
  )
}
