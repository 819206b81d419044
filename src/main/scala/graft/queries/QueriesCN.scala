package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 85 — rolling quantiles, outer-join
  * reconciliation, CEP patterns, typed cogroup:
  *
  *  - q363: rolling 30-day exact median of daily revenue — banded
  *    self-join (center day × trailing window) then integer rank
  *    selection per center; the rolling-quantile operator beside q13's
  *    rolling mean (sampled every 30th day to bound output).
  *  - q364: FULL OUTER reconciliation — URGENT-vs-LOW daily order
  *    series full-outer-joined on day, match-type accounting per month
  *    (both / left-only / right-only); the two-feed diff shape.
  *  - q365: complex-event pattern — 'error' followed by any same-user
  *    event within 5 minutes (retry) vs abandoned errors, per
  *    day-of-week, with exact mean retry delay; the MATCH_RECOGNIZE
  *    shape via lead().
  *  - q366: typed cogroup — KeyValueGroupedDataset.cogroup of orders
  *    (by custkey) with events (by user_id), per-key presence and
  *    volume folded into key-space buckets; oracle is the equivalent
  *    full-outer grouped join. The Dataset-typed API surface the
  *    DataFrame operators don't reach.
  *
  * Reference analog: smoothed harvest medians, feed-vs-feed listing
  * reconciliation, task failure→retry forensics, per-user activity
  * merge across entity tables.
  */
object QueriesCN extends QueryPack {
  import Q._

  case class KOrders(k: Long, n: Long)
  case class KBoth(bucket: Long, both: Long, ordersOnly: Long,
      eventsOnly: Long, nOrders: Long, nEvents: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q363
    QDef("q363_rolling_median",
      (s, dir) => {
        val daily = t(s, dir, "orders").selectExpr(
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("d").agg(sum("cents").cast("bigint").as("rev")).cache()
        daily.count()
        val centers = daily.where(col("d") % 30 === 0)
          .select(col("d").as("c"))
        val joined = centers.join(daily,
          col("d") >= col("c") - 29 && col("d") <= col("c"))
        val w = Window.partitionBy("c").orderBy("rev", "d")
        joined
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("c")))
          .where(col("rn") === expr("(cnt + 1) DIV 2"))
          .selectExpr("c AS center_day", "cnt AS n_in_window",
            "rev AS med_rev")
          .orderBy("center_day")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        centers AS (SELECT d AS c FROM daily WHERE d % 30 = 0),
        j AS (
          SELECT c, d, rev FROM centers JOIN daily
            ON d >= c - 29 AND d <= c),
        ranked AS (
          SELECT c, rev,
                 CAST(row_number() OVER (PARTITION BY c ORDER BY rev, d)
                   AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY c) AS cnt
          FROM j)
        SELECT c AS center_day, CAST(cnt AS BIGINT) AS n_in_window,
               rev AS med_rev
        FROM ranked WHERE rn = (cnt + 1) // 2
        ORDER BY center_day""")),

    // --------------------------------------------------------------- q364
    QDef("q364_full_outer_reconcile",
      (s, dir) => {
        def series(prio: String, out: String) =
          t(s, dir, "orders")
            .where(col("o_orderpriority") === prio)
            .selectExpr(
              "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d")
            .groupBy("d").agg(count(lit(1)).as(out))
        series("1-URGENT", "n_urgent")
          .join(series("5-LOW", "n_low"), Seq("d"), "full_outer")
          .selectExpr("d DIV 30 AS month30",
            "CASE WHEN n_urgent IS NOT NULL AND n_low IS NOT NULL THEN 1 ELSE 0 END AS both",
            "CASE WHEN n_low IS NULL THEN 1 ELSE 0 END AS urgent_only",
            "CASE WHEN n_urgent IS NULL THEN 1 ELSE 0 END AS low_only")
          .groupBy("month30")
          .agg(count(lit(1)).as("n_days"),
            expr("CAST(sum(both) AS BIGINT)").as("n_both"),
            expr("CAST(sum(urgent_only) AS BIGINT)").as("n_urgent_only"),
            expr("CAST(sum(low_only) AS BIGINT)").as("n_low_only"))
          .orderBy("month30")
      },
      Some("""
        WITH u AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d, count(*) AS n_urgent
          FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        l AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d, count(*) AS n_low
          FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1),
        f AS (
          SELECT coalesce(u.d, l.d) AS d, n_urgent, n_low
          FROM u FULL OUTER JOIN l ON u.d = l.d)
        SELECT d // 30 AS month30, count(*) AS n_days,
               CAST(sum(CASE WHEN n_urgent IS NOT NULL AND n_low IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN n_low IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_urgent_only,
               CAST(sum(CASE WHEN n_urgent IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_low_only
        FROM f GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q365
    QDef("q365_cep_error_retry",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", "event_type", s"($tsMs) AS ms")
          .withColumn("next_ms", lead("ms", 1).over(w))
          .where(col("event_type") === "error")
          .selectExpr("((ms DIV 86400000) + 4) % 7 AS dow",
            """CASE WHEN next_ms IS NOT NULL AND next_ms - ms <= 300000
               THEN 1 ELSE 0 END AS retried""",
            """CASE WHEN next_ms IS NOT NULL AND next_ms - ms <= 300000
               THEN next_ms - ms ELSE 0 END AS delay_ms""")
          .groupBy("dow")
          .agg(count(lit(1)).as("n_errors"),
            expr("CAST(sum(retried) AS BIGINT)").as("n_retried"),
            expr("CAST(sum(delay_ms) AS BIGINT)").as("sum_delay_ms"))
          .selectExpr("dow", "n_errors", "n_retried",
            "n_retried * 10000 DIV n_errors AS retry_bp",
            """CASE WHEN n_retried > 0
               THEN sum_delay_ms DIV n_retried ELSE 0 END AS mean_delay_ms""")
          .orderBy("dow")
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                 lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS next_ms
          FROM events),
        err AS (
          SELECT ((ms // 86400000) + 4) % 7 AS dow,
                 CASE WHEN next_ms IS NOT NULL AND next_ms - ms <= 300000
                      THEN 1 ELSE 0 END AS retried,
                 CASE WHEN next_ms IS NOT NULL AND next_ms - ms <= 300000
                      THEN next_ms - ms ELSE 0 END AS delay_ms
          FROM seq WHERE event_type = 'error')
        SELECT dow, count(*) AS n_errors,
               CAST(sum(retried) AS BIGINT) AS n_retried,
               CAST(sum(retried) AS BIGINT) * 10000 // count(*) AS retry_bp,
               CASE WHEN sum(retried) > 0
                    THEN CAST(sum(delay_ms) AS BIGINT)
                         // CAST(sum(retried) AS BIGINT)
                    ELSE 0 END AS mean_delay_ms
        FROM err GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q366
    QDef("q366_cogroup_reconcile",
      (s, dir) => {
        import s.implicits._
        val ordersByKey = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n"))
          .as[KOrders].groupByKey(_.k)
        val eventsByKey = t(s, dir, "events")
          .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("n"))
          .as[KOrders].groupByKey(_.k)
        ordersByKey.cogroup(eventsByKey) { (k, os, es) =>
          val no = os.map(_.n).sum
          val ne = es.map(_.n).sum
          Iterator(KBoth(k % 10,
            both = if (no > 0 && ne > 0) 1L else 0L,
            ordersOnly = if (no > 0 && ne == 0) 1L else 0L,
            eventsOnly = if (no == 0 && ne > 0) 1L else 0L,
            nOrders = no, nEvents = ne))
        }
          .groupByKey(_.bucket)
          .mapGroups { (b, it) =>
            val l = it.toSeq
            (b, l.map(_.both).sum, l.map(_.ordersOnly).sum,
              l.map(_.eventsOnly).sum, l.map(_.nOrders).sum,
              l.map(_.nEvents).sum)
          }
          .toDF("bucket", "keys_both", "keys_orders_only",
            "keys_events_only", "n_orders", "n_events")
          .orderBy("bucket")
      },
      Some("""
        WITH o AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
        e AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
        f AS (
          SELECT coalesce(o.k, e.k) AS k,
                 coalesce(o.n, 0) AS no, coalesce(e.n, 0) AS ne
          FROM o FULL OUTER JOIN e ON o.k = e.k)
        SELECT k % 10 AS bucket,
               CAST(sum(CASE WHEN no > 0 AND ne > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS keys_both,
               CAST(sum(CASE WHEN no > 0 AND ne = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS keys_orders_only,
               CAST(sum(CASE WHEN no = 0 AND ne > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS keys_events_only,
               CAST(sum(no) AS BIGINT) AS n_orders,
               CAST(sum(ne) AS BIGINT) AS n_events
        FROM f GROUP BY 1 ORDER BY 1"""))
  )
}
