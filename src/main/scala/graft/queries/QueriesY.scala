package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 18 — the remaining standard reporting
  * shapes:
  *
  *  - q106: temporal activity matrix — day-of-week × hour-of-day event
  *    counts from pure epoch integer arithmetic (no calendar functions,
  *    whose week/locale rules differ between engines).
  *  - q107: growth accounting — per-day new vs returning actives and the
  *    cumulative-distinct-users curve, via first-seen-day + running sum
  *    (the one-pass form of a windowed COUNT DISTINCT, which neither
  *    engine supports directly).
  *  - q108: cross-table referential audit — orphaned children and
  *    childless parents between orders and lineitem (complements q103's
  *    intra-table rules; the FK half of the ingest gate).
  */
object QueriesY extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q106
    QDef("q106_activity_matrix",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr(s"$tsMs AS ts_ms")
          // 1970-01-01 was a Thursday: dow 0=Mon … 6=Sun
          .withColumn("dow", expr("CAST((ts_ms DIV 86400000 + 3) % 7 AS INT)"))
          .withColumn("hour", expr("CAST((ts_ms DIV 3600000) % 24 AS INT)"))
          .groupBy("dow", "hour").agg(count(lit(1)).as("n"))
          .orderBy("dow", "hour")
      },
      Some("""
        WITH e AS (SELECT epoch_ms(ts) AS ts_ms FROM events)
        SELECT CAST((ts_ms // 86400000 + 3) % 7 AS INT) AS dow,
               CAST((ts_ms // 3600000) % 24 AS INT) AS hour,
               count(*) AS n
        FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------- q107
    QDef("q107_growth_curve",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day")
        val active = ev.distinct()
        val firstSeen = active.groupBy("user_id").agg(min("day").as("first_day"))
        val newPerDay = firstSeen.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("n_new"))
        val activePerDay = active.groupBy("day").agg(count(lit(1)).as("n_active"))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        activePerDay.join(newPerDay, Seq("day"), "left_outer")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("n_returning", col("n_active") - col("n_new"))
          .withColumn("cum_users", sum("n_new").over(w).cast("bigint"))
          .orderBy("day")
      },
      Some("""
        WITH active AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        first_seen AS (
          SELECT user_id, min(day) AS first_day FROM active GROUP BY 1),
        new_per_day AS (
          SELECT first_day AS day, count(*) AS n_new FROM first_seen GROUP BY 1),
        active_per_day AS (
          SELECT day, count(*) AS n_active FROM active GROUP BY 1),
        j AS (
          SELECT a.day, a.n_active, coalesce(n.n_new, 0) AS n_new
          FROM active_per_day a LEFT JOIN new_per_day n ON a.day = n.day)
        SELECT day, n_active, n_new, n_active - n_new AS n_returning,
               CAST(sum(n_new) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        FROM j ORDER BY day""")),

    // ---------------------------------------------------------------- q108
    QDef("q108_referential_audit",
      (s, dir) => {
        // both audits in ONE union+groupBy pass (the r9 two anti-joins
        // scanned+shuffled each table twice): per-key lineitem count and
        // order flag, then the two violation sums
        val o = t(s, dir, "orders").select(col("o_orderkey"))
        val li = t(s, dir, "lineitem").select(col("l_orderkey"))
        val tagged = li.select(col("l_orderkey").as("k"),
            lit(1L).as("isL"), lit(0L).as("isO"))
          .unionAll(o.select(col("o_orderkey").as("k"),
            lit(0L).as("isL"), lit(1L).as("isO")))
        val row = tagged.groupBy("k")
          .agg(sum("isL").as("nl"), sum("isO").as("no"))
          .agg(coalesce(sum(when(col("no") === 0, col("nl")).otherwise(0L)),
              lit(0L)).as("orph"), // empty tables: sums are NULL
            coalesce(sum(when(col("nl") === 0, 1L).otherwise(0L)),
              lit(0L)).as("chl"))
          .first()
        val (orphans, childless) = (row.getLong(0), row.getLong(1))
        val s2 = o.sparkSession
        import s2.implicits._
        Seq(("orphan_lineitems", orphans), ("childless_orders", childless))
          .toDF("rule", "n_violations")
          .withColumn("pass", col("n_violations") === 0L)
          .orderBy("rule")
      },
      Some("""
        WITH orphans AS (
          SELECT count(*) AS n FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        childless AS (
          SELECT count(*) AS n FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        SELECT rule, n_violations, n_violations = 0 AS pass FROM (
          SELECT 'childless_orders' AS rule, (SELECT n FROM childless) AS n_violations
          UNION ALL
          SELECT 'orphan_lineitems' AS rule, (SELECT n FROM orphans) AS n_violations)
        ORDER BY rule"""))
  )
}
