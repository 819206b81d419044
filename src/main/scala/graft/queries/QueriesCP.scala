package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 87 — experiment planning, calendar
  * occupancy, distinct-count lattices, hierarchy shares:
  *
  *  - q371: A/B power analysis — per event-type baseline rate p, the
  *    sample size needed to detect a 2-point absolute lift at
  *    α=0.05/power=0.8: n = (z_α/2+z_β)²·2p(1−p)/Δ², with
  *    (z₁.₉₆+z₀.₈₄)² pre-quantized to micro (one constant, both
  *    engines); the "how long must the experiment run" planner.
  *  - q372: calendar occupancy — orders expanded into booked nights
  *    (stay length = orderkey mod 7 + 1), monthly occupancy = booked
  *    nights / (listing-days) per 30-day bucket; the reference's
  *    calendar-availability analytics (`operations/calendars.py`).
  *  - q373: COUNT DISTINCT over a CUBE lattice — distinct users per
  *    (type), (dow), (type,dow) and grand total in ONE cube pass
  *    (the expensive distinct-aggregate expansion every BI layer
  *    eventually asks for; q80's cube is the SUM version).
  *  - q374: share-of-parent — nation revenue share within region and
  *    region share of total in one two-window pass; the ratio-to-parent
  *    reporting staple.
  *
  * Reference analog: experiment sizing for scrape-policy changes,
  * calendar occupancy reporting, distinct-listing admin lattices,
  * AOI-hierarchy share reports.
  */
object QueriesCP extends QueryPack {
  import Q._

  // (1.959964 + 0.841621)² in micro — fixed constant shared by both engines
  private val z2Micro = math.round(math.pow(1.959964 + 0.841621, 2) * 1e6)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q371
    QDef("q371_power_analysis",
      (s, dir) => {
        t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type",
            "CASE WHEN value >= 50 THEN 1L ELSE 0L END AS succ")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_obs"),
            sum("succ").cast("bigint").as("n_succ"))
          .selectExpr("event_type", "n_obs", "n_succ",
            "n_succ * 10000 DIV n_obs AS p_bp",
            // n = z²·2·p(1−p)/Δ², Δ=0.02 ⇒ /0.0004 ⇒ ×2500
            s"""CAST(ceil(CAST($z2Micro AS DOUBLE) / 1e6
               * 2 * (CAST(n_succ AS DOUBLE) / CAST(n_obs AS DOUBLE))
               * (1 - CAST(n_succ AS DOUBLE) / CAST(n_obs AS DOUBLE))
               * 2500) AS BIGINT) AS n_required""")
          .orderBy("event_type")
      },
      Some(s"""
        WITH agg AS (
          SELECT event_type, count(*) AS n_obs,
                 CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_succ
          FROM events WHERE value IS NOT NULL GROUP BY 1)
        SELECT event_type, n_obs, n_succ,
               n_succ * 10000 // n_obs AS p_bp,
               CAST(ceil(CAST($z2Micro AS DOUBLE) / 1e6
                 * 2 * (CAST(n_succ AS DOUBLE) / CAST(n_obs AS DOUBLE))
                 * (1 - CAST(n_succ AS DOUBLE) / CAST(n_obs AS DOUBLE))
                 * 2500) AS BIGINT) AS n_required
        FROM agg ORDER BY event_type""")),

    // --------------------------------------------------------------- q372
    QDef("q372_occupancy",
      (s, dir) => {
        val stays = t(s, dir, "orders").selectExpr("o_custkey",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d0",
          "o_orderkey % 7 + 1 AS nights")
        val nights = stays
          .select(col("o_custkey"),
            explode(expr("sequence(d0, d0 + nights - 1)")).as("night"))
          .distinct()
        val monthly = nights
          .selectExpr("o_custkey", "night DIV 30 AS month30")
          .groupBy("month30")
          .agg(count(lit(1)).as("booked_nights"),
            countDistinct("o_custkey").as("active_listings"))
        monthly
          .selectExpr("month30", "booked_nights", "active_listings",
            "booked_nights * 10000 DIV (active_listings * 30) AS occupancy_bp")
          .orderBy("month30")
      },
      Some("""
        WITH stays AS (
          SELECT o_custkey,
                 epoch_ms(o_orderdate) // 86400000 AS d0,
                 o_orderkey % 7 + 1 AS nights
          FROM orders),
        nights AS (
          SELECT DISTINCT o_custkey, d0 + x AS night
          FROM stays, unnest(range(7)) r(x)
          WHERE x < nights),
        monthly AS (
          SELECT night // 30 AS month30, count(*) AS booked_nights,
                 count(DISTINCT o_custkey) AS active_listings
          FROM nights GROUP BY 1)
        SELECT month30, booked_nights, active_listings,
               booked_nights * 10000 // (active_listings * 30) AS occupancy_bp
        FROM monthly ORDER BY month30""")),

    // --------------------------------------------------------------- q373
    QDef("q373_distinct_cube",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr("event_type", s"((($tsMs) DIV 86400000) + 4) % 7 AS dow",
            "user_id")
          .cube("event_type", "dow")
          .agg(countDistinct("user_id").as("distinct_users"),
            count(lit(1)).as("n_events"))
          .selectExpr("coalesce(event_type, '(all)') AS event_type",
            "coalesce(CAST(dow AS STRING), '(all)') AS dow",
            "distinct_users", "n_events")
          .orderBy("event_type", "dow")
      },
      Some("""
        WITH base AS (
          SELECT event_type,
                 ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow, user_id
          FROM events)
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(CAST(dow AS VARCHAR), '(all)') AS dow,
               count(DISTINCT user_id) AS distinct_users,
               count(*) AS n_events
        FROM base
        GROUP BY CUBE (event_type, dow)
        ORDER BY event_type, dow""")),

    // --------------------------------------------------------------- q374
    QDef("q374_share_of_parent",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .selectExpr("n_regionkey", "n_nationkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("n_regionkey", "n_nationkey")
          .agg(sum("cents").cast("bigint").as("rev"))
        val wReg = Window.partitionBy("n_regionkey")
        val wAll = Window.partitionBy(lit(1))
        rev
          .withColumn("region_rev", sum("rev").over(wReg))
          .withColumn("total_rev", sum("rev").over(wAll))
          .selectExpr("n_regionkey", "n_nationkey", "rev",
            "rev * 10000 DIV region_rev AS share_of_region_bp",
            "CAST(region_rev AS BIGINT) * 10000 DIV total_rev AS region_share_bp")
          .orderBy("n_regionkey", "n_nationkey")
      },
      Some("""
        WITH rev AS (
          SELECT n_regionkey, n_nationkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        shares AS (
          SELECT n_regionkey, n_nationkey, rev,
                 CAST(sum(rev) OVER (PARTITION BY n_regionkey) AS BIGINT)
                   AS region_rev,
                 CAST(sum(rev) OVER () AS BIGINT) AS total_rev
          FROM rev)
        SELECT n_regionkey, n_nationkey, rev,
               rev * 10000 // region_rev AS share_of_region_bp,
               region_rev * 10000 // total_rev AS region_share_bp
        FROM shares ORDER BY n_regionkey, n_nationkey"""))
  )
}
