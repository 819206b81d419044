package graft.queries

import graft.Tables.t
import graft.geo.SyntheticGeo
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2A extension: reporting-surface operators beyond the core 16 —
  * approximate distinct (HLL), hierarchical rollup subtotals, pivot.
  * Reference analog: the admin reporting/stat views over task + listing
  * tables (SURVEY.md §2A). */
object QueriesA2 extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q17
    // Approximate distinct users per event type, next to the exact count.
    // Uses the portable deterministic HLL (graft.functions.PortableHll)
    // so the estimate itself is a full DuckDB hash-match oracle — engine-
    // native HLLs (approx_count_distinct) stay available as the scale
    // path but can never cross-validate. Accuracy bounds are spec'd in
    // PortableHllSpec.
    QDef("q17_approx_distinct",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val approx = graft.functions.PortableHll
          .approxDistinct(ev, col("user_id"), Seq("event_type"), "approx_users")
        ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"))
          .join(approx, Seq("event_type"))
          .select(col("event_type"), col("approx_users"), col("exact_users"), col("n"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH a AS ${graft.functions.PortableHll.approxDistinctSql(
          "events", "user_id", "event_type", "event_type", "approx_users")},
        x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users,
                     count(*) AS n
              FROM events GROUP BY 1)
        SELECT x.event_type AS event_type, approx_users, exact_users, n
        FROM x JOIN a USING (event_type)
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- q11b
    // Exact rank-based latency quantiles per task type (UBDCTask
    // seconds_to_complete reporting): percentile_disc semantics — value at
    // rank ceil(p*n) under a total (value, event_id) order — is pure
    // integer rank math, so it hash-matches across engines where
    // interpolating quantile implementations would not. One window + one
    // aggregation, single shuffle on the group key.
    QDef("q11b_latency_quantiles",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            max(when(expr("rn = (n * 50 + 99) DIV 100"), col("value"))).as("p50"),
            max(when(expr("rn = (n * 95 + 99) DIV 100"), col("value"))).as("p95"),
            max(when(expr("rn = (n * 99 + 99) DIV 100"), col("value"))).as("p99"))
          .orderBy("event_type")
      },
      Some("""
        WITH r AS (
          SELECT event_type, value, event_id,
                 row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, max(n) AS n,
               max(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50,
               max(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) AS p95,
               max(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99
        FROM r
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- q29
    // Calendar expansion (per-listing calendar harvest, operations/
    // calendars.py; CLI shell management/commands/scrape-listing-data.py:1
    // is an arg-parse wrapper over the same task_update_calendar /
    // task_get_listing_details path): each order expands to its 7-day
    // availability window
    // — generate-series explode on integer epoch-days (exact in both
    // engines) — then a daily load curve. The fan-out is a cheap
    // generator (constant-range sequence), linear in rows × window.
    QDef("q29_calendar_expand",
      (s, dir) => {
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000").as("day0"))
          .select(col("o_orderkey"), col("o_totalprice"), col("day0"),
            explode(sequence(lit(0), lit(6))).as("i"))
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("day0") + col("i")).as("day"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_active"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            dec38(sum(dec(col("o_totalprice")))).as("sum_price"))
          .orderBy("day")
          .limit(60)
      },
      Some(s"""
        WITH d AS (
          SELECT o_orderkey, o_totalprice,
                 epoch_ms(o_orderdate) // 86400000 + i.i AS day
          FROM orders, unnest(range(0, 7)) AS i(i))
        SELECT day, count(*) AS n_active,
               count(DISTINCT o_orderkey) AS n_orders,
               CAST(sum(CAST(o_totalprice AS $decSql)) AS $dec38Sql) AS sum_price
        FROM d
        GROUP BY day
        ORDER BY day
        LIMIT 60""")),

    // ---------------------------------------------------------------- q72
    // Skew-mitigation transparency proof: the hot-key aggregation runs
    // through SkewTools.saltedCount (two-phase partial agg over a
    // deterministic salt) and the dim join through SkewTools.saltedJoin
    // (salt-replicated build side) — while the ORACLE is the PLAIN
    // unsalted SQL. A hash-match proves salting changes the shuffle
    // layout only, never the result. events.event_type is genuinely hot:
    // 5 keys over the whole fact table.
    QDef("q72_salted_hot_key",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val counts = graft.operators.SkewTools.saltedCount(ev, "event_type", nSalts = 16)
        val dim = ev.select("event_type").distinct()
          .withColumn("w", length(col("event_type")))
        val joined = graft.operators.SkewTools
          .saltedJoin(ev.select("event_type", "value"), dim, "event_type", nSalts = 8)
          .groupBy("event_type")
          .agg(dec38(sum(dec(col("value")))).as("sum_value"),
            sum(col("w")).cast("bigint").as("sum_w"))
        counts.join(joined, Seq("event_type"))
          .select("event_type", "n", "sum_value", "sum_w")
          .orderBy("event_type")
      },
      Some(s"""
        WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        d AS (SELECT DISTINCT event_type, length(event_type) AS w FROM events),
        j AS (SELECT e.event_type,
                     CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value,
                     CAST(sum(d.w) AS BIGINT) AS sum_w
              FROM events e JOIN d ON e.event_type = d.event_type
              GROUP BY 1)
        SELECT c.event_type, n, sum_value, sum_w
        FROM c JOIN j ON c.event_type = j.event_type
        ORDER BY c.event_type""")),

    // ---------------------------------------------------------------- q18
    // Hierarchical subtotals: ROLLUP(returnflag, linestatus) — one pass,
    // partial-aggregated; the reporting "totals row" surface.
    QDef("q18_rollup",
      (s, dir) => {
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            dec38(sum(dec(col("l_extendedprice")))).as("sum_price"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS $decSql)) AS $dec38Sql) AS sum_price
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---------------------------------------------------------------- q09b
    // Nested-payload parse (SRH response handling: utils/spatial.py:153
    // listing_locations_from_response + json_parsers.get_lnglat_bbox):
    // Spark CONSTRUCTS a JSON search-response per user (array of
    // {listing_id, lat, lng}), PARSES it back with from_json, and
    // aggregates count + bbox. The oracle computes the same aggregates
    // directly from the base rows — a hash-match proves the JSON
    // round-trip loses nothing (doubles included).
    QDef("q09b_response_parse",
      (s, dir) => {
        val listingSchema = ArrayType(StructType(Seq(
          StructField("listing_id", LongType),
          StructField("lat", DoubleType),
          StructField("lng", DoubleType))))
        val payloads = t(s, dir, "events")
          .withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)
          .groupBy("user_id")
          .agg(to_json(collect_list(struct(
            col("event_id").as("listing_id"), col("lat"), col("lng")))).as("payload"))
        payloads
          .withColumn("ls", from_json(col("payload"), listingSchema))
          .select(col("user_id"),
            size(col("ls")).as("n_listings"),
            expr("array_min(transform(ls, x -> x.lat))").as("min_lat"),
            expr("array_max(transform(ls, x -> x.lat))").as("max_lat"),
            expr("array_min(transform(ls, x -> x.lng))").as("min_lng"),
            expr("array_max(transform(ls, x -> x.lng))").as("max_lng"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH p AS (SELECT user_id, ${SyntheticGeo.lngSql} AS lng, ${SyntheticGeo.latSql} AS lat
                   FROM events)
        SELECT user_id, count(*) AS n_listings,
               min(lat) AS min_lat, max(lat) AS max_lat,
               min(lng) AS min_lng, max(lng) AS max_lng
        FROM p
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q19
    // Pivot: per-user value sums by event type (wide reporting view).
    // Explicit value list → no extra distinct-values job.
    QDef("q19_pivot",
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(dec38(sum(dec(col("value")))))
          .select(col("user_id") +: types.map(c =>
            coalesce(col(c), lit(0).cast("double")).as(c)): _*)
          .orderBy("user_id")
      },
      Some(s"""
        SELECT user_id,
          COALESCE(CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS $decSql) END) AS $dec38Sql), 0) AS click,
          COALESCE(CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS $decSql) END) AS $dec38Sql), 0) AS view,
          COALESCE(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS $decSql) END) AS $dec38Sql), 0) AS purchase,
          COALESCE(CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS $decSql) END) AS $dec38Sql), 0) AS signup,
          COALESCE(CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS $decSql) END) AS $dec38Sql), 0) AS error
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),
  )
}
