package graft.queries

import graft.Tables.t
import graft.geo.Distance
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 19:
  *
  *  - q110: movement trajectories — per-user consecutive-point haversine
  *    hop distances (lag window over event time) accumulated to exact
  *    micro-km totals. The trajectory-length analytics over the
  *    reference's listing movement history (`workunits.py:158` keeps a
  *    movement log per listing; this is its "how far has it drifted"
  *    rollup). Distances floor-quantize to BIGINT before aggregation
  *    (the q100/q47 parity rule).
  */
object QueriesZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    QDef("q110_trajectory",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms",
            "((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng",
            "((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat")
          .withColumn("p_lng", lag("lng", 1).over(w))
          .withColumn("p_lat", lag("lat", 1).over(w))
          .filter(col("p_lng").isNotNull)
          .withColumn("hop_ukm",
            floor(Distance.haversineKm(col("p_lat"), col("p_lng"), col("lat"), col("lng"))
              * lit(1000000.0)).cast("bigint"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hops"),
            sum("hop_ukm").cast("bigint").as("total_ukm"),
            max("hop_ukm").cast("bigint").as("max_ukm"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH pts AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 ((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng,
                 ((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat
          FROM events),
        hops AS (
          SELECT user_id,
                 lag(lng) OVER w AS p_lng, lag(lat) OVER w AS p_lat, lng, lat
          FROM pts
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        d AS (
          SELECT user_id,
                 CAST(floor((${Distance.haversineKmSql("p_lat", "p_lng", "lat", "lng")})
                   * 1000000.0) AS BIGINT) AS hop_ukm
          FROM hops WHERE p_lng IS NOT NULL)
        SELECT user_id, count(*) AS n_hops,
               CAST(sum(hop_ukm) AS BIGINT) AS total_ukm,
               CAST(max(hop_ukm) AS BIGINT) AS max_ukm
        FROM d GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q112
    // Share-shift report: each segment's share of total order value per
    // year, and the basis-point shift against the prior year — the
    // percent-of-total + period-over-period composition view (integer
    // year from epoch-day arithmetic; shares in exact integer bp of cents).
    QDef("q112_share_shift",
      (s, dir) => {
        val w = Window.partitionBy("seg").orderBy("yr")
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .selectExpr("c_custkey AS o_custkey", "c_mktsegment AS seg")), "o_custkey")
          .selectExpr("seg",
            "CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS yr",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("seg", "yr").agg(sum("cents").cast("bigint").as("seg_cents"))
          .withColumn("yr_cents",
            sum("seg_cents").over(Window.partitionBy("yr")).cast("bigint"))
          .withColumn("share_bp", expr("seg_cents * 10000 DIV yr_cents"))
          .withColumn("shift_bp",
            col("share_bp") - lag("share_bp", 1).over(w))
          .select("seg", "yr", "share_bp", "shift_bp")
          .orderBy("seg", "yr")
      },
      Some("""
        WITH o AS (
          SELECT c.c_mktsegment AS seg,
                 CAST(year(o.o_orderdate) AS INT) AS yr,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        g AS (
          SELECT seg, yr, CAST(sum(cents) AS BIGINT) AS seg_cents
          FROM o GROUP BY 1, 2),
        sh AS (
          SELECT seg, yr,
                 seg_cents * 10000 // CAST(sum(seg_cents) OVER (PARTITION BY yr) AS BIGINT)
                   AS share_bp
          FROM g)
        SELECT seg, yr, share_bp,
               share_bp - lag(share_bp) OVER (PARTITION BY seg ORDER BY yr) AS shift_bp
        FROM sh ORDER BY seg, yr""")),

    // --------------------------------------------------------------- q113
    // FK fan-out histogram: distribution of children-per-parent (lineitems
    // per order), including the zero bucket via a left join — the shape
    // input for join planning (pairs with q108's existence audit).
    QDef("q113_fanout_hist",
      (s, dir) => {
        val counts = t(s, dir, "orders").select(col("o_orderkey"))
          .join(t(s, dir, "lineitem").groupBy("l_orderkey").agg(count(lit(1)).as("c")),
            col("o_orderkey") === col("l_orderkey"), "left_outer")
          .select(coalesce(col("c"), lit(0L)).as("fanout"))
        counts.groupBy("fanout").agg(count(lit(1)).as("n_orders"))
          .orderBy("fanout")
      },
      Some("""
        WITH c AS (
          SELECT o.o_orderkey, coalesce(l.c, 0) AS fanout
          FROM orders o LEFT JOIN (
            SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1) l
            ON o.o_orderkey = l.l_orderkey)
        SELECT fanout, count(*) AS n_orders
        FROM c GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q114
    // Ties-aware top-k: RANK <= k keeps every row tied at the boundary
    // (q02's row_number arbitrarily drops ties) — the correct form when
    // "top 3 prices" must not silently discard equal-priced rows.
    QDef("q114_topk_ties",
      (s, dir) => {
        val w = Window.partitionBy("l_returnflag").orderBy(col("cents").desc)
        t(s, dir, "lineitem")
          .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= 3)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            max("rk").cast("bigint").as("max_rank"),
            min("cents").as("kth_cents"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH r AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                 rank() OVER (PARTITION BY l_returnflag ORDER BY
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DESC) AS rk
          FROM lineitem)
        SELECT l_returnflag, count(*) AS n_rows,
               CAST(max(rk) AS BIGINT) AS max_rank,
               min(cents) AS kth_cents
        FROM r WHERE rk <= 3
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q115
    // Time travel: reconstruct the per-key table state AS OF timestamp T
    // from the SCD2 validity intervals (valid_from <= T < valid_to, open
    // tail = current) — the temporal-table point lookup every audit and
    // reproducibility story needs. Semantically identical to "latest
    // event at or before T" (the spec cross-checks the equivalence).
    QDef("q115_asof_snapshot",
      (s, dir) => {
        val asOf = millisOf("2024-01-20 00:00:00")
        val iv = graft.operators.Relational.scd2Intervals(
          t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
          Seq(col("user_id")), col("ts_ms"), Seq(col("event_id")))
        iv.filter(col("valid_from_ms") <= asOf &&
            (col("valid_to_ms").isNull || col("valid_to_ms") > asOf))
          .groupBy(expr("user_id % 10").as("bucket"))
          .agg(count(lit(1)).as("n_keys"),
            dec38(sum(dec(col("value")))).as("value_sum"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH iv AS (
          SELECT user_id, value, epoch_ms(ts) AS valid_from_ms,
                 lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS valid_to_ms
          FROM events),
        at_t AS (
          SELECT user_id, value FROM iv
          WHERE valid_from_ms <= ${millisOf("2024-01-20 00:00:00")}
            AND (valid_to_ms IS NULL OR valid_to_ms > ${millisOf("2024-01-20 00:00:00")}))
        SELECT user_id % 10 AS bucket, count(*) AS n_keys,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS value_sum
        FROM at_t GROUP BY 1 ORDER BY 1"""))
  )
}
