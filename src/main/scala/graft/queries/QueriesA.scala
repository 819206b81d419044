package graft.queries

import graft.Tables.t
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2A relational/reporting core — the reference's query surface
  * re-expressed as declarative Spark plans (see SURVEY.md §2A for the
  * reference analog of each query). */
object QueriesA extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q01
    QDef("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dec38(sum(dec(col("l_quantity")))).as("sum_qty"),
            dec38(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            dec38(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS $decSql)) AS $dec38Sql) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS $decSql)) AS $dec38Sql) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS $decSql) * (CAST(1 AS $decSql) - CAST(l_discount AS $decSql))) AS $dec38Sql) AS sum_disc_price,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------------- q02
    QDef("q02_topk_per_group",
      (s, dir) => {
        Relational.topKPerGroup(t(s, dir, "orders"),
            Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice").as("price"), col("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some(s"""
        SELECT o_custkey, o_orderkey, o_totalprice AS price, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn""")),

    // ---------------------------------------------------------------- q03
    QDef("q03_join_agg_sort",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp_ntz") &&
                  col("o_orderdate") <  lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            dec38(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""
        SELECT r_name, n_name,
          CAST(sum(CAST(l_extendedprice AS $decSql) * (CAST(1 AS $decSql) - CAST(l_discount AS $decSql))) AS $dec38Sql) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---------------------------------------------------------------- q04
    QDef("q04_latest_snapshot",
      (s, dir) => {
        Relational.latestSnapshot(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            Seq(col("user_id")), Seq(col("ts_ms"), col("event_id")))
          .select(col("user_id"), col("event_type").as("last_type"),
            col("value").as("last_value"), col("ts_ms").as("last_ts_ms"))
          .orderBy("user_id")
      },
      Some(s"""
        SELECT user_id, event_type AS last_type, value AS last_value,
               epoch_ms(ts) AS last_ts_ms
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q05
    QDef("q05_scd2_intervals",
      (s, dir) => {
        Relational.scd2Intervals(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            Seq(col("user_id")), col("ts_ms"), Seq(col("event_id")))
          .select(col("user_id"), col("event_id"), col("valid_from_ms"),
            col("valid_to_ms"), col("value"))
          .orderBy("user_id", "valid_from_ms", "event_id")
      },
      Some(s"""
        SELECT user_id, event_id, epoch_ms(ts) AS valid_from_ms,
               lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS valid_to_ms,
               value
        FROM events
        ORDER BY user_id, valid_from_ms, event_id""")),

    // ---------------------------------------------------------------- q06
    QDef("q06_upsert_merge",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("ts_ms", expr(tsMs))
        val splitMs = millisOf("2024-01-15 00:00:00")
        def latest(df: org.apache.spark.sql.DataFrame) =
          Relational.latestSnapshot(df, Seq(col("user_id")), Seq(col("ts_ms"), col("event_id")))
            .select(col("user_id"), col("value"))
        val cur = latest(ev.filter(col("ts_ms") < splitMs)).withColumnRenamed("value", "cur_value")
        val upd = latest(ev.filter(col("ts_ms") >= splitMs)).withColumnRenamed("value", "upd_value")
        Relational.upsertMerge(cur, upd, "user_id", "cur_value", "upd_value", 50.0)
          .select(col("user_id"), col("status"),
            col("cur_value").as("old_value"), col("upd_value").as("new_value"),
            when(col("cur_value").isNotNull, abs(col("upd_value") - col("cur_value"))).as("delta"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH cur AS (
          SELECT user_id, value FROM (
            SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events WHERE epoch_ms(ts) < epoch_ms(TIMESTAMP '2024-01-15 00:00:00')) WHERE rn = 1),
        upd AS (
          SELECT user_id, value FROM (
            SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events WHERE epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-15 00:00:00')) WHERE rn = 1)
        SELECT u.user_id,
          CASE WHEN c.user_id IS NULL THEN 'created'
               WHEN abs(u.value - c.value) > 50.0 THEN 'moved'
               ELSE 'unchanged' END AS status,
          c.value AS old_value,
          u.value AS new_value,
          CASE WHEN c.user_id IS NOT NULL THEN abs(u.value - c.value) END AS delta
        FROM upd u LEFT JOIN cur c ON u.user_id = c.user_id
        ORDER BY u.user_id""")),

    // ---------------------------------------------------------------- q07
    QDef("q07_sessionize",
      (s, dir) => {
        Relational.sessionize(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            col("user_id"), col("ts_ms"), col("event_id"), gapMs = 1800 * 1000L)
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
            dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""
        WITH flagged AS (
          SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms,
            CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        sess AS (
          SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ---------------------------------------------------------------- q08
    QDef("q08_histogram",
      (s, dir) => {
        t(s, dir, "lineitem")
          .withColumn("bucket", Relational.bucketOf(col("l_extendedprice"), 0.0, 5500.0, 20))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dec38(sum(dec(col("l_extendedprice")))).as("sum_price"))
          .orderBy("bucket")
      },
      Some(s"""
        SELECT CAST(least(greatest(floor(l_extendedprice / 5500.0), 0), 19) AS INT) AS bucket,
               count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS $decSql)) AS $dec38Sql) AS sum_price
        FROM lineitem
        GROUP BY 1
        ORDER BY bucket""")),

    // ---------------------------------------------------------------- q09
    QDef("q09_json_extract",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).cast("bigint").as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- q10
    QDef("q10_pagination",
      (s, dir) => {
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            col("o_totalprice").as("price"))
          .orderBy(col("order_date"), col("o_orderkey"))
          .offset(100).limit(50)
      },
      Some(s"""
        SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_totalprice AS price
        FROM orders
        ORDER BY order_date, o_orderkey
        LIMIT 50 OFFSET 100""")),

    // ---------------------------------------------------------------- q11
    QDef("q11_task_stats",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("day", date_format(timestamp_micros(expr("ts DIV 1000")), "yyyy-MM-dd"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"),
            count(when(col("value") > 100.0, 1)).as("n_hi"),
            countDistinct(col("user_id")).as("users"),
            dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy("event_type", "day")
      },
      Some(s"""
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
               count(CASE WHEN value > 100.0 THEN 1 END) AS n_hi,
               count(DISTINCT user_id) AS users,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, day""")),

    // ---------------------------------------------------------------- q12
    QDef("q12_stale_scan",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("ts_ms", expr(tsMs))
        val universe = ev.groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", col("ts_ms"))).as("last_ts"))
        val excl = ev.filter(col("event_type") === "error" &&
            col("ts_ms") >= millisOf("2024-01-29 00:00:00"))
          .select("user_id").distinct()
        Relational.staleScan(universe, "user_id", "last_ts", excl,
          cutoffMs = millisOf("2024-01-28 00:00:00"), limit = 100)
      },
      Some("""
        WITH universe AS (
          SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS last_ts
          FROM events GROUP BY user_id),
        excl AS (
          SELECT DISTINCT user_id FROM events
          WHERE event_type = 'error' AND epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-29 00:00:00'))
        SELECT u.user_id, u.last_ts
        FROM universe u
        WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.user_id = u.user_id)
          AND (u.last_ts IS NULL OR u.last_ts <= epoch_ms(TIMESTAMP '2024-01-28 00:00:00'))
        ORDER BY u.last_ts ASC NULLS FIRST, u.user_id
        LIMIT 100""")),

    // ---------------------------------------------------------------- q13
    QDef("q13_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        t(s, dir, "events").withColumn("ts_ms", expr(tsMs))
          .withColumn("sum5", sum(dec(col("value"))).over(w))
          .withColumn("cnt5", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            round(col("sum5").cast("double") / col("cnt5"), 4).as("ma5"))
          .orderBy("user_id", "ts_ms", "event_id")
      },
      Some(s"""
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
               round(CAST(sum(CAST(value AS $decSql)) OVER w AS DOUBLE)
                     / count(*) OVER w, 4) AS ma5
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_ms, event_id""")),

    // ---------------------------------------------------------------- q14
    QDef("q14_asof_join",
      (s, dir) => {
        Relational.asOfCarryForward(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            col("user_id"), col("ts_ms"), col("event_id"),
            markCol = col("event_type") === "error",
            pickCol = col("ts_ms"), outName = "last_error_ms")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ms"), col("last_error_ms"),
            (col("ts_ms") - col("last_error_ms")).as("ms_since_error"))
          .orderBy("user_id", "ts_ms", "event_id")
      },
      Some("""
        SELECT event_id, user_id, ts_ms, last_error_ms,
               ts_ms - last_error_ms AS ms_since_error
        FROM (
          SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
                 last_value(CASE WHEN event_type = 'error' THEN epoch_ms(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ms
          FROM events)
        WHERE event_type = 'purchase'
        ORDER BY user_id, ts_ms, event_id""")),

    // ---------------------------------------------------------------- q15
    QDef("q15_distinct_exact",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- q16
    QDef("q16_semi_anti",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val okeys = t(s, dir, "orders").select("o_custkey")
        val withO = cust.join(okeys, cust("c_custkey") === okeys("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
        val withoutO = cust.join(okeys, cust("c_custkey") === okeys("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
        withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
          .na.fill(0L, Seq("n_with", "n_without"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH w AS (
          SELECT c_mktsegment, count(*) AS n_with FROM customer c
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          GROUP BY 1),
        wo AS (
          SELECT c_mktsegment, count(*) AS n_without FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          GROUP BY 1)
        SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
               COALESCE(n_with, 0) AS n_with, COALESCE(n_without, 0) AS n_without
        FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
        ORDER BY c_mktsegment""")),
  )
}
