package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 81 — approximate query processing,
  * relational division, sliding windows, partition evolution:
  *
  *  - q347: AQP sampled-join estimate — a deterministic 10% key sample
  *    of customers joined to orders, scaled ×10, against the exact
  *    count per segment; signed error bp quantifies the sample-join
  *    estimator the 100 TB interactive path would serve first.
  *  - q348: relational division — customers whose orders cover ALL
  *    five order priorities (the FOR-ALL operator: division as
  *    count(distinct)=|divisor|), rolled up per market segment.
  *  - q349: sliding event-time windows — Spark's window(ts, 1h, 15m)
  *    generator (each event lands in 4 overlapping windows), top-10
  *    busiest window starts; oracle replays the same window algebra
  *    with integer epoch math.
  *  - q350: partition-evolution economics — the same date-range
  *    predicate pruned under month-granular vs week-granular layouts:
  *    partitions touched, rows scanned, false-positive rows (scanned
  *    but not matching); the "should we re-partition the table" input.
  *
  * Reference analog: quick estimated dashboards before exact jobs,
  * "users active in every AOI" coverage, rolling harvest-rate windows,
  * response-table partition re-layout decisions.
  */
object QueriesCJ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q347
    QDef("q347_aqp_estimate",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val sampled = cust.where(
          pmod(PortableHash.md5Long(col("c_custkey"), salt = "aqp~"), lit(10)) === 0)
        val orders = t(s, dir, "orders").select(col("o_custkey"))
        def perSeg(c: org.apache.spark.sql.DataFrame, out: String) =
          c.join(orders, col("c_custkey") === col("o_custkey"))
            .groupBy("c_mktsegment").agg(count(lit(1)).as(out))
        perSeg(cust, "n_exact")
          .join(perSeg(sampled, "n_sampled"), Seq("c_mktsegment"), "left")
          .na.fill(0L, Seq("n_sampled"))
          .selectExpr("c_mktsegment", "n_exact", "n_sampled",
            "n_sampled * 10 AS n_estimated",
            """CAST(floor(CAST((n_sampled * 10 - n_exact) AS DOUBLE)
               / CAST(n_exact AS DOUBLE) * 10000) AS BIGINT) AS err_bp""")
          .orderBy("c_mktsegment")
      },
      Some {
        val h = PortableHash.md5LongSql("CAST(c_custkey AS VARCHAR)", salt = "aqp~")
        s"""
        WITH cust AS (
          SELECT c_custkey, c_mktsegment, ($h % 10 + 10) % 10 AS hb
          FROM customer),
        ex AS (
          SELECT c_mktsegment, count(*) AS n_exact
          FROM cust JOIN orders ON c_custkey = o_custkey GROUP BY 1),
        sm AS (
          SELECT c_mktsegment, count(*) AS n_sampled
          FROM cust JOIN orders ON c_custkey = o_custkey
          WHERE hb = 0 GROUP BY 1)
        SELECT c_mktsegment, n_exact, coalesce(n_sampled, 0) AS n_sampled,
               coalesce(n_sampled, 0) * 10 AS n_estimated,
               CAST(floor(CAST(coalesce(n_sampled, 0) * 10 - n_exact AS DOUBLE)
                 / CAST(n_exact AS DOUBLE) * 10000) AS BIGINT) AS err_bp
        FROM ex LEFT JOIN sm USING (c_mktsegment)
        ORDER BY c_mktsegment"""
      }),

    // --------------------------------------------------------------- q348
    QDef("q348_relational_division",
      (s, dir) => {
        val nPrios = t(s, dir, "orders")
          .agg(countDistinct("o_orderpriority").as("np"))
        val covering = t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(countDistinct("o_orderpriority").as("k"),
            count(lit(1)).as("n_orders"))
          .crossJoin(broadcast(nPrios))
          .where(col("k") === col("np"))
        covering
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_covering_customers"),
            sum("n_orders").cast("bigint").as("their_orders"),
            min("o_custkey").as("sample_custkey"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH np AS (SELECT count(DISTINCT o_orderpriority) AS np FROM orders),
        covering AS (
          SELECT o_custkey, count(*) AS n_orders
          FROM orders GROUP BY 1
          HAVING count(DISTINCT o_orderpriority) = (SELECT np FROM np))
        SELECT c_mktsegment, count(*) AS n_covering_customers,
               CAST(sum(n_orders) AS BIGINT) AS their_orders,
               min(o_custkey) AS sample_custkey
        FROM covering JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q349
    QDef("q349_sliding_window",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr(s"timestamp_millis($tsMs) AS t")
          .groupBy(window(col("t"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("cnt"))
          .selectExpr("unix_millis(window.start) AS win_start_ms", "cnt")
          .orderBy(col("cnt").desc, col("win_start_ms"))
          .limit(10)
      },
      Some("""
        WITH ev AS (SELECT epoch_ms(ts) AS ms FROM events),
        expanded AS (
          SELECT ((ms // 900000) - j) * 900000 AS win_start_ms
          FROM ev, (VALUES (0), (1), (2), (3)) js(j))
        SELECT win_start_ms, count(*) AS cnt
        FROM expanded GROUP BY 1
        ORDER BY cnt DESC, win_start_ms LIMIT 10""")),

    // --------------------------------------------------------------- q350
    QDef("q350_partition_evolution",
      (s, dir) => {
        val lo = Q.millisOf("1995-03-01 00:00:00") / 86400000
        val hi = Q.millisOf("1995-05-15 00:00:00") / 86400000
        val ord = t(s, dir, "orders").selectExpr(
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d")
          .withColumn("hit",
            when(col("d") >= lo && col("d") < hi, 1L).otherwise(0L))
        def layout(partExpr: String, name: String) = {
          val parts = ord.withColumn("p", expr(partExpr))
            .groupBy("p").agg(count(lit(1)).as("rows_in_part"),
              sum("hit").cast("bigint").as("hits"))
          parts.where(col("hits") > 0)
            .agg(count(lit(1)).as("n_parts_touched"),
              sum("rows_in_part").cast("bigint").as("rows_scanned"),
              sum("hits").cast("bigint").as("rows_matching"))
            .select(lit(name).as("layout"), col("n_parts_touched"),
              col("rows_scanned"), col("rows_matching"))
        }
        layout("d DIV 30", "a_month30")
          .union(layout("d DIV 7", "b_week"))
          .selectExpr("layout", "n_parts_touched", "rows_scanned",
            "rows_matching",
            "(rows_scanned - rows_matching) * 10000 DIV rows_scanned AS waste_bp")
          .orderBy("layout")
      },
      Some {
        val lo = Q.millisOf("1995-03-01 00:00:00") / 86400000
        val hi = Q.millisOf("1995-05-15 00:00:00") / 86400000
        s"""
        WITH ord AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d,
                 CASE WHEN epoch_ms(o_orderdate) // 86400000 >= $lo
                       AND epoch_ms(o_orderdate) // 86400000 < $hi
                      THEN 1 ELSE 0 END AS hit
          FROM orders),
        la AS (
          SELECT 'a_month30' AS layout, count(*) AS n_parts_touched,
                 CAST(sum(rows_in_part) AS BIGINT) AS rows_scanned,
                 CAST(sum(hits) AS BIGINT) AS rows_matching
          FROM (SELECT d // 30 AS p, count(*) AS rows_in_part,
                       sum(hit) AS hits
                FROM ord GROUP BY 1)
          WHERE hits > 0),
        lb AS (
          SELECT 'b_week' AS layout, count(*) AS n_parts_touched,
                 CAST(sum(rows_in_part) AS BIGINT) AS rows_scanned,
                 CAST(sum(hits) AS BIGINT) AS rows_matching
          FROM (SELECT d // 7 AS p, count(*) AS rows_in_part,
                       sum(hit) AS hits
                FROM ord GROUP BY 1)
          WHERE hits > 0)
        SELECT layout, n_parts_touched, rows_scanned, rows_matching,
               (rows_scanned - rows_matching) * 10000 // rows_scanned AS waste_bp
        FROM (SELECT * FROM la UNION ALL SELECT * FROM lb)
        ORDER BY layout"""
      })
  )
}
