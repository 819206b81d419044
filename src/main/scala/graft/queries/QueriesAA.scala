package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 20 — operational monitoring:
  *
  *  - q118: duplicate-rate trend — per-day exact-duplicate fraction of the
  *    payload stream (basis points). The drift monitor that tells a
  *    collection pipeline its scraper started re-fetching the same pages.
  *  - q119: column profile — per-column null counts and distinct
  *    cardinalities in one stacked report (the schema-drift/profiling
  *    companion to q103's rule gate).
  */
object QueriesAA extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // --------------------------------------------------------------- q118
    QDef("q118_dup_trend",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS day", "event_type", "props")
          .groupBy("day")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(concat_ws("|", col("event_type"), col("props"))).as("n_distinct"))
          .withColumn("dup_bp",
            expr("(n_events - n_distinct) * 10000 DIV n_events"))
          .orderBy("day")
      },
      Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 concat_ws('|', event_type, props) AS payload
          FROM events)
        SELECT day, count(*) AS n_events,
               count(DISTINCT payload) AS n_distinct,
               (count(*) - count(DISTINCT payload)) * 10000 // count(*) AS dup_bp
        FROM d GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q119
    QDef("q119_column_profile",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        val aggs = cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).cast("bigint").as(s"null_$c"),
            countDistinct(col(c).cast("string")).as(s"dist_$c"))
        }
        val stacked = cols.map(c => s"'$c', null_$c, dist_$c").mkString(", ")
        o.agg(aggs.head, aggs.tail: _*)
          .selectExpr(s"stack(${cols.length}, $stacked) AS (col_name, n_null, n_distinct)")
          .orderBy("col_name")
      },
      Some {
        val selects = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority").map { c =>
          s"""SELECT '$c' AS col_name,
                 CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_null,
                 count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct
              FROM orders"""
        }.mkString("\n          UNION ALL ")
        s"""
        SELECT * FROM ($selects)
        ORDER BY col_name"""
      })
  )
}
