package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 137 — TPC-H shape completion. With
  * q01/Q1, q03/Q3, q254/Q5, q255/Q8, q256/Q9, q551/Q7, q552/Q16,
  * q88+q257/Q17+Q22 already shipped, this pack adds the remaining
  * distinctive TPC-H plan shapes (reference analog: the reporting
  * surface a PostGIS-backed collection DB serves; each is a classic
  * decision-support pattern re-expressed Spark-first):
  *
  *  - q562: Q4 — EXISTS semi-join (orders with any late-shipping line,
  *    > 60 days after order date) counted per priority. left_semi with
  *    a mixed equi+range condition: the probe never duplicates orders.
  *  - q563: Q10 — returned-item revenue per customer (exact cents×pct),
  *    global top-20 via TakeOrderedAndProject.
  *  - q564: Q11 — per-part value share vs a global threshold (share >
  *    1 bp), the scalar-total comparison done in DECIMAL(38,0) so the
  *    cross-multiply cannot overflow at any SF.
  *  - q565: Q13 — customer order-count distribution: LEFT join keeps
  *    zero-order customers, double aggregation (per customer, then per
  *    count).
  *  - q566: Q15 — top supplier(s) by quarter revenue, ties kept via
  *    broadcast scalar-max equality join.
  *  - q567: Q18 — large orders (total qty > 180) via HAVING on the
  *    line aggregate, then joined back to orders+customer; top-20.
  *  - q568: Q19 — disjunctive brand/size/qty predicate revenue: one
  *    broadcast part join, OR-of-ANDs evaluated in the scan filter.
  *  - q569: Q2 (emulated; no partsupp table) — per-part min unit cost
  *    over (part, supplier) from lineitem, arg-min supplier with
  *    deterministic ties, small-dim enrichment, top-20 cheapest.
  *
  * Scale shapes: all fact-side work is one shuffle per agg/join key;
  * dims (part, supplier, nation, customer-after-agg) broadcast; global
  * top-k is orderBy().limit(k) everywhere; scalar totals/maxima are
  * 1-row broadcasts.
  */
object QueriesEN extends QueryPack {
  import Q._

  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
  private val revSql = revExpr
  private val qtyExpr = "CAST(floor(l_quantity + 0.5) AS BIGINT)"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q562
    QDef("q562_exists_lateship",
      (s, dir) => {
        val late = t(s, dir, "lineitem").selectExpr("l_orderkey",
          "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS sday")
        t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_orderpriority",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS oday")
          .join(late, expr("o_orderkey = l_orderkey AND sday > oday + 60"),
            "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND epoch_ms(l.l_shipdate) // 86400000
              > epoch_ms(o.o_orderdate) // 86400000 + 60)
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q563
    QDef("q563_returned_revenue",
      (s, dir) => {
        val nat = t(s, dir, "nation")
          .selectExpr("n_nationkey AS nk", "n_name")
        t(s, dir, "lineitem")
          .where(col("l_returnflag") === "R")
          .selectExpr("l_orderkey", s"$revExpr AS rev")
          .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
            expr("l_orderkey = o_orderkey"))
          .join(t(s, dir, "customer")
            .selectExpr("c_custkey", "c_name", "c_nationkey AS nk"),
            expr("o_custkey = c_custkey"))
          .join(broadcast(nat), "nk")
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum("rev").cast("long").as("rev_cp"),
            count(lit(1)).as("n_items"))
          .orderBy(col("rev_cp").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum($revSql) AS BIGINT) AS rev_cp,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY rev_cp DESC, c_custkey LIMIT 20""")),

    // --------------------------------------------------------------- q564
    QDef("q564_value_share",
      (s, dir) => {
        val pv = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v")
          .groupBy("l_partkey").agg(sum("v").cast("long").as("value_c"))
        val tot = pv.agg(sum("value_c").cast("decimal(38,0)").as("total_c"))
        pv.crossJoin(broadcast(tot))
          // DECIMAL(38,0) cross-multiply: value_c*10000 crosses int64
          // around sf~500; the share predicate must hold at any SF
          .where(expr(
            "CAST(value_c AS DECIMAL(38,0)) * 10000 > total_c"))
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            expr("l_partkey = p_partkey"))
          .selectExpr("p_partkey", "p_brand", "value_c",
            """CAST(floor(CAST(value_c AS DOUBLE) * 10000
                 / CAST(total_c AS DOUBLE)) AS BIGINT) AS share_bp""")
          .orderBy(col("value_c").desc, col("p_partkey"))
          .limit(10)
      },
      Some("""
        WITH pv AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS value_c
          FROM lineitem GROUP BY 1),
        tot AS (SELECT CAST(sum(value_c) AS DECIMAL(38,0)) AS total_c FROM pv)
        SELECT p.p_partkey, p.p_brand, pv.value_c,
               CAST(floor(CAST(pv.value_c AS DOUBLE) * 10000
                 / CAST(t.total_c AS DOUBLE)) AS BIGINT) AS share_bp
        FROM pv, tot t
        JOIN part p ON pv.l_partkey = p.p_partkey
        WHERE CAST(pv.value_c AS DECIMAL(38,0)) * 10000 > t.total_c
        ORDER BY pv.value_c DESC, p.p_partkey LIMIT 10""")),

    // --------------------------------------------------------------- q565
    QDef("q565_custdist",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .where(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey")
        t(s, dir, "customer").select("c_custkey")
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY 1)
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // --------------------------------------------------------------- q566
    QDef("q566_top_supplier",
      (s, dir) => {
        // 1995Q1 in epoch days: [9131, 9221)
        val sr = t(s, dir, "lineitem")
          .selectExpr("l_suppkey", s"$revExpr AS rev",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS sday")
          .where(expr("sday >= 9131 AND sday < 9221"))
          .groupBy("l_suppkey").agg(sum("rev").cast("long").as("rev_cp"))
        val mx = sr.agg(max("rev_cp").as("max_rev"))
        sr.crossJoin(broadcast(mx))
          .where(expr("rev_cp = max_rev"))
          .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            expr("l_suppkey = s_suppkey"))
          .selectExpr("s_suppkey", "s_name", "rev_cp")
          .orderBy("s_suppkey")
      },
      Some(s"""
        WITH sr AS (
          SELECT l_suppkey, CAST(sum($revSql) AS BIGINT) AS rev_cp
          FROM lineitem
          WHERE epoch_ms(l_shipdate) // 86400000 >= 9131
            AND epoch_ms(l_shipdate) // 86400000 < 9221
          GROUP BY 1),
        mx AS (SELECT max(rev_cp) AS max_rev FROM sr)
        SELECT s.s_suppkey, s.s_name, sr.rev_cp
        FROM sr, mx JOIN supplier s ON sr.l_suppkey = s.s_suppkey
        WHERE sr.rev_cp = mx.max_rev
        ORDER BY s.s_suppkey""")),

    // --------------------------------------------------------------- q567
    QDef("q567_large_orders",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", s"$qtyExpr AS q")
          .groupBy("l_orderkey").agg(sum("q").cast("long").as("total_qty"))
          .where(col("total_qty") > 180)
        big.join(t(s, dir, "orders")
            .selectExpr("o_orderkey", "o_custkey",
              "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c"),
            expr("l_orderkey = o_orderkey"))
          .join(t(s, dir, "customer").select("c_custkey", "c_name"),
            expr("o_custkey = c_custkey"))
          .selectExpr("c_custkey", "c_name", "o_orderkey", "total_qty",
            "price_c")
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(20)
      },
      Some(s"""
        WITH big AS (
          SELECT l_orderkey, CAST(sum($qtyExpr) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum($qtyExpr) > 180)
        SELECT c.c_custkey, c.c_name, o.o_orderkey, b.total_qty,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 20""")),

    // --------------------------------------------------------------- q568
    QDef("q568_disjunctive_revenue",
      (s, dir) => {
        t(s, dir, "lineitem")
          .selectExpr("l_partkey", s"$revExpr AS rev", s"$qtyExpr AS q")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            expr("l_partkey = p_partkey"))
          .where(expr(
            """(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                 AND q BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                 AND q BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                 AND q BETWEEN 20 AND 30)"""))
          .agg(count(lit(1)).as("n_items"),
            sum("rev").cast("long").as("rev_cp"))
          .where(expr("n_items > 0"))
      },
      Some(s"""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum($revSql) AS BIGINT) AS rev_cp
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                 AND $qtyExpr BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                 AND $qtyExpr BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
                 AND $qtyExpr BETWEEN 20 AND 30)
        HAVING count(*) > 0""")),

    // --------------------------------------------------------------- q569
    QDef("q569_min_cost_supplier",
      (s, dir) => {
        // unit cost in milli-cents, exact: (cents * 1000) DIV qty
        val cost = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            s"""(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 1000)
                DIV $qtyExpr AS cost_mc""")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min("cost_mc").cast("long").as("unit_mc"))
        val best = cost
          .groupBy("l_partkey")
          .agg(min(struct(col("unit_mc"), col("l_suppkey"))).as("m"))
          .selectExpr("l_partkey", "m.unit_mc AS cost_mc",
            "m.l_suppkey AS sk")
        val nat = t(s, dir, "nation").selectExpr("n_nationkey AS nk", "n_name")
        best
          .join(broadcast(t(s, dir, "part")
            .where(col("p_size") <= 5)
            .select(col("p_partkey"), col("p_brand"))),
            expr("l_partkey = p_partkey"))
          .join(broadcast(t(s, dir, "supplier")
            .selectExpr("s_suppkey", "s_name", "s_nationkey AS nk")),
            col("sk") === col("s_suppkey"))
          .join(broadcast(nat), "nk")
          .selectExpr("p_partkey", "p_brand", "s_name", "n_name", "cost_mc")
          .orderBy(col("cost_mc"), col("p_partkey"))
          .limit(20)
      },
      Some(s"""
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 CAST(min((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * 1000) // $qtyExpr) AS BIGINT) AS unit_mc
          FROM lineitem GROUP BY 1, 2),
        best AS (
          SELECT l_partkey, unit_mc AS cost_mc, l_suppkey AS sk
          FROM cost
          QUALIFY row_number() OVER (PARTITION BY l_partkey
            ORDER BY unit_mc, l_suppkey) = 1)
        SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, b.cost_mc
        FROM best b
        JOIN part p ON b.l_partkey = p.p_partkey AND p.p_size <= 5
        JOIN supplier s ON b.sk = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        ORDER BY b.cost_mc, p.p_partkey LIMIT 20"""))
  )
}
