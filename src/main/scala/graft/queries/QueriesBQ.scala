package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 62 — four more classic deep-join
  * reporting shapes (TPC-H Q4/Q7/Q10/Q15 re-expressed on this schema,
  * exact integer money):
  *
  *  - q273: late-order priority census (Q4 shape) — orders having ANY
  *    lineitem shipped >60 days after the order date (EXISTS semi-join
  *    with a cross-table predicate), counted per priority with the late
  *    share in bp. The semi side is distinct order keys, so the probe
  *    never fans out.
  *  - q274: nation-pair trade volume (Q7 shape) — customer-nation →
  *    supplier-nation revenue per year for cross-nation flows only.
  *    Both nation lookups broadcast; one fact shuffle on orderkey.
  *  - q275: top supplier per year (Q15 shape) — supplier(s) whose
  *    yearly revenue equals the max, ties kept via window max (not
  *    row_number), the view+max composition.
  *  - q276: returned-item customer ranking (Q10 shape) — top 20
  *    customers by revenue on returned items ('R') in one year, with
  *    nation. Deterministic tiebreak on custkey.
  *
  * Reference analog: the reference's cross-entity reporting surface —
  * per-AOI/nation listing-revenue rollups, host leaderboards, and
  * problem-listing (returned) accounting.
  */
object QueriesBQ extends QueryPack {
  import Q._

  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q273
    QDef("q273_late_order_priority",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
            col("o_orderdate"))
        // distinct keys of orders with a >60-day-late line: the EXISTS set
        val lateKeys = o.select(col("o_orderkey"), col("o_orderdate"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
            col("o_orderkey") === col("l_orderkey"))
          .where(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
          .select(col("o_orderkey").as("late_key")).distinct()
        o.join(lateKeys, col("o_orderkey") === col("late_key"), "left")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("late_key").isNotNull, 1L).otherwise(0L))
              .cast("bigint").as("n_late"))
          .withColumn("late_bp", expr("n_late * 10000 DIV n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o.o_orderpriority, count(*) AS n_orders,
               CAST(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey
                   AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey
                   AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60)
                 THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS late_bp
        FROM orders o
        GROUP BY 1 ORDER BY o_orderpriority""")),

    // --------------------------------------------------------------- q274
    QDef("q274_nation_trade",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("bigint").as("c_nk"))
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("bigint").as("s_nk"))
        val natC = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("c_nk"),
            col("n_name").as("cust_nation"))
        val natS = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("s_nk"),
            col("n_name").as("supp_nation"))
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem")
            .selectExpr("l_orderkey", "l_suppkey",
              "year(CAST(l_shipdate AS TIMESTAMP)) AS yr", s"$revExpr AS rev"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .where(col("c_nk") =!= col("s_nk"))
          .join(broadcast(natC), "c_nk")
          .join(broadcast(natS), "s_nk")
          .groupBy("cust_nation", "supp_nation", "yr")
          .agg(count(lit(1)).as("n_items"), sum("rev").cast("bigint").as("rev_cp"))
          .withColumn("rk", row_number().over(Window.orderBy(
            col("rev_cp").desc, col("cust_nation"), col("supp_nation"), col("yr"))))
          .where(col("rk") <= 20)
          .select(col("cust_nation"), col("supp_nation"), col("yr"),
            col("n_items"), col("rev_cp"))
          .orderBy(col("rev_cp").desc, col("cust_nation"), col("supp_nation"), col("yr"))
      },
      Some(s"""
        WITH base AS (
          SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
                 CAST(year(l.l_shipdate) AS INT) AS yr, count(*) AS n_items,
                 CAST(sum($revExpr) AS BIGINT) AS rev_cp
          FROM orders o
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          WHERE c.c_nationkey <> s.s_nationkey
          GROUP BY 1, 2, 3)
        SELECT cust_nation, supp_nation, yr, n_items, rev_cp
        FROM base
        ORDER BY rev_cp DESC, cust_nation, supp_nation, yr
        LIMIT 20""")),

    // --------------------------------------------------------------- q275
    QDef("q275_top_supplier",
      (s, dir) => {
        val supp = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        val perSupp = t(s, dir, "lineitem")
          .selectExpr("l_suppkey",
            "year(CAST(l_shipdate AS TIMESTAMP)) AS yr", s"$revExpr AS rev")
          .groupBy("yr", "l_suppkey")
          .agg(sum("rev").cast("bigint").as("rev_cp"))
        perSupp
          .withColumn("mx", max("rev_cp").over(Window.partitionBy("yr")))
          .where(col("rev_cp") === col("mx"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .selectExpr("yr", "s_name", "rev_cp")
          .orderBy("yr", "s_name")
      },
      Some(s"""
        WITH per_supp AS (
          SELECT CAST(year(l_shipdate) AS INT) AS yr, l_suppkey,
                 CAST(sum($revExpr) AS BIGINT) AS rev_cp
          FROM lineitem GROUP BY 1, 2),
        mx AS (
          SELECT *, max(rev_cp) OVER (PARTITION BY yr) AS m FROM per_supp)
        SELECT mx.yr, s.s_name, mx.rev_cp
        FROM mx JOIN supplier s ON mx.l_suppkey = s.s_suppkey
        WHERE mx.rev_cp = mx.m
        ORDER BY yr, s_name""")),

    // --------------------------------------------------------------- q276
    QDef("q276_returned_revenue",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"),
            col("c_nationkey").cast("bigint").as("nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("nk"), col("n_name"))
        t(s, dir, "orders")
          .where(year(col("o_orderdate").cast("timestamp")) === 1998)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").where(col("l_returnflag") === "R")
            .selectExpr("l_orderkey", s"$revExpr AS rev"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_items"), sum("rev").cast("bigint").as("rev_cp"))
          // top-20 BEFORE the rank window and the dim joins: orderBy+limit
          // is a distributed TakeOrderedAndProject; the row_number then
          // runs over 20 rows instead of every customer (the FK joins are
          // 1:1, so pre-join ranks equal post-join ranks)
          .orderBy(col("rev_cp").desc, col("o_custkey"))
          .limit(20)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("rev_cp").desc, col("o_custkey"))))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), "nk")
          .selectExpr("c_name", "n_name", "n_items", "rev_cp",
            "CAST(rk AS BIGINT) AS rk")
          .orderBy("rk")
      },
      Some(s"""
        WITH per_cust AS (
          SELECT o.o_custkey, count(*) AS n_items,
                 CAST(sum($revExpr) AS BIGINT) AS rev_cp
          FROM orders o
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          WHERE year(o.o_orderdate) = 1998 AND l.l_returnflag = 'R'
          GROUP BY 1),
        ranked AS (
          SELECT c.c_name, n.n_name, p.n_items, p.rev_cp,
                 CAST(row_number() OVER (ORDER BY p.rev_cp DESC, p.o_custkey)
                   AS BIGINT) AS rk
          FROM per_cust p
          JOIN customer c ON p.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey)
        SELECT c_name, n_name, n_items, rev_cp, rk
        FROM ranked WHERE rk <= 20 ORDER BY rk"""))
  )
}
