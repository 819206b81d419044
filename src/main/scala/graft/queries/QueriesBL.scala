package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 57 — the deep multi-join reporting
  * shapes (TPC-H Q5/Q8/Q9/Q22 re-expressed, exact integer money):
  *
  *  - q254: regional commerce — the 6-table join chain
  *    customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with same-nation
  *    customer/supplier restriction: revenue per nation. Dimension
  *    tables broadcast; the fact chain shuffles once per key change.
  *    Money as cents×(100−disc%) BIGINT — exact in both engines.
  *  - q255: market share — within each region, the revenue share (bp)
  *    of its top supplier nation per year. Two-level agg over the q254
  *    join; window rank for the leader.
  *  - q256: product-line margin — revenue minus quantity-scaled retail
  *    cost per (supplier nation, year): the Q9 profit shape with
  *    p_retailprice standing in for ps_supplycost.
  *  - q257: idle high-value customers — customers with above-average
  *    account balance (scalar subquery) and no RECENT orders (anti
  *    join against the 2000+ order window), counted per nation with
  *    their balance cents. Q22 without the phone substring (nation
  *    plays the country-code role).
  *
  * Reference analog: these are the reference's cross-entity reporting
  * surface (region/nation rollups of listing revenue; q03's 3-table
  * chain extended to the full snowflake).
  */
object QueriesBL extends QueryPack {
  import Q._

  /** lineitem with exact integer revenue: cents × (100 − disc%). */
  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
  private val revSql =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q254
    QDef("q254_regional_commerce",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("bigint").as("c_nk"))
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("bigint").as("s_nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("nk"), col("n_name"),
            col("n_regionkey").cast("bigint").as("rk"))
        val reg = t(s, dir, "region")
          .select(col("r_regionkey").cast("bigint").as("rk"), col("r_name"))
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem")
            .selectExpr("l_orderkey", "l_suppkey", s"$revExpr AS rev"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .where(col("c_nk") === col("s_nk"))
          .join(broadcast(nat), col("c_nk") === col("nk"))
          .join(broadcast(reg), Seq("rk"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_items"), sum("rev").cast("bigint").as("rev_cp"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""
        SELECT r.r_name, n.n_name, count(*) AS n_items,
               CAST(sum($revSql) AS BIGINT) AS rev_cp
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_nationkey = s.s_nationkey
        GROUP BY 1, 2 ORDER BY r_name, n_name""")),

    // --------------------------------------------------------------- q255
    QDef("q255_market_share",
      (s, dir) => {
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("bigint").as("s_nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("s_nk"), col("n_name"),
            col("n_regionkey").cast("bigint").as("rk"))
        val reg = t(s, dir, "region")
          .select(col("r_regionkey").cast("bigint").as("rk"), col("r_name"))
        val base = t(s, dir, "orders")
          .selectExpr("o_orderkey", "year(CAST(o_orderdate AS TIMESTAMP)) AS yr")
          .join(t(s, dir, "lineitem")
            .selectExpr("l_orderkey", "l_suppkey", s"$revExpr AS rev"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), "s_nk")
          .join(broadcast(reg), Seq("rk"))
          .groupBy("r_name", "yr", "n_name")
          .agg(sum("rev").cast("bigint").as("rev_cp"))
        val tot = Window.partitionBy("r_name", "yr")
        val w = Window.partitionBy("r_name", "yr")
          .orderBy(col("rev_cp").desc, col("n_name"))
        base
          .withColumn("tot", sum("rev_cp").over(tot))
          .withColumn("rk2", row_number().over(w))
          .where(col("rk2") === 1)
          .selectExpr("r_name", "yr", "n_name AS top_nation",
            "rev_cp * 10000 DIV tot AS share_bp")
          .orderBy("r_name", "yr")
      },
      Some(s"""
        WITH base AS (
          SELECT r.r_name, year(o.o_orderdate) AS yr, n.n_name,
                 CAST(sum($revSql) AS BIGINT) AS rev_cp
          FROM orders o
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY 1, 2, 3),
        ranked AS (
          SELECT *, sum(rev_cp) OVER (PARTITION BY r_name, yr) AS tot,
                 row_number() OVER (PARTITION BY r_name, yr
                   ORDER BY rev_cp DESC, n_name) AS rk2
          FROM base)
        SELECT r_name, CAST(yr AS INT) AS yr, n_name AS top_nation,
               CAST(rev_cp * 10000 // tot AS BIGINT) AS share_bp
        FROM ranked WHERE rk2 = 1
        ORDER BY r_name, yr""")),

    // --------------------------------------------------------------- q256
    QDef("q256_product_margin",
      (s, dir) => {
        val part = t(s, dir, "part")
          .selectExpr("p_partkey",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS retail_cents")
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("bigint").as("s_nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("s_nk"), col("n_name"))
        t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty",
            s"$revExpr AS rev",
            "year(CAST(l_shipdate AS TIMESTAMP)) AS yr")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), "s_nk")
          // margin in cents×100 units: rev is cents×percent, cost scaled to match
          .selectExpr("n_name", "yr", "rev - qty * retail_cents * 100 AS margin_cp")
          .groupBy("n_name", "yr")
          .agg(count(lit(1)).as("n_items"),
            sum("margin_cp").cast("bigint").as("margin_cp"))
          .orderBy("n_name", "yr")
      },
      Some(s"""
        SELECT n.n_name, CAST(year(l.l_shipdate) AS INT) AS yr, count(*) AS n_items,
               CAST(sum($revSql
                 - CAST(floor(l.l_quantity + 0.5) AS BIGINT)
                   * CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * 100)
                 AS BIGINT) AS margin_cp
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2 ORDER BY n_name, yr""")),

    // --------------------------------------------------------------- q257
    QDef("q257_idle_customers",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .selectExpr("c_custkey", "c_nationkey",
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents")
        val avgBal = cust.where(col("bal_cents") > 0L)
          .agg(expr("CAST(sum(bal_cents) AS BIGINT) DIV count(1)").as("avg_cents"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("int").as("c_nationkey"), col("n_name"))
        cust.crossJoin(broadcast(avgBal))
          .where(col("bal_cents") > col("avg_cents"))
          .join(t(s, dir, "orders")
            .where(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
            .select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(nat), "c_nationkey")
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_custs"),
            sum("bal_cents").cast("bigint").as("total_bal_cents"))
          .orderBy("n_name")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey, c_nationkey,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
          FROM customer),
        a AS (SELECT CAST(sum(bal_cents) AS BIGINT) // count(*) AS avg_cents
              FROM c WHERE bal_cents > 0)
        SELECT n.n_name, count(*) AS n_custs,
               CAST(sum(c.bal_cents) AS BIGINT) AS total_bal_cents
        FROM c CROSS JOIN a
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.bal_cents > a.avg_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY 1 ORDER BY n_name"""))
  )
}
