package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 63 — the remaining classic join
  * shapes (TPC-H Q16/Q18/Q19/Q21 re-expressed, exact integers):
  *
  *  - q277: supplier variety per part segment (Q16 shape) — distinct
  *    suppliers per (p_type, size band), EXCLUDING flagged suppliers
  *    (negative balance = the complaints list) via anti-join; distinct
  *    before counting so the fact fan-out never inflates the census.
  *  - q278: large-order ranking (Q18 shape) — top-100 orders by total
  *    quantity (HAVING-sum filter as a windowed limit keeps the output
  *    bounded at every SF), customer joined after the aggregate.
  *  - q279: disjunctive-predicate join revenue (Q19 shape) — three
  *    OR'd (brand-set × size-range × qty-range) branches; each branch
  *    labeled and accounted separately + as a whole. The OR is pushed
  *    into ONE scan with a CASE label, never three scans.
  *  - q280: sole-late-supplier forensics (Q21 shape) — on multi-
  *    supplier orders, the supplier whose lines were the ONLY late
  *    ones (>60 days after order date): per-order supplier/late
  *    censuses via one grouped pass, never correlated EXISTS chains.
  *
  * Reference analog: host-variety per area census, oversized-response
  * accounting, rule-based revenue slices, and the "which host alone
  * delayed the batch" forensics of task-group bookkeeping.
  */
object QueriesBR extends QueryPack {
  import Q._

  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q277
    QDef("q277_supplier_variety",
      (s, dir) => {
        val part = t(s, dir, "part")
          .selectExpr("p_partkey", "p_type",
            "CAST((p_size - 1) DIV 10 AS BIGINT) AS size_band")
        val flagged = t(s, dir, "supplier")
          .where(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_key"))
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
          .join(flagged, col("l_suppkey") === col("bad_key"), "left_anti")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("p_type"), col("size_band"), col("l_suppkey")).distinct()
          .groupBy("p_type", "size_band")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_type"), col("size_band"))
      },
      Some("""
        SELECT p.p_type, CAST((p.p_size - 1) // 10 AS BIGINT) AS size_band,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p_type, size_band""")),

    // --------------------------------------------------------------- q278
    QDef("q278_big_orders",
      (s, dir) => {
        val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        val perOrder = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"), sum("qty").cast("bigint").as("total_qty"))
        perOrder
          // top-100 via orderBy+limit (distributed TakeOrderedAndProject);
          // the rank window then covers 100 rows, not every order
          .orderBy(col("total_qty").desc, col("l_orderkey"))
          .limit(100)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("total_qty").desc, col("l_orderkey"))))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .selectExpr("CAST(rk AS BIGINT) AS rk", "c_name", "o_orderpriority",
            "n_lines", "total_qty")
          .orderBy("rk")
      },
      Some("""
        WITH per_order AS (
          SELECT l_orderkey, count(*) AS n_lines,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1),
        ranked AS (
          SELECT *, CAST(row_number() OVER (ORDER BY total_qty DESC, l_orderkey)
            AS BIGINT) AS rk
          FROM per_order)
        SELECT r.rk, c.c_name, o.o_orderpriority, r.n_lines, r.total_qty
        FROM ranked r
        JOIN orders o ON r.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE r.rk <= 100 ORDER BY rk""")),

    // --------------------------------------------------------------- q279
    QDef("q279_disjunctive_revenue",
      (s, dir) => {
        val part = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
          col("p_size"))
        t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty", s"$revExpr AS rev")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .withColumn("branch", expr("""
            CASE WHEN p_brand IN ('Brand#1','Brand#2','Brand#3')
                      AND p_size BETWEEN 1 AND 15 AND qty BETWEEN 1 AND 20
                   THEN 'b1_small'
                 WHEN p_brand IN ('Brand#10','Brand#11','Brand#12')
                      AND p_size BETWEEN 16 AND 30 AND qty BETWEEN 10 AND 30
                   THEN 'b2_mid'
                 WHEN p_brand IN ('Brand#20','Brand#21','Brand#22')
                      AND p_size BETWEEN 31 AND 50 AND qty BETWEEN 20 AND 50
                   THEN 'b3_large'
                 ELSE NULL END"""))
          .where(col("branch").isNotNull)
          .groupBy("branch")
          .agg(count(lit(1)).as("n_items"), sum("rev").cast("bigint").as("rev_cp"))
          .orderBy("branch")
      },
      Some(s"""
        WITH l AS (
          SELECT l_partkey, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                 $revExpr AS rev
          FROM lineitem)
        SELECT CASE WHEN p.p_brand IN ('Brand#1','Brand#2','Brand#3')
                         AND p.p_size BETWEEN 1 AND 15 AND l.qty BETWEEN 1 AND 20
                      THEN 'b1_small'
                    WHEN p.p_brand IN ('Brand#10','Brand#11','Brand#12')
                         AND p.p_size BETWEEN 16 AND 30 AND l.qty BETWEEN 10 AND 30
                      THEN 'b2_mid'
                    ELSE 'b3_large' END AS branch,
               count(*) AS n_items, CAST(sum(l.rev) AS BIGINT) AS rev_cp
        FROM l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand IN ('Brand#1','Brand#2','Brand#3')
               AND p.p_size BETWEEN 1 AND 15 AND l.qty BETWEEN 1 AND 20)
           OR (p.p_brand IN ('Brand#10','Brand#11','Brand#12')
               AND p.p_size BETWEEN 16 AND 30 AND l.qty BETWEEN 10 AND 30)
           OR (p.p_brand IN ('Brand#20','Brand#21','Brand#22')
               AND p.p_size BETWEEN 31 AND 50 AND l.qty BETWEEN 20 AND 50)
        GROUP BY 1 ORDER BY branch""")),

    // --------------------------------------------------------------- q280
    QDef("q280_sole_late_supplier",
      (s, dir) => {
        val perSupp = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
            col("l_shipdate")), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey", "l_suppkey")
          .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, 1L)
            .otherwise(0L)).as("is_late"))
        val perOrder = Window.partitionBy("o_orderkey")
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("int").as("s_nationkey"), col("n_name"))
        perSupp
          .withColumn("n_supps", count(lit(1)).over(perOrder))
          .withColumn("n_late", sum("is_late").over(perOrder))
          .where(col("is_late") === 1L && col("n_supps") >= 2 && col("n_late") === 1L)
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_orders"))
          .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), "s_nationkey")
          // top-20 via orderBy+limit (distributed TakeOrderedAndProject);
          // the rank window then covers 20 rows
          .orderBy(col("n_orders").desc, col("s_name"))
          .limit(20)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("n_orders").desc, col("s_name"))))
          .selectExpr("CAST(rk AS BIGINT) AS rk", "s_name", "n_name", "n_orders")
          .orderBy("rk")
      },
      Some("""
        WITH per_supp AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 max(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                     THEN 1 ELSE 0 END) AS is_late
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY 1, 2),
        flagged AS (
          SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supps,
                 sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
          FROM per_supp),
        per AS (
          SELECT l_suppkey, count(*) AS n_orders
          FROM flagged
          WHERE is_late = 1 AND n_supps >= 2 AND n_late = 1
          GROUP BY 1),
        ranked AS (
          SELECT CAST(row_number() OVER (ORDER BY p.n_orders DESC, s.s_name)
                   AS BIGINT) AS rk, s.s_name, n.n_name, p.n_orders
          FROM per p
          JOIN supplier s ON p.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey)
        SELECT rk, s_name, n_name, n_orders
        FROM ranked WHERE rk <= 20 ORDER BY rk"""))
  )
}
