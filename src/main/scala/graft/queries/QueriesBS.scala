package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 64 — sourcing/threshold join shapes
  * (TPC-H Q2/Q11/Q14/Q20 re-expressed on this schema, exact integers):
  *
  *  - q281: min-cost supplier per part (Q2 shape) — cheapest observed
  *    unit price per part from lineitem history, argmin via struct-min
  *    (ONE hash agg, no per-part sort), supplier+nation joined after;
  *    top-50 cheapest parts. Unit cents = cents DIV qty (exact integer
  *    division, identical both engines on positives).
  *  - q282: important parts (Q11 shape) — parts whose total traded
  *    value exceeds 1/1000 of the grand total: the scalar-subquery
  *    threshold decided by exact cross-multiply (value·1000 > total),
  *    never a floating share.
  *  - q283: promo revenue share (Q14 shape) — monthly PROMO-type
  *    revenue share in bp from one conditional aggregate over the
  *    lineitem⋈part broadcast join.
  *  - q284: dominant suppliers (Q20 shape) — (supplier, part) pairs
  *    where the supplier shipped more than 1/8 of the part's total
  *    quantity (8·qty > total, exact), rolled up per supplier nation.
  *    Group-sums + one per-part window sum — no correlated subquery.
  *
  * Reference analog: cheapest-host-per-area sourcing, high-volume
  * listing identification, promo-mix reporting, and single-host
  * area-dominance accounting.
  */
object QueriesBS extends QueryPack {
  import Q._

  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q281
    QDef("q281_min_cost_supplier",
      (s, dir) => {
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"),
            col("s_nationkey").cast("bigint").as("nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("nk"), col("n_name"))
        t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               DIV CAST(floor(l_quantity + 0.5) AS BIGINT) AS unit_cents""")
          .groupBy("l_partkey")
          .agg(min(struct(col("unit_cents"), col("l_suppkey"))).as("best"))
          .selectExpr("l_partkey", "best.unit_cents AS unit_cents",
            "best.l_suppkey AS best_supp")
          .orderBy(col("unit_cents"), col("l_partkey"))
          .limit(50)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("unit_cents"), col("l_partkey"))))
          .join(broadcast(supp), col("best_supp") === col("s_suppkey"))
          .join(broadcast(nat), "nk")
          .selectExpr("CAST(rk AS BIGINT) AS rk", "l_partkey AS partkey",
            "unit_cents", "s_name", "n_name")
          .orderBy("rk")
      },
      Some("""
        WITH units AS (
          SELECT l_partkey, l_suppkey,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   // CAST(floor(l_quantity + 0.5) AS BIGINT) AS unit_cents
          FROM lineitem),
        best AS (
          SELECT l_partkey, unit_cents, l_suppkey AS best_supp,
                 row_number() OVER (PARTITION BY l_partkey
                   ORDER BY unit_cents, l_suppkey) AS pr
          FROM units),
        ranked AS (
          SELECT l_partkey, unit_cents, best_supp,
                 CAST(row_number() OVER (ORDER BY unit_cents, l_partkey)
                   AS BIGINT) AS rk
          FROM best WHERE pr = 1)
        SELECT r.rk, r.l_partkey AS partkey, r.unit_cents, s.s_name, n.n_name
        FROM ranked r
        JOIN supplier s ON r.best_supp = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE r.rk <= 50 ORDER BY rk""")),

    // --------------------------------------------------------------- q282
    QDef("q282_important_parts",
      (s, dir) => {
        val perPart = t(s, dir, "lineitem")
          .selectExpr("l_partkey", s"$revExpr AS rev")
          .groupBy("l_partkey")
          .agg(sum("rev").cast("bigint").as("value_cp"))
        graft.operators.ScaleRank.withTotals(perPart,
            Seq(sum("value_cp").cast("bigint").as("total_cp")))
          .where(col("value_cp") * 1000L > col("total_cp"))
          .withColumn("share_bp", expr("value_cp * 10000 DIV total_cp"))
          .orderBy(col("value_cp").desc, col("l_partkey"))
          .limit(25)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("value_cp").desc, col("l_partkey"))))
          .selectExpr("CAST(rk AS BIGINT) AS rk", "l_partkey AS partkey",
            "value_cp", "share_bp")
          .orderBy("rk")
      },
      Some(s"""
        WITH per_part AS (
          SELECT l_partkey, CAST(sum($revExpr) AS BIGINT) AS value_cp
          FROM lineitem GROUP BY 1),
        flagged AS (
          SELECT *, CAST(sum(value_cp) OVER () AS BIGINT) AS total_cp
          FROM per_part),
        ranked AS (
          SELECT l_partkey, value_cp, value_cp * 10000 // total_cp AS share_bp,
                 CAST(row_number() OVER (ORDER BY value_cp DESC, l_partkey)
                   AS BIGINT) AS rk
          FROM flagged WHERE value_cp * 1000 > total_cp)
        SELECT rk, l_partkey AS partkey, value_cp, share_bp
        FROM ranked WHERE rk <= 25 ORDER BY rk""")),

    // --------------------------------------------------------------- q283
    QDef("q283_promo_share",
      (s, dir) => {
        val part = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
        t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "year(CAST(l_shipdate AS TIMESTAMP)) AS yr",
            "month(CAST(l_shipdate AS TIMESTAMP)) AS mo", s"$revExpr AS rev")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy("yr", "mo")
          .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
            .cast("bigint").as("promo_cp"),
            sum("rev").cast("bigint").as("total_cp"))
          .withColumn("promo_bp", expr("promo_cp * 10000 DIV total_cp"))
          .orderBy("yr", "mo")
      },
      Some(s"""
        SELECT CAST(year(l.l_shipdate) AS INT) AS yr,
               CAST(month(l.l_shipdate) AS INT) AS mo,
               CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN $revExpr ELSE 0 END)
                 AS BIGINT) AS promo_cp,
               CAST(sum($revExpr) AS BIGINT) AS total_cp,
               CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN $revExpr ELSE 0 END)
                 AS BIGINT) * 10000
                 // CAST(sum($revExpr) AS BIGINT) AS promo_bp
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2 ORDER BY yr, mo""")),

    // --------------------------------------------------------------- q284
    QDef("q284_dominant_suppliers",
      (s, dir) => {
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("bigint").as("nk"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey").cast("bigint").as("nk"), col("n_name"))
        t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum("qty").cast("bigint").as("supp_qty"))
          .withColumn("part_qty",
            sum("supp_qty").over(Window.partitionBy("l_partkey")))
          .where(col("supp_qty") * 8L > col("part_qty"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), "nk")
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_dominant_pairs"),
            countDistinct("l_suppkey").as("n_suppliers"))
          .orderBy("n_name")
      },
      Some("""
        WITH per AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS supp_qty
          FROM lineitem GROUP BY 1, 2),
        dom AS (
          SELECT *, CAST(sum(supp_qty) OVER (PARTITION BY l_partkey) AS BIGINT)
                   AS part_qty
          FROM per)
        SELECT n.n_name, count(*) AS n_dominant_pairs,
               count(DISTINCT d.l_suppkey) AS n_suppliers
        FROM dom d
        JOIN supplier s ON d.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE d.supp_qty * 8 > d.part_qty
        GROUP BY 1 ORDER BY n_name"""))
  )
}
