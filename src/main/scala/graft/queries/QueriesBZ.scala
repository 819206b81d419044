package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 71 — survey design, link analysis,
  * calendar arithmetic, inequality measurement:
  *
  *  - q307: Neyman allocation — distribute a fixed sample budget
  *    (n=1000) across market-segment strata proportional to Nh·Sh
  *    (stratum size × stddev), integer largest-remainder rounding so
  *    the allocations sum exactly to the budget. Variance from exact
  *    BIGINT (n·Σx²−(Σx)²) in whole dollars (cents² would overflow
  *    64-bit at sf≥1 — documented bound), sqrt is the only IEEE op.
  *  - q308: HITS hubs/authorities, two pull steps on the weighted
  *    customer↔supplier bipartite graph (h₀=1 → a₁=weighted indegree →
  *    h₁ → a₂), exact BIGINT throughout; top 20 by converged-ish a₂.
  *  - q309: business-day latency — weekdays between order date and the
  *    order's last ship date via the closed-form weekday-prefix count
  *    g(d)=5·⌊(d+3)/7⌋+min((d+3) mod 7, 5)−3 (identical integer formula
  *    both engines; no calendar UDF, stays in codegen).
  *  - q310: Gini coefficient of per-customer revenue within each
  *    market segment — Σ(2i−n−1)·xᵢ over the deterministically sorted
  *    revenue curve; one floor-quantized IEEE division at the end.
  *
  * Reference analog: budget-bounded listing audits per AOI stratum,
  * influence ranking of users↔listings, task SLA accounting in working
  * days, revenue-concentration reporting per area.
  */
object QueriesBZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q307
    QDef("q307_neyman_alloc",
      (s, dir) => {
        val budget = 1000L
        val strata = t(s, dir, "customer")
          .selectExpr("c_mktsegment",
            "CAST(floor(c_acctbal) AS BIGINT) AS x")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("nh"),
            sum("x").cast("bigint").as("sx"),
            expr("CAST(sum(x * x) AS BIGINT)").as("sxx"))
          .selectExpr("c_mktsegment", "nh",
            // wq = floor(Nh · Sh), Sh² = (n·Σx²−(Σx)²)/(n(n−1))
            """CAST(floor(CAST(nh AS DOUBLE) * sqrt(
                 CAST(nh * sxx - sx * sx AS DOUBLE)
                 / CAST(nh * (nh - 1) AS DOUBLE))) AS BIGINT) AS wq""")
        val tot = strata.agg(sum("wq").cast("bigint").as("wtot"))
        val withBase = strata.crossJoin(broadcast(tot))
          .selectExpr("c_mktsegment", "nh", "wq",
            s"wq * $budget DIV wtot AS base",
            s"(wq * $budget) % wtot AS rem")
        val wRem = Window.orderBy(col("rem").desc, col("c_mktsegment"))
        val wAll = Window.partitionBy(lit(1))
        withBase
          .withColumn("leftover", lit(budget) - sum("base").over(wAll))
          .withColumn("rk", row_number().over(wRem).cast("long"))
          .selectExpr("c_mktsegment", "nh", "wq",
            "base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS alloc")
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH strata AS (
          SELECT c_mktsegment, count(*) AS nh,
                 CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS sx,
                 CAST(sum(CAST(floor(c_acctbal) AS BIGINT)
                   * CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS sxx
          FROM customer GROUP BY 1),
        wts AS (
          SELECT c_mktsegment, nh,
                 CAST(floor(CAST(nh AS DOUBLE) * sqrt(
                   CAST(nh * sxx - sx * sx AS DOUBLE)
                   / CAST(nh * (nh - 1) AS DOUBLE))) AS BIGINT) AS wq
          FROM strata),
        wtot AS (SELECT CAST(sum(wq) AS BIGINT) AS wtot FROM wts),
        based AS (
          SELECT c_mktsegment, nh, wq,
                 CAST(wq * 1000 // wtot AS BIGINT) AS base,
                 CAST((wq * 1000) % wtot AS BIGINT) AS rem
          FROM wts, wtot),
        ranked AS (
          SELECT *,
                 CAST(1000 - sum(base) OVER () AS BIGINT) AS leftover,
                 CAST(row_number() OVER (ORDER BY rem DESC, c_mktsegment)
                   AS BIGINT) AS rk
          FROM based)
        SELECT c_mktsegment, nh, wq,
               base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS alloc
        FROM ranked ORDER BY c_mktsegment""")),

    // --------------------------------------------------------------- q308
    QDef("q308_hits",
      (s, dir) => {
        // The r9 form materialized the weighted (c,sk) edge list (join +
        // groupBy) and re-joined it per pull step — 2.1s at sf0.1 and a
        // rotating gate flag. The w(c,s) weights never need to exist:
        // every pull is a sum over the RAW orders⋈lineitem rows (each
        // (c,s) row appears w(c,s) times), and a1(s) = Σ_c w(c,s) is just
        // the per-supplier lineitem row count — no join at all. One
        // cached join frame, two broadcast-lookup aggregations; the
        // supplier side is supplier-domain-bounded and the per-customer
        // h1 frame is |customers|-bounded — AQE broadcasts both here and
        // keeps shuffle joins if a 100 TB customer domain outgrows it.
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val a1 = li.groupBy(col("l_suppkey").as("sk"))
          .agg(count(lit(1)).cast("bigint").as("a1"))
        val rows = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("c"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("c"), col("l_suppkey").as("sk"))
          .cache()
        rows.count() // eager: read by both pull steps
        // h1(c) = Σ_s w(c,s)·a1(s) = Σ_{join rows of c} a1(sk)
        val h1 = rows.join(a1, "sk")
          .groupBy("c").agg(expr("CAST(sum(a1) AS BIGINT)").as("h1"))
        // a2(s) = Σ_c w(c,s)·h1(c) = Σ_{join rows of s} h1(c)
        val a2 = rows.join(h1, "c")
          .groupBy("sk").agg(expr("CAST(sum(h1) AS BIGINT)").as("a2"))
        a1.join(a2, "sk")
          .orderBy(col("a2").desc, col("sk"))
          .limit(20)
          .selectExpr("sk AS s_suppkey", "a1", "a2")
      },
      Some("""
        WITH edges AS (
          SELECT o_custkey AS c, l_suppkey AS sk, count(*) AS w
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2),
        a1 AS (SELECT sk, CAST(sum(w) AS BIGINT) AS a1 FROM edges GROUP BY 1),
        h1 AS (
          SELECT c, CAST(sum(w * a1) AS BIGINT) AS h1
          FROM edges JOIN a1 USING (sk) GROUP BY 1),
        a2 AS (
          SELECT sk, CAST(sum(w * h1) AS BIGINT) AS a2
          FROM edges JOIN h1 USING (c) GROUP BY 1)
        SELECT sk AS s_suppkey, a1, a2
        FROM a1 JOIN a2 USING (sk)
        ORDER BY a2 DESC, sk LIMIT 20""")),

    // --------------------------------------------------------------- q309
    QDef("q309_business_days",
      (s, dir) => {
        // g(d) = weekdays in [epoch, d): closed form, Monday-anchored.
        def g(d: String): String =
          s"(5 * (($d + 3) DIV 7) + LEAST(($d + 3) % 7, 5) - 3)"
        val lastShip = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(max(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000"))
            .as("ship_d"))
        t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_orderpriority",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS ord_d")
          .join(lastShip, col("o_orderkey") === col("l_orderkey"))
          .selectExpr("o_orderpriority",
            s"${g("ship_d + 1")} - ${g("ord_d")} AS busdays")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            min("busdays").cast("bigint").as("min_bd"),
            max("busdays").cast("bigint").as("max_bd"),
            // floor-quantized double (not integer DIV): busdays sums can go
            // negative on this synthetic data, where Spark DIV truncates
            // but DuckDB // floors.
            expr("""CAST(floor(CAST(sum(busdays) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT)""")
              .as("avg_bd_micro"))
          .orderBy("o_orderpriority")
      },
      Some {
        def g(d: String): String =
          s"(5 * (($d + 3) // 7) + LEAST(($d + 3) % 7, 5) - 3)"
        s"""
        WITH last_ship AS (
          SELECT l_orderkey,
                 max(epoch_ms(l_shipdate) // 86400000) AS ship_d
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT o_orderpriority,
                 ${g("ship_d + 1")} - ${g("epoch_ms(o_orderdate) // 86400000")}
                   AS busdays
          FROM orders JOIN last_ship ON o_orderkey = l_orderkey)
        SELECT o_orderpriority, count(*) AS n,
               CAST(min(busdays) AS BIGINT) AS min_bd,
               CAST(max(busdays) AS BIGINT) AS max_bd,
               CAST(floor(CAST(sum(busdays) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT) AS avg_bd_micro
        FROM j GROUP BY 1 ORDER BY 1"""
      }),

    // --------------------------------------------------------------- q310
    QDef("q310_gini",
      (s, dir) => {
        val revExpr =
          "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        val perCust = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem")
            .selectExpr("l_orderkey", s"$revExpr AS cents"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey").agg(sum("cents").cast("bigint").as("rev"))
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("rev"), col("o_custkey"))
        perCust
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("nn",
            count(lit(1)).over(Window.partitionBy("c_mktsegment")))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum("rev").cast("bigint").as("sum_cents"),
            expr("CAST(sum((2 * i - nn - 1) * rev) AS BIGINT)").as("gnum"))
          .selectExpr("c_mktsegment", "n", "sum_cents",
            """CAST(floor(CAST(gnum AS DOUBLE) / CAST(n AS DOUBLE)
               / CAST(sum_cents AS DOUBLE) * 1000000) AS BIGINT) AS gini_micro""")
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH per_cust AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1),
        seg AS (
          SELECT c_mktsegment, rev, o_custkey,
                 CAST(row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY rev, o_custkey) AS BIGINT) AS i,
                 count(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM per_cust JOIN customer ON o_custkey = c_custkey),
        agg AS (
          SELECT c_mktsegment, count(*) AS n,
                 CAST(sum(rev) AS BIGINT) AS sum_cents,
                 CAST(sum((2 * i - n - 1) * rev) AS BIGINT) AS gnum
          FROM seg GROUP BY 1)
        SELECT c_mktsegment, n, sum_cents,
               CAST(floor(CAST(gnum AS DOUBLE) / CAST(n AS DOUBLE)
                 / CAST(sum_cents AS DOUBLE) * 1000000) AS BIGINT) AS gini_micro
        FROM agg ORDER BY c_mktsegment""")
    )
  )
}
