package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 131 — portfolio optimization,
  * embedding-space diagnostics, optimal assignment, dynamic causal
  * readout:
  *
  *  - q538: minimum-variance portfolio over the 3 lexicographically
  *    first regions' daily revenue series: 3×3 sample covariance from
  *    exact component sums, closed-form weights w ∝ Σ⁻¹1 computed via
  *    ADJUGATE ROW SUMS (the determinant cancels in the normalization,
  *    so no matrix inverse is ever formed), min-variance vs
  *    equal-weight variance reduction bp.
  *  - q539: effective rank (participation ratio) of the embedding
  *    second-moment matrix: PR = tr(C)²/tr(C²) with C_dd' = Σᵥ v_d v_d'
  *    — both traces from ONE aggregation over per-vector dim pairs
  *    (4096 terms per row, linear in corpus size), milli-quantized
  *    vectors so every sum is an exact integer. The anisotropy /
  *    dimensional-collapse audit of embedding spaces.
  *  - q540: optimal 5×5 assignment (priorities → regions) by full
  *    permutation enumeration IN THE ENGINE: 5 inequality-joined
  *    copies of the region dim (120 perms) joined to the
  *    (priority, region) mean-latency cost matrix, struct-min argmin.
  *  - q541: difference-in-differences EVENT STUDY: 30-day relative
  *    periods around the data midpoint, per-period treat/control order
  *    rates per 1000 customers, coefficients re-based against the
  *    pre-period mean difference, pre-trend slope from exact integer
  *    component sums. q239's static DiD upgraded to the dynamic form
  *    with a parallel-trends diagnostic.
  *
  * Scale shapes: q538/q541 aggregate facts to bounded (day / period ×
  * group) domains before any algebra; q539 is one hash aggregation
  * (4096 counters); q540's quadratic-ish perm join is 120 rows.
  */
object QueriesEH extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q538
    QDef("q538_min_var_portfolio",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .join(t(s, dir, "customer"),
            expr("o_custkey = c_custkey"))
          .join(broadcast(t(s, dir, "nation")), expr("c_nationkey = n_nationkey"))
          .join(broadcast(t(s, dir, "region")), expr("n_regionkey = r_regionkey"))
          .where(expr("r_name IN ('AFRICA', 'AMERICA', 'ASIA')"))
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "r_name",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS rev")
          .groupBy("day").agg(
            sum(when(col("r_name") === "AFRICA", col("rev")).otherwise(0L))
              .cast("long").as("a"),
            sum(when(col("r_name") === "AMERICA", col("rev")).otherwise(0L))
              .cast("long").as("b"),
            sum(when(col("r_name") === "ASIA", col("rev")).otherwise(0L))
              .cast("long").as("c"))
        val sums = daily.agg(count(lit(1)).as("n"),
          sum("a").cast("long").as("sa"), sum("b").cast("long").as("sb"),
          sum("c").cast("long").as("sc"),
          sum(expr("a*a")).cast("long").as("saa"),
          sum(expr("b*b")).cast("long").as("sbb"),
          sum(expr("c*c")).cast("long").as("scc"),
          sum(expr("a*b")).cast("long").as("sab"),
          sum(expr("a*c")).cast("long").as("sac"),
          sum(expr("b*c")).cast("long").as("sbc"))
          .where(expr("n > 1"))
        sums.selectExpr("n",
            "(CAST(saa AS DOUBLE) * n - CAST(sa AS DOUBLE) * sa) / n / (n - 1) AS c11",
            "(CAST(sbb AS DOUBLE) * n - CAST(sb AS DOUBLE) * sb) / n / (n - 1) AS c22",
            "(CAST(scc AS DOUBLE) * n - CAST(sc AS DOUBLE) * sc) / n / (n - 1) AS c33",
            "(CAST(sab AS DOUBLE) * n - CAST(sa AS DOUBLE) * sb) / n / (n - 1) AS c12",
            "(CAST(sac AS DOUBLE) * n - CAST(sa AS DOUBLE) * sc) / n / (n - 1) AS c13",
            "(CAST(sbc AS DOUBLE) * n - CAST(sb AS DOUBLE) * sc) / n / (n - 1) AS c23")
          .selectExpr("n", "c11", "c22", "c33", "c12", "c13", "c23",
            // adjugate row sums of the symmetric covariance: det cancels
            "(c22*c33 - c23*c23) + (c13*c23 - c12*c33) + (c12*c23 - c13*c22) AS u1",
            "(c13*c23 - c12*c33) + (c11*c33 - c13*c13) + (c12*c13 - c11*c23) AS u2",
            "(c12*c23 - c13*c22) + (c12*c13 - c11*c23) + (c11*c22 - c12*c12) AS u3")
          .where(expr("u1 + u2 + u3 <> 0"))
          .selectExpr("n",
            "CAST(floor(u1 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w1_micro",
            "CAST(floor(u2 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w2_micro",
            "CAST(floor(u3 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w3_micro",
            """CAST(floor((c11 + c22 + c33 + 2*c12 + 2*c13 + 2*c23) / 9
                 / ((u1/(u1+u2+u3))*(u1/(u1+u2+u3))*c11
                  + (u2/(u1+u2+u3))*(u2/(u1+u2+u3))*c22
                  + (u3/(u1+u2+u3))*(u3/(u1+u2+u3))*c33
                  + 2*(u1/(u1+u2+u3))*(u2/(u1+u2+u3))*c12
                  + 2*(u1/(u1+u2+u3))*(u3/(u1+u2+u3))*c13
                  + 2*(u2/(u1+u2+u3))*(u3/(u1+u2+u3))*c23) * 1000)
               AS BIGINT) AS var_ratio_milli""")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(sum(CASE WHEN r.r_name = 'AFRICA' THEN
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) // 100
                   ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN r.r_name = 'AMERICA' THEN
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) // 100
                   ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN r.r_name = 'ASIA' THEN
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) // 100
                   ELSE 0 END) AS BIGINT) AS c
          FROM orders o
          JOIN customer cu ON o.o_custkey = cu.c_custkey
          JOIN nation n ON cu.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name IN ('AFRICA', 'AMERICA', 'ASIA')
            AND o.o_totalprice IS NOT NULL
          GROUP BY 1),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(a*a) AS BIGINT) AS saa,
                 CAST(sum(b*b) AS BIGINT) AS sbb,
                 CAST(sum(c*c) AS BIGINT) AS scc,
                 CAST(sum(a*b) AS BIGINT) AS sab,
                 CAST(sum(a*c) AS BIGINT) AS sac,
                 CAST(sum(b*c) AS BIGINT) AS sbc
          FROM daily),
        cov AS (
          SELECT n,
            (CAST(saa AS DOUBLE) * n - CAST(sa AS DOUBLE) * sa) / n / (n - 1) AS c11,
            (CAST(sbb AS DOUBLE) * n - CAST(sb AS DOUBLE) * sb) / n / (n - 1) AS c22,
            (CAST(scc AS DOUBLE) * n - CAST(sc AS DOUBLE) * sc) / n / (n - 1) AS c33,
            (CAST(sab AS DOUBLE) * n - CAST(sa AS DOUBLE) * sb) / n / (n - 1) AS c12,
            (CAST(sac AS DOUBLE) * n - CAST(sa AS DOUBLE) * sc) / n / (n - 1) AS c13,
            (CAST(sbc AS DOUBLE) * n - CAST(sb AS DOUBLE) * sc) / n / (n - 1) AS c23
          FROM sums WHERE n > 1),
        adj AS (
          SELECT n, c11, c22, c33, c12, c13, c23,
            (c22*c33 - c23*c23) + (c13*c23 - c12*c33) + (c12*c23 - c13*c22) AS u1,
            (c13*c23 - c12*c33) + (c11*c33 - c13*c13) + (c12*c13 - c11*c23) AS u2,
            (c12*c23 - c13*c22) + (c12*c13 - c11*c23) + (c11*c22 - c12*c12) AS u3
          FROM cov)
        SELECT n,
               CAST(floor(u1 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w1_micro,
               CAST(floor(u2 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w2_micro,
               CAST(floor(u3 / (u1 + u2 + u3) * 1e6) AS BIGINT) AS w3_micro,
               CAST(floor((c11 + c22 + c33 + 2*c12 + 2*c13 + 2*c23) / 9
                 / ((u1/(u1+u2+u3))*(u1/(u1+u2+u3))*c11
                  + (u2/(u1+u2+u3))*(u2/(u1+u2+u3))*c22
                  + (u3/(u1+u2+u3))*(u3/(u1+u2+u3))*c33
                  + 2*(u1/(u1+u2+u3))*(u2/(u1+u2+u3))*c12
                  + 2*(u1/(u1+u2+u3))*(u3/(u1+u2+u3))*c13
                  + 2*(u2/(u1+u2+u3))*(u3/(u1+u2+u3))*c23) * 1000)
                 AS BIGINT) AS var_ratio_milli
        FROM adj WHERE u1 + u2 + u3 <> 0""")),

    // --------------------------------------------------------------- q539
    QDef("q539_effective_rank",
      (s, dir) => {
        val v = t(s, dir, "embeddings")
          .where(col("embedding").isNotNull)
          .selectExpr("vec_id",
            "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS vm")
        // one aggregation: per-row Σ_d vd² feeds tr(C); per-row dim-pair
        // products feed the 4096 C entries whose squares give tr(C²)
        // explode POSITIONS (cheap int array), compute products after —
        // never explode an expensive struct array (generator inlining)
        val pairs = v
          .select(col("vm"), explode(expr("sequence(0, 4095)")).as("k"))
          .selectExpr("k DIV 64 AS d1", "k % 64 AS d2",
            "vm[k DIV 64] * vm[k % 64] AS p")
          .groupBy("d1", "d2").agg(sum("p").cast("long").as("cdd"))
        val tr = pairs.where(expr("d1 = d2"))
          .agg(sum("cdd").cast("long").as("trc"))
        val tr2 = pairs.agg(
          sum(expr("CAST(cdd AS DECIMAL(38,0)) * cdd")).as("trc2d"),
          count(lit(1)).as("n_cells"))
        tr.crossJoin(broadcast(tr2))
          .where(expr("trc > 0 AND trc2d > 0"))
          .selectExpr("n_cells", "trc",
            """CAST(floor(CAST(trc AS DOUBLE) * trc / CAST(trc2d AS DOUBLE)
                 * 1000) AS BIGINT) AS eff_rank_milli""")
      },
      Some("""
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(x * 1000) AS BIGINT)) AS vm
          FROM embeddings WHERE embedding IS NOT NULL),
        pairs AS (
          SELECT d1.d AS d1, d2.d AS d2,
                 CAST(sum(v.vm[d1.d + 1] * v.vm[d2.d + 1]) AS BIGINT) AS cdd
          FROM v, unnest(range(0, 64)) d1(d), unnest(range(0, 64)) d2(d)
          GROUP BY 1, 2),
        tr AS (SELECT CAST(sum(cdd) AS BIGINT) AS trc
               FROM pairs WHERE d1 = d2),
        tr2 AS (SELECT sum(CAST(cdd AS HUGEINT) * cdd) AS trc2d,
                       CAST(count(*) AS BIGINT) AS n_cells
                FROM pairs)
        SELECT n_cells, trc,
               CAST(floor(CAST(trc AS DOUBLE) * trc / CAST(trc2d AS DOUBLE)
                 * 1000) AS BIGINT) AS eff_rank_milli
        FROM tr, tr2 WHERE trc > 0 AND trc2d > 0""")),

    // --------------------------------------------------------------- q540
    QDef("q540_assignment",
      (s, dir) => {
        val cost = t(s, dir, "orders")
          .join(t(s, dir, "customer"), expr("o_custkey = c_custkey"))
          .join(broadcast(t(s, dir, "nation")), expr("c_nationkey = n_nationkey"))
          .join(broadcast(t(s, dir, "region")), expr("n_regionkey = r_regionkey"))
          .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS pri",
            "r_name",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 % 30 AS lat")
          .groupBy("pri", "r_name")
          .agg(expr("CAST(sum(lat) AS BIGINT) * 1000 DIV count(*) AS c"))
        cost.cache(); cost.count()
        val regions = cost.select(col("r_name")).distinct()
        def rn(i: Int) = regions.selectExpr(s"r_name AS r$i")
        val perms = rn(1)
          .crossJoin(broadcast(rn(2))).where(expr("r2 <> r1"))
          .crossJoin(broadcast(rn(3))).where(expr("r3 NOT IN (r1, r2)"))
          .crossJoin(broadcast(rn(4))).where(expr("r4 NOT IN (r1, r2, r3)"))
          .crossJoin(broadcast(rn(5))).where(expr("r5 NOT IN (r1, r2, r3, r4)"))
        def cj(i: Int) = broadcast(cost
          .where(col("pri") === i)
          .selectExpr(s"r_name AS r$i", s"c AS c$i"))
        val scored = perms
          .join(cj(1), s"r1").join(cj(2), "r2").join(cj(3), "r3")
          .join(cj(4), "r4").join(cj(5), "r5")
          .withColumn("total", expr("c1 + c2 + c3 + c4 + c5"))
        val best = scored.agg(min(struct(col("total"), col("r1"), col("r2"),
          col("r3"), col("r4"), col("r5"))).as("st"))
        best.selectExpr("st.total AS opt_total", "st.r1 AS pri1_region",
            "st.r2 AS pri2_region", "st.r3 AS pri3_region",
            "st.r4 AS pri4_region", "st.r5 AS pri5_region")
      },
      Some("""
        WITH cost AS (
          SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS pri,
                 r.r_name,
                 CAST(sum(epoch_ms(o.o_orderdate) // 86400000 % 30)
                   AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS c
          FROM orders o
          JOIN customer cu ON o.o_custkey = cu.c_custkey
          JOIN nation n ON cu.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY 1, 2),
        regions AS (SELECT DISTINCT r_name FROM cost),
        perms AS (
          SELECT a.r_name AS r1, b.r_name AS r2, c.r_name AS r3,
                 d.r_name AS r4, e.r_name AS r5
          FROM regions a, regions b, regions c, regions d, regions e
          WHERE b.r_name <> a.r_name
            AND c.r_name NOT IN (a.r_name, b.r_name)
            AND d.r_name NOT IN (a.r_name, b.r_name, c.r_name)
            AND e.r_name NOT IN (a.r_name, b.r_name, c.r_name, d.r_name)),
        scored AS (
          SELECT p.r1, p.r2, p.r3, p.r4, p.r5,
                 c1.c + c2.c + c3.c + c4.c + c5.c AS total
          FROM perms p
          JOIN cost c1 ON c1.pri = 1 AND c1.r_name = p.r1
          JOIN cost c2 ON c2.pri = 2 AND c2.r_name = p.r2
          JOIN cost c3 ON c3.pri = 3 AND c3.r_name = p.r3
          JOIN cost c4 ON c4.pri = 4 AND c4.r_name = p.r4
          JOIN cost c5 ON c5.pri = 5 AND c5.r_name = p.r5),
        best AS (SELECT * FROM scored
                 ORDER BY total, r1, r2, r3, r4, r5 LIMIT 1)
        SELECT CAST(total AS BIGINT) AS opt_total, r1 AS pri1_region,
               r2 AS pri2_region, r3 AS pri3_region, r4 AS pri4_region,
               r5 AS pri5_region
        FROM best""")),

    // --------------------------------------------------------------- q541
    QDef("q541_event_study",
      (s, dir) => {
        val bounds = t(s, dir, "orders").agg(
          ((min(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")) +
            max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))"))) / 2)
            .cast("long").as("mid"))
        val nCust = t(s, dir, "customer").agg(
          sum(when(expr("c_custkey % 2 = 1"), 1L).otherwise(0L)).as("nt"),
          sum(when(expr("c_custkey % 2 = 0"), 1L).otherwise(0L)).as("nc"))
        val periods = t(s, dir, "orders")
          .crossJoin(broadcast(bounds))
          .selectExpr(
            """CAST(floor((unix_millis(CAST(o_orderdate AS TIMESTAMP)) - mid)
                 / 2592000000.0) AS BIGINT) AS m""",
            "o_custkey % 2 AS g")
          .where(expr("m BETWEEN -6 AND 5"))
          .groupBy("m").agg(
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("ot"),
            sum(when(col("g") === 0, 1L).otherwise(0L)).as("oc"))
          .crossJoin(broadcast(nCust))
          .selectExpr("m", "ot", "oc",
            "ot * 1000 DIV nt - oc * 1000 DIV nc AS diff_pm")
        periods.cache(); periods.count()
        val pre = periods.where(expr("m < 0")).agg(
          count(lit(1)).as("np"),
          sum("diff_pm").cast("long").as("sd"),
          sum(expr("m * diff_pm")).cast("long").as("smd"),
          sum("m").cast("long").as("sm"),
          sum(expr("m * m")).cast("long").as("smm"))
          .where(expr("np > 1 AND np * smm > sm * sm"))
          .selectExpr("sd", "np",
            """CAST(floor(CAST(np * smd - sm * sd AS DOUBLE)
                 / CAST(np * smm - sm * sm AS DOUBLE) * 1000) AS BIGINT)
               AS pretrend_slope_milli""")
        periods.crossJoin(broadcast(pre))
          .selectExpr("m", "ot", "oc", "diff_pm",
            "diff_pm - sd DIV np AS coef_pm", "pretrend_slope_milli")
          .orderBy("m")
      },
      Some("""
        WITH bounds AS (
          SELECT CAST((min(epoch_ms(o_orderdate)) +
                       max(epoch_ms(o_orderdate))) // 2 AS BIGINT) AS mid
          FROM orders),
        ncust AS (
          SELECT CAST(sum(CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS nt,
                 CAST(sum(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS nc
          FROM customer),
        periods AS (
          SELECT m, ot, oc, ot * 1000 // nt - oc * 1000 // nc AS diff_pm
          FROM (
            SELECT CAST(floor((epoch_ms(o_orderdate) - mid) / 2592000000.0)
                     AS BIGINT) AS m,
                   CAST(sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS ot,
                   CAST(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS oc
            FROM orders, bounds
            WHERE CAST(floor((epoch_ms(o_orderdate) - mid) / 2592000000.0)
                    AS BIGINT) BETWEEN -6 AND 5
            GROUP BY 1), ncust),
        pre AS (
          SELECT sd, np,
                 CAST(floor(CAST(np * smd - sm * sd AS DOUBLE)
                   / CAST(np * smm - sm * sm AS DOUBLE) * 1000) AS BIGINT)
                   AS pretrend_slope_milli
          FROM (
            SELECT CAST(count(*) AS BIGINT) AS np,
                   CAST(sum(diff_pm) AS BIGINT) AS sd,
                   CAST(sum(m * diff_pm) AS BIGINT) AS smd,
                   CAST(sum(m) AS BIGINT) AS sm,
                   CAST(sum(m * m) AS BIGINT) AS smm
            FROM periods WHERE m < 0)
          WHERE np > 1 AND np * smm > sm * sm)
        SELECT p.m, p.ot, p.oc, p.diff_pm,
               p.diff_pm - pre.sd // pre.np AS coef_pm,
               pre.pretrend_slope_milli
        FROM periods p, pre
        ORDER BY p.m"""))
  )
}
