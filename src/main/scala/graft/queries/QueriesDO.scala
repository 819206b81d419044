package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 112 — 3-D skylines, learning curves,
  * experiment design effects, routing heuristics:
  *
  *  - q467: 3-D skyline (price↓, quantity↑, discount↑) — the bounded
  *    third dimension (11 discount levels) turns 3-D domination into 11
  *    layered 2-D frontier checks: each DISTINCT point replicates to
  *    the levels it participates in (≤11× fan-out), one running-max
  *    window per level, strictness via multiplicity-aware tie rules.
  *    Never a pairwise product — q147's skyline lifted one dimension.
  *  - q468: learning curve for a nearest-centroid classifier — label
  *    centroids from 20/40/80% hash-train fractions (dimension-parallel
  *    exact decimal sums), held-out top-1 accuracy per fraction: the
  *    "is more data still helping" harness (q409/q143's evaluation
  *    shape, sweeping the train size).
  *  - q469: cluster-randomization design effect — treatment assigned at
  *    the NATION level vs the user level: intra-cluster correlation from
  *    exact ANOVA sum-of-squares components (one fixed-order division),
  *    DEFF = 1 + (m̄−1)·ICC and the effective-sample-size cost of
  *    cluster randomization. The experiment-design economics beside
  *    q371's power planner.
  *  - q470: Clarke–Wright savings (first sweep) — 20 synthetic AOI
  *    centroids around the depot at the lattice origin-of-mass; savings
  *    s_ij = d_i0 + d_0j − d_ij on floor(√·) integer distances, top-10
  *    route merges. The route-planning shape for survey sweeps
  *    (bounded stop set per region at any scale).
  *
  * Reference analog: multi-criteria listing shortlists, corpus-size
  * planning, AOI-level policy rollouts, scraper route planning.
  */
object QueriesDO extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q467
    QDef("q467_skyline3d",
      (s, dir) => {
        val pts = t(s, dir, "lineitem")
          .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p",
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dd")
          // graceful null degrade (NullInputSpec contract): a nulled
          // measure drops its point, exactly as the r8 plan's null-false
          // join predicates did — and the driver census collect below
          // reads primitives, which must never see null
          .where(col("p").isNotNull && col("q").isNotNull && col("dd").isNotNull)
          .groupBy("p", "q", "dd").agg(count(lit(1)).cast("long").as("m"))
        pts.cache()
        // A point a is dominated iff ∃b: b.p <= a.p, b.q >= a.q,
        // b.dd >= a.dd, strict somewhere. The (q, dd) domain is BOUNDED BY
        // CONSTRUCTION (l_quantity 1..50 × discount 0..10 cents ≤ 550
        // cells at any data scale), so the whole dominance test collapses
        // to a driver-side 2-D suffix-min table over minp(q, dd):
        //   T1(q,dd) = min p among b.q >= q, b.dd >= dd
        //   dominated ⇔ T1(a.q,a.dd) < a.p                (strictly cheaper)
        //             ∨ min(T1(a.q+1,a.dd), T1(a.q,a.dd+1)) <= a.p
        //               (equal price, strictly better q or dd)
        // replacing the r8 ×|levels| replicate join, the |levels|-partition
        // window, and two p-keyed self-joins (3.8 s → one census agg +
        // a broadcast map lookup). The census collect fuses with cache
        // materialization (Components.scala pattern).
        val cells = pts.groupBy("q", "dd").agg(min("p").as("minp"))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        val qs = cells.map(_._1._1).distinct.sorted.reverse
        val ds = cells.map(_._1._2).distinct.sorted.reverse
        val minp = cells.toMap
        val inf = Long.MaxValue
        val t1 = scala.collection.mutable.Map.empty[(Long, Long), Long]
        for (qv <- qs; dv <- ds) {
          // marginal grid point may hold no census cell → inf sentinel
          val above = for {
            q2 <- qs if q2 >= qv; d2 <- ds if d2 >= dv
            v <- minp.get((q2, d2))
          } yield v
          t1((qv, dv)) = above.foldLeft(inf)(math.min)
        }
        def t1At(qv: Long, dv: Long): Long = // suffix query off-grid: next cells up
          (for { q2 <- qs if q2 >= qv; d2 <- ds if d2 >= dv }
            yield t1((q2, d2))).foldLeft(inf)(math.min)
        val domEq = cells.map { case ((qv, dv), _) =>
          ((qv, dv), math.min(t1At(qv + 1, dv), t1At(qv, dv + 1)))
        }.toMap
        val t1Lit = typedLit(t1.map { case ((qv, dv), v) => (qv * 64 + dv, v) }.toMap)
        val t2Lit = typedLit(domEq.map { case ((qv, dv), v) => (qv * 64 + dv, v) })
        val sky = pts
          .withColumn("key", col("q") * 64 + col("dd"))
          .where(!(element_at(t1Lit, col("key")) < col("p") ||
            element_at(t2Lit, col("key")) <= col("p")))
          .select("p", "q", "dd", "m")
        sky.agg(count(lit(1)).cast("long").as("sky_points"),
          sum("m").cast("bigint").as("sky_rows"),
          min("p").cast("long").as("min_price"),
          max("q").cast("long").as("max_qty"),
          max("dd").cast("long").as("max_disc"))
          .selectExpr("sky_points", "sky_rows", "min_price", "max_qty",
            "max_disc")
      },
      Some("""
        WITH pts AS MATERIALIZED (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
                 CAST(l_quantity AS BIGINT) AS q,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dd,
                 count(*) AS m
          FROM lineitem GROUP BY 1, 2, 3),
        lvl AS (SELECT DISTINCT dd AS l FROM pts),
        rep AS (
          SELECT pts.*, lvl.l FROM pts JOIN lvl ON pts.dd >= lvl.l),
        sc AS (
          SELECT p, q, dd, m, l,
                 max(q) OVER (PARTITION BY l ORDER BY p
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS maxq_prev
          FROM rep),
        same_pq AS (
          SELECT DISTINCT a.p, a.q, a.dd FROM pts a JOIN pts b
            ON a.p = b.p AND a.q = b.q AND b.dd > a.dd),
        same_p AS (
          SELECT DISTINCT a.p, a.q, a.dd FROM pts a JOIN pts b
            ON a.p = b.p AND b.q > a.q AND b.dd >= a.dd),
        flagged AS (
          SELECT sc.p, sc.q, sc.dd, sc.m,
                 ((maxq_prev IS NOT NULL AND maxq_prev >= sc.q)
                  OR same_pq.p IS NOT NULL
                  OR same_p.p IS NOT NULL) AS dominated
          FROM sc
          LEFT JOIN same_pq ON sc.p = same_pq.p AND sc.q = same_pq.q
                           AND sc.dd = same_pq.dd
          LEFT JOIN same_p ON sc.p = same_p.p AND sc.q = same_p.q
                          AND sc.dd = same_p.dd
          WHERE sc.l = sc.dd)
        SELECT CAST(count(*) AS BIGINT) AS sky_points,
               CAST(sum(m) AS BIGINT) AS sky_rows,
               CAST(min(p) AS BIGINT) AS min_price,
               CAST(max(q) AS BIGINT) AS max_qty,
               CAST(max(dd) AS BIGINT) AS max_disc
        FROM flagged WHERE NOT dominated""")),

    // --------------------------------------------------------------- q468
    QDef("q468_learning_curve",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .withColumn("h", pmod(PortableHash.md5Long(col("vec_id"),
            salt = "lc~"), lit(100L)))
        e.cache(); e.count()
        val test = e.where(col("h") >= 90)
        def acc(frac: Int) = {
          val train = e.where(col("h") < frac)
          val cent = train
            .select(col("label"), posexplode(col("embedding"))
              .as(Seq("dim", "x")))
            .groupBy("label", "dim")
            .agg(sum(col("x").cast("double")
              .cast(org.apache.spark.sql.types.DataTypes
                .createDecimalType(28, 9))).cast("double").as("sx"))
            .groupBy("label")
            .agg(collect_list(struct(col("dim"), col("sx"))).as("cl"))
            .selectExpr("label AS clabel",
              "transform(sort_array(cl), s -> CAST(s.sx AS FLOAT)) AS cvec")
            .withColumn("cnrm", VectorOps.norm("cvec"))
          val scored = test
            .withColumn("enrm", VectorOps.norm("embedding"))
            .crossJoin(broadcast(cent))
            .withColumn("cos6", VectorOps.cosine6Out("embedding", "cvec",
              "enrm", "cnrm"))
          val best = scored
            .withColumn("rk", row_number().over(Window
              .partitionBy("vec_id")
              .orderBy(col("cos6").desc, col("clabel"))))
            .where(col("rk") === 1)
          best.agg(count(lit(1)).cast("long").as("n_test"),
            sum(when(col("clabel") === col("label"), 1L).otherwise(0L))
              .cast("bigint").as("hits"))
            .selectExpr(s"CAST($frac AS BIGINT) AS train_pct", "n_test",
              "hits", "hits * 10000 DIV n_test AS acc_bp")
        }
        acc(20).union(acc(40)).union(acc(80)).orderBy("train_pct")
      },
      Some {
        def accSql(frac: Int): String = s"""
          SELECT CAST($frac AS BIGINT) AS train_pct,
                 CAST(count(*) AS BIGINT) AS n_test,
                 CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)
                   AS BIGINT) AS hits,
                 CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)
                   * 10000 // count(*) AS BIGINT) AS acc_bp
          FROM (
            SELECT vec_id, label, clabel,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY cos6 DESC, clabel) AS rk
            FROM (
              SELECT t.vec_id, t.label, c.clabel,
                     ${VectorOps.cosine6OutSql("t.embedding", "c.cvec",
                       "t.enrm", "c.cnrm")} AS cos6
              FROM test t CROSS JOIN (
                SELECT clabel, cvec,
                       ${VectorOps.normSql("cvec")} AS cnrm
                FROM (
                  SELECT label AS clabel,
                         list(CAST(sx AS FLOAT) ORDER BY dim) AS cvec
                  FROM (
                    SELECT label, dim,
                           CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx
                    FROM (
                      SELECT label, i - 1 AS dim,
                             CAST(embedding[i] AS DOUBLE) AS x
                      FROM e, unnest(range(1, len(embedding) + 1)) AS t(i)
                      WHERE h < $frac)
                    GROUP BY 1, 2)
                  GROUP BY 1)) c))
          WHERE rk = 1"""
        s"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding, label,
                 ${PortableHash.md5LongSql("vec_id", "lc~")} % 100 AS h
          FROM embeddings),
        test AS MATERIALIZED (
          SELECT vec_id, embedding, label,
                 ${VectorOps.normSql("embedding")} AS enrm
          FROM e WHERE h >= 90)
        ${accSql(20)}
        UNION ALL ${accSql(40)}
        UNION ALL ${accSql(80)}
        ORDER BY train_pct"""
      }),

    // --------------------------------------------------------------- q469
    QDef("q469_design_effect",
      (s, dir) => {
        val u = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey").as("cust"),
            col("c_nationkey").as("nat"))
          .agg(count(lit(1)).cast("long").as("y"))
        val k = u.select("nat").distinct().count()
        val stats = u.agg(
          count(lit(1)).cast("bigint").as("n"),
          sum("y").cast("bigint").as("s1"),
          sum(col("y") * col("y")).cast("bigint").as("s2"))
        val within = u.groupBy("nat").agg(
          count(lit(1)).cast("bigint").as("m"),
          sum("y").cast("bigint").as("cs1"))
          .selectExpr("nat", "m", "cs1",
            "cs1 * cs1 * 1000 DIV m AS grp_milli")
        val comb = within.agg(
          count(lit(1)).cast("long").as("clusters"),
          sum("m").cast("bigint").as("n2"),
          sum("grp_milli").cast("bigint").as("ssb_milli_raw"))
          .crossJoin(broadcast(stats))
          .selectExpr("clusters", "n",
            "CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS cf",
            "CAST(ssb_milli_raw AS DOUBLE) / 1000.0 AS ssb_part",
            "CAST(s2 AS DOUBLE) AS ss_tot_raw")
          .selectExpr("clusters", "n",
            "ssb_part - cf AS ssb", "ss_tot_raw - cf AS sst")
          .selectExpr("clusters", "n", "ssb", "sst", "sst - ssb AS ssw")
        comb.where(col("clusters") > 1 && col("n") > col("clusters"))
          .selectExpr("clusters", "n",
          "CAST(floor(ssb * 1000) AS BIGINT) AS ssb_milli",
          "CAST(floor(ssw * 1000) AS BIGINT) AS ssw_milli",
          // ICC via ANOVA: (MSB - MSW) / (MSB + (m-1) MSW), m = n/clusters
          "CAST(floor((ssb / CAST(clusters - 1 AS DOUBLE) - (sst - ssb) / CAST(n - clusters AS DOUBLE)) / (ssb / CAST(clusters - 1 AS DOUBLE) + (CAST(n AS DOUBLE) / CAST(clusters AS DOUBLE) - 1.0) * ((sst - ssb) / CAST(n - clusters AS DOUBLE))) * 1e6) AS BIGINT) AS icc_micro")
          .selectExpr("clusters", "n", "ssb_milli", "ssw_milli", "icc_micro",
            "1000000 + ((n DIV clusters) - 1) * icc_micro AS deff_micro",
            "CASE WHEN 1000000 + ((n DIV clusters) - 1) * icc_micro > 0 THEN n * 1000000 DIV (1000000 + ((n DIV clusters) - 1) * icc_micro) ELSE -1 END AS eff_n")
      },
      Some("""
        WITH u AS (
          SELECT o_custkey AS cust, c_nationkey AS nat,
                 CAST(count(*) AS BIGINT) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        stats AS (
          SELECT count(*) AS n, sum(y) AS s1, sum(y * y) AS s2 FROM u),
        within AS (
          SELECT nat, count(*) AS m, sum(y) AS cs1,
                 sum(y) * sum(y) * 1000 // count(*) AS grp_milli
          FROM u GROUP BY 1),
        comb AS (
          SELECT count(*) AS clusters, sum(m) AS n2,
                 CAST(sum(grp_milli) AS DOUBLE) / 1000.0 AS ssb_part
          FROM within),
        xx AS (
          SELECT clusters, n,
                 ssb_part - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ssb,
                 CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS sst
          FROM comb, stats),
        icc AS (
          SELECT clusters, n,
                 CAST(floor(ssb * 1000) AS BIGINT) AS ssb_milli,
                 CAST(floor((sst - ssb) * 1000) AS BIGINT) AS ssw_milli,
                 CAST(floor((ssb / CAST(clusters - 1 AS DOUBLE)
                     - (sst - ssb) / CAST(n - clusters AS DOUBLE))
                   / (ssb / CAST(clusters - 1 AS DOUBLE)
                     + (CAST(n AS DOUBLE) / CAST(clusters AS DOUBLE) - 1.0)
                       * ((sst - ssb) / CAST(n - clusters AS DOUBLE))) * 1e6)
                   AS BIGINT) AS icc_micro
          FROM xx WHERE clusters > 1 AND n > clusters)
        SELECT CAST(clusters AS BIGINT) AS clusters, CAST(n AS BIGINT) AS n,
               ssb_milli, ssw_milli, icc_micro,
               CAST(1000000 + ((n // clusters) - 1) * icc_micro AS BIGINT)
                 AS deff_micro,
               CAST(CASE WHEN 1000000 + ((n // clusters) - 1) * icc_micro > 0
                 THEN n * 1000000 // (1000000 + ((n // clusters) - 1)
                   * icc_micro) ELSE -1 END AS BIGINT) AS eff_n
        FROM icc""")),

    // --------------------------------------------------------------- q470
    QDef("q470_savings_merge",
      (s, dir) => {
        val stops = t(s, dir, "nation")
          .selectExpr("CAST(n_nationkey AS BIGINT) AS k")
          .where(col("k") < 20)
          .selectExpr("k", "(k * 977) % 4000 - 2000 AS x",
            "(k * 661) % 3000 - 1500 AS y")
        stops.cache(); stops.count()
        def d(x1: String, y1: String, x2: String, y2: String) =
          s"CAST(floor(sqrt(CAST(($x1 - $x2) * ($x1 - $x2) + ($y1 - $y2) * ($y1 - $y2) AS DOUBLE))) AS BIGINT)"
        val withDepot = stops.selectExpr("k", "x", "y",
          d("x", "y", "0", "0") + " AS d0")
        val savings = withDepot.as("a").join(withDepot.as("b"),
            col("a.k") < col("b.k"))
          .selectExpr("a.k AS i", "b.k AS j",
            "a.d0 AS di0", "b.d0 AS dj0",
            d("a.x", "a.y", "b.x", "b.y") + " AS dij")
          .selectExpr("i", "j", "di0", "dj0", "dij",
            "di0 + dj0 - dij AS saving")
        savings.orderBy(col("saving").desc, col("i"), col("j")).limit(10)
          .select("i", "j", "di0", "dj0", "dij", "saving")
      },
      Some("""
        WITH stops AS (
          SELECT CAST(n_nationkey AS BIGINT) AS k,
                 (CAST(n_nationkey AS BIGINT) * 977) % 4000 - 2000 AS x,
                 (CAST(n_nationkey AS BIGINT) * 661) % 3000 - 1500 AS y
          FROM nation WHERE n_nationkey < 20),
        wd AS (
          SELECT k, x, y,
                 CAST(floor(sqrt(CAST(x * x + y * y AS DOUBLE))) AS BIGINT)
                   AS d0
          FROM stops),
        sv AS (
          SELECT a.k AS i, b.k AS j, a.d0 AS di0, b.d0 AS dj0,
                 CAST(floor(sqrt(CAST((a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS DOUBLE))) AS BIGINT) AS dij
          FROM wd a JOIN wd b ON a.k < b.k)
        SELECT i, j, di0, dj0, dij,
               CAST(di0 + dj0 - dij AS BIGINT) AS saving
        FROM sv ORDER BY saving DESC, i, j LIMIT 10"""))
  )
}
