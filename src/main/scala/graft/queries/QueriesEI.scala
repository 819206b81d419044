package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 132 — empirical-Bayes shrinkage,
  * iterative GLM fitting, HAC standard errors, rich-club structure:
  *
  *  - q542: beta-binomial empirical-Bayes shrinkage of per-part return
  *    rates: method-of-moments (α, β) from the group-rate mean/variance
  *    (exact ppm integers → fixed-order doubles), posterior mean
  *    (x+α)/(n+α+β) per group, shrinkage toward the prior largest for
  *    small groups (proven in-spec). q220 target encoding with the
  *    prior LEARNED instead of fixed.
  *  - q543: logistic regression of order-status F on the priority dose
  *    by THREE unrolled Newton–Raphson steps over the 5 aggregated
  *    dose cells (2×2 Hessian solved in closed form, one literal IEEE
  *    op order; exp() only ever evaluates on 5 bounded cells). The
  *    GLM companion to q527's trend test.
  *  - q544: Newey–West HAC standard error of mean daily revenue
  *    (Bartlett kernel, L=5): autocovariances from rank-offset joins
  *    on the bounded day domain, per-term floor quantization before
  *    exact integer sums, HAC-vs-iid inflation ratio. The
  *    autocorrelation-honest uncertainty for q13/q174-style series.
  *  - q545: rich-club coefficients of the co-purchase part graph
  *    (q184/q185's edge set): for k ∈ {2,4,8,16}, density among
  *    nodes with degree > k in exact bp — do high-degree parts
  *    preferentially co-occur with each other?
  *
  * Scale shapes: q542/q543 aggregate to bounded group/cell domains;
  * q544's lag joins run on the bounded day aggregate; q545's pair
  * enumeration is order-scoped (bounded items per order) like q184.
  */
object QueriesEI extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q542
    QDef("q542_eb_shrinkage",
      (s, dir) => {
        val g = t(s, dir, "lineitem")
          .selectExpr("l_partkey % 100 AS pk",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y")
          .groupBy("pk").agg(count(lit(1)).as("n"),
            sum("y").cast("long").as("x"))
          .selectExpr("pk", "n", "x", "x * 1000000 DIV n AS rate_ppm")
        g.cache(); g.count()
        val mom = g.agg(count(lit(1)).as("k"),
            sum("rate_ppm").cast("long").as("sr"),
            sum(expr("rate_ppm * rate_ppm")).cast("long").as("srr"))
          .where(expr("k > 1"))
          .selectExpr("k",
            "CAST(sr AS DOUBLE) / k / 1e6 AS m",
            "(CAST(srr AS DOUBLE) * k - CAST(sr AS DOUBLE) * sr) / k / (k - 1) / 1e12 AS v")
          .where(expr("v > 0 AND m > 0 AND m < 1 AND m * (1 - m) > v"))
          .selectExpr("m * (m * (1 - m) / v - 1) AS alpha",
            "(1 - m) * (m * (1 - m) / v - 1) AS beta")
        g.crossJoin(broadcast(mom))
          .selectExpr("pk", "n", "x", "rate_ppm DIV 100 AS raw_bp",
            """CAST(floor((x + alpha) / (n + alpha + beta) * 10000)
               AS BIGINT) AS post_bp""",
            "CAST(floor(alpha * 1000) AS BIGINT) AS alpha_milli",
            "CAST(floor(beta * 1000) AS BIGINT) AS beta_milli")
          .withColumn("shrink_bp", expr("abs(post_bp - raw_bp)"))
          .orderBy("pk")
      },
      Some("""
        WITH g AS (
          SELECT pk, n, x, x * 1000000 // n AS rate_ppm FROM (
            SELECT l_partkey % 100 AS pk, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS BIGINT) AS x
            FROM lineitem GROUP BY 1)),
        mom AS (
          SELECT m * (m * (1 - m) / v - 1) AS alpha,
                 (1 - m) * (m * (1 - m) / v - 1) AS beta
          FROM (
            SELECT k, CAST(sr AS DOUBLE) / k / 1e6 AS m,
                   (CAST(srr AS DOUBLE) * k - CAST(sr AS DOUBLE) * sr)
                     / k / (k - 1) / 1e12 AS v
            FROM (
              SELECT CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(rate_ppm) AS BIGINT) AS sr,
                     CAST(sum(rate_ppm * rate_ppm) AS BIGINT) AS srr
              FROM g) WHERE k > 1)
          WHERE v > 0 AND m > 0 AND m < 1 AND m * (1 - m) > v)
        SELECT pk, n, x, rate_ppm // 100 AS raw_bp,
               CAST(floor((x + alpha) / (n + alpha + beta) * 10000)
                 AS BIGINT) AS post_bp,
               CAST(floor(alpha * 1000) AS BIGINT) AS alpha_milli,
               CAST(floor(beta * 1000) AS BIGINT) AS beta_milli,
               abs(CAST(floor((x + alpha) / (n + alpha + beta) * 10000)
                 AS BIGINT) - rate_ppm // 100) AS shrink_bp
        FROM g, mom
        ORDER BY pk""")),

    // --------------------------------------------------------------- q543
    QDef("q543_logistic_newton",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .selectExpr(
            "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS tt",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
          .groupBy("tt").agg(count(lit(1)).as("n"),
            sum("y").cast("long").as("x"))
        cells.cache(); cells.count()
        def step(params: org.apache.spark.sql.DataFrame) =
          cells.crossJoin(broadcast(params))
            .withColumn("p", expr("1.0 / (1.0 + exp(-(a + b * tt)))"))
            .agg(
              sum(expr("x - n * p")).as("g1"),
              sum(expr("tt * (x - n * p)")).as("g2"),
              sum(expr("n * p * (1 - p)")).as("h11"),
              sum(expr("tt * n * p * (1 - p)")).as("h12"),
              sum(expr("tt * tt * n * p * (1 - p)")).as("h22"),
              max("a").as("a0"), max("b").as("b0"))
            .where(expr("h11 * h22 - h12 * h12 <> 0"))
            .selectExpr(
              "a0 + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a",
              "b0 + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b")
        val p0 = cells.agg(lit(0.0).as("a"), lit(0.0).as("b"))
          .selectExpr("a", "b")
        val fin = step(step(step(p0)))
        cells.crossJoin(broadcast(fin))
          .selectExpr("tt", "n", "x",
            "CAST(floor(a * 1000) AS BIGINT) AS a_milli",
            "CAST(floor(b * 1000) AS BIGINT) AS b_milli",
            """CAST(floor(1.0 / (1.0 + exp(-(a + b * tt))) * 10000)
               AS BIGINT) AS p_hat_bp""")
          .orderBy("tt")
      },
      Some("""
        WITH cells AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS tt,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS BIGINT) AS x
          FROM orders GROUP BY 1),
        p0 AS (SELECT 0.0 AS a, 0.0 AS b),
        s1 AS (
          SELECT a0 + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a,
                 b0 + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b
          FROM (
            SELECT sum(x - n * p) AS g1, sum(tt * (x - n * p)) AS g2,
                   sum(n * p * (1 - p)) AS h11,
                   sum(tt * n * p * (1 - p)) AS h12,
                   sum(tt * tt * n * p * (1 - p)) AS h22,
                   max(a) AS a0, max(b) AS b0
            FROM (SELECT c.*, q.a, q.b,
                    1.0 / (1.0 + exp(-(q.a + q.b * c.tt))) AS p
                  FROM cells c, p0 q))
          WHERE h11 * h22 - h12 * h12 <> 0),
        s2 AS (
          SELECT a0 + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a,
                 b0 + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b
          FROM (
            SELECT sum(x - n * p) AS g1, sum(tt * (x - n * p)) AS g2,
                   sum(n * p * (1 - p)) AS h11,
                   sum(tt * n * p * (1 - p)) AS h12,
                   sum(tt * tt * n * p * (1 - p)) AS h22,
                   max(a) AS a0, max(b) AS b0
            FROM (SELECT c.*, q.a, q.b,
                    1.0 / (1.0 + exp(-(q.a + q.b * c.tt))) AS p
                  FROM cells c, s1 q))
          WHERE h11 * h22 - h12 * h12 <> 0),
        s3 AS (
          SELECT a0 + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a,
                 b0 + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b
          FROM (
            SELECT sum(x - n * p) AS g1, sum(tt * (x - n * p)) AS g2,
                   sum(n * p * (1 - p)) AS h11,
                   sum(tt * n * p * (1 - p)) AS h12,
                   sum(tt * tt * n * p * (1 - p)) AS h22,
                   max(a) AS a0, max(b) AS b0
            FROM (SELECT c.*, q.a, q.b,
                    1.0 / (1.0 + exp(-(q.a + q.b * c.tt))) AS p
                  FROM cells c, s2 q))
          WHERE h11 * h22 - h12 * h12 <> 0)
        SELECT c.tt, c.n, c.x,
               CAST(floor(f.a * 1000) AS BIGINT) AS a_milli,
               CAST(floor(f.b * 1000) AS BIGINT) AS b_milli,
               CAST(floor(1.0 / (1.0 + exp(-(f.a + f.b * c.tt))) * 10000)
                 AS BIGINT) AS p_hat_bp
        FROM cells c, s3 f
        ORDER BY c.tt""")),

    // --------------------------------------------------------------- q544
    QDef("q544_newey_west",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("day").agg(expr("CAST(sum(cents) AS BIGINT) DIV 1000 AS y"))
        // rank over the bounded day aggregate (aggregate-domain window)
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val idx = daily.withColumn("rn", row_number().over(w))
        idx.cache(); idx.count()
        val mean = idx.agg(count(lit(1)).as("n"),
          sum("y").cast("long").as("sy"))
          .where(expr("n > 6"))
          .selectExpr("n", "CAST(sy AS DOUBLE) / n AS ybar")
        val base = idx.crossJoin(broadcast(mean))
        def gamma(l: Int) = {
          val a = base.selectExpr("rn", "y AS yt", "n", "ybar")
          val b = idx.selectExpr(s"rn - $l AS rn", "y AS ytl")
          a.join(b, "rn")
            .selectExpr("n", "ybar",
              "CAST(floor((yt - ybar) * (ytl - ybar)) AS BIGINT) AS prod")
            .groupBy("n", "ybar")
            .agg(sum("prod").cast("long").as(s"g$l"))
        }
        val joined = (1 to 5).map(gamma).foldLeft(gamma(0))(
          (acc, g) => acc.join(g, Seq("n", "ybar")))
        joined.selectExpr("n",
            "g0 DIV n AS gamma0",
            // Bartlett weights 2·(1−l/6) spelled as (6−l)/3 with an
            // explicit DOUBLE cast: bare `1.0/6` is DECIMAL division in
            // DuckDB (r6 parity lesson) and tipped the milli floor at
            // sf1 magnitudes
            """CAST(floor(sqrt((CAST(g0 AS DOUBLE)
                 + (CAST(5 AS DOUBLE)/3) * g1 + (CAST(4 AS DOUBLE)/3) * g2
                 + (CAST(3 AS DOUBLE)/3) * g3 + (CAST(2 AS DOUBLE)/3) * g4
                 + (CAST(1 AS DOUBLE)/3) * g5) / n / n) * 1000) AS BIGINT)
               AS nw_se_milli""",
            """CAST(floor(sqrt(CAST(g0 AS DOUBLE) / n / n) * 1000)
               AS BIGINT) AS iid_se_milli""")
          .where(expr("iid_se_milli > 0"))
          .selectExpr("n", "gamma0", "nw_se_milli", "iid_se_milli",
            "nw_se_milli * 10000 DIV iid_se_milli AS inflation_bp")
      },
      Some("""
        WITH daily AS (
          SELECT day, CAST(sum(cents) AS BIGINT) // 1000 AS y FROM (
            SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice IS NOT NULL)
          GROUP BY day),
        idx AS (
          SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS DOUBLE) / count(*) AS ybar
          FROM idx HAVING count(*) > 6),
        g AS (
          SELECT l.l,
                 CAST(sum(CAST(floor((a.y - m.ybar) * (b.y - m.ybar))
                   AS BIGINT)) AS BIGINT) AS gl
          FROM idx a, (SELECT unnest(range(0, 6)) AS l) l, idx b, m
          WHERE b.rn = a.rn - l.l
          GROUP BY l.l),
        p AS (
          SELECT m.n,
                 max(CASE WHEN l = 0 THEN gl END) AS g0,
                 max(CASE WHEN l = 1 THEN gl END) AS g1,
                 max(CASE WHEN l = 2 THEN gl END) AS g2,
                 max(CASE WHEN l = 3 THEN gl END) AS g3,
                 max(CASE WHEN l = 4 THEN gl END) AS g4,
                 max(CASE WHEN l = 5 THEN gl END) AS g5
          FROM g, m GROUP BY m.n),
        v AS (
          SELECT n, g0 // n AS gamma0,
                 CAST(floor(sqrt((CAST(g0 AS DOUBLE)
                   + (CAST(5 AS DOUBLE)/3) * g1 + (CAST(4 AS DOUBLE)/3) * g2
                   + (CAST(3 AS DOUBLE)/3) * g3 + (CAST(2 AS DOUBLE)/3) * g4
                   + (CAST(1 AS DOUBLE)/3) * g5) / n / n) * 1000) AS BIGINT)
                   AS nw_se_milli,
                 CAST(floor(sqrt(CAST(g0 AS DOUBLE) / n / n) * 1000)
                   AS BIGINT) AS iid_se_milli
          FROM p)
        SELECT n, gamma0, nw_se_milli, iid_se_milli,
               nw_se_milli * 10000 // iid_se_milli AS inflation_bp
        FROM v WHERE iid_se_milli > 0""")),

    // --------------------------------------------------------------- q545
    QDef("q545_rich_club",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          // basket-array pair build (q140/q390 pattern): one collect_set
          // shuffle, pairs map-side from the <=7-part sorted basket
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
            .as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
          .select("a", "b")
        e.cache()
        val nEdges = e.count()
        if (nEdges <= 2000000L) {
          // dual-path (the q457/q225 recipe, r11): degrees, the 4 k-tiers
          // and the rich-club ratio all run driver-side over the collected
          // repeat-pair census — one job instead of deg + 2 census joins +
          // rollup. Integer math identical to the frames below.
          val half = e.collect().map(r => (r.getLong(0), r.getLong(1)))
          val deg = (half.map(_._1) ++ half.map(_._2))
            .groupMapReduce(identity)(_ => 1L)(_ + _)
          val sc2 = s
          import sc2.implicits._
          (1 to 4).map(i => 1L << i).flatMap { k =>
            val nNodes = deg.valuesIterator.count(_ > k).toLong
            if (nNodes <= 1) None
            else {
              val nE = half.count { case (a, b) =>
                deg(a) > k && deg(b) > k
              }.toLong
              Some((k, nNodes, nE,
                2L * nE * 10000L / (nNodes * (nNodes - 1))))
            }
          }.toDF("k", "n_nodes", "n_edges", "phi_bp")
        } else {
        val deg = e.select(col("a").as("v"))
          .unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val ks = s.range(1, 5).selectExpr("CAST(pow(2, id) AS BIGINT) AS k")
        val nodesK = deg.crossJoin(broadcast(ks))
          .where(col("deg") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_nodes"))
        val edgesK = e
          .join(deg.selectExpr("v AS a", "deg AS da"), "a")
          .join(deg.selectExpr("v AS b", "deg AS db"), "b")
          .crossJoin(broadcast(ks))
          .where(col("da") > col("k") && col("db") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_edges"))
        nodesK.join(edgesK, Seq("k"), "left")
          .selectExpr("k", "n_nodes", "coalesce(n_edges, 0L) AS n_edges")
          .where(expr("n_nodes > 1"))
          .selectExpr("k", "n_nodes", "n_edges",
            "2 * n_edges * 10000 DIV (n_nodes * (n_nodes - 1)) AS phi_bp")
          .orderBy("k")
        }
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey
                    FROM lineitem),
        e AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS v FROM e UNION ALL SELECT b FROM e)
          GROUP BY 1),
        ks AS (SELECT CAST(pow(2, k) AS BIGINT) AS k
               FROM (SELECT unnest(range(1, 5)) AS k)),
        nodesk AS (
          SELECT k.k, CAST(count(*) AS BIGINT) AS n_nodes
          FROM deg d, ks k WHERE d.deg > k.k GROUP BY 1),
        edgesk AS (
          SELECT k.k, CAST(count(*) AS BIGINT) AS n_edges
          FROM e
          JOIN deg da ON e.a = da.v
          JOIN deg db ON e.b = db.v, ks k
          WHERE da.deg > k.k AND db.deg > k.k
          GROUP BY 1)
        SELECT n.k, n.n_nodes, coalesce(ed.n_edges, 0) AS n_edges,
               2 * coalesce(ed.n_edges, 0) * 10000
                 // (n.n_nodes * (n.n_nodes - 1)) AS phi_bp
        FROM nodesk n LEFT JOIN edgesk ed ON n.k = ed.k
        WHERE n.n_nodes > 1
        ORDER BY n.k"""))
  )
}
