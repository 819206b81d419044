package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 124 — DAG scheduling, MRP rollup,
  * robust regression, causal time series:
  *
  *  - q510: critical-path method (CPM) on the divisor-lattice task DAG
  *    (node k's predecessors are k/2 and k/3 when present) — earliest
  *    finish via forward pass, latest-tail via backward pass, path
  *    counts, critical-node flags. Durations aggregate distributedly
  *    from lineitem onto the ≤200-node bounded domain; the DP itself is
  *    dimension-sized (one-task pass, the q493/FFD pattern). Oracle
  *    enumerates all source-rooted paths in a recursive CTE.
  *  - q511: multi-level BOM / MRP gross-requirements explosion — each
  *    part id p decomposes into components p/2 (×2) and p/3 (×3);
  *    gross(k) = own demand + Σ parents mult·gross(parent), i.e. path
  *    products of multiplicities. Demand aggregates from lineitem onto
  *    the ≤300-node domain; recursive-CTE oracle walks demand down the
  *    lattice multiplying as it goes.
  *  - q512: τ=0.9 quantile regression of order totals on order day by
  *    pinball-loss grid search (7 slopes × 9 intercepts, weights 9/1 in
  *    exact integer cents); argmin via lexicographic struct-min, one
  *    map-side-combinable aggregation over the broadcast grid.
  *  - q513: Granger-style lagged predictive-improvement test on the
  *    daily (revenue, order-count) series — SSE of y_t ~ y_{t-1} vs
  *    y_t ~ y_{t-1} + x_{t-1} from exact integer component sums
  *    (q289's Cramer form), improvement and F-statistic floor-quantized.
  *
  * Scale shapes: q510/q511 facts aggregate distributedly to bounded
  * node domains before any sequential DP; q512's grid (63 rows)
  * broadcasts onto one pass over orders; q513 reduces facts to the
  * bounded day domain before its (aggregate-domain) lag window.
  */
object QueriesEA extends QueryPack {
  import Q._

  case class CpmNode(id: Long, dur: Long)
  case class CpmOut(id: Long, dur: Long, ef: Long, n_paths: Long,
      is_critical: Long, project_ef: Long)
  case class BomNode(id: Long, d: Long)
  case class BomOut(id: Long, own_demand: Long, gross_qty: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q510
    QDef("q510_critical_path",
      (s, dir) => {
        import s.implicits._
        val nodes = t(s, dir, "lineitem")
          .selectExpr("l_partkey % 200 AS id",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
          .groupBy("id").agg(sum("q").cast("long").as("dur"))
        nodes.as[CpmNode].coalesce(1).sortWithinPartitions("id")
          .mapPartitions { it =>
            val arr = it.toArray // ascending id; preds have smaller ids
            val present = arr.map(_.id).toSet
            val ef = collection.mutable.Map[Long, Long]()
            val np = collection.mutable.Map[Long, Long]()
            def preds(m: Long) = Seq(
                if (m % 2 == 0) Some(m / 2) else None,
                if (m % 3 == 0) Some(m / 3) else None)
              .flatten.filter(p => p >= 1 && p != m && present(p)).distinct
            def succs(m: Long) = Seq(m * 2, m * 3)
              .filter(d => m >= 1 && d != m && present(d)).distinct
            arr.foreach { n =>
              val ps = preds(n.id)
              ef(n.id) = n.dur + ps.map(ef).reduceOption(_ max _).getOrElse(0L)
              np(n.id) = if (ps.isEmpty) 1L else ps.map(np).sum
            }
            val lt = collection.mutable.Map[Long, Long]()
            arr.reverseIterator.foreach { n =>
              lt(n.id) = n.dur +
                succs(n.id).map(lt).reduceOption(_ max _).getOrElse(0L)
            }
            val maxEf = if (arr.isEmpty) 0L else ef.values.max
            arr.map { n =>
              CpmOut(n.id, n.dur, ef(n.id), np(n.id),
                if (ef(n.id) + lt(n.id) - n.dur == maxEf) 1L else 0L, maxEf)
            }.sortBy(o => (-o.ef, o.id)).take(12).iterator
          }
          .toDF()
          .orderBy(col("ef").desc, col("id"))
      },
      Some("""
        WITH RECURSIVE nodes AS (
          SELECT l_partkey % 200 AS id,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS dur
          FROM lineitem GROUP BY 1),
        edges AS (
          SELECT s.id AS src, d.id AS dst
          FROM nodes s JOIN nodes d
            ON (d.id = s.id * 2 OR d.id = s.id * 3)
           AND s.id >= 1 AND d.id <> s.id),
        sources AS (
          SELECT id FROM nodes WHERE id NOT IN (SELECT dst FROM edges)),
        rec AS (
          SELECT id AS start, id AS cur, dur AS len FROM nodes
          UNION ALL
          SELECT r.start, e.dst, r.len + n.dur
          FROM rec r
          JOIN edges e ON e.src = r.cur
          JOIN nodes n ON n.id = e.dst),
        fwd AS (
          SELECT cur AS id, CAST(max(len) AS BIGINT) AS ef,
                 CAST(count(*) AS BIGINT) AS n_paths
          FROM rec WHERE start IN (SELECT id FROM sources) GROUP BY 1),
        tails AS (
          SELECT start AS id, CAST(max(len) AS BIGINT) AS lt
          FROM rec GROUP BY 1),
        ranked AS (
          SELECT n.id, n.dur, f.ef, f.n_paths,
                 CASE WHEN f.ef + t.lt - n.dur =
                   (SELECT max(ef) FROM fwd) THEN 1 ELSE 0 END AS crit,
                 (SELECT CAST(max(ef) AS BIGINT) FROM fwd) AS project_ef,
                 row_number() OVER (ORDER BY f.ef DESC, n.id) AS rn
          FROM nodes n JOIN fwd f ON n.id = f.id JOIN tails t ON n.id = t.id)
        SELECT id, dur, ef, n_paths, CAST(crit AS BIGINT) AS is_critical,
               project_ef
        FROM ranked WHERE rn <= 12 ORDER BY ef DESC, id""")),

    // --------------------------------------------------------------- q511
    QDef("q511_bom_explosion",
      (s, dir) => {
        import s.implicits._
        val nodes = t(s, dir, "lineitem")
          .selectExpr("l_partkey % 300 AS id",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
          .groupBy("id").agg(sum("q").cast("long").as("d"))
        nodes.as[BomNode].coalesce(1)
          .sortWithinPartitions(col("id").desc)
          .mapPartitions { it =>
            val arr = it.toArray // descending id; parents before children
            val present = arr.map(_.id).toSet
            val gross = collection.mutable.Map[Long, Long]()
            // children of p: p/2 with multiplicity 2, p/3 with mult 3 —
            // two edges even when they point at the same child
            arr.foreach { n =>
              gross(n.id) = gross.getOrElse(n.id, 0L) + n.d
              Seq((n.id / 2, 2L), (n.id / 3, 3L)).foreach { case (c, m) =>
                if (c >= 1 && c != n.id && present(c))
                  gross(c) = gross.getOrElse(c, 0L) + m * gross(n.id)
              }
            }
            val own = arr.map(n => n.id -> n.d).toMap
            arr.filter(n => n.id >= 1 && n.id <= 12)
              .map(n => BomOut(n.id, own(n.id), gross(n.id)))
              .sortBy(_.id).iterator
          }
          .toDF()
          .orderBy("id")
      },
      Some("""
        WITH RECURSIVE nodes AS (
          SELECT l_partkey % 300 AS id,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS d
          FROM lineitem GROUP BY 1),
        edges AS (
          SELECT p.id AS src, c.id AS dst, 2 AS mult
          FROM nodes p JOIN nodes c ON c.id = p.id // 2
          WHERE c.id >= 1 AND c.id <> p.id
          UNION ALL
          SELECT p.id, c.id, 3
          FROM nodes p JOIN nodes c ON c.id = p.id // 3
          WHERE c.id >= 1 AND c.id <> p.id),
        rec AS (
          SELECT id AS cur, d AS qty FROM nodes WHERE d > 0
          UNION ALL
          SELECT e.dst, r.qty * e.mult
          FROM rec r JOIN edges e ON e.src = r.cur)
        SELECT n.id, n.d AS own_demand,
               CAST((SELECT sum(qty) FROM rec WHERE cur = n.id) AS BIGINT)
                 AS gross_qty
        FROM nodes n
        WHERE n.id BETWEEN 1 AND 12
        ORDER BY n.id""")),

    // --------------------------------------------------------------- q512
    QDef("q512_quantile_regression",
      (s, dir) => {
        val o = t(s, dir, "orders").selectExpr(
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
        val ext = o.agg(min("y").as("ymin"), max("y").as("ymax"),
          min("day").as("dmin"), count(lit(1)).as("n"))
        val grid = s.range(0, 63)
          .selectExpr("id DIV 9 AS bi", "id % 9 AS ai")
          .crossJoin(broadcast(ext))
          .selectExpr("(bi - 3) * 10 AS b",
            "ymin + (ymax - ymin) * ai DIV 8 AS a", "dmin", "n")
        o.crossJoin(broadcast(grid))
          .withColumn("pred", expr("a + b * (day - dmin)"))
          .groupBy("a", "b", "n").agg(
            sum(expr("CASE WHEN y > pred THEN 9 * (y - pred) " +
              "ELSE pred - y END")).cast("long").as("loss"),
            sum(expr("CASE WHEN y <= pred THEN 1 ELSE 0 END"))
              .cast("long").as("below"))
          .agg(min(struct(col("loss"), col("a"), col("b"), col("n"),
            col("below"))).as("st"))
          .selectExpr("st.n AS n", "st.a AS best_a", "st.b AS best_b",
            "st.loss AS best_loss",
            "st.below * 10000 DIV st.n AS below_share_bp")
      },
      Some("""
        WITH o AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
                 epoch_ms(o_orderdate) // 86400000 AS day
          FROM orders),
        ext AS (SELECT min(y) AS ymin, max(y) AS ymax, min(day) AS dmin,
                       CAST(count(*) AS BIGINT) AS n FROM o),
        grid AS (
          SELECT (bi - 3) * 10 AS b, ymin + (ymax - ymin) * ai // 8 AS a,
                 dmin, n
          FROM ext, generate_series(0, 6) t(bi), generate_series(0, 8) u(ai)),
        sc AS (
          SELECT g.a, g.b, g.n,
                 CAST(sum(CASE WHEN o.y > g.a + g.b * (o.day - g.dmin)
                   THEN 9 * (o.y - (g.a + g.b * (o.day - g.dmin)))
                   ELSE (g.a + g.b * (o.day - g.dmin)) - o.y END) AS BIGINT)
                   AS loss,
                 CAST(sum(CASE WHEN o.y <= g.a + g.b * (o.day - g.dmin)
                   THEN 1 ELSE 0 END) AS BIGINT) AS below
          FROM o CROSS JOIN grid g GROUP BY 1, 2, 3)
        SELECT n, a AS best_a, b AS best_b, loss AS best_loss,
               below * 10000 // n AS below_share_bp
        FROM sc ORDER BY loss, a, b LIMIT 1""")),

    // --------------------------------------------------------------- q513
    QDef("q513_granger",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("day").agg(
            sum("cents").cast("long").as("yc"),
            count(lit(1)).as("x"))
          // daily revenue in 10-dollar units: keeps n·Σy² inside int64
          // at sf ≥ 0.01 (raw cents overflow the Cramer products)
          .selectExpr("day", "yc DIV 1000 AS y", "x")
        // lag over the bounded day domain (aggregate-domain window)
        val w = Window.orderBy("day")
        val lagd = daily
          .withColumn("u", lag("y", 1).over(w))
          .withColumn("v", lag("x", 1).over(w))
          .where(col("u").isNotNull)
        val sums = lagd.agg(
          count(lit(1)).as("n"),
          sum("u").cast("long").as("su"), sum("v").cast("long").as("sv"),
          sum("y").cast("long").as("sy"),
          sum(expr("u*u")).cast("long").as("suu"),
          sum(expr("v*v")).cast("long").as("svv"),
          sum(expr("u*v")).cast("long").as("suv"),
          sum(expr("u*y")).cast("long").as("suy"),
          sum(expr("v*y")).cast("long").as("svy"),
          sum(expr("y*y")).cast("long").as("syy"))
        // Cramer products in DECIMAL(38,0): n·Σu² reaches ~1.4e21 at sf1
        // (daily 10-dollar units ~2.3e7), past int64 — exact wide product
        // first, ONE cast to double after (oracle mirrors via HUGEINT)
        sums.selectExpr("n",
            "CAST(CAST(n AS DECIMAL(38,0))*suu - CAST(su AS DECIMAL(38,0))*su AS DOUBLE) AS cuu",
            "CAST(CAST(n AS DECIMAL(38,0))*svv - CAST(sv AS DECIMAL(38,0))*sv AS DOUBLE) AS cvv",
            "CAST(CAST(n AS DECIMAL(38,0))*suv - CAST(su AS DECIMAL(38,0))*sv AS DOUBLE) AS cuv",
            "CAST(CAST(n AS DECIMAL(38,0))*suy - CAST(su AS DECIMAL(38,0))*sy AS DOUBLE) AS cuy",
            "CAST(CAST(n AS DECIMAL(38,0))*svy - CAST(sv AS DECIMAL(38,0))*sy AS DOUBLE) AS cvy",
            "CAST(CAST(n AS DECIMAL(38,0))*syy - CAST(sy AS DECIMAL(38,0))*sy AS DOUBLE) AS cyy")
          .selectExpr("n", "cyy - cuy * cuy / cuu AS sse1",
            """cyy - ((cuy*cvv - cvy*cuv) / (cuu*cvv - cuv*cuv)) * cuy
                   - ((cvy*cuu - cuy*cuv) / (cuu*cvv - cuv*cuv)) * cvy
               AS sse2""")
          .selectExpr("n",
            "CAST(floor((sse1 - sse2) / sse1 * 10000) AS BIGINT) AS improvement_bp",
            "CAST(floor((sse1 - sse2) * (n - 3) / sse2 * 1000) AS BIGINT) AS f_milli")
      },
      Some("""
        WITH daily AS (
          SELECT day, yc // 1000 AS y, x FROM (
            SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS yc,
                   CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1)),
        lagd AS (
          SELECT y,
                 lag(y) OVER (ORDER BY day) AS u,
                 lag(x) OVER (ORDER BY day) AS v
          FROM daily),
        f AS (SELECT * FROM lagd WHERE u IS NOT NULL),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(u*u) AS BIGINT) AS suu,
                 CAST(sum(v*v) AS BIGINT) AS svv,
                 CAST(sum(u*v) AS BIGINT) AS suv,
                 CAST(sum(u*y) AS BIGINT) AS suy,
                 CAST(sum(v*y) AS BIGINT) AS svy,
                 CAST(sum(y*y) AS BIGINT) AS syy
          FROM f),
        c AS (
          SELECT n,
                 CAST(CAST(n AS HUGEINT)*suu - CAST(su AS HUGEINT)*su AS DOUBLE) AS cuu,
                 CAST(CAST(n AS HUGEINT)*svv - CAST(sv AS HUGEINT)*sv AS DOUBLE) AS cvv,
                 CAST(CAST(n AS HUGEINT)*suv - CAST(su AS HUGEINT)*sv AS DOUBLE) AS cuv,
                 CAST(CAST(n AS HUGEINT)*suy - CAST(su AS HUGEINT)*sy AS DOUBLE) AS cuy,
                 CAST(CAST(n AS HUGEINT)*svy - CAST(sv AS HUGEINT)*sy AS DOUBLE) AS cvy,
                 CAST(CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE) AS cyy
          FROM sums),
        sse AS (
          SELECT n, cyy - cuy * cuy / cuu AS sse1,
                 cyy - ((cuy*cvv - cvy*cuv) / (cuu*cvv - cuv*cuv)) * cuy
                     - ((cvy*cuu - cuy*cuv) / (cuu*cvv - cuv*cuv)) * cvy
                   AS sse2
          FROM c)
        SELECT n,
               CAST(floor((sse1 - sse2) / sse1 * 10000) AS BIGINT)
                 AS improvement_bp,
               CAST(floor((sse1 - sse2) * (n - 3) / sse2 * 1000) AS BIGINT)
                 AS f_milli
        FROM sse"""))
  )
}
