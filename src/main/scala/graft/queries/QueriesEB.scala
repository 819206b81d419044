package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 125 — annotator agreement, robust
  * two-sample testing, intermittent-demand forecasting, hull diameter:
  *
  *  - q514: Cohen's kappa between two deterministic document "raters"
  *    (3-class length label from n_chars vs 3-class verbosity label
  *    from whitespace word count) — observed/expected agreement and
  *    kappa in exact integer basis points from ONE conditional-sum
  *    aggregation pass (the contingency table never materializes).
  *    The inter-annotator / LLM-judge agreement gate of labeling
  *    pipelines.
  *  - q515: Welch's unequal-variance t-test of order totals, urgent vs
  *    non-urgent priority: exact int64 component sums (n, Σy, Σy²) per
  *    group in one pass, then mean diff, t, and Welch–Satterthwaite df
  *    floor-quantized with one spelled-out IEEE op order (the q84/q289
  *    component-sum discipline; variance products stay in DOUBLE so no
  *    int64 overflow at any SF).
  *  - q516: Croston's method for intermittent demand — bulk-order days
  *    (l_quantity > 45) per part group form a sparse daily series; the
  *    coupled (size z, interval p) recurrence z' = (q+3z) DIV 4,
  *    p' = (I+3p) DIV 4 runs on the secondary-sort mapPartitions scale
  *    path (q179/q210's shape), demand rate in bp = z·10⁴ DIV p.
  *    Recursive-CTE oracle carries (z, p, day) per part group.
  *  - q517: per-region point-set diameter: Spark builds the convex
  *    hull (Andrew chain, q509's bounded ≤1280-cell grid) and scans
  *    only hull-vertex pairs; the oracle brute-forces ALL cell pairs —
  *    the diameter-is-on-the-hull theorem is what makes the two agree
  *    (collinear boundary points are popped by the strict-turn chain,
  *    so tie-breaks see identical candidate sets).
  *
  * Scale shapes: q514/q515 are single conditional-sum aggregates (one
  * scan, 9/6 counters); q516 aggregates to (group, day) first, then
  * streams each group's days in one partition-local pass (O(1) state);
  * q517 dedups to the bounded grid before any per-group work, and the
  * quadratic pair scan runs over hull vertices only (≤ ~30).
  */
object QueriesEB extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class CrostonDay(pk: Long, day: Long, q: Long)
  case class CrostonOut(pk: Long, n_days: Long, z: Long, p: Long, rate_bp: Long)
  case class DiamCell(region: String, x: Long, y: Long)
  case class DiamOut(region: String, n_cells: Long, diam2: Long,
      px: Long, py: Long, qx: Long, qy: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q514
    QDef("q514_cohens_kappa",
      (s, dir) => {
        val lab = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .withColumn("wc", size(words(col("text"))))
          .selectExpr(
            "CASE WHEN n_chars < 216 THEN 0 WHEN n_chars < 372 THEN 1 ELSE 2 END AS a",
            "CASE WHEN wc < 39 THEN 0 WHEN wc < 68 THEN 1 ELSE 2 END AS b")
        lab.agg(
            count(lit(1)).as("n"),
            sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
            sum(when(col("a") === 0, 1L).otherwise(0L)).as("a0"),
            sum(when(col("a") === 1, 1L).otherwise(0L)).as("a1"),
            sum(when(col("a") === 2, 1L).otherwise(0L)).as("a2"),
            sum(when(col("b") === 0, 1L).otherwise(0L)).as("b0"),
            sum(when(col("b") === 1, 1L).otherwise(0L)).as("b1"),
            sum(when(col("b") === 2, 1L).otherwise(0L)).as("b2"))
          .withColumn("sab", expr("a0*b0 + a1*b1 + a2*b2"))
          .where(expr("n > 0 AND n*n > sab"))
          .selectExpr("n", "agree",
            "agree * 10000 DIV n AS po_bp",
            "sab * 10000 DIV (n*n) AS pe_bp",
            "(n*agree - sab) * 10000 DIV (n*n - sab) AS kappa_bp")
      },
      Some(s"""
        WITH lab AS (
          SELECT CASE WHEN n_chars < 216 THEN 0
                      WHEN n_chars < 372 THEN 1 ELSE 2 END AS a,
                 CASE WHEN wc < 39 THEN 0 WHEN wc < 68 THEN 1 ELSE 2 END AS b
          FROM (SELECT n_chars, len(${wordsSql("text")}) AS wc
                FROM documents WHERE text IS NOT NULL)),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
                 CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
                 CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
                 CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
                 CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
                 CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2
          FROM lab),
        k AS (SELECT n, agree, a0*b0 + a1*b1 + a2*b2 AS sab FROM c)
        SELECT n, agree,
               agree * 10000 // n AS po_bp,
               sab * 10000 // (n*n) AS pe_bp,
               (n*agree - sab) * 10000 // (n*n - sab) AS kappa_bp
        FROM k WHERE n > 0 AND n*n > sab""")),

    // --------------------------------------------------------------- q515
    QDef("q515_welch_ttest",
      (s, dir) => {
        t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS y",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g")
          .agg(
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === 1, col("y")).otherwise(0L)).cast("long").as("s1"),
            // Σy² in DECIMAL(38,0): y² ≤ ~3.6e11 per row is int64-safe, but
            // the SUM crosses int64 around sf~150 — decimal keeps the
            // accumulation exact at any SF (per-row y*y stays int64)
            sum(when(col("g") === 1, expr("y*y")).otherwise(0L)
              .cast("decimal(38,0)")).as("ss1"),
            sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("g") === 0, col("y")).otherwise(0L)).cast("long").as("s0"),
            sum(when(col("g") === 0, expr("y*y")).otherwise(0L)
              .cast("decimal(38,0)")).as("ss0"))
          .where(expr("n1 > 1 AND n0 > 1"))
          // sample variances in DOUBLE (n·Σy² would overflow int64): the
          // operand order below is mirrored literally in the oracle, so
          // every IEEE rounding step is identical in both engines; the
          // exact decimal Σy² casts to the same correctly-rounded double
          // in both engines
          .selectExpr("n1", "n0", "s1", "s0",
            "(CAST(ss1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1) / n1 / (n1 - 1) AS v1",
            "(CAST(ss0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0) / n0 / (n0 - 1) AS v0")
          .selectExpr("n1", "n0", "s1", "s0", "v1", "v0",
            "v1 / n1 + v0 / n0 AS se2")
          .selectExpr("n1", "n0",
            """CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 * 1000) AS BIGINT) AS mean_diff_milli""",
            """CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 / sqrt(se2) * 1000) AS BIGINT) AS t_milli""",
            """CAST(floor(se2 * se2 /
                 ((v1 / n1) * (v1 / n1) / (n1 - 1)
                  + (v0 / n0) * (v0 / n0) / (n0 - 1)) * 1000) AS BIGINT)
               AS df_milli""")
      },
      Some("""
        WITH o AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS y,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
          FROM orders WHERE o_totalprice IS NOT NULL),
        c AS (
          SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
                 CAST(sum(CASE WHEN g = 1 THEN y*y ELSE 0 END) AS DECIMAL(38,0)) AS ss1,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
                 CAST(sum(CASE WHEN g = 0 THEN y*y ELSE 0 END) AS DECIMAL(38,0)) AS ss0
          FROM o),
        v AS (
          SELECT n1, n0, s1, s0,
                 (CAST(ss1 AS DOUBLE) * n1 - CAST(s1 AS DOUBLE) * s1) / n1 / (n1 - 1) AS v1,
                 (CAST(ss0 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * s0) / n0 / (n0 - 1) AS v0
          FROM c WHERE n1 > 1 AND n0 > 1),
        w AS (SELECT *, v1 / n1 + v0 / n0 AS se2 FROM v)
        SELECT n1, n0,
               CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 * 1000) AS BIGINT) AS mean_diff_milli,
               CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 / sqrt(se2) * 1000) AS BIGINT) AS t_milli,
               CAST(floor(se2 * se2 /
                 ((v1 / n1) * (v1 / n1) / (n1 - 1)
                  + (v0 / n0) * (v0 / n0) / (n0 - 1)) * 1000) AS BIGINT)
                 AS df_milli
        FROM w""")),

    // --------------------------------------------------------------- q516
    QDef("q516_croston",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "lineitem")
          .where(col("l_quantity") > 45)
          .selectExpr("l_partkey % 40 AS pk",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
          .groupBy("pk", "day").agg(sum("qty").cast("long").as("q"))
          .as[CrostonDay]
        daily.repartition(col("pk"))
          .sortWithinPartitions("pk", "day")
          .mapPartitions { it =>
            new Iterator[CrostonOut] {
              private var pending: Option[CrostonOut] = None
              private var cur = Long.MinValue
              private var z = 0L; private var p = 0L
              private var prevDay = 0L; private var n = 0L
              private def emit(): CrostonOut =
                CrostonOut(cur, n, z, p, if (p > 0) z * 10000L / p else 0L)
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val d = it.next()
                  if (d.pk != cur) {
                    if (cur != Long.MinValue) pending = Some(emit())
                    cur = d.pk; z = d.q; p = 1L; n = 1L; prevDay = d.day
                  } else {
                    val i = d.day - prevDay
                    z = (d.q + 3L * z) / 4L
                    p = (i + 3L * p) / 4L
                    prevDay = d.day; n += 1L
                  }
                }
                if (pending.isEmpty && cur != Long.MinValue) {
                  pending = Some(emit()); cur = Long.MinValue
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): CrostonOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("pk")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT l_partkey % 40 AS pk,
                 epoch_ms(l_shipdate) // 86400000 AS day,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS q
          FROM lineitem WHERE l_quantity > 45 GROUP BY 1, 2),
        r AS (
          SELECT pk, day, q,
                 row_number() OVER (PARTITION BY pk ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY pk) AS cnt
          FROM daily),
        b AS (
          SELECT pk, rn, cnt, day, q AS z, CAST(1 AS BIGINT) AS p
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.pk, r.rn, r.cnt, r.day,
                 (r.q + 3 * b.z) // 4,
                 ((r.day - b.day) + 3 * b.p) // 4
          FROM b JOIN r ON r.pk = b.pk AND r.rn = b.rn + 1)
        SELECT pk, CAST(cnt AS BIGINT) AS n_days, z, p,
               CASE WHEN p > 0 THEN z * 10000 // p ELSE 0 END AS rate_bp
        FROM b WHERE rn = cnt ORDER BY pk""")),

    // --------------------------------------------------------------- q517
    QDef("q517_hull_diameter",
      (s, dir) => {
        import s.implicits._
        val cells = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            expr("c_nationkey = n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            expr("n_regionkey = r_regionkey"))
          .selectExpr("r_name AS region",
            "CAST((c_custkey * 37) % 1000 AS BIGINT) DIV 25 AS x",
            "CAST((c_custkey * 61) % 800 AS BIGINT) DIV 25 AS y")
          .distinct()
        cells.as[DiamCell].groupByKey(_.region)
          .flatMapGroups { (r, it) =>
            val pts = it.map(c => (c.x, c.y)).toArray.sorted
            if (pts.length < 2) Iterator.empty
            else {
              def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)) =
                (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
              def chain(ps: Iterator[(Long, Long)]) = {
                val st = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
                ps.foreach { p =>
                  while (st.length >= 2 &&
                      cross(st(st.length - 2), st.last, p) <= 0)
                    st.remove(st.length - 1)
                  st += p
                }
                st
              }
              val hull =
                if (pts.length <= 2) pts.toSeq
                else (chain(pts.iterator).dropRight(1) ++
                  chain(pts.reverseIterator).dropRight(1)).toSeq
              // diameter endpoints are hull vertices (strict-turn chain
              // pops collinear boundary points, so no non-vertex ties)
              var best: (Long, Long, Long, Long, Long) = null
              for (i <- hull.indices; j <- (i + 1) until hull.length) {
                val (ax, ay) = hull(i); val (bx, by) = hull(j)
                val (p, q) =
                  if (ax < bx || (ax == bx && ay < by))
                    ((ax, ay), (bx, by)) else ((bx, by), (ax, ay))
                val d2 = (p._1 - q._1) * (p._1 - q._1) +
                  (p._2 - q._2) * (p._2 - q._2)
                val cand = (d2, p._1, p._2, q._1, q._2)
                if (best == null || cand._1 > best._1 ||
                    (cand._1 == best._1 &&
                      Ordering[(Long, Long, Long, Long)].lt(
                        (cand._2, cand._3, cand._4, cand._5),
                        (best._2, best._3, best._4, best._5))))
                  best = cand
              }
              Iterator.single(DiamOut(r, pts.length.toLong,
                best._1, best._2, best._3, best._4, best._5))
            }
          }
          .toDF()
          .orderBy("region")
      },
      Some("""
        WITH cells AS (
          SELECT DISTINCT r.r_name AS region,
                 CAST((c.c_custkey * 37) % 1000 AS BIGINT) // 25 AS x,
                 CAST((c.c_custkey * 61) % 800 AS BIGINT) // 25 AS y
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey),
        cnt AS (SELECT region, CAST(count(*) AS BIGINT) AS n_cells
                FROM cells GROUP BY 1),
        pairs AS (
          SELECT a.region,
                 (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
                 a.x AS px, a.y AS py, b.x AS qx, b.y AS qy,
                 row_number() OVER (PARTITION BY a.region
                   ORDER BY (a.x - b.x) * (a.x - b.x)
                          + (a.y - b.y) * (a.y - b.y) DESC,
                     a.x, a.y, b.x, b.y) AS rk
          FROM cells a JOIN cells b
            ON a.region = b.region
           AND (a.x < b.x OR (a.x = b.x AND a.y < b.y)))
        SELECT c.region, c.n_cells, p.d2 AS diam2, p.px, p.py, p.qx, p.qy
        FROM cnt c JOIN pairs p ON c.region = p.region AND p.rk = 1
        ORDER BY c.region"""))
  )
}
