package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 141 — forecasting, distribution
  * testing, and inequality/data-quality statistics:
  *
  *  - q582: Holt linear (double-exponential) smoothing of the daily
  *    order-count series: coupled integer recurrence l,b with α=β=1/4
  *    on the secondary-sort path (the day domain is bounded, so ONE
  *    task carries the aggregated series — q557's scale argument),
  *    3-state recursive-CTE oracle; reports the 30-day-ahead linear
  *    forecast and in-sample absolute error.
  *  - q583: two-sample Kolmogorov–Smirnov D between urgent and other
  *    order price distributions: exact ppm CDFs by prefix sums over
  *    the bounded cents-bucket census, D = max |F1−F2| with the
  *    smallest-bucket tie rule; the c(α)-scaled critical ratio.
  *  - q584: Benford first-digit audit of o_totalprice: exact digit
  *    census vs floor-micro Benford expectation ln(1+1/d)/ln(10),
  *    max absolute deviation bp — the fraud/data-quality screen.
  *  - q585: Gini coefficient of customer revenue from the BOUNDED
  *    cents-bucket census (grouped-data Gini: prefix sums over value
  *    buckets, exact integer numerators in DECIMAL(38,0)) — never a
  *    global sort of raw customers.
  *
  * Scale shapes: q582 iterates on the bounded day aggregate; q583/q584/
  * q585 reduce to bounded value-bucket censuses before any window.
  */
object QueriesER extends QueryPack {
  import Q._

  case class HoltDay(day: Long, y: Long)
  case class HoltOut(n_days: Long, level: Long, trend: Long,
      forecast_30d: Long, total_abs_err: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q582
    QDef("q582_holt_linear",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("y"))
          .as[HoltDay]
        daily.coalesce(1).sortWithinPartitions("day")
          .mapPartitions { it =>
            var l = 0L; var b = 0L; var n = 0L; var tae = 0L
            var first = true
            it.foreach { d =>
              if (first) { l = d.y; b = 0L; first = false }
              else {
                val pred = l + b
                val e = d.y - pred
                tae += math.abs(e)
                // α = β = 1/4 in exact integer arithmetic:
                // l' = pred + e/4 ; b' = b + (l' - l - b)/4
                val l2 = pred + (if (e < 0) -((-e) / 4) else e / 4)
                val db = l2 - l - b
                b = b + (if (db < 0) -((-db) / 4) else db / 4)
                l = l2
              }
              n += 1
            }
            if (n == 0) Iterator.empty
            else Iterator.single(HoltOut(n, l, b, l + 30 * b, tae))
          }
          .toDF()
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(count(*) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        r AS (
          SELECT day, y, row_number() OVER (ORDER BY day) AS rn,
                 count(*) OVER () AS cnt
          FROM daily),
        h AS (
          SELECT rn, cnt, CAST(y AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
                 CAST(0 AS BIGINT) AS tae
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.rn, r.cnt,
                 -- l' = (l+b) + trunc((y-(l+b))/4)
                 h.l + h.b + CASE WHEN r.y - h.l - h.b < 0
                   THEN -((h.l + h.b - r.y) // 4)
                   ELSE (r.y - h.l - h.b) // 4 END,
                 -- b' = b + trunc((l'-l-b)/4) with l' inlined
                 h.b + CASE WHEN (CASE WHEN r.y - h.l - h.b < 0
                     THEN -((h.l + h.b - r.y) // 4)
                     ELSE (r.y - h.l - h.b) // 4 END) < 0
                   THEN -((-(CASE WHEN r.y - h.l - h.b < 0
                     THEN -((h.l + h.b - r.y) // 4)
                     ELSE (r.y - h.l - h.b) // 4 END)) // 4)
                   ELSE (CASE WHEN r.y - h.l - h.b < 0
                     THEN -((h.l + h.b - r.y) // 4)
                     ELSE (r.y - h.l - h.b) // 4 END) // 4 END,
                 h.tae + abs(r.y - h.l - h.b)
          FROM r JOIN h ON r.rn = h.rn + 1),
        fin AS (SELECT * FROM h WHERE rn = cnt)
        SELECT CAST(cnt AS BIGINT) AS n_days, l AS level, b AS trend,
               l + 30 * b AS forecast_30d, tae AS total_abs_err
        FROM fin""")),

    // --------------------------------------------------------------- q583
    QDef("q583_ks_test",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 10000 AS b",
            """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1L ELSE 0L END AS g""")
          .groupBy("b").agg(
            sum("g").cast("long").as("c1"),
            (count(lit(1)) - sum("g")).cast("long").as("c0"))
        val tot = cells.agg(sum("c1").cast("long").as("n1"),
          sum("c0").cast("long").as("n0"))
        val w = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val d = cells.crossJoin(broadcast(tot))
          .withColumn("cum1", sum("c1").over(w).cast("long"))
          .withColumn("cum0", sum("c0").over(w).cast("long"))
          .selectExpr("b", "n1", "n0",
            "abs(cum1 * 1000000 DIV n1 - cum0 * 1000000 DIV n0) AS dv")
        d.groupBy("n1", "n0")
          .agg(max(struct(col("dv"), expr("-b").as("nb"))).as("m"))
          .selectExpr("n1", "n0", "m.dv AS d_ppm", "-m.nb AS at_bucket",
            """CAST(floor(CAST(m.dv AS DOUBLE) / 1000000
                 / (1.358 * sqrt((CAST(n1 AS DOUBLE) + n0)
                     / (CAST(n1 AS DOUBLE) * n0))) * 1000) AS BIGINT)
               AS crit_ratio_milli""")
      },
      Some("""
        WITH cells AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 10000 AS b,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS c0
          FROM orders GROUP BY 1),
        tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                       CAST(sum(c0) AS BIGINT) AS n0 FROM cells),
        d AS (
          SELECT b, n1, n0,
                 abs(CAST(sum(c1) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                       * 1000000 // n1 AS BIGINT)
                   - CAST(sum(c0) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                       * 1000000 // n0 AS BIGINT)) AS dv
          FROM cells, tot),
        mx AS (
          SELECT n1, n0, dv AS d_ppm, b AS at_bucket
          FROM d ORDER BY dv DESC, b LIMIT 1)
        SELECT n1, n0, d_ppm, at_bucket,
               CAST(floor(CAST(d_ppm AS DOUBLE) / 1000000
                 / (1.358 * sqrt((CAST(n1 AS DOUBLE) + n0)
                     / (CAST(n1 AS DOUBLE) * n0))) * 1000) AS BIGINT)
                 AS crit_ratio_milli
        FROM mx""")),

    // --------------------------------------------------------------- q584
    QDef("q584_benford_audit",
      (s, dir) => {
        val digits = t(s, dir, "orders")
          .where(col("o_totalprice") > 0)
          .selectExpr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS d")
          .groupBy("d").agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum("n").cast("long").as("nt"))
        digits.crossJoin(broadcast(tot))
          .selectExpr("d", "n",
            "n * 1000000 DIV nt AS obs_ppm",
            """CAST(floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000) AS BIGINT)
               AS benford_ppm""")
          .selectExpr("d", "n", "obs_ppm", "benford_ppm",
            "abs(obs_ppm - benford_ppm) AS dev_ppm")
          .orderBy("d")
      },
      Some("""
        WITH digits AS (
          SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS d,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM digits)
        SELECT d, n, n * 1000000 // nt AS obs_ppm,
               CAST(floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000) AS BIGINT)
                 AS benford_ppm,
               abs(n * 1000000 // nt
                 - CAST(floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000)
                     AS BIGINT)) AS dev_ppm
        FROM digits, tot ORDER BY d""")),

    // --------------------------------------------------------------- q585
    QDef("q585_gini_grouped",
      (s, dir) => {
        // customer revenue → bounded value buckets (1k-dollar bands);
        // grouped-data Gini from bucket prefix sums, DECIMAL(38,0)
        // numerators (rank×value products cross int64 at scale)
        val custRev = t(s, dir, "orders")
          .selectExpr("o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("o_custkey").agg(sum("cents").cast("long").as("rev"))
        val buckets = custRev
          .groupBy(expr("rev DIV 10000000").as("bk"))
          .agg(count(lit(1)).as("cnt"), sum("rev").cast("long").as("mass"))
        val w = Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = buckets
          .withColumn("cumN", sum("cnt").over(w).cast("long"))
          .withColumn("cumM", sum("mass").over(w).cast("long"))
        // grouped Gini: Σ_b mass_b·(2·cumN_b − cnt_b) approximates
        // 2Σ i·x_i with within-bucket order collapsed (documented bound)
        val tot = buckets.agg(sum("cnt").cast("long").as("n"),
          sum("mass").cast("decimal(38,0)").as("m"))
        pre.crossJoin(broadcast(tot))
          .selectExpr("n", "m",
            """CAST(mass AS DECIMAL(38,0)) * (2 * cumN - cnt + 1)
               AS term""")
          .groupBy("n", "m")
          .agg(sum("term").as("s2"))
          .where(expr("n > 0 AND m > 0"))
          .selectExpr("n AS n_customers",
            """CAST(floor((CAST(s2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) - 1.0
                 - 1.0 / n) * 1000000) AS BIGINT) AS gini_ppm""")
      },
      Some("""
        WITH custrev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        buckets AS (
          SELECT rev // 10000000 AS bk, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(rev) AS BIGINT) AS mass
          FROM custrev GROUP BY 1),
        pre AS (
          SELECT bk, cnt, mass,
                 CAST(sum(cnt) OVER (ORDER BY bk ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cumN,
                 CAST(sum(mass) OVER (ORDER BY bk ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cumM
          FROM buckets),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                       CAST(sum(mass) AS HUGEINT) AS m FROM buckets),
        c AS (
          SELECT n, m,
                 CAST(sum(CAST(mass AS HUGEINT) * (2 * cumN - cnt + 1))
                   AS HUGEINT) AS s2
          FROM pre, tot GROUP BY 1, 2)
        SELECT n AS n_customers,
               CAST(floor((CAST(s2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) - 1.0
                 - 1.0 / n) * 1000000) AS BIGINT) AS gini_ppm
        FROM c WHERE n > 0 AND m > 0"""))
  )
}
