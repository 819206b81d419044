package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 93 — time-warp alignment, categorical
  * divergence, process mining, weighted sampling:
  *
  *  - q395: dynamic time warping — per-day 24-hour click vs view count
  *    curves, full-window DTW with |Δ| cost. Spark side: per-day arrays →
  *    a typed Dataset map running the O(24²) DP (the q124/q297
  *    sequential-recurrence pattern: each day's DP is independent, so
  *    the operator partitions perfectly). Oracle: one recursive CTE over
  *    step t = i·24+j carrying (prev row, current partial row) lists —
  *    all-BIGINT, bit-exact across engines. Invariant: DTW ≤ the
  *    no-warp diagonal cost.
  *  - q396: categorical KL divergence + entropy — event-type mix per
  *    user cohort vs the global mix, Laplace-smoothed, per-cell
  *    floor-pico terms (order-independent integer sums); the
  *    segment-behavior-drift monitor (PSI q386 is its binned-continuous
  *    sibling).
  *  - q397: eventually-follows matrix — per (user, day) case, type a
  *    eventually-precedes type b iff min_ts(a) < max_ts(b); counts and
  *    shares over cases containing both. The process-mining footprint
  *    matrix (q75 is the adjacent-transition variant).
  *  - q398: weighted sampling without replacement (Efraimidis–Spirakis)
  *    — score = ln(u)/w with u from the portable hash, top-10 per part
  *    type by floor-pico score; reproducible weighted reservoir for
  *    corpus curation.
  *
  * Reference analog: aligning harvest-load curves across days,
  * per-AOI response-type mix drift, scrape-task orderings,
  * price-weighted listing sampling.
  */
object QueriesCV extends QueryPack {
  import Q._

  case class DtwRow(d: Long, a: Seq[Long], b: Seq[Long])
  case class DtwOut(d: Long, dtw_cost: Long, diag_cost: Long, gain_bp: Long)

  /** Full-window DTW over two equal-length integer series, |Δ| cost. */
  private def dtw(a: Seq[Long], b: Seq[Long]): Long = {
    val n = a.length
    val dp = Array.ofDim[Long](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val c = math.abs(a(i) - b(j))
        dp(i)(j) =
          if (i == 0 && j == 0) c
          else if (i == 0) c + dp(i)(j - 1)
          else if (j == 0) c + dp(i - 1)(j)
          else c + math.min(dp(i - 1)(j),
            math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        j += 1
      }
      i += 1
    }
    dp(n - 1)(n - 1)
  }

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q395
    QDef("q395_dtw",
      (s, dir) => {
        import s.implicits._
        val hourly = t(s, dir, "events")
          .where(col("event_type").isin("click", "view"))
          .selectExpr(s"($tsMs) DIV 86400000 AS d",
            s"CAST((($tsMs) DIV 3600000) % 24 AS INT) AS h", "event_type")
          .groupBy("d", "h", "event_type").agg(count(lit(1)).as("c"))
        val arrs = hourly.groupBy("d").agg(
          map_from_entries(collect_list(when(col("event_type") === "click",
            struct(col("h"), col("c"))))).as("ma"),
          map_from_entries(collect_list(when(col("event_type") === "view",
            struct(col("h"), col("c"))))).as("mb"))
          .selectExpr("d",
            "transform(sequence(0, 23), h -> coalesce(ma[h]," +
              " CAST(0 AS BIGINT))) AS a",
            "transform(sequence(0, 23), h -> coalesce(mb[h]," +
              " CAST(0 AS BIGINT))) AS b")
        arrs.as[DtwRow].map { r =>
          val cost = dtw(r.a, r.b)
          val diag = r.a.zip(r.b).map { case (x, y) => math.abs(x - y) }.sum
          val gain = if (diag == 0) 0L else (diag - cost) * 10000L / diag
          DtwOut(r.d, cost, diag, gain)
        }.toDF().orderBy("d")
      },
      Some("""
        WITH RECURSIVE hourly AS (
          SELECT epoch_ms(ts) // 86400000 AS d,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS h,
                 event_type, count(*) AS c
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY 1, 2, 3),
        grid AS (
          SELECT d, h FROM (SELECT DISTINCT d FROM hourly)
          CROSS JOIN (SELECT CAST(unnest(generate_series(0, 23)) AS INT)
            AS h)),
        filled AS (
          SELECT g.d, g.h,
            coalesce(max(CASE WHEN event_type = 'click' THEN c END), 0)
              AS ca,
            coalesce(max(CASE WHEN event_type = 'view' THEN c END), 0)
              AS cb
          FROM grid g LEFT JOIN hourly USING (d, h) GROUP BY 1, 2),
        days AS (
          SELECT d, list(ca ORDER BY h) AS a, list(cb ORDER BY h) AS b,
                 CAST(sum(abs(ca - cb)) AS BIGINT) AS diag_cost
          FROM filled GROUP BY 1),
        dp AS (
          SELECT d, 0 AS t, CAST([] AS BIGINT[]) AS prev,
                 [abs(a[1] - b[1])] AS curr
          FROM days
          UNION ALL
          SELECT dp.d, t + 1,
                 CASE WHEN (t + 1) % 24 = 0 THEN curr ELSE prev END,
                 CASE WHEN (t + 1) % 24 = 0
                   THEN [abs(a[(t + 1) // 24 + 1] - b[1]) + curr[1]]
                   ELSE list_append(curr,
                     abs(a[(t + 1) // 24 + 1] - b[(t + 1) % 24 + 1]) +
                     CASE WHEN (t + 1) // 24 = 0 THEN curr[len(curr)]
                          ELSE least(curr[len(curr)],
                                     prev[(t + 1) % 24],
                                     prev[(t + 1) % 24 + 1]) END)
                   END
          FROM dp JOIN days USING (d) WHERE t < 575)
        SELECT d, curr[24] AS dtw_cost, diag_cost,
               CASE WHEN diag_cost = 0 THEN 0
                    ELSE (diag_cost - curr[24]) * 10000 // diag_cost END
                 AS gain_bp
        FROM dp JOIN days USING (d) WHERE t = 575
        ORDER BY d""")),

    // --------------------------------------------------------------- q396
    QDef("q396_kl_categorical",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id % 10 AS cohort", "event_type")
        val cells = ev.groupBy("cohort", "event_type")
          .agg(count(lit(1)).as("c"))
        val grid = ev.select("cohort").distinct()
          .crossJoin(ev.select("event_type").distinct())
          .join(cells, Seq("cohort", "event_type"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val glob = ev.groupBy("event_type").agg(count(lit(1)).as("gc"))
          .crossJoin(ev.agg(count(lit(1)).as("n_tot")))
        val tot = grid.groupBy("cohort").agg(sum("c").cast("bigint").as("n"))
        grid.join(tot, Seq("cohort")).join(glob, Seq("event_type"))
          .selectExpr("cohort", "n",
            s"CAST(floor(($KlTerm) * 1000000000000) AS BIGINT) AS klp",
            s"CAST(floor(($EntTerm) * 1000000000000) AS BIGINT) AS hp")
          .groupBy("cohort", "n")
          .agg(sum("klp").cast("bigint").as("kl_pico"),
            sum("hp").cast("bigint").as("h_pico"))
          .selectExpr("cohort", "n", "kl_pico", "h_pico")
          .orderBy("cohort")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id % 10 AS cohort, event_type FROM events),
        cells AS (
          SELECT cohort, event_type, count(*) AS c
          FROM ev GROUP BY 1, 2),
        grid AS (
          SELECT g0.cohort, t0.event_type, coalesce(c.c, 0) AS c
          FROM (SELECT DISTINCT cohort FROM ev) g0
          CROSS JOIN (SELECT DISTINCT event_type FROM ev) t0
          LEFT JOIN cells c
            ON c.cohort = g0.cohort AND c.event_type = t0.event_type),
        gstats AS (
          SELECT event_type, count(*) AS gc,
                 (SELECT count(*) FROM ev) AS n_tot
          FROM ev GROUP BY 1),
        tot AS (
          SELECT cohort, CAST(sum(c) AS BIGINT) AS n FROM grid GROUP BY 1),
        terms AS (
          SELECT cohort, n,
                 CAST(floor(($KlTerm) * 1000000000000) AS BIGINT) AS klp,
                 CAST(floor(($EntTerm) * 1000000000000) AS BIGINT) AS hp
          FROM grid JOIN tot USING (cohort) JOIN gstats USING (event_type))
        SELECT cohort, n, CAST(sum(klp) AS BIGINT) AS kl_pico,
               CAST(sum(hp) AS BIGINT) AS h_pico
        FROM terms GROUP BY 1, 2 ORDER BY cohort""")),

    // --------------------------------------------------------------- q397
    QDef("q397_follows_matrix",
      (s, dir) => {
        val spans = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS d",
            "event_type", "ts")
          .groupBy("user_id", "d", "event_type")
          .agg(min("ts").as("mn"), max("ts").as("mx"))
        val a = spans.selectExpr("user_id", "d", "event_type AS ta",
          "mn AS mna")
        val b = spans.selectExpr("user_id", "d", "event_type AS tb",
          "mx AS mxb")
        a.join(b, Seq("user_id", "d")).where(col("ta") =!= col("tb"))
          .groupBy("ta", "tb")
          .agg(count(lit(1)).as("n_both"),
            sum(when(col("mna") < col("mxb"), 1L).otherwise(0L))
              .cast("bigint").as("n_follows"))
          .selectExpr("ta", "tb", "n_follows", "n_both",
            "n_follows * 10000 DIV n_both AS share_bp")
          .orderBy("ta", "tb")
      },
      Some("""
        WITH spans AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS d, event_type,
                 min(ts) AS mn, max(ts) AS mx
          FROM events GROUP BY 1, 2, 3)
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_follows,
               count(*) AS n_both,
               CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS share_bp
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.d = b.d
          AND a.event_type <> b.event_type
        GROUP BY 1, 2 ORDER BY ta, tb""")),

    // --------------------------------------------------------------- q398
    QDef("q398_weighted_sample",
      (s, dir) => {
        val scored = t(s, dir, "part")
          .withColumn("u_int",
            PortableHash.md5Long(col("p_partkey"), salt = "ws~") % 1000000)
          .selectExpr("p_type", "p_partkey",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS w_cents",
            s"CAST(floor(($EsScore) * 1000000000000) AS BIGINT)" +
              " AS score_pico")
        scored
          .withColumn("rk", row_number().over(Window.partitionBy("p_type")
            .orderBy(col("score_pico").desc, col("p_partkey"))))
          .where(col("rk") <= 10)
          .selectExpr("p_type", "CAST(rk AS BIGINT) AS rk", "p_partkey",
            "w_cents", "score_pico")
          .orderBy("p_type", "rk")
      },
      Some {
        val h = PortableHash.md5LongSql("CAST(p_partkey AS VARCHAR)",
          salt = "ws~")
        s"""
        WITH scored AS (
          SELECT p_type, p_partkey,
                 CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                   AS w_cents,
                 $h % 1000000 AS u_int
          FROM part),
        keyed AS (
          SELECT p_type, p_partkey, w_cents,
                 CAST(floor(($EsScore) * 1000000000000) AS BIGINT)
                   AS score_pico
          FROM scored),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY p_type
                   ORDER BY score_pico DESC, p_partkey) AS rk
          FROM keyed)
        SELECT p_type, CAST(rk AS BIGINT) AS rk, p_partkey, w_cents,
               score_pico
        FROM ranked WHERE rk <= 10
        ORDER BY p_type, rk"""
      })
  )

  /** KL summand p·ln(p/q), Laplace-smoothed over 5 categories, ONE
    * IEEE op order (p from cohort cell, q from global). */
  private val KlTerm =
    """((CAST(c AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + 5.0))
      * ln(((CAST(c AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + 5.0))
         / ((CAST(gc AS DOUBLE) + 1.0) / (CAST(n_tot AS DOUBLE) + 5.0)))"""

  /** Entropy summand −p·ln(p) ≥ 0, same smoothing and op order. */
  private val EntTerm =
    """-(((CAST(c AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + 5.0))
      * ln((CAST(c AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + 5.0)))"""

  /** Efraimidis–Spirakis key ln(u)/w (monotone in u^(1/w)); u ∈ (0,1)
    * from the portable hash. */
  private val EsScore =
    """ln((CAST(u_int AS DOUBLE) + 1.0) / 1000001.0)
      / CAST(w_cents AS DOUBLE)"""
}
