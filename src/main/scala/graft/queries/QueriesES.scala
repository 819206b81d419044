package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 142 — temporal algebra, sequential
  * drift detection, interval coverage, and deterministic weighted
  * sampling:
  *
  *  - q586: full Allen-relation census: each order's fulfillment
  *    interval [order day, last ship day] classified against 4 fixed
  *    promo windows into the 13 Allen relations (exhaustive CASE
  *    ladder mirrored in the oracle); counts per (window, relation).
  *    Generalizes q213's equal-length fragment to unequal intervals.
  *  - q587: Page–Hinkley drift detector on the daily order counts:
  *    exact milli-unit recurrence m_t = m_{t-1} + 1000·y_t −
  *    cummean_milli − δ with running minimum and λ alerts — the
  *    sequential companion to q134's batch CUSUM argmax. Secondary-
  *    sort path on the bounded day aggregate, recursive-CTE oracle.
  *  - q588: interval-union coverage per customer: overlapping order
  *    intervals merged by the classic +1/−1 boundary sweep (prefix
  *    sums inside a per-customer window, high-cardinality partition);
  *    outputs the coverage histogram (days covered, merged runs).
  *  - q589: Efraimidis–Spirakis weighted sampling without replacement
  *    (top-20 parts by revenue weight) with a DETERMINISTIC uniform
  *    from the portable md5 hash — exactly reproducible in both
  *    engines, the distributed weighted-sample primitive.
  *
  * Scale shapes: q586 is a broadcast of 4 windows against the order
  * aggregate; q587 iterates on the bounded day domain; q588 windows
  * partition by customer; q589 is one hash-agg + TakeOrdered(20).
  */
object QueriesES extends QueryPack {
  import Q._

  case class PhDay(day: Long, y: Long)
  case class PhOut(n_days: Long, n_alerts: Long, first_alert_day: Long,
      max_gap_milli: Long)

  private val allenCase = """CASE
      WHEN e < ws THEN 'before'
      WHEN e = ws THEN 'meets'
      WHEN s < ws AND e > ws AND e < we THEN 'overlaps'
      WHEN s = ws AND e < we THEN 'starts'
      WHEN s > ws AND e < we THEN 'during'
      WHEN s > ws AND s < we AND e = we THEN 'finishes'
      WHEN s = ws AND e = we THEN 'equals'
      WHEN s < ws AND e = we THEN 'finished_by'
      WHEN s < ws AND e > we THEN 'contains'
      WHEN s = ws AND e > we THEN 'started_by'
      WHEN s > ws AND s < we AND e > we THEN 'overlapped_by'
      WHEN s = we THEN 'met_by'
      ELSE 'after' END"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q586
    QDef("q586_allen_census",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val iv = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), expr("o_orderkey = l_orderkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(max(expr(
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000"))
            .as("e"))
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS s",
            "e")
          .where(expr("e >= s"))
        val windows = Seq((1L, 8400L, 8700L), (2L, 9131L, 9221L),
          (3L, 9500L, 10000L), (4L, 10200L, 10210L))
          .toDF("win_id", "ws", "we")
        iv.crossJoin(broadcast(windows))
          .selectExpr("win_id", s"$allenCase AS rel")
          .groupBy("win_id", "rel").agg(count(lit(1)).as("n"))
          .orderBy("win_id", "rel")
      },
      Some(s"""
        WITH iv AS (
          SELECT epoch_ms(o.o_orderdate) // 86400000 AS s,
                 max(epoch_ms(l.l_shipdate) // 86400000) AS e
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, o.o_orderdate
          HAVING max(epoch_ms(l.l_shipdate) // 86400000)
            >= epoch_ms(o.o_orderdate) // 86400000),
        w AS (SELECT * FROM (VALUES (1, 8400, 8700), (2, 9131, 9221),
                (3, 9500, 10000), (4, 10200, 10210)) t(win_id, ws, we))
        SELECT CAST(win_id AS BIGINT) AS win_id, $allenCase AS rel,
               CAST(count(*) AS BIGINT) AS n
        FROM iv, w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // --------------------------------------------------------------- q587
    QDef("q587_page_hinkley",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("y"))
          .as[PhDay]
        val deltaM = 500L   // δ = 0.5 in milli
        val lambdaM = 50000L // λ = 50 in milli
        daily.coalesce(1).sortWithinPartitions("day")
          .mapPartitions { it =>
            var m = 0L; var minM = 0L; var cum = 0L; var n = 0L
            var alerts = 0L; var firstDay = -1L; var maxGap = 0L
            it.foreach { d =>
              cum += d.y; n += 1
              val meanMilli = cum * 1000L / n
              m += d.y * 1000L - meanMilli - deltaM
              if (m < minM) minM = m
              val gap = m - minM
              if (gap > maxGap) maxGap = gap
              if (gap > lambdaM) {
                alerts += 1
                if (firstDay < 0) firstDay = d.day
              }
            }
            if (n == 0) Iterator.empty
            else Iterator.single(PhOut(n, alerts, firstDay, maxGap))
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
          SELECT rn, cnt, day, y AS cum,
                 y * 1000 - y * 1000 // 1 - 500 AS m,
                 least(CAST(0 AS BIGINT),
                   y * 1000 - y * 1000 // 1 - 500) AS minm,
                 greatest(CAST(0 AS BIGINT),
                   (y * 1000 - y * 1000 // 1 - 500)
                   - least(CAST(0 AS BIGINT),
                       y * 1000 - y * 1000 // 1 - 500)) AS maxgap,
                 CASE WHEN (y * 1000 - y * 1000 // 1 - 500)
                   - least(CAST(0 AS BIGINT),
                       y * 1000 - y * 1000 // 1 - 500) > 50000
                   THEN 1 ELSE 0 END AS alerts,
                 CASE WHEN (y * 1000 - y * 1000 // 1 - 500)
                   - least(CAST(0 AS BIGINT),
                       y * 1000 - y * 1000 // 1 - 500) > 50000
                   THEN day ELSE -1 END AS firstday
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.rn, r.cnt, r.day, h.cum + r.y,
                 h.m + r.y * 1000 - (h.cum + r.y) * 1000 // r.rn - 500,
                 least(h.minm,
                   h.m + r.y * 1000 - (h.cum + r.y) * 1000 // r.rn - 500),
                 greatest(h.maxgap,
                   (h.m + r.y * 1000 - (h.cum + r.y) * 1000 // r.rn - 500)
                   - least(h.minm, h.m + r.y * 1000
                       - (h.cum + r.y) * 1000 // r.rn - 500)),
                 h.alerts + CASE WHEN
                   (h.m + r.y * 1000 - (h.cum + r.y) * 1000 // r.rn - 500)
                   - least(h.minm, h.m + r.y * 1000
                       - (h.cum + r.y) * 1000 // r.rn - 500) > 50000
                   THEN 1 ELSE 0 END,
                 CASE WHEN h.firstday >= 0 THEN h.firstday
                   WHEN (h.m + r.y * 1000 - (h.cum + r.y) * 1000 // r.rn - 500)
                     - least(h.minm, h.m + r.y * 1000
                         - (h.cum + r.y) * 1000 // r.rn - 500) > 50000
                   THEN r.day ELSE -1 END
          FROM r JOIN h ON r.rn = h.rn + 1)
        SELECT CAST(cnt AS BIGINT) AS n_days,
               CAST(alerts AS BIGINT) AS n_alerts,
               firstday AS first_alert_day, maxgap AS max_gap_milli
        FROM h WHERE rn = cnt""")),

    // --------------------------------------------------------------- q588
    QDef("q588_interval_union",
      (s, dir) => {
        val iv = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), expr("o_orderkey = l_orderkey"))
          .groupBy("o_orderkey", "o_custkey", "o_orderdate")
          .agg(max(expr(
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000"))
            .as("e"))
          .selectExpr("o_custkey AS ck",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS s",
            "e")
          .where(expr("e >= s"))
        // boundary sweep: +1 at s, −1 at e+1 (closed intervals in days);
        // depth>0 segments are covered; new run when depth rises from 0
        // r12 DUAL PATH: the sweep is per-customer sequential work over
        // the |orders|-bounded interval census — under the gate it runs
        // driver-side after ONE census job (the iv aggregation), deleting
        // the boundary re-aggregation + 2 window passes + 2 rollup
        // exchanges. limit(gate+1) bounds driver memory without a count
        // job; past the gate, the frames sweep below.
        val gate = 2000000
        val ivRows = iv.limit(gate + 1).collect()
        if (ivRows.length <= gate) {
          val sc2 = s
          import sc2.implicits._
          val buckets = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
          ivRows.iterator.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .toSeq.groupBy(_._1).foreach { case (_, g) =>
              val bnd = scala.collection.mutable.HashMap.empty[Long, Long]
              g.foreach { case (_, s0, e0) =>
                bnd(s0) = bnd.getOrElse(s0, 0L) + 1L
                bnd(e0 + 1) = bnd.getOrElse(e0 + 1, 0L) - 1L
              }
              val xs = bnd.toArray.sortBy(_._1)
              var depth = 0L; var cov = 0L; var runs0 = 0L
              var i = 0
              while (i < xs.length) {
                val (x, d) = xs(i)
                depth += d
                if (depth > 0 && i + 1 < xs.length) cov += xs(i + 1)._1 - x
                if (depth > 0 && depth - d == 0) runs0 += 1
                i += 1
              }
              val bk = cov / 100
              val (c, tr) = buckets.getOrElse(bk, (0L, 0L))
              buckets(bk) = (c + 1, tr + runs0)
            }
          buckets.toSeq.map { case (bk, (c, tr)) => (bk, c, tr) }
            .sortBy(_._1)
            .toDF("cov_bucket", "n_customers", "total_runs")
        } else {
        val bnd = iv.selectExpr("ck", "s AS x", "1L AS d")
          .unionByName(iv.selectExpr("ck", "e + 1 AS x", "-1L AS d"))
          .groupBy("ck", "x").agg(sum("d").cast("long").as("d"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ck").orderBy("x")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        val runs = bnd
          .withColumn("depth", sum("d").over(w).cast("long"))
          .withColumn("nxt", lead("x", 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("ck").orderBy("x")))
          .selectExpr("ck",
            "CASE WHEN depth > 0 AND nxt IS NOT NULL THEN nxt - x ELSE 0 END AS cov",
            "CASE WHEN depth > 0 AND depth - d = 0 THEN 1L ELSE 0L END AS run0")
          .groupBy("ck").agg(
            sum("cov").cast("long").as("days_covered"),
            sum("run0").cast("long").as("merged_runs"))
        runs.groupBy(expr("days_covered DIV 100").as("cov_bucket"))
          .agg(count(lit(1)).as("n_customers"),
            sum("merged_runs").cast("long").as("total_runs"))
          .orderBy("cov_bucket")
        }
      },
      Some("""
        WITH iv AS (
          SELECT o.o_custkey AS ck,
                 epoch_ms(o.o_orderdate) // 86400000 AS s,
                 max(epoch_ms(l.l_shipdate) // 86400000) AS e
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
          HAVING max(epoch_ms(l.l_shipdate) // 86400000)
            >= epoch_ms(o.o_orderdate) // 86400000),
        bnd AS (
          SELECT ck, x, CAST(sum(d) AS BIGINT) AS d FROM (
            SELECT ck, s AS x, 1 AS d FROM iv
            UNION ALL SELECT ck, e + 1 AS x, -1 AS d FROM iv)
          GROUP BY 1, 2),
        runs AS (
          SELECT ck,
                 CASE WHEN depth > 0 AND nxt IS NOT NULL
                   THEN nxt - x ELSE 0 END AS cov,
                 CASE WHEN depth > 0 AND depth - d = 0 THEN 1 ELSE 0 END
                   AS run0
          FROM (
            SELECT ck, x, d,
                   CAST(sum(d) OVER (PARTITION BY ck ORDER BY x
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS depth,
                   lead(x) OVER (PARTITION BY ck ORDER BY x) AS nxt
            FROM bnd)),
        agg AS (
          SELECT ck, CAST(sum(cov) AS BIGINT) AS days_covered,
                 CAST(sum(run0) AS BIGINT) AS merged_runs
          FROM runs GROUP BY 1)
        SELECT days_covered // 100 AS cov_bucket,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(merged_runs) AS BIGINT) AS total_runs
        FROM agg GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q589
    QDef("q589_weighted_sample",
      (s, dir) => {
        val pv = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v")
          .groupBy("l_partkey").agg(sum("v").cast("long").as("w"))
          .where(col("w") > 0)
        // Efraimidis–Spirakis key = ln(u)/w with a deterministic
        // portable uniform u ∈ (0, 1] from the md5 hash of the key
        pv.withColumn("u_ppm",
            (PortableHash.md5Long(col("l_partkey").cast("string"),
              "es-sample") % 1000000L + 1L))
          .selectExpr("l_partkey", "w",
            """CAST(floor(ln(CAST(u_ppm AS DOUBLE) / 1000000)
                 / w * 1000000000000000) AS BIGINT) AS key_f""")
          .orderBy(col("key_f").desc, col("l_partkey"))
          .limit(20)
          .selectExpr("l_partkey", "w", "key_f")
      },
      Some(s"""
        WITH pv AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS w
          FROM lineitem GROUP BY 1 HAVING sum(
            CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) > 0),
        k AS (
          SELECT l_partkey, w,
                 ${PortableHash.md5LongSql("CAST(l_partkey AS VARCHAR)",
                   "es-sample")} % 1000000 + 1 AS u_ppm
          FROM pv)
        SELECT l_partkey, w,
               CAST(floor(ln(CAST(u_ppm AS DOUBLE) / 1000000)
                 / w * 1000000000000000) AS BIGINT) AS key_f
        FROM k ORDER BY key_f DESC, l_partkey LIMIT 20"""))
  )
}
