package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 32 — statistical monitoring ops:
  *
  *  - q164: chi-square goodness-of-fit of hourly arrival counts against
  *    the uniform rate: χ² = Σ (24·o_h − N)² / (24·N) with an exact
  *    BIGINT numerator and ONE final IEEE division (floor-micro) — "is
  *    the collection rate flat" monitoring.
  *  - q165: functional-dependency audit — for candidate FDs (X → Y),
  *    keys with more than one distinct Y are violations. One true FD
  *    (l_partkey → p_brand through the part table) and one deliberately
  *    false one (l_partkey → l_suppkey) prove both paths. The
  *    profiling/constraint-discovery shape.
  *  - q166: Kolmogorov–Smirnov drift — first vs second half-month value
  *    distributions: D = max_v |cdf₁ − cdf₂| computed EXACTLY as
  *    max |c1·n2 − c2·n1| over the merged support (BIGINT), divided
  *    once at the end. The distribution-drift monitor without any
  *    binning loss.
  */
object QueriesAM extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q164_arrival_gof",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .selectExpr(s"(($tsMs) DIV 3600000) % 24 AS hour")
          .groupBy("hour").agg(count(lit(1)).as("o"))
        val tot = hourly.agg(sum("o").cast("bigint").as("n"),
          count(lit(1)).cast("bigint").as("n_hours"),
          max("o").cast("bigint").as("max_hour"),
          min("o").cast("bigint").as("min_hour"))
        val num = hourly.crossJoin(broadcast(tot.select("n")))
          .agg(sum(expr("(24 * o - n) * (24 * o - n)")).cast("bigint").as("chi_num"))
        tot.crossJoin(num)
          .selectExpr("n", "n_hours", "max_hour", "min_hour", "chi_num",
            """CAST(floor(CAST(chi_num AS DOUBLE) / CAST(24 * n AS DOUBLE)
               * 1000000) AS BIGINT) AS chi2_micro""")
      },
      Some("""
        WITH hourly AS (
          SELECT (epoch_ms(ts) // 3600000) % 24 AS hour, count(*) AS o
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                       count(*) AS n_hours,
                       CAST(max(o) AS BIGINT) AS max_hour,
                       CAST(min(o) AS BIGINT) AS min_hour
                FROM hourly),
        num AS (
          SELECT CAST(sum((24 * o - t.n) * (24 * o - t.n)) AS BIGINT) AS chi_num
          FROM hourly, tot t)
        SELECT n, n_hours, max_hour, min_hour, chi_num,
               CAST(floor(CAST(chi_num AS DOUBLE) / CAST(24 * n AS DOUBLE)
                 * 1000000) AS BIGINT) AS chi2_micro
        FROM tot, num""")),

    QDef("q165_fd_audit",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val withBrand = li.join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        def audit(df: org.apache.spark.sql.DataFrame, x: String, y: String,
                  fd: String) =
          df.groupBy(col(x)).agg(countDistinct(col(y)).as("nd"))
            .agg(count(lit(1)).cast("bigint").as("n_keys"),
              sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("bigint")
                .as("n_violating"))
            .withColumn("fd", lit(fd))
        audit(withBrand, "l_partkey", "p_brand", "l_partkey->p_brand")
          .unionByName(audit(li, "l_partkey", "l_suppkey", "l_partkey->l_suppkey"))
          .withColumn("violation_bp", expr("n_violating * 10000 DIV n_keys"))
          .select("fd", "n_keys", "n_violating", "violation_bp")
          .orderBy("fd")
      },
      Some("""
        WITH fd1 AS (
          SELECT 'l_partkey->p_brand' AS fd,
                 count(*) AS n_keys,
                 CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
          FROM (SELECT l_partkey, count(DISTINCT p_brand) AS nd
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY 1)),
        fd2 AS (
          SELECT 'l_partkey->l_suppkey' AS fd,
                 count(*) AS n_keys,
                 CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
          FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
                FROM lineitem GROUP BY 1))
        SELECT fd, n_keys, n_violating,
               n_violating * 10000 // n_keys AS violation_bp
        FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2)
        ORDER BY fd""")),

    QDef("q166_ks_drift",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val mid = ev.agg(expr("(min(day) + max(day)) DIV 2").as("mid"))
        val halves = ev.crossJoin(broadcast(mid))
          .withColumn("h", when(col("day") <= col("mid"), 1).otherwise(2))
        val counts = halves.groupBy("vc")
          .agg(sum(when(col("h") === 1, 1L).otherwise(0L)).as("c1"),
            sum(when(col("h") === 2, 1L).otherwise(0L)).as("c2"))
        val tot = halves.agg(
          sum(when(col("h") === 1, 1L).otherwise(0L)).cast("bigint").as("n1"),
          sum(when(col("h") === 2, 1L).otherwise(0L)).cast("bigint").as("n2"))
        // both ECDF cumsums two-phase over the distinct-value domain
        graft.operators.ScaleRank.withGlobalRunningSums(counts,
            Seq(col("vc")), Seq(col("c1") -> "cum1", col("c2") -> "cum2"))
          .crossJoin(broadcast(tot))
          .withColumn("dev", abs(expr("cum1 * n2 - cum2 * n1")))
          .agg(max("n1").as("n1"), max("n2").as("n2"),
            max("dev").cast("bigint").as("d_num"))
          .selectExpr("n1", "n2", "d_num",
            """CAST(floor(CAST(d_num AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
               * 1000000) AS BIGINT) AS ks_micro""")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events),
        mid AS (SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS mid FROM ev),
        h AS (SELECT vc, CASE WHEN day <= mid THEN 1 ELSE 2 END AS h FROM ev, mid),
        tot AS (
          SELECT CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN h = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM h),
        counts AS (
          SELECT vc,
                 CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN h = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM h GROUP BY 1),
        cum AS (
          SELECT vc,
                 CAST(sum(c1) OVER (ORDER BY vc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
                 CAST(sum(c2) OVER (ORDER BY vc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
          FROM counts)
        SELECT t.n1, t.n2,
               CAST(max(abs(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS d_num,
               CAST(floor(CAST(max(abs(cum1 * t.n2 - cum2 * t.n1)) AS DOUBLE)
                 / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))
                 * 1000000) AS BIGINT) AS ks_micro
        FROM cum, tot t
        GROUP BY t.n1, t.n2"""))
  )
}
