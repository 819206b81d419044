package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 70 — nonparametric statistics and
  * spectral seasonality, all in the exact-arithmetic house style:
  *
  *  - q303: Mann–Whitney rank-sum (returned vs non-returned lineitems,
  *    per linestatus) — midranks doubled to stay in BIGINT, AUC effect
  *    size as exact integer basis: the distribution-free "did returned
  *    items ship in different quantities" test.
  *  - q304: Spearman rank correlation between daily order count and
  *    daily revenue per month — ordinal ranks (deterministic day
  *    tiebreak) so both engines rank identically; rho from the exact
  *    Σd² with one floor-quantized IEEE division.
  *  - q305: Kendall tau-a on the same daily series — concordant /
  *    discordant pair counts via a bounded within-month self-join
  *    (≤ ~465 pairs·month), exact integers end-to-end.
  *  - q306: seasonality spectrum — DFT power of the daily event count
  *    at candidate periods 7/11/30 using cos/sin tables quantized to
  *    1e-6 (integer coefficients shared verbatim between the Spark
  *    expression and the DuckDB SQL), so the dot products are exact
  *    BIGINT and only the final sqrt is IEEE (correctly rounded in
  *    both engines).
  *
  * Reference analog: monitoring collected-data cadence (is harvest
  * volume weekly-periodic), robust correlation of scan effort vs yield
  * (`UBDCTask` accounting), A/B-style comparisons over payload stats.
  */
object QueriesBY extends QueryPack {
  import Q._

  /** `CASE (expr % p) WHEN k THEN round(f(2πk/p)·1e6) …` — the IDENTICAL
    * text goes into Spark selectExpr and DuckDB SQL, so the quantized trig
    * table has one source of truth (coefficients fit INT, both engines
    * promote to BIGINT on multiply). */
  private def trigCase(expr: String, p: Int, f: Double => Double): String = {
    val branches = (0 until p).map { k =>
      s"WHEN $k THEN ${math.round(f(2.0 * math.Pi * k / p) * 1e6)}"
    }
    s"CASE (($expr) % $p) ${branches.mkString(" ")} END"
  }

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q303
    QDef("q303_mannwhitney",
      (s, dir) => {
        val base = t(s, dir, "lineitem").selectExpr(
          "l_linestatus",
          "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v",
          "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS isx")
        val perVal = base.groupBy("l_linestatus", "v")
          .agg(sum("isx").cast("bigint").as("cx"),
            count(lit(1)).as("c"))
        perVal
          // doubled midrank of value v: 2·(#strictly smaller) + (#equal) + 1
          .withColumn("rank2", expr("2 * sum(c) OVER (PARTITION BY l_linestatus ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1"))
          .groupBy("l_linestatus")
          .agg(sum("cx").cast("bigint").as("n1"),
            expr("CAST(sum(c - cx) AS BIGINT)").as("n2"),
            expr("CAST(sum(cx * rank2) AS BIGINT)").as("r2_x"))
          .selectExpr("l_linestatus", "n1", "n2",
            "r2_x",
            "r2_x - n1 * (n1 + 1) AS u2",
            // AUC = U/(n1·n2) = u2/(2·n1·n2); exact positive integer DIV
            "(r2_x - n1 * (n1 + 1)) * 1000000 DIV (2 * n1 * n2) AS auc_micro")
          .orderBy("l_linestatus")
      },
      Some("""
        WITH base AS (
          SELECT l_linestatus,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isx
          FROM lineitem),
        per_val AS (
          SELECT l_linestatus, v,
                 CAST(sum(isx) AS BIGINT) AS cx, count(*) AS c
          FROM base GROUP BY 1, 2),
        ranked AS (
          SELECT l_linestatus, cx, c,
                 2 * sum(c) OVER (PARTITION BY l_linestatus ORDER BY v
                   ROWS UNBOUNDED PRECEDING) - c + 1 AS rank2
          FROM per_val),
        agg AS (
          SELECT l_linestatus,
                 CAST(sum(cx) AS BIGINT) AS n1,
                 CAST(sum(c - cx) AS BIGINT) AS n2,
                 CAST(sum(cx * rank2) AS BIGINT) AS r2_x
          FROM ranked GROUP BY 1)
        SELECT l_linestatus, n1, n2, r2_x,
               r2_x - n1 * (n1 + 1) AS u2,
               (r2_x - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2) AS auc_micro
        FROM agg ORDER BY l_linestatus""")),

    // --------------------------------------------------------------- q304
    QDef("q304_spearman",
      (s, dir) => {
        val daily = t(s, dir, "orders").selectExpr(
          "year(o_orderdate) * 100 + month(o_orderdate) AS ym",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("ym", "d")
          .agg(count(lit(1)).as("n_orders"),
            sum("cents").cast("bigint").as("rev"))
        val wc = Window.partitionBy("ym").orderBy("n_orders", "d")
        val wr = Window.partitionBy("ym").orderBy("rev", "d")
        daily
          .withColumn("rc", row_number().over(wc).cast("long"))
          .withColumn("rr", row_number().over(wr).cast("long"))
          .groupBy("ym")
          .agg(count(lit(1)).as("n_days"),
            expr("CAST(sum((rc - rr) * (rc - rr)) AS BIGINT)").as("sum_d2"))
          .where(col("n_days") >= 3)
          .selectExpr("ym", "n_days", "sum_d2",
            """CAST(floor((1 - 6 * CAST(sum_d2 AS DOUBLE)
               / CAST(n_days * (n_days * n_days - 1) AS DOUBLE))
               * 1000000) AS BIGINT) AS rho_micro""")
          .orderBy("ym")
      },
      Some("""
        WITH daily AS (
          SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                 epoch_ms(o_orderdate) // 86400000 AS d,
                 count(*) AS n_orders,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders GROUP BY 1, 2),
        ranked AS (
          SELECT ym,
                 CAST(row_number() OVER (PARTITION BY ym ORDER BY n_orders, d)
                   AS BIGINT) AS rc,
                 CAST(row_number() OVER (PARTITION BY ym ORDER BY rev, d)
                   AS BIGINT) AS rr
          FROM daily),
        agg AS (
          SELECT ym, count(*) AS n_days,
                 CAST(sum((rc - rr) * (rc - rr)) AS BIGINT) AS sum_d2
          FROM ranked GROUP BY 1)
        SELECT ym, n_days, sum_d2,
               CAST(floor((1 - 6 * CAST(sum_d2 AS DOUBLE)
                 / CAST(n_days * (n_days * n_days - 1) AS DOUBLE))
                 * 1000000) AS BIGINT) AS rho_micro
        FROM agg WHERE n_days >= 3 ORDER BY ym""")),

    // --------------------------------------------------------------- q305
    QDef("q305_kendall",
      (s, dir) => {
        val daily = t(s, dir, "orders").selectExpr(
          "year(o_orderdate) * 100 + month(o_orderdate) AS ym",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("ym", "d")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum("cents").cast("bigint").as("rev"))
        val a = daily.select(col("ym"), col("d").as("d1"),
          col("n_orders").as("c1"), col("rev").as("r1"))
        val b = daily.select(col("ym"), col("d").as("d2"),
          col("n_orders").as("c2"), col("rev").as("r2"))
        a.join(b, Seq("ym")).where(col("d1") < col("d2"))
          .selectExpr("ym",
            "CAST(sign(c2 - c1) * sign(r2 - r1) AS BIGINT) AS sg")
          .groupBy("ym")
          .agg(count(lit(1)).as("pairs"),
            expr("CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT)").as("conc"),
            expr("CAST(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT)").as("disc"))
          .selectExpr("ym", "pairs", "conc", "disc",
            """CAST(floor(CAST(conc - disc AS DOUBLE)
               / CAST(pairs AS DOUBLE) * 1000000) AS BIGINT) AS tau_micro""")
          .orderBy("ym")
      },
      Some("""
        WITH daily AS (
          SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                 epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders GROUP BY 1, 2),
        pairs AS (
          SELECT a.ym,
                 CAST(sign(b.n_orders - a.n_orders)
                   * sign(b.rev - a.rev) AS BIGINT) AS sg
          FROM daily a JOIN daily b
            ON a.ym = b.ym AND a.d < b.d),
        agg AS (
          SELECT ym, count(*) AS pairs,
                 CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                 CAST(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc
          FROM pairs GROUP BY 1)
        SELECT ym, pairs, conc, disc,
               CAST(floor(CAST(conc - disc AS DOUBLE)
                 / CAST(pairs AS DOUBLE) * 1000000) AS BIGINT) AS tau_micro
        FROM agg ORDER BY ym""")),

    // --------------------------------------------------------------- q306
    QDef("q306_seasonality_spectrum",
      (s, dir) => {
        val periods = Seq(7, 11, 30)
        val daily = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS d")
          .groupBy("d").agg(count(lit(1)).as("cnt"))
        val withP = daily.withColumn("p",
          explode(array(periods.map(lit(_)): _*)))
        def coef(f: Double => Double): String =
          "CASE p " + periods.map(p =>
            s"WHEN $p THEN ${trigCase("d", p, f)}").mkString(" ") + " END"
        withP
          .withColumn("cosq", expr(coef(math.cos)))
          .withColumn("sinq", expr(coef(math.sin)))
          .groupBy("p")
          .agg(count(lit(1)).as("n_days"),
            expr("CAST(sum(cnt * cosq) AS BIGINT)").as("s_cos"),
            expr("CAST(sum(cnt * sinq) AS BIGINT)").as("s_sin"))
          .selectExpr("CAST(p AS INT) AS period", "n_days", "s_cos", "s_sin",
            """CAST(floor(sqrt(CAST(s_cos AS DOUBLE) * CAST(s_cos AS DOUBLE)
               + CAST(s_sin AS DOUBLE) * CAST(s_sin AS DOUBLE)))
               AS BIGINT) AS amp_q""")
          .orderBy("period")
      },
      Some {
        val periods = Seq(7, 11, 30)
        def coef(f: Double => Double): String =
          "CASE p " + periods.map(p =>
            s"WHEN $p THEN ${trigCase("d", p, f)}").mkString(" ") + " END"
        s"""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS d, count(*) AS cnt
          FROM events GROUP BY 1),
        withp AS (
          SELECT d, cnt, p,
                 ${coef(math.cos)} AS cosq,
                 ${coef(math.sin)} AS sinq
          FROM daily, (VALUES (7), (11), (30)) AS periods(p)),
        agg AS (
          SELECT p, count(*) AS n_days,
                 CAST(sum(cnt * cosq) AS BIGINT) AS s_cos,
                 CAST(sum(cnt * sinq) AS BIGINT) AS s_sin
          FROM withp GROUP BY 1)
        SELECT CAST(p AS INT) AS period, n_days, s_cos, s_sin,
               CAST(floor(sqrt(CAST(s_cos AS DOUBLE) * CAST(s_cos AS DOUBLE)
                 + CAST(s_sin AS DOUBLE) * CAST(s_sin AS DOUBLE)))
                 AS BIGINT) AS amp_q
        FROM agg ORDER BY period"""
      })
  )
}
