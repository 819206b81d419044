package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 66 — multivariate/sequential
  * statistics over exact component sums:
  *
  *  - q289: TWO-feature OLS per brand (qty ~ discount% + part size) via
  *    Cramer's rule on centered BIGINT component sums; the 2×2
  *    determinant solve runs in doubles built from exact integers
  *    (< 2^53, bit-identical both engines), one fixed IEEE op order,
  *    floor-micro output. Multi-regressor upgrade of q84/q174.
  *  - q290: Wald–Wolfowitz runs test on each type's daily-count series
  *    vs its exact lower median — observed runs vs expected
  *    2·n1·n2/(n1+n2)+1 in milli, all integer.
  *  - q291: partial autocorrelation at lag 2 (Durbin–Levinson closed
  *    form φ22 = (r2−r1²)/(1−r1²)) from q191's n-prescaled deviation
  *    components: (C2·C0 − C1²)/(C0² − C1²), exact BIGINT comps →
  *    fixed-order IEEE → floor-micro. AR(1)-vs-AR(2) model evidence.
  *  - q292: Theil's U² forecast-quality ratio per type — seasonal-naive
  *    (lag 7 rows) squared error vs random-walk (lag 1) squared error,
  *    exact BIGINT SSE both, ratio in milli. The scale-free companion
  *    of q218's MAE backtest.
  *
  * Reference analog: does discounting move volume after controlling
  * for size; is harvest volume mean-reverting or trending; how much
  * memory does the collection series carry; is the weekly pattern a
  * better predictor than persistence.
  */
object QueriesBU extends QueryPack {
  import Q._

  private def signDiv(num: String, den: String): String =
    s"""CASE WHEN ($den) = 0 THEN NULL
        WHEN (($num) >= 0) = (($den) >= 0)
        THEN abs($num) DIV abs($den)
        ELSE -(abs($num) DIV abs($den)) END"""
  private def signDivSql(num: String, den: String): String =
    s"""CASE WHEN ($den) = 0 THEN NULL
        WHEN (($num) >= 0) = (($den) >= 0)
        THEN abs($num) // abs($den)
        ELSE -(abs($num) // abs($den)) END"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q289
    QDef("q289_ols2",
      (s, dir) => {
        val part = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
          col("p_size").cast("bigint").as("x2"))
        val base = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS y")
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        base.groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum("x1").cast("bigint").as("s1"), sum("x2").cast("bigint").as("s2"),
            sum("y").cast("bigint").as("sy"),
            sum(expr("x1*x1")).cast("bigint").as("s11"),
            sum(expr("x2*x2")).cast("bigint").as("s22"),
            sum(expr("x1*x2")).cast("bigint").as("s12"),
            sum(expr("x1*y")).cast("bigint").as("s1y"),
            sum(expr("x2*y")).cast("bigint").as("s2y"))
          .selectExpr("p_brand", "n",
            "CAST(n*s11 - s1*s1 AS DOUBLE) AS c11",
            "CAST(n*s22 - s2*s2 AS DOUBLE) AS c22",
            "CAST(n*s12 - s1*s2 AS DOUBLE) AS c12",
            "CAST(n*s1y - s1*sy AS DOUBLE) AS c1y",
            "CAST(n*s2y - s2*sy AS DOUBLE) AS c2y")
          .selectExpr("p_brand", "n",
            """CASE WHEN c11*c22 - c12*c12 = 0.0 THEN NULL
               ELSE CAST(floor((c1y*c22 - c2y*c12) / (c11*c22 - c12*c12) * 1000000)
                 AS BIGINT) END AS b1_micro""",
            """CASE WHEN c11*c22 - c12*c12 = 0.0 THEN NULL
               ELSE CAST(floor((c2y*c11 - c1y*c12) / (c11*c22 - c12*c12) * 1000000)
                 AS BIGINT) END AS b2_micro""")
          .orderBy("p_brand")
      },
      Some("""
        WITH base AS (
          SELECT p.p_brand,
                 CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS x1,
                 CAST(p.p_size AS BIGINT) AS x2,
                 CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        sums AS (
          SELECT p_brand, count(*) AS n,
                 CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x1*x1) AS BIGINT) AS s11,
                 CAST(sum(x2*x2) AS BIGINT) AS s22,
                 CAST(sum(x1*x2) AS BIGINT) AS s12,
                 CAST(sum(x1*y) AS BIGINT) AS s1y,
                 CAST(sum(x2*y) AS BIGINT) AS s2y
          FROM base GROUP BY 1),
        c AS (
          SELECT p_brand, n,
                 CAST(n*s11 - s1*s1 AS DOUBLE) AS c11,
                 CAST(n*s22 - s2*s2 AS DOUBLE) AS c22,
                 CAST(n*s12 - s1*s2 AS DOUBLE) AS c12,
                 CAST(n*s1y - s1*sy AS DOUBLE) AS c1y,
                 CAST(n*s2y - s2*sy AS DOUBLE) AS c2y
          FROM sums)
        SELECT p_brand, n,
               CASE WHEN c11*c22 - c12*c12 = 0.0 THEN NULL
                 ELSE CAST(floor((c1y*c22 - c2y*c12) / (c11*c22 - c12*c12) * 1000000)
                   AS BIGINT) END AS b1_micro,
               CASE WHEN c11*c22 - c12*c12 = 0.0 THEN NULL
                 ELSE CAST(floor((c2y*c11 - c1y*c12) / (c11*c22 - c12*c12) * 1000000)
                   AS BIGINT) END AS b2_micro
        FROM c ORDER BY p_brand""")),

    // --------------------------------------------------------------- q290
    QDef("q290_runs_test",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val wt = Window.partitionBy("event_type")
        val byVal = wt.orderBy("y", "d")
        val byDay = wt.orderBy("d")
        val med = daily
          .withColumn("r", row_number().over(byVal))
          .withColumn("n", count(lit(1)).over(wt))
          .where(col("r") === expr("(n + 1) DIV 2"))
          .select(col("event_type"), col("y").as("med"))
        daily.join(broadcast(med), "event_type")
          .withColumn("above", when(col("y") > col("med"), 1L).otherwise(0L))
          .withColumn("prev", lag("above", 1).over(byDay))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum("above").cast("bigint").as("n_above"),
            sum(expr("1 - above")).cast("bigint").as("n_below"),
            (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
              .otherwise(0L))).cast("bigint").as("runs"))
          .withColumn("exp_runs_milli",
            expr("2 * n_above * n_below * 1000 DIV (n_above + n_below) + 1000"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        med AS (
          SELECT event_type, y AS med
          FROM (SELECT event_type, y,
                       row_number() OVER (PARTITION BY event_type ORDER BY y, d) AS r,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM daily)
          WHERE r = (n + 1) // 2),
        flags AS (
          SELECT daily.event_type, d,
                 CASE WHEN y > med THEN 1 ELSE 0 END AS above
          FROM daily JOIN med ON daily.event_type = med.event_type),
        runs AS (
          SELECT event_type, above,
                 lag(above, 1) OVER (PARTITION BY event_type ORDER BY d) AS prev
          FROM flags)
        SELECT event_type, count(*) AS n_days,
               CAST(sum(above) AS BIGINT) AS n_above,
               CAST(sum(1 - above) AS BIGINT) AS n_below,
               CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END)
                 AS BIGINT) AS runs,
               2 * CAST(sum(above) AS BIGINT) * CAST(sum(1 - above) AS BIGINT) * 1000
                 // (CAST(sum(above) AS BIGINT) + CAST(sum(1 - above) AS BIGINT))
                 + 1000 AS exp_runs_milli
        FROM runs GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q291
    QDef("q291_pacf2",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val wt = Window.partitionBy("event_type")
        val wd = wt.orderBy("d")
        val dev = daily
          .withColumn("n", count(lit(1)).over(wt))
          .withColumn("tot", sum("y").over(wt))
          .selectExpr("event_type", "d", "n * y - tot AS dev")
        dev
          .withColumn("dev1", lead("dev", 1).over(wd))
          .withColumn("dev2", lead("dev", 2).over(wd))
          .groupBy("event_type")
          .agg(sum(expr("dev * dev")).cast("bigint").as("c0"),
            sum(expr("dev * dev1")).cast("bigint").as("c1"),
            sum(expr("dev * dev2")).cast("bigint").as("c2"))
          .selectExpr("event_type",
            s"${signDiv("c1 * 1000", "c0")} AS r1_milli",
            s"${signDiv("c2 * 1000", "c0")} AS r2_milli",
            """CASE WHEN CAST(c0 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE) = 0.0 THEN NULL
               ELSE CAST(floor((CAST(c2 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE))
                 / (CAST(c0 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE)) * 1000000)
                 AS BIGINT) END AS pacf2_micro""")
          .orderBy("event_type")
      },
      Some(s"""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        dev AS (
          SELECT event_type, d,
                 CAST(count(*) OVER (PARTITION BY event_type) * y
                      - sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS dev
          FROM daily),
        l AS (
          SELECT event_type, dev,
                 lead(dev, 1) OVER (PARTITION BY event_type ORDER BY d) AS dev1,
                 lead(dev, 2) OVER (PARTITION BY event_type ORDER BY d) AS dev2
          FROM dev),
        a AS (
          SELECT event_type,
                 CAST(sum(dev * dev) AS BIGINT) AS c0,
                 CAST(sum(dev * dev1) AS BIGINT) AS c1,
                 CAST(sum(dev * dev2) AS BIGINT) AS c2
          FROM l GROUP BY 1)
        SELECT event_type,
               ${signDivSql("c1 * 1000", "c0")} AS r1_milli,
               ${signDivSql("c2 * 1000", "c0")} AS r2_milli,
               CASE WHEN CAST(c0 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE) = 0.0 THEN NULL
                 ELSE CAST(floor((CAST(c2 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE))
                   / (CAST(c0 AS DOUBLE)*CAST(c0 AS DOUBLE)
                      - CAST(c1 AS DOUBLE)*CAST(c1 AS DOUBLE)) * 1000000)
                   AS BIGINT) END AS pacf2_micro
        FROM a ORDER BY event_type""")),

    // --------------------------------------------------------------- q292
    QDef("q292_theil_u",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val wd = Window.partitionBy("event_type").orderBy("d")
        daily
          .withColumn("y1", lag("y", 1).over(wd))
          .withColumn("y7", lag("y", 7).over(wd))
          .where(col("y1").isNotNull && col("y7").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(expr("(y7 - y) * (y7 - y)")).cast("bigint").as("sse_naive7"),
            sum(expr("(y1 - y) * (y1 - y)")).cast("bigint").as("sse_rw"))
          .withColumn("u2_milli",
            expr("CASE WHEN sse_rw = 0 THEN NULL ELSE sse_naive7 * 1000 DIV sse_rw END"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        l AS (
          SELECT event_type, y,
                 lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1,
                 lag(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS y7
          FROM daily)
        SELECT event_type, count(*) AS n_eval,
               CAST(sum((y7 - y) * (y7 - y)) AS BIGINT) AS sse_naive7,
               CAST(sum((y1 - y) * (y1 - y)) AS BIGINT) AS sse_rw,
               CASE WHEN CAST(sum((y1 - y) * (y1 - y)) AS BIGINT) = 0 THEN NULL
                 ELSE CAST(sum((y7 - y) * (y7 - y)) AS BIGINT) * 1000
                   // CAST(sum((y1 - y) * (y1 - y)) AS BIGINT) END AS u2_milli
        FROM l WHERE y1 IS NOT NULL AND y7 IS NOT NULL
        GROUP BY 1 ORDER BY event_type"""))
  )
}
