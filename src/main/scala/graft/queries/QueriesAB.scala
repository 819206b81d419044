package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 21:
  *
  *  - q121: box-plot statistics + Tukey outlier detection — per group:
  *    rank-based quartiles (percentile_disc semantics on exact cents),
  *    IQR, 1.5·IQR whisker bounds, and the count of points outside them.
  *    The anomaly-flagging view over task latencies / price streams; all
  *    arithmetic on BIGINT cents so both engines are exact.
  */
object QueriesAB extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    QDef("q121_boxplot_outliers",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("vc"), col("event_id"))
        val ranked = t(s, dir, "events")
          .selectExpr("event_type", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val quart = ranked.groupBy("event_type").agg(
          max(when(expr("rn = (n * 25 + 99) DIV 100"), col("vc"))).as("q1"),
          max(when(expr("rn = (n * 75 + 99) DIV 100"), col("vc"))).as("q3"))
        // whiskers at q1 - 1.5*IQR / q3 + 1.5*IQR: scale by 2 to stay integer
        val bounds = quart
          .withColumn("iqr", col("q3") - col("q1"))
          .withColumn("lo2", col("q1") * 2 - col("iqr") * 3)
          .withColumn("hi2", col("q3") * 2 + col("iqr") * 3)
        ranked.join(broadcast(bounds), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            max("q1").as("q1_cents"), max("q3").as("q3_cents"),
            max("iqr").as("iqr_cents"),
            sum(when(col("vc") * 2 < col("lo2") || col("vc") * 2 > col("hi2"), 1L)
              .otherwise(0L)).cast("bigint").as("n_outliers"))
          .withColumn("outlier_bp", expr("n_outliers * 10000 DIV n"))
          .orderBy("event_type")
      },
      Some("""
        WITH r AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
                 row_number() OVER (PARTITION BY event_type ORDER BY
                   CAST(floor(value * 100 + 0.5) AS BIGINT), event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        quart AS (
          SELECT event_type,
                 max(CASE WHEN rn = (n * 25 + 99) // 100 THEN vc END) AS q1,
                 max(CASE WHEN rn = (n * 75 + 99) // 100 THEN vc END) AS q3
          FROM r GROUP BY 1),
        bounds AS (
          SELECT event_type, q1, q3, q3 - q1 AS iqr,
                 q1 * 2 - (q3 - q1) * 3 AS lo2,
                 q3 * 2 + (q3 - q1) * 3 AS hi2
          FROM quart)
        SELECT r.event_type, count(*) AS n,
               max(b.q1) AS q1_cents, max(b.q3) AS q3_cents,
               max(b.iqr) AS iqr_cents,
               CAST(count(CASE WHEN r.vc * 2 < b.lo2 OR r.vc * 2 > b.hi2
                 THEN 1 END) AS BIGINT) AS n_outliers,
               CAST(count(CASE WHEN r.vc * 2 < b.lo2 OR r.vc * 2 > b.hi2
                 THEN 1 END) AS BIGINT) * 10000 // count(*) AS outlier_bp
        FROM r JOIN bounds b ON r.event_type = b.event_type
        GROUP BY 1 ORDER BY 1"""))
  )
}
