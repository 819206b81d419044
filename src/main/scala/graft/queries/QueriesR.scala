package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 11:
  *
  *  - q89: polygon area via the shoelace formula over the same integer-
  *    vertex region pentagons as q83 — the ST_Area analog. All-integer
  *    arithmetic (2·area is exact on BIGINT), plus bbox fill ratio.
  *    Reference analog: AOI shape area reporting (`AOIShape.geom_3857`).
  *  - q92: task-group progress — per-group completion basis points and an
  *    integer-arithmetic ETA from the observed completion rate.
  *    Reference analog: `UBDCGroupTask` completion bookkeeping
  *    (models.py:629 op_count/ok-rate views).
  */
object QueriesR extends QueryPack {
  import Q._

  /** The q83 pentagon vertex offsets, in ring order. */
  private val Ring = Seq((-30, -40), (20, -35), (32, 10), (5, 45), (-25, 20))

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q89
    QDef("q89_polygon_area",
      (s, dir) => {
        val edges = Ring.zip(Ring.tail :+ Ring.head).map { case ((ax, ay), (bx, by)) =>
          (ax, ay, bx, by)
        }
        import s.implicits._
        val offsDf = edges.toDF("dx1", "dy1", "dx2", "dy2")
        t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 144).cast("bigint").as("cx"))
          .crossJoin(broadcast(offsDf))
          .select(col("r_regionkey"), col("r_name"),
            (col("cx") + col("dx1")).as("x1"), col("dy1").cast("bigint").as("y1"),
            (col("cx") + col("dx2")).as("x2"), col("dy2").cast("bigint").as("y2"))
          .groupBy("r_name")
          .agg(
            abs(sum(col("x1") * col("y2") - col("x2") * col("y1"))).cast("bigint").as("area2"),
            ((max(greatest(col("x1"), col("x2"))) - min(least(col("x1"), col("x2")))) *
              (max(greatest(col("y1"), col("y2"))) - min(least(col("y1"), col("y2")))))
              .cast("bigint").as("bbox_area"))
          .withColumn("fill_bp", expr("area2 * 10000 DIV (2 * bbox_area)"))
          .orderBy("r_name")
      },
      Some {
        val edges = Ring.zip(Ring.tail :+ Ring.head)
          .map { case ((ax, ay), (bx, by)) => s"($ax, $ay, $bx, $by)" }.mkString(", ")
        s"""
        WITH offs(dx1, dy1, dx2, dy2) AS (VALUES $edges),
        e AS (
          SELECT r_name,
                 CAST(r_regionkey*72 - 144 + dx1 AS BIGINT) AS x1, CAST(dy1 AS BIGINT) AS y1,
                 CAST(r_regionkey*72 - 144 + dx2 AS BIGINT) AS x2, CAST(dy2 AS BIGINT) AS y2
          FROM region CROSS JOIN offs),
        a AS (
          SELECT r_name,
                 CAST(abs(sum(x1*y2 - x2*y1)) AS BIGINT) AS area2,
                 CAST((max(greatest(x1, x2)) - min(least(x1, x2))) *
                      (max(greatest(y1, y2)) - min(least(y1, y2))) AS BIGINT) AS bbox_area
          FROM e GROUP BY 1)
        SELECT r_name, area2, bbox_area,
               area2 * 10000 // (2 * bbox_area) AS fill_bp
        FROM a ORDER BY r_name"""
      }),

    // ---------------------------------------------------------------- q92
    // Completion-rate ETA in pure integer math: remaining work scaled by
    // observed ms-per-completed-task. Groups with nothing completed yet
    // report NULL eta (consistent in both engines).
    QDef("q92_group_progress",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms",
            "CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS done")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_tasks"),
            sum("done").cast("bigint").as("n_done"),
            (count(lit(1)) - sum("done")).cast("bigint").as("n_pending"),
            (max("ts_ms") - min("ts_ms")).as("elapsed_ms"))
          .withColumn("completion_bp", expr("n_done * 10000 DIV n_tasks"))
          .withColumn("eta_s",
            expr("CASE WHEN n_done > 0 THEN n_pending * elapsed_ms DIV n_done DIV 1000 END"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH g AS (
          SELECT user_id, count(*) AS n_tasks,
                 CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT) AS n_done,
                 CAST(count(*) - sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
                   AS BIGINT) AS n_pending,
                 max(epoch_ms(ts)) - min(epoch_ms(ts)) AS elapsed_ms
          FROM events GROUP BY 1)
        SELECT user_id, n_tasks, n_done, n_pending, elapsed_ms,
               n_done * 10000 // n_tasks AS completion_bp,
               CASE WHEN n_done > 0 THEN n_pending * elapsed_ms // n_done // 1000 END AS eta_s
        FROM g ORDER BY user_id"""))
  )
}
