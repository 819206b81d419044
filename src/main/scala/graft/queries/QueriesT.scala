package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 13:
  *
  *  - q11d: INTERPOLATED percentiles (percentile_cont semantics) in exact
  *    integer arithmetic — completes the quantile family: q11b exact
  *    rank-based (percentile_disc), q11c mergeable histogram, q11d linear
  *    interpolation. Values are scaled to cents, the interpolation stays
  *    on BIGINT (result in 1/10000 units), so both engines are exact —
  *    no double division anywhere.
  *  - q75: event-type transition matrix — per-user consecutive event
  *    pairs with conditional probability in basis points (the Markov-
  *    chain view of task flows; q79 gives the path view, q93 the fixed
  *    funnel).
  */
object QueriesT extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // --------------------------------------------------------------- q11d
    QDef("q11d_percentile_cont",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("vc"), col("event_id"))
        val ranked = t(s, dir, "events")
          .selectExpr("event_type", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        def pc(p: Int, name: String) = {
          // 0-based target position scaled by 100: (n-1)*p = lo*100 + rem
          val lo = s"1 + ((n - 1) * $p) DIV 100"
          val rem = s"((n - 1) * $p) % 100"
          expr(s"max(CASE WHEN rn = $lo THEN vc END) * 100 + " +
            s"(coalesce(max(CASE WHEN rn = $lo + 1 THEN vc END), " +
            s"max(CASE WHEN rn = $lo THEN vc END)) - " +
            s"max(CASE WHEN rn = $lo THEN vc END)) * max($rem)").as(name)
        }
        ranked.groupBy("event_type")
          .agg(max(col("n")).as("n"), pc(50, "p50_cc"), pc(95, "p95_cc"))
          .orderBy("event_type")
      },
      Some("""
        WITH r AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
                 row_number() OVER (PARTITION BY event_type ORDER BY
                   CAST(floor(value * 100 + 0.5) AS BIGINT), event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, max(n) AS n,
               max(CASE WHEN rn = 1 + ((n - 1) * 50) // 100 THEN vc END) * 100 +
                 (coalesce(max(CASE WHEN rn = 2 + ((n - 1) * 50) // 100 THEN vc END),
                           max(CASE WHEN rn = 1 + ((n - 1) * 50) // 100 THEN vc END)) -
                  max(CASE WHEN rn = 1 + ((n - 1) * 50) // 100 THEN vc END))
                 * max(((n - 1) * 50) % 100) AS p50_cc,
               max(CASE WHEN rn = 1 + ((n - 1) * 95) // 100 THEN vc END) * 100 +
                 (coalesce(max(CASE WHEN rn = 2 + ((n - 1) * 95) // 100 THEN vc END),
                           max(CASE WHEN rn = 1 + ((n - 1) * 95) // 100 THEN vc END)) -
                  max(CASE WHEN rn = 1 + ((n - 1) * 95) // 100 THEN vc END))
                 * max(((n - 1) * 95) % 100) AS p95_cc
        FROM r GROUP BY event_type
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- q75
    QDef("q75_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val pairs = t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms", "event_type")
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
        val counts = pairs.groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
        val fromTotals = Window.partitionBy("prev_type")
        counts.withColumn("n_from", sum("n").over(fromTotals).cast("bigint"))
          .withColumn("prob_bp", expr("n * 10000 DIV n_from"))
          .select(col("prev_type"), col("event_type").as("next_type"),
            col("n"), col("n_from"), col("prob_bp"))
          .orderBy("prev_type", "next_type")
      },
      Some(s"""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev_type
          FROM events),
        c AS (
          SELECT prev_type, event_type AS next_type, count(*) AS n
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        tot AS (
          SELECT *, CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from
          FROM c)
        SELECT prev_type, next_type, n, n_from, n * 10000 // n_from AS prob_bp
        FROM tot ORDER BY prev_type, next_type"""))
  )
}
