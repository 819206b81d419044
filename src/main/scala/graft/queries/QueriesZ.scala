package graft.queries

import graft.Tables.t
import graft.geo.Distance
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 19:
  *
  *  - q110: movement trajectories — per-user consecutive-point haversine
  *    hop distances (lag window over event time) accumulated to exact
  *    micro-km totals. The trajectory-length analytics over the
  *    reference's listing movement history (`workunits.py:158` keeps a
  *    movement log per listing; this is its "how far has it drifted"
  *    rollup). Distances floor-quantize to BIGINT before aggregation
  *    (the q100/q47 parity rule).
  */
object QueriesZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    QDef("q110_trajectory",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms",
            "((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng",
            "((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat")
          .withColumn("p_lng", lag("lng", 1).over(w))
          .withColumn("p_lat", lag("lat", 1).over(w))
          .filter(col("p_lng").isNotNull)
          .withColumn("hop_ukm",
            floor(Distance.haversineKm(col("p_lat"), col("p_lng"), col("lat"), col("lng"))
              * lit(1000000.0)).cast("bigint"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hops"),
            sum("hop_ukm").cast("bigint").as("total_ukm"),
            max("hop_ukm").cast("bigint").as("max_ukm"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH pts AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 ((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng,
                 ((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat
          FROM events),
        hops AS (
          SELECT user_id,
                 lag(lng) OVER w AS p_lng, lag(lat) OVER w AS p_lat, lng, lat
          FROM pts
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        d AS (
          SELECT user_id,
                 CAST(floor((${Distance.haversineKmSql("p_lat", "p_lng", "lat", "lng")})
                   * 1000000.0) AS BIGINT) AS hop_ukm
          FROM hops WHERE p_lng IS NOT NULL)
        SELECT user_id, count(*) AS n_hops,
               CAST(sum(hop_ukm) AS BIGINT) AS total_ukm,
               CAST(max(hop_ukm) AS BIGINT) AS max_ukm
        FROM d GROUP BY 1 ORDER BY 1"""))
  )
}
