package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 12:
  *
  *  - q79: event-path signatures — each user's chronologically ordered
  *    event-type sequence (first 8 steps) as a compact path string, then
  *    frequency of the paths (sequence-mining lite; the behavioural
  *    companion to q93's fixed funnel). Ordering inside collect is made
  *    deterministic by sorting (ts, event_id, type) structs — collect_list
  *    order itself is not guaranteed, array_sort makes it total.
  *  - q77: epoch reconciliation via FULL OUTER join — the added/removed/
  *    changed/unchanged accounting between two snapshots of the same key
  *    space (the only join type the inventory didn't exercise yet).
  *    Reference analog: listing-population diff between scan epochs
  *    (q82's set ops give the key view; this gives the attribute view).
  */
object QueriesS extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q79
    QDef("q79_path_signature",
      (s, dir) => {
        val sig = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id", "event_type")
          .groupBy("user_id")
          .agg(array_join(
            slice(transform(
              array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")), 1, 8), ">").as("path"))
        sig.groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some(s"""
        WITH sig AS (
          SELECT user_id,
                 array_to_string(
                   (list(event_type ORDER BY epoch_ms(ts), event_id))[1:8], '>') AS path
          FROM events GROUP BY user_id)
        SELECT path, count(*) AS n_users
        FROM sig GROUP BY 1
        ORDER BY n_users DESC, path
        LIMIT 20""")),

    // ---------------------------------------------------------------- q77
    QDef("q77_epoch_reconcile",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "value")
        // coalesce: empty input has NULL min/max — mid=0 keeps both epoch
        // scans trivially empty instead of throwing at the driver
        val mid = ev.agg(expr("coalesce(min(ts_ms) + (max(ts_ms) - min(ts_ms)) DIV 2, 0)"))
          .head().getLong(0)
        def epoch(pred: String) = ev.filter(expr(pred))
          .groupBy("user_id").agg(dec38(sum(dec(col("value")))).as("v"), count(lit(1)).as("n"))
        val a = epoch(s"ts_ms < ${mid}L")
          .select(col("user_id"), col("v").as("v1"), col("n").as("n1"))
        val b = epoch(s"ts_ms >= ${mid}L")
          .select(col("user_id"), col("v").as("v2"), col("n").as("n2"))
        a.join(b, Seq("user_id"), "full_outer")
          .withColumn("status",
            when(col("v1").isNull, "added").when(col("v2").isNull, "removed")
              .when(col("v1") =!= col("v2"), "changed").otherwise("unchanged"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_keys"),
            sum(coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
              .cast("bigint").as("n_events"))
          .orderBy("status")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        mid AS (
          SELECT CAST(min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS BIGINT) AS m FROM ev),
        a AS (
          SELECT user_id, CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS v1,
                 count(*) AS n1
          FROM ev, mid WHERE ts_ms < m GROUP BY 1),
        b AS (
          SELECT user_id, CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS v2,
                 count(*) AS n2
          FROM ev, mid WHERE ts_ms >= m GROUP BY 1),
        j AS (
          SELECT coalesce(a.user_id, b.user_id) AS user_id, v1, v2, n1, n2,
                 CASE WHEN v1 IS NULL THEN 'added'
                      WHEN v2 IS NULL THEN 'removed'
                      WHEN v1 <> v2 THEN 'changed' ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON a.user_id = b.user_id)
        SELECT status, count(*) AS n_keys,
               CAST(sum(coalesce(n1, 0) + coalesce(n2, 0)) AS BIGINT) AS n_events
        FROM j GROUP BY 1 ORDER BY 1"""))
  )
}
