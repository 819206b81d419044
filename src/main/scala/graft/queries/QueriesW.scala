package graft.queries

import graft.Tables.t
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 16:
  *
  *  - q39: fuzzy (approximate-key) join — match strings within edit
  *    distance 1 WITHOUT a quadratic comparison, via deletion-neighborhood
  *    blocking (FastSS): each side expands to itself + every 1-deletion
  *    variant (positions exploded, variant built per row — cheap generator
  *    child), equal variants become candidates, exact levenshtein
  *    refilters. The fuzzy-key record-linkage primitive (typo'd listing
  *    names / user handles); candidates are variant-scoped so the join
  *    stays linear in name length × rows at 100 TB. Probe side:
  *    deterministic typo'd copies of customer names (construct→match
  *    roundtrip like q65/q09b — every probe must link back to its source).
  */
object QueriesW extends QueryPack {

  def defs: Seq[QDef] = Seq(
    QDef("q39_fuzzy_join",
      (s, dir) => {
        // probe = names with the character at position (key % 6 + 2) deleted
        val probes = t(s, dir, "customer").selectExpr(
          "c_custkey AS p_key",
          "concat(substr(c_name, 1, CAST(c_custkey % 6 AS INT) + 1), " +
            "substr(c_name, CAST(c_custkey % 6 AS INT) + 3)) AS p_name")
        val base = t(s, dir, "customer").selectExpr("c_custkey AS b_key", "c_name AS b_name")
        // deletion neighborhood: i=0 keeps the string, i>=1 deletes char i
        def variants(df: org.apache.spark.sql.DataFrame, name: String) = df
          .withColumn("i", explode(sequence(lit(0), length(col(name)))))
          .withColumn("v", expr(s"CASE WHEN i = 0 THEN $name " +
            s"ELSE concat(substr($name, 1, i - 1), substr($name, i + 1)) END"))
        variants(probes, "p_name").join(variants(base, "b_name"), "v")
          // measured at sf1 and kept plain: a length pregate and the
          // 3-arg bounded levenshtein both benchmarked slower here
          // (codegen break / O(len) length() per candidate)
          .filter(levenshtein(col("p_name"), col("b_name")) <= 1)
          .select("p_key", "b_key").distinct()
          .groupBy(expr("CAST(p_key = b_key AS STRING)").as("self_link"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("p_key")).as("n_probes_linked"))
          .orderBy("self_link")
      },
      Some("""
        WITH probes AS (
          SELECT c_custkey AS p_key,
                 concat(substr(c_name, 1, CAST(c_custkey % 6 AS INT) + 1),
                        substr(c_name, CAST(c_custkey % 6 AS INT) + 3)) AS p_name
          FROM customer),
        base AS (SELECT c_custkey AS b_key, c_name AS b_name FROM customer),
        pv AS (
          SELECT p_key, p_name,
                 CASE WHEN i = 0 THEN p_name
                      ELSE concat(substr(p_name, 1, CAST(i AS INT) - 1),
                                  substr(p_name, CAST(i AS INT) + 1)) END AS v
          FROM probes, unnest(range(0, length(p_name) + 1)) AS u(i)),
        bv AS (
          SELECT b_key, b_name,
                 CASE WHEN i = 0 THEN b_name
                      ELSE concat(substr(b_name, 1, CAST(i AS INT) - 1),
                                  substr(b_name, CAST(i AS INT) + 1)) END AS v
          FROM base, unnest(range(0, length(b_name) + 1)) AS u(i)),
        linked AS (
          SELECT DISTINCT p_key, b_key
          FROM pv JOIN bv ON pv.v = bv.v
          WHERE levenshtein(p_name, b_name) <= 1)
        SELECT CAST(p_key = b_key AS VARCHAR) AS self_link,
               count(*) AS n_links,
               count(DISTINCT p_key) AS n_probes_linked
        FROM linked GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q12b
    // Work-queue batching: q12's stale selection split into fixed-size
    // task groups with a shared expiry — the chunked group-submission
    // loop every periodical op runs (reference: op_update_calendar_
    // periodical chunking + .set(expires=end_of_today), calendars.py:84;
    // group bookkeeping models.py:629). The work queue is bounded by the
    // op's how_many limit, so the single-partition rank is not a scale
    // concern.
    QDef("q12b_work_batches",
      (s, dir) => {
        import Q._
        val ev = t(s, dir, "events").withColumn("ts_ms", expr(tsMs))
        val universe = ev.groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", col("ts_ms"))).as("last_ts"))
        val excl = ev.filter(col("event_type") === "error" &&
            col("ts_ms") >= millisOf("2024-01-29 00:00:00"))
          .select("user_id").distinct()
        val queue = Relational.staleScan(universe, "user_id", "last_ts", excl,
          cutoffMs = millisOf("2024-01-28 00:00:00"), limit = 100)
        queue.withColumn("batch_id",
            expr("(row_number() OVER (ORDER BY last_ts ASC NULLS FIRST, user_id) - 1) DIV 16"))
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n_tasks"),
            min("user_id").as("first_key"), max("user_id").as("last_key"),
            lit(millisOf("2024-01-30 23:59:59")).as("expires_ms"))
          .orderBy("batch_id")
      },
      Some(s"""
        WITH universe AS (
          SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS last_ts
          FROM events GROUP BY user_id),
        excl AS (
          SELECT DISTINCT user_id FROM events
          WHERE event_type = 'error' AND epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-29 00:00:00')),
        queue AS (
          SELECT u.user_id, u.last_ts
          FROM universe u
          WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.user_id = u.user_id)
            AND (u.last_ts IS NULL OR u.last_ts <= epoch_ms(TIMESTAMP '2024-01-28 00:00:00'))
          ORDER BY u.last_ts ASC NULLS FIRST, u.user_id
          LIMIT 100),
        ranked AS (
          SELECT user_id, last_ts,
                 (row_number() OVER (ORDER BY last_ts ASC NULLS FIRST, user_id) - 1) // 16
                   AS batch_id
          FROM queue)
        SELECT batch_id, count(*) AS n_tasks,
               min(user_id) AS first_key, max(user_id) AS last_key,
               ${Q.millisOf("2024-01-30 23:59:59")} AS expires_ms
        FROM ranked GROUP BY 1 ORDER BY 1"""))
  )
}
