package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 88 — feature scaling, dedup keep
  * policies, engagement quality, backfill planning:
  *
  *  - q375: min-max feature scaling per segment — scaled = (x−min)·1e6
  *    DIV (max−min), with boundary-hit accounting (each stratum pins
  *    exactly its extremes to 0 and 1e6); the ML-preprocessing scaler
  *    beside q158's robust z-scores.
  *  - q376: dedup keep-policy comparison — q30's exact-dup clusters
  *    resolved under keep-FIRST (min doc_id), keep-LONGEST (max chars),
  *    keep-LAST (max doc_id): kept/dropped characters per policy via
  *    collision-free composite argmax (q369's trick); the policy
  *    decision the dedup stage has to justify.
  *  - q377: bounce rate — gap-sessionized events (q70's kernel):
  *    single-event sessions vs engaged sessions per session-start
  *    day-of-week, with engaged depth; the engagement-quality split.
  *  - q378: backfill planner — expected (type × hour) grid vs observed,
  *    missing cells grouped into contiguous batches (islands on the
  *    complement): batch counts and widths per type; the ops query that
  *    sizes a catch-up crawl.
  *
  * Reference analog: normalizing listing prices per AOI, response-dedup
  * keeper policy, scan-session quality, re-scrape scheduling for
  * coverage holes (`operations/grids.py:80`).
  */
object QueriesCQ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q375
    QDef("q375_minmax_scale",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
        t(s, dir, "customer")
          .selectExpr("c_mktsegment",
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents")
          .withColumn("mn", min("cents").over(w))
          .withColumn("mx", max("cents").over(w))
          .withColumn("scaled",
            expr("(cents - mn) * 1000000 DIV (mx - mn)"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            min("cents").cast("bigint").as("min_cents"),
            max("cents").cast("bigint").as("max_cents"),
            sum("scaled").cast("bigint").as("sum_scaled_micro"),
            expr("CAST(sum(CASE WHEN scaled = 0 THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n_at_floor"),
            expr("CAST(sum(CASE WHEN scaled = 1000000 THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n_at_ceil"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH sc AS (
          SELECT c_mktsegment,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                 min(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY c_mktsegment) AS mn,
                 max(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY c_mktsegment) AS mx
          FROM customer),
        scaled AS (
          SELECT c_mktsegment, cents,
                 (cents - mn) * 1000000 // (mx - mn) AS scaled
          FROM sc)
        SELECT c_mktsegment, count(*) AS n,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents,
               CAST(sum(scaled) AS BIGINT) AS sum_scaled_micro,
               CAST(sum(CASE WHEN scaled = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_at_floor,
               CAST(sum(CASE WHEN scaled = 1000000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_at_ceil
        FROM scaled GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q376
    QDef("q376_keep_policies",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .withColumn("sig", Dedup.canonicalKey(col("w")))
          .select(col("sig"), col("doc_id"), col("n_chars"))
        val clusters = docs
          .withColumn("csize",
            count(lit(1)).over(Window.partitionBy("sig")))
          .where(col("csize") > 1)
        val per = clusters.groupBy("sig")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("bigint").as("chars_total"),
            min("doc_id").as("first_doc"),
            max("doc_id").as("last_doc"),
            // composite argmax: longest, ties → higher doc_id
            expr("max(n_chars * 100000 + doc_id) % 100000").as("longest_doc"),
            expr("CAST(max(n_chars * 100000 + doc_id) DIV 100000 AS BIGINT)")
              .as("longest_chars"))
        def policy(name: String, keptChars: String) =
          per.agg(count(lit(1)).as("n_clusters"),
            expr("CAST(sum(n_docs) AS BIGINT)").as("n_docs"),
            expr(s"CAST(sum($keptChars) AS BIGINT)").as("chars_kept"),
            expr(s"CAST(sum(chars_total - ($keptChars)) AS BIGINT)")
              .as("chars_dropped"))
            .select(lit(name).as("policy"), col("n_clusters"), col("n_docs"),
              col("chars_kept"), col("chars_dropped"))
        // exact duplicates share the bag signature, so chars are equal
        // within a cluster for first/last; longest shows the policy's value
        // on near-equal bags
        policy("a_keep_first", "chars_total DIV n_docs")
          .union(policy("b_keep_longest", "longest_chars"))
          .orderBy("policy")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, n_chars,
                 ${Dedup.canonicalKeySql("w")} AS sig
          FROM (SELECT doc_id, n_chars, ${TextFunctions.wordsSql("text")} AS w
                FROM documents)),
        cl AS (
          SELECT sig, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars_total,
                 CAST(max(n_chars * 100000 + doc_id) // 100000 AS BIGINT)
                   AS longest_chars
          FROM d GROUP BY 1 HAVING count(*) > 1)
        SELECT 'a_keep_first' AS policy, count(*) AS n_clusters,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(chars_total // n_docs) AS BIGINT) AS chars_kept,
               CAST(sum(chars_total - chars_total // n_docs) AS BIGINT)
                 AS chars_dropped
        FROM cl
        UNION ALL
        SELECT 'b_keep_longest', count(*),
               CAST(sum(n_docs) AS BIGINT),
               CAST(sum(longest_chars) AS BIGINT),
               CAST(sum(chars_total - longest_chars) AS BIGINT)
        FROM cl
        ORDER BY policy""")),

    // --------------------------------------------------------------- q377
    QDef("q377_bounce_rate",
      (s, dir) => {
        val sess = Relational.sessionize(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            col("user_id"), col("ts_ms"), col("event_id"),
            gapMs = 1800 * 1000L)
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_ev"), min("ts_ms").as("start_ms"))
        sess
          .selectExpr("((start_ms DIV 86400000) + 4) % 7 AS dow",
            "CASE WHEN n_ev = 1 THEN 1L ELSE 0L END AS bounced",
            "n_ev")
          .groupBy("dow")
          .agg(count(lit(1)).as("n_sessions"),
            expr("CAST(sum(bounced) AS BIGINT)").as("n_bounced"),
            expr("CAST(sum(CASE WHEN bounced = 0 THEN n_ev ELSE 0 END) AS BIGINT)")
              .as("engaged_events"))
          .selectExpr("dow", "n_sessions", "n_bounced",
            "n_bounced * 10000 DIV n_sessions AS bounce_bp",
            """CASE WHEN n_sessions > n_bounced
               THEN engaged_events * 1000000 DIV (n_sessions - n_bounced)
               ELSE 0 END AS engaged_depth_micro""")
          .orderBy("dow")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
            CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        sess AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged),
        per AS (
          SELECT user_id, session_id, count(*) AS n_ev,
                 min(ts_ms) AS start_ms
          FROM sess GROUP BY 1, 2),
        cls AS (
          SELECT ((start_ms // 86400000) + 4) % 7 AS dow,
                 CASE WHEN n_ev = 1 THEN 1 ELSE 0 END AS bounced, n_ev
          FROM per)
        SELECT dow, count(*) AS n_sessions,
               CAST(sum(bounced) AS BIGINT) AS n_bounced,
               CAST(sum(bounced) AS BIGINT) * 10000 // count(*) AS bounce_bp,
               CASE WHEN count(*) > sum(bounced)
                    THEN CAST(sum(CASE WHEN bounced = 0 THEN n_ev ELSE 0 END)
                         AS BIGINT) * 1000000
                         // (count(*) - CAST(sum(bounced) AS BIGINT))
                    ELSE 0 END AS engaged_depth_micro
        FROM cls GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q378
    QDef("q378_backfill_plan",
      (s, dir) => {
        val obs = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 3600000 AS h").distinct()
          .cache()
        obs.count()
        val span = obs.agg(min("h").as("h0"), max("h").as("h1"))
        val types = obs.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(span))
          .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
        val missing = grid.join(obs, Seq("event_type", "h"), "left_anti")
        val wT = Window.partitionBy("event_type").orderBy("h")
        val batches = missing
          .withColumn("grp", col("h") - row_number().over(wT))
          .groupBy("event_type", "grp").agg(count(lit(1)).as("len"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_batches"),
            sum("len").cast("bigint").as("n_missing"),
            max("len").cast("bigint").as("max_batch_len"))
        grid.groupBy("event_type").agg(count(lit(1)).as("n_expected"))
          .join(batches, Seq("event_type"), "left")
          .na.fill(0L, Seq("n_batches", "n_missing", "max_batch_len"))
          .orderBy("event_type")
      },
      Some("""
        WITH obs AS (
          SELECT DISTINCT event_type, epoch_ms(ts) // 3600000 AS h
          FROM events),
        span AS (SELECT min(h) AS h0, max(h) AS h1 FROM obs),
        grid AS (
          SELECT event_type, r.h AS h
          FROM (SELECT DISTINCT event_type FROM obs), span,
               unnest(range(h0, h1 + 1)) r(h)),
        missing AS (
          SELECT g.event_type, g.h
          FROM grid g ANTI JOIN obs o
            ON g.event_type = o.event_type AND g.h = o.h),
        isl AS (
          SELECT event_type,
                 h - row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS grp
          FROM missing),
        batches AS (
          SELECT event_type, grp, count(*) AS len
          FROM isl GROUP BY 1, 2),
        agg AS (
          SELECT event_type, count(*) AS n_batches,
                 CAST(sum(len) AS BIGINT) AS n_missing,
                 CAST(max(len) AS BIGINT) AS max_batch_len
          FROM batches GROUP BY 1),
        expected AS (
          SELECT event_type, count(*) AS n_expected FROM grid GROUP BY 1)
        SELECT event_type, n_expected,
               coalesce(n_batches, 0) AS n_batches,
               coalesce(n_missing, 0) AS n_missing,
               coalesce(max_batch_len, 0) AS max_batch_len
        FROM expected LEFT JOIN agg USING (event_type)
        ORDER BY event_type"""))
  )
}
