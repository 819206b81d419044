package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 58 — variance explained, pipeline
  * ordering, abuse detection, activity heatmap:
  *
  *  - q258: one-way ANOVA effect size — how much of order-value
  *    variance the market segment explains: η² bp from N²-scaled
  *    between/total sums of squares. Fractions are floored per group
  *    in ONE fixed order (deterministic in both engines); no sqrt, no
  *    F-table — the effect-size report, not the significance test
  *    (q133/q204 do significance).
  *  - q259: dedup pipeline ordering — LSH candidate-pair volume on the
  *    full corpus vs after exact dedup (q223's keepers only): pair
  *    counts and the reduction bp. Quantifies why exact dedup runs
  *    FIRST (candidate pairs shrink quadratically in cluster size).
  *  - q260: bot detection — per user (≥10 events) the minimum
  *    inter-event gap classifies automation likelihood: sub-minute
  *    minimum gaps are machine-like bursts, sub-5-minute suspicious,
  *    the rest human-paced. Pure integer forensics; thresholds sit
  *    inside the observed gap distribution so every class populates.
  *  - q261: day-of-week × hour activity heatmap — the 168-cell
  *    profile per event type collapsed to the top-5 hottest cells and
  *    the concentration bp of the top cell. Calendar profile for
  *    scheduler placement.
  *
  * Reference analog: η² = does AOI segment explain listing price;
  * ordering = response dedup before near-dup indexing; bot = scraper
  * self-detection (rate-limit evidence); heatmap = when the hosts
  * update calendars.
  */
object QueriesBM extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q258
    QDef("q258_anova_eta",
      (s, dir) => {
        // whole dollars, centered sums: magnitudes stay < 2^62 through
        // sf1 (cents² sums overflow BIGINT — hence the dollar grain)
        val x = t(s, dir, "orders")
          .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("c_mktsegment AS seg",
            "CAST(floor(o_totalprice + 0.5) AS BIGINT) AS v")
        val g = x.groupBy("seg")
          .agg(count(lit(1)).as("ng"), sum("v").cast("bigint").as("sg"))
        val tot = x.agg(count(lit(1)).as("n"), sum("v").cast("bigint").as("st"),
          sum(col("v") * col("v")).cast("bigint").as("s2"))
        g.crossJoin(tot)
          .selectExpr("ng", "n", "st", "s2",
            "sg DIV ng - st DIV n AS dev",
            "ng * ((sg DIV ng - st DIV n) * (sg DIV ng - st DIV n)) AS ssb_part")
          .groupBy("n", "st", "s2")
          .agg(count(lit(1)).as("k"), sum("ssb_part").cast("bigint").as("ssb"))
          .selectExpr("k", "n", "ssb",
            "s2 - 2 * (st DIV n) * st + n * (st DIV n) * (st DIV n) AS sst")
          .selectExpr("k", "n", "ssb", "sst",
            "CASE WHEN sst >= 100 THEN ssb * 100 DIV (sst DIV 100) END AS eta2_bp")
      },
      Some("""
        WITH x AS (
          SELECT c.c_mktsegment AS seg,
                 CAST(floor(o.o_totalprice + 0.5) AS BIGINT) AS v
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        g AS (SELECT seg, count(*) AS ng, CAST(sum(v) AS BIGINT) AS sg
              FROM x GROUP BY 1),
        tot AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS st,
                       CAST(sum(v * v) AS BIGINT) AS s2 FROM x),
        parts AS (
          SELECT g.ng, tot.n, tot.st, tot.s2,
                 g.ng * ((g.sg // g.ng - tot.st // tot.n)
                         * (g.sg // g.ng - tot.st // tot.n)) AS ssb_part
          FROM g CROSS JOIN tot),
        agg AS (
          SELECT count(*) AS k, max(n) AS n, max(st) AS st, max(s2) AS s2,
                 CAST(sum(ssb_part) AS BIGINT) AS ssb
          FROM parts GROUP BY n, st, s2)
        SELECT k, n, ssb,
               s2 - 2 * (st // n) * st + n * (st // n) * (st // n) AS sst,
               CASE WHEN s2 - 2 * (st // n) * st + n * (st // n) * (st // n) >= 100
                    THEN ssb * 100 // ((s2 - 2 * (st // n) * st
                         + n * (st // n) * (st // n)) // 100) END AS eta2_bp
        FROM agg""")),

    // --------------------------------------------------------------- q259
    QDef("q259_dedup_ordering",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir) // (doc_id, sh, sig) cached
        val sigs = docs.select("doc_id", "sig")
        val full = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 6, bandSize = 2)
          .agg(count(lit(1)).as("pairs_full"))
        // exact-dup keepers (q223's rule: min doc_id per canonical key)
        val keep = t(s, dir, "documents")
          .withColumn("sig0",
            Dedup.canonicalKey(graft.functions.TextFunctions.words(col("text"))))
          .groupBy("sig0").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val dedupPairs = Dedup.lshCandidates(
            sigs.join(keep, "doc_id"), "doc_id", "sig", nHashes = 6, bandSize = 2)
          .agg(count(lit(1)).as("pairs_dedup"))
        full.crossJoin(dedupPairs)
          .selectExpr("pairs_full", "pairs_dedup",
            """CASE WHEN pairs_full > 0
               THEN (pairs_full - pairs_dedup) * 10000 DIV pairs_full END AS reduction_bp""")
      },
      Some {
        val wS = graft.functions.TextFunctions.wordsSql("text")
        s"""
        ${QueriesC.candidatePairsSql},
        keep AS (
          SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id, ${Dedup.canonicalKeySql("w")} AS sig0
                FROM (SELECT doc_id, $wS AS w FROM documents))
          GROUP BY sig0),
        dp AS (
          SELECT count(*) AS pairs_dedup
          FROM pairs p
          WHERE p.id_a IN (SELECT doc_id FROM keep)
            AND p.id_b IN (SELECT doc_id FROM keep)),
        fp AS (SELECT count(*) AS pairs_full FROM pairs)
        SELECT fp.pairs_full, dp.pairs_dedup,
               CASE WHEN fp.pairs_full > 0
                    THEN (fp.pairs_full - dp.pairs_dedup) * 10000
                         // fp.pairs_full END AS reduction_bp
        FROM fp CROSS JOIN dp"""
      }),

    // --------------------------------------------------------------- q260
    QDef("q260_bot_detection",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_ms", "event_id")
        val per = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id")
          .withColumn("gap", col("ts_ms") - lag("ts_ms", 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            (max("ts_ms") - min("ts_ms")).as("span_ms"),
            min("gap").cast("bigint").as("min_gap_ms"))
          .where(col("n") >= 10L)
        per.selectExpr("""
            CASE WHEN min_gap_ms < 60000 THEN 'a_burst'
                 WHEN min_gap_ms < 300000 THEN 'b_suspicious'
                 ELSE 'c_human_paced' END AS flag""")
          .groupBy("flag").agg(count(lit(1)).as("n_users"))
          .orderBy("flag")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events),
        per AS (
          SELECT user_id, count(*) AS n,
                 max(ts_ms) - min(ts_ms) AS span_ms,
                 CAST(min(gap) AS BIGINT) AS min_gap_ms
          FROM ev GROUP BY 1 HAVING count(*) >= 10),
        f AS (
          SELECT CASE WHEN min_gap_ms < 60000 THEN 'a_burst'
                      WHEN min_gap_ms < 300000 THEN 'b_suspicious'
                      ELSE 'c_human_paced' END AS flag
          FROM per)
        SELECT flag, count(*) AS n_users FROM f
        GROUP BY 1 ORDER BY flag""")),

    // --------------------------------------------------------------- q261
    QDef("q261_dow_hour_heatmap",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .selectExpr("event_type",
            s"(($tsMs) DIV 86400000 + 4) % 7 AS dow", // epoch day 0 = Thursday
            s"(($tsMs) DIV 3600000) % 24 AS hour")
          .groupBy("event_type", "dow", "hour").agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("n").desc, col("dow"), col("hour"))
        val tot = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        cells
          .withColumn("rk", row_number().over(w))
          .withColumn("total", sum("n").over(tot))
          .where(col("rk") <= 5)
          .selectExpr("event_type", "CAST(rk AS BIGINT) AS rk", "dow", "hour", "n",
            "n * 10000 DIV total AS cell_share_bp")
          .orderBy("event_type", "rk")
      },
      Some("""
        WITH c AS (
          SELECT event_type,
                 (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
                 (epoch_ms(ts) // 3600000) % 24 AS hour,
                 count(*) AS n
          FROM events GROUP BY 1, 2, 3),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                   ORDER BY n DESC, dow, hour) AS rk,
                 sum(n) OVER (PARTITION BY event_type) AS total
          FROM c)
        SELECT event_type, CAST(rk AS BIGINT) AS rk, dow, hour, n,
               CAST(n * 10000 // total AS BIGINT) AS cell_share_bp
        FROM r WHERE rk <= 5
        ORDER BY event_type, rk"""))
  )
}
