package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 116 — robust two-way decomposition,
  * storage tiering, absorbing-chain lifetimes, dictionary sharing:
  *
  *  - q483: Tukey median polish (one full sweep) on the day-of-week ×
  *    hour activity matrix — row medians removed (exact lower-median
  *    rank math over 24 cells), then column medians of the residuals
  *    (over 7): robust additive effects where q106's means would chase
  *    outliers. Output: row/col effects + residual extremes, all
  *    BIGINT.
  *  - q484: storage-tiering economics — per part, recency (last ship
  *    day) buckets into hot/warm/cold, cost model 10/3/1 per unit;
  *    misplacement audit: cold items with ≥5 accesses that the policy
  *    should promote. The data-temperature planner beside q136/q466.
  *  - q485: absorbing Markov chain expected lifetime — weekly
  *    active/dormant (user, surface) states, transition probabilities in exact
  *    micro, and the fundamental-matrix closed form for 2 transient
  *    states: t_A = (1e6 + p_AD)·1000 DIV det, det = (1e6 − p_AA) −
  *    p_AD·p_DA DIV 1e6. Expected months before churn from each state
  *    — q200's lifecycle counts turned into a forecast.
  *  - q486: dictionary-sharing economics — per-source vocabulary bytes
  *    vs one shared global dictionary: per-source share of global and
  *    the dedup saving of sharing (bp). The columnar-dictionary layout
  *    decision (q353's cross-partition sequel).
  *
  * Reference analog: robust weekday/hour load effects, response-store
  * temperature tiers, listing-lifetime forecasts, shared token
  * dictionaries across areas.
  */
object QueriesDS extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q483
    QDef("q483_median_polish",
      (s, dir) => {
        val m = t(s, dir, "events")
          .selectExpr(s"(($tsMs) DIV 86400000 + 4) % 7 AS dow",
            s"(($tsMs) DIV 3600000) % 24 AS hr")
          .groupBy("dow", "hr").agg(count(lit(1)).cast("long").as("c"))
        val rowMed = m
          .withColumn("rn", row_number().over(Window.partitionBy("dow")
            .orderBy("c", "hr")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("dow"))
            .cast("long"))
          .where(col("rn") * 2 === col("n") + (col("n") % 2))
          .groupBy("dow").agg(min("c").as("row_eff"))
        val r1 = m.join(rowMed, "dow")
          .selectExpr("dow", "hr", "c - row_eff AS r")
        val colMed = r1
          .withColumn("rn", row_number().over(Window.partitionBy("hr")
            .orderBy("r", "dow")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("hr"))
            .cast("long"))
          .where(col("rn") * 2 === col("n") + (col("n") % 2))
          .groupBy("hr").agg(min("r").as("col_eff"))
        val resid = r1.join(colMed, "hr")
          .selectExpr("dow", "hr", "r - col_eff AS e")
        val stats = resid.agg(min("e").cast("long").as("min_resid"),
          max("e").cast("long").as("max_resid"))
        rowMed.selectExpr("'row' AS kind", "dow AS idx",
            "CAST(row_eff AS BIGINT) AS effect")
          .union(colMed.selectExpr("'col' AS kind", "hr AS idx",
            "CAST(col_eff AS BIGINT) AS effect"))
          .union(stats.selectExpr("'residmin' AS kind",
            "CAST(0 AS BIGINT) AS idx", "min_resid AS effect"))
          .union(stats.selectExpr("'residmax' AS kind", "CAST(0 AS BIGINT)",
            "max_resid"))
          .orderBy("kind", "idx")
      },
      Some("""
        WITH m AS (
          SELECT (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
                 (epoch_ms(ts) // 3600000) % 24 AS hr,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        rowmed AS (
          SELECT dow, min(c) AS row_eff FROM (
            SELECT dow, c,
                   row_number() OVER (PARTITION BY dow ORDER BY c, hr) AS rn,
                   count(*) OVER (PARTITION BY dow) AS n
            FROM m)
          WHERE rn * 2 = n + (n % 2) GROUP BY 1),
        r1 AS (
          SELECT m.dow, hr, c - row_eff AS r
          FROM m JOIN rowmed ON m.dow = rowmed.dow),
        colmed AS (
          SELECT hr, min(r) AS col_eff FROM (
            SELECT hr, r,
                   row_number() OVER (PARTITION BY hr ORDER BY r, dow) AS rn,
                   count(*) OVER (PARTITION BY hr) AS n
            FROM r1)
          WHERE rn * 2 = n + (n % 2) GROUP BY 1),
        resid AS (
          SELECT r1.dow, r1.hr, r - col_eff AS e
          FROM r1 JOIN colmed ON r1.hr = colmed.hr),
        stats AS (SELECT min(e) AS mn, max(e) AS mx FROM resid)
        SELECT 'row' AS kind, CAST(dow AS BIGINT) AS idx,
               CAST(row_eff AS BIGINT) AS effect FROM rowmed
        UNION ALL
        SELECT 'col', CAST(hr AS BIGINT), CAST(col_eff AS BIGINT) FROM colmed
        UNION ALL
        SELECT 'residmin', 0, CAST(mn AS BIGINT) FROM stats
        UNION ALL
        SELECT 'residmax', 0, CAST(mx AS BIGINT) FROM stats
        ORDER BY kind, idx""")),

    // --------------------------------------------------------------- q484
    QDef("q484_storage_tiers",
      (s, dir) => {
        val acc = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS d",
            "CAST(l_quantity AS BIGINT) AS q")
          .groupBy("l_partkey").agg(
            max("d").cast("long").as("last_d"),
            count(lit(1)).cast("long").as("accesses"),
            sum("q").cast("bigint").as("units"))
        val hi = acc.agg(max("last_d").as("today"))
        val tiered = acc.crossJoin(broadcast(hi))
          .selectExpr("l_partkey", "accesses", "units",
            """CASE WHEN today - last_d <= 7 THEN 'hot'
               WHEN today - last_d <= 21 THEN 'warm' ELSE 'cold' END AS tier""")
        tiered.groupBy("tier").agg(
          count(lit(1)).cast("long").as("parts"),
          sum("units").cast("bigint").as("units"),
          sum("accesses").cast("bigint").as("accesses"),
          sum(expr(
            "units * CASE tier WHEN 'hot' THEN 10 WHEN 'warm' THEN 3 ELSE 1 END"))
            .cast("bigint").as("storage_cost"),
          sum(when(col("tier") === "cold" && col("accesses") >= 5, 1L)
            .otherwise(0L)).cast("bigint").as("misplaced"))
          .orderBy("tier")
      },
      Some("""
        WITH acc AS (
          SELECT l_partkey, max(epoch_ms(l_shipdate) // 86400000) AS last_d,
                 count(*) AS accesses, sum(CAST(l_quantity AS BIGINT)) AS units
          FROM lineitem GROUP BY 1),
        hi AS (SELECT max(last_d) AS today FROM acc),
        tiered AS (
          SELECT l_partkey, accesses, units,
                 CASE WHEN today - last_d <= 7 THEN 'hot'
                      WHEN today - last_d <= 21 THEN 'warm'
                      ELSE 'cold' END AS tier
          FROM acc, hi)
        SELECT tier, CAST(count(*) AS BIGINT) AS parts,
               CAST(sum(units) AS BIGINT) AS units,
               CAST(sum(accesses) AS BIGINT) AS accesses,
               CAST(sum(units * CASE tier WHEN 'hot' THEN 10
                 WHEN 'warm' THEN 3 ELSE 1 END) AS BIGINT) AS storage_cost,
               CAST(sum(CASE WHEN tier = 'cold' AND accesses >= 5
                 THEN 1 ELSE 0 END) AS BIGINT) AS misplaced
        FROM tiered GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q485
    QDef("q485_absorbing_lifetime",
      (s, dir) => {
        val months = t(s, dir, "events")
          .selectExpr("concat(user_id, '|', event_type) AS ent",
            s"($tsMs) DIV 86400000 DIV 7 AS m")
          .distinct()
        val dom = months.agg(min("m").as("lo"), max("m").as("hi"))
        val userMonths = months.select("ent").distinct()
          .crossJoin(broadcast(dom))
          .select(col("ent"), explode(sequence(col("lo"), col("hi")))
            .as("m"))
          .join(months.withColumn("active", lit(1L)), Seq("ent", "m"),
            "left")
          .selectExpr("ent", "m", "coalesce(active, 0) AS a")
        val w = Window.partitionBy("ent").orderBy("m")
        val trans = userMonths
          .withColumn("nxt", lead("a", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy(lit(1L).as("one")).agg(
            sum(when(col("a") === 1 && col("nxt") === 1, 1L).otherwise(0L))
              .cast("bigint").as("aa"),
            sum(when(col("a") === 1 && col("nxt") === 0, 1L).otherwise(0L))
              .cast("bigint").as("ad"),
            sum(when(col("a") === 0 && col("nxt") === 1, 1L).otherwise(0L))
              .cast("bigint").as("da"),
            sum(when(col("a") === 0 && col("nxt") === 0, 1L).otherwise(0L))
              .cast("bigint").as("dd"))
        trans.selectExpr("aa", "ad", "da", "dd",
          "CASE WHEN aa + ad > 0 THEN aa * 1000000 DIV (aa + ad) ELSE 0 END AS paa",
          "CASE WHEN aa + ad > 0 THEN ad * 1000000 DIV (aa + ad) ELSE 0 END AS pad",
          "CASE WHEN da + dd > 0 THEN da * 1000000 DIV (da + dd) ELSE 0 END AS pda")
          .selectExpr("aa", "ad", "da", "dd", "paa", "pad", "pda",
            "(1000000 - paa) - (pad * pda) DIV 1000000 AS det")
          .selectExpr("paa", "pad", "pda", "det",
            "CASE WHEN det > 0 THEN (1000000 + pad) * 1000 DIV det ELSE -1 END AS t_active_milli",
            "CASE WHEN det > 0 THEN (pda + (1000000 - paa)) * 1000 DIV det ELSE -1 END AS t_dormant_milli")
      },
      Some("""
        WITH months AS (
          SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type AS ent,
                 epoch_ms(ts) // 86400000 // 7 AS m
          FROM events),
        dom AS (SELECT min(m) AS lo, max(m) AS hi FROM months),
        gs AS (SELECT unnest(range((SELECT lo FROM dom),
                                   (SELECT hi FROM dom) + 1)) AS m),
        um AS (
          SELECT u.ent, gs.m,
                 CASE WHEN months.ent IS NOT NULL THEN 1 ELSE 0 END AS a
          FROM (SELECT DISTINCT ent FROM months) u
          CROSS JOIN gs
          LEFT JOIN months ON months.ent = u.ent AND months.m = gs.m),
        tr AS (
          SELECT a, lead(a) OVER (PARTITION BY ent ORDER BY m) AS nxt
          FROM um),
        trans AS (
          SELECT sum(CASE WHEN a = 1 AND nxt = 1 THEN 1 ELSE 0 END) AS aa,
                 sum(CASE WHEN a = 1 AND nxt = 0 THEN 1 ELSE 0 END) AS ad,
                 sum(CASE WHEN a = 0 AND nxt = 1 THEN 1 ELSE 0 END) AS da,
                 sum(CASE WHEN a = 0 AND nxt = 0 THEN 1 ELSE 0 END) AS dd
          FROM tr WHERE nxt IS NOT NULL),
        p AS (
          SELECT aa, ad, da, dd,
                 CASE WHEN aa + ad > 0 THEN aa * 1000000 // (aa + ad)
                      ELSE 0 END AS paa,
                 CASE WHEN aa + ad > 0 THEN ad * 1000000 // (aa + ad)
                      ELSE 0 END AS pad,
                 CASE WHEN da + dd > 0 THEN da * 1000000 // (da + dd)
                      ELSE 0 END AS pda
          FROM trans),
        d AS (
          SELECT paa, pad, pda,
                 (1000000 - paa) - (pad * pda) // 1000000 AS det
          FROM p)
        SELECT CAST(paa AS BIGINT) AS paa, CAST(pad AS BIGINT) AS pad,
               CAST(pda AS BIGINT) AS pda, CAST(det AS BIGINT) AS det,
               CAST(CASE WHEN det > 0 THEN (1000000 + pad) * 1000 // det
                 ELSE -1 END AS BIGINT) AS t_active_milli,
               CAST(CASE WHEN det > 0
                 THEN (pda + (1000000 - paa)) * 1000 // det
                 ELSE -1 END AS BIGINT) AS t_dormant_milli
        FROM d""")),

    // --------------------------------------------------------------- q486
    QDef("q486_dict_sharing",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("source"),
            explode(TextFunctions.words(col("text"))).as("tok"))
        val perSrc = toks.select("source", "tok").distinct()
          .groupBy("source").agg(
            count(lit(1)).cast("bigint").as("dict_words"),
            sum(length(col("tok")) + 1).cast("bigint").as("dict_bytes"))
        val global = toks.select("tok").distinct()
          .agg(count(lit(1)).cast("bigint").as("g_words"),
            sum(length(col("tok")) + 1).cast("bigint").as("g_bytes"))
        val tot = perSrc.agg(sum("dict_bytes").cast("bigint").as("sum_bytes"))
        perSrc.crossJoin(broadcast(global)).crossJoin(broadcast(tot))
          .selectExpr("source", "dict_words", "dict_bytes", "g_words",
            "g_bytes",
            "dict_words * 10000 DIV g_words AS coverage_bp",
            "(sum_bytes - g_bytes) * 10000 DIV sum_bytes AS sharing_saving_bp")
          .orderBy("source")
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest(${TextFunctions.wordsSql("text")}) AS tok
          FROM documents),
        persrc AS (
          SELECT source, count(*) AS dict_words,
                 sum(length(tok) + 1) AS dict_bytes
          FROM (SELECT DISTINCT source, tok FROM toks) GROUP BY 1),
        gdict AS (
          SELECT count(*) AS g_words, sum(length(tok) + 1) AS g_bytes
          FROM (SELECT DISTINCT tok FROM toks)),
        tot AS (SELECT sum(dict_bytes) AS sum_bytes FROM persrc)
        SELECT source, CAST(dict_words AS BIGINT) AS dict_words,
               CAST(dict_bytes AS BIGINT) AS dict_bytes,
               CAST(g_words AS BIGINT) AS g_words,
               CAST(g_bytes AS BIGINT) AS g_bytes,
               CAST(dict_words * 10000 // g_words AS BIGINT) AS coverage_bp,
               CAST((sum_bytes - g_bytes) * 10000 // sum_bytes AS BIGINT)
                 AS sharing_saving_bp
        FROM persrc, gdict, tot
        ORDER BY source"""))
  )
}
