package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 106 — offline policy evaluation,
  * coding-cost analysis, trajectory stay-points:
  *
  *  - q443: ε-greedy bandit REPLAY evaluation (Li et al.'s replay
  *    method) — each user's event stream is a logged bandit run: arms =
  *    the 5 event types, reward = value ≥ 50. The deterministic target
  *    policy (hash-ε exploration, exact integer-micro mean argmax with
  *    fixed tiebreak) is replayed against the log; only steps where the
  *    policy's choice equals the logged arm count and update state.
  *    Per-key sequential state (5 counts + 5 reward sums) on the
  *    secondary-sort mapPartitions path; the oracle carries the same 10
  *    state columns through a recursive CTE, arm argmax via
  *    list_max-of-structs. Hash draws are PRECOMPUTED as columns so
  *    both engines read identical randomness.
  *  - q444: inverse-propensity-scoring (IPS) OPE companion — logging
  *    propensities from the empirical arm mix, target policy = the
  *    globally best mean arm; IPS value = Σ 1{a=π}·r·10⁶ DIV p̂_bp
  *    vs the direct mean of the target arm. The estimator-vs-replay
  *    cross-check (q443 is conditional; this is reweighted).
  *  - q445: tokenization-unit coding cost per language — Shannon
  *    entropy of the character distribution vs the word distribution
  *    (floor-pico ln terms, exact integer sums, the q396 pattern);
  *    bits-per-char comparison H_char vs H_word / avg_word_len decides
  *    which unit compresses the corpus better — the tokenizer-design
  *    economics beside q192's fertility.
  *  - q446: trajectory stay-point detection — consecutive synthetic-geo
  *    points within an integer squared-distance radius form "stay"
  *    runs (lag + islands trick); episodes of length ≥ 2 are dwells.
  *    Per user: episodes, dwell points, longest dwell. The
  *    stop-vs-move segmentation that pairs with q110 (drift) and q440
  *    (shape).
  *
  * Reference analog: scheduler-policy what-if evaluation on logged
  * harvests, corpus storage-unit planning, listing-visit dwell analysis.
  */
object QueriesDI extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class BanditEv(user_id: Long, rn: Long, aidx: Int, r: Long,
                      ex: Int, earm: Int)
  case class BanditOut(user_id: Long, steps: Long, matched: Long, rew: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q443
    QDef("q443_bandit_replay",
      (s, dir) => {
        import s.implicits._
        val acc2 = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id",
            "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
              "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS aidx",
            "CASE WHEN value >= 50 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r")
          .withColumn("rn", row_number().over(Window.partitionBy("user_id")
            .orderBy("ms", "event_id")).cast("long"))
          .withColumn("key", concat(col("user_id"), lit("|"), col("rn")))
          .withColumn("ex",
            (pmod(PortableHash.md5Long(col("key"), salt = "eg~"), lit(10L))
              === 0).cast("int"))
          .withColumn("earm",
            pmod(PortableHash.md5Long(col("key"), salt = "arm~"), lit(5L))
              .cast("int"))
          .select(col("user_id"), col("rn"), col("aidx").cast("int"),
            col("r"), col("ex"), col("earm"))
          .as[BanditEv]
        val replay = acc2
          .repartition(col("user_id")).sortWithinPartitions("user_id", "rn")
          .mapPartitions { it =>
            val out = scala.collection.mutable.ArrayBuffer.empty[BanditOut]
            var cur = -1L
            val n = Array.fill(5)(0L); val sm = Array.fill(5)(0L)
            var steps = 0L; var matched = 0L; var rew = 0L
            def flush(): Unit =
              if (cur >= 0) out += BanditOut(cur, steps, matched, rew)
            it.foreach { e =>
              if (e.user_id != cur) {
                flush(); cur = e.user_id
                java.util.Arrays.fill(n, 0L); java.util.Arrays.fill(sm, 0L)
                steps = 0; matched = 0; rew = 0
              }
              steps += 1
              val chosen =
                if (e.ex == 1) e.earm
                else {
                  var best = 0; var bestM = Long.MinValue
                  var i = 0
                  while (i < 5) {
                    val m = if (n(i) > 0) sm(i) * 1000000L / n(i) else -1L
                    if (m > bestM) { bestM = m; best = i }
                    i += 1
                  }
                  best
                }
              if (chosen == e.aidx) {
                matched += 1; rew += e.r
                n(e.aidx) += 1; sm(e.aidx) += e.r
              }
            }
            flush()
            out.iterator
          }.toDF()
        replay.groupBy(expr("user_id % 10").as("bucket")).agg(
          count(lit(1)).cast("long").as("users"),
          sum("steps").cast("bigint").as("steps"),
          sum("matched").cast("bigint").as("matched"),
          sum("rew").cast("bigint").as("rewards"))
          .selectExpr("bucket", "users", "steps", "matched", "rewards",
            "matched * 10000 DIV steps AS match_bp",
            "CASE WHEN matched > 0 THEN rewards * 1000 DIV matched ELSE -1 END AS avg_reward_milli")
          .orderBy("bucket")
      },
      Some(s"""
        WITH RECURSIVE acc AS MATERIALIZED (
          SELECT user_id, rn, aidx, r, ex, earm FROM (
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY epoch_ms(ts), event_id) AS rn,
                   CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                     WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END
                     AS aidx,
                   CASE WHEN value >= 50 THEN 1 ELSE 0 END AS r,
                   CASE WHEN ${PortableHash.md5LongSql(
                     "CAST(user_id AS VARCHAR) || '|' || CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS VARCHAR)",
                     "eg~")} % 10 = 0 THEN 1 ELSE 0 END AS ex,
                   ${PortableHash.md5LongSql(
                     "CAST(user_id AS VARCHAR) || '|' || CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS VARCHAR)",
                     "arm~")} % 5 AS earm
            FROM events)),
        maxs AS MATERIALIZED (SELECT user_id, max(rn) AS ns FROM acc GROUP BY 1),
        rec AS (
          SELECT user_id, CAST(0 AS BIGINT) AS t,
                 CAST(0 AS BIGINT) AS n0, CAST(0 AS BIGINT) AS n1,
                 CAST(0 AS BIGINT) AS n2, CAST(0 AS BIGINT) AS n3,
                 CAST(0 AS BIGINT) AS n4,
                 CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
                 CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
                 CAST(0 AS BIGINT) AS s4,
                 CAST(0 AS BIGINT) AS mt, CAST(0 AS BIGINT) AS rw
          FROM maxs
          UNION ALL
          SELECT user_id, t, n0 + CASE WHEN hit AND aidx = 0 THEN 1 ELSE 0 END,
                 n1 + CASE WHEN hit AND aidx = 1 THEN 1 ELSE 0 END,
                 n2 + CASE WHEN hit AND aidx = 2 THEN 1 ELSE 0 END,
                 n3 + CASE WHEN hit AND aidx = 3 THEN 1 ELSE 0 END,
                 n4 + CASE WHEN hit AND aidx = 4 THEN 1 ELSE 0 END,
                 s0 + CASE WHEN hit AND aidx = 0 THEN r ELSE 0 END,
                 s1 + CASE WHEN hit AND aidx = 1 THEN r ELSE 0 END,
                 s2 + CASE WHEN hit AND aidx = 2 THEN r ELSE 0 END,
                 s3 + CASE WHEN hit AND aidx = 3 THEN r ELSE 0 END,
                 s4 + CASE WHEN hit AND aidx = 4 THEN r ELSE 0 END,
                 mt + CASE WHEN hit THEN 1 ELSE 0 END,
                 rw + CASE WHEN hit THEN r ELSE 0 END
          FROM (
            SELECT r.user_id, r.t + 1 AS t, a.aidx, a.r,
                   r.n0, r.n1, r.n2, r.n3, r.n4,
                   r.s0, r.s1, r.s2, r.s3, r.s4, r.mt, r.rw,
                   (CASE WHEN a.ex = 1 THEN a.earm ELSE
                     -(list_max([
                       {'m': CASE WHEN r.n0 > 0 THEN r.s0 * 1000000 // r.n0 ELSE -1 END, 'ni': 0},
                       {'m': CASE WHEN r.n1 > 0 THEN r.s1 * 1000000 // r.n1 ELSE -1 END, 'ni': -1},
                       {'m': CASE WHEN r.n2 > 0 THEN r.s2 * 1000000 // r.n2 ELSE -1 END, 'ni': -2},
                       {'m': CASE WHEN r.n3 > 0 THEN r.s3 * 1000000 // r.n3 ELSE -1 END, 'ni': -3},
                       {'m': CASE WHEN r.n4 > 0 THEN r.s4 * 1000000 // r.n4 ELSE -1 END, 'ni': -4}
                     ]).ni) END = a.aidx) AS hit
            FROM rec r JOIN acc a ON a.user_id = r.user_id AND a.rn = r.t + 1)),
        fin AS (
          SELECT rec.user_id, rec.t AS steps, rec.mt, rec.rw
          FROM rec JOIN maxs ON rec.user_id = maxs.user_id
                            AND rec.t = maxs.ns)
        SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS users,
               CAST(sum(steps) AS BIGINT) AS steps,
               CAST(sum(mt) AS BIGINT) AS matched,
               CAST(sum(rw) AS BIGINT) AS rewards,
               CAST(sum(mt) * 10000 // sum(steps) AS BIGINT) AS match_bp,
               CAST(CASE WHEN sum(mt) > 0
                 THEN sum(rw) * 1000 // sum(mt) ELSE -1 END AS BIGINT)
                 AS avg_reward_milli
        FROM fin GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q444
    QDef("q444_ips_estimator",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type AS a",
            "CASE WHEN value >= 50 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r")
        val mix = ev.groupBy("a").agg(
          count(lit(1)).cast("bigint").as("na"),
          sum("r").cast("bigint").as("ra"))
        val nTot = mix.agg(sum("na").cast("bigint").as("nt"))
        val props = mix.crossJoin(broadcast(nTot))
          .selectExpr("a", "na", "ra", "nt",
            "na * 10000 DIV nt AS p_bp",
            "ra * 1000000 DIV na AS mean_micro")
        val target = props.orderBy(col("mean_micro").desc, col("a")).limit(1)
          .select(col("a").as("pi_arm"), col("p_bp").as("pi_p_bp"),
            col("mean_micro").as("direct_micro"), col("na").as("pi_n"),
            col("ra").as("pi_r"), col("nt"))
        target.selectExpr("pi_arm", "pi_p_bp", "pi_n", "nt", "direct_micro",
          "(pi_r * 10000 DIV pi_p_bp) * 1000000 DIV nt AS ips_micro")
          .withColumn("bias_micro",
            col("ips_micro") - col("direct_micro"))
          .orderBy("pi_arm")
      },
      Some("""
        WITH ev AS (
          SELECT event_type AS a,
                 CASE WHEN value >= 50 THEN 1 ELSE 0 END AS r
          FROM events),
        mix AS (SELECT a, count(*) AS na, sum(r) AS ra FROM ev GROUP BY 1),
        nt AS (SELECT sum(na) AS nt FROM mix),
        props AS (
          SELECT a, na, ra, nt.nt,
                 na * 10000 // nt.nt AS p_bp,
                 ra * 1000000 // na AS mean_micro
          FROM mix, nt),
        target AS (
          SELECT a AS pi_arm, p_bp AS pi_p_bp, mean_micro AS direct_micro,
                 na AS pi_n, ra AS pi_r, nt
          FROM props ORDER BY mean_micro DESC, a LIMIT 1)
        SELECT pi_arm, CAST(pi_p_bp AS BIGINT) AS pi_p_bp,
               CAST(pi_n AS BIGINT) AS pi_n, CAST(nt AS BIGINT) AS nt,
               CAST(direct_micro AS BIGINT) AS direct_micro,
               CAST((pi_r * 10000 // pi_p_bp) * 1000000 // nt AS BIGINT)
                 AS ips_micro,
               CAST((pi_r * 10000 // pi_p_bp) * 1000000 // nt
                 - direct_micro AS BIGINT) AS bias_micro
        FROM target ORDER BY pi_arm""")),

    // --------------------------------------------------------------- q445
    QDef("q445_unit_entropy",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val words = docs.select(col("lang"),
          explode(TextFunctions.words(col("text"))).as("w"))
        val wstats = words.groupBy("lang", "w").agg(count(lit(1)).as("c"))
          .groupBy("lang").agg(
            sum("c").cast("bigint").as("nw"),
            sum(expr(
              "CAST(floor(-(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)"))
              .cast("bigint").as("tw"))
          .selectExpr("lang", "nw",
            "CAST(floor((CAST(tw AS DOUBLE) / 1e6 / CAST(nw AS DOUBLE) + ln(CAST(nw AS DOUBLE))) * 1e6) AS BIGINT) AS h_word_micro")
        val chars = docs.select(col("lang"),
          explode(split(col("text"), "")).as("ch"))
          .where(length(col("ch")) === 1)
        val cstats = chars.groupBy("lang", "ch").agg(count(lit(1)).as("c"))
          .groupBy("lang").agg(
            sum("c").cast("bigint").as("nc"),
            sum(expr(
              "CAST(floor(-(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)"))
              .cast("bigint").as("tc"))
          .selectExpr("lang", "nc",
            "CAST(floor((CAST(tc AS DOUBLE) / 1e6 / CAST(nc AS DOUBLE) + ln(CAST(nc AS DOUBLE))) * 1e6) AS BIGINT) AS h_char_micro")
        wstats.join(cstats, "lang")
          .selectExpr("lang", "nw", "nc", "h_word_micro", "h_char_micro",
            "nc * 1000 DIV nw AS chars_per_word_milli",
            "h_word_micro * 1000 DIV (nc * 1000 DIV nw) AS word_cost_per_char_micro")
          .orderBy("lang")
      },
      Some(s"""
        WITH words AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS w
          FROM documents),
        wstats AS (
          SELECT lang, sum(c) AS nw,
                 sum(CAST(floor(-(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                   * 1e6) AS BIGINT)) AS tw
          FROM (SELECT lang, w, count(*) AS c FROM words GROUP BY 1, 2)
          GROUP BY 1),
        hw AS (
          SELECT lang, nw,
                 CAST(floor((CAST(tw AS DOUBLE) / 1e6 / CAST(nw AS DOUBLE)
                   + ln(CAST(nw AS DOUBLE))) * 1e6) AS BIGINT) AS h_word_micro
          FROM wstats),
        chars AS (
          SELECT lang, unnest(string_split_regex(text, '')) AS ch
          FROM documents),
        chf AS (SELECT lang, ch FROM chars WHERE length(ch) = 1),
        cstats AS (
          SELECT lang, sum(c) AS nc,
                 sum(CAST(floor(-(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                   * 1e6) AS BIGINT)) AS tc
          FROM (SELECT lang, ch, count(*) AS c FROM chf GROUP BY 1, 2)
          GROUP BY 1),
        hc AS (
          SELECT lang, nc,
                 CAST(floor((CAST(tc AS DOUBLE) / 1e6 / CAST(nc AS DOUBLE)
                   + ln(CAST(nc AS DOUBLE))) * 1e6) AS BIGINT) AS h_char_micro
          FROM cstats)
        SELECT hw.lang AS lang, CAST(nw AS BIGINT) AS nw,
               CAST(nc AS BIGINT) AS nc,
               CAST(h_word_micro AS BIGINT) AS h_word_micro,
               CAST(h_char_micro AS BIGINT) AS h_char_micro,
               CAST(nc * 1000 // nw AS BIGINT) AS chars_per_word_milli,
               CAST(h_word_micro * 1000 // (nc * 1000 // nw) AS BIGINT)
                 AS word_cost_per_char_micro
        FROM hw JOIN hc ON hw.lang = hc.lang
        ORDER BY lang""")),

    // --------------------------------------------------------------- q446
    QDef("q446_staypoints",
      (s, dir) => {
        val r2 = 9000000L // squared lattice radius
        val pts = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id",
            "(user_id * 47 + event_id * 13) % 36000 AS x",
            "(user_id * 31 + event_id * 7) % 17000 AS y")
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val flagged = pts
          .withColumn("px", lag("x", 1).over(w))
          .withColumn("py", lag("y", 1).over(w))
          .withColumn("i", row_number().over(w).cast("long"))
          .selectExpr("user_id", "i",
            s"CASE WHEN px IS NOT NULL AND (x - px) * (x - px) + (y - py) * (y - py) <= $r2 THEN 1 ELSE 0 END AS near")
        val isl = flagged.where(col("near") === 1)
          .withColumn("grp", (col("i") - row_number().over(
            Window.partitionBy("user_id").orderBy("i"))).cast("long"))
          .groupBy("user_id", "grp").agg(count(lit(1)).cast("long").as("len"))
          .where(col("len") >= 2)
        val agg = isl.groupBy("user_id").agg(
          count(lit(1)).cast("long").as("episodes"),
          sum("len").cast("bigint").as("dwell_pts"),
          max("len").cast("long").as("longest"))
        pts.groupBy("user_id").agg(count(lit(1)).cast("long").as("n_pts"))
          .join(agg, Seq("user_id"), "left")
          .selectExpr("user_id", "n_pts",
            "coalesce(episodes, 0) AS episodes",
            "coalesce(dwell_pts, 0) AS dwell_pts",
            "coalesce(longest, 0) AS longest")
          .groupBy(expr("user_id % 10").as("bucket")).agg(
            count(lit(1)).cast("long").as("users"),
            sum("n_pts").cast("bigint").as("points"),
            sum("episodes").cast("bigint").as("episodes"),
            sum("dwell_pts").cast("bigint").as("dwell_pts"),
            max("longest").cast("long").as("longest"))
          .orderBy("bucket")
      },
      Some("""
        WITH pts AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id,
                 (user_id * 47 + event_id * 13) % 36000 AS x,
                 (user_id * 31 + event_id * 7) % 17000 AS y
          FROM events),
        flagged AS (
          SELECT user_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ms, event_id) AS i,
                 CASE WHEN lag(x) OVER (PARTITION BY user_id
                        ORDER BY ms, event_id) IS NOT NULL
                       AND (x - lag(x) OVER (PARTITION BY user_id
                             ORDER BY ms, event_id))
                           * (x - lag(x) OVER (PARTITION BY user_id
                             ORDER BY ms, event_id))
                         + (y - lag(y) OVER (PARTITION BY user_id
                             ORDER BY ms, event_id))
                           * (y - lag(y) OVER (PARTITION BY user_id
                             ORDER BY ms, event_id)) <= 9000000
                      THEN 1 ELSE 0 END AS near
          FROM pts),
        isl AS (
          SELECT user_id, grp, count(*) AS len FROM (
            SELECT user_id, i,
                   i - row_number() OVER (PARTITION BY user_id ORDER BY i)
                     AS grp
            FROM flagged WHERE near = 1)
          GROUP BY 1, 2 HAVING count(*) >= 2),
        agg AS (
          SELECT user_id, count(*) AS episodes, sum(len) AS dwell_pts,
                 max(len) AS longest
          FROM isl GROUP BY 1),
        np AS (SELECT user_id, count(*) AS n_pts FROM pts GROUP BY 1)
        SELECT CAST(np.user_id % 10 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS users,
               CAST(sum(n_pts) AS BIGINT) AS points,
               CAST(sum(coalesce(episodes, 0)) AS BIGINT) AS episodes,
               CAST(sum(coalesce(dwell_pts, 0)) AS BIGINT) AS dwell_pts,
               CAST(max(coalesce(longest, 0)) AS BIGINT) AS longest
        FROM np LEFT JOIN agg ON np.user_id = agg.user_id
        GROUP BY 1 ORDER BY 1"""))
  )
}
