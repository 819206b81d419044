package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 104 — stratified causal estimates,
  * paired binary tests, mergeable softmax normalizers, diversity coresets:
  *
  *  - q435: propensity-stratified ATE — deterministic treatment (odd
  *    user) and hash-score deciles as propensity strata (q208's score);
  *    per-stratum treated/control purchase rates (micro) and the
  *    stratum-weighted average treatment effect Σ nₛ·Δₛ DIV N. The
  *    blocking estimator beside q239's DiD and q403's RD.
  *  - q436: McNemar paired test per event type — each user's first-half
  *    vs second-half activity as the paired binary outcome; discordant
  *    counts b (lost) / c (gained), χ² = (b−c)²·10⁶ DIV (b+c) exact.
  *    The paired drift test that ignores concordant users entirely.
  *  - q437: log-sum-exp merge audit — the softmax normalizer over each
  *    query's cosine-score vector computed DIRECTLY vs MERGED from two
  *    hash-halves by the streaming rule (m = max(m₁,m₂); z = z₁·e^(m₁−m)
  *    + z₂·e^(m₂−m)), exp terms floor-micro so sums are exact integers.
  *    Proves the numerically-stable normalizer is map-side mergeable —
  *    the attention/softmax shape at 100 TB (beside q87/q326's merge
  *    proofs).
  *  - q438: k-center greedy coreset (farthest-first traversal) — seed at
  *    min id, then twice pick the point maximizing its min integer
  *    cosine-distance to the selected set; coverage radius after 3
  *    centers. Each round is one broadcast join + one argmax: the
  *    diversity-sampling selector for training corpora (q422 covers
  *    content; this covers geometry).
  *
  * Reference analog: scheduling-policy effect with propensity blocking,
  * listing-activity drift between survey halves, retrieval softmax
  * normalization at fleet scale, diverse exemplar selection.
  */
object QueriesDG extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q435
    QDef("q435_propensity_ate",
      (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .withColumn("treat", (col("user_id") % 2 === 1).cast("long"))
          .withColumn("stratum",
            pmod(PortableHash.md5Long(col("user_id"), salt = "prop~"),
              lit(10L)))
        val strata = users.groupBy("stratum").agg(
          count(lit(1)).cast("long").as("n"),
          sum(when(col("treat") === 1, 1L).otherwise(0L))
            .cast("bigint").as("n1"),
          sum(when(col("treat") === 1, col("y")).otherwise(0L))
            .cast("bigint").as("y1"),
          sum(when(col("treat") === 0, 1L).otherwise(0L))
            .cast("bigint").as("n0"),
          sum(when(col("treat") === 0, col("y")).otherwise(0L))
            .cast("bigint").as("y0"))
          .where(col("n1") > 0 && col("n0") > 0)
          .selectExpr("stratum", "n", "n1", "n0",
            "y1 * 1000000 DIV n1 AS rate1_micro",
            "y0 * 1000000 DIV n0 AS rate0_micro",
            "(y1 * 1000000 DIV n1) - (y0 * 1000000 DIV n0) AS diff_micro")
        val ate = strata.agg(
          sum("n").cast("bigint").as("nt"),
          sum(col("n") * col("diff_micro")).cast("bigint").as("wsum"))
          .selectExpr("wsum DIV nt AS ate_micro")
        strata.crossJoin(broadcast(ate))
          .select("stratum", "n", "n1", "n0", "rate1_micro", "rate0_micro",
            "diff_micro", "ate_micro")
          .orderBy("stratum")
      },
      Some(s"""
        WITH users AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
                 CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
                 ${PortableHash.md5LongSql("user_id", "prop~")} % 10 AS stratum
          FROM events GROUP BY user_id),
        strata AS (
          SELECT stratum, count(*) AS n,
                 sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS n1,
                 sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS y1,
                 sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS n0,
                 sum(CASE WHEN treat = 0 THEN y ELSE 0 END) AS y0
          FROM users GROUP BY 1
          HAVING sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) > 0),
        sr AS (
          SELECT stratum, n, n1, n0,
                 y1 * 1000000 // n1 AS rate1_micro,
                 y0 * 1000000 // n0 AS rate0_micro,
                 (y1 * 1000000 // n1) - (y0 * 1000000 // n0) AS diff_micro
          FROM strata),
        ate AS (
          SELECT sum(n * diff_micro) // sum(n) AS ate_micro FROM sr)
        SELECT CAST(stratum AS BIGINT) AS stratum, CAST(n AS BIGINT) AS n,
               CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
               CAST(rate1_micro AS BIGINT) AS rate1_micro,
               CAST(rate0_micro AS BIGINT) AS rate0_micro,
               CAST(diff_micro AS BIGINT) AS diff_micro,
               CAST(ate_micro AS BIGINT) AS ate_micro
        FROM sr, ate ORDER BY stratum""")),

    // --------------------------------------------------------------- q436
    QDef("q436_mcnemar",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"($tsMs) DIV 86400000 AS d")
        val mid = ev.agg(expr("(min(d) + max(d) + 1) DIV 2").cast("long").as("mid"))
        val flags = ev.crossJoin(broadcast(mid))
          .groupBy("user_id", "event_type").agg(
            max(when(col("d") < col("mid"), 1L).otherwise(0L)).as("a1"),
            max(when(col("d") >= col("mid"), 1L).otherwise(0L)).as("a2"))
        flags.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n_users"),
          sum(when(col("a1") === 1 && col("a2") === 0, 1L).otherwise(0L))
            .cast("bigint").as("b_lost"),
          sum(when(col("a1") === 0 && col("a2") === 1, 1L).otherwise(0L))
            .cast("bigint").as("c_gained"),
          sum(when(col("a1") === 1 && col("a2") === 1, 1L).otherwise(0L))
            .cast("bigint").as("both"))
          .selectExpr("event_type", "n_users", "b_lost", "c_gained", "both",
            "CASE WHEN b_lost + c_gained > 0 THEN ((b_lost - c_gained) * (b_lost - c_gained) * 1000000) DIV (b_lost + c_gained) ELSE 0 END AS chi2_micro")
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS d
          FROM events),
        mid AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM ev),
        flags AS (
          SELECT user_id, event_type,
                 max(CASE WHEN d < (SELECT mid FROM mid) THEN 1 ELSE 0 END)
                   AS a1,
                 max(CASE WHEN d >= (SELECT mid FROM mid) THEN 1 ELSE 0 END)
                   AS a2
          FROM ev GROUP BY 1, 2)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS b_lost,
               CAST(sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS c_gained,
               CAST(sum(CASE WHEN a1 = 1 AND a2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS both,
               CAST(CASE WHEN sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
                         + sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END) > 0
                 THEN ((sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
                        - sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END))
                       * (sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
                          - sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END))
                       * 1000000)
                      // (sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
                         + sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END))
                 ELSE 0 END AS BIGINT) AS chi2_micro
        FROM flags GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q437
    QDef("q437_logsumexp_merge",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm("embedding").as("nrm"))
        e.cache(); e.count()
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("nrm").as("q_nrm"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), (col("vec_id") % 2).as("half"),
            VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm")
              .as("cos6"))
        val halves = scored.groupBy("q_id", "half")
          .agg(max("cos6").as("mh"))
        val zh = scored.join(halves, Seq("q_id", "half"))
          .selectExpr("q_id", "half", "mh",
            "CAST(floor(exp(cos6 - mh) * 1e6) AS BIGINT) AS term")
          .groupBy("q_id", "half")
          .agg(max("mh").as("mh"), sum("term").cast("bigint").as("zh"))
        val merged = zh.groupBy("q_id").agg(
          max("mh").as("m"),
          max(when(col("half") === 0, col("mh"))).as("m0"),
          max(when(col("half") === 1, col("mh"))).as("m1"),
          max(when(col("half") === 0, col("zh"))).as("z0"),
          max(when(col("half") === 1, col("zh"))).as("z1"))
          .selectExpr("q_id", "m",
            "CAST(floor(CAST(z0 AS DOUBLE) * exp(m0 - m)) AS BIGINT) + CAST(floor(CAST(z1 AS DOUBLE) * exp(m1 - m)) AS BIGINT) AS z_merged")
        val direct = scored
          .join(scored.groupBy("q_id").agg(max("cos6").as("m")), "q_id")
          .selectExpr("q_id",
            "CAST(floor(exp(cos6 - m) * 1e6) AS BIGINT) AS term")
          .groupBy("q_id").agg(sum("term").cast("bigint").as("z_direct"))
        merged.join(direct, "q_id")
          .selectExpr("q_id", "CAST(floor(m * 1e6) AS BIGINT) AS m6",
            "z_direct", "z_merged", "z_direct - z_merged AS drift",
            "CAST(floor((m + ln(CAST(z_direct AS DOUBLE) / 1e6)) * 1e6) AS BIGINT) AS lse6")
          .orderBy("q_id")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding,
                          ${VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm
              FROM e WHERE vec_id < 8),
        scored AS (
          SELECT q.q_id, e.vec_id % 2 AS half,
                 ${VectorOps.cosine6OutSql("q.q_vec", "e.embedding",
                   "q.q_nrm", "e.nrm")} AS cos6
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        halves AS (
          SELECT q_id, half, max(cos6) AS mh FROM scored GROUP BY 1, 2),
        zh AS (
          SELECT s.q_id, s.half, max(h.mh) AS mh,
                 sum(CAST(floor(exp(s.cos6 - h.mh) * 1e6) AS BIGINT)) AS zh
          FROM scored s JOIN halves h
            ON s.q_id = h.q_id AND s.half = h.half
          GROUP BY 1, 2),
        merged AS (
          SELECT q_id, max(mh) AS m,
                 CAST(floor(CAST(max(CASE WHEN half = 0 THEN zh END) AS DOUBLE)
                   * exp(max(CASE WHEN half = 0 THEN mh END) - max(mh)))
                   AS BIGINT)
                 + CAST(floor(CAST(max(CASE WHEN half = 1 THEN zh END) AS DOUBLE)
                   * exp(max(CASE WHEN half = 1 THEN mh END) - max(mh)))
                   AS BIGINT) AS z_merged
          FROM zh GROUP BY 1),
        mx AS (SELECT q_id, max(cos6) AS m FROM scored GROUP BY 1),
        direct AS (
          SELECT s.q_id,
                 sum(CAST(floor(exp(s.cos6 - mx.m) * 1e6) AS BIGINT))
                   AS z_direct
          FROM scored s JOIN mx ON s.q_id = mx.q_id
          GROUP BY 1)
        SELECT merged.q_id AS q_id,
               CAST(floor(merged.m * 1e6) AS BIGINT) AS m6,
               CAST(z_direct AS BIGINT) AS z_direct,
               CAST(z_merged AS BIGINT) AS z_merged,
               CAST(z_direct - z_merged AS BIGINT) AS drift,
               CAST(floor((merged.m + ln(CAST(z_direct AS DOUBLE) / 1e6))
                 * 1e6) AS BIGINT) AS lse6
        FROM merged JOIN direct ON merged.q_id = direct.q_id
        ORDER BY q_id""")),

    // --------------------------------------------------------------- q438
    QDef("q438_kcenter_greedy",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm("embedding").as("nrm"))
        e.cache(); e.count()
        def distTo(center: org.apache.spark.sql.DataFrame) =
          e.crossJoin(broadcast(center))
            .withColumn("cos6",
              VectorOps.cosine6Out("c_vec", "embedding", "c_nrm", "nrm"))
            .select(col("vec_id"), (lit(1000000L) -
              expr("CAST(floor(cos6 * 1e6 + 0.5) AS BIGINT)")).as("dist"))
        val c1 = e.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("nrm").as("c_nrm"))
        // localCheckpoint the reused frames (r11): DataFrame subtrees are
        // NOT deduplicated inside one job, so d1all/mins2 (each read by
        // the next pick AND the next min-union) and the 1-row c2/c3
        // center frames re-ran their embedding crossJoins up to 5x.
        val d1all = distTo(c1).localCheckpoint()
        val pick2 = d1all.join(c1.select(col("c_id")),
            col("vec_id") === col("c_id"), "left_anti")
          .orderBy(col("dist").desc, col("vec_id")).limit(1)
        val c2 = e.join(pick2.select(col("vec_id").as("p2"), col("dist")),
            col("vec_id") === col("p2"))
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("nrm").as("c_nrm"), col("dist").as("sel_dist"))
          .localCheckpoint()
        val mins2 = d1all.select(col("vec_id"), col("dist"))
          .union(distTo(c2.select(col("c_id"), col("c_vec"), col("c_nrm")))
            .select(col("vec_id"), col("dist")))
          .groupBy("vec_id").agg(min("dist").cast("long").as("mind"))
          .localCheckpoint()
        val pick3 = mins2
          .join(c1.select(col("c_id")).union(c2.select(col("c_id")))
            .withColumnRenamed("c_id", "x"),
            col("vec_id") === col("x"), "left_anti")
          .orderBy(col("mind").desc, col("vec_id")).limit(1)
        val c3 = e.join(pick3.select(col("vec_id").as("p3"),
            col("mind").as("sel_dist")), col("vec_id") === col("p3"))
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("nrm").as("c_nrm"), col("sel_dist"))
          .localCheckpoint()
        val mins3 = mins2.select(col("vec_id"), col("mind").as("dist"))
          .union(distTo(c3.select(col("c_id"), col("c_vec"), col("c_nrm")))
            .select(col("vec_id"), col("dist")))
          .groupBy("vec_id").agg(min("dist").cast("long").as("mind"))
        val radius = mins3.agg(max("mind").cast("long").as("radius"))
        val rows =
          c1.select(col("c_id"), lit(1L).as("step"), lit(0L).as("sel_dist"))
            .union(c2.select(col("c_id"), lit(2L).as("step"),
              col("sel_dist").cast("long")))
            .union(c3.select(col("c_id"), lit(3L).as("step"),
              col("sel_dist").cast("long")))
        rows.crossJoin(broadcast(radius))
          .select(col("step"), col("c_id"), col("sel_dist"), col("radius"))
          .orderBy("step")
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings),
        c1 AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
               FROM e ORDER BY vec_id LIMIT 1),
        d1 AS MATERIALIZED (
          SELECT e.vec_id,
                 1000000 - CAST(floor(${VectorOps.cosine6OutSql("c1.c_vec",
                   "e.embedding", "c1.c_nrm", "e.nrm")} * 1e6 + 0.5)
                   AS BIGINT) AS dist
          FROM e CROSS JOIN c1),
        p2 AS (SELECT vec_id, dist FROM d1
               WHERE vec_id NOT IN (SELECT c_id FROM c1)
               ORDER BY dist DESC, vec_id LIMIT 1),
        c2 AS (SELECT e.vec_id AS c_id, e.embedding AS c_vec, e.nrm AS c_nrm,
                      p2.dist AS sel_dist
               FROM e JOIN p2 ON e.vec_id = p2.vec_id),
        d2 AS MATERIALIZED (
          SELECT e.vec_id,
                 1000000 - CAST(floor(${VectorOps.cosine6OutSql("c2.c_vec",
                   "e.embedding", "c2.c_nrm", "e.nrm")} * 1e6 + 0.5)
                   AS BIGINT) AS dist
          FROM e CROSS JOIN c2),
        mins2 AS MATERIALIZED (
          SELECT vec_id, min(dist) AS mind FROM (
            SELECT vec_id, dist FROM d1
            UNION ALL SELECT vec_id, dist FROM d2) GROUP BY 1),
        p3 AS (SELECT vec_id, mind FROM mins2
               WHERE vec_id NOT IN (SELECT c_id FROM c1)
                 AND vec_id NOT IN (SELECT c_id FROM c2)
               ORDER BY mind DESC, vec_id LIMIT 1),
        c3 AS (SELECT e.vec_id AS c_id, e.embedding AS c_vec, e.nrm AS c_nrm,
                      p3.mind AS sel_dist
               FROM e JOIN p3 ON e.vec_id = p3.vec_id),
        d3 AS MATERIALIZED (
          SELECT e.vec_id,
                 1000000 - CAST(floor(${VectorOps.cosine6OutSql("c3.c_vec",
                   "e.embedding", "c3.c_nrm", "e.nrm")} * 1e6 + 0.5)
                   AS BIGINT) AS dist
          FROM e CROSS JOIN c3),
        mins3 AS (
          SELECT vec_id, min(d) AS mind FROM (
            SELECT vec_id, mind AS d FROM mins2
            UNION ALL SELECT vec_id, dist FROM d3) GROUP BY 1),
        radius AS (SELECT max(mind) AS radius FROM mins3)
        SELECT CAST(1 AS BIGINT) AS step, c_id, CAST(0 AS BIGINT) AS sel_dist,
               (SELECT CAST(radius AS BIGINT) FROM radius) AS radius
        FROM c1
        UNION ALL
        SELECT 2, c_id, CAST(sel_dist AS BIGINT),
               (SELECT CAST(radius AS BIGINT) FROM radius) FROM c2
        UNION ALL
        SELECT 3, c_id, CAST(sel_dist AS BIGINT),
               (SELECT CAST(radius AS BIGINT) FROM radius) FROM c3
        ORDER BY step"""))
  )
}
