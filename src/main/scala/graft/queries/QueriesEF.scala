package graft.queries

import graft.Tables.t
import graft.operators.ScaleRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 129 — robust distribution shape,
  * LLM-serving economics, Markov stability, scalability-law fitting:
  *
  *  - q530: sample L-moments of order totals (l1, l2, L-CV, L-skewness,
  *    L-kurtosis): global ranks come from ScaleRank's two-phase
  *    row_number (never a single-task window), the rank-polynomial
  *    sums Σ(i−1)(i−2)(i−3)·x run in DECIMAL(38)/HUGEINT (exact,
  *    order-independent — they overflow int64 by design), ratios from
  *    one literal double op order. The robust alternative to
  *    moment-based skew/kurtosis (Hosking 1990).
  *  - q531: KV-cache prefix-reuse audit: 12h-gap sessions per user,
  *    session event-type sequences, common-prefix length between
  *    consecutive sessions = first-mismatch position over a zipped
  *    boolean list (array_position/list_position; both engines return
  *    0-or-NULL for "no mismatch", handled by one shared CASE —
  *    DuckDB's list_reduce was tried first and mis-executes
  *    index-carrying folds, caught by the hash compare) — prefix hit
  *    ratio bp + mean prefix milli. The LLM-serving prompt-cache
  *    economics question asked of request logs.
  *  - q532: Markov transition stationarity: per from-state χ² between
  *    first-half and second-half next-state distributions (time split
  *    at the global midpoint), expected counts from pooled rows —
  *    doubles in one spelled-out order, bounded 5×5 domain. "Did the
  *    chain drift?" beside q75's matrix and q386's PSI.
  *  - q533: Universal Scalability Law fit X(N) = λN/(1+σ(N−1)+κN(N−1))
  *    over (hourly concurrency, mean throughput) points: 9×8×8
  *    deterministic grid, per-point squared errors floor-quantized to
  *    int64 BEFORE summing (exact, order-independent), struct-min
  *    argmin. Retrograde-scaling diagnosis for the harvest fleet.
  *
  * Scale shapes: q530 is ScaleRank + one aggregation; q531 windows are
  * per-user; q532/q533 aggregate to bounded domains (5×5 cells,
  * ≤150 concurrency levels) before any quadratic/grid work.
  */
object QueriesEF extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q530
    QDef("q530_l_moments",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS x",
            "o_orderkey AS ok")
        val ranked = ScaleRank.withGlobalRowNumber(o,
          Seq(col("x"), col("ok")), "rn")
        ranked.agg(
            count(lit(1)).as("n"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).as("s0d"),
            sum(expr("CAST(rn - 1 AS DECIMAL(38,0)) * x")).as("s1d"),
            sum(expr("CAST(rn - 1 AS DECIMAL(38,0)) * (rn - 2) * x")).as("s2d"),
            sum(expr("CAST(rn - 1 AS DECIMAL(38,0)) * (rn - 2) * (rn - 3) * x"))
              .as("s3d"))
          .where(expr("n > 3"))
          .selectExpr("n",
            "CAST(s0d AS DOUBLE) / n AS b0",
            "CAST(s1d AS DOUBLE) / n / (n - 1) AS b1",
            "CAST(s2d AS DOUBLE) / n / (n - 1) / (n - 2) AS b2",
            "CAST(s3d AS DOUBLE) / n / (n - 1) / (n - 2) / (n - 3) AS b3")
          .selectExpr("n", "b0 AS l1", "2 * b1 - b0 AS l2",
            "6 * b2 - 6 * b1 + b0 AS l3",
            "20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4")
          .where(expr("l2 > 0 AND l1 > 0"))
          .selectExpr("n",
            "CAST(floor(l1 * 1000) AS BIGINT) AS l1_milli",
            "CAST(floor(l2 * 1000) AS BIGINT) AS l2_milli",
            "CAST(floor(l2 / l1 * 1e6) AS BIGINT) AS t2_micro",
            "CAST(floor(l3 / l2 * 1e6) AS BIGINT) AS t3_micro",
            "CAST(floor(l4 / l2 * 1e6) AS BIGINT) AS t4_micro")
      },
      Some("""
        WITH o AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS x,
                 o_orderkey AS ok
          FROM orders WHERE o_totalprice IS NOT NULL),
        ranked AS (
          SELECT x, row_number() OVER (ORDER BY x, ok) AS rn FROM o),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(x AS HUGEINT)) AS s0d,
                 sum(CAST(rn - 1 AS HUGEINT) * x) AS s1d,
                 sum(CAST(rn - 1 AS HUGEINT) * (rn - 2) * x) AS s2d,
                 sum(CAST(rn - 1 AS HUGEINT) * (rn - 2) * (rn - 3) * x) AS s3d
          FROM ranked),
        b AS (
          SELECT n,
                 CAST(s0d AS DOUBLE) / n AS b0,
                 CAST(s1d AS DOUBLE) / n / (n - 1) AS b1,
                 CAST(s2d AS DOUBLE) / n / (n - 1) / (n - 2) AS b2,
                 CAST(s3d AS DOUBLE) / n / (n - 1) / (n - 2) / (n - 3) AS b3
          FROM c WHERE n > 3),
        l AS (
          SELECT n, b0 AS l1, 2 * b1 - b0 AS l2,
                 6 * b2 - 6 * b1 + b0 AS l3,
                 20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4
          FROM b)
        SELECT n,
               CAST(floor(l1 * 1000) AS BIGINT) AS l1_milli,
               CAST(floor(l2 * 1000) AS BIGINT) AS l2_milli,
               CAST(floor(l2 / l1 * 1e6) AS BIGINT) AS t2_micro,
               CAST(floor(l3 / l2 * 1e6) AS BIGINT) AS t3_micro,
               CAST(floor(l4 / l2 * 1e6) AS BIGINT) AS t4_micro
        FROM l WHERE l2 > 0 AND l1 > 0""")),

    // --------------------------------------------------------------- q531
    QDef("q531_prefix_cache",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id", "event_type")
        val wu = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val sess = ev
          .withColumn("gap", col("ms") - lag("ms", 1).over(wu))
          .withColumn("brk",
            when(col("gap").isNull || col("gap") > 43200000L, 1L).otherwise(0L))
          .withColumn("sid", sum("brk").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val seqs = sess.groupBy("user_id", "sid").agg(
          min("ms").as("t0"),
          expr("transform(sort_array(collect_list(struct(ms, event_id, event_type))), r -> r.event_type)")
            .as("seq"))
        val ws = Window.partitionBy("user_id").orderBy("t0", "sid")
        val pairs = seqs
          .withColumn("prev", lag("seq", 1).over(ws))
          .where(col("prev").isNotNull)
          .selectExpr("size(seq) AS cur_len",
            "least(size(seq), size(prev)) AS m",
            // first mismatch position (1-based; 0/NULL = no mismatch)
            """array_position(transform(sequence(1, least(size(seq), size(prev))),
                 k -> seq[k - 1] = prev[k - 1]), false) AS p""")
          .selectExpr("cur_len",
            "CAST(CASE WHEN coalesce(p, 0) = 0 THEN m ELSE p - 1 END AS BIGINT) AS cpl")
        pairs.agg(count(lit(1)).as("n_pairs"),
            sum("cur_len").cast("long").as("total_tokens"),
            sum("cpl").cast("long").as("total_prefix"))
          .where(expr("n_pairs > 0 AND total_tokens > 0"))
          .selectExpr("n_pairs", "total_tokens", "total_prefix",
            "total_prefix * 10000 DIV total_tokens AS hit_bp",
            "total_prefix * 1000 DIV n_pairs AS mean_prefix_milli")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          FROM events),
        g AS (
          SELECT user_id, ms, event_id, event_type,
                 CASE WHEN lag(ms) OVER w IS NULL
                        OR ms - lag(ms) OVER w > 43200000 THEN 1 ELSE 0
                 END AS brk
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        se AS (
          SELECT user_id, ms, event_id, event_type,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
        seqs AS (
          SELECT user_id, sid, min(ms) AS t0,
                 list(event_type ORDER BY ms, event_id) AS seq
          FROM se GROUP BY user_id, sid),
        pairs AS (
          SELECT cur_len,
                 CASE WHEN coalesce(p, 0) = 0 THEN m ELSE p - 1 END AS cpl
          FROM (
            SELECT len(seq) AS cur_len, least(len(seq), len(prev)) AS m,
                   list_position(list_transform(
                     range(1, least(len(seq), len(prev)) + 1),
                     k -> seq[k] = prev[k]), false) AS p
            FROM (
              SELECT seq, lag(seq) OVER (PARTITION BY user_id
                       ORDER BY t0, sid) AS prev
              FROM seqs)
            WHERE prev IS NOT NULL)),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(cur_len) AS BIGINT) AS total_tokens,
                 CAST(sum(cpl) AS BIGINT) AS total_prefix
          FROM pairs)
        SELECT n_pairs, total_tokens, total_prefix,
               total_prefix * 10000 // total_tokens AS hit_bp,
               total_prefix * 1000 // n_pairs AS mean_prefix_milli
        FROM c WHERE n_pairs > 0 AND total_tokens > 0""")),

    // --------------------------------------------------------------- q532
    QDef("q532_transition_stationarity",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id", "event_type")
        val mid = ev.agg(((min("ms") + max("ms")) / 2).cast("long").as("mid"))
        val wu = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val trans = ev
          .withColumn("nxt", lead("event_type", 1).over(wu))
          .withColumn("nms", lead("ms", 1).over(wu))
          .where(col("nxt").isNotNull)
          .crossJoin(broadcast(mid))
          .selectExpr("event_type AS src", "nxt AS dst",
            "CASE WHEN nms < mid THEN 1 ELSE 0 END AS h1")
        val cells = trans.groupBy("src", "dst").agg(
          sum("h1").cast("long").as("n1"),
          sum(expr("1 - h1")).cast("long").as("n2"))
        val rows = cells.groupBy("src").agg(
          sum("n1").cast("long").as("r1"), sum("n2").cast("long").as("r2"))
        cells.join(rows, "src")
          .where(expr("r1 > 0 AND r2 > 0"))
          .selectExpr("src", "n1", "n2",
            """(CAST(n1 AS DOUBLE) - CAST(r1 AS DOUBLE) * (n1 + n2) / (r1 + r2))
               * (CAST(n1 AS DOUBLE) - CAST(r1 AS DOUBLE) * (n1 + n2) / (r1 + r2))
               / (CAST(r1 AS DOUBLE) * (n1 + n2) / (r1 + r2)) AS c1""",
            """(CAST(n2 AS DOUBLE) - CAST(r2 AS DOUBLE) * (n1 + n2) / (r1 + r2))
               * (CAST(n2 AS DOUBLE) - CAST(r2 AS DOUBLE) * (n1 + n2) / (r1 + r2))
               / (CAST(r2 AS DOUBLE) * (n1 + n2) / (r1 + r2)) AS c2""")
          .groupBy("src").agg(
            sum("n1").cast("long").as("h1_trans"),
            sum("n2").cast("long").as("h2_trans"),
            count(lit(1)).as("n_dst"),
            sum(expr("CAST(floor((c1 + c2) * 1000) AS BIGINT)"))
              .cast("long").as("chi2_milli"))
          .selectExpr("src", "h1_trans", "h2_trans", "n_dst", "chi2_milli",
            // 95th percentile chi-square critical values ×1000 for
            // df = n_dst − 1 (bounded: 5 event types → df ≤ 4)
            """CAST(CASE WHEN chi2_milli > (CASE n_dst - 1
                 WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
                 WHEN 4 THEN 9488 ELSE 11070 END) THEN 1 ELSE 0 END
               AS BIGINT) AS drifted""")
          .orderBy("src")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          FROM events),
        mid AS (SELECT CAST((min(ms) + max(ms)) // 2 AS BIGINT) AS mid
                FROM ev),
        tr AS (
          SELECT event_type AS src,
                 lead(event_type) OVER w AS dst,
                 lead(ms) OVER w AS nms
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        trans AS (
          SELECT src, dst,
                 CASE WHEN nms < mid THEN 1 ELSE 0 END AS h1
          FROM tr, mid WHERE dst IS NOT NULL),
        cells AS (
          SELECT src, dst, CAST(sum(h1) AS BIGINT) AS n1,
                 CAST(sum(1 - h1) AS BIGINT) AS n2
          FROM trans GROUP BY 1, 2),
        rws AS (
          SELECT src, CAST(sum(n1) AS BIGINT) AS r1,
                 CAST(sum(n2) AS BIGINT) AS r2
          FROM cells GROUP BY 1),
        contrib AS (
          SELECT c.src, c.n1, c.n2,
                 (CAST(c.n1 AS DOUBLE) - CAST(r.r1 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2))
                 * (CAST(c.n1 AS DOUBLE) - CAST(r.r1 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2))
                 / (CAST(r.r1 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2)) AS c1,
                 (CAST(c.n2 AS DOUBLE) - CAST(r.r2 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2))
                 * (CAST(c.n2 AS DOUBLE) - CAST(r.r2 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2))
                 / (CAST(r.r2 AS DOUBLE) * (c.n1 + c.n2) / (r.r1 + r.r2)) AS c2
          FROM cells c JOIN rws r ON c.src = r.src
          WHERE r.r1 > 0 AND r.r2 > 0),
        agg AS (
          SELECT src, CAST(sum(n1) AS BIGINT) AS h1_trans,
                 CAST(sum(n2) AS BIGINT) AS h2_trans,
                 CAST(count(*) AS BIGINT) AS n_dst,
                 CAST(sum(CAST(floor((c1 + c2) * 1000) AS BIGINT)) AS BIGINT)
                   AS chi2_milli
          FROM contrib GROUP BY src)
        SELECT src, h1_trans, h2_trans, n_dst, chi2_milli,
               CAST(CASE WHEN chi2_milli > (CASE n_dst - 1
                 WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
                 WHEN 4 THEN 9488 ELSE 11070 END) THEN 1 ELSE 0 END
                 AS BIGINT) AS drifted
        FROM agg ORDER BY src""")),

    // --------------------------------------------------------------- q533
    QDef("q533_usl_fit",
      (s, dir) => {
        val hours = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 3600000 AS hour", "user_id")
          .groupBy("hour").agg(
            countDistinct("user_id").as("nconc"),
            count(lit(1)).as("x"))
        val pts = hours.groupBy("nconc").agg(
            sum("x").cast("long").as("sx"), count(lit(1)).as("cnt"))
          .selectExpr("nconc AS nc", "sx * 1000 DIV cnt AS x_milli")
        pts.cache(); pts.count()
        val base = pts.agg(max(expr("x_milli DIV nc")).cast("long").as("lmax"))
        val grid = s.range(0, 576)
          .selectExpr("id DIV 64 AS li", "(id % 64) DIV 8 AS si", "id % 8 AS ki")
          .crossJoin(broadcast(base))
          .selectExpr("lmax * (li + 4) DIV 8 AS lam", "si", "ki")
        pts.crossJoin(broadcast(grid))
          .withColumn("pred",
            expr("""CAST(lam AS DOUBLE) * nc
                    / (1 + CAST(si AS DOUBLE) / 32 * (nc - 1)
                       + CAST(ki AS DOUBLE) / 4096 * nc * (nc - 1))"""))
          .withColumn("e2",
            expr("CAST(floor((x_milli - pred) * (x_milli - pred) / 1e6) AS BIGINT)"))
          .groupBy("lam", "si", "ki").agg(sum("e2").cast("long").as("sse"))
          .agg(min(struct(col("sse"), col("lam"), col("si"), col("ki"))).as("st"))
          .selectExpr("st.lam AS lambda_milli", "st.si AS sigma_32",
            "st.ki AS kappa_4096", "st.sse AS sse",
            """CAST(CASE WHEN st.ki > 0 AND st.si > 0
                 THEN floor(sqrt((32.0 - st.si) / st.si * 4096 / st.ki / 32))
                 ELSE -1 END AS BIGINT) AS peak_n""")
      },
      Some("""
        WITH hours AS (
          SELECT epoch_ms(ts) // 3600000 AS hour,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS nconc,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        pts AS (
          SELECT nconc AS nc,
                 CAST(sum(x) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
                   AS x_milli
          FROM hours GROUP BY 1),
        base AS (SELECT CAST(max(x_milli // nc) AS BIGINT) AS lmax FROM pts),
        grid AS (
          SELECT lmax * (li + 4) // 8 AS lam, si, ki
          FROM base, generate_series(0, 8) t(li),
               generate_series(0, 7) u(si), generate_series(0, 7) v(ki)),
        scored AS (
          SELECT g.lam, g.si, g.ki,
                 CAST(sum(CAST(floor(
                   (p.x_milli - CAST(g.lam AS DOUBLE) * p.nc
                     / (1 + CAST(g.si AS DOUBLE) / 32 * (p.nc - 1)
                        + CAST(g.ki AS DOUBLE) / 4096 * p.nc * (p.nc - 1)))
                   * (p.x_milli - CAST(g.lam AS DOUBLE) * p.nc
                     / (1 + CAST(g.si AS DOUBLE) / 32 * (p.nc - 1)
                        + CAST(g.ki AS DOUBLE) / 4096 * p.nc * (p.nc - 1)))
                   / 1e6) AS BIGINT)) AS BIGINT) AS sse
          FROM pts p CROSS JOIN grid g
          GROUP BY 1, 2, 3),
        best AS (SELECT * FROM scored ORDER BY sse, lam, si, ki LIMIT 1)
        SELECT lam AS lambda_milli, si AS sigma_32, ki AS kappa_4096, sse,
               CAST(CASE WHEN ki > 0 AND si > 0
                 THEN floor(sqrt((32.0 - si) / si * 4096 / ki / 32))
                 ELSE -1 END AS BIGINT) AS peak_n
        FROM best"""))
  )
}
