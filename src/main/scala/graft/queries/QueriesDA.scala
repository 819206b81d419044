package graft.queries

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 98 — multiresolution signals, tail
  * exponents, chain mixing, extreme-value capacity planning:
  *
  *  - q415: unnormalized Haar wavelet decomposition of each type's
  *    32-day daily-count series (zero-padded, globally aligned): five
  *    levels of pairwise sum/difference, per-level detail energy
  *    Σd² in exact BIGINT; lvl 0 row carries the final approximation
  *    coefficient (= series total, conservation visible in-output).
  *    Each level is ONE groupBy on (type, j DIV 2) — log2(n) bounded
  *    shuffles at any scale. The multiresolution twin of q306's DFT.
  *  - q416: Hill tail-index estimator per market segment over customer
  *    revenue: top k+1 = 11 order statistics, per-term
  *    floor-micro(ln(x_i/x_{k+1})) (BIGINT cents → exact doubles, one
  *    division + one ln per term, order-independent after quantization),
  *    α_micro = k·10¹² DIV Σ. Pairs with q181's Zipf slope and q173's
  *    Pareto share: light tail ⇒ large α.
  *  - q417: Markov-chain mixing — q75's transition matrix row-normalized
  *    to integer micro, then three matrix–vector power steps from the
  *    uniform start, all in BIGINT (v·p DIV 10⁶ per step). Shows the
  *    event-type chain's approach to its stationary mix; 5×5 matrix so
  *    each step is a tiny broadcast join at any data scale.
  *  - q418: Gumbel block-maxima return levels — per type, daily maxima
  *    of hourly counts (30 blocks), method-of-moments fit
  *    β = s·√6/π, μ = m̄ − γβ, 30-block return level
  *    x₃₀ = μ + 3.384294·β with all irrational constants inlined as
  *    shared 6-dp literals (sqrt on exact integer variance is correctly
  *    rounded IEEE — no libm divergence), floor-micro outputs; plus the
  *    observed count of blocks exceeding x₃₀ (≈1 by construction).
  *
  * Reference analog: harvest-volume multiscale structure, listing-revenue
  * tail heaviness, scrape-surface mixing behaviour, peak-hour capacity
  * planning for worker fleets.
  */
object QueriesDA extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q415
    QDef("q415_haar_energy",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
        val minD = ev.agg(min("d").as("d0"))
        val daily = ev.crossJoin(broadcast(minD))
          .selectExpr("event_type", "d - d0 AS i")
          .where(col("i") >= 0 && col("i") < 32)
          .groupBy("event_type", "i").agg(count(lit(1)).as("c"))
        val domain = ev.select("event_type").distinct()
          .select(col("event_type"),
            explode(sequence(lit(0L), lit(31L))).as("i"))
        var cur = domain.join(daily, Seq("event_type", "i"), "left")
          .select(col("event_type"), col("i").as("j"),
            coalesce(col("c"), lit(0L)).cast("long").as("v"))
        var out: Seq[DataFrame] = Nil
        for (lvl <- 1 to 5) {
          val pair = cur.groupBy(col("event_type"),
              expr("j DIV 2").as("j2"))
            .agg(sum(when(col("j") % 2 === 0, col("v")).otherwise(0L))
              .cast("long").as("e"),
              sum(when(col("j") % 2 === 1, col("v")).otherwise(0L))
                .cast("long").as("o"))
          out = out :+ pair.groupBy("event_type")
            .agg(sum((col("e") - col("o")) * (col("e") - col("o")))
              .cast("long").as("energy"))
            .select(col("event_type"), lit(lvl.toLong).as("lvl"),
              col("energy"))
          cur = pair.select(col("event_type"), col("j2").as("j"),
            (col("e") + col("o")).cast("long").as("v"))
        }
        val approx = cur.select(col("event_type"), lit(0L).as("lvl"),
          col("v").as("energy"))
        out.reduce(_ union _).union(approx)
          .orderBy("event_type", "lvl")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d FROM events),
        daily AS (
          SELECT event_type, d - (SELECT min(d) FROM ev) AS i, count(*) AS c
          FROM ev GROUP BY 1, 2),
        dom AS (
          SELECT event_type, g.i
          FROM (SELECT DISTINCT event_type FROM ev), generate_series(0, 31) g(i)),
        l0 AS (
          SELECT dom.event_type, CAST(dom.i AS BIGINT) AS j,
                 CAST(coalesce(daily.c, 0) AS BIGINT) AS v
          FROM dom LEFT JOIN daily
            ON dom.event_type = daily.event_type AND dom.i = daily.i),
        p1 AS (SELECT event_type, j // 2 AS j,
                 sum(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS e,
                 sum(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS o
               FROM l0 GROUP BY 1, 2),
        l1 AS (SELECT event_type, j, e + o AS v FROM p1),
        p2 AS (SELECT event_type, j // 2 AS j,
                 sum(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS e,
                 sum(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS o
               FROM l1 GROUP BY 1, 2),
        l2 AS (SELECT event_type, j, e + o AS v FROM p2),
        p3 AS (SELECT event_type, j // 2 AS j,
                 sum(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS e,
                 sum(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS o
               FROM l2 GROUP BY 1, 2),
        l3 AS (SELECT event_type, j, e + o AS v FROM p3),
        p4 AS (SELECT event_type, j // 2 AS j,
                 sum(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS e,
                 sum(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS o
               FROM l3 GROUP BY 1, 2),
        l4 AS (SELECT event_type, j, e + o AS v FROM p4),
        p5 AS (SELECT event_type, j // 2 AS j,
                 sum(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS e,
                 sum(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS o
               FROM l4 GROUP BY 1, 2),
        l5 AS (SELECT event_type, j, e + o AS v FROM p5)
        SELECT event_type, CAST(1 AS BIGINT) AS lvl,
               CAST(sum((e - o) * (e - o)) AS BIGINT) AS energy
        FROM p1 GROUP BY 1
        UNION ALL SELECT event_type, 2, CAST(sum((e-o)*(e-o)) AS BIGINT)
        FROM p2 GROUP BY 1
        UNION ALL SELECT event_type, 3, CAST(sum((e-o)*(e-o)) AS BIGINT)
        FROM p3 GROUP BY 1
        UNION ALL SELECT event_type, 4, CAST(sum((e-o)*(e-o)) AS BIGINT)
        FROM p4 GROUP BY 1
        UNION ALL SELECT event_type, 5, CAST(sum((e-o)*(e-o)) AS BIGINT)
        FROM p5 GROUP BY 1
        UNION ALL SELECT event_type, 0, CAST(v AS BIGINT) FROM l5
        ORDER BY event_type, lvl""")),

    // --------------------------------------------------------------- q416
    QDef("q416_hill_tail",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").selectExpr("l_orderkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey").agg(sum("cents").cast("bigint").as("rev"))
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("rev").desc, col("o_custkey"))
        val top = rev.withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 11)
        val xk = top.where(col("rn") === 11)
          .select(col("c_mktsegment"), col("rev").as("xk"))
        top.where(col("rn") <= 10).join(xk, "c_mktsegment")
          .selectExpr("c_mktsegment",
            "CAST(floor(ln(CAST(rev AS DOUBLE) / CAST(xk AS DOUBLE)) * 1e6) AS BIGINT) AS term")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).cast("long").as("k"),
            sum("term").cast("bigint").as("sum_log_micro"))
          .selectExpr("c_mktsegment", "k", "sum_log_micro",
            "CASE WHEN sum_log_micro > 0 THEN k * 1000000000000 DIV sum_log_micro ELSE -1 END AS alpha_micro")
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1),
        seg AS (
          SELECT c_mktsegment, o_custkey, rev,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY rev DESC, o_custkey) AS rn
          FROM rev JOIN customer ON o_custkey = c_custkey),
        xk AS (SELECT c_mktsegment, rev AS xk FROM seg WHERE rn = 11),
        terms AS (
          SELECT seg.c_mktsegment,
                 CAST(floor(ln(CAST(rev AS DOUBLE) / CAST(xk AS DOUBLE)) * 1e6)
                   AS BIGINT) AS term
          FROM seg JOIN xk ON seg.c_mktsegment = xk.c_mktsegment
          WHERE rn <= 10)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS k,
               CAST(sum(term) AS BIGINT) AS sum_log_micro,
               CAST(CASE WHEN sum(term) > 0
                 THEN count(*) * 1000000000000 // sum(term)
                 ELSE -1 END AS BIGINT) AS alpha_micro
        FROM terms GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q417
    QDef("q417_markov_power",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id", "event_type")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ms"), col("event_id"))
        val trans = ev.withColumn("nxt", lead("event_type", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("f"), col("nxt").as("tt"))
          .agg(count(lit(1)).as("c"))
        val p = trans
          .withColumn("rs", sum("c").over(Window.partitionBy("f")))
          .selectExpr("f", "tt", "c * 1000000 DIV rs AS pr")
        val states = p.select(col("f").as("st")).distinct()
        val nSt = broadcast(states.agg(count(lit(1)).as("ns")))
        var v = states.crossJoin(nSt)
          .selectExpr("st", "1000000 DIV ns AS m")
        val hist = new scala.collection.mutable.ArrayBuffer[DataFrame]
        for (step <- 1 to 3) {
          v = v.as("v").join(p.as("pp"), col("v.st") === col("pp.f"))
            .groupBy(col("pp.tt").as("stN"))
            .agg(sum(col("v.m") * col("pp.pr")).cast("bigint").as("num"))
            .selectExpr("stN AS st", "num DIV 1000000 AS m")
          hist += v.select(col("st"), lit(step.toLong).as("step"),
            col("m").cast("long").as("mass_micro"))
        }
        hist.reduce(_ union _).orderBy("step", "st")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          FROM events),
        tr AS (
          SELECT event_type AS f,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ms, event_id) AS tt
          FROM ev),
        c AS (SELECT f, tt, count(*) AS c FROM tr WHERE tt IS NOT NULL
              GROUP BY 1, 2),
        p AS (SELECT f, tt, c * 1000000 // sum(c) OVER (PARTITION BY f) AS p
              FROM c),
        v0 AS (
          SELECT f AS st,
                 1000000 // (SELECT count(DISTINCT f) FROM p) AS m
          FROM (SELECT DISTINCT f FROM p)),
        v1 AS (SELECT tt AS st, sum(m * p) // 1000000 AS m
               FROM v0 JOIN p ON v0.st = p.f GROUP BY 1),
        v2 AS (SELECT tt AS st, sum(m * p) // 1000000 AS m
               FROM v1 JOIN p ON v1.st = p.f GROUP BY 1),
        v3 AS (SELECT tt AS st, sum(m * p) // 1000000 AS m
               FROM v2 JOIN p ON v2.st = p.f GROUP BY 1)
        SELECT st, CAST(1 AS BIGINT) AS step, CAST(m AS BIGINT) AS mass_micro
        FROM v1
        UNION ALL SELECT st, 2, CAST(m AS BIGINT) FROM v2
        UNION ALL SELECT st, 3, CAST(m AS BIGINT) FROM v3
        ORDER BY step, st""")),

    // --------------------------------------------------------------- q418
    QDef("q418_gumbel_return",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d",
            s"(($tsMs) DIV 3600000) % 24 AS h")
          .groupBy("event_type", "d", "h").agg(count(lit(1)).as("c"))
        val blocks = hourly.groupBy("event_type", "d")
          .agg(max("c").cast("long").as("m"))
        blocks.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n"),
          max("m").cast("long").as("max_obs"),
          sum("m").cast("bigint").as("s1"),
          sum(col("m") * col("m")).cast("bigint").as("s2"),
          collect_list("m").as("ms"))
          .selectExpr("event_type", "n", "max_obs", "s1", "s2",
            "sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE) AS sd",
            "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean", "ms")
          .selectExpr("event_type", "n", "max_obs", "ms",
            "sd * 0.779697 AS beta", "mean")
          .selectExpr("event_type", "n", "max_obs", "ms", "beta",
            "mean - 0.577216 * beta AS mu")
          .selectExpr("event_type", "n", "max_obs", "ms", "beta", "mu",
            "mu + 3.384294 * beta AS rl30")
          .selectExpr("event_type", "n", "max_obs",
            "CAST(floor(beta * 1e6) AS BIGINT) AS beta_micro",
            "CAST(floor(mu * 1e6) AS BIGINT) AS mu_micro",
            "CAST(floor(rl30 * 1e6) AS BIGINT) AS rl30_micro",
            "size(filter(ms, x -> CAST(x AS DOUBLE) > rl30)) AS exceed_cnt")
          .selectExpr("event_type", "n", "max_obs", "beta_micro",
            "mu_micro", "rl30_micro", "CAST(exceed_cnt AS BIGINT) AS exceed_cnt")
          .orderBy("event_type")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 (epoch_ms(ts) // 3600000) % 24 AS h, count(*) AS c
          FROM events GROUP BY 1, 2, 3),
        blocks AS (
          SELECT event_type, d, CAST(max(c) AS BIGINT) AS m
          FROM hourly GROUP BY 1, 2),
        agg AS (
          SELECT event_type, count(*) AS n, max(m) AS max_obs,
                 sum(m) AS s1, sum(m * m) AS s2, list(m) AS ms
          FROM blocks GROUP BY 1),
        f1 AS (
          SELECT event_type, n, max_obs, ms,
                 (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE))
                   * 0.779697 AS beta,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean
          FROM agg),
        f2 AS (SELECT event_type, n, max_obs, ms, beta,
                      mean - 0.577216 * beta AS mu FROM f1),
        f3 AS (SELECT event_type, n, max_obs, ms, beta, mu,
                      mu + 3.384294 * beta AS rl30 FROM f2)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(max_obs AS BIGINT) AS max_obs,
               CAST(floor(beta * 1e6) AS BIGINT) AS beta_micro,
               CAST(floor(mu * 1e6) AS BIGINT) AS mu_micro,
               CAST(floor(rl30 * 1e6) AS BIGINT) AS rl30_micro,
               CAST(len(list_filter(ms, x -> CAST(x AS DOUBLE) > rl30))
                 AS BIGINT) AS exceed_cnt
        FROM f3 ORDER BY event_type"""))
  )
}
