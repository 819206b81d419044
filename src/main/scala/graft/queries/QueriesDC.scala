package graft.queries

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 100 — online selection, cooperative
  * attribution, aggregation-reversal audit, graph diameter:
  *
  *  - q423: secretary-rule (37%) online-selection replay — per
  *    (segment, week) arrival sequence of order values, observe the
  *    first ⌊0.37n⌋ arrivals, hire the first later arrival beating the
  *    observed max (else the last). Success-vs-true-max rate per
  *    segment in bp, plus mean stopping position (milli). Pure window
  *    arithmetic: one rank pass + conditional aggregates, no recurrence
  *    — the e-competitive online policy evaluated offline at any scale.
  *  - q424: exact 3-player Shapley attribution — channels
  *    {view, click, signup} as pre-purchase touches within 72 h of a
  *    user's FIRST purchase; coalition values v(S) = covered converted
  *    users, Shapley marginals in ×6 integer grain (3! orderings), so
  *    Σφ₆ = 6·v(grand) exactly. The game-theoretic upgrade of q351's
  *    first/last/linear heuristics: one flags pass, one 8-pattern
  *    aggregate, closed-form marginals.
  *  - q425: Simpson's-paradox detector — per brand, the SIGN of the
  *    discount→quantity association from the exact integer covariance
  *    n·Σxy − Σx·Σy, aggregate vs per-size-stratum; paradox when the
  *    aggregate sign opposes the stratum majority. The classic
  *    aggregation-reversal audit (pairs with q239/q419: this is the
  *    warning that pooled slopes can lie).
  *  - q426: double-sweep diameter lower bound — hop-bounded BFS (4
  *    rounds) from the max-degree hub of the co-purchase graph, pick
  *    the farthest reached node (deterministic tiebreak), BFS again
  *    from it; report per-phase source, eccentricity and reach. Each
  *    round is one join + one anti-join (frontier × adjacency), the
  *    standard Pregel diameter probe.
  *
  * Reference analog: accept/reject scraping under a submission deadline,
  * which discovery surface earns the booking, price-elasticity audits
  * per area, co-visibility graph span.
  */
object QueriesDC extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q423
    QDef("q423_secretary",
      (s, dir) => {
        val arr = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("c_mktsegment",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS epoch_millis",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000 AS wk",
            "o_orderkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v")
        val wG = Window.partitionBy("c_mktsegment", "wk")
        val wR = wG.orderBy(col("epoch_millis"), col("o_orderkey"))
        val ranked = arr
          .withColumn("rn", row_number().over(wR).cast("long"))
          .withColumn("n", count(lit(1)).over(wG).cast("long"))
          .withColumn("r", expr("(n * 37) DIV 100"))
          .withColumn("vmax", max("v").over(wG))
        val obs = ranked.where(col("rn") <= col("r"))
          .groupBy("c_mktsegment", "wk")
          .agg(max("v").as("obsmax"))
        val pick = ranked.join(obs, Seq("c_mktsegment", "wk"), "left")
          .withColumn("cand",
            col("rn") > col("r") &&
              (col("obsmax").isNull || col("v") > col("obsmax")))
          .withColumn("pickrn", min(when(col("cand"), col("rn"))).over(wG))
          .withColumn("effrn", coalesce(col("pickrn"), col("n")))
          .where(col("rn") === col("effrn"))
          .select(col("c_mktsegment"), col("wk"), col("n"),
            (col("v") === col("vmax")).as("hit"), col("effrn"))
        pick.groupBy("c_mktsegment").agg(
          count(lit(1)).cast("long").as("trials"),
          sum(when(col("hit"), 1L).otherwise(0L)).cast("long").as("wins"),
          sum("effrn").cast("bigint").as("sum_pos"),
          sum("n").cast("bigint").as("sum_n"))
          .selectExpr("c_mktsegment", "trials", "wins",
            "wins * 10000 DIV trials AS win_bp",
            "sum_pos * 1000 DIV sum_n AS mean_pos_milli")
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH arr AS (
          SELECT c_mktsegment, epoch_ms(o_orderdate) AS ems,
                 epoch_ms(o_orderdate) // 604800000 AS wk, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey),
        rk AS (
          SELECT c_mktsegment, wk, o_orderkey, v,
                 row_number() OVER (PARTITION BY c_mktsegment, wk
                                    ORDER BY ems, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY c_mktsegment, wk) AS n,
                 max(v) OVER (PARTITION BY c_mktsegment, wk) AS vmax
          FROM arr),
        rk2 AS (SELECT *, (n * 37) // 100 AS r FROM rk),
        obs AS (
          SELECT c_mktsegment, wk, max(v) AS obsmax
          FROM rk2 WHERE rn <= r GROUP BY 1, 2),
        cand AS (
          SELECT rk2.*, obs.obsmax,
                 (rn > r AND (obsmax IS NULL OR v > obsmax)) AS c
          FROM rk2 LEFT JOIN obs USING (c_mktsegment, wk)),
        pickrn AS (
          SELECT c_mktsegment, wk,
                 coalesce(min(CASE WHEN c THEN rn END), max(n)) AS effrn
          FROM cand GROUP BY 1, 2),
        picked AS (
          SELECT cand.c_mktsegment, cand.wk, cand.n,
                 (cand.v = cand.vmax) AS hit, pickrn.effrn
          FROM cand JOIN pickrn
            ON cand.c_mktsegment = pickrn.c_mktsegment
           AND cand.wk = pickrn.wk AND cand.rn = pickrn.effrn)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS trials,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS wins,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) * 10000 // count(*)
                 AS BIGINT) AS win_bp,
               CAST(sum(effrn) * 1000 // sum(n) AS BIGINT) AS mean_pos_milli
        FROM picked GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q424
    QDef("q424_shapley3",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"$tsMs AS ms")
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ms").as("tp"))
        val flags = ev.join(fp, "user_id")
          .where(col("ms") < col("tp") &&
            col("ms") >= col("tp") - lit(259200000L))
          .groupBy("user_id").agg(
            max(when(col("event_type") === "view", 1L).otherwise(0L)).as("ta"),
            max(when(col("event_type") === "click", 1L).otherwise(0L)).as("tb"),
            max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("tc"))
        val v = flags.agg(
          sum(when(col("ta") === 1, 1L).otherwise(0L)).cast("bigint").as("va"),
          sum(when(col("tb") === 1, 1L).otherwise(0L)).cast("bigint").as("vb"),
          sum(when(col("tc") === 1, 1L).otherwise(0L)).cast("bigint").as("vc"),
          sum(when(col("ta") === 1 || col("tb") === 1, 1L).otherwise(0L))
            .cast("bigint").as("vab"),
          sum(when(col("ta") === 1 || col("tc") === 1, 1L).otherwise(0L))
            .cast("bigint").as("vac"),
          sum(when(col("tb") === 1 || col("tc") === 1, 1L).otherwise(0L))
            .cast("bigint").as("vbc"),
          sum(when(col("ta") === 1 || col("tb") === 1 || col("tc") === 1, 1L)
            .otherwise(0L)).cast("bigint").as("vabc"))
        val a = v.selectExpr("'view' AS channel",
          "2*va + (vab - vb) + (vac - vc) + 2*(vabc - vbc) AS phi6",
          "va AS v_single", "vabc AS v_grand")
        val b = v.selectExpr("'click' AS channel",
          "2*vb + (vab - va) + (vbc - vc) + 2*(vabc - vac) AS phi6",
          "vb AS v_single", "vabc AS v_grand")
        val c = v.selectExpr("'signup' AS channel",
          "2*vc + (vac - va) + (vbc - vb) + 2*(vabc - vab) AS phi6",
          "vc AS v_single", "vabc AS v_grand")
        a.union(b).union(c).orderBy("channel")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        fp AS (SELECT user_id, min(ms) AS tp FROM ev
               WHERE event_type = 'purchase' GROUP BY 1),
        flags AS (
          SELECT ev.user_id,
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ta,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS tb,
                 max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS tc
          FROM ev JOIN fp ON ev.user_id = fp.user_id
          WHERE ms < tp AND ms >= tp - 259200000
          GROUP BY 1),
        v AS (
          SELECT sum(CASE WHEN ta = 1 THEN 1 ELSE 0 END) AS va,
                 sum(CASE WHEN tb = 1 THEN 1 ELSE 0 END) AS vb,
                 sum(CASE WHEN tc = 1 THEN 1 ELSE 0 END) AS vc,
                 sum(CASE WHEN ta = 1 OR tb = 1 THEN 1 ELSE 0 END) AS vab,
                 sum(CASE WHEN ta = 1 OR tc = 1 THEN 1 ELSE 0 END) AS vac,
                 sum(CASE WHEN tb = 1 OR tc = 1 THEN 1 ELSE 0 END) AS vbc,
                 sum(CASE WHEN ta = 1 OR tb = 1 OR tc = 1 THEN 1 ELSE 0 END)
                   AS vabc
          FROM flags)
        SELECT 'view' AS channel,
               CAST(2*va + (vab - vb) + (vac - vc) + 2*(vabc - vbc) AS BIGINT)
                 AS phi6,
               CAST(va AS BIGINT) AS v_single, CAST(vabc AS BIGINT) AS v_grand
        FROM v
        UNION ALL
        SELECT 'click',
               CAST(2*vb + (vab - va) + (vbc - vc) + 2*(vabc - vac) AS BIGINT),
               CAST(vb AS BIGINT), CAST(vabc AS BIGINT) FROM v
        UNION ALL
        SELECT 'signup',
               CAST(2*vc + (vac - va) + (vbc - vb) + 2*(vabc - vab) AS BIGINT),
               CAST(vc AS BIGINT), CAST(vabc AS BIGINT) FROM v
        ORDER BY channel""")),

    // --------------------------------------------------------------- q425
    QDef("q425_simpson_paradox",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr("p_brand", "p_size DIV 10 AS stratum",
            "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x",
            "CAST(l_quantity AS BIGINT) AS y")
        val strat = li.groupBy("p_brand", "stratum").agg(
          count(lit(1)).cast("long").as("n"),
          sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
          sum(col("x") * col("y")).cast("bigint").as("sxy"))
          .selectExpr("p_brand", "stratum", "n",
            "sign(n * sxy - sx * sy) AS sg")
        val aggr = li.groupBy("p_brand").agg(
          count(lit(1)).cast("long").as("n"),
          sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
          sum(col("x") * col("y")).cast("bigint").as("sxy"))
          .selectExpr("p_brand", "n",
            "CAST(sign(n * sxy - sx * sy) AS BIGINT) AS s_agg")
        val cnt = strat.groupBy("p_brand").agg(
          sum(when(col("sg") > 0, 1L).otherwise(0L)).cast("long").as("strata_pos"),
          sum(when(col("sg") < 0, 1L).otherwise(0L)).cast("long").as("strata_neg"),
          count(lit(1)).cast("long").as("strata"))
        aggr.join(cnt, "p_brand")
          .withColumn("paradox",
            (col("s_agg") > 0 && col("strata_neg") > col("strata_pos")) ||
              (col("s_agg") < 0 && col("strata_pos") > col("strata_neg")))
          .select("p_brand", "n", "s_agg", "strata", "strata_pos",
            "strata_neg", "paradox")
          .orderBy("p_brand")
      },
      Some("""
        WITH li AS (
          SELECT p_brand, p_size // 10 AS stratum,
                 CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x,
                 CAST(l_quantity AS BIGINT) AS y
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        strat AS (
          SELECT p_brand, stratum,
                 sign(count(*) * sum(x * y) - sum(x) * sum(y)) AS sg
          FROM li GROUP BY 1, 2),
        aggr AS (
          SELECT p_brand, count(*) AS n,
                 CAST(sign(count(*) * sum(x * y) - sum(x) * sum(y)) AS BIGINT)
                   AS s_agg
          FROM li GROUP BY 1),
        cnt AS (
          SELECT p_brand,
                 sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS strata_pos,
                 sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS strata_neg,
                 count(*) AS strata
          FROM strat GROUP BY 1)
        SELECT aggr.p_brand, CAST(n AS BIGINT) AS n, s_agg,
               CAST(strata AS BIGINT) AS strata,
               CAST(strata_pos AS BIGINT) AS strata_pos,
               CAST(strata_neg AS BIGINT) AS strata_neg,
               ((s_agg > 0 AND strata_neg > strata_pos)
                OR (s_agg < 0 AND strata_pos > strata_neg)) AS paradox
        FROM aggr JOIN cnt ON aggr.p_brand = cnt.p_brand
        ORDER BY 1""")),

    // --------------------------------------------------------------- q426
    QDef("q426_double_sweep",
      (s, dir) => {
        // basket-array pair build (q140/q390 pattern): one collect_set
        // shuffle, pairs map-side from the ≤7-part sorted basket
        val e = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
            .as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2).select("a", "b")
        graft.operators.GraphCensus.doubleSweep(e, "a", "b", hops = 4)
          .orderBy("phase")
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e AS MATERIALIZED (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        hub AS MATERIALIZED (
          SELECT u AS node FROM (SELECT u, count(*) AS deg FROM adj GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 1),
        p1h1 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN hub ON adj.u = hub.node
                 WHERE adj.v NOT IN (SELECT node FROM hub)),
        p1v1 AS MATERIALIZED (SELECT node FROM hub UNION SELECT v FROM p1h1),
        p1h2 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p1h1 ON adj.u = p1h1.v
                 WHERE adj.v NOT IN (SELECT node FROM p1v1)),
        p1v2 AS MATERIALIZED (SELECT node FROM p1v1 UNION SELECT v FROM p1h2),
        p1h3 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p1h2 ON adj.u = p1h2.v
                 WHERE adj.v NOT IN (SELECT node FROM p1v2)),
        p1v3 AS MATERIALIZED (SELECT node FROM p1v2 UNION SELECT v FROM p1h3),
        p1h4 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p1h3 ON adj.u = p1h3.v
                 WHERE adj.v NOT IN (SELECT node FROM p1v3)),
        p1v4 AS MATERIALIZED (SELECT node FROM p1v3 UNION SELECT v FROM p1h4),
        p1d AS (
          SELECT node, 0 AS hop FROM hub
          UNION ALL SELECT v, 1 FROM p1h1
          UNION ALL SELECT v, 2 FROM p1h2
          UNION ALL SELECT v, 3 FROM p1h3
          UNION ALL SELECT v, 4 FROM p1h4),
        far AS MATERIALIZED (SELECT node FROM p1d ORDER BY hop DESC, node LIMIT 1),
        p2h1 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN far ON adj.u = far.node
                 WHERE adj.v NOT IN (SELECT node FROM far)),
        p2v1 AS MATERIALIZED (SELECT node FROM far UNION SELECT v FROM p2h1),
        p2h2 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p2h1 ON adj.u = p2h1.v
                 WHERE adj.v NOT IN (SELECT node FROM p2v1)),
        p2v2 AS MATERIALIZED (SELECT node FROM p2v1 UNION SELECT v FROM p2h2),
        p2h3 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p2h2 ON adj.u = p2h2.v
                 WHERE adj.v NOT IN (SELECT node FROM p2v2)),
        p2v3 AS MATERIALIZED (SELECT node FROM p2v2 UNION SELECT v FROM p2h3),
        p2h4 AS MATERIALIZED (SELECT DISTINCT adj.v FROM adj JOIN p2h3 ON adj.u = p2h3.v
                 WHERE adj.v NOT IN (SELECT node FROM p2v3)),
        p2v4 AS MATERIALIZED (SELECT node FROM p2v3 UNION SELECT v FROM p2h4),
        p2d AS (
          SELECT node, 0 AS hop FROM far
          UNION ALL SELECT v, 1 FROM p2h1
          UNION ALL SELECT v, 2 FROM p2h2
          UNION ALL SELECT v, 3 FROM p2h3
          UNION ALL SELECT v, 4 FROM p2h4)
        SELECT CAST(1 AS BIGINT) AS phase,
               (SELECT node FROM hub) AS src,
               (SELECT CAST(max(hop) AS BIGINT) FROM p1d) AS ecc,
               (SELECT count(*) FROM p1d) AS reached
        UNION ALL
        SELECT 2, (SELECT node FROM far),
               (SELECT CAST(max(hop) AS BIGINT) FROM p2d),
               (SELECT count(*) FROM p2d)
        ORDER BY phase"""))
  )
}
