package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 113 — temporal graphs, leaderboard
  * counterfactuals, linkage attacks, group-sequential designs:
  *
  *  - q471: time-respecting 2-hop reachability — co-activity edges
  *    (users in the same (type, hour) cell), paths a→b→c valid only
  *    when the second hop's hour is LATER (within 24 h): temporal reach
  *    from the top-20 hub users vs the static 2-hop reach that ignores
  *    time. Temporal ≤ static row-by-row is the built-in correctness
  *    signal; hub-restricted sources and the hour band keep every join
  *    edge-bounded.
  *  - q472: leave-one-out leaderboard stability — per nation, revenue
  *    leader removed and the board re-read: runner-up's share of the
  *    remaining pot, and the leader's margin; the counterfactual
  *    robustness check for q209/q275-style reports.
  *  - q473: linkage-attack simulation — split each user's history in
  *    half; the attacker re-identifies second-half behavioural
  *    fingerprints (event-type mix) against first-half profiles by
  *    minimum L1 distance WITHIN (dominant-type, activity-band)
  *    blocks: success rate vs the random-guess floor implied by block
  *    sizes. Quantifies what q462's k-anonymity abstractly bounds —
  *    measured here, the fingerprints DRIFT between halves (dominant
  *    type is a noisy statistic), so the attack underperforms even the
  *    within-block chance floor: the audit's (reassuring) finding.
  *  - q474: group-sequential O'Brien–Fleming monitoring — treatment
  *    (odd users) vs control purchase conversion tested at the 33%,
  *    66% and 100% timeline looks: z² in fixed-order DOUBLE floor-micro
  *    against inlined OBF boundary squares (12.048/6.022/4.016 ·1e6);
  *    first-crossing look = the decision. The interim-analysis design
  *    beside q339's SPRT (per-event) and q133's fixed-horizon test.
  *
  * Reference analog: influence chains across listing surfaces,
  * top-host report stability, pseudonymized-profile re-identification
  * risk, early-stopping scrape-policy experiments.
  */
object QueriesDP extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q471
    QDef("q471_temporal_reach",
      (s, dir) => {
        // The r8 plan MATERIALIZED the co-presence pair list — quadratic
        // in per-(type,hour) cell occupancy (281M directed pairs at sf1,
        // 100x for 10x rows; the one scale-killer the oracle's own
        // timeout was hiding). The event-type domain is 5 values BY
        // CONSTRUCTION, so co-presence inside an hour is a 5-bit MASK
        // INTERSECTION, and bitwise OR distributes over the existence
        // test (d & (m1|m2) != 0  <=>  d&m1 != 0 or d&m2 != 0) — every
        // pairwise step collapses to bounded per-(hour,mask) censuses
        // and frames linear in |cells| x 20 hubs. Same oracle.
        val sc3 = s
        import sc3.implicits._
        val ev = t(s, dir, "events")
          .selectExpr("user_id AS u", "event_type", s"($tsMs) DIV 3600000 AS h")
          .distinct()
        val types = ev.select("event_type").distinct()
          .collect().map(_.getString(0)).sorted
        // The h*64+mask packing of sTab keys assumes the (by-construction
        // 5-value) type domain stays under 6 bits; a wider domain would
        // silently collide keys, so fail loudly instead.
        require(types.length <= 6,
          s"q471 mask packing supports <=6 event types, got ${types.length}")
        if (types.isEmpty) {
          // empty events: no hubs, empty board — the expr-DSL below cannot
          // build 0-bit masks (EmptyInputSpec path)
          Seq.empty[(Long, Long, Long, Long)]
            .toDF("src", "reach_s", "reach_t", "temporal_bp")
        } else {
          val bitOf = types.zipWithIndex.toMap
          val maskExpr = types.map(tp =>
            when(col("event_type") === tp, lit(1L << bitOf(tp))).otherwise(0L))
            .foldLeft(lit(0L))(_ + _) // distinct types per (u,h): sum == OR
          val cells = ev.groupBy("u", "h")
            .agg(sum(maskExpr).cast("long").as("mask"))
          cells.cache()
          val nBits = types.length
          // per-hour mask census (≤ hours × 2^|types| rows, bounded) →
          // driver table S(h, m) = #users at h whose mask intersects m
          val census = cells.groupBy("h", "mask").agg(count(lit(1)).as("c"))
            .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
          val byHour = census.groupMap(_._1._1)(kv => (kv._1._2, kv._2))
          val sTab = byHour.flatMap { case (h, gs) =>
            (1L until (1L << nBits)).map { m =>
              (h * 64 + m) -> gs.collect { case (g, c) if (g & m) != 0 => c }.sum
            }
          }
          val sLit = typedLit(sTab)
          // deg(u) = Σ_h (S(h, mask_u) − 1): one map-side lookup per cell
          // row, no pair materialization; = |distinct (v,h)| exactly
          val hubRows = cells
            .withColumn("nbr", element_at(sLit, col("h") * 64 + col("mask")) - 1)
            .groupBy("u").agg(sum("nbr").as("deg"))
            // zero-degree users never appear in the oracle's pair-derived
            // hub set — keep them out of the top-20 on sparse data too
            .where(col("deg") > 0)
            .orderBy(col("deg").desc, col("u")).limit(20)
            .select(col("u").as("src")).collect().map(_.getLong(0))
          val prof = broadcast(
            cells.where(col("u").isin(hubRows: _*))
              .select(col("u").as("hub"), col("h").as("ph"),
                col("mask").as("pmask")))
          // hub→mid co-presence hours (the e1 frame): linear in cells
          val q0 = cells.join(prof,
              col("h") === col("ph") &&
                (col("mask").bitwiseAND(col("pmask")) =!= 0L) &&
                col("u") =!= col("hub"))
            .groupBy(col("hub"), col("u").as("mid"))
            .agg(sort_array(collect_set(col("h"))).as("h1s"))
          // mid qualification per hour: temporal needs an h1 in
          // [h2−24, h2), static one in [h2−24, h2+24]
          val qual = q0.join(cells.select(col("u").as("mid"),
              col("h").as("h2"), col("mask").as("m2")), "mid")
            .withColumn("qt", expr("exists(h1s, x -> x >= h2 - 24 AND x < h2)"))
            .where(expr("exists(h1s, x -> abs(h2 - x) <= 24)"))
            .select("hub", "mid", "h2", "m2", "qt")
          qual.cache(); qual.count() // read by the cnt agg AND the own-join
          // per-(hub, h2, bit) qualifying-mid counts — bounded ≤ 20·|hours|
          val bitCnt = (b: Int) => (col("m2").bitwiseAND(lit(1L << b)) =!= 0L)
          val cntCols = (0 until nBits).flatMap(b => Seq(
            sum(when(col("qt") && bitCnt(b), 1L).otherwise(0L)).as(s"t$b"),
            sum(when(bitCnt(b), 1L).otherwise(0L)).as(s"s$b")))
          val cnts = qual.groupBy("hub", "h2")
            .agg(cntCols.head, cntCols.tail: _*)
          // score every (dst, h2) cell against the broadcast counts; the
          // dst's OWN qualifying-mid contribution (mask == m2 == its cell
          // mask) is removed by raising the threshold to 2 on its bits
          val hitExpr = (pfx: String, ownCol: String) =>
            (0 until nBits).map(b =>
              s"((mask & ${1L << b}) != 0 AND $pfx$b >= (CASE WHEN $ownCol THEN 2 ELSE 1 END))")
              .mkString(" OR ")
          val scored = cells.withColumnRenamed("h", "h2")
            .join(broadcast(cnts), Seq("h2"))
            .where(col("u") =!= col("hub"))
            .join(qual.selectExpr("hub", "mid AS u", "h2",
                "qt AS own_t", "true AS own_s"),
              Seq("hub", "u", "h2"), "left")
            .withColumn("own_t", coalesce(col("own_t"), lit(false)))
            .withColumn("own_s", coalesce(col("own_s"), lit(false)))
            .withColumn("t_hit", expr(hitExpr("t", "own_t")))
            .withColumn("s_hit", expr(hitExpr("s", "own_s")))
          val reaches = scored.groupBy("hub").agg(
            countDistinct(when(col("t_hit"), col("u"))).cast("long").as("reach_t"),
            countDistinct(when(col("s_hit"), col("u"))).cast("long").as("reach_s"))
          hubRows.sorted.toSeq.toDF("src")
            .join(reaches.withColumnRenamed("hub", "src"), Seq("src"), "left")
            .selectExpr("src", "coalesce(reach_s, 0) AS reach_s",
              "coalesce(reach_t, 0) AS reach_t",
              "CASE WHEN coalesce(reach_s, 0) > 0 THEN coalesce(reach_t, 0) * 10000 DIV coalesce(reach_s, 0) ELSE -1 END AS temporal_bp")
            .orderBy("src")
        }
      },
      Some("""
        WITH cells AS (
          SELECT DISTINCT user_id, event_type, epoch_ms(ts) // 3600000 AS h
          FROM events),
        e AS MATERIALIZED (
          SELECT DISTINCT x.user_id AS u, y.user_id AS v, x.h
          FROM cells x JOIN cells y
            ON x.event_type = y.event_type AND x.h = y.h
           AND x.user_id <> y.user_id),
        hubs AS MATERIALIZED (
          SELECT u AS src FROM (SELECT u, count(*) AS deg FROM e GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 20),
        e1 AS (
          SELECT src, e.v AS mid, e.h AS h1
          FROM e JOIN hubs ON e.u = hubs.src),
        two AS MATERIALIZED (
          SELECT e1.src, e1.h1, e.v AS dst, e.h AS h2
          FROM e1 JOIN e ON e1.mid = e.u
          WHERE e.v <> e1.src),
        temporal AS (
          SELECT src, count(DISTINCT dst) AS reach_t FROM two
          WHERE h2 > h1 AND h2 - h1 <= 24 GROUP BY 1),
        static0 AS (
          SELECT src, count(DISTINCT dst) AS reach_s FROM two
          WHERE abs(h2 - h1) <= 24 GROUP BY 1)
        SELECT hubs.src, CAST(coalesce(reach_s, 0) AS BIGINT) AS reach_s,
               CAST(coalesce(reach_t, 0) AS BIGINT) AS reach_t,
               CAST(CASE WHEN coalesce(reach_s, 0) > 0
                 THEN coalesce(reach_t, 0) * 10000 // coalesce(reach_s, 0)
                 ELSE -1 END AS BIGINT) AS temporal_bp
        FROM hubs
        LEFT JOIN static0 ON hubs.src = static0.src
        LEFT JOIN temporal ON hubs.src = temporal.src
        ORDER BY hubs.src""")),

    // --------------------------------------------------------------- q472
    QDef("q472_loo_leaderboard",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nat")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("nat", "o_custkey")
          .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)").as("rev"))
        val w = Window.partitionBy("nat")
          .orderBy(col("rev").desc, col("o_custkey"))
        rev.withColumn("rk", row_number().over(w))
          .withColumn("total", sum("rev").over(Window.partitionBy("nat")))
          .where(col("rk") <= 2)
          .groupBy("nat").agg(
            max("total").cast("bigint").as("total"),
            max(when(col("rk") === 1, col("rev"))).cast("bigint").as("top1"),
            max(when(col("rk") === 2, col("rev"))).cast("bigint").as("top2"))
          .where(col("top2").isNotNull)
          .selectExpr("nat", "total", "top1", "top2",
            "top1 * 10000 DIV total AS share1_bp",
            "CASE WHEN total > top1 THEN top2 * 10000 DIV (total - top1) ELSE -1 END AS share2_after_bp",
            "(top1 - top2) * 10000 DIV top1 AS margin_bp")
          .orderBy("nat")
      },
      Some("""
        WITH rev AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nat, o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        rk AS (
          SELECT nat, o_custkey, rev,
                 row_number() OVER (PARTITION BY nat
                                    ORDER BY rev DESC, o_custkey) AS rk,
                 sum(rev) OVER (PARTITION BY nat) AS total
          FROM rev),
        agg AS (
          SELECT nat, max(total) AS total,
                 max(CASE WHEN rk = 1 THEN rev END) AS top1,
                 max(CASE WHEN rk = 2 THEN rev END) AS top2
          FROM rk WHERE rk <= 2 GROUP BY 1)
        SELECT nat, CAST(total AS BIGINT) AS total,
               CAST(top1 AS BIGINT) AS top1, CAST(top2 AS BIGINT) AS top2,
               CAST(top1 * 10000 // total AS BIGINT) AS share1_bp,
               CAST(CASE WHEN total > top1
                 THEN top2 * 10000 // (total - top1) ELSE -1 END AS BIGINT)
                 AS share2_after_bp,
               CAST((top1 - top2) * 10000 // top1 AS BIGINT) AS margin_bp
        FROM agg WHERE top2 IS NOT NULL
        ORDER BY nat""")),

    // --------------------------------------------------------------- q473
    QDef("q473_linkage_attack",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"($tsMs) DIV 86400000 AS d")
        val mid = ev.agg(expr("(min(d) + max(d) + 1) DIV 2")
          .cast("long").as("mid"))
        val prof = ev.crossJoin(broadcast(mid))
          .withColumn("half", when(col("d") < col("mid"), 0L).otherwise(1L))
          .groupBy("user_id", "half").agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("t1"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("t2"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("t3"),
            sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("t4"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("t5"))
          .withColumn("tot",
            col("t1") + col("t2") + col("t3") + col("t4") + col("t5"))
          .withColumn("domi", expr(
            "CASE WHEN t1 >= t2 AND t1 >= t3 AND t1 >= t4 AND t1 >= t5 THEN 1 " +
              "WHEN t2 >= t3 AND t2 >= t4 AND t2 >= t5 THEN 2 " +
              "WHEN t3 >= t4 AND t3 >= t5 THEN 3 " +
              "WHEN t4 >= t5 THEN 4 ELSE 5 END"))
          .withColumn("band", expr("length(bin(tot + 1)) - 1"))
        val known = prof.where(col("half") === 0)
          .selectExpr("user_id AS kid", "domi", "band", "t1 AS k1", "t2 AS k2",
            "t3 AS k3", "t4 AS k4", "t5 AS k5")
        val anon = prof.where(col("half") === 1)
          .selectExpr("user_id AS aid", "domi", "band", "t1 AS a1", "t2 AS a2",
            "t3 AS a3", "t4 AS a4", "t5 AS a5")
        // The block key (domi, band) has a BOUNDED domain (~5 × log2
        // range), so the naive anon×known block join is quadratic in
        // users-per-block and grows quadratically with the corpus.
        // Dictionary-encode instead: the pairwise L1 join runs over
        // DISTINCT profile vectors only (their count is bounded by value
        // combinatorics, not by user count), with per-vector min-id and
        // multiplicities carrying the exact original semantics:
        //   argmin over users of (l1, kid)
        //   == argmin over vectors of (l1, min kid with that vector).
        val vecCols = Seq("domi", "band", "a1", "a2", "a3", "a4", "a5")
        val kvec = known.groupBy("domi", "band", "k1", "k2", "k3", "k4", "k5")
          .agg(min("kid").as("kid_min"))
        val avec = anon.select(vecCols.map(col): _*).distinct()
        val winners = avec.join(kvec, Seq("domi", "band"))
          .withColumn("l1",
            abs(col("a1") - col("k1")) + abs(col("a2") - col("k2")) +
              abs(col("a3") - col("k3")) + abs(col("a4") - col("k4")) +
              abs(col("a5") - col("k5")))
          .groupBy(vecCols.map(col): _*)
          .agg(min(struct(col("l1"), col("kid_min"))).as("best"))
          .select(vecCols.map(col) :+ col("best.kid_min").as("kid_win"): _*)
        // per-block |known| replaces the per-aid candidate count: every
        // aid in a block has exactly that many candidates
        val blockKnown = known.groupBy("domi", "band")
          .agg(count(lit(1)).cast("long").as("ksz"))
        anon.join(winners, vecCols)
          .join(blockKnown, Seq("domi", "band"))
          .groupBy(lit(1L).as("one")).agg(
            count(lit(1)).cast("long").as("attacked"),
            sum(when(col("aid") === col("kid_win"), 1L).otherwise(0L))
              .cast("bigint").as("correct"),
            sum("ksz").cast("bigint").as("sum_block"))
          .selectExpr("attacked", "correct",
            "correct * 10000 DIV attacked AS success_bp",
            "attacked * 10000 DIV sum_block AS chance_bp")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS d
          FROM events),
        mid AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM ev),
        prof AS (
          SELECT user_id,
                 CASE WHEN d < (SELECT mid FROM mid) THEN 0 ELSE 1 END AS half,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS t1,
                 sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t2,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t3,
                 sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS t4,
                 sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS t5
          FROM ev GROUP BY 1, 2),
        prof2 AS (
          SELECT *, t1 + t2 + t3 + t4 + t5 AS tot,
                 CASE WHEN t1 >= t2 AND t1 >= t3 AND t1 >= t4 AND t1 >= t5
                      THEN 1
                      WHEN t2 >= t3 AND t2 >= t4 AND t2 >= t5 THEN 2
                      WHEN t3 >= t4 AND t3 >= t5 THEN 3
                      WHEN t4 >= t5 THEN 4 ELSE 5 END AS domi,
                 length(bin(t1 + t2 + t3 + t4 + t5 + 1)) - 1 AS band
          FROM prof),
        known AS (
          SELECT user_id AS kid, domi, band, t1 AS k1, t2 AS k2, t3 AS k3,
                 t4 AS k4, t5 AS k5
          FROM prof2 WHERE half = 0),
        anon AS (
          SELECT user_id AS aid, domi, band, t1 AS a1, t2 AS a2, t3 AS a3,
                 t4 AS a4, t5 AS a5
          FROM prof2 WHERE half = 1),
        cand AS (
          SELECT aid, kid,
                 abs(a1 - k1) + abs(a2 - k2) + abs(a3 - k3) + abs(a4 - k4)
                 + abs(a5 - k5) AS l1
          FROM anon JOIN known USING (domi, band)),
        matched AS (
          SELECT aid, kid FROM (
            SELECT aid, kid,
                   row_number() OVER (PARTITION BY aid ORDER BY l1, kid) AS rk
            FROM cand)
          WHERE rk = 1),
        blocks AS (SELECT aid, count(*) AS block_sz FROM cand GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS attacked,
               CAST(sum(CASE WHEN matched.aid = kid THEN 1 ELSE 0 END)
                 AS BIGINT) AS correct,
               CAST(sum(CASE WHEN matched.aid = kid THEN 1 ELSE 0 END)
                 * 10000 // count(*) AS BIGINT) AS success_bp,
               CAST(count(*) * 10000 // sum(block_sz) AS BIGINT) AS chance_bp
        FROM matched JOIN blocks ON matched.aid = blocks.aid""")),

    // --------------------------------------------------------------- q474
    QDef("q474_obf_looks",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"($tsMs) DIV 86400000 AS d")
        val bounds = ev.agg(min("d").as("lo"), max("d").as("hi"))
        val looks = bounds.selectExpr(
          "explode(array(" +
            "struct(CAST(1 AS BIGINT) AS look, lo + (hi - lo + 1) DIV 3 AS cut), " +
            "struct(CAST(2 AS BIGINT) AS look, lo + ((hi - lo + 1) * 2) DIV 3 AS cut), " +
            "struct(CAST(3 AS BIGINT) AS look, hi + 1 AS cut))) AS lk")
          .selectExpr("lk.look AS look", "CAST(lk.cut AS BIGINT) AS cut")
        val scored = ev.crossJoin(broadcast(looks))
          .where(col("d") < col("cut"))
          .groupBy("look").agg(
            countDistinct(when(col("user_id") % 2 === 1, col("user_id")))
              .cast("bigint").as("n1"),
            countDistinct(when(col("user_id") % 2 === 0, col("user_id")))
              .cast("bigint").as("n0"),
            countDistinct(when(col("user_id") % 2 === 1 &&
              col("event_type") === "purchase", col("user_id")))
              .cast("bigint").as("c1"),
            countDistinct(when(col("user_id") % 2 === 0 &&
              col("event_type") === "purchase", col("user_id")))
              .cast("bigint").as("c0"))
        val z = scored.selectExpr("look", "n1", "n0", "c1", "c0",
          """CASE WHEN c1 + c0 = 0 OR c1 + c0 = n1 + n0 THEN CAST(-1 AS BIGINT)
             ELSE CAST(floor(
             (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / ((CAST(c1 + c0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                * (1.0 - CAST(c1 + c0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE)))
             * 1e6) AS BIGINT) END AS z2_micro""")
          .withColumn("boundary_micro", expr(
            "CAST(CASE look WHEN 1 THEN 12048000 WHEN 2 THEN 6022000 ELSE 4016000 END AS BIGINT)"))
          .withColumn("reject", col("z2_micro") > col("boundary_micro"))
        z.select("look", "n1", "n0", "c1", "c0", "z2_micro",
          "boundary_micro", "reject")
          .orderBy("look")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS d
          FROM events),
        bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        looks AS (
          SELECT 1 AS look, lo + (hi - lo + 1) // 3 AS cut FROM bounds
          UNION ALL SELECT 2, lo + (hi - lo + 1) * 2 // 3 FROM bounds
          UNION ALL SELECT 3, hi + 1 FROM bounds),
        scored AS (
          SELECT look,
                 count(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END)
                   AS n1,
                 count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
                   AS n0,
                 count(DISTINCT CASE WHEN user_id % 2 = 1
                   AND event_type = 'purchase' THEN user_id END) AS c1,
                 count(DISTINCT CASE WHEN user_id % 2 = 0
                   AND event_type = 'purchase' THEN user_id END) AS c0
          FROM ev, looks WHERE d < cut GROUP BY 1),
        z AS (
          SELECT look, n1, n0, c1, c0,
                 CASE WHEN c1 + c0 = 0 OR c1 + c0 = n1 + n0
                 THEN CAST(-1 AS BIGINT)
                 ELSE CAST(floor(
                   (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / ((CAST(c1 + c0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                      * (1.0 - CAST(c1 + c0 AS DOUBLE)
                        / CAST(n1 + n0 AS DOUBLE))
                      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE)))
                   * 1e6) AS BIGINT) END AS z2_micro
          FROM scored)
        SELECT CAST(look AS BIGINT) AS look, CAST(n1 AS BIGINT) AS n1,
               CAST(n0 AS BIGINT) AS n0, CAST(c1 AS BIGINT) AS c1,
               CAST(c0 AS BIGINT) AS c0, z2_micro,
               CAST(CASE look WHEN 1 THEN 12048000 WHEN 2 THEN 6022000
                 ELSE 4016000 END AS BIGINT) AS boundary_micro,
               z2_micro > CASE look WHEN 1 THEN 12048000 WHEN 2 THEN 6022000
                 ELSE 4016000 END AS reject
        FROM z ORDER BY look"""))
  )
}
