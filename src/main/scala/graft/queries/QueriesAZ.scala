package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 45 — training-data feature ops and
  * evaluation accounting:
  *
  *  - q206: lag-feature materialization — the supervised-learning
  *    feature table: per event, lag-1/lag-2 values and the trailing
  *    3-event mean (full windows only, integer milli), exactly the
  *    shape a forecasting trainer consumes. Deterministic sample
  *    (user_id < 3) keeps the oracle bounded; the plan is the
  *    full-table plan (one hash partition by user, one sort).
  *  - q207: deterministic negative sampling — for each (customer, part)
  *    purchase positive, K=2 hash-generated negative parts; collision
  *    accounting (a sampled negative that IS a positive) per segment.
  *    The contrastive-training sampler, reproducible across runs/engines
  *    (portable md5, no RNG).
  *  - q208: calibration/reliability bins — synthetic hash-derived score
  *    deciles vs observed purchase rate: per-bin n, mean score, actual
  *    bp. The classifier/LLM-judge calibration audit (pairs with q43's
  *    recall gate).
  *  - q209: top-k contribution share per group — each nation's top-3
  *    customers' revenue share in bp (window rank + conditional sum,
  *    one shuffle). The per-group concentration gate (q173 is global).
  *
  * Reference analog: lag features = response-latency forecasting
  * features; negative sampling = listing-recommendation training pairs;
  * calibration = estimated-vs-actual listings-count trust audit
  * (workunits.py estimates); top-k share = revenue concentration per
  * region report.
  */
object QueriesAZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q206
    QDef("q206_lag_features",
      (s, dir) => {
        val wu = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .withColumn("lag1", lag("vc", 1).over(wu))
          .withColumn("lag2", lag("vc", 2).over(wu))
          .withColumn("nw", count(lit(1)).over(wu.rowsBetween(-2, 0)))
          .withColumn("rsum", sum("vc").over(wu.rowsBetween(-2, 0)))
          .selectExpr("user_id", "ts_ms", "event_id", "vc", "lag1", "lag2",
            "CASE WHEN nw = 3 THEN rsum * 1000 DIV 3 END AS rmean3_milli")
          .where(col("user_id") < 3)
          .orderBy("user_id", "ts_ms", "event_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL),
        f AS (
          SELECT user_id, ts_ms, event_id, vc,
                 lag(vc, 1) OVER w AS lag1,
                 lag(vc, 2) OVER w AS lag2,
                 count(*) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS nw,
                 CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
        SELECT user_id, ts_ms, event_id, vc, lag1, lag2,
               CASE WHEN nw = 3 THEN rsum * 1000 // 3 END AS rmean3_milli
        FROM f WHERE user_id < 3
        ORDER BY user_id, ts_ms, event_id""")),

    // --------------------------------------------------------------- q207
    QDef("q207_negative_sampling",
      (s, dir) => {
        // Basket-array form (r11): ONE customer-keyed collect_set shuffle
        // builds each basket (dedup happens map-side), and the negative
        // draws + their collision checks run LOCALLY against the basket
        // array — no per-negative row explosion and no (c, np) shuffle
        // join back against pos (the old 3-job form bounced 1.7-2.0 s at
        // sf0.1, straddling the floor). The part-domain scalar rides in
        // as a broadcast crossJoin column. The hash is the same salted
        // portable md5 via its in-lambda SQL fragment.
        val baskets = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("c"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        // empty-input safe: max() over zero rows is NULL → default domain 1
        val npDf = broadcast(t(s, dir, "part")
          .agg(coalesce(max("p_partkey"), lit(1L)).as("npmax")))
        val seg = t(s, dir, "customer")
          .select(col("c_custkey").as("c"), col("c_mktsegment").as("seg"))
        val npExpr = PortableHash.md5LongSparkSql(
          "concat(c, '_', p, '_', i)", salt = "neg~")
        val perCust = baskets.crossJoin(npDf)
          .select(col("c"), size(col("ps")).cast("bigint").as("n_pos"),
            expr(s"""aggregate(
                 flatten(transform(ps, p -> transform(array(0, 1),
                   i -> $npExpr % npmax + 1))),
                 CAST(0 AS BIGINT),
                 (acc, np) -> acc + CASE WHEN array_contains(ps, np)
                   THEN 1L ELSE 0L END) AS n_coll"""))
        perCust.join(broadcast(seg), "c")
          .groupBy("seg")
          .agg(sum("n_pos").cast("bigint").as("n_pos"),
            sum(col("n_pos") * 2).cast("bigint").as("n_neg"),
            sum("n_coll").cast("bigint").as("n_collisions"))
          .withColumn("collision_bp", expr("n_collisions * 10000 DIV n_neg"))
          .orderBy("seg")
      },
      Some(s"""
        WITH pos AS (
          SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        np AS (SELECT max(p_partkey) AS n FROM part),
        negs AS (
          SELECT pos.c, pos.p,
                 ${PortableHash.md5LongSql("concat(pos.c, '_', pos.p, '_', i.i)", salt = "neg~")}
                   % np.n + 1 AS nps
          FROM pos CROSS JOIN np, unnest([0, 1]) AS i(i)),
        marked AS (
          SELECT n.c, n.nps,
                 CASE WHEN EXISTS (SELECT 1 FROM pos p2
                                   WHERE p2.c = n.c AND p2.p = n.nps)
                      THEN 1 ELSE 0 END AS coll
          FROM negs n),
        pc AS (SELECT c, count(*) AS n_pos FROM pos GROUP BY 1),
        mc AS (SELECT c, count(*) AS n_neg, CAST(sum(coll) AS BIGINT) AS n_coll
               FROM marked GROUP BY 1)
        SELECT cu.c_mktsegment AS seg,
               CAST(sum(pc.n_pos) AS BIGINT) AS n_pos,
               CAST(sum(mc.n_neg) AS BIGINT) AS n_neg,
               CAST(sum(mc.n_coll) AS BIGINT) AS n_collisions,
               CAST(sum(mc.n_coll) AS BIGINT) * 10000
                 // CAST(sum(mc.n_neg) AS BIGINT) AS collision_bp
        FROM mc JOIN pc ON mc.c = pc.c
        JOIN customer cu ON cu.c_custkey = mc.c
        GROUP BY 1 ORDER BY seg""")),

    // --------------------------------------------------------------- q208
    QDef("q208_calibration",
      (s, dir) => {
        t(s, dir, "events")
          .select(col("event_type"),
            (PortableHash.md5Long(col("event_id").cast("string"), salt = "score~")
              % 10000).as("score_bp"))
          .selectExpr("score_bp DIV 1000 AS bin",
            "score_bp",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit")
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum("score_bp").cast("bigint").as("sum_score"),
            sum("hit").cast("bigint").as("n_hits"))
          .selectExpr("bin", "n", "sum_score DIV n AS mean_score_bp",
            "n_hits * 10000 DIV n AS actual_bp")
          .orderBy("bin")
      },
      Some(s"""
        WITH sc AS (
          SELECT ${PortableHash.md5LongSql("CAST(event_id AS VARCHAR)", salt = "score~")}
                   % 10000 AS score_bp,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
          FROM events)
        SELECT score_bp // 1000 AS bin, count(*) AS n,
               CAST(sum(score_bp) AS BIGINT) // count(*) AS mean_score_bp,
               CAST(sum(hit) AS BIGINT) * 10000 // count(*) AS actual_bp
        FROM sc GROUP BY 1 ORDER BY bin""")),

    // --------------------------------------------------------------- q209
    QDef("q209_topk_share",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .selectExpr("o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("o_custkey").agg(sum("cents").cast("bigint").as("rev"))
        val nat = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("bigint").as("nk"))
        val wr = Window.partitionBy("nk").orderBy(col("rev").desc, col("o_custkey"))
        rev.join(nat, col("o_custkey") === col("c_custkey"))
          .withColumn("rk", row_number().over(wr))
          .groupBy("nk")
          .agg(count(lit(1)).as("n_customers"),
            sum("rev").cast("bigint").as("total_cents"),
            sum(when(col("rk") <= 3, col("rev")).otherwise(0L))
              .cast("bigint").as("top3_cents"))
          .withColumn("top3_share_bp", expr("top3_cents * 10000 DIV total_cents"))
          .orderBy("nk")
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        j AS (
          SELECT c.c_nationkey AS nk, r.o_custkey, r.rev,
                 row_number() OVER (PARTITION BY c.c_nationkey
                   ORDER BY r.rev DESC, r.o_custkey) AS rk
          FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey)
        SELECT CAST(nk AS BIGINT) AS nk, count(*) AS n_customers,
               CAST(sum(rev) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN rk <= 3 THEN rev ELSE 0 END) AS BIGINT) AS top3_cents,
               CAST(sum(CASE WHEN rk <= 3 THEN rev ELSE 0 END) AS BIGINT) * 10000
                 // CAST(sum(rev) AS BIGINT) AS top3_share_bp
        FROM j GROUP BY 1 ORDER BY nk"""))
  )
}
