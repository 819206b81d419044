package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 138 — model-evaluation and
  * iterative-ML primitives every training pipeline needs downstream of
  * the data engine:
  *
  *  - q570: exact ROC AUC by rank-sum on the BOUNDED score domain
  *    (score buckets aggregated first, then one prefix window over
  *    ≤997 rows): doubled Mann–Whitney U2 = Σ p_s·(2·negBelow + n_s)
  *    handles ties exactly in integers; auc_ppm floor-quantized.
  *    Never ranks raw rows — the score-bucket census is the shuffle.
  *  - q571: calibration (reliability) bins: pseudo-score ppm bucketed
  *    into deciles, per bin exact mean predicted ppm vs actual rate
  *    ppm and |gap|. The ECE building block.
  *  - q572: k-means (k=4, 3 unrolled Lloyd rounds) on the QUANTIZED
  *    2D cell census (97×89 bounded cells, weights = row counts):
  *    assignment = broadcast-centroid argmin with deterministic ties,
  *    update = exact weighted integer means. Iterative ML as
  *    join+agg on a bounded aggregate — raw rows are touched once.
  *  - q573: Markov stationary distribution: event-type transition
  *    counts (per-user lag windows), row-normalized ppm, 3 quantized
  *    power-iteration rounds as edge–vector joins (q561's matvec
  *    shape on a stochastic matrix).
  *
  * Scale shapes: q570/q571/q572 aggregate facts to bounded domains
  * before any window/iteration; q573's windows partition by user_id
  * (high-cardinality) and iterate on the bounded state graph.
  */
object QueriesEO extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q570
    QDef("q570_auc_rank",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 997 AS sc",
            """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1L ELSE 0L END AS y""")
          .groupBy("sc").agg(
            sum("y").cast("long").as("p"),
            (count(lit(1)) - sum("y")).cast("long").as("n"))
        val w = Window.orderBy("sc")
          .rowsBetween(Window.unboundedPreceding, -1)
        cells
          .withColumn("nb", coalesce(sum("n").over(w), lit(0L)).cast("long"))
          .agg(sum("p").cast("long").as("n_pos"),
            sum("n").cast("long").as("n_neg"),
            sum(expr("p * (2 * nb + n)")).cast("long").as("u2"))
          .where(expr("n_pos > 0 AND n_neg > 0"))
          .selectExpr("n_pos", "n_neg", "u2",
            """CAST(floor(CAST(u2 AS DOUBLE) * 500000
                 / (CAST(n_pos AS DOUBLE) * n_neg)) AS BIGINT) AS auc_ppm""")
      },
      Some("""
        WITH cells AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 997 AS sc,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS n
          FROM orders GROUP BY 1),
        r AS (
          SELECT p, n,
                 coalesce(CAST(sum(n) OVER (ORDER BY sc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS nb
          FROM cells),
        c AS (
          SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                 CAST(sum(n) AS BIGINT) AS n_neg,
                 CAST(sum(p * (2 * nb + n)) AS BIGINT) AS u2
          FROM r)
        SELECT n_pos, n_neg, u2,
               CAST(floor(CAST(u2 AS DOUBLE) * 500000
                 / (CAST(n_pos AS DOUBLE) * n_neg)) AS BIGINT) AS auc_ppm
        FROM c WHERE n_pos > 0 AND n_neg > 0""")),

    // --------------------------------------------------------------- q571
    QDef("q571_calibration_bins",
      (s, dir) => {
        t(s, dir, "lineitem")
          .selectExpr(
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) % 1000000 AS pred_ppm",
            "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
          .groupBy(expr("pred_ppm DIV 100000").as("bin"))
          .agg(count(lit(1)).as("n"),
            sum("pred_ppm").cast("long").as("sp"),
            sum("y").cast("long").as("sy"))
          .selectExpr("bin", "n",
            "sp DIV n AS mean_pred_ppm",
            "sy * 1000000 DIV n AS rate_ppm",
            "abs(sp DIV n - sy * 1000000 DIV n) AS gap_ppm")
          .orderBy("bin")
      },
      Some("""
        SELECT pred_ppm // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pred_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
               CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS rate_ppm,
               CAST(abs(sum(pred_ppm) // count(*)
                 - sum(y) * 1000000 // count(*)) AS BIGINT) AS gap_ppm
        FROM (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   % 1000000 AS pred_ppm,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem)
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q572
    QDef("q572_kmeans_rounds",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        // bounded cell census: ≤ 97×89 weighted points, built once
        val cells = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 % 97 AS x",
            "CAST(floor(o_totalprice + 0.5) AS BIGINT) % 89 AS y")
          .groupBy("x", "y").agg(count(lit(1)).as("cnt"))
        cells.cache(); cells.count()
        var cent = Seq((0L, 10L, 10L), (1L, 50L, 20L), (2L, 30L, 70L),
          (3L, 80L, 80L)).toDF("cid", "cx", "cy")
        for (_ <- 1 to 3) {
          cent = cells.crossJoin(broadcast(cent))
            .selectExpr("x", "y", "cnt",
              "(x - cx) * (x - cx) + (y - cy) * (y - cy) AS d", "cid")
            .groupBy("x", "y", "cnt")
            .agg(min(struct(col("d"), col("cid"))).as("m"))
            .selectExpr("x", "y", "cnt", "m.cid AS cid")
            .groupBy("cid").agg(
              expr("sum(x * cnt) DIV sum(cnt)").as("cx"),
              expr("sum(y * cnt) DIV sum(cnt)").as("cy"),
              sum("cnt").cast("long").as("npts"))
            .select("cid", "cx", "cy", "npts")
        }
        cent.selectExpr("cid", "cx", "cy", "npts").orderBy("cid")
      },
      Some("""
        WITH cells AS (
          SELECT epoch_ms(o_orderdate) // 86400000 % 97 AS x,
                 CAST(floor(o_totalprice + 0.5) AS BIGINT) % 89 AS y,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM orders GROUP BY 1, 2),
        c0 AS (SELECT * FROM (VALUES (0, 10, 10), (1, 50, 20), (2, 30, 70),
                 (3, 80, 80)) t(cid, cx, cy)),
        a1 AS (
          SELECT x, y, cnt, cid FROM (
            SELECT cells.*, c0.cid,
                   row_number() OVER (PARTITION BY x, y ORDER BY
                     (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rn
            FROM cells, c0) WHERE rn = 1),
        c1 AS (
          SELECT cid, sum(x * cnt) // sum(cnt) AS cx,
                 sum(y * cnt) // sum(cnt) AS cy
          FROM a1 GROUP BY 1),
        a2 AS (
          SELECT x, y, cnt, cid FROM (
            SELECT cells.*, c1.cid,
                   row_number() OVER (PARTITION BY x, y ORDER BY
                     (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rn
            FROM cells, c1) WHERE rn = 1),
        c2 AS (
          SELECT cid, sum(x * cnt) // sum(cnt) AS cx,
                 sum(y * cnt) // sum(cnt) AS cy
          FROM a2 GROUP BY 1),
        a3 AS (
          SELECT x, y, cnt, cid FROM (
            SELECT cells.*, c2.cid,
                   row_number() OVER (PARTITION BY x, y ORDER BY
                     (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rn
            FROM cells, c2) WHERE rn = 1),
        c3 AS (
          SELECT cid, sum(x * cnt) // sum(cnt) AS cx,
                 sum(y * cnt) // sum(cnt) AS cy,
                 CAST(sum(cnt) AS BIGINT) AS npts
          FROM a3 GROUP BY 1)
        SELECT CAST(cid AS BIGINT) AS cid, CAST(cx AS BIGINT) AS cx,
               CAST(cy AS BIGINT) AS cy, npts
        FROM c3 ORDER BY cid""")),

    // --------------------------------------------------------------- q573
    QDef("q573_markov_stationary",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "ts", "event_id", "event_type")
        val trans = ev
          .withColumn("nxt", lead("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("a"), col("nxt").as("b"))
          .agg(count(lit(1)).as("c"))
        val p = trans
          .withColumn("rt", sum("c").over(
            Window.partitionBy("a")).cast("long"))
          .selectExpr("a", "b", "c * 1000000 DIV rt AS p_ppm")
        p.cache(); p.count()
        val states = p.select(col("a").as("st")).distinct()
        // max(·,1): empty input has no states, so x0 is empty anyway —
        // the guard only keeps the driver-side literal defined
        val k = math.max(states.count(), 1L)
        var x = states.withColumn("x", lit(1000000L / k))
        for (_ <- 1 to 3) {
          x = states.join(
              p.join(x.selectExpr("st AS a", "x AS xa"), "a")
                .groupBy("b").agg(
                  sum(expr("xa * p_ppm")).cast("long").as("num")),
              col("st") === col("b"), "left")
            .selectExpr("st", "coalesce(num, 0L) DIV 1000000 AS x")
        }
        x.selectExpr("st AS state", "x AS stat_ppm").orderBy("state")
      },
      Some("""
        WITH trans AS (
          SELECT event_type AS a,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS b
          FROM events),
        tc AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM trans WHERE b IS NOT NULL GROUP BY 1, 2),
        p AS (
          SELECT a, b,
                 c * 1000000 // CAST(sum(c) OVER (PARTITION BY a) AS BIGINT)
                   AS p_ppm
          FROM tc),
        states AS (SELECT DISTINCT a AS st FROM p),
        x0 AS (SELECT st, CAST(1000000 // (SELECT count(*) FROM states)
                 AS BIGINT) AS x FROM states),
        x1 AS (
          SELECT s.st, CAST(coalesce(m.num, 0) // 1000000 AS BIGINT) AS x
          FROM states s LEFT JOIN (
            SELECT p.b, CAST(sum(x0.x * p.p_ppm) AS BIGINT) AS num
            FROM p JOIN x0 ON p.a = x0.st GROUP BY 1) m ON s.st = m.b),
        x2 AS (
          SELECT s.st, CAST(coalesce(m.num, 0) // 1000000 AS BIGINT) AS x
          FROM states s LEFT JOIN (
            SELECT p.b, CAST(sum(x1.x * p.p_ppm) AS BIGINT) AS num
            FROM p JOIN x1 ON p.a = x1.st GROUP BY 1) m ON s.st = m.b),
        x3 AS (
          SELECT s.st, CAST(coalesce(m.num, 0) // 1000000 AS BIGINT) AS x
          FROM states s LEFT JOIN (
            SELECT p.b, CAST(sum(x2.x * p.p_ppm) AS BIGINT) AS num
            FROM p JOIN x2 ON p.a = x2.st GROUP BY 1) m ON s.st = m.b)
        SELECT st AS state, x AS stat_ppm FROM x3 ORDER BY state"""))
  )
}
