package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 127 — hyperparameter scheduling,
  * perceptual time-series downsampling, optimal 1-D classing,
  * ratio-metric experimentation:
  *
  *  - q522: successive-halving bandit replay over event-type "arms":
  *    budgets 8/16/32 earliest events per arm, keep the better half
  *    each round (mean reward in milli-cents, ties to the smaller
  *    arm name), champion = last survivor. The per-arm earliest-k is
  *    TWO-PHASE (per-(arm,64-salt-shard) local top-32, then the tiny
  *    survivor set) so no window ever sees a whole arm's partition —
  *    the Hyperband-style trial scheduler of ML-infra pipelines.
  *  - q523: Largest-Triangle-Three-Buckets (LTTB) downsampling of the
  *    daily order-count series to 60 points: first/last pinned, 58
  *    interior buckets, each pick maximizes the integer doubled
  *    triangle area against the PREVIOUS pick and the next bucket's
  *    centroid (cleared of division by scaling with the next bucket's
  *    size). Sequential pick chain → one-task pass over the bounded
  *    day aggregate; oracle = recursive CTE over per-bucket candidate
  *    LISTs (q519's list-argmax machine).
  *  - q524: Jenks natural-breaks (k=4) on the bounded order-total
  *    level domain: exhaustive 3-break search over ranked levels with
  *    prefix-sum segment costs — the weighted SSD uses one literal
  *    IEEE op order, argmin via lexicographic struct-min. Bounded by
  *    construction (≤ ~60 levels → ≤ 35k combos), fully parallel.
  *  - q525: ratio-metric A/B test (revenue per event) with
  *    delta-method variance: per-user (x, y) component sums, group
  *    split user_id % 2, var(X̄/Ȳ) ≈ (vx − 2R·cxy + R²·vy)/(n·ȳ²),
  *    z floor-milli. The experimentation-correct way to test ratio
  *    metrics (q381 CUPED's denominator-aware sibling).
  *
  * Scale shapes: q522 never ranks a whole arm in one partition;
  * q523/q524 run on day/level aggregates bounded by construction;
  * q525 is two aggregation passes (user, then group) + one scalar row.
  */
object QueriesED extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class LttbDay(day: Long, v: Long)
  case class LttbOut(step: Long, day: Long, v: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q522
    QDef("q522_successive_halving",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type AS arm", s"$tsMs AS ts_ms", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
            "pmod(event_id, 64) AS shard")
        // phase 1: per-(arm, shard) local earliest-32 — bounded partitions
        val w1 = Window.partitionBy("arm", "shard")
          .orderBy("ts_ms", "event_id")
        val local = ev.withColumn("rn1", row_number().over(w1))
          .where(col("rn1") <= 32)
        // phase 2: global earliest-32 among the ≤64·32 survivors per arm
        val w2 = Window.partitionBy("arm").orderBy("ts_ms", "event_id")
        val top = local.withColumn("rn", row_number().over(w2))
          .where(col("rn") <= 32)
        val arms = top.groupBy("arm").agg(
          count(lit(1)).as("n_events"),
          sum(when(col("rn") <= 8, col("cents")).otherwise(0L))
            .cast("long").as("s8"),
          sum(when(col("rn") <= 8, 1L).otherwise(0L)).as("c8"),
          sum(when(col("rn") <= 16, col("cents")).otherwise(0L))
            .cast("long").as("s16"),
          sum(when(col("rn") <= 16, 1L).otherwise(0L)).as("c16"),
          sum(col("cents")).cast("long").as("s32"),
          count(lit(1)).as("c32"))
          .selectExpr("arm", "n_events",
            "s8 * 1000 DIV c8 AS m8_milli",
            "s16 * 1000 DIV c16 AS m16_milli",
            "s32 * 1000 DIV c32 AS m32_milli")
        val k = arms.agg(count(lit(1)).as("k0"))
          .selectExpr("k0", "(k0 + 1) DIV 2 AS k1",
            "((k0 + 1) DIV 2 + 1) DIV 2 AS k2")
        val r1 = Window.orderBy(col("m8_milli").desc, col("arm"))
        val ranked1 = arms.crossJoin(broadcast(k))
          .withColumn("rk1", row_number().over(r1))
        val r2 = Window.partitionBy("surv1")
          .orderBy(col("m16_milli").desc, col("arm"))
        val ranked2 = ranked1.withColumn("surv1", col("rk1") <= col("k1"))
          .withColumn("rk2", row_number().over(r2))
        val r3 = Window.partitionBy("surv2")
          .orderBy(col("m32_milli").desc, col("arm"))
        ranked2
          .withColumn("surv2", col("surv1") && col("rk2") <= col("k2"))
          .withColumn("rk3", row_number().over(r3))
          .selectExpr("arm", "n_events", "m8_milli", "m16_milli", "m32_milli",
            """CAST(CASE WHEN NOT surv1 THEN 1
                 WHEN NOT surv2 THEN 2
                 WHEN rk3 > 1 THEN 3 ELSE 4 END AS BIGINT) AS elim_round""")
          .orderBy("arm")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type AS arm, epoch_ms(ts) AS ts_ms, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL),
        top AS (
          SELECT arm, cents,
                 row_number() OVER (PARTITION BY arm
                   ORDER BY ts_ms, event_id) AS rn
          FROM ev QUALIFY rn <= 32),
        arms AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN rn <= 8 THEN cents ELSE 0 END) AS BIGINT)
                   * 1000 // CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END)
                   AS BIGINT) AS m8_milli,
                 CAST(sum(CASE WHEN rn <= 16 THEN cents ELSE 0 END) AS BIGINT)
                   * 1000 // CAST(sum(CASE WHEN rn <= 16 THEN 1 ELSE 0 END)
                   AS BIGINT) AS m16_milli,
                 CAST(sum(cents) AS BIGINT) * 1000
                   // CAST(count(*) AS BIGINT) AS m32_milli
          FROM top GROUP BY arm),
        k AS (SELECT CAST(count(*) AS BIGINT) AS k0,
                     (CAST(count(*) AS BIGINT) + 1) // 2 AS k1,
                     ((CAST(count(*) AS BIGINT) + 1) // 2 + 1) // 2 AS k2
              FROM arms),
        rk1 AS (
          SELECT a.*, k.k1, k.k2,
                 row_number() OVER (ORDER BY m8_milli DESC, arm) AS r1
          FROM arms a, k),
        rk2 AS (
          SELECT *, r1 <= k1 AS surv1,
                 row_number() OVER (PARTITION BY (r1 <= k1)
                   ORDER BY m16_milli DESC, arm) AS r2
          FROM rk1),
        rk3 AS (
          SELECT *, surv1 AND r2 <= k2 AS surv2,
                 row_number() OVER (PARTITION BY (surv1 AND r2 <= k2)
                   ORDER BY m32_milli DESC, arm) AS r3
          FROM rk2)
        SELECT arm, n_events, m8_milli, m16_milli, m32_milli,
               CAST(CASE WHEN NOT surv1 THEN 1
                 WHEN NOT surv2 THEN 2
                 WHEN r3 > 1 THEN 3 ELSE 4 END AS BIGINT) AS elim_round
        FROM rk3 ORDER BY arm""")),

    // --------------------------------------------------------------- q523
    QDef("q523_lttb_downsample",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("v"))
          .as[LttbDay]
        daily.coalesce(1).sortWithinPartitions("day")
          .mapPartitions { it =>
            val pts = it.toArray
            val n = pts.length
            if (n < 60) Iterator.empty
            else {
              val B = 58
              // interior j = 1..n-2 → bucket 1..58
              def bucketOf(j: Int) = ((j - 1).toLong * B / (n - 2)).toInt + 1
              val buckets = Array.fill(B)(
                scala.collection.mutable.ArrayBuffer[LttbDay]())
              for (j <- 1 to n - 2) buckets(bucketOf(j) - 1) += pts(j)
              val out = scala.collection.mutable.ArrayBuffer[LttbOut]()
              var prev = pts(0)
              out += LttbOut(0L, prev.day, prev.v)
              for (b <- 1 to B) {
                // next anchor: centroid sums of bucket b+1 (last point for b=B)
                val (m, sxc, syc) =
                  if (b == B) (1L, pts(n - 1).day, pts(n - 1).v)
                  else {
                    val nb = buckets(b)
                    (nb.length.toLong, nb.map(_.day).sum, nb.map(_.v).sum)
                  }
                var best: LttbDay = null; var bestScore = -1L
                buckets(b - 1).foreach { p =>
                  val sc = math.abs(
                    (prev.day * m - sxc) * (p.v - prev.v) -
                      (prev.day - p.day) * (syc - prev.v * m))
                  if (sc > bestScore) { bestScore = sc; best = p }
                }
                out += LttbOut(b.toLong, best.day, best.v)
                prev = best
              }
              out += LttbOut((B + 1).toLong, pts(n - 1).day, pts(n - 1).v)
              out.iterator
            }
          }
          .toDF()
          .orderBy("step")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(count(*) AS BIGINT) AS v
          FROM orders GROUP BY 1),
        idx AS (
          SELECT day, v, row_number() OVER (ORDER BY day) AS i,
                 count(*) OVER () AS n
          FROM daily),
        firstlast AS (
          SELECT max(CASE WHEN i = 1 THEN day END) AS fday,
                 max(CASE WHEN i = 1 THEN v END) AS fv,
                 max(CASE WHEN i = n THEN day END) AS lday,
                 max(CASE WHEN i = n THEN v END) AS lv,
                 max(n) AS n
          FROM idx),
        interior AS (
          SELECT day, v, (i - 2) * 58 // (n - 2) + 1 AS b
          FROM idx WHERE i > 1 AND i < n AND n >= 60),
        bk AS (
          SELECT b, list(day ORDER BY day) AS ds, list(v ORDER BY day) AS vs,
                 CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(day) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy
          FROM interior GROUP BY b),
        anchors AS (
          SELECT b.b,
                 CASE WHEN b.b = 58 THEN 1 ELSE nx.m END AS am,
                 CASE WHEN b.b = 58 THEN fl.lday ELSE nx.sx END AS asx,
                 CASE WHEN b.b = 58 THEN fl.lv ELSE nx.sy END AS asy
          FROM bk b LEFT JOIN bk nx ON nx.b = b.b + 1, firstlast fl),
        rec AS (
          SELECT CAST(0 AS BIGINT) AS step, fday AS pd, fv AS pv
          FROM firstlast WHERE n >= 60
          UNION ALL
          SELECT step + 1, ds[bi], vs[bi]
          FROM (
            SELECT q.step, q.ds, q.vs,
                   CAST(list_position(q.scores, list_max(q.scores))
                     AS BIGINT) AS bi
            FROM (
              SELECT r.step, b.ds, b.vs,
                     list_transform(range(1, len(b.ds) + 1), k ->
                       abs((r.pd * a.am - a.asx) * (b.vs[k] - r.pv)
                         - (r.pd - b.ds[k]) * (a.asy - r.pv * a.am)))
                       AS scores
              FROM rec r
              JOIN bk b ON b.b = r.step + 1
              JOIN anchors a ON a.b = b.b
              WHERE r.step < 58) q) z),
        picks AS (
          SELECT step, pd AS day, pv AS v FROM rec
          UNION ALL
          SELECT CAST(59 AS BIGINT), lday, lv FROM firstlast WHERE n >= 60)
        SELECT step, day, v FROM picks ORDER BY step""")),

    // --------------------------------------------------------------- q524
    QDef("q524_jenks_breaks",
      (s, dir) => {
        val lv = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 1000000 AS v")
          .groupBy("v").agg(count(lit(1)).as("w"))
        // bounded by construction: ≤ ~60 price levels
        val wPos = Window.orderBy("v")
        val pre = lv.withColumn("i", row_number().over(wPos))
          .withColumn("pw", sum("w").over(wPos.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
          .withColumn("pwv", sum(expr("w*v")).over(wPos.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
          .withColumn("pwvv", sum(expr("w*v*v")).over(wPos.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
          .selectExpr("i", "v", "CAST(pw AS BIGINT) AS pw",
            "CAST(pwv AS BIGINT) AS pwv", "CAST(pwvv AS BIGINT) AS pwvv")
        pre.cache(); pre.count()
        val m = pre.agg(max("i").as("m"), max("pw").as("tw"),
          max("pwv").as("tv"), max("pwvv").as("tvv"))
        val pos = pre.select(col("i"))
        val combos = pos.selectExpr("i AS b1")
          .join(broadcast(pos.selectExpr("i AS b2")), expr("b1 < b2"))
          .join(broadcast(pos.selectExpr("i AS b3")), expr("b2 < b3"))
          .crossJoin(broadcast(m))
          .where(expr("b3 < m"))
        def seg(lo: String, hi: String) =
          s"""(CAST(${hi}vv - ${lo}vv AS DOUBLE)
              - CAST(${hi}v - ${lo}v AS DOUBLE) * (${hi}v - ${lo}v)
                / (${hi}w - ${lo}w))"""
        val joined = combos
          .join(broadcast(pre.selectExpr("i AS b1", "pw AS p1w",
            "pwv AS p1v", "pwvv AS p1vv")), "b1")
          .join(broadcast(pre.selectExpr("i AS b2", "pw AS p2w",
            "pwv AS p2v", "pwvv AS p2vv")), "b2")
          .join(broadcast(pre.selectExpr("i AS b3", "pw AS p3w",
            "pwv AS p3v", "pwvv AS p3vv")), "b3")
          .withColumn("z0w", lit(0L)).withColumn("z0v", lit(0L))
          .withColumn("z0vv", lit(0L))
          .withColumn("cost",
            expr(s"${seg("z0", "p1")} + ${seg("p1", "p2")} " +
              s"+ ${seg("p2", "p3")} + ${seg("p3", "t")}"))
        val best = joined
          .agg(min(struct(col("cost"), col("b1"), col("b2"), col("b3"),
            col("p1w"), col("p2w"), col("p3w"), col("tw"))).as("st"))
          .selectExpr("st.b1 AS b1", "st.b2 AS b2", "st.b3 AS b3",
            "st.cost AS cost", "st.p1w AS n1",
            "st.p2w - st.p1w AS n2", "st.p3w - st.p2w AS n3",
            "st.tw - st.p3w AS n4")
        best
          .join(broadcast(pre.selectExpr("i AS b1", "v AS v1")), "b1")
          .join(broadcast(pre.selectExpr("i AS b2", "v AS v2")), "b2")
          .join(broadcast(pre.selectExpr("i AS b3", "v AS v3")), "b3")
          .selectExpr("v1", "v2", "v3", "n1", "n2", "n3", "n4",
            "CAST(floor(cost * 1000) AS BIGINT) AS sse_milli")
      },
      Some("""
        WITH lv AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 1000000
                   AS v, CAST(count(*) AS BIGINT) AS w
          FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        pre AS (
          SELECT v, row_number() OVER (ORDER BY v) AS i,
                 CAST(sum(w) OVER (ORDER BY v) AS BIGINT) AS pw,
                 CAST(sum(w*v) OVER (ORDER BY v) AS BIGINT) AS pwv,
                 CAST(sum(w*v*v) OVER (ORDER BY v) AS BIGINT) AS pwvv
          FROM lv),
        tot AS (SELECT max(i) AS m, max(pw) AS tw, max(pwv) AS twv,
                       max(pwvv) AS twvv FROM pre),
        combos AS (
          SELECT a.i AS b1, b.i AS b2, c.i AS b3,
                 a.pw AS p1w, a.pwv AS p1v, a.pwvv AS p1vv,
                 b.pw AS p2w, b.pwv AS p2v, b.pwvv AS p2vv,
                 c.pw AS p3w, c.pwv AS p3v, c.pwvv AS p3vv,
                 t.tw, t.twv, t.twvv
          FROM pre a, pre b, pre c, tot t
          WHERE a.i < b.i AND b.i < c.i AND c.i < t.m),
        costed AS (
          SELECT b1, b2, b3, p1w, p2w, p3w, tw,
                 (CAST(p1vv - 0 AS DOUBLE)
                  - CAST(p1v - 0 AS DOUBLE) * (p1v - 0) / (p1w - 0))
                 + (CAST(p2vv - p1vv AS DOUBLE)
                  - CAST(p2v - p1v AS DOUBLE) * (p2v - p1v) / (p2w - p1w))
                 + (CAST(p3vv - p2vv AS DOUBLE)
                  - CAST(p3v - p2v AS DOUBLE) * (p3v - p2v) / (p3w - p2w))
                 + (CAST(twvv - p3vv AS DOUBLE)
                  - CAST(twv - p3v AS DOUBLE) * (twv - p3v) / (tw - p3w))
                   AS cost
          FROM combos),
        best AS (
          SELECT * FROM costed ORDER BY cost, b1, b2, b3 LIMIT 1)
        SELECT x.v AS v1, y.v AS v2, z.v AS v3,
               b.p1w AS n1, b.p2w - b.p1w AS n2, b.p3w - b.p2w AS n3,
               b.tw - b.p3w AS n4,
               CAST(floor(b.cost * 1000) AS BIGINT) AS sse_milli
        FROM best b
        JOIN pre x ON x.i = b.b1
        JOIN pre y ON y.i = b.b2
        JOIN pre z ON z.i = b.b3""")),

    // --------------------------------------------------------------- q525
    QDef("q525_delta_method_ratio",
      (s, dir) => {
        val u = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("user_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("user_id").agg(
            sum("cents").cast("long").as("x"),
            count(lit(1)).as("y"))
          .selectExpr("user_id % 2 AS g", "x", "y")
        val c = u.agg(
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 1, col("x")).otherwise(0L)).cast("long").as("sx1"),
          sum(when(col("g") === 1, col("y")).otherwise(0L)).cast("long").as("sy1"),
          sum(when(col("g") === 1, expr("x*x")).otherwise(0L)).cast("long").as("sxx1"),
          sum(when(col("g") === 1, expr("y*y")).otherwise(0L)).cast("long").as("syy1"),
          sum(when(col("g") === 1, expr("x*y")).otherwise(0L)).cast("long").as("sxy1"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("g") === 0, col("x")).otherwise(0L)).cast("long").as("sx0"),
          sum(when(col("g") === 0, col("y")).otherwise(0L)).cast("long").as("sy0"),
          sum(when(col("g") === 0, expr("x*x")).otherwise(0L)).cast("long").as("sxx0"),
          sum(when(col("g") === 0, expr("y*y")).otherwise(0L)).cast("long").as("syy0"),
          sum(when(col("g") === 0, expr("x*y")).otherwise(0L)).cast("long").as("sxy0"))
          .where(expr("n1 > 1 AND n0 > 1 AND sy1 > 0 AND sy0 > 0"))
        def grp(i: Int) = Seq(
          s"CAST(sx$i AS DOUBLE) / sy$i AS r$i",
          s"(CAST(sxx$i AS DOUBLE) * n$i - CAST(sx$i AS DOUBLE) * sx$i) / n$i / (n$i - 1) AS vx$i",
          s"(CAST(syy$i AS DOUBLE) * n$i - CAST(sy$i AS DOUBLE) * sy$i) / n$i / (n$i - 1) AS vy$i",
          s"(CAST(sxy$i AS DOUBLE) * n$i - CAST(sx$i AS DOUBLE) * sy$i) / n$i / (n$i - 1) AS cxy$i",
          s"CAST(sy$i AS DOUBLE) / n$i AS my$i")
        c.selectExpr((Seq("n1", "n0") ++ grp(1) ++ grp(0)): _*)
          .selectExpr("n1", "n0", "r1", "r0",
            "(vx1 - 2 * r1 * cxy1 + r1 * r1 * vy1) / (n1 * my1 * my1) AS vr1",
            "(vx0 - 2 * r0 * cxy0 + r0 * r0 * vy0) / (n0 * my0 * my0) AS vr0")
          .selectExpr("n1", "n0",
            "CAST(floor(r1 * 1000) AS BIGINT) AS r1_milli",
            "CAST(floor(r0 * 1000) AS BIGINT) AS r0_milli",
            "CAST(floor((r1 - r0) / sqrt(vr1 + vr0) * 1000) AS BIGINT) AS z_milli")
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS g, x, y FROM (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS x,
                   CAST(count(*) AS BIGINT) AS y
            FROM events WHERE value IS NOT NULL GROUP BY user_id)),
        c AS (
          SELECT
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
            CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
            CAST(sum(CASE WHEN g = 1 THEN x*x ELSE 0 END) AS BIGINT) AS sxx1,
            CAST(sum(CASE WHEN g = 1 THEN y*y ELSE 0 END) AS BIGINT) AS syy1,
            CAST(sum(CASE WHEN g = 1 THEN x*y ELSE 0 END) AS BIGINT) AS sxy1,
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
            CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
            CAST(sum(CASE WHEN g = 0 THEN x*x ELSE 0 END) AS BIGINT) AS sxx0,
            CAST(sum(CASE WHEN g = 0 THEN y*y ELSE 0 END) AS BIGINT) AS syy0,
            CAST(sum(CASE WHEN g = 0 THEN x*y ELSE 0 END) AS BIGINT) AS sxy0
          FROM u),
        d AS (
          SELECT n1, n0,
            CAST(sx1 AS DOUBLE) / sy1 AS r1,
            (CAST(sxx1 AS DOUBLE) * n1 - CAST(sx1 AS DOUBLE) * sx1) / n1 / (n1 - 1) AS vx1,
            (CAST(syy1 AS DOUBLE) * n1 - CAST(sy1 AS DOUBLE) * sy1) / n1 / (n1 - 1) AS vy1,
            (CAST(sxy1 AS DOUBLE) * n1 - CAST(sx1 AS DOUBLE) * sy1) / n1 / (n1 - 1) AS cxy1,
            CAST(sy1 AS DOUBLE) / n1 AS my1,
            CAST(sx0 AS DOUBLE) / sy0 AS r0,
            (CAST(sxx0 AS DOUBLE) * n0 - CAST(sx0 AS DOUBLE) * sx0) / n0 / (n0 - 1) AS vx0,
            (CAST(syy0 AS DOUBLE) * n0 - CAST(sy0 AS DOUBLE) * sy0) / n0 / (n0 - 1) AS vy0,
            (CAST(sxy0 AS DOUBLE) * n0 - CAST(sx0 AS DOUBLE) * sy0) / n0 / (n0 - 1) AS cxy0,
            CAST(sy0 AS DOUBLE) / n0 AS my0
          FROM c WHERE n1 > 1 AND n0 > 1 AND sy1 > 0 AND sy0 > 0),
        v AS (
          SELECT n1, n0, r1, r0,
            (vx1 - 2 * r1 * cxy1 + r1 * r1 * vy1) / (n1 * my1 * my1) AS vr1,
            (vx0 - 2 * r0 * cxy0 + r0 * r0 * vy0) / (n0 * my0 * my0) AS vr0
          FROM d)
        SELECT n1, n0,
               CAST(floor(r1 * 1000) AS BIGINT) AS r1_milli,
               CAST(floor(r0 * 1000) AS BIGINT) AS r0_milli,
               CAST(floor((r1 - r0) / sqrt(vr1 + vr0) * 1000) AS BIGINT)
                 AS z_milli
        FROM v"""))
  )
}
