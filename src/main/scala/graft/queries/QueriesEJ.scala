package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 133 — time-series motif discovery,
  * counterfactual impact, shard rebalancing, incremental view
  * maintenance:
  *
  *  - q546: BANDED matrix profile (window 7, exclusion zone 7, band
  *    |i−j| ≤ 365) of the daily order-count series: per-rank windows
  *    built by a frame collect_list over the BOUNDED day aggregate,
  *    non-overlapping in-band window pairs scored with exact integer
  *    squared distances (zip_with fold ≡ list_sum/list_transform),
  *    motif = min-distance in-band pair, discord = window with the
  *    largest in-band nearest-neighbor distance. The classic
  *    motif/discord primitive (Yeh et al.); the band bounds pair count
  *    LINEARLY in the day domain (which grows with collection age, not
  *    data volume — all-pairs was quadratic in wall-clock age) and is
  *    realized as an equi-join on year-size rank buckets, so no
  *    theta-join survives at a 10-year domain either.
  *  - q547: CausalImpact-style readout: OLS of AFRICA daily revenue on
  *    AMERICA (pre-midpoint, exact component sums), counterfactual
  *    forecast for the post period, per-day floor-quantized
  *    predictions (volume-safe; the q100 lesson) summed exactly,
  *    cumulative effect bp.
  *  - q548: shard rebalancing by boundary flows: per-shard deltas vs
  *    the balanced target (first `total mod 32` shards absorb the
  *    remainder), prefix-sum boundary flow on the 32-row aggregate =
  *    the classic minimum-transfers-on-a-line solution, total moves =
  *    Σ|flow|.
  *  - q549: incremental view maintenance PROOF for a join view: orders
  *    and customers both split into (base, delta); the delta rule
  *    ΔV = Δo⋈c₀ ∪ o₀⋈Δc ∪ Δo⋈Δc recomputed per nation against the
  *    full view — counts and revenue must agree exactly (emitted as
  *    match flags, all 1). The join-view sibling of q87's
  *    incremental-aggregation proof.
  *
  * Scale shapes: q546's quadratic runs on the bounded day domain;
  * q547/q548 are aggregate-domain algebra; q549 is three joins whose
  * delta sides are 1/10 and 1/7 of the data.
  */
object QueriesEJ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q546
    QDef("q546_matrix_profile",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("y"))
        // Driver-census profile (r11, the q553 recipe): the day census is
        // calendar-bounded (≤ ~2.5k rows at ANY data scale), so ONE
        // distributed aggregation collects (day, y) and the 7-day
        // windows, the |i−j| ≤ 365 banded distance profile (~days×365
        // integer ops), motif and discord all run in Scala — replacing
        // two cache+count jobs, a global row_number window and the band-
        // bucket join. The banding survives a 10-year domain the same
        // way (the loop is linear in days × band width).
        val sc2 = s
        import sc2.implicits._
        val days = daily.collect().map(r => (r.getAs[Long]("day"),
          r.getAs[Long]("y"))).sortBy(_._1)
        val ys = days.map(_._2)
        val nW = math.max(ys.length - 6, 0) // windows with all 7 days
        var motif: Option[(Long, Long, Long)] = None // (d2, i, j)
        val nnd = scala.collection.mutable.Map.empty[Long, Long]
        var i0 = 0
        while (i0 < nW) {
          val i = i0 + 1L // 1-based rn
          var j0 = i0 + 7
          while (j0 < nW && j0 - i0 <= 365) {
            val j = j0 + 1L
            var d2 = 0L
            var k = 0
            while (k < 7) {
              val d = ys(i0 + k) - ys(j0 + k); d2 += d * d; k += 1
            }
            val cand = (d2, i, j)
            if (motif.forall(m => implicitly[Ordering[(Long, Long, Long)]]
                .lt(cand, m))) motif = Some(cand)
            if (nnd.getOrElse(i, Long.MaxValue) > d2) nnd(i) = d2
            if (nnd.getOrElse(j, Long.MaxValue) > d2) nnd(j) = d2
            j0 += 1
          }
          i0 += 1
        }
        // discord: max nnd, ties to the smallest window id
        val discord = nnd.toSeq.map { case (w, d) => (-d, w) }.sorted.headOption
          .map { case (nd, w) => (-nd, w) }
        Seq((nW.toLong, motif.map(_._2), motif.map(_._3), motif.map(_._1),
            discord.map(_._2), discord.map(_._1)))
          .toDF("n_windows", "motif_i", "motif_j", "motif_d2",
            "discord_i", "discord_nnd")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(count(*) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        wins AS (
          SELECT rn, arr FROM (
            SELECT row_number() OVER (ORDER BY day) AS rn,
                   list(y) OVER (ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS arr
            FROM daily)
          WHERE len(arr) = 7),
        pairs AS (
          SELECT a.rn AS i, b.rn AS j,
                 CAST(list_sum(list_transform(range(1, 8),
                   k -> (a.arr[k] - b.arr[k]) * (a.arr[k] - b.arr[k])))
                   AS BIGINT) AS d2
          FROM wins a JOIN wins b
            ON a.rn + 6 < b.rn AND b.rn - a.rn <= 365),
        motif AS (
          SELECT d2 AS motif_d2, i AS motif_i, j AS motif_j
          FROM pairs ORDER BY d2, i, j LIMIT 1),
        nnd AS (
          SELECT w, CAST(min(d2) AS BIGINT) AS nnd FROM (
            SELECT i AS w, d2 FROM pairs
            UNION ALL SELECT j, d2 FROM pairs)
          GROUP BY 1),
        discord AS (
          SELECT nnd AS discord_nnd, w AS discord_i
          FROM nnd ORDER BY nnd DESC, w LIMIT 1),
        cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_windows FROM wins)
        SELECT n_windows, motif_i, motif_j, motif_d2, discord_i,
               discord_nnd
        FROM cnt, motif, discord""")),

    // --------------------------------------------------------------- q547
    QDef("q547_causal_impact",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .join(t(s, dir, "customer"), expr("o_custkey = c_custkey"))
          .join(broadcast(t(s, dir, "nation")), expr("c_nationkey = n_nationkey"))
          .join(broadcast(t(s, dir, "region")), expr("n_regionkey = r_regionkey"))
          .where(expr("r_name IN ('AFRICA', 'AMERICA')"))
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "r_name",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 1000 AS rev")
          .groupBy("day").agg(
            sum(when(col("r_name") === "AFRICA", col("rev")).otherwise(0L))
              .cast("long").as("y"),
            sum(when(col("r_name") === "AMERICA", col("rev")).otherwise(0L))
              .cast("long").as("x"))
        daily.cache(); daily.count()
        val mid = daily.agg(((min("day") + max("day")) / 2).cast("long").as("mid"))
        val marked = daily.crossJoin(broadcast(mid))
        // component sums and Cramer products in DECIMAL(38,0): n·Σx²
        // and (Σx)² cross int64 at ~10x sf0.1 (caught by ProbeScaleR5);
        // exact decimal → identical correctly-rounded doubles vs the
        // oracle's HUGEINT route
        val fit = marked.where(expr("day < mid"))
          .agg(count(lit(1)).as("n"),
            sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
            sum(expr("x*y").cast("decimal(38,0)")).as("sxy"),
            sum(expr("x*x").cast("decimal(38,0)")).as("sxx"))
          .selectExpr("n", "sx", "sy", "sxy", "sxx",
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS num",
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den")
          .where(expr("n > 1 AND den > 0"))
          .selectExpr("n AS n_pre",
            "CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS b",
            """(CAST(sy AS DOUBLE) - CAST(num AS DOUBLE)
               / CAST(den AS DOUBLE) * sx) / n AS a""")
        val post = marked.where(expr("day >= mid"))
          .crossJoin(broadcast(fit))
          .selectExpr("n_pre", "a", "b", "y",
            "CAST(floor(a + b * x) AS BIGINT) AS pred")
          .groupBy("n_pre", "a", "b").agg(
            count(lit(1)).as("n_post"),
            sum("y").cast("long").as("cum_actual"),
            sum("pred").cast("long").as("cum_pred"))
          .where(expr("cum_pred > 0"))
        post.selectExpr("n_pre", "n_post",
          "CAST(floor(b * 1000) AS BIGINT) AS b_milli",
          "CAST(floor(a * 1000) AS BIGINT) AS a_milli",
          "cum_actual", "cum_pred",
          "(cum_actual - cum_pred) * 10000 DIV cum_pred AS effect_bp")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o.o_orderdate) // 86400000 AS day,
                 CAST(sum(CASE WHEN r.r_name = 'AFRICA' THEN
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) // 1000
                   ELSE 0 END) AS BIGINT) AS y,
                 CAST(sum(CASE WHEN r.r_name = 'AMERICA' THEN
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) // 1000
                   ELSE 0 END) AS BIGINT) AS x
          FROM orders o
          JOIN customer cu ON o.o_custkey = cu.c_custkey
          JOIN nation n ON cu.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name IN ('AFRICA', 'AMERICA')
            AND o.o_totalprice IS NOT NULL
          GROUP BY 1),
        mid AS (SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS mid
                FROM daily),
        fit AS (
          SELECT CAST(n AS BIGINT) AS n_pre,
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS b,
                 (CAST(sy AS DOUBLE) - CAST(num AS DOUBLE)
                   / CAST(den AS DOUBLE) * sx) / n AS a
          FROM (
            SELECT n, sx, sy,
                   n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS den
            FROM (
              SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x*y) AS HUGEINT) AS sxy,
                     CAST(sum(x*x) AS HUGEINT) AS sxx
              FROM daily, mid WHERE day < mid))
          WHERE n > 1 AND den > 0),
        post AS (
          SELECT f.n_pre, f.a, f.b,
                 CAST(count(*) AS BIGINT) AS n_post,
                 CAST(sum(d.y) AS BIGINT) AS cum_actual,
                 CAST(sum(CAST(floor(f.a + f.b * d.x) AS BIGINT)) AS BIGINT)
                   AS cum_pred
          FROM daily d, mid m, fit f
          WHERE d.day >= m.mid
          GROUP BY 1, 2, 3)
        SELECT n_pre, n_post,
               CAST(floor(b * 1000) AS BIGINT) AS b_milli,
               CAST(floor(a * 1000) AS BIGINT) AS a_milli,
               cum_actual, cum_pred,
               (cum_actual - cum_pred) * 10000 // cum_pred AS effect_bp
        FROM post WHERE cum_pred > 0""")),

    // --------------------------------------------------------------- q548
    QDef("q548_rebalance_plan",
      (s, dir) => {
        val shards = t(s, dir, "events")
          .selectExpr("event_id % 32 AS shard")
          .groupBy("shard").agg(count(lit(1)).as("cnt"))
        val tot = shards.agg(sum("cnt").cast("long").as("total"))
        val w = Window.orderBy("shard")
        val marked = shards.crossJoin(broadcast(tot))
          .selectExpr("shard", "cnt", "total",
            "total DIV 32 + CASE WHEN shard < total % 32 THEN 1 ELSE 0 END AS target")
          .withColumn("delta", col("cnt") - col("target"))
          .withColumn("flow", sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        val moves = marked.agg(sum(abs(col("flow"))).cast("long").as("total_moves"))
        marked.crossJoin(broadcast(moves))
          .selectExpr("shard", "cnt", "target", "delta", "flow", "total_moves")
          .orderBy("shard")
      },
      Some("""
        WITH shards AS (
          SELECT event_id % 32 AS shard, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM shards),
        marked AS (
          SELECT shard, cnt,
                 total // 32 + CASE WHEN shard < total % 32 THEN 1 ELSE 0 END
                   AS target,
                 cnt - (total // 32 + CASE WHEN shard < total % 32
                   THEN 1 ELSE 0 END) AS delta
          FROM shards, tot),
        flows AS (
          SELECT shard, cnt, target, delta,
                 CAST(sum(delta) OVER (ORDER BY shard
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS flow
          FROM marked),
        mv AS (SELECT CAST(sum(abs(flow)) AS BIGINT) AS total_moves
               FROM flows)
        SELECT f.shard, f.cnt, CAST(f.target AS BIGINT) AS target,
               CAST(f.delta AS BIGINT) AS delta, f.flow, m.total_moves
        FROM flows f, mv m
        ORDER BY f.shard""")),

    // --------------------------------------------------------------- q549
    QDef("q549_ivm_join_delta",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr("o_orderkey AS ok", "o_custkey AS ck",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
            "CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END AS isdelta")
        val c = t(s, dir, "customer")
          .selectExpr("c_custkey AS ck", "c_nationkey AS nk",
            "CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS cisdelta")
        def view(oDf: org.apache.spark.sql.DataFrame,
            cDf: org.apache.spark.sql.DataFrame) =
          oDf.join(cDf, "ck")
            .groupBy("nk").agg(count(lit(1)).as("cnt"),
              sum("cents").cast("long").as("rev"))
        val full = view(o, c)
        val vBase = view(o.where(expr("isdelta = 0")), c.where(expr("cisdelta = 0")))
        val d1 = view(o.where(expr("isdelta = 1")), c.where(expr("cisdelta = 0")))
        val d2 = view(o.where(expr("isdelta = 0")), c.where(expr("cisdelta = 1")))
        val d3 = view(o.where(expr("isdelta = 1")), c.where(expr("cisdelta = 1")))
        val inc = vBase.unionAll(d1).unionAll(d2).unionAll(d3)
          .groupBy("nk").agg(sum("cnt").cast("long").as("inc_cnt"),
            sum("rev").cast("long").as("inc_rev"))
        full.join(inc, "nk")
          .selectExpr("nk", "cnt AS full_cnt", "inc_cnt",
            "rev AS full_rev", "inc_rev",
            "CAST(CASE WHEN cnt = inc_cnt AND rev = inc_rev THEN 1 ELSE 0 END AS BIGINT) AS matches")
          .orderBy("nk")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey AS ok, o_custkey AS ck,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END AS isdelta
          FROM orders WHERE o_totalprice IS NOT NULL),
        c AS (
          SELECT c_custkey AS ck, c_nationkey AS nk,
                 CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS cisdelta
          FROM customer),
        full_v AS (
          SELECT nk, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(cents) AS BIGINT) AS rev
          FROM o JOIN c ON o.ck = c.ck GROUP BY nk),
        parts AS (
          SELECT nk, count(*) AS cnt, sum(cents) AS rev
          FROM o JOIN c ON o.ck = c.ck
          WHERE o.isdelta = 0 AND c.cisdelta = 0 GROUP BY nk
          UNION ALL
          SELECT nk, count(*), sum(cents)
          FROM o JOIN c ON o.ck = c.ck
          WHERE o.isdelta = 1 AND c.cisdelta = 0 GROUP BY nk
          UNION ALL
          SELECT nk, count(*), sum(cents)
          FROM o JOIN c ON o.ck = c.ck
          WHERE o.isdelta = 0 AND c.cisdelta = 1 GROUP BY nk
          UNION ALL
          SELECT nk, count(*), sum(cents)
          FROM o JOIN c ON o.ck = c.ck
          WHERE o.isdelta = 1 AND c.cisdelta = 1 GROUP BY nk),
        inc AS (
          SELECT nk, CAST(sum(cnt) AS BIGINT) AS inc_cnt,
                 CAST(sum(rev) AS BIGINT) AS inc_rev
          FROM parts GROUP BY nk)
        SELECT f.nk, f.cnt AS full_cnt, i.inc_cnt,
               f.rev AS full_rev, i.inc_rev,
               CAST(CASE WHEN f.cnt = i.inc_cnt AND f.rev = i.inc_rev
                 THEN 1 ELSE 0 END AS BIGINT) AS matches
        FROM full_v f JOIN inc i ON f.nk = i.nk
        ORDER BY f.nk"""))
  )
}
