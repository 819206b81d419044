package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 95 — causal inference at a cutoff,
  * survival curves, decision-tree splits, native session windows:
  *
  *  - q403: regression discontinuity — local linear fits on each side of
  *    the median order value (bandwidth C/4), intercepts at the cutoff
  *    from exact BIGINT component sums (distance measured OUTWARD from
  *    the cutoff on each side, so no negative integer division — Spark
  *    DIV truncates, DuckDB // floors). Jump = right − left intercept.
  *    Final ratios in DOUBLE with one fixed op order, floor-micro.
  *  - q404: Kaplan–Meier product-limit per market segment over the
  *    signup→purchase latency of q152, with right-censoring at the
  *    horizon. S_d = S_{d-1}·(n_d − d_d) DIV n_d is a floor-integer
  *    recurrence over the ≤15 day steps — sequential state rides the
  *    mapPartitions recurrence path per segment (bounded by the horizon,
  *    independent of data volume); recursive-CTE oracle.
  *  - q405: best univariate split by information gain — per brand, the
  *    nine decile ranks of the price-ordered lineitems are candidate
  *    splits; parent/child entropies on the return-flag outcome from
  *    running BIGINT counts (one window pass, no per-candidate rescan),
  *    gain floor-pico, argmax via the q175 struct-max (no sort window).
  *  - q406: Spark's NATIVE session_window operator (30-min gap) — the
  *    same semantics as q07's lag+cumsum sessionization but exercising
  *    the built-in merging-window physical operator; the oracle is the
  *    classic gap-break SQL (new session at diff ≥ gap, matching the
  *    half-open [ts, ts+gap) merge rule).
  *
  * Reference analog: price-threshold effects on booking propensity,
  * listing-lifetime survival after first scrape, split mining on
  * review-score thresholds, harvest-burst sessionization.
  */
object QueriesCX extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class KmRow(segment: String, d: Long, at_risk: Long,
                   converted: Long, censored: Long)
  case class KmOut(segment: String, d: Long, at_risk: Long,
                   converted: Long, censored: Long, s_micro: Long)

  /** Binary-entropy SQL fragment in nats, ONE IEEE op order; identical
    * text runs on both engines. */
  private def hEnt(pos: String, n: String): String =
    s"""(CASE WHEN $pos = 0 OR $pos = $n THEN 0.0
         ELSE -((CAST($pos AS DOUBLE) / CAST($n AS DOUBLE))
                  * ln(CAST($pos AS DOUBLE) / CAST($n AS DOUBLE))
                + (CAST(($n) - ($pos) AS DOUBLE) / CAST($n AS DOUBLE))
                  * ln(CAST(($n) - ($pos) AS DOUBLE) / CAST($n AS DOUBLE)))
         END)"""

  /** Intercept-at-cutoff and slope of a one-sided local linear fit from
    * exact BIGINT sums, DOUBLE with one fixed op order, floor-micro. */
  private def b0Micro(p: String): String =
    s"""CAST(floor((CAST(${p}sy AS DOUBLE) * CAST(${p}sxx AS DOUBLE)
          - CAST(${p}sx AS DOUBLE) * CAST(${p}sxy AS DOUBLE))
        / (CAST(${p}cnt AS DOUBLE) * CAST(${p}sxx AS DOUBLE)
          - CAST(${p}sx AS DOUBLE) * CAST(${p}sx AS DOUBLE)) * 1e6) AS BIGINT)"""
  private def slopeMicro(p: String): String =
    s"""CAST(floor((CAST(${p}cnt AS DOUBLE) * CAST(${p}sxy AS DOUBLE)
          - CAST(${p}sx AS DOUBLE) * CAST(${p}sy AS DOUBLE))
        / (CAST(${p}cnt AS DOUBLE) * CAST(${p}sxx AS DOUBLE)
          - CAST(${p}sx AS DOUBLE) * CAST(${p}sx AS DOUBLE)) * 1e6) AS BIGINT)"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q403
    QDef("q403_regression_discontinuity",
      (s, dir) => {
        val lines = t(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("y"))
        val ord = t(s, dir, "orders")
          .selectExpr("o_orderkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .join(lines, col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "cents", "y")
          .cache() // read by BOTH the median scan and the sided pass
        // value at rank ceil(n/2) == percentile_disc(1/2). Dual-path
        // (r11): the distinct-cents histogram is far smaller than ord, so
        // collect it (capped) and read the median off the sorted cumsum
        // driver-side — the census job also materializes the ord cache,
        // so the whole query is 2 jobs instead of quantileDisc's
        // range-sample + running-sum chain built TWICE (med fed two
        // broadcast crossJoins). Above the cap (or on an empty ord) the
        // distributed distinct-value cumsum below is the scale path.
        val CAP = 4000000
        val byV = ord.groupBy("cents").agg(count(lit(1)).as("cnt"))
          .limit(CAP + 1).collect()
        // Inner Option mirrors quantileDisc's null handling exactly: a
        // null cents group (nulled o_totalprice) sorts FIRST (Spark asc
        // nulls-first), counts toward n and the cumsum, and can never BE
        // the median value (min() ignores nulls) — an all-null census
        // yields a null c0, same as the distributed agg(min) would.
        val c0Opt: Option[Option[Long]] =
          if (byV.isEmpty || byV.length > CAP) None
          else {
            val sorted = byV.map(r =>
                (if (r.isNullAt(0)) null
                 else java.lang.Long.valueOf(r.getLong(0)), r.getLong(1)))
              .sortBy { case (v, _) =>
                (v != null, if (v == null) 0L else v.longValue()) }
            val n = sorted.iterator.map(_._2).sum
            var cum = 0L
            var c0: java.lang.Long = null
            val it = sorted.iterator
            var done = false
            while (it.hasNext && !done) {
              val (v, c) = it.next(); cum += c
              if (2 * cum >= n && v != null) { c0 = v; done = true }
            }
            Some(Option(c0).map(_.longValue()))
          }
        lazy val med = graft.operators.ScaleRank.quantileDisc(
          ord, col("cents"), 1, 2, "c0")
        def attachC0(df: org.apache.spark.sql.DataFrame) = c0Opt match {
          case Some(Some(v)) => df.withColumn("c0", lit(v))
          case Some(None)    => df.withColumn("c0", lit(null).cast("bigint"))
          case None          => df.crossJoin(broadcast(med))
        }
        val sided = attachC0(ord)
          .withColumn("h", expr("c0 DIV 4"))
          .where(col("cents") >= col("c0") - col("h") &&
            col("cents") < col("c0") + col("h"))
          .withColumn("side", when(col("cents") < col("c0"), "l").otherwise("r"))
          .withColumn("d", expr(
            "CASE WHEN cents < c0 THEN (c0 - cents) DIV 100 ELSE (cents - c0) DIV 100 END"))
        val comps = sided.groupBy("side").agg(
          count(lit(1)).as("n"), sum("d").as("sx"), sum("y").as("sy"),
          sum(expr("d * d")).as("sxx"), sum(expr("d * y")).as("sxy"))
        val flat = comps.groupBy().agg(
          max(when(col("side") === "l", col("n"))).as("lcnt"),
          max(when(col("side") === "l", col("sx"))).as("lsx"),
          max(when(col("side") === "l", col("sy"))).as("lsy"),
          max(when(col("side") === "l", col("sxx"))).as("lsxx"),
          max(when(col("side") === "l", col("sxy"))).as("lsxy"),
          max(when(col("side") === "r", col("n"))).as("rcnt"),
          max(when(col("side") === "r", col("sx"))).as("rsx"),
          max(when(col("side") === "r", col("sy"))).as("rsy"),
          max(when(col("side") === "r", col("sxx"))).as("rsxx"),
          max(when(col("side") === "r", col("sxy"))).as("rsxy"))
        attachC0(flat)
          .selectExpr("c0 AS cutoff_cents", "lcnt AS n_left", "rcnt AS n_right",
            s"${b0Micro("l")} AS b0l_micro", s"${b0Micro("r")} AS b0r_micro",
            s"${slopeMicro("l")} AS slope_l_micro",
            s"${slopeMicro("r")} AS slope_r_micro",
            s"${b0Micro("r")} - ${b0Micro("l")} AS jump_micro")
      },
      Some(s"""
        WITH ly AS (
          SELECT l_orderkey, count(*) AS y FROM lineitem GROUP BY 1),
        ord AS (
          SELECT o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 ly.y
          FROM orders o JOIN ly ON o.o_orderkey = ly.l_orderkey),
        med AS (
          SELECT cents AS c0 FROM (
            SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
                   count(*) OVER () AS n
            FROM ord) WHERE rn = (n + 1) // 2),
        sided AS (
          SELECT CASE WHEN cents < c0 THEN 'l' ELSE 'r' END AS side,
                 CASE WHEN cents < c0 THEN (c0 - cents) // 100
                      ELSE (cents - c0) // 100 END AS d, y
          FROM ord, med
          WHERE cents >= c0 - c0 // 4 AND cents < c0 + c0 // 4),
        comps AS (
          SELECT side, count(*) AS n, sum(d) AS sx, sum(y) AS sy,
                 sum(d * d) AS sxx, sum(d * y) AS sxy
          FROM sided GROUP BY 1),
        flat AS (
          SELECT max(CASE WHEN side = 'l' THEN n END) AS lcnt,
                 max(CASE WHEN side = 'l' THEN sx END) AS lsx,
                 max(CASE WHEN side = 'l' THEN sy END) AS lsy,
                 max(CASE WHEN side = 'l' THEN sxx END) AS lsxx,
                 max(CASE WHEN side = 'l' THEN sxy END) AS lsxy,
                 max(CASE WHEN side = 'r' THEN n END) AS rcnt,
                 max(CASE WHEN side = 'r' THEN sx END) AS rsx,
                 max(CASE WHEN side = 'r' THEN sy END) AS rsy,
                 max(CASE WHEN side = 'r' THEN sxx END) AS rsxx,
                 max(CASE WHEN side = 'r' THEN sxy END) AS rsxy
          FROM comps)
        SELECT m.c0 AS cutoff_cents, f.lcnt AS n_left, f.rcnt AS n_right,
               ${b0Micro("l")} AS b0l_micro, ${b0Micro("r")} AS b0r_micro,
               ${slopeMicro("l")} AS slope_l_micro,
               ${slopeMicro("r")} AS slope_r_micro,
               ${b0Micro("r")} - ${b0Micro("l")} AS jump_micro
        FROM flat f, med m""")),

    // --------------------------------------------------------------- q404
    QDef("q404_kaplan_meier",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val horizon = ev.agg(max(expr(tsMs)).as("hz"))
        val s0 = ev.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min(expr(tsMs)).as("s0"))
        val p0 = ev.where(col("event_type") === "purchase")
          .selectExpr("user_id", s"$tsMs AS pts")
        val users = s0
          .join(p0, s0("user_id") === p0("user_id") && p0("pts") >= s0("s0"),
            "left")
          .drop(p0("user_id"))
          .groupBy("user_id", "s0").agg(min("pts").as("p1"))
          .crossJoin(broadcast(horizon))
          .selectExpr("user_id",
            "CASE WHEN p1 IS NULL THEN NULL ELSE (p1 - s0) DIV 86400000 END AS lat",
            "(hz - s0) DIV 86400000 AS cens")
          .join(t(s, dir, "customer")
            .selectExpr("c_custkey AS user_id", "c_mktsegment AS segment"),
            "user_id")
        val daily = users
          .crossJoin(broadcast(
            users.sparkSession.range(0, 15).selectExpr("id AS d")))
          .groupBy("segment", "d")
          .agg(
            sum(when((col("lat").isNull && col("cens") >= col("d")) ||
              (col("lat").isNotNull && col("lat") >= col("d")), 1L)
              .otherwise(0L)).cast("bigint").as("at_risk"),
            sum(when(col("lat") === col("d"), 1L).otherwise(0L))
              .cast("bigint").as("converted"),
            sum(when(col("lat").isNull && col("cens") === col("d"), 1L)
              .otherwise(0L)).cast("bigint").as("censored"))
          .as[KmRow]
        daily.repartition(col("segment"))
          .sortWithinPartitions("segment", "d")
          .mapPartitions { it =>
            new Iterator[KmOut] {
              private var cur: String = null
              private var sMicro = 1000000L
              private def step(r: KmRow): KmOut = {
                if (r.segment != cur) { cur = r.segment; sMicro = 1000000L }
                if (r.at_risk > 0)
                  sMicro = sMicro * (r.at_risk - r.converted) / r.at_risk
                KmOut(r.segment, r.d, r.at_risk, r.converted, r.censored, sMicro)
              }
              def hasNext: Boolean = it.hasNext
              def next(): KmOut = step(it.next())
            }
          }
          .toDF()
          .orderBy("segment", "d")
      },
      Some("""
        WITH RECURSIVE hz AS (SELECT max(epoch_ms(ts)) AS hz FROM events),
        s0 AS (
          SELECT user_id, min(epoch_ms(ts)) AS s0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        p0 AS (
          SELECT user_id, epoch_ms(ts) AS pts FROM events
          WHERE event_type = 'purchase'),
        u AS (
          SELECT s0.user_id, s0.s0, min(p0.pts) AS p1
          FROM s0 LEFT JOIN p0 ON s0.user_id = p0.user_id
            AND p0.pts >= s0.s0
          GROUP BY 1, 2),
        lc AS (
          SELECT c.c_mktsegment AS segment,
                 CASE WHEN p1 IS NULL THEN NULL
                      ELSE (p1 - s0) // 86400000 END AS lat,
                 (hz.hz - s0) // 86400000 AS cens
          FROM u CROSS JOIN hz
          JOIN customer c ON u.user_id = c.c_custkey),
        days AS (SELECT unnest(range(0, 15)) AS d),
        daily AS (
          SELECT segment, d.d,
                 CAST(sum(CASE WHEN (lat IS NULL AND cens >= d.d)
                       OR (lat IS NOT NULL AND lat >= d.d)
                     THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
                 CAST(sum(CASE WHEN lat = d.d THEN 1 ELSE 0 END) AS BIGINT)
                   AS converted,
                 CAST(sum(CASE WHEN lat IS NULL AND cens = d.d
                     THEN 1 ELSE 0 END) AS BIGINT) AS censored
          FROM lc CROSS JOIN days d GROUP BY 1, 2),
        km AS (
          SELECT segment, d, at_risk, converted, censored,
                 CASE WHEN at_risk > 0
                      THEN (1000000 * (at_risk - converted)) // at_risk
                      ELSE CAST(1000000 AS BIGINT) END AS s_micro
          FROM daily WHERE d = 0
          UNION ALL
          SELECT t.segment, t.d, t.at_risk, t.converted, t.censored,
                 CASE WHEN t.at_risk > 0
                      THEN (k.s_micro * (t.at_risk - t.converted)) // t.at_risk
                      ELSE k.s_micro END
          FROM km k JOIN daily t ON t.segment = k.segment AND t.d = k.d + 1)
        SELECT segment, d, at_risk, converted, censored, s_micro
        FROM km ORDER BY segment, d""")),

    // --------------------------------------------------------------- q405
    QDef("q405_info_gain_split",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .selectExpr("p_brand AS brand",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
            "l_orderkey AS ok", "l_linenumber AS ln")
        val w = Window.partitionBy("brand").orderBy("cents", "ok", "ln")
        val ranked = li
          .withColumn("rn", row_number().over(w))
          .withColumn("cum_pos",
            sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("brand")))
          .withColumn("pos", sum("y").over(Window.partitionBy("brand")))
        val gainExpr =
          s"""CAST(floor((${hEnt("pos", "n")}
               - (CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))
                 * ${hEnt("cum_pos", "rn")}
               - (CAST(n - rn AS DOUBLE) / CAST(n AS DOUBLE))
                 * ${hEnt("pos - cum_pos", "n - rn")}) * 1e12) AS BIGINT)"""
        val cand = ranked
          .where(expr("""rn >= 1 AND rn < n AND
            rn IN ((1*n) DIV 10, (2*n) DIV 10, (3*n) DIV 10, (4*n) DIV 10,
                   (5*n) DIV 10, (6*n) DIV 10, (7*n) DIV 10, (8*n) DIV 10,
                   (9*n) DIV 10)"""))
          .withColumn("gain_pico", expr(gainExpr))
        cand.groupBy("brand")
          .agg(
            max(struct(col("gain_pico").as("g"), (lit(0L) - col("rn")).as("negrn"),
              col("cents").as("cents"))).as("m"),
            max("n").as("n"), max("pos").as("pos_total"))
          .selectExpr("brand", "n", "pos_total", "-m.negrn AS split_rank",
            "m.cents AS split_cents", "m.g AS gain_pico")
          .orderBy("brand")
      },
      Some(s"""
        WITH li AS (
          SELECT p.p_brand AS brand,
                 CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                 CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                 l.l_orderkey AS ok, l.l_linenumber AS ln
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        ranked AS (
          SELECT brand, cents,
                 row_number() OVER (PARTITION BY brand
                   ORDER BY cents, ok, ln) AS rn,
                 CAST(sum(y) OVER (PARTITION BY brand ORDER BY cents, ok, ln
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                 count(*) OVER (PARTITION BY brand) AS n,
                 CAST(sum(y) OVER (PARTITION BY brand) AS BIGINT) AS pos
          FROM li),
        cand AS (
          SELECT brand, cents, rn, cum_pos, n, pos,
                 CAST(floor((${hEnt("pos", "n")}
                   - (CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))
                     * ${hEnt("cum_pos", "rn")}
                   - (CAST(n - rn AS DOUBLE) / CAST(n AS DOUBLE))
                     * ${hEnt("pos - cum_pos", "n - rn")}) * 1e12) AS BIGINT)
                   AS gain_pico
          FROM ranked
          WHERE rn >= 1 AND rn < n AND
            rn IN ((1*n) // 10, (2*n) // 10, (3*n) // 10, (4*n) // 10,
                   (5*n) // 10, (6*n) // 10, (7*n) // 10, (8*n) // 10,
                   (9*n) // 10)),
        best AS (
          SELECT brand, CAST(n AS BIGINT) AS n, pos AS pos_total, rn, cents,
                 gain_pico,
                 row_number() OVER (PARTITION BY brand
                   ORDER BY gain_pico DESC, rn) AS brk
          FROM cand)
        SELECT brand, n, pos_total, CAST(rn AS BIGINT) AS split_rank,
               cents AS split_cents, gain_pico
        FROM best WHERE brk = 1 ORDER BY brand""")),

    // --------------------------------------------------------------- q406
    QDef("q406_session_window",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "timestamp_micros(ts DIV 1000) AS tts")
        val sess = ev
          .groupBy(col("user_id"), session_window(col("tts"), "30 minutes"))
          .agg(count(lit(1)).as("c"),
            expr("unix_millis(session_window.end) - unix_millis(session_window.start) - 1800000")
              .as("span_ms"))
        sess.groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("c").cast("bigint").as("n_events"),
            max("span_ms").cast("bigint").as("max_span_ms"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        m AS (
          SELECT user_id, ms,
                 CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                        IS NULL
                      OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                        >= 1800000
                      THEN 1 ELSE 0 END AS brk
          FROM e),
        sfx AS (
          SELECT user_id, ms,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM m),
        g AS (
          SELECT user_id, sid, count(*) AS c, max(ms) - min(ms) AS span
          FROM sfx GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(max(span) AS BIGINT) AS max_span_ms
        FROM g GROUP BY 1 ORDER BY user_id"""))
  )
}
