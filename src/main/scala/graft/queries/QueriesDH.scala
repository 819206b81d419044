package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 105 — MapType surface, trajectory
  * simplification, bitemporal reconstruction, DP release simulation:
  *
  *  - q439: MapType operator surface — per-user event-type counts built
  *    into a real MAP column (map_from_entries), filtered with
  *    map_filter(v ≥ 3), values rescaled with transform_values, size()
  *    taken before filtering, then exploded back to rows. The oracle is
  *    the flat GROUP BY ... HAVING form — proving the map pipeline
  *    changes representation, not semantics.
  *  - q440: Douglas–Peucker-lite trajectory simplification (depth 2) —
  *    per-user point sequences on the INTEGER synthetic-geo lattice;
  *    deviation via the exact cross product (p−a)×(b−a), the
  *    keep-test |cross|² > T²·|chord|² entirely in BIGINT (no sqrt, no
  *    division). Round 1 splits at the global max-deviation point,
  *    round 2 processes both halves — each round is one window argmax.
  *  - q441: bitemporal as-of reconstruction — change records carry BOTH
  *    an application time (transaction time) and an effective day
  *    (valid time); the state as-of (T_tx, V) is the argmax over
  *    (valid_day, applied_ms) among records applied ≤ T_tx and
  *    effective ≤ V: two temporal filters + one struct-max. The
  *    two-dimensional upgrade of q115/q153's valid-time-only lookups.
  *  - q442: differential-privacy release simulation — Laplace(1/ε)
  *    noise from DETERMINISTIC hash-uniforms (u ∈ (0,1), never hitting
  *    the log singularity by construction), noise floored to integer
  *    counts; per-type true vs noisy totals, L1 cost and worst cell.
  *    Reproducible by design so the release pipeline is testable; swap
  *    the hash for a real RNG in production.
  *
  * Reference analog: per-listing surface-mix maps, movement-history
  * simplification before storage (workunits.py:158), "what did the
  * table say on date V as known at time T" audits, privacy-budgeted
  * publication of harvest statistics.
  */
object QueriesDH extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q439
    QDef("q439_map_ops",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).cast("long").as("c"))
          .groupBy("user_id")
          .agg(map_from_entries(collect_list(struct(col("event_type"),
            col("c")))).as("m"))
          .withColumn("n_types", size(col("m")).cast("long"))
          .withColumn("kept", expr("map_filter(m, (k, v) -> v >= 3)"))
          .withColumn("boostedm", expr("transform_values(kept, (k, v) -> v * 2)"))
          .select(col("user_id"), col("n_types"),
            explode(col("boostedm")).as(Seq("event_type", "boosted")))
          .select("user_id", "event_type", "boosted", "n_types")
          .orderBy("user_id", "event_type")
      },
      Some("""
        WITH c AS (
          SELECT user_id, event_type, count(*) AS c
          FROM events GROUP BY 1, 2),
        nt AS (SELECT user_id, count(*) AS n_types FROM c GROUP BY 1)
        SELECT c.user_id, event_type, CAST(c * 2 AS BIGINT) AS boosted,
               CAST(n_types AS BIGINT) AS n_types
        FROM c JOIN nt ON c.user_id = nt.user_id
        WHERE c >= 3
        ORDER BY c.user_id, event_type""")),

    // --------------------------------------------------------------- q440
    QDef("q440_polyline_simplify",
      (s, dir) => {
        val thresh = 800L // lattice units
        val pts = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id",
            "(user_id * 47 + event_id * 13) % 36000 AS x",
            "(user_id * 31 + event_id * 7) % 17000 AS y")
          .withColumn("i", row_number().over(Window.partitionBy("user_id")
            .orderBy("ms", "event_id")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id"))
            .cast("long"))
          .where(col("n") >= 4)
        val ends = pts.where(col("i") === 1 || col("i") === col("n"))
          .groupBy("user_id").agg(
            max(when(col("i") === 1, col("x"))).as("ax"),
            max(when(col("i") === 1, col("y"))).as("ay"),
            max(when(col("i") === col("n"), col("x"))).as("bx"),
            max(when(col("i") === col("n"), col("y"))).as("by"))
        val interior = pts.where(col("i") > 1 && col("i") < col("n"))
          .join(ends, "user_id")
          .selectExpr("user_id", "i", "x", "y", "n", "ax", "ay", "bx", "by",
            "(x - ax) * (by - ay) - (y - ay) * (bx - ax) AS cr",
            "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS chord2")
        val w1 = interior
          .withColumn("rk", row_number().over(Window.partitionBy("user_id")
            .orderBy(abs(col("cr")).desc, col("i"))))
          .where(col("rk") === 1)
          .selectExpr("user_id", "i AS wi", "x AS wx", "y AS wy", "n",
            "cr * cr AS dev2", "chord2",
            s"(cr * cr > $thresh * $thresh * chord2) AS keep1")
        val seg = interior.join(
            w1.where(col("keep1"))
              .select(col("user_id"), col("wi"), col("wx"), col("wy"),
                col("n").as("wn")), "user_id")
          .where(col("i") =!= col("wi"))
          .selectExpr("user_id", "i", "x", "y",
            "CASE WHEN i < wi THEN 0 ELSE 1 END AS sg",
            "CASE WHEN i < wi THEN ax ELSE wx END AS sax",
            "CASE WHEN i < wi THEN ay ELSE wy END AS say",
            "CASE WHEN i < wi THEN wx ELSE bx END AS sbx",
            "CASE WHEN i < wi THEN wy ELSE by END AS sby")
          .selectExpr("user_id", "i", "sg",
            "(x - sax) * (sby - say) - (y - say) * (sbx - sax) AS cr2",
            "(sbx - sax) * (sbx - sax) + (sby - say) * (sby - say) AS chord22")
        val w2 = seg
          .withColumn("rk", row_number().over(Window
            .partitionBy("user_id", "sg")
            .orderBy(abs(col("cr2")).desc, col("i"))))
          .where(col("rk") === 1)
          .selectExpr("user_id",
            s"CASE WHEN cr2 * cr2 > $thresh * $thresh * chord22 THEN 1 ELSE 0 END AS kept2")
          .groupBy("user_id").agg(sum("kept2").cast("long").as("k2"))
        w1.join(w2, Seq("user_id"), "left")
          .selectExpr("user_id", "n AS n_points",
            "CAST(keep1 AS BIGINT) AS kept_r1",
            "coalesce(k2, 0) AS kept_r2",
            "2 + CAST(keep1 AS BIGINT) + coalesce(k2, 0) AS n_kept",
            "dev2 AS max_dev2")
          .orderBy("user_id")
      },
      Some("""
        WITH pts0 AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id,
                 (user_id * 47 + event_id * 13) % 36000 AS x,
                 (user_id * 31 + event_id * 7) % 17000 AS y
          FROM events),
        pts AS (
          SELECT user_id, x, y,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ms, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM pts0
          QUALIFY n >= 4),
        ends AS (
          SELECT user_id,
                 max(CASE WHEN i = 1 THEN x END) AS ax,
                 max(CASE WHEN i = 1 THEN y END) AS ay,
                 max(CASE WHEN i = n THEN x END) AS bx,
                 max(CASE WHEN i = n THEN y END) AS by
          FROM pts WHERE i = 1 OR i = n GROUP BY 1),
        interior AS (
          SELECT pts.user_id, i, x, y, n, ax, ay, bx, by,
                 (x - ax) * (by - ay) - (y - ay) * (bx - ax) AS cr,
                 (bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS chord2
          FROM pts JOIN ends ON pts.user_id = ends.user_id
          WHERE i > 1 AND i < n),
        w1 AS (
          SELECT user_id, i AS wi, x AS wx, y AS wy, n,
                 cr * cr AS dev2, chord2,
                 (cr * cr > 800 * 800 * chord2) AS keep1
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY abs(cr) DESC, i) AS rk FROM interior)
          WHERE rk = 1),
        seg AS (
          SELECT interior.user_id, i,
                 CASE WHEN i < wi THEN 0 ELSE 1 END AS sg,
                 (x - CASE WHEN i < wi THEN ax ELSE wx END)
                   * ((CASE WHEN i < wi THEN wy ELSE by END)
                      - (CASE WHEN i < wi THEN ay ELSE wy END))
                 - (y - CASE WHEN i < wi THEN ay ELSE wy END)
                   * ((CASE WHEN i < wi THEN wx ELSE bx END)
                      - (CASE WHEN i < wi THEN ax ELSE wx END)) AS cr2,
                 ((CASE WHEN i < wi THEN wx ELSE bx END)
                   - (CASE WHEN i < wi THEN ax ELSE wx END))
                 * ((CASE WHEN i < wi THEN wx ELSE bx END)
                   - (CASE WHEN i < wi THEN ax ELSE wx END))
                 + ((CASE WHEN i < wi THEN wy ELSE by END)
                   - (CASE WHEN i < wi THEN ay ELSE wy END))
                 * ((CASE WHEN i < wi THEN wy ELSE by END)
                   - (CASE WHEN i < wi THEN ay ELSE wy END)) AS chord22
          FROM interior JOIN (SELECT user_id, wi, wx, wy FROM w1 WHERE keep1)
            w ON interior.user_id = w.user_id
          WHERE i <> wi),
        w2 AS (
          SELECT user_id,
                 sum(CASE WHEN cr2 * cr2 > 800 * 800 * chord22
                     THEN 1 ELSE 0 END) AS k2
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, sg
                  ORDER BY abs(cr2) DESC, i) AS rk FROM seg)
          WHERE rk = 1 GROUP BY 1)
        SELECT w1.user_id, CAST(n AS BIGINT) AS n_points,
               CAST(CASE WHEN keep1 THEN 1 ELSE 0 END AS BIGINT) AS kept_r1,
               CAST(coalesce(k2, 0) AS BIGINT) AS kept_r2,
               CAST(2 + CASE WHEN keep1 THEN 1 ELSE 0 END
                 + coalesce(k2, 0) AS BIGINT) AS n_kept,
               CAST(dev2 AS BIGINT) AS max_dev2
        FROM w1 LEFT JOIN w2 ON w1.user_id = w2.user_id
        ORDER BY w1.user_id""")),

    // --------------------------------------------------------------- q441
    QDef("q441_bitemporal_asof",
      (s, dir) => {
        val ch = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS applied_ms",
            s"(($tsMs) DIV 86400000) + (event_id % 7) AS valid_day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
            "event_id")
        val bounds = ch.agg(
          expr("(min(applied_ms) + max(applied_ms)) DIV 2").as("t_tx"),
          expr("min(valid_day) + 18").as("v_day"))
        val state = ch.crossJoin(broadcast(bounds))
          .where(col("applied_ms") <= col("t_tx") &&
            col("valid_day") <= col("v_day"))
          .groupBy("user_id")
          .agg(max(struct(col("valid_day"), col("applied_ms"),
            col("event_id"), col("cents"))).as("st"))
          .selectExpr("user_id", "st.valid_day AS valid_day",
            "st.cents AS cents")
        state.groupBy(expr("user_id % 10").as("bucket")).agg(
          count(lit(1)).cast("long").as("n_keys"),
          sum("cents").cast("bigint").as("sum_cents"),
          max("valid_day").cast("long").as("max_valid_day"))
          .orderBy("bucket")
      },
      Some("""
        WITH ch AS (
          SELECT user_id, epoch_ms(ts) AS applied_ms,
                 (epoch_ms(ts) // 86400000) + (event_id % 7) AS valid_day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                 event_id
          FROM events),
        bounds AS (
          SELECT (min(applied_ms) + max(applied_ms)) // 2 AS t_tx,
                 min(valid_day) + 18 AS v_day
          FROM ch),
        state AS (
          SELECT user_id,
                 max(struct_pack(valid_day := valid_day,
                                 applied_ms := applied_ms,
                                 event_id := event_id,
                                 cents := cents)) AS st
          FROM ch, bounds
          WHERE applied_ms <= t_tx AND valid_day <= v_day
          GROUP BY 1)
        SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(st.cents) AS BIGINT) AS sum_cents,
               CAST(max(st.valid_day) AS BIGINT) AS max_valid_day
        FROM state GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q442
    QDef("q442_dp_histogram",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val noisy = daily
          .withColumn("u", (pmod(PortableHash.md5Long(
            concat(col("event_type"), lit("|"), col("d")), salt = "dp~"),
            lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0))
          .selectExpr("event_type", "d", "c",
            "CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END AS sgn",
            "abs(u - 0.5) AS a")
          .selectExpr("event_type", "d", "c",
            "CAST(floor(sgn * ln(1.0 - 2.0 * a)) AS BIGINT) AS noise")
          .selectExpr("event_type", "d", "c", "noise",
            "greatest(c + noise, 0) AS noisy_c")
        noisy.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n_cells"),
          sum("c").cast("bigint").as("true_total"),
          sum("noisy_c").cast("bigint").as("noisy_total"),
          sum(abs(col("noisy_c") - col("c"))).cast("bigint").as("l1_error"),
          max(abs(col("noise"))).cast("long").as("max_abs_noise"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        nz AS (
          SELECT event_type, d, c,
                 (CAST(${PortableHash.md5LongSql(
                   "event_type || '|' || CAST(d AS VARCHAR)", "dp~")} % 1000000
                   AS DOUBLE) + 0.5) / 1000000.0 AS u
          FROM daily),
        nz2 AS (
          SELECT event_type, d, c,
                 CAST(floor((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                   * ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT) AS noise
          FROM nz),
        nz3 AS (
          SELECT event_type, d, c, noise,
                 greatest(c + noise, 0) AS noisy_c
          FROM nz2)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(c) AS BIGINT) AS true_total,
               CAST(sum(noisy_c) AS BIGINT) AS noisy_total,
               CAST(sum(abs(noisy_c - c)) AS BIGINT) AS l1_error,
               CAST(max(abs(noise)) AS BIGINT) AS max_abs_noise
        FROM nz3 GROUP BY 1 ORDER BY 1"""))
  )
}
