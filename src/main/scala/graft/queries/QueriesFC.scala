package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 152 — review velocity, epoch field
  * drift, SLO incident streaks, and taste conformity:
  *
  *  - q621: review-momentum census (reference: `operations/reviews.py`
  *    periodic review harvests): per listing, purchase-event rate in
  *    the recent 10-day window vs the trailing 20-day window; rising /
  *    flat / falling classified by integer cross-multiplication
  *    (ratio > 1.2 or < 0.8 — no division), census per nation.
  *  - q622: two-epoch field-drift audit (reference:
  *    `operations/listing_details.py` re-scrape diffs): per event
  *    type, listings present in both timeline halves whose mean value
  *    profile changed (exact integer micro means compared via
  *    cross-multiplication), plus new/gone counts.
  *  - q623: SLO incident census: daily error rate vs a 2% SLO, breach
  *    days grouped into consecutive incidents (gaps-and-islands on the
  *    bounded day census), incident count / longest streak / worst day.
  *  - q624: taste-conformity census: each customer's modal brand
  *    (per-key argmax window) vs their nation's modal brand
  *    (nation-domain argmax), conformity share per nation — the
  *    popularity-fallback coverage question cold-start recommenders ask.
  *
  * Scale shapes: q621/q622 are one conditional-agg shuffle per key then
  * a bounded census; q623 is a day-census window (calendar-bounded);
  * q624 is two argmax passes (per-customer window keyed, per-nation
  * over the bounded brand domain).
  */
object QueriesFC extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q621
    QDef("q621_review_momentum",
      (s, dir) => {
        val cut = millisOf("2024-01-21 00:00:00")
        val counts = t(s, dir, "events")
          .where(col("event_type") === "purchase")
          .selectExpr("user_id", s"$tsMs AS ms")
          .groupBy("user_id")
          .agg(sum(when(col("ms") >= cut, 1L).otherwise(0L)).as("recent_n"),
            sum(when(col("ms") < cut, 1L).otherwise(0L)).as("trailing_n"))
        val classed = counts
          .join(t(s, dir, "customer")
            .selectExpr("c_custkey AS user_id", "c_nationkey"), Seq("user_id"))
          // rate ratio R = (recent/10)/(trailing/20) = 2·recent/trailing;
          // rising ⟺ R > 1.2 ⟺ 20·recent > 12·trailing (integer)
          .selectExpr("c_nationkey",
            """CASE WHEN recent_n * 20 > trailing_n * 12 THEN 'rising'
                    WHEN recent_n * 20 < trailing_n * 8 THEN 'falling'
                    ELSE 'flat' END AS momentum""")
        classed.groupBy("c_nationkey")
          .agg(count(lit(1)).cast("long").as("n_listings"),
            sum(when(col("momentum") === "rising", 1L).otherwise(0L))
              .cast("long").as("n_rising"),
            sum(when(col("momentum") === "falling", 1L).otherwise(0L))
              .cast("long").as("n_falling"),
            sum(when(col("momentum") === "flat", 1L).otherwise(0L))
              .cast("long").as("n_flat"))
          .selectExpr("c_nationkey", "n_listings", "n_rising", "n_falling",
            "n_flat", "n_rising * 10000 DIV n_listings AS rising_bp")
          .orderBy("c_nationkey")
      },
      Some("""
        WITH counts AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN epoch_ms(ts) >=
                   epoch_ms(TIMESTAMP '2024-01-21 00:00:00')
                   THEN 1 ELSE 0 END) AS BIGINT) AS recent_n,
                 CAST(sum(CASE WHEN epoch_ms(ts) <
                   epoch_ms(TIMESTAMP '2024-01-21 00:00:00')
                   THEN 1 ELSE 0 END) AS BIGINT) AS trailing_n
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        classed AS (
          SELECT c_nationkey,
                 CASE WHEN recent_n * 20 > trailing_n * 12 THEN 'rising'
                      WHEN recent_n * 20 < trailing_n * 8 THEN 'falling'
                      ELSE 'flat' END AS momentum
          FROM counts JOIN customer ON user_id = c_custkey)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_listings,
               CAST(sum(CASE WHEN momentum = 'rising' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_rising,
               CAST(sum(CASE WHEN momentum = 'falling' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_falling,
               CAST(sum(CASE WHEN momentum = 'flat' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_flat,
               CAST(sum(CASE WHEN momentum = 'rising' THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS rising_bp
        FROM classed GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q622
    QDef("q622_field_drift",
      (s, dir) => {
        val cut = millisOf("2024-01-16 00:00:00")
        val prof = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type AS et", "user_id",
            "CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS vmic",
            s"CASE WHEN ($tsMs) < ${cut}L THEN 1 ELSE 0 END AS a")
          .groupBy("et", "user_id")
          .agg(sum(when(col("a") === 1, col("vmic")).otherwise(0L))
              .cast("long").as("sa"),
            sum(when(col("a") === 1, 1L).otherwise(0L)).as("na"),
            sum(when(col("a") === 0, col("vmic")).otherwise(0L))
              .cast("long").as("sb"),
            sum(when(col("a") === 0, 1L).otherwise(0L)).as("nb"))
        prof.groupBy("et").agg(
            sum(when(col("na") > 0 && col("nb") > 0, 1L).otherwise(0L))
              .cast("long").as("n_both"),
            // mean profiles differ ⟺ sa·nb ≠ sb·na (exact cross-mult,
            // no division; products stay < 2^63 at ~10⁴× this SF)
            sum(when(col("na") > 0 && col("nb") > 0 &&
              col("sa") * col("nb") =!= col("sb") * col("na"), 1L)
              .otherwise(0L)).cast("long").as("n_changed"),
            sum(when(col("na") === 0 && col("nb") > 0, 1L).otherwise(0L))
              .cast("long").as("n_new"),
            sum(when(col("na") > 0 && col("nb") === 0, 1L).otherwise(0L))
              .cast("long").as("n_gone"))
          .selectExpr("et", "n_both", "n_changed",
            """CASE WHEN n_both > 0 THEN n_changed * 10000 DIV n_both
               ELSE -1 END AS changed_bp""",
            "n_new", "n_gone")
          .orderBy("et")
      },
      Some("""
        WITH prof AS (
          SELECT event_type AS et, user_id,
                 CAST(sum(CASE WHEN epoch_ms(ts) <
                     epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
                   THEN CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
                 CAST(sum(CASE WHEN epoch_ms(ts) <
                     epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
                   THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN epoch_ms(ts) >=
                     epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
                   THEN CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT) ELSE 0 END) AS BIGINT) AS sb,
                 CAST(sum(CASE WHEN epoch_ms(ts) >=
                     epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
                   THEN 1 ELSE 0 END) AS BIGINT) AS nb
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        SELECT et,
               CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN na > 0 AND nb > 0
                 AND sa * nb <> sb * na THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_changed,
               CAST(CASE WHEN sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) > 0
                 THEN CAST(sum(CASE WHEN na > 0 AND nb > 0
                   AND sa * nb <> sb * na THEN 1 ELSE 0 END) AS BIGINT) * 10000
                   // sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END)
                 ELSE -1 END AS BIGINT) AS changed_bp,
               CAST(sum(CASE WHEN na = 0 AND nb > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN na > 0 AND nb = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_gone
        FROM prof GROUP BY 1 ORDER BY et""")),

    // --------------------------------------------------------------- q623
    QDef("q623_slo_incidents",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS day",
            "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e")
          .groupBy("day")
          .agg(count(lit(1)).as("n"), sum("e").cast("long").as("errs"))
          .selectExpr("day", "errs * 10000 DIV n AS err_bp")
        val breach = daily.where(col("err_bp") > 200L)
        // gaps-and-islands on the bounded day census (aggwin by design)
        val w = Window.orderBy("day")
        val isl = breach
          .withColumn("rn", row_number().over(w))
          .selectExpr("day", "err_bp", "day - rn AS grp")
          .groupBy("grp")
          .agg(count(lit(1)).cast("long").as("len"),
            min("day").cast("long").as("start_day"),
            max("err_bp").cast("long").as("peak_bp"))
        isl.agg(
            count(lit(1)).cast("long").as("n_incidents"),
            coalesce(max("len"), lit(0L)).cast("long").as("max_streak_days"),
            coalesce(sum("len"), lit(0L)).cast("long").as("breach_days"),
            coalesce(max("peak_bp"), lit(0L)).cast("long").as("worst_err_bp"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS BIGINT) * 10000 // count(*) AS err_bp
          FROM events GROUP BY 1),
        breach AS (SELECT * FROM daily WHERE err_bp > 200),
        isl AS (
          SELECT day - row_number() OVER (ORDER BY day) AS grp,
                 day, err_bp
          FROM breach),
        inc AS (
          SELECT grp, count(*) AS len, min(day) AS start_day,
                 max(err_bp) AS peak_bp
          FROM isl GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_incidents,
               CAST(coalesce(max(len), 0) AS BIGINT) AS max_streak_days,
               CAST(coalesce(sum(len), 0) AS BIGINT) AS breach_days,
               CAST(coalesce(max(peak_bp), 0) AS BIGINT) AS worst_err_bp
        FROM inc""")),

    // --------------------------------------------------------------- q624
    QDef("q624_taste_conformity",
      (s, dir) => {
        val cb = t(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
            expr("o_orderkey = l_orderkey"))
          .join(t(s, dir, "part").selectExpr("p_partkey AS l_partkey", "p_brand"),
            Seq("l_partkey"))
          .join(t(s, dir, "customer")
            .selectExpr("c_custkey AS o_custkey", "c_nationkey"), Seq("o_custkey"))
          .groupBy("c_nationkey", "o_custkey", "p_brand")
          .agg(count(lit(1)).as("cnt"))
        // no cache: both argmax passes consume cb's (nation, cust,
        // brand) exchange and Catalyst reuses it (ReusedExchange), so
        // the cache write + eager count job were pure overhead (r11;
        // the q616-r8 lesson)
        // argmax (cnt desc, brand asc) as min(struct(-cnt, brand)) — an
        // aggregate with map-side partials instead of a row_number
        // window's per-partition sort (r11, the q45/q616 pattern; shaved
        // the last ~0.5 s that kept this query flirting with the 2 s
        // floor)
        val personal = cb
          .groupBy("c_nationkey", "o_custkey")
          .agg(min(struct((-col("cnt")).as("nc"), col("p_brand"))).as("m"))
          .select(col("c_nationkey"), col("o_custkey"),
            col("m.p_brand").as("my_brand"))
        val national = cb.groupBy("c_nationkey", "p_brand")
          .agg(sum("cnt").as("ncnt"))
          .groupBy("c_nationkey")
          .agg(min(struct((-col("ncnt")).as("nn"), col("p_brand"))).as("m"))
          .select(col("c_nationkey"), col("m.p_brand").as("top_brand"))
        personal.join(broadcast(national), Seq("c_nationkey"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).cast("long").as("n_cust"),
            sum(when(col("my_brand") === col("top_brand"), 1L).otherwise(0L))
              .cast("long").as("n_conform"),
            max("top_brand").as("top_brand"))
          .selectExpr("c_nationkey", "top_brand", "n_cust", "n_conform",
            "n_conform * 10000 DIV n_cust AS conform_bp")
          .orderBy("c_nationkey")
      },
      Some("""
        WITH cb AS (
          SELECT c_nationkey, o_custkey, p_brand, count(*) AS cnt
          FROM orders
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN part ON p_partkey = l_partkey
          JOIN customer ON c_custkey = o_custkey
          GROUP BY 1, 2, 3),
        personal AS (
          SELECT c_nationkey, o_custkey, p_brand AS my_brand
          FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                  ORDER BY cnt DESC, p_brand) AS rn FROM cb)
          WHERE rn = 1),
        national AS (
          SELECT c_nationkey, p_brand AS top_brand
          FROM (SELECT c_nationkey, p_brand, sum(cnt) AS ncnt,
                       row_number() OVER (PARTITION BY c_nationkey
                         ORDER BY sum(cnt) DESC, p_brand) AS rn
                FROM cb GROUP BY 1, 2)
          WHERE rn = 1)
        SELECT p.c_nationkey, n.top_brand,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(CASE WHEN p.my_brand = n.top_brand THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_conform,
               CAST(sum(CASE WHEN p.my_brand = n.top_brand THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS conform_bp
        FROM personal p JOIN national n ON p.c_nationkey = n.c_nationkey
        GROUP BY 1, 2 ORDER BY 1"""))
  )
}
