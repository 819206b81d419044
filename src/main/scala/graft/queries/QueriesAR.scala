package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 37 — distribution + robust-trend ops:
  *
  *  - q175: per-group MODE (most frequent value, deterministic smallest-
  *    value tiebreak) via one hash agg + struct-max argmax — no sort
  *    window, so the reduction is map-side partial and scale-flat.
  *  - q176: exact distribution function — cume_dist and percent_rank in
  *    integer basis points from cumulative histogram counts (rank math on
  *    BIGINT, zero FP). The windowed form of q11b's rank quantiles.
  *  - q177: Theil–Sen robust slope of daily event counts per type —
  *    median of all pairwise slopes (sign-normalized integer micro units,
  *    exact lower-median rank selection). Pairs are over the BOUNDED
  *    per-type daily aggregate (~31 rows), never the raw stream: the
  *    O(days²) stage is constant-size however big the fact table gets.
  *  - q178: bitmap-index day-over-day active-user overlap — user sets
  *    packed into 63-bit words (`user_id DIV 63` → word shard, one
  *    BIGINT per shard via bit_or), consecutive-day intersection via
  *    bit_count(a & b). The roaring-bitmap shape: set ops become
  *    word-sharded integer ops, mergeable by OR, linear in words not
  *    members. Bits stay in 0..62 so no engine hits BIGINT shift
  *    overflow.
  *
  * Reference analog: mode/cume_dist = admin price/quantity distribution
  * reporting; Theil–Sen = robust harvest-volume trend (q174's OLS is
  * outlier-sensitive; Theil–Sen survives a burst day); bitmap overlap =
  * day-over-day listing-population continuity (the q82 epoch diff, as a
  * bitmap-index scale path).
  */
object QueriesAR extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q175_mode",
      (s, dir) => {
        val li = t(s, dir, "lineitem").where(col("l_quantity").isNotNull)
          .selectExpr("l_returnflag",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
        li.groupBy("l_returnflag", "qty").agg(count(lit(1)).as("cnt"))
          .groupBy("l_returnflag")
          .agg(max(struct(col("cnt").as("cnt"), (lit(0L) - col("qty")).as("negq"))).as("m"),
            sum("cnt").cast("bigint").as("n_rows"),
            count(lit(1)).as("n_distinct"))
          .selectExpr("l_returnflag", "-m.negq AS mode_qty", "m.cnt AS mode_cnt",
            "n_rows", "n_distinct")
          .orderBy("l_returnflag")
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                 count(*) AS cnt
          FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        r AS (
          SELECT l_returnflag, qty, cnt,
                 row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY cnt DESC, qty) AS rn,
                 CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows,
                 count(*) OVER (PARTITION BY l_returnflag) AS n_distinct
          FROM c)
        SELECT l_returnflag, qty AS mode_qty, CAST(cnt AS BIGINT) AS mode_cnt,
               n_rows, CAST(n_distinct AS BIGINT) AS n_distinct
        FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    QDef("q176_cume_dist",
      (s, dir) => {
        val hist = t(s, dir, "lineitem").where(col("l_quantity").isNotNull)
          .selectExpr("l_returnflag",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
          .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("cnt"))
        val wc = Window.partitionBy("l_returnflag").orderBy("qty")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("cum", sum("cnt").over(wc))
          .withColumn("n", sum("cnt").over(Window.partitionBy("l_returnflag")))
          .selectExpr("l_returnflag", "qty", "cnt",
            "cum * 10000 DIV n AS cume_bp",
            "CASE WHEN n > 1 THEN (cum - cnt) * 10000 DIV (n - 1) ELSE 0 END AS prank_bp")
          .orderBy("l_returnflag", "qty")
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                 count(*) AS cnt
          FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        w AS (
          SELECT l_returnflag, qty, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
          FROM c)
        SELECT l_returnflag, qty, CAST(cnt AS BIGINT) AS cnt,
               cum * 10000 // n AS cume_bp,
               CASE WHEN n > 1 THEN (cum - cnt) * 10000 // (n - 1) ELSE 0 END AS prank_bp
        FROM w ORDER BY l_returnflag, qty""")),

    QDef("q177_theilsen",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") && col("b.d") > col("a.d"))
          .selectExpr("a.event_type AS event_type",
            "(b.y - a.y) * 1000000 AS num", "b.d - a.d AS den")
          .selectExpr("event_type",
            "CASE WHEN num >= 0 THEN num DIV den ELSE -((-num) DIV den) END AS slope_micro")
        pairs
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("slope_micro")))
          .withColumn("m", count(lit(1)).over(Window.partitionBy("event_type")))
          .where(expr("rn = (m + 1) DIV 2"))
          .selectExpr("event_type", "m AS n_pairs",
            "slope_micro AS theilsen_slope_micro")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.event_type AS event_type,
                 (b.y - a.y) * 1000000 AS num, b.d - a.d AS den
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND b.d > a.d),
        slopes AS (
          SELECT event_type,
                 CASE WHEN num >= 0 THEN num // den
                   ELSE -((-num) // den) END AS slope_micro
          FROM pairs),
        r AS (
          SELECT event_type, slope_micro,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY slope_micro) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS m
          FROM slopes)
        SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
               slope_micro AS theilsen_slope_micro
        FROM r WHERE rn = (m + 1) // 2 ORDER BY event_type""")),

    QDef("q178_bitmap_overlap",
      (s, dir) => {
        val words = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS day", "user_id DIV 63 AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)) AS m")
          .groupBy("day", "w").agg(expr("bit_or(m)").as("bits"))
        val sizes = words
          .selectExpr("day", "bit_count(bits) AS nb")
          .groupBy("day").agg(sum("nb").cast("bigint").as("actives"))
        val inter = words.as("c").join(words.as("p"),
            col("c.w") === col("p.w") && col("c.day") === col("p.day") + 1)
          .selectExpr("c.day AS day", "bit_count(c.bits & p.bits) AS ib")
          .groupBy("day").agg(sum("ib").cast("bigint").as("overlap"))
        sizes.as("s")
          .join(sizes.selectExpr("day + 1 AS day", "actives AS prev_actives").as("pp"),
            Seq("day"))
          .join(inter, Seq("day"), "left")
          .selectExpr("day", "actives", "prev_actives",
            "coalesce(overlap, 0) AS overlap",
            "coalesce(overlap, 0) * 10000 DIV (actives + prev_actives - coalesce(overlap, 0)) AS jaccard_bp")
          .orderBy("day")
      },
      Some("""
        WITH base AS (
          SELECT epoch_ms(ts) // 86400000 AS day, user_id // 63 AS w,
                 CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT) AS m
          FROM events),
        words AS (SELECT day, w, bit_or(m) AS bits FROM base GROUP BY 1, 2),
        sizes AS (
          SELECT day, CAST(sum(bit_count(bits)) AS BIGINT) AS actives
          FROM words GROUP BY 1),
        inter AS (
          SELECT c.day AS day,
                 CAST(sum(bit_count(c.bits & p.bits)) AS BIGINT) AS overlap
          FROM words c JOIN words p ON c.w = p.w AND c.day = p.day + 1
          GROUP BY 1)
        SELECT s.day, s.actives, p.actives AS prev_actives,
               coalesce(i.overlap, 0) AS overlap,
               coalesce(i.overlap, 0) * 10000
                 // (s.actives + p.actives - coalesce(i.overlap, 0)) AS jaccard_bp
        FROM sizes s
        JOIN sizes p ON s.day = p.day + 1
        LEFT JOIN inter i ON i.day = s.day
        ORDER BY s.day"""))
  )
}
