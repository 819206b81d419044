package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 23:
  *
  *  - q133: 2×2 chi-square A/B test per day-of-week — variant by user-id
  *    parity, outcome = purchased-or-not. Cell counts are exact BIGINTs;
  *    the statistic is computed with ONE fixed IEEE double op order
  *    (identical in both engines on identical inputs) and floor-quantized
  *    to micro-units per the engine-parity lesson.
  *  - q134: CUSUM changepoint — per event_type, the day maximizing
  *    |n·cumsum_i − i·total| over the daily count series, all-BIGINT
  *    (scaled by n to avoid division). Drift/regime-shift detection on
  *    collection volumes.
  *  - q135: weighted median — per returnflag, the price at which the
  *    running quantity-weight first reaches half the total (exact integer
  *    rank on cents; deterministic tiebreak).
  *  - q136: compaction planning — order-preserving bin packing of
  *    documents into ~2 KiB output "files" per source partition
  *    (bin = bytes-before DIV target, one window cumsum). The lakehouse
  *    small-files compaction planner shape.
  *  - q137: last-touch attribution — each purchase attributed to the same
  *    user's most recent click within 72 h, via an encoded (ts, channel)
  *    BIGINT running max over one window — no self-join, exactly the
  *    scale-path (channel = props.k mod 5, −1 = unattributed).
  */
object QueriesAD extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q133_chi2_ab",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .selectExpr(
            s"((($tsMs) DIV 86400000) + 4) % 7 AS dow",
            "user_id % 2 AS variant",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv")
          .groupBy("dow")
          .agg(
            sum(expr("CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END")).as("a"),
            sum(expr("CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END")).as("b"),
            sum(expr("CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END")).as("c"),
            sum(expr("CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END")).as("d"))
        cells.selectExpr("dow", "a", "b", "c", "d",
            """CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0 THEN NULL
               ELSE CAST(floor(
                 CAST(a+b+c+d AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)
                   * CAST(a*d - b*c AS DOUBLE)
                   / CAST(a+b AS DOUBLE) / CAST(c+d AS DOUBLE)
                   / CAST(a+c AS DOUBLE) / CAST(b+d AS DOUBLE)
                   * 1000000) AS BIGINT) END AS chi2_micro""")
          .orderBy("dow")
      },
      Some("""
        WITH cells AS (
          SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
                 CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM events GROUP BY 1)
        SELECT dow, a, b, c, d,
               CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0 THEN NULL
               ELSE CAST(floor(
                 CAST(a+b+c+d AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)
                   * CAST(a*d - b*c AS DOUBLE)
                   / CAST(a+b AS DOUBLE) / CAST(c+d AS DOUBLE)
                   / CAST(a+c AS DOUBLE) / CAST(b+d AS DOUBLE)
                   * 1000000) AS BIGINT) END AS chi2_micro
        FROM cells ORDER BY dow""")),

    QDef("q134_cusum_changepoint",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val minDay = ev.agg(min(expr(s"($tsMs) DIV 86400000")).as("d0"))
        val daily = ev
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .crossJoin(broadcast(minDay))
          .selectExpr("event_type", "day - d0 AS rel_day")
          .groupBy("event_type", "rel_day").agg(count(lit(1)).as("cnt"))
        val wOrd = Window.partitionBy("event_type").orderBy("rel_day")
        val wAll = Window.partitionBy("event_type")
        val dev = daily
          .withColumn("i", row_number().over(wOrd))
          .withColumn("cum", sum("cnt").over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("tot", sum("cnt").over(wAll))
          .withColumn("dev", abs(col("n") * col("cum") - col("i") * col("tot")))
        val wPick = Window.partitionBy("event_type")
          .orderBy(col("dev").desc, col("rel_day"))
        dev.withColumn("rk", row_number().over(wPick))
          .where(col("rk") === 1)
          .selectExpr("event_type", "CAST(n AS BIGINT) AS n_days",
            "rel_day AS change_day", "dev AS max_dev",
            "CAST(sign(n * cum - i * tot) AS BIGINT) AS direction")
          .orderBy("event_type")
      },
      Some("""
        WITH d0 AS (SELECT min(epoch_ms(ts) // 86400000) AS d0 FROM events),
        daily AS (
          SELECT event_type,
                 (epoch_ms(ts) // 86400000) - d0.d0 AS rel_day,
                 count(*) AS cnt
          FROM events, d0 GROUP BY 1, 2),
        w AS (
          SELECT event_type, rel_day, cnt,
                 row_number() OVER (PARTITION BY event_type ORDER BY rel_day) AS i,
                 CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY rel_day) AS BIGINT) AS cum,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                 CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
          FROM daily),
        dev AS (
          SELECT *, abs(n * cum - i * tot) AS dev,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(n * cum - i * tot) DESC, rel_day) AS rk
          FROM w)
        SELECT event_type, n AS n_days, rel_day AS change_day, dev AS max_dev,
               CAST(sign(n * cum - i * tot) AS BIGINT) AS direction
        FROM dev WHERE rk = 1 ORDER BY event_type""")),

    QDef("q135_weighted_median",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi")
        val wOrd = Window.partitionBy("l_returnflag")
          .orderBy(col("pc"), col("l_orderkey"), col("l_linenumber"))
        val wAll = Window.partitionBy("l_returnflag")
        li.withColumn("cumw", sum("qi").over(wOrd))
          .withColumn("totw", sum("qi").over(wAll))
          .groupBy("l_returnflag")
          .agg(max("totw").as("total_weight"),
            min(when(expr("2 * cumw >= totw"), col("pc"))).as("wmedian_cents"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH li AS (
          SELECT l_returnflag, l_orderkey, l_linenumber,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi
          FROM lineitem),
        w AS (
          SELECT l_returnflag, pc,
                 CAST(sum(qi) OVER (PARTITION BY l_returnflag
                   ORDER BY pc, l_orderkey, l_linenumber) AS BIGINT) AS cumw,
                 CAST(sum(qi) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
          FROM li)
        SELECT l_returnflag, max(totw) AS total_weight,
               min(CASE WHEN 2 * cumw >= totw THEN pc END) AS wmedian_cents
        FROM w GROUP BY 1 ORDER BY 1""")),

    QDef("q136_compaction_bins",
      (s, dir) => {
        val target = 2048L
        val w = Window.partitionBy("source").orderBy("doc_id")
        val binned = t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("before", coalesce(sum("n_chars")
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("bin", expr(s"before DIV $target"))
        val perBin = binned.groupBy("source", "bin")
          .agg(count(lit(1)).as("n_files"), sum("n_chars").as("bytes"))
        perBin.groupBy("source")
          .agg(sum("n_files").cast("bigint").as("n_files"),
            sum("bytes").cast("bigint").as("total_bytes"),
            count(lit(1)).as("n_bins"),
            max("bytes").cast("bigint").as("max_bin_bytes"),
            min("bytes").cast("bigint").as("min_bin_bytes"))
          .withColumn("avg_fill_bp",
            expr(s"total_bytes * 10000 DIV (n_bins * $target)"))
          .orderBy("source")
      },
      Some("""
        WITH b AS (
          SELECT source, doc_id, n_chars,
                 CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) // 2048 AS bin
          FROM documents),
        pb AS (
          SELECT source, bin, count(*) AS n_files,
                 CAST(sum(n_chars) AS BIGINT) AS bytes
          FROM b GROUP BY 1, 2)
        SELECT source, CAST(sum(n_files) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               count(*) AS n_bins,
               CAST(max(bytes) AS BIGINT) AS max_bin_bytes,
               CAST(min(bytes) AS BIGINT) AS min_bin_bytes,
               CAST(sum(bytes) AS BIGINT) * 10000 // (count(*) * 2048) AS avg_fill_bp
        FROM pb GROUP BY 1 ORDER BY 1""")),

    QDef("q137_attribution",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
          .selectExpr("user_id", "event_type", "event_id", s"$tsMs AS ts_ms",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc",
            "CAST(get_json_object(props, '$.k') AS BIGINT) % 5 AS ch")
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("code",
            max(when(col("event_type") === "click",
              expr("ts_ms * 8 + ch"))).over(w))
          .where(col("event_type") === "purchase")
          .selectExpr("vc",
            """CASE WHEN code IS NOT NULL AND code DIV 8 >= ts_ms - 259200000
               THEN code % 8 ELSE -1 END AS channel""")
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"),
            sum("vc").cast("bigint").as("revenue_cents"))
          .orderBy("channel")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS ch
          FROM events WHERE event_type IN ('click', 'purchase')),
        coded AS (
          SELECT *,
                 max(CASE WHEN event_type = 'click' THEN ts_ms * 8 + ch END)
                   OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS code
          FROM ev)
        SELECT CASE WHEN code IS NOT NULL AND code // 8 >= ts_ms - 259200000
                 THEN code % 8 ELSE -1 END AS channel,
               count(*) AS n_purchases,
               CAST(sum(vc) AS BIGINT) AS revenue_cents
        FROM coded WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1"""))
  )
}
