package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 8:
  *
  *  - q84: Pearson correlation + OLS regression per group from EXACT
  *    decimal component sums (n, Σx, Σy, Σx², Σy², Σxy) — the one-pass
  *    mergeable form (map-side combine, no second pass). The final double
  *    formula is written with identical op order in both engines, so the
  *    IEEE arithmetic is bit-identical before the defensive round().
  *  - q85: geohash encoding via pure-integer bit interleave over the
  *    synthetic milli-degree coordinates (the second standard geo index
  *    besides quadkey; integer math → exact in both engines).
  *  - q91: task retry/backoff accounting — exponential backoff schedule
  *    (integer shifts), premature-retry detection via lag, give-up rule.
  *    Reference analog: UBDCTask retry bookkeeping (models.py:629).
  *  - q98: KMV (k-minimum-values) distinct sketch vs exact — the third
  *    portable sketch besides HLL (q17) and CMS (q96): keep the k smallest
  *    60-bit hashes per group, estimate |D| ≈ (k-1)·2^60 / h_(k).
  */
object QueriesO extends QueryPack {
  import Q._

  /** 2^60 — Md5Long's hash space (exactly representable as a double). */
  private val Pow60 = "1152921504606846976"

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q84
    QDef("q84_stats_corr",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
          .select(col("l_returnflag"), col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
            col("sxx").cast("double").as("sxxd"), col("syy").cast("double").as("syyd"),
            col("sxy").cast("double").as("sxyd"))
          .withColumn("cov", col("nd") * col("sxyd") - col("sxd") * col("syd"))
          .withColumn("varx", col("nd") * col("sxxd") - col("sxd") * col("sxd"))
          .withColumn("vary", col("nd") * col("syyd") - col("syd") * col("syd"))
          .select(col("l_returnflag"), col("n"),
            round(col("cov") / (sqrt(col("varx")) * sqrt(col("vary"))), 6).as("corr6"),
            round(col("cov") / col("varx"), 6).as("slope6"),
            round((col("syd") - col("cov") / col("varx") * col("sxd")) / col("nd"), 4)
              .as("intercept4"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH comp AS (
          SELECT l_returnflag, count(*) AS n,
                 sum(CAST(l_quantity AS $decSql)) AS sx,
                 sum(CAST(l_extendedprice AS $decSql)) AS sy,
                 sum(CAST(l_quantity AS $decSql) * CAST(l_quantity AS $decSql)) AS sxx,
                 sum(CAST(l_extendedprice AS $decSql) * CAST(l_extendedprice AS $decSql)) AS syy,
                 sum(CAST(l_quantity AS $decSql) * CAST(l_extendedprice AS $decSql)) AS sxy
          FROM lineitem GROUP BY 1),
        d AS (
          SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
                 CAST(sxy AS DOUBLE) AS sxyd
          FROM comp),
        v AS (
          SELECT l_returnflag, n, nd, sxd, syd,
                 nd * sxyd - sxd * syd AS cov,
                 nd * sxxd - sxd * sxd AS varx,
                 nd * syyd - syd * syd AS vary
          FROM d)
        SELECT l_returnflag, n,
               round(cov / (sqrt(varx) * sqrt(vary)), 6) AS corr6,
               round(cov / varx, 6) AS slope6,
               round((syd - cov / varx * sxd) / nd, 4) AS intercept4
        FROM v ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- q85
    // 6-char geohash = 30 bits: 15 lng (even positions from the MSB) + 15
    // lat, interleaved lng-first. All arithmetic on BIGINT milli-degrees —
    // no floating point anywhere, both engines exact. Spec checks the
    // interleave against an independent bisection implementation.
    QDef("q85_geohash", {
      (s, dir) =>
        val cells = t(s, dir, "events").selectExpr(
            "event_id",
            "((user_id * 47 + event_id * 13) % 36000) * 10 - 180000 + 5 AS lng_e3",
            "((user_id * 31 + event_id * 7) % 17000) * 10 - 85000 + 5 AS lat_e3")
          .withColumn("ix", expr("(lng_e3 + 180000) * 32768 DIV 360000"))
          .withColumn("iy", expr("(lat_e3 + 90000) * 32768 DIV 180000"))
        cells.withColumn("g", expr(GeoHashExpr.interleave("ix", "iy", "DIV")))
          .withColumn("geohash6", expr(GeoHashExpr.base32("g", "DIV")))
          .groupBy("geohash6")
          .agg(count(lit(1)).as("n_points"), min("event_id").as("first_event"))
          .orderBy(col("n_points").desc, col("geohash6"))
          .limit(30)
      },
      Some(s"""
        WITH pts AS (
          SELECT event_id,
                 ((user_id * 47 + event_id * 13) % 36000) * 10 - 180000 + 5 AS lng_e3,
                 ((user_id * 31 + event_id * 7) % 17000) * 10 - 85000 + 5 AS lat_e3
          FROM events),
        cells AS (
          SELECT event_id,
                 (lng_e3 + 180000) * 32768 // 360000 AS ix,
                 (lat_e3 + 90000) * 32768 // 180000 AS iy
          FROM pts),
        bits AS (
          SELECT event_id, ${GeoHashExpr.interleave("ix", "iy", "//")} AS g FROM cells),
        hashed AS (
          SELECT event_id, ${GeoHashExpr.base32("g", "//")} AS geohash6 FROM bits)
        SELECT geohash6, count(*) AS n_points, min(event_id) AS first_event
        FROM hashed GROUP BY 1
        ORDER BY n_points DESC, geohash6
        LIMIT 30""")),

    // ---------------------------------------------------------------- q91
    QDef("q91_retry_backoff",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val att = t(s, dir, "events").filter(col("event_type") === "error")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms")
          .withColumn("attempt", row_number().over(w))
          .withColumn("backoff_ms",
            expr("1000 * shiftleft(CAST(1 AS BIGINT), CAST(least(attempt, 6) AS INT))"))
          .withColumn("prev_due", lag(col("ts_ms") + col("backoff_ms"), 1).over(w))
          .withColumn("premature", col("prev_due").isNotNull && col("ts_ms") < col("prev_due"))
        att.groupBy("user_id").agg(
            count(lit(1)).as("n_fail"),
            sum(when(col("premature"), 1L).otherwise(0L)).cast("bigint").as("n_premature"),
            expr("max(backoff_ms) DIV 1000").as("max_backoff_s"),
            (max("attempt") >= 10).as("gave_up"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH att AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                   AS attempt
          FROM events WHERE event_type = 'error'),
        b AS (
          SELECT *, 1000 * (1 << least(attempt, 6)) AS backoff_ms FROM att),
        d AS (
          SELECT *, lag(ts_ms + backoff_ms) OVER
                   (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_due
          FROM b)
        SELECT user_id, count(*) AS n_fail,
               CAST(count(CASE WHEN prev_due IS NOT NULL AND ts_ms < prev_due THEN 1 END)
                 AS BIGINT) AS n_premature,
               max(backoff_ms) // 1000 AS max_backoff_s,
               max(attempt) >= 10 AS gave_up
        FROM d GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q98
    // KMV: per group keep the k=16 smallest 60-bit hashes of the distinct
    // keys; h_(k) estimates density → |D| ≈ (k-1)·2^60 / h_(k). Groups
    // with fewer than k distinct keys report the exact count (standard
    // small-range rule). floor() before the BIGINT cast on BOTH sides —
    // DuckDB CAST(double AS BIGINT) rounds where Spark truncates.
    QDef("q98_kmv_distinct",
      (s, dir) => {
        val k = 16
        val pairs = t(s, dir, "events").select("event_type", "user_id").distinct()
          .withColumn("h", PortableHash.md5Long(col("user_id").cast("string"), salt = "kmv~"))
        val ranked = pairs.withColumn("rn",
          row_number().over(Window.partitionBy("event_type").orderBy("h")))
        val hk = ranked.filter(col("rn") === k).select(col("event_type"), col("h").as("hk"))
        pairs.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
          .join(hk, Seq("event_type"), "left_outer")
          .withColumn("n_kmv",
            expr(s"CAST(coalesce(floor(${k - 1}.0 * $Pow60 / hk), CAST(n_exact AS DOUBLE)) AS BIGINT)"))
          .withColumn("err_bp", expr("abs(n_kmv - n_exact) * 10000 DIV n_exact"))
          .select("event_type", "n_exact", "n_kmv", "err_bp")
          .orderBy("event_type")
      },
      Some(s"""
        WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
        hashed AS (
          SELECT event_type,
                 ${PortableHash.md5LongSql("CAST(user_id AS VARCHAR)", salt = "kmv~")} AS h
          FROM pairs),
        ranked AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM hashed),
        hk AS (SELECT event_type, h AS hk FROM ranked WHERE rn = 16),
        exact AS (SELECT event_type, count(*) AS n_exact FROM pairs GROUP BY 1),
        est AS (
          SELECT e.event_type, e.n_exact,
                 CAST(coalesce(floor(15.0 * $Pow60 / k.hk), CAST(e.n_exact AS DOUBLE))
                   AS BIGINT) AS n_kmv
          FROM exact e LEFT JOIN hk k ON e.event_type = k.event_type)
        SELECT event_type, n_exact, n_kmv,
               abs(n_kmv - n_exact) * 10000 // n_exact AS err_bp
        FROM est ORDER BY event_type"""))
  )
}

/** Twin-dialect geohash expression fragments (Spark `DIV` / DuckDB `//`).
  * Integer-only: bit tests via division+modulo so the same text works in
  * both engines (no shift-operator dialect differences). */
private[queries] object GeoHashExpr {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 30-bit interleave of two 15-bit cell indices, lng (ix) first. */
  def interleave(ix: String, iy: String, div: String): String =
    (0 until 15).map { b =>
      s"(($ix $div ${1L << b}) % 2) * ${1L << (2 * b + 1)} + " +
        s"(($iy $div ${1L << b}) % 2) * ${1L << (2 * b)}"
    }.mkString(" + ")

  /** 6 base32 chars from the 30-bit code (5 bits per char, MSB first). */
  def base32(g: String, div: String): String =
    (0 until 6).map { i =>
      s"substr('$Alphabet', CAST(($g $div ${1L << (25 - 5 * i)}) % 32 AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")")
}
