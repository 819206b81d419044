package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 29:
  *
  *  - q155: INCREMENTAL dedup — the continuous-ingest shape: a 20% "new
  *    batch" (portable-hash split) is LSH-probed against the 80% corpus
  *    ONLY (cross-set candidate pairs; intra-batch and intra-corpus pairs
  *    dropped), then exact-Jaccard verified. What a scraper pipeline runs
  *    per harvest cycle; at 100 TB the corpus signature table is the
  *    persisted index, only the batch is re-signed.
  *  - q156: Z-ORDER layout effectiveness — bit-interleave (price, qty)
  *    into a 16-bit Morton key (ONE shared integer formula string for
  *    both engines), assign 64 files by z-range vs naive row-order, and
  *    compare per-file min/max spreads: the Delta/Iceberg OPTIMIZE
  *    ZORDER decision metric, computed exactly.
  *  - q157: lateness profile — per-user event-time regression vs arrival
  *    order (running max over ingest sequence), bucketed into exponential
  *    lateness bands: the empirical watermark-delay histogram that sizes
  *    `withWatermark` in the streaming path. No global sort — per-key
  *    windows + one hash aggregation.
  *  - q158: robust z-score anomalies — |x − med|·2 > 7·MAD (≈3.5σ) per
  *    event_type, rolled up per day: outlier rate monitoring on exact
  *    integer arithmetic (composes q131's rank-median machinery).
  */
object QueriesAJ extends QueryPack {
  import Q._

  /** 16-bit Morton interleave of two 8-bit ints — same text works as a
    * Spark expr and DuckDB SQL (>>, &, << on BIGINT in both). */
  private def zSql(p: String, q: String): String =
    (0 until 8).map(b =>
      s"((($p >> $b) & 1) << ${2 * b + 1}) + ((($q >> $b) & 1) << ${2 * b})")
      .mkString("(", " + ", ")")

  def defs: Seq[QDef] = Seq(

    QDef("q155_incremental_dedup",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        def isBatch(idCol: String) =
          pmod(PortableHash.md5Long(col(idCol), salt = "inc~"), lit(5L)) === 0
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
            "doc_id", "sig", nHashes = 6, bandSize = 2)
          .where(isBatch("id_a") =!= isBatch("id_b"))
          .select( // orient: batch doc first
            when(isBatch("id_a"), col("id_a")).otherwise(col("id_b")).as("bid"),
            when(isBatch("id_a"), col("id_b")).otherwise(col("id_a")).as("cid"))
        val a = docs.select(col("doc_id").as("bid"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("cid"), col("sh").as("sh_b"))
        val scored = pairs.join(a, "bid").join(b, "cid")
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
        val w = Window.partitionBy("bid").orderBy(col("jac_bp").desc, col("cid"))
        scored.withColumn("rk", row_number().over(w))
          .groupBy("bid")
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("jac_bp") >= 6000, 1L).otherwise(0L))
              .cast("bigint").as("n_strong"),
            max(when(col("rk") === 1, col("jac_bp"))).as("best_jac_bp"),
            max(when(col("rk") === 1, col("cid"))).as("best_match"))
          .orderBy(col("n_strong").desc, col("bid"))
          .limit(25)
      },
      Some {
        val bs = s"${PortableHash.md5LongSql("CAST(id_a AS VARCHAR)", "inc~")} % 5 = 0"
        def side(idE: String) =
          s"${PortableHash.md5LongSql(s"CAST($idE AS VARCHAR)", "inc~")} % 5 = 0"
        s"""
        ${QueriesC.candidatePairsSql},
        xp AS (
          SELECT CASE WHEN $bs THEN id_a ELSE id_b END AS bid,
                 CASE WHEN $bs THEN id_b ELSE id_a END AS cid
          FROM pairs
          WHERE (${side("id_a")}) <> (${side("id_b")})),
        scored AS (
          SELECT xp.bid, xp.cid,
                 ${Dedup.jaccardBpSql("da.sh", "db.sh")} AS jac_bp
          FROM xp JOIN docs da ON da.doc_id = xp.bid
                  JOIN docs db ON db.doc_id = xp.cid),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY bid
                   ORDER BY jac_bp DESC, cid) AS rk
          FROM scored)
        SELECT bid, count(*) AS n_cand,
               CAST(sum(CASE WHEN jac_bp >= 6000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_strong,
               max(CASE WHEN rk = 1 THEN jac_bp END) AS best_jac_bp,
               max(CASE WHEN rk = 1 THEN cid END) AS best_match
        FROM rk GROUP BY 1
        ORDER BY n_strong DESC, bid LIMIT 25"""
      }),

    QDef("q156_zorder_layout",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_linenumber",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi")
        val mx = li.agg(max("pc").as("maxp"), max("qi").as("maxq"),
          max("l_orderkey").as("maxk"))
        // naive layout = ingestion order ≈ key order: a key-range file
        // assignment, no global window needed (scale-safe on both sides)
        val coded = li.crossJoin(broadcast(mx))
          .withColumn("p8", expr("pc * 256 DIV (maxp + 1)"))
          .withColumn("q8", expr("qi * 256 DIV (maxq + 1)"))
          .withColumn("z", expr(zSql("p8", "q8")))
          .withColumn("zfile", expr("z * 64 DIV 65536"))
          .withColumn("nfile", expr("l_orderkey * 64 DIV (maxk + 1)"))
        def spread(fileCol: String, label: String) = coded
          .groupBy(fileCol)
          .agg((max("pc") - min("pc")).as("sp"), (max("qi") - min("qi")).as("sq"))
          .agg(count(lit(1)).cast("bigint").as(s"${label}_files"),
            sum("sp").cast("bigint").as(s"${label}_price_spread"),
            sum("sq").cast("bigint").as(s"${label}_qty_spread"))
        spread("zfile", "z").crossJoin(spread("nfile", "naive"))
          .selectExpr("z_files", "z_price_spread", "z_qty_spread",
            "naive_files", "naive_price_spread", "naive_qty_spread",
            "z_price_spread * 10000 DIV naive_price_spread AS price_ratio_bp",
            "z_qty_spread * 10000 DIV naive_qty_spread AS qty_ratio_bp")
      },
      Some {
        val z = zSql("p8", "q8")
        s"""
        WITH li AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi
          FROM lineitem),
        mx AS (SELECT max(pc) AS maxp, max(qi) AS maxq,
                      max(l_orderkey) AS maxk FROM li),
        coded AS (
          SELECT pc, qi,
                 pc * 256 // (maxp + 1) AS p8, qi * 256 // (maxq + 1) AS q8,
                 l_orderkey * 64 // (maxk + 1) AS nfile
          FROM li, mx),
        zc AS (
          SELECT pc, qi, nfile,
                 ($z) * 64 // 65536 AS zfile
          FROM coded),
        zs AS (
          SELECT count(*) AS z_files,
                 CAST(sum(sp) AS BIGINT) AS z_price_spread,
                 CAST(sum(sq) AS BIGINT) AS z_qty_spread
          FROM (SELECT zfile, max(pc) - min(pc) AS sp, max(qi) - min(qi) AS sq
                FROM zc GROUP BY 1)),
        ns AS (
          SELECT count(*) AS naive_files,
                 CAST(sum(sp) AS BIGINT) AS naive_price_spread,
                 CAST(sum(sq) AS BIGINT) AS naive_qty_spread
          FROM (SELECT nfile, max(pc) - min(pc) AS sp, max(qi) - min(qi) AS sq
                FROM zc GROUP BY 1))
        SELECT z_files, z_price_spread, z_qty_spread,
               naive_files, naive_price_spread, naive_qty_spread,
               z_price_spread * 10000 // naive_price_spread AS price_ratio_bp,
               z_qty_spread * 10000 // naive_qty_spread AS qty_ratio_bp
        FROM zs, ns"""
      }),

    QDef("q157_lateness_profile",
      (s, dir) => {
        // testdata event_ids are already ts-ordered, so simulate ingest
        // reordering deterministically: every 7th event arrives 20
        // sequence slots late (documented synthetic disorder — the
        // operator itself is the point).
        val w = Window.partitionBy("user_id").orderBy("arr", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms",
            "event_id + (CASE WHEN event_id % 7 = 0 THEN 20 ELSE 0 END) AS arr")
          .withColumn("late_ms", max("ts_ms").over(w) - col("ts_ms"))
          .selectExpr(
            """CASE WHEN late_ms = 0 THEN 0
                    WHEN late_ms < 1000 THEN 1
                    WHEN late_ms < 10000 THEN 2
                    WHEN late_ms < 60000 THEN 3
                    WHEN late_ms < 600000 THEN 4
                    WHEN late_ms < 3600000 THEN 5
                    ELSE 6 END AS band""")
          .groupBy("band").agg(count(lit(1)).as("n"))
          .withColumn("share_bp",
            expr("n * 10000 DIV sum(n) OVER ()"))
          .orderBy("band")
      },
      Some("""
        WITH a AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 event_id + (CASE WHEN event_id % 7 = 0 THEN 20 ELSE 0 END) AS arr
          FROM events),
        l AS (
          SELECT user_id, event_id, ts_ms,
                 max(ts_ms) OVER (PARTITION BY user_id ORDER BY arr, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - ts_ms AS late_ms
          FROM a),
        b AS (
          SELECT CASE WHEN late_ms = 0 THEN 0
                      WHEN late_ms < 1000 THEN 1
                      WHEN late_ms < 10000 THEN 2
                      WHEN late_ms < 60000 THEN 3
                      WHEN late_ms < 600000 THEN 4
                      WHEN late_ms < 3600000 THEN 5
                      ELSE 6 END AS band
          FROM l)
        SELECT band, count(*) AS n,
               CAST(count(*) * 10000 // sum(count(*)) OVER () AS BIGINT) AS share_bp
        FROM b GROUP BY 1 ORDER BY 1""")),

    QDef("q158_robust_zscore",
      (s, dir) => {
        val vals = t(s, dir, "events")
          .selectExpr("event_type", "event_id",
            s"($tsMs) DIV 86400000 AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val w1 = Window.partitionBy("event_type").orderBy(col("vc"), col("event_id"))
        val wn = Window.partitionBy("event_type")
        val med = vals
          .withColumn("rn", row_number().over(w1))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(max(when(expr("rn = (n + 1) DIV 2"), col("vc"))).as("med"))
        val dev = vals.join(broadcast(med), "event_type")
          .withColumn("dv", abs(col("vc") - col("med")))
        val w2 = Window.partitionBy("event_type").orderBy(col("dv"), col("event_id"))
        val mad = dev
          .withColumn("rn", row_number().over(w2))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(max(when(expr("rn = (n + 1) DIV 2"), col("dv"))).as("mad"))
        vals.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"),
            sum(when(expr("abs(vc - med) * 2 > 7 * mad"), 1L).otherwise(0L))
              .cast("bigint").as("n_outliers"))
          .withColumn("outlier_bp", expr("n_outliers * 10000 DIV n"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH v AS (
          SELECT event_type, event_id, epoch_ms(ts) // 86400000 AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events),
        r AS (
          SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        med AS (
          SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN vc END) AS med
          FROM r GROUP BY 1),
        d AS (
          SELECT v.event_type, abs(v.vc - m.med) AS dv, v.event_id
          FROM v JOIN med m ON v.event_type = m.event_type),
        dr AS (
          SELECT event_type, dv,
                 row_number() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM d),
        mad AS (
          SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN dv END) AS mad
          FROM dr GROUP BY 1)
        SELECT v.event_type, v.day, count(*) AS n,
               CAST(sum(CASE WHEN abs(v.vc - m.med) * 2 > 7 * md.mad
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(sum(CASE WHEN abs(v.vc - m.med) * 2 > 7 * md.mad
                 THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS outlier_bp
        FROM v JOIN med m ON v.event_type = m.event_type
               JOIN mad md ON v.event_type = md.event_type
        GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
