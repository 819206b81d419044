package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.{PortableHash, PortableHll}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 54 — restatement accounting, SLA
  * scoring, dedup-index evaluation, sketch accuracy:
  *
  *  - q242: late-data restatement ledger — with q227's deterministic
  *    ±60 s arrival jitter, events whose arrival crosses the day
  *    boundary are counted on the wrong day by an arrival-cutoff
  *    report; per event-day the true count, late arrivals and
  *    restatement bp. The "yesterday's numbers changed" ledger that
  *    justifies watermarked recomputation windows.
  *  - q243: supplier on-time score — shipments later than 30 days
  *    after order date, per supplier (volume ≥ 20): late bp, worst 20.
  *    One lineitem⋈orders join, broadcast order dates? No — orders is
  *    the big side at scale; equi-join + one agg.
  *  - q244: LSH index precision/recall — q31's band-bucket candidate
  *    set evaluated against block-bounded exact-Jaccard ground truth
  *    (≥60%): precision from verifying every candidate, recall against
  *    the blocked truth set. The index-quality report that decides
  *    whether 6 hashes × 3 bands is enough (pairs q38's estimator
  *    gate; this grades the INDEX, not the estimator).
  *  - q245: HLL sketch accuracy — per event type, exact distinct users
  *    vs the portable HLL estimate (q17's machinery), error bp. The
  *    continuous trust audit for every sketch-backed dashboard.
  *
  * Reference analog: restatement = late scraper responses restating
  * daily harvest counts; on-time = responsive-host accounting;
  * index eval = response near-dup index calibration; HLL audit =
  * estimated-distinct-listings trust.
  */
object QueriesBI extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q242
    QDef("q242_restatement",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr("event_id", s"$tsMs AS ts_ms")
          .withColumn("arr_ms", col("ts_ms") +
            PortableHash.md5Long(col("event_id").cast("string"), salt = "arr~") % 120000L
            - 60000L)
          .selectExpr("ts_ms DIV 86400000 AS day",
            "CASE WHEN arr_ms DIV 86400000 > ts_ms DIV 86400000 THEN 1 ELSE 0 END AS late")
          .groupBy("day")
          .agg(count(lit(1)).as("n_true"), sum("late").cast("bigint").as("n_late"))
          .withColumn("restate_bp", expr("n_late * 10000 DIV n_true"))
          .orderBy("day")
      },
      Some(s"""
        WITH a AS (
          SELECT epoch_ms(ts) AS ts_ms,
                 epoch_ms(ts) +
                   ${PortableHash.md5LongSql("CAST(event_id AS VARCHAR)", salt = "arr~")}
                     % 120000 - 60000 AS arr_ms
          FROM events)
        SELECT ts_ms // 86400000 AS day, count(*) AS n_true,
               CAST(sum(CASE WHEN arr_ms // 86400000 > ts_ms // 86400000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(sum(CASE WHEN arr_ms // 86400000 > ts_ms // 86400000
                             THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
                 AS restate_bp
        FROM a GROUP BY 1 ORDER BY day""")),

    // --------------------------------------------------------------- q243
    QDef("q243_supplier_ontime",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .selectExpr("o_orderkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ord_ms")
        t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_suppkey",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) AS ship_ms")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .selectExpr("l_suppkey",
            "CASE WHEN ship_ms - ord_ms > 2592000000 THEN 1 ELSE 0 END AS late")
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_ship"), sum("late").cast("bigint").as("n_late"))
          .where(col("n_ship") >= 20L)
          .withColumn("late_bp", expr("n_late * 10000 DIV n_ship"))
          .orderBy(col("late_bp").desc, col("l_suppkey"))
          .limit(20)
      },
      Some("""
        WITH j AS (
          SELECT l.l_suppkey,
                 CASE WHEN epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)
                           > 2592000000 THEN 1 ELSE 0 END AS late
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT l_suppkey, count(*) AS n_ship,
               CAST(sum(late) AS BIGINT) AS n_late,
               CAST(sum(late) AS BIGINT) * 10000 // count(*) AS late_bp
        FROM j GROUP BY 1 HAVING count(*) >= 20
        ORDER BY late_bp DESC, l_suppkey LIMIT 20""")),

    // --------------------------------------------------------------- q244
    QDef("q244_lsh_eval",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir) // (doc_id, sh, sig), cached
        val meta = t(s, dir, "documents")
          .selectExpr("doc_id", "lang", "n_chars DIV 50 AS blk")
        val cand = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        val candJac = cand.join(a, "id_a").join(b, "id_b")
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .select(col("id_a"), col("id_b"),
            when(col("jac_bp") >= 6000, 1L).otherwise(0L).as("is_true"))
          .cache()
        candJac.count()
        // block-bounded exact truth (q33's blocking over the SAME word
        // 3-gram sets): pairs in the same (lang, length-band) block.
        // PPJoin single rung at t = 3/5 (jac_bp ≥ 6000 ⟺ jac ≥ 3/5)
        // instead of all in-block pairs — the q232 fix; prefix + size +
        // positional filters are lossless for ≥ t, exact verify after.
        val blocked = docs.join(meta, "doc_id")
          .select(col("lang"), col("blk"), col("doc_id"), col("sh"),
            size(col("sh")).cast("bigint").as("sz"))
          .cache()
        blocked.count() // rank build, candidate sides, verify sides
        val rk = blocked.select(explode(col("sh")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("df"))
        val ranked = blocked
          .select(col("lang"), col("blk"), col("doc_id"), col("sz"),
            explode(col("sh")).as("h"))
          // no broadcast hint: rk grows with vocabulary — let AQE decide
          // (broadcast while small, shuffle join on a real web corpus)
          .join(rk, "h")
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")))
        val (p, q) = (3L, 5L)
        val pre = ranked.where(
          col("rn") <= col("sz") - expr(s"($p*sz + ${q - 1}) DIV $q") + 1)
        val truth = pre.as("a").join(pre.as("b"),
            col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
              col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
              col("b.sz") * q >= col("a.sz") * p &&
              col("a.sz") * q >= col("b.sz") * p &&
              (lit(1L) + least(col("a.sz") - col("a.rn"),
                col("b.sz") - col("b.rn"))) * (p + q) >=
                (col("a.sz") + col("b.sz")) * p)
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
          .join(blocked.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
            col("sz").as("sz_a")), Seq("id_a"))
          .join(blocked.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
            col("sz").as("sz_b")), Seq("id_b"))
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .where(col("inter") * (p + q) >= (col("sz_a") + col("sz_b")) * p)
          .select("id_a", "id_b")
          .cache()
        truth.count()
        val hits = truth.join(candJac.select("id_a", "id_b"), Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("n_hit"))
        candJac.agg(count(lit(1)).as("n_cand"),
            sum("is_true").cast("bigint").as("n_cand_true"))
          .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
          .crossJoin(hits)
          .selectExpr("n_cand", "n_cand_true",
            "CASE WHEN n_cand > 0 THEN n_cand_true * 10000 DIV n_cand END AS precision_bp",
            "n_truth", "n_hit",
            "CASE WHEN n_truth > 0 THEN n_hit * 10000 DIV n_truth END AS recall_bp")
      },
      Some {
        val truthSql = s"""
          truthd AS (
            SELECT d.doc_id, d.sh, m.lang, m.n_chars // 50 AS blk
            FROM docs d JOIN documents m ON d.doc_id = m.doc_id),
          truth AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM truthd a JOIN truthd b
              ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
            WHERE ${Dedup.jaccardBpSql("a.sh", "b.sh")} >= 6000),
          cj AS (
            SELECT p.id_a, p.id_b,
                   CASE WHEN ${Dedup.jaccardBpSql("da.sh", "db.sh")} >= 6000
                        THEN 1 ELSE 0 END AS is_true
            FROM pairs p
            JOIN docs da ON da.doc_id = p.id_a
            JOIN docs db ON db.doc_id = p.id_b),
          hit AS (
            SELECT count(*) AS n_hit
            FROM truth t JOIN cj ON t.id_a = cj.id_a AND t.id_b = cj.id_b)"""
        s"""
        ${QueriesC.candidatePairsSql}, $truthSql
        SELECT (SELECT count(*) FROM cj) AS n_cand,
               (SELECT CAST(sum(is_true) AS BIGINT) FROM cj) AS n_cand_true,
               CASE WHEN (SELECT count(*) FROM cj) > 0
                    THEN (SELECT CAST(sum(is_true) AS BIGINT) FROM cj) * 10000
                         // (SELECT count(*) FROM cj) END AS precision_bp,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT n_hit FROM hit) AS n_hit,
               CASE WHEN (SELECT count(*) FROM truth) > 0
                    THEN (SELECT n_hit FROM hit) * 10000
                         // (SELECT count(*) FROM truth) END AS recall_bp"""
      }),

    // --------------------------------------------------------------- q245
    QDef("q245_hll_accuracy",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val exact = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("exact_users"))
        val est = PortableHll.approxDistinct(
          ev.select(col("event_type"), col("user_id").cast("string").as("u")),
          col("u"), Seq("event_type"), "est_users")
        exact.join(est, "event_type")
          .withColumn("err_bp",
            expr("abs(est_users - exact_users) * 10000 DIV exact_users"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH exact AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_users
          FROM events GROUP BY 1),
        est AS ${PortableHll.approxDistinctSql(
          "events", "user_id", "event_type", "event_type", "est_users")}
        SELECT e.event_type, e.exact_users, s.est_users,
               abs(s.est_users - e.exact_users) * 10000 // e.exact_users AS err_bp
        FROM exact e JOIN est s ON e.event_type = s.event_type
        ORDER BY e.event_type"""))
  )
}
