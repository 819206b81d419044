package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 34:
  *
  *  - q168: RFM segmentation — per-user Recency/Frequency/Monetary
  *    quintile scores by exact integer rank math ((rn−1)·5 DIV n + 1,
  *    deterministic tiebreaks), rolled up per 3-digit segment code.
  *    The classic customer/listing-activity segmentation, all-BIGINT.
  *  - q170: readability scoring — Flesch-style formula from integer
  *    counts (words, sentence marks, vowel-group syllables via one
  *    shared regex), per-doc micro score floor-quantized with ONE fixed
  *    IEEE op order, averaged per language in exact integer arithmetic.
  *  - q171: peak concurrency — gap-sessionize, then a sweep line over
  *    session boundaries (+1 at start, −1 after end, starts before ends
  *    on ties): running sum's max = the peak number of simultaneously
  *    open sessions. Boundaries are 2 rows/session — orders of magnitude
  *    smaller than events; at 100 TB the sweep would partition by day
  *    with carry-in, the operator shape is identical.
  */
object QueriesAO extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q168_rfm",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val mx = ev.agg(max(expr(s"($tsMs) DIV 86400000")).as("mxd"))
        val base = ev.where(col("event_type") === "purchase")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .groupBy("user_id")
          .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
            sum("vc").cast("bigint").as("monetary"))
          .crossJoin(broadcast(mx))
          .withColumn("recency", col("mxd") - col("last_day"))
        // r12 DUAL PATH: the per-user RFM table is |users|-bounded, so
        // under the driver gate the three exact global ranks, the
        // quintile labels and the ≤125-segment rollup all run driver-side
        // over ONE collected census — 1 job (+ the mx broadcast build)
        // instead of three chained two-phase ScaleRank passes (~9 jobs).
        // limit(gate+1) bounds driver memory WITHOUT a separate count
        // job: past the gate we fall back before holding the rows
        // (r11-advice shape — never collect-then-check).
        val gate = 2000000
        val rows = base.selectExpr("user_id", "recency", "freq", "monetary")
          .limit(gate + 1).collect()
        if (rows.length <= gate) {
          val sc2 = s
          import sc2.implicits._
          val n = rows.length
          val uid = Array.tabulate(n)(i => rows(i).getLong(0))
          val rec = Array.tabulate(n)(i => rows(i).getLong(1))
          val fr = Array.tabulate(n)(i => rows(i).getLong(2))
          val mo = Array.tabulate(n)(i => rows(i).getLong(3))
          // (rn - 1) * 5 DIV n + 1, rn the 1-based rank under each order
          def quint(rank0: Int): Long = rank0.toLong * 5 / n + 1
          def ranksOf(key: Int => (Long, Long)): Array[Long] = {
            val q = new Array[Long](n)
            val idx = (0 until n).sortBy(key)
            var k = 0
            while (k < n) { q(idx(k)) = quint(k); k += 1 }
            q
          }
          val rQ = ranksOf(i => (-rec(i), uid(i))) // recency DESC, uid ASC
          val fQ = ranksOf(i => (fr(i), uid(i)))
          val mQ = ranksOf(i => (mo(i), uid(i)))
          val segs = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
          var i = 0
          while (i < n) {
            val seg = rQ(i) * 100 + fQ(i) * 10 + mQ(i)
            val (c, sm) = segs.getOrElse(seg, (0L, 0L))
            segs(seg) = (c + 1, sm + mo(i))
            i += 1
          }
          segs.toSeq.map { case (seg, (c, sm)) => (seg, c, sm) }
            .sortBy(_._1)
            .toDF("segment", "n_users", "sum_monetary")
        } else {
        // three exact global ranks via two-phase ScaleRank (chained
        // checkpoints) instead of three single-task windows over all users
        val SR = graft.operators.ScaleRank
        val ranked = SR.withGlobalRowNumber(
          SR.withGlobalRowNumber(
            SR.withGlobalRowNumber(base,
              Seq(col("recency").desc, col("user_id")), "rn_r"),
            Seq(col("freq"), col("user_id")), "rn_f"),
          Seq(col("monetary"), col("user_id")), "rn_m")
        val scored = SR.withTotals(ranked, Seq(count(lit(1)).as("nu")))
          .selectExpr("user_id", "monetary",
            "(rn_r - 1) * 5 DIV nu + 1 AS r",
            "(rn_f - 1) * 5 DIV nu + 1 AS f",
            "(rn_m - 1) * 5 DIV nu + 1 AS m")
        scored.groupBy(expr("r * 100 + f * 10 + m").as("segment"))
          .agg(count(lit(1)).as("n_users"),
            sum("monetary").cast("bigint").as("sum_monetary"))
          .orderBy("segment")
        }
      },
      Some("""
        WITH mx AS (SELECT max(epoch_ms(ts) // 86400000) AS mxd FROM events),
        base AS (
          SELECT user_id, max(epoch_ms(ts) // 86400000) AS last_day,
                 count(*) AS freq,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS monetary
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        r AS (
          SELECT user_id, monetary,
                 mx.mxd - last_day AS recency,
                 count(*) OVER () AS nu,
                 row_number() OVER (ORDER BY mx.mxd - last_day DESC, user_id) AS rn_r,
                 row_number() OVER (ORDER BY freq, user_id) AS rn_f,
                 row_number() OVER (ORDER BY monetary, user_id) AS rn_m
          FROM base, mx),
        scored AS (
          SELECT user_id, monetary,
                 (rn_r - 1) * 5 // nu + 1 AS r,
                 (rn_f - 1) * 5 // nu + 1 AS f,
                 (rn_m - 1) * 5 // nu + 1 AS m
          FROM r)
        SELECT r * 100 + f * 10 + m AS segment, count(*) AS n_users,
               CAST(sum(monetary) AS BIGINT) AS sum_monetary
        FROM scored GROUP BY 1 ORDER BY 1""")),

    QDef("q170_readability",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            explode(TextFunctions.words(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
        val perDoc = toks.groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("w"),
            sum(size(expr("regexp_extract_all(tok, '[aeiouAEIOU]+', 0)")))
              .cast("bigint").as("sy"),
            max(expr("greatest(length(text) - length(replace(text, '.', '')), 1)"))
              .as("sents"))
          .selectExpr("doc_id", "lang",
            """CAST(floor((206.835
               - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
               - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
               * 1000000) AS BIGINT) AS score_micro""")
        perDoc.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            expr("CAST(sum(score_micro) AS BIGINT) DIV count(1)")
              .as("avg_score_micro"),
            min("score_micro").as("min_score_micro"),
            max("score_micro").as("max_score_micro"))
          .orderBy("lang")
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        s"""
        WITH toks AS (
          SELECT doc_id, lang, text, tok FROM (
            SELECT doc_id, lang, text, unnest($wSql) AS tok FROM documents)
          WHERE length(tok) > 0),
        per_doc AS (
          SELECT doc_id, lang, count(*) AS w,
                 CAST(sum(len(regexp_extract_all(tok, '[aeiouAEIOU]+'))) AS BIGINT)
                   AS sy,
                 max(greatest(length(text) - length(replace(text, '.', '')), 1))
                   AS sents
          FROM toks GROUP BY 1, 2),
        scored AS (
          SELECT doc_id, lang,
                 CAST(floor((206.835
                   - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
                   - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
                   * 1000000) AS BIGINT) AS score_micro
          FROM per_doc)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(score_micro) AS BIGINT) // count(*) AS avg_score_micro,
               min(score_micro) AS min_score_micro,
               max(score_micro) AS max_score_micro
        FROM scored GROUP BY 1 ORDER BY 1"""
      }),

    QDef("q171_concurrency",
      (s, dir) => {
        val gap = 1800000L
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val sess = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id")
          .withColumn("new_sess",
            when(lag("ts_ms", 1).over(w).isNull ||
              col("ts_ms") - lag("ts_ms", 1).over(w) > gap, 1L).otherwise(0L))
          .withColumn("sid", sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(min("ts_ms").as("start_ms"), max("ts_ms").as("end_ms"))
        val bounds = sess.selectExpr("start_ms AS ts", "1 AS delta",
            "user_id * 1000 + sid AS bid")
          .unionByName(sess.selectExpr("end_ms + 1 AS ts", "-1 AS delta",
            "user_id * 1000 + sid AS bid"))
        // two-phase global sweep: the +1/−1 running sum stays parallel
        val SR = graft.operators.ScaleRank
        val opened = SR.withGlobalRunningSum(bounds,
          Seq(col("ts"), col("delta").desc, col("bid")), col("delta"), "open")
        opened
          .crossJoin(broadcast(opened.agg(max("open").as("peak_all"))))
          .agg(max("open").cast("bigint").as("peak"),
            min(when(col("open") === col("peak_all"), col("ts")))
              .as("first_peak_ts"),
            expr("count(1) DIV 2").as("n_sessions"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
                 CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                        OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
                 ts_ms
          FROM e),
        sess AS (
          SELECT user_id, sid, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
          FROM s GROUP BY 1, 2),
        bounds AS (
          SELECT start_ms AS ts, 1 AS delta, user_id * 1000 + sid AS bid FROM sess
          UNION ALL
          SELECT end_ms + 1, -1, user_id * 1000 + sid FROM sess),
        sweep AS (
          SELECT ts, delta,
                 CAST(sum(delta) OVER (ORDER BY ts, delta DESC, bid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS open
          FROM bounds)
        SELECT CAST(max(open) AS BIGINT) AS peak,
               min(CASE WHEN open = (SELECT max(open) FROM sweep) THEN ts END)
                 AS first_peak_ts,
               CAST(count(*) // 2 AS BIGINT) AS n_sessions
        FROM sweep"""))
  )
}
