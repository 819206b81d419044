package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 56 — double-fire detection, shuffle
  * balance, classifier confidence, revenue decomposition:
  *
  *  - q250: double-fire detection — same (user, type) repeated within
  *    60 s counts as an instrumentation duplicate; per type the dup
  *    count and bp. One lag window per (user, type); the event-quality
  *    gate every ingest pipeline runs before sessionizing.
  *  - q251: shuffle-balance audit — rows per pmod(portable-hash(key),
  *    32) for the o_custkey join key: max/mean skew bp and the
  *    heaviest bucket. THE pre-flight check before shuffling 100 TB on
  *    a key (q72 handles the skew; this DETECTS it cheaply first).
  *  - q252: language-ID confidence margin — per doc the top minus
  *    second-best marker score (q50's classifier); margin histogram
  *    per predicted language. Low margin = unreliable prediction; the
  *    confidence audit behind every downstream lang filter.
  *  - q253: revenue bridge — month-over-month revenue change
  *    decomposed into volume effect ((n₂−n₁)·avg₁) and price/mix
  *    effect (the remainder), all exact cents. The finance-style
  *    explain-the-delta report.
  *
  * Reference analog: double-fire = duplicate scraper responses within
  * a burst; shuffle balance = listing-id partition safety; langid
  * margin = review-language trust; bridge = month-over-month harvest
  * revenue accounting.
  */
object QueriesBK extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q250
    QDef("q250_double_fire",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"$tsMs AS ts_ms", "event_id")
          .withColumn("prev_ts", lag("ts_ms", 1).over(w))
          .selectExpr("event_type",
            "CASE WHEN prev_ts IS NOT NULL AND ts_ms - prev_ts <= 60000 THEN 1 ELSE 0 END AS dup")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("dup").cast("bigint").as("n_dups"))
          .withColumn("dup_bp", expr("n_dups * 10000 DIV n_events"))
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
                 epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events)
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= 60000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
               CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= 60000
                             THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS dup_bp
        FROM ev GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q251
    QDef("q251_shuffle_balance",
      (s, dir) => {
        val buckets = t(s, dir, "orders")
          .select((PortableHash.md5Long(col("o_custkey").cast("string"), salt = "shuf~")
            % 32L).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
        val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        buckets
          .withColumn("total", sum("n").over(tot))
          .withColumn("n_buckets", count(lit(1)).over(tot))
          .groupBy()
          .agg(max("n_buckets").as("n_buckets"),
            max("total").as("total_rows"),
            max("n").as("max_bucket"),
            min("n").as("min_bucket"))
          .selectExpr("n_buckets", "total_rows", "max_bucket", "min_bucket",
            "max_bucket * n_buckets * 10000 DIV total_rows AS skew_bp")
      },
      Some(s"""
        WITH b AS (
          SELECT ${PortableHash.md5LongSql("CAST(o_custkey AS VARCHAR)", salt = "shuf~")}
                   % 32 AS bucket, count(*) AS n
          FROM orders GROUP BY 1)
        SELECT count(*) AS n_buckets,
               CAST(sum(n) AS BIGINT) AS total_rows,
               CAST(max(n) AS BIGINT) AS max_bucket,
               CAST(min(n) AS BIGINT) AS min_bucket,
               CAST(max(n) AS BIGINT) * count(*) * 10000
                 // CAST(sum(n) AS BIGINT) AS skew_bp
        FROM b""")),

    // --------------------------------------------------------------- q252
    QDef("q252_langid_margin",
      (s, dir) => {
        import TextFunctions._
        val ex = t(s, dir, "documents")
          .select(col("doc_id"), explode(words(col("text"))).as("x"))
        val aggs = langMarkers.map { case (l, markers) =>
          sum(when(col("x").isin(markers: _*), 1).otherwise(0)).cast("bigint").as(s"s_$l")
        }
        val langs = langMarkers.map(_._1)
        val arr = array(langs.map(l => col(s"s_$l")): _*)
        ex.groupBy("doc_id")
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("predicted", predictedLang)
          .withColumn("sorted", sort_array(arr, asc = false))
          .withColumn("margin", expr("sorted[0] - sorted[1]"))
          .selectExpr("predicted", "least(margin, 4L) AS margin_bucket")
          .groupBy("predicted", "margin_bucket")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("predicted", "margin_bucket")
      },
      Some {
        import TextFunctions._
        val wS = wordsSql("text")
        val scoreSel = langMarkers.map { case (l, m) =>
          s"CAST(${langScoreSql("w", m)} AS BIGINT) AS s_$l"
        }.mkString(", ")
        val langs = langMarkers.map(_._1)
        val arrSql = s"[${langs.map(l => s"s_$l").mkString(", ")}]"
        s"""
        WITH d AS (SELECT doc_id, $wS AS w FROM documents),
        sc AS (SELECT doc_id, $scoreSel FROM d),
        p AS (
          SELECT doc_id, s_en, s_de, s_es, s_fr, $predictedLangSql AS predicted,
                 list_sort($arrSql, 'DESC') AS sorted
          FROM sc)
        SELECT predicted, least(sorted[1] - sorted[2], 4) AS margin_bucket,
               count(*) AS n_docs
        FROM p GROUP BY 1, 2 ORDER BY predicted, margin_bucket"""
      }),

    // --------------------------------------------------------------- q253
    QDef("q253_revenue_bridge",
      (s, dir) => {
        val monthly = t(s, dir, "orders")
          .selectExpr("date_format(CAST(o_orderdate AS TIMESTAMP), 'yyyy-MM') AS month",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("month")
          .agg(count(lit(1)).as("n"), sum("cents").cast("bigint").as("rev"))
        val w = Window.orderBy("month")
        monthly
          .withColumn("prev_n", lag("n", 1).over(w))
          .withColumn("prev_rev", lag("rev", 1).over(w))
          .where(col("prev_rev").isNotNull)
          .selectExpr("month", "n", "rev",
            "rev - prev_rev AS delta_cents",
            "(n - prev_n) * (prev_rev DIV prev_n) AS volume_effect_cents",
            "(rev - prev_rev) - (n - prev_n) * (prev_rev DIV prev_n) AS mix_effect_cents")
          .orderBy("month")
      },
      Some("""
        WITH m AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        l AS (
          SELECT month, n, rev,
                 lag(n, 1) OVER (ORDER BY month) AS prev_n,
                 lag(rev, 1) OVER (ORDER BY month) AS prev_rev
          FROM m)
        SELECT month, n, rev,
               rev - prev_rev AS delta_cents,
               (n - prev_n) * (prev_rev // prev_n) AS volume_effect_cents,
               (rev - prev_rev) - (n - prev_n) * (prev_rev // prev_n) AS mix_effect_cents
        FROM l WHERE prev_rev IS NOT NULL
        ORDER BY month"""))
  )
}
