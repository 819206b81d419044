package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 9 — text-pipeline hygiene + stream
  * semantics:
  *
  *  - q65: PII scrubbing as a construct→scrub roundtrip: contact strings
  *    (emails/phones) are BUILT deterministically from customer rows, then
  *    regex-extracted and redacted; the oracle checks counts and redacted
  *    lengths. (Same proven-lossless pattern as q09b/q64 — the corpus has
  *    no real PII, so the query constructs its own ground truth.)
  *  - q66: normalization-equivalence dedup — noisy variants (case flips,
  *    punctuation, padding) normalize back to their originals; match rate
  *    and distinct-fingerprint accounting per language.
  *  - q68: token-concentration metrics per language — Gini-Simpson
  *    diversity and top-token share in integer basis points (pure integer
  *    arithmetic; no transcendental entropy, so both engines are exact).
  *  - q76: late-event accounting — the batch equivalent of streaming
  *    watermark semantics: per-user arrival order (event_id), watermark =
  *    max event-time seen so far minus horizon; events below it are late.
  */
object QueriesP extends QueryPack {
  import Q._

  private val EmailPat = "user[0-9]+@mail\\.example\\.com"
  private val PhonePat = "\\+1-555-[0-9]{4}"

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q65
    QDef("q65_pii_scrub",
      (s, dir) => {
        val noisy = t(s, dir, "customer").selectExpr(
          "c_custkey", "c_mktsegment",
          "concat('Reach ', c_name, ' <user', CAST(c_custkey AS STRING), " +
            "'@mail.example.com> tel +1-555-', lpad(CAST(c_custkey % 10000 AS STRING), 4, '0'), " +
            "' segment ', c_mktsegment) AS txt")
        noisy
          .withColumn("n_emails", size(regexp_extract_all(col("txt"), lit(EmailPat), lit(0))))
          .withColumn("n_phones", size(regexp_extract_all(col("txt"), lit(PhonePat), lit(0))))
          .withColumn("redacted",
            regexp_replace(regexp_replace(col("txt"), EmailPat, "[EMAIL]"), PhonePat, "[PHONE]"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_rows"),
            sum("n_emails").cast("bigint").as("n_emails"),
            sum("n_phones").cast("bigint").as("n_phones"),
            sum(length(col("txt")) - length(col("redacted"))).cast("bigint").as("chars_removed"),
            sum(when(col("redacted").rlike(EmailPat) || col("redacted").rlike(PhonePat), 1L)
              .otherwise(0L)).cast("bigint").as("n_leaks"))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        WITH noisy AS (
          SELECT c_custkey, c_mktsegment,
                 concat('Reach ', c_name, ' <user', CAST(c_custkey AS VARCHAR),
                   '@mail.example.com> tel +1-555-', lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
                   ' segment ', c_mktsegment) AS txt
          FROM customer),
        scrubbed AS (
          SELECT c_mktsegment, txt,
                 len(regexp_extract_all(txt, '$EmailPat')) AS n_emails,
                 len(regexp_extract_all(txt, '$PhonePat')) AS n_phones,
                 regexp_replace(regexp_replace(txt, '$EmailPat', '[EMAIL]', 'g'),
                   '$PhonePat', '[PHONE]', 'g') AS redacted
          FROM noisy)
        SELECT c_mktsegment, count(*) AS n_rows,
               CAST(sum(n_emails) AS BIGINT) AS n_emails,
               CAST(sum(n_phones) AS BIGINT) AS n_phones,
               CAST(sum(length(txt) - length(redacted)) AS BIGINT) AS chars_removed,
               CAST(count(CASE WHEN regexp_matches(redacted, '$EmailPat')
                 OR regexp_matches(redacted, '$PhonePat') THEN 1 END) AS BIGINT) AS n_leaks
        FROM scrubbed GROUP BY 1 ORDER BY 1""")),

    // ---------------------------------------------------------------- q66
    // normalize(noisy(text)) == text for the already-canonical corpus:
    // the roundtrip proves the normalizer; distinct-fingerprint counts
    // over original ∪ noisy prove the dedup gain (2n rows → n keys).
    QDef("q66_normalize_match",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "lang", "text")
        val noisy = docs.selectExpr("doc_id", "lang",
          "concat('  ', upper(text), '!!!') AS raw")
        val orig = docs.selectExpr("doc_id", "lang", "text AS raw")
        val union = orig.unionByName(noisy)
          .withColumn("norm",
            trim(regexp_replace(regexp_replace(lower(col("raw")), "[^a-z0-9 ]", " "), " +", " ")))
          .withColumn("fp", PortableHash.md5Long(col("norm"), salt = "norm~"))
        val matched = union.join(
            docs.select(col("doc_id"), col("text").as("want")), Seq("doc_id"))
          .withColumn("ok", col("norm") === col("want"))
        matched.groupBy("lang").agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("ok"), 1L).otherwise(0L)).cast("bigint").as("n_roundtrip_ok"),
            countDistinct(col("fp")).as("n_distinct_norm"))
          .orderBy("lang")
      },
      Some(s"""
        WITH docs AS (SELECT doc_id, lang, text FROM documents),
        unioned AS (
          SELECT doc_id, lang, text AS raw FROM docs
          UNION ALL
          SELECT doc_id, lang, concat('  ', upper(text), '!!!') AS raw FROM docs),
        normed AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(regexp_replace(lower(raw), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm
          FROM unioned),
        fp AS (
          SELECT n.doc_id, n.lang, n.norm,
                 ${PortableHash.md5LongSql("n.norm", salt = "norm~")} AS fp,
                 (n.norm = d.text) AS ok
          FROM normed n JOIN docs d ON n.doc_id = d.doc_id)
        SELECT lang, count(*) AS n_rows,
               CAST(count(CASE WHEN ok THEN 1 END) AS BIGINT) AS n_roundtrip_ok,
               count(DISTINCT fp) AS n_distinct_norm
        FROM fp GROUP BY 1 ORDER BY 1""")),

    // ---------------------------------------------------------------- q68
    QDef("q68_token_diversity",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("lang"), explode(TextFunctions.words(col("text"))).as("tok"))
        val tf = toks.groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
        tf.groupBy("lang").agg(
            sum("tf").cast("bigint").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(col("tf") * col("tf")).cast("bigint").as("sum_tf2"),
            max("tf").cast("bigint").as("max_tf"))
          .withColumn("simpson_div_bp",
            expr("10000 - sum_tf2 * 10000 DIV (n_tokens * n_tokens)"))
          .withColumn("top_share_bp", expr("max_tf * 10000 DIV n_tokens"))
          .select("lang", "n_tokens", "n_types", "simpson_div_bp", "top_share_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS tok FROM documents),
        tf AS (SELECT lang, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        stats AS (
          SELECT lang, CAST(sum(tf) AS BIGINT) AS n_tokens, count(*) AS n_types,
                 CAST(sum(tf * tf) AS BIGINT) AS sum_tf2, CAST(max(tf) AS BIGINT) AS max_tf
          FROM tf GROUP BY 1)
        SELECT lang, n_tokens, n_types,
               10000 - sum_tf2 * 10000 // (n_tokens * n_tokens) AS simpson_div_bp,
               max_tf * 10000 // n_tokens AS top_share_bp
        FROM stats ORDER BY lang""")),

    // ---------------------------------------------------------------- q76
    QDef("q76_late_events",
      (s, dir) => {
        val horizonMs = 1800000L // 30 min
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", "event_type", s"$tsMs AS ts_ms")
          .withColumn("hwm", max("ts_ms").over(w))
          .withColumn("late",
            col("hwm").isNotNull && col("ts_ms") < col("hwm") - horizonMs)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late"), 1L).otherwise(0L)).cast("bigint").as("n_late"))
          .withColumn("late_bp", expr("n_late * 10000 DIV n_events"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        wm AS (
          SELECT event_type, ts_ms,
                 max(ts_ms) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
          FROM ev),
        flagged AS (
          SELECT event_type,
                 (hwm IS NOT NULL AND ts_ms < hwm - 1800000) AS late
          FROM wm)
        SELECT event_type, count(*) AS n_events,
               CAST(count(CASE WHEN late THEN 1 END) AS BIGINT) AS n_late,
               count(CASE WHEN late THEN 1 END) * 10000 // count(*) AS late_bp
        FROM flagged GROUP BY 1 ORDER BY 1"""))
  )
}
