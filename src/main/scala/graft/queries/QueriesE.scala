package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** §2E LLM-pipeline text analysis over `documents` — language-ID, quality
  * scoring, token counting, fingerprinting (SURVEY.md §2E; reference
  * analog: review-language + review-text handling). All metrics are exact
  * integer/array math so results hash-match the DuckDB oracle. */
object QueriesE extends QueryPack {

  private val wSql = wordsSql("text")

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q50
    // Stopword-marker language ID vs the labeled lang column: per-language
    // confusion rollup (accuracy view), deterministic tie-break.
    QDef("q50_langid",
      (s, dir) => {
        // explode + conditional-count aggregation: one codegen'd hash agg
        // instead of 16 interpreted array-filter lambdas per document
        // (library form langScore stays for composability; same counts).
        val ex = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(words(col("text"))).as("x"))
        val aggs = langMarkers.map { case (l, markers) =>
          sum(when(col("x").isin(markers: _*), 1).otherwise(0)).cast("int").as(s"s_$l")
        }
        val scored = ex.groupBy("doc_id", "lang")
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("predicted", predictedLang)
        scored.groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"),
            sum(col("s_en")).cast("bigint").as("sum_s_en"),
            sum(col("s_de") + col("s_es") + col("s_fr")).cast("bigint").as("sum_s_other"))
          .orderBy("lang", "predicted")
      },
      Some(s"""
        WITH d AS (SELECT lang, $wSql AS w FROM documents),
        s AS (SELECT lang,
                ${langMarkers.map { case (l, m) => s"${langScoreSql("w", m)} AS s_$l" }.mkString(", ")}
              FROM d),
        p AS (SELECT lang, s_en, s_de, s_es, s_fr, $predictedLangSql AS predicted FROM s)
        SELECT lang, predicted, count(*) AS n,
               CAST(sum(s_en) AS BIGINT) AS sum_s_en,
               CAST(sum(s_de + s_es + s_fr) AS BIGINT) AS sum_s_other
        FROM p
        GROUP BY lang, predicted
        ORDER BY lang, predicted""")),

    // ---------------------------------------------------------------- q51
    // Per-document quality metrics + composite score (length, type-token
    // ratio, avg word length, stopword ratio) — review-quality filtering.
    // All ratios in integer basis points (x DIV y): engine-exact — double
    // `round()` differs between engines on half-way cases (Spark rounds
    // the shortest-repr string, DuckDB the raw double).
    QDef("q51_quality",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", words(col("text")))
          .withColumn("n_words", size(col("w")))
          .withColumn("n_distinct", size(array_distinct(col("w"))))
          .withColumn("sum_wlen", expr("aggregate(w, 0, (acc, x) -> acc + length(x))"))
          .withColumn("n_stop", langScore(col("w"), langMarkers.toMap.apply("en")))
          .select(col("doc_id"), col("n_chars"), col("n_words"),
            expr("n_distinct * 10000 DIV n_words").as("ttr_bp"),
            expr("sum_wlen * 100 DIV n_words").as("awl_c"),
            expr("n_stop * 10000 DIV n_words").as("stop_bp"),
            expr("n_distinct * 5000 DIV n_words" +
              " + least(sum_wlen * 300 DIV n_words, 3000)" +
              " + (2000 - n_stop * 2000 DIV n_words)").as("quality_bp"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, n_chars, $wSql AS w FROM documents),
        m AS (
          SELECT doc_id, n_chars, len(w) AS n_words,
                 len(list_distinct(w)) AS n_distinct,
                 list_sum(list_transform(w, x -> length(x))) AS sum_wlen,
                 ${langScoreSql("w", langMarkers.toMap.apply("en"))} AS n_stop
          FROM d)
        SELECT doc_id, n_chars, n_words,
               CAST(n_distinct * 10000 // n_words AS BIGINT) AS ttr_bp,
               CAST(sum_wlen * 100 // n_words AS BIGINT) AS awl_c,
               CAST(n_stop * 10000 // n_words AS BIGINT) AS stop_bp,
               CAST(n_distinct * 5000 // n_words
                 + least(sum_wlen * 300 // n_words, 3000)
                 + (2000 - n_stop * 2000 // n_words) AS BIGINT) AS quality_bp
        FROM m
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q52
    // Token counting per source: whitespace tokens, BPE-ish ceil(len/4)
    // estimate, regex token count.
    QDef("q52_tokens",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", words(col("text")))
          .withColumn("ws_tokens", size(col("w")))
          .withColumn("bpe_est", floor((col("n_chars") + 3) / 4).cast("bigint"))
          .withColumn("re_tokens", expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws_tokens")).cast("bigint").as("sum_ws"),
            sum(col("bpe_est")).cast("bigint").as("sum_bpe"),
            sum(col("re_tokens")).cast("bigint").as("sum_re"))
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT source, len($wSql) AS ws_tokens,
                 CAST(floor((n_chars + 3) / 4) AS BIGINT) AS bpe_est,
                 len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
          FROM documents)
        SELECT source, count(*) AS n_docs,
               CAST(sum(ws_tokens) AS BIGINT) AS sum_ws,
               CAST(sum(bpe_est) AS BIGINT) AS sum_bpe,
               CAST(sum(re_tokens) AS BIGINT) AS sum_re
        FROM d
        GROUP BY source
        ORDER BY source""")),

    // ---------------------------------------------------------------- q53
    // Rolling-hash document fingerprint (streamable analog of the
    // reference's md5 checksum) + bucket distribution rollup.
    QDef("q53_fingerprint",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("fp", rollingFingerprint("text"))
          .select(col("doc_id"), col("fp"), (col("fp") % 64).as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, ${rollingFingerprintSql("text")} AS fp,
               ${rollingFingerprintSql("text")} % 64 AS bucket
        FROM documents
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q54
    // Vocabulary building: corpus-wide token frequencies + document
    // frequency, top 50 — the tokenizer-training precursor every
    // training-data pipeline runs. One explode + one hash aggregation
    // (partial agg map-side); at 100 TB this is the canonical word-count
    // shuffle, linear in tokens.
    QDef("q54_vocab",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("tf"),
            countDistinct(col("doc_id")).as("df"))
          .orderBy(col("tf").desc, col("tok"))
          .limit(50)
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($wSql) AS tok FROM documents)
        SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM toks
        GROUP BY tok
        ORDER BY tf DESC, tok
        LIMIT 50""")),

    // ---------------------------------------------------------------- q57
    // Bigram LM statistics: corpus bigram counts + conditional
    // probability p(w2|w1) in exact integer basis points, top 30. The
    // unigram totals come from the bigram table itself (sum over w2) —
    // one positions-explode over the corpus, two aggregations, no second
    // scan. n-gram model stats are the standard corpus-analysis step
    // after q54's vocabulary.
    QDef("q57_bigram_lm",
      (s, dir) => {
        val ex = t(s, dir, "documents")
          .withColumn("w", words(col("text")))
          .filter(size(col("w")) >= 2)
          .select(col("w"), explode(sequence(lit(0), size(col("w")) - 2)).as("i"))
          .select(expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
        val big = ex.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val uni = big.groupBy("w1").agg(sum("c2").cast("bigint").as("c1"))
        big.join(uni, "w1")
          .select(col("w1"), col("w2"), col("c2"), col("c1"),
            expr("c2 * 10000 DIV c1").as("p_bp"))
          .orderBy(col("c2").desc, col("w1"), col("w2"))
          .limit(30)
      },
      Some(s"""
        WITH d AS (SELECT $wSql AS w FROM documents),
        ex AS (SELECT w[i] AS w1, w[i + 1] AS w2
               FROM d, unnest(range(1, len(w))) AS t(i)
               WHERE len(w) >= 2),
        big AS (SELECT w1, w2, count(*) AS c2 FROM ex GROUP BY 1, 2),
        uni AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM big GROUP BY 1)
        SELECT b.w1 AS w1, b.w2 AS w2, c2, c1,
               CAST(c2 * 10000 // c1 AS BIGINT) AS p_bp
        FROM big b JOIN uni u ON b.w1 = u.w1
        ORDER BY c2 DESC, w1, w2
        LIMIT 30""")),

    // ---------------------------------------------------------------- q55
    // Deterministic train/val/test split + stratum stats: assignment by
    // portable-hash range (80/10/10) is reproducible across runs,
    // engines and cluster sizes — no RNG, no sampling-order dependence.
    // The canonical training-data split: one narrow map + one
    // aggregation, no shuffle beyond the final rollup.
    QDef("q55_hash_split",
      (s, dir) => {
        val h = graft.functions.PortableHash.md5Long(col("doc_id"), salt = "split~") % 100
        t(s, dir, "documents")
          .withColumn("split",
            when(h < 80, "train").when(h < 90, "val").otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("bigint").as("sum_chars"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .orderBy("lang", "split")
      },
      Some(s"""
        WITH d AS (
          SELECT lang, doc_id, n_chars,
                 ${graft.functions.PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)", salt = "split~")} % 100 AS h
          FROM documents)
        SELECT lang,
               CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM d
        GROUP BY 1, 2
        ORDER BY lang, split""")),
  )
}
