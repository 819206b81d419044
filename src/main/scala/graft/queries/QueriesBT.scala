package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 65 — corpus statistics + the
  * prefix-filtered set-similarity join:
  *
  *  - q285: word-length histogram per language (1-2 / 3-5 / 6-9 / 10+
  *    char buckets, share bp) — the tokenizer-design input beside
  *    q192's fertility.
  *  - q286: per-document type-token ratio (lexical richness, milli)
  *    bucketed per language — per-doc repetitiveness where q68 is
  *    corpus-level concentration.
  *  - q287: hapax legomena share per language — words occurring exactly
  *    once: vocab share and token share in bp (pairs with q54/q181;
  *    low hapax share = templated/machine text).
  *  - q288: PPJoin-lite prefix-filtered set-similarity self-join —
  *    word-set Jaccard ≥ 0.8 WITHOUT LSH: global ascending-df token
  *    order, per-doc prefix of size |d|−⌈0.8|d|⌉+1 (pigeonhole: any
  *    qualifying pair shares a prefix token), plus the size filter
  *    5·|b| ≥ 4·|a| both ways, then exact cross-multiplied verification
  *    5i ≥ 4(|a|+|b|−i). The deterministic-exact counterpart of
  *    q31's MinHash LSH: same completeness, no sketch error.
  *    Candidates are equi-joined on (lang, prefix-token rank) — never
  *    an all-pairs plan; on adversarially-overlapping corpora the
  *    SIZE filter does the heavy cutting and the volume is
  *    data-bounded, which is exactly the PPJoin cost model.
  *
  * Reference analog: review-text profile stats and near-identical
  * listing-description detection with provable recall.
  */
object QueriesBT extends QueryPack {
  import Q._

  private val wSql = TextFunctions.wordsSql("text")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q285
    QDef("q285_word_len_hist",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(col("lang"), explode(col("w")).as("word"))
          .withColumn("bucket", expr("""
            CASE WHEN length(word) <= 2 THEN 'a_1_2'
                 WHEN length(word) <= 5 THEN 'b_3_5'
                 WHEN length(word) <= 9 THEN 'c_6_9'
                 ELSE 'd_10_plus' END"""))
        toks.groupBy("lang", "bucket").agg(count(lit(1)).as("n_words"))
          .withColumn("share_bp", expr(
            "n_words * 10000 DIV (sum(n_words) OVER (PARTITION BY lang))"))
          .orderBy("lang", "bucket")
      },
      Some(s"""
        WITH w0 AS (SELECT lang, $wSql AS w FROM documents),
        toks AS (SELECT lang, unnest(w) AS word FROM w0 WHERE len(w) > 0),
        b AS (
          SELECT lang,
                 CASE WHEN length(word) <= 2 THEN 'a_1_2'
                      WHEN length(word) <= 5 THEN 'b_3_5'
                      WHEN length(word) <= 9 THEN 'c_6_9'
                      ELSE 'd_10_plus' END AS bucket
          FROM toks)
        SELECT lang, bucket, count(*) AS n_words,
               CAST(count(*) * 10000 // (sum(count(*)) OVER (PARTITION BY lang))
                 AS BIGINT) AS share_bp
        FROM b GROUP BY 1, 2 ORDER BY lang, bucket""")),

    // --------------------------------------------------------------- q286
    QDef("q286_doc_ttr",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .selectExpr("lang",
            "CAST(size(array_distinct(w)) AS BIGINT) * 1000 DIV size(w) AS ttr_milli")
          .withColumn("bucket", expr("ttr_milli DIV 200"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            min("ttr_milli").cast("bigint").as("min_ttr"),
            max("ttr_milli").cast("bigint").as("max_ttr"))
          .selectExpr("lang", "CAST(bucket AS BIGINT) AS bucket", "n_docs",
            "min_ttr", "max_ttr")
          .orderBy("lang", "bucket")
      },
      Some(s"""
        WITH w0 AS (SELECT lang, $wSql AS w FROM documents),
        ttr AS (
          SELECT lang,
                 CAST(len(list_distinct(w)) AS BIGINT) * 1000 // len(w) AS ttr_milli
          FROM w0 WHERE len(w) > 0)
        SELECT lang, CAST(ttr_milli // 200 AS BIGINT) AS bucket,
               count(*) AS n_docs,
               CAST(min(ttr_milli) AS BIGINT) AS min_ttr,
               CAST(max(ttr_milli) AS BIGINT) AS max_ttr
        FROM ttr GROUP BY 1, 2 ORDER BY lang, bucket""")),

    // --------------------------------------------------------------- q287
    QDef("q287_hapax",
      (s, dir) => {
        val tf = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(col("lang"), explode(col("w")).as("word"))
          .groupBy("lang", "word").agg(count(lit(1)).as("tf"))
        tf.groupBy("lang")
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("tf") === 1L, 1L).otherwise(0L)).cast("bigint")
              .as("hapax_words"),
            sum("tf").cast("bigint").as("tokens"))
          .withColumn("hapax_vocab_bp", expr("hapax_words * 10000 DIV vocab"))
          .withColumn("hapax_token_bp", expr("hapax_words * 10000 DIV tokens"))
          .orderBy("lang")
      },
      Some(s"""
        WITH w0 AS (SELECT lang, $wSql AS w FROM documents),
        toks AS (SELECT lang, unnest(w) AS word FROM w0 WHERE len(w) > 0),
        tf AS (SELECT lang, word, count(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT lang, count(*) AS vocab,
               CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_words,
               CAST(sum(tf) AS BIGINT) AS tokens,
               CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
                 // count(*) AS hapax_vocab_bp,
               CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
                 // CAST(sum(tf) AS BIGINT) AS hapax_token_bp
        FROM tf GROUP BY 1 ORDER BY lang""")),

    // --------------------------------------------------------------- q288
    // PPJoin pipeline: hashed distinct tokens → global ascending-df order
    // → per-doc prefix (pigeonhole) → match-level size + POSITIONAL
    // filters → sorted-array merge-walk verification (native expr, no
    // per-pair shuffle fan-out). Completeness: a J≥0.8 pair's FIRST
    // shared token lies in both prefixes and satisfies the positional
    // bound 9·(1+min(sz_a−rn_a, sz_b−rn_b)) ≥ 4·(sz_a+sz_b).
    QDef("q288_prefix_filter_join",
      (s, dir) => {
        // ONE doc_id-keyed shuffle builds the doc arrays (collect_set
        // dedups, so no separate distinct pass); the token stream is then
        // re-derived by exploding the cached arrays — explode preserves
        // the hash(doc_id) partitioning, so the per-doc prefix window
        // below needs a sort but NO exchange.
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(col("lang"), col("doc_id"),
            explode(col("w")).as("word"))
          .select(col("lang"), col("doc_id"), Dedup.shingleHash(col("word")).as("h"))
          .groupBy("doc_id")
          .agg(max("lang").as("lang"), sort_array(collect_set(col("h"))).as("g"))
          .withColumn("sz", size(col("g")).cast("bigint"))
          .cache()
        docs.count() // eager: read by toks, pre, and both verify sides
        val toks = docs.select(col("lang"), col("doc_id"), col("sz"),
          explode(col("g")).as("h"))
        // ascending-df token order: no materialized GLOBAL RANK is needed
        // — the per-doc prefix window orders by the pair (df, h) directly
        // (identical total order to the rank it replaces), and candidate
        // matching joins on the token hash itself (equal rank ⟺ equal
        // token). This drops the whole two-phase ScaleRank stage (range
        // partition + eager checkpoint + offset broadcast ≈ 3 jobs).
        val rk = toks.groupBy("h").agg(count(lit(1)).as("df"))
        val pre = toks
          .join(broadcast(rk), "h")
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")))
          .where(col("rn") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
          .select(col("lang"), col("doc_id"), col("sz"), col("h"), col("rn"))
        val cand = pre.as("a").join(pre.as("b"),
            col("a.lang") === col("b.lang") && col("a.h") === col("b.h") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("b.sz") * 5 >= col("a.sz") * 4 &&
              col("a.sz") * 5 >= col("b.sz") * 4 &&
              (lit(1L) + least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn"))) * 9 >=
                (col("a.sz") + col("b.sz")) * 4)
          .select(col("a.lang").as("lang"), col("a.doc_id").as("id_a"),
            col("b.doc_id").as("id_b"))
          .distinct()
        cand
          .join(docs.select(col("doc_id").as("id_a"), col("g").as("g_a"),
            col("sz").as("sz_a")), Seq("id_a"))
          .join(docs.select(col("doc_id").as("id_b"), col("g").as("g_b"),
            col("sz").as("sz_b")), Seq("id_b"))
          .withColumn("i", Dedup.sortedIntersectCount("g_a", "g_b"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("i") * 5 >= (col("sz_a") + col("sz_b") - col("i")) * 4, 1L)
              .otherwise(0L)).cast("bigint").as("n_verified"),
            max(expr("i * 10000 DIV (sz_a + sz_b - i)")).cast("bigint")
              .as("max_jac_bp"))
          .orderBy("lang")
      },
      Some {
        val hSql = s"${graft.functions.PortableHash.md5LongSql("word")} % 2147483647"
        s"""
        WITH w0 AS (SELECT lang, doc_id, $wSql AS w FROM documents),
        toks AS (
          SELECT DISTINCT lang, doc_id, $hSql AS h
          FROM (SELECT lang, doc_id, unnest(w) AS word FROM w0 WHERE len(w) > 0)),
        docs AS (
          SELECT lang, doc_id, list_sort(list(h)) AS g, count(*) AS sz
          FROM toks GROUP BY 1, 2),
        df AS (SELECT h, count(*) AS df FROM toks GROUP BY 1),
        rk AS (SELECT h, row_number() OVER (ORDER BY df, h) AS wrank FROM df),
        pre0 AS (
          SELECT t.lang, t.doc_id, d.sz, r.wrank,
                 row_number() OVER (PARTITION BY t.doc_id ORDER BY r.wrank) AS rn
          FROM toks t JOIN rk r USING (h) JOIN docs d USING (doc_id)),
        pre AS (SELECT * FROM pre0 WHERE rn <= sz - ((4*sz + 4) // 5) + 1),
        cand AS (
          SELECT DISTINCT a.lang, a.doc_id AS id_a, b.doc_id AS id_b
          FROM pre a JOIN pre b
            ON a.lang = b.lang AND a.wrank = b.wrank AND a.doc_id < b.doc_id
           AND b.sz * 5 >= a.sz * 4 AND a.sz * 5 >= b.sz * 4
           AND (1 + least(a.sz - a.rn, b.sz - b.rn)) * 9 >= (a.sz + b.sz) * 4),
        inter AS (
          SELECT c.lang, c.id_a, c.id_b, da.sz AS sz_a, db.sz AS sz_b,
                 len(list_intersect(da.g, db.g)) AS i
          FROM cand c
          JOIN docs da ON da.doc_id = c.id_a
          JOIN docs db ON db.doc_id = c.id_b)
        SELECT lang, count(*) AS n_cand,
               CAST(sum(CASE WHEN i * 5 >= (sz_a + sz_b - i) * 4 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_verified,
               CAST(max(i * 10000 // (sz_a + sz_b - i)) AS BIGINT) AS max_jac_bp
        FROM inter GROUP BY 1 ORDER BY lang"""
      })
  )
}
