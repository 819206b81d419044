package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 17:
  *
  *  - q101: one BPE merge iteration — the inner step of byte-pair-encoding
  *    tokenizer training, run the way real BPE trainers run it: over the
  *    WORD-FREQUENCY table (distinct words × corpus counts), not the raw
  *    corpus. Adjacent character-pair frequencies → winning pair (max
  *    count, lexicographic tiebreak) → apply the merge (left-to-right
  *    non-overlapping replace, identical semantics in both engines) →
  *    recount. Output: the winner and the exact pair-count totals before
  *    and after the merge. Scale shape: the heavy explode is over the
  *    distinct-word table (vocab-sized, not corpus-sized); everything
  *    else is hash aggregation.
  */
object QueriesX extends QueryPack {

  def defs: Seq[QDef] = Seq(
    QDef("q101_bpe_merge",
      (s, dir) => {
        val wordFreq = t(s, dir, "documents")
          .select(explode(TextFunctions.words(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("tf"))
          .cache()
        wordFreq.count() // eager: pair-count + merge-apply share one job
        def pairCounts(df: org.apache.spark.sql.DataFrame, wordCol: String) = df
          .filter(length(col(wordCol)) >= 2)
          .withColumn("i", explode(sequence(lit(1), length(col(wordCol)) - 1)))
          .select(expr(s"substr($wordCol, i, 2)").as("pair"), col("tf"))
          .groupBy("pair").agg(sum(col("tf")).cast("bigint").as("n"))
        val before = pairCounts(wordFreq, "word").cache()
        before.count() // eager: winner + totals read it twice
        val winner = before.orderBy(col("n").desc, col("pair")).limit(1)
          .select(col("pair").as("top_pair"), col("n").as("top_n"))
        val merged = wordFreq.crossJoin(broadcast(winner))
          .select(expr("replace(word, top_pair, '@')").as("word"), col("tf"))
        val afterTotal = pairCounts(merged, "word")
          .agg(sum("n").cast("bigint").as("pairs_after"))
        winner.crossJoin(
            before.agg(sum("n").cast("bigint").as("pairs_before"),
              count(lit(1)).as("n_distinct_pairs")))
          .crossJoin(afterTotal)
          .withColumn("n_affected",
            col("pairs_before") - col("pairs_after")) // pairs destroyed by the merge
          .select("top_pair", "top_n", "n_distinct_pairs", "pairs_before",
            "pairs_after", "n_affected")
      },
      Some(s"""
        WITH word_freq AS (
          SELECT word, count(*) AS tf FROM (
            SELECT unnest(${TextFunctions.wordsSql("text")}) AS word FROM documents)
          GROUP BY 1),
        pairs_b AS (
          SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(sum(tf) AS BIGINT) AS n
          FROM word_freq, unnest(range(1, length(word))) AS u(i)
          WHERE length(word) >= 2
          GROUP BY 1),
        winner AS (
          SELECT pair AS top_pair, n AS top_n FROM pairs_b
          ORDER BY n DESC, pair LIMIT 1),
        merged AS (
          SELECT replace(word, (SELECT top_pair FROM winner), '@') AS word, tf
          FROM word_freq),
        pairs_a AS (
          SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(sum(tf) AS BIGINT) AS n
          FROM merged, unnest(range(1, length(word))) AS u(i)
          WHERE length(word) >= 2
          GROUP BY 1)
        SELECT w.top_pair, w.top_n,
               (SELECT count(*) FROM pairs_b) AS n_distinct_pairs,
               (SELECT CAST(sum(n) AS BIGINT) FROM pairs_b) AS pairs_before,
               (SELECT CAST(sum(n) AS BIGINT) FROM pairs_a) AS pairs_after,
               (SELECT CAST(sum(n) AS BIGINT) FROM pairs_b) -
                 (SELECT CAST(sum(n) AS BIGINT) FROM pairs_a) AS n_affected
        FROM winner w""")),

    // --------------------------------------------------------------- q102
    // Data-mixture planning: allocate a corpus token budget (50% of all
    // tokens) across (language × length-class) bins by greedy priority
    // fill — full bins in priority order until the budget runs out, a
    // fractional rate for the boundary bin, zero below it. Pure integer
    // arithmetic: cumulative sums + LEAST/GREATEST, one tiny window over
    // the bin table (bins are few; the token counting is the only
    // corpus-scale pass).
    QDef("q102_token_budget",
      (s, dir) => {
        val binned = t(s, dir, "documents")
          .select(col("lang"),
            expr("CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END").as("qclass"),
            size(TextFunctions.words(col("text"))).cast("bigint").as("n_toks"))
          .groupBy("lang", "qclass")
          .agg(sum("n_toks").cast("bigint").as("bin_tokens"),
            count(lit(1)).as("n_docs"))
          .withColumn("prio", expr("bin_tokens DIV n_docs")) // avg len = quality proxy
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("prio").desc, col("lang"), col("qclass"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        binned
          .withColumn("budget",
            expr("sum(bin_tokens) OVER () DIV 2"))
          .withColumn("cum_before", coalesce(sum("bin_tokens").over(w), lit(0L)))
          .withColumn("take_tokens",
            expr("least(bin_tokens, greatest(CAST(0 AS BIGINT), budget - cum_before))"))
          .withColumn("sample_bp", expr("take_tokens * 10000 DIV bin_tokens"))
          .select("lang", "qclass", "n_docs", "bin_tokens", "take_tokens", "sample_bp")
          .orderBy(col("lang"), col("qclass"))
      },
      Some(s"""
        WITH d AS (
          SELECT lang,
                 CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS qclass,
                 CAST(len(${TextFunctions.wordsSql("text")}) AS BIGINT) AS n_toks
          FROM documents),
        bins AS (
          SELECT lang, qclass, CAST(sum(n_toks) AS BIGINT) AS bin_tokens,
                 count(*) AS n_docs
          FROM d GROUP BY 1, 2),
        ranked AS (
          SELECT *, bin_tokens // n_docs AS prio,
                 CAST(sum(bin_tokens) OVER () AS BIGINT) // 2 AS budget,
                 CAST(coalesce(sum(bin_tokens) OVER (ORDER BY bin_tokens // n_docs DESC,
                   lang, qclass ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
          FROM bins)
        SELECT lang, qclass, n_docs, bin_tokens,
               least(bin_tokens, greatest(CAST(0 AS BIGINT), budget - cum_before))
                 AS take_tokens,
               least(bin_tokens, greatest(CAST(0 AS BIGINT), budget - cum_before))
                 * 10000 // bin_tokens AS sample_bp
        FROM ranked ORDER BY lang, qclass""")),

    // --------------------------------------------------------------- q103
    // Data-quality audit: declarative rule table → one scan, violation
    // counts per rule (null checks, range checks, referential membership,
    // key uniqueness). The ingest-gate every pipeline runs before
    // accepting a batch; all rules evaluate in a single pass except
    // uniqueness, which is its own aggregation.
    QDef("q103_dq_audit",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val rowRules = o.agg(
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).cast("bigint")
            .as("null_custkey"),
          sum(when(col("o_totalprice") <= 0.0 || col("o_totalprice").isNull, 1L).otherwise(0L))
            .cast("bigint").as("nonpositive_price"),
          sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
            .cast("bigint").as("bad_status"),
          count(lit(1)).as("n_rows"))
        val dupKeys = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1, col("c"))).cast("bigint").as("dup"),
            lit(1).as("one"))
        rowRules.withColumn("one", lit(1)).join(broadcast(dupKeys), "one")
          .select(
            col("n_rows"),
            col("null_custkey"), col("nonpositive_price"), col("bad_status"),
            coalesce(col("dup"), lit(0L)).as("duplicate_key_rows"))
          .withColumn("pass",
            col("null_custkey") === 0 && col("nonpositive_price") === 0 &&
              col("bad_status") === 0 && col("duplicate_key_rows") === 0)
      },
      Some("""
        WITH row_rules AS (
          SELECT count(*) AS n_rows,
                 CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
                   AS null_custkey,
                 CAST(count(CASE WHEN o_totalprice <= 0.0 OR o_totalprice IS NULL
                   THEN 1 END) AS BIGINT) AS nonpositive_price,
                 CAST(count(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                   THEN 1 END) AS BIGINT) AS bad_status
          FROM orders),
        dup AS (
          SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            AS duplicate_key_rows
          FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1))
        SELECT n_rows, null_custkey, nonpositive_price, bad_status,
               duplicate_key_rows,
               (null_custkey = 0 AND nonpositive_price = 0 AND bad_status = 0
                 AND duplicate_key_rows = 0) AS pass
        FROM row_rules, dup""")),

    // --------------------------------------------------------------- q104
    // Key-skew diagnosis: per partition-key-candidate, the exact Gini
    // coefficient of the per-key row distribution in basis points —
    // gini = (2·Σ(rank·c) − (n+1)·Σc) / (n·Σc) computed entirely on
    // BIGINT (one integer division at the end). The decision input for
    // when to reach for q72's salting: high gini + high top share means
    // a hot key will dominate a shuffle at 100 TB.
    QDef("q104_skew_report",
      (s, dir) => {
        val counts = t(s, dir, "events")
          .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("c"), col("user_id"))
        counts.withColumn("r", row_number().over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_keys"),
            sum("c").cast("bigint").as("n_rows"),
            sum(col("r") * col("c")).cast("bigint").as("rc"),
            max("c").cast("bigint").as("top_c"))
          .withColumn("gini_bp",
            expr("(2 * rc - (n_keys + 1) * n_rows) * 10000 DIV (n_keys * n_rows)"))
          .withColumn("top_share_bp", expr("top_c * 10000 DIV n_rows"))
          .select("event_type", "n_keys", "n_rows", "gini_bp", "top_share_bp")
          .orderBy("event_type")
      },
      Some("""
        WITH counts AS (
          SELECT event_type, user_id, count(*) AS c
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS r
          FROM counts),
        agg AS (
          SELECT event_type, count(*) AS n_keys,
                 CAST(sum(c) AS BIGINT) AS n_rows,
                 CAST(sum(r * c) AS BIGINT) AS rc,
                 CAST(max(c) AS BIGINT) AS top_c
          FROM ranked GROUP BY 1)
        SELECT event_type, n_keys, n_rows,
               (2 * rc - (n_keys + 1) * n_rows) * 10000 // (n_keys * n_rows) AS gini_bp,
               top_c * 10000 // n_rows AS top_share_bp
        FROM agg ORDER BY event_type"""))
  )
}
