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
        FROM winner w"""))
  )
}
