package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 33:
  *
  *  - q167: BM25 relevance scoring — the classic IR ranking function over
  *    the corpus: query = the three mid-frequency tokens (df-rank 10-12,
  *    deterministic), per-doc Okapi BM25 (k1=1.2, b=0.75). The three
  *    per-term contributions are summed in ONE FIXED written order
  *    (((t10 + t11) + t12)) so the double additions are bit-identical
  *    across engines (no aggregation-order dependence); ln follows the
  *    q56 precedent, output rounded to 6 dp on a 15-row top-k.
  */
object QueriesAN extends QueryPack {

  def defs: Seq[QDef] = Seq(

    QDef("q167_bm25",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .cache()
        toks.count()
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("bigint").as("df"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).cast("bigint").as("dl"))
        val stats = dl.agg(
          (sum(col("dl").cast("double")) / count(lit(1)).cast("double")).as("avgdl"),
          count(lit(1)).cast("bigint").as("n_docs"))
        // query = the 3 terms with df closest to N/4: mid-frequency at any
        // SF, and idf > 0 by construction (df < N/2)
        val terms = dfreq.crossJoin(broadcast(stats.select("n_docs")))
          // top-3 via orderBy+limit (TakeOrderedAndProject over the
          // vocab); the rank window then covers 3 rows
          .orderBy(abs(col("df") * 4 - col("n_docs")), col("tok"))
          .limit(3)
          .withColumn("rnk", row_number().over(
            Window.orderBy(abs(col("df") * 4 - col("n_docs")), col("tok"))))
          .select(col("tok"), col("df"), (col("rnk") + 9).as("rnk"))
        val contrib = tf.join(broadcast(terms), "tok")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .selectExpr("doc_id", "rnk",
            """ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                 / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
               AS c""")
        contrib.groupBy("doc_id")
          .agg(max(when(col("rnk") === 10, col("c"))).as("c10"),
            max(when(col("rnk") === 11, col("c"))).as("c11"),
            max(when(col("rnk") === 12, col("c"))).as("c12"))
          .selectExpr("doc_id",
            """round(((coalesce(c10, 0.0) + coalesce(c11, 0.0))
               + coalesce(c12, 0.0)), 6) AS bm25_6""")
          .orderBy(col("bm25_6").desc, col("doc_id"))
          .limit(15)
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        s"""
        WITH toks AS (
          SELECT doc_id, tok FROM (SELECT doc_id, unnest($wSql) AS tok FROM documents)
          WHERE length(tok) > 0),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        stats AS (
          SELECT sum(CAST(dl AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS avgdl,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM dl),
        terms AS (
          SELECT tok, df, rnk + 9 AS rnk FROM (
            SELECT tok, df,
                   row_number() OVER (ORDER BY abs(df * 4 - n_docs), tok) AS rnk
            FROM dfreq, stats)
          WHERE rnk <= 3),
        contrib AS (
          SELECT tf.doc_id, t.rnk,
                 ln((CAST(n_docs AS DOUBLE) - CAST(t.df AS DOUBLE) + 0.5)
                      / (CAST(t.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2)
                 / (CAST(tf.tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / avgdl)))
                 AS c
          FROM tf JOIN terms t ON tf.tok = t.tok
                  JOIN dl ON tf.doc_id = dl.doc_id, stats),
        pivoted AS (
          SELECT doc_id,
                 max(CASE WHEN rnk = 10 THEN c END) AS c10,
                 max(CASE WHEN rnk = 11 THEN c END) AS c11,
                 max(CASE WHEN rnk = 12 THEN c END) AS c12
          FROM contrib GROUP BY 1)
        SELECT doc_id,
               round(((coalesce(c10, 0.0) + coalesce(c11, 0.0))
                 + coalesce(c12, 0.0)), 6) AS bm25_6
        FROM pivoted
        ORDER BY bm25_6 DESC, doc_id
        LIMIT 15"""
      })
  )
}
