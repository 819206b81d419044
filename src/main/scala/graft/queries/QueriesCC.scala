package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 74 — the training-data curation
  * suite: decontamination, mixture design, sequence packing, OOV audit.
  *
  *  - q319: CROSS-SPLIT near-dup decontamination — LSH candidates
  *    (q31's band machinery over the shared signature table) restricted
  *    to eval×train pairs (split = source number mod 5): "which eval
  *    docs leak from the training corpus", the benchmark-decontamination
  *    shape. Top-15 by exact verified Jaccard.
  *  - q320: temperature-scaled mixture weights — per-source sampling
  *    allocation ∝ tokens^0.5 (the multinomial α-sampling used for
  *    multilingual/multi-source training mixes), integer largest-
  *    remainder rounding to an exact 1M-token budget; upsampling factor
  *    per source reported as micro.
  *  - q321: sequence packing — next-fit packing of each source's docs
  *    (doc_id order) into 2000-token context windows: non-linear
  *    recurrence ⇒ q124's scale pattern (repartition by source +
  *    secondary sort + one O(1)-state streaming pass per group);
  *    oracle = recursive CTE re-running the same recurrence.
  *  - q322: OOV-rate audit — eval-split token occurrences not covered
  *    by the train-split vocabulary, per language (left-anti join on
  *    (lang, word)); the tokenizer/vocab-coverage companion to q187's
  *    n-gram contamination.
  *
  * Reference analog: duplicate listings across collection epochs,
  * per-AOI harvest budgeting, payload batching, vocabulary drift of
  * review text between scrape waves.
  */
object QueriesCC extends QueryPack {
  import Q._

  private val wSql = TextFunctions.wordsSql("text")
  private val splitCase =
    "CASE WHEN CAST(substring(source, 4, 10) AS INT) % 5 = 0 THEN 'eval' ELSE 'train' END"

  case class PackIn(source: String, doc_id: Long, tok: Long)
  case class PackOut(source: String, n_docs: Long, n_bins: Long, tok_total: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q319
    QDef("q319_cross_dedup",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val split = t(s, dir, "documents")
          .selectExpr("doc_id", s"$splitCase AS split")
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val sa = split.toDF("id_a", "split_a")
        val sb = split.toDF("id_b", "split_b")
        val cross = pairs.join(sa, "id_a").join(sb, "id_b")
          .where(col("split_a") =!= col("split_b"))
          .selectExpr(
            "CASE WHEN split_a = 'eval' THEN id_a ELSE id_b END AS eval_doc",
            "CASE WHEN split_a = 'eval' THEN id_b ELSE id_a END AS train_doc")
        val a = docs.select(col("doc_id").as("eval_doc"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("train_doc"), col("sh").as("sh_b"))
        cross.join(a, "eval_doc").join(b, "train_doc")
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .select("eval_doc", "train_doc", "jac_bp")
          .orderBy(col("jac_bp").desc, col("eval_doc"), col("train_doc"))
          .limit(15)
      },
      Some(s"""
        ${QueriesC.candidatePairsSql},
        sp AS (SELECT doc_id, $splitCase AS split FROM documents),
        x AS (
          SELECT CASE WHEN sa.split = 'eval' THEN p.id_a ELSE p.id_b END AS eval_doc,
                 CASE WHEN sa.split = 'eval' THEN p.id_b ELSE p.id_a END AS train_doc
          FROM pairs p
          JOIN sp sa ON sa.doc_id = p.id_a
          JOIN sp sb ON sb.doc_id = p.id_b
          WHERE sa.split <> sb.split)
        SELECT x.eval_doc, x.train_doc,
               ${Dedup.jaccardBpSql("da.sh", "db.sh")} AS jac_bp
        FROM x
        JOIN docs da ON da.doc_id = x.eval_doc
        JOIN docs db ON db.doc_id = x.train_doc
        ORDER BY jac_bp DESC, eval_doc, train_doc
        LIMIT 15""")),

    // --------------------------------------------------------------- q320
    QDef("q320_mixture_weights",
      (s, dir) => {
        val budget = 1000000L
        val per = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .groupBy("source")
          .agg(expr("CAST(sum(size(w)) AS BIGINT)").as("tokens"))
          .selectExpr("source", "tokens",
            // α = 0.5 temperature: weight ∝ √tokens, quantized to milli
            "CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000) AS BIGINT) AS wq")
        val tot = per.agg(sum("wq").cast("bigint").as("wtot"))
        val withBase = per.crossJoin(broadcast(tot))
          .selectExpr("source", "tokens", "wq",
            s"wq * $budget DIV wtot AS base",
            s"(wq * $budget) % wtot AS rem")
        val wRem = Window.orderBy(col("rem").desc, col("source"))
        val wAll = Window.partitionBy(lit(1))
        withBase
          .withColumn("leftover", lit(budget) - sum("base").over(wAll))
          .withColumn("rk", row_number().over(wRem).cast("long"))
          .selectExpr("source", "tokens", "wq",
            "base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS alloc")
          .withColumn("epochs_micro", expr("alloc * 1000000 DIV tokens"))
          .orderBy("source")
      },
      Some(s"""
        WITH per AS (
          SELECT source, CAST(sum(len(w)) AS BIGINT) AS tokens
          FROM (SELECT source, $wSql AS w FROM documents) GROUP BY 1),
        wts AS (
          SELECT source, tokens,
                 CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000) AS BIGINT) AS wq
          FROM per),
        wtot AS (SELECT CAST(sum(wq) AS BIGINT) AS wtot FROM wts),
        based AS (
          SELECT source, tokens, wq,
                 CAST(wq * 1000000 // wtot AS BIGINT) AS base,
                 CAST((wq * 1000000) % wtot AS BIGINT) AS rem
          FROM wts, wtot),
        ranked AS (
          SELECT *,
                 CAST(1000000 - sum(base) OVER () AS BIGINT) AS leftover,
                 CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
          FROM based)
        SELECT source, tokens, wq,
               base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS alloc,
               (base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)) * 1000000
                 // tokens AS epochs_micro
        FROM ranked ORDER BY source""")),

    // --------------------------------------------------------------- q321
    QDef("q321_seq_packing",
      (s, dir) => {
        import s.implicits._
        val cap = 2000L
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          // null-tolerant: nulled text/source must not break the Long/String
          // encoder (NullInputSpec contract); identical coalesce in the oracle
          .selectExpr("coalesce(source, '(null)') AS source", "doc_id",
            "CAST(coalesce(size(w), 0) AS BIGINT) AS tok")
          .as[PackIn]
        docs.repartition(col("source"))
          .sortWithinPartitions("source", "doc_id")
          .mapPartitions { it =>
            new Iterator[PackOut] {
              private var pending: Option[PackOut] = None
              private var cur: String = null
              private var fill, bins, nDocs, tokTot = 0L
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val d = it.next()
                  if (d.source != cur) {
                    if (cur != null) pending = Some(PackOut(cur, nDocs, bins, tokTot))
                    cur = d.source; fill = 0L; bins = 0L; nDocs = 0L; tokTot = 0L
                  }
                  if (bins == 0L || fill + d.tok > cap) { bins += 1L; fill = d.tok }
                  else fill += d.tok
                  nDocs += 1L; tokTot += d.tok
                }
                if (pending.isEmpty && cur != null) {
                  pending = Some(PackOut(cur, nDocs, bins, tokTot)); cur = null
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): PackOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .selectExpr("source", "n_docs", "n_bins", "tok_total",
            s"""CAST(floor(CAST(tok_total AS DOUBLE)
               / CAST(n_bins * $cap AS DOUBLE) * 1000000) AS BIGINT)
               AS util_micro""")
          .orderBy("source")
      },
      Some(s"""
        WITH RECURSIVE d AS (
          SELECT source, doc_id, CAST(coalesce(len(w), 0) AS BIGINT) AS tok,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
          FROM (SELECT coalesce(source, '(null)') AS source, doc_id,
                       $wSql AS w FROM documents)),
        p AS (
          SELECT source, rn, cnt, tok AS fill, CAST(1 AS BIGINT) AS bins,
                 tok AS tok_total
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.source, d.rn, d.cnt,
                 CASE WHEN p.fill + d.tok > 2000 THEN d.tok
                      ELSE p.fill + d.tok END,
                 p.bins + CASE WHEN p.fill + d.tok > 2000 THEN 1 ELSE 0 END,
                 p.tok_total + d.tok
          FROM p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
        SELECT source, CAST(cnt AS BIGINT) AS n_docs, bins AS n_bins,
               tok_total,
               CAST(floor(CAST(tok_total AS DOUBLE)
                 / CAST(bins * 2000 AS DOUBLE) * 1000000) AS BIGINT) AS util_micro
        FROM p WHERE rn = cnt ORDER BY source""")),

    // --------------------------------------------------------------- q322
    QDef("q322_oov_rate",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .selectExpr("lang", s"$splitCase AS split", "explode(w) AS word")
        val trainVocab = toks.where(col("split") === "train")
          .select("lang", "word").distinct()
        val eval = toks.where(col("split") === "eval").select("lang", "word")
        val oov = eval.join(trainVocab, Seq("lang", "word"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("n_oov"))
        eval.groupBy("lang").agg(count(lit(1)).as("n_eval_tokens"))
          .join(oov, Seq("lang"), "left")
          .selectExpr("lang", "n_eval_tokens",
            "coalesce(n_oov, 0) AS n_oov",
            "coalesce(n_oov, 0) * 10000 DIV n_eval_tokens AS oov_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, $splitCase AS split, unnest($wSql) AS word
          FROM documents),
        tv AS (SELECT DISTINCT lang, word FROM toks WHERE split = 'train'),
        ev AS (SELECT lang, word FROM toks WHERE split = 'eval'),
        oov AS (
          SELECT ev.lang, count(*) AS n_oov
          FROM ev ANTI JOIN tv ON ev.lang = tv.lang AND ev.word = tv.word
          GROUP BY 1),
        tot AS (SELECT lang, count(*) AS n_eval_tokens FROM ev GROUP BY 1)
        SELECT lang, n_eval_tokens,
               coalesce(n_oov, 0) AS n_oov,
               coalesce(n_oov, 0) * 10000 // n_eval_tokens AS oov_bp
        FROM tot LEFT JOIN oov USING (lang)
        ORDER BY lang""")
    )
  )
}
