package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 114 — weak supervision, label noise,
  * dataset reweighting, membership inference:
  *
  *  - q475: weak-supervision triplet method (Snorkel-style label model)
  *    — three labeling functions over documents (length / stopword /
  *    digit heuristics, votes ±1); pairwise correlations c_ij = E[λᵢλⱼ]
  *    in exact milli and the conditional-independence triplet identity
  *    (2aᵢ−1)² = c_ij·c_ik/c_jk recover each LF's accuracy WITHOUT any
  *    ground truth (one sqrt, floor-milli, negative-product guard);
  *    majority-vote label counts alongside. The programmatic-labeling
  *    estimator for corpus curation.
  *  - q476: label-noise estimation — q50's language-ID predictions vs
  *    the true lang column as a confusion joint; per true class: noise
  *    rate (off-diagonal mass, bp) and the dominant confusion target.
  *    The confident-learning input for relabel/drop decisions.
  *  - q477: importance reweighting to a uniform language target — per
  *    stratum w = target_share/source_share (micro), and Kish effective
  *    sample size (Σw)²/Σw² in exact integer arithmetic: how much
  *    usable data survives the reweighting (the q320 mixture designer's
  *    variance price tag).
  *  - q478: membership-inference audit — q458's add-one bigram LM
  *    scores per-document NLL for TRAIN (h<80) vs HELD-OUT (h≥90)
  *    docs; the loss-threshold attacker flags "member" below the global
  *    median NLL (exact rank): TPR/FPR/advantage per language. The
  *    memorization/privacy gate for trained corpus models.
  *
  * Reference analog: heuristic listing-quality labeling at scale,
  * review-language label QA, corpus mixture variance costs, does the
  * trained model leak which listings were scraped.
  */
object QueriesDQ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q475
    QDef("q475_triplet_lf",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // exact median via per-value counts + two-phase cumsum — the
        // row-ranking global window serialized at scale
        val medLen = graft.operators.ScaleRank.quantileDisc(
          docs, col("n_chars"), 1, 2, "med")
        val votes = docs.crossJoin(broadcast(medLen))
          .withColumn("w", TextFunctions.words(col("text")))
          .selectExpr("doc_id",
            "CASE WHEN n_chars > med THEN 1 ELSE -1 END AS l1",
            "CASE WHEN size(filter(w, x -> x = 'the')) > 0 THEN 1 ELSE -1 END AS l2",
            "CASE WHEN text RLIKE '[0-9]' THEN -1 ELSE 1 END AS l3")
        val c = votes.agg(
          count(lit(1)).cast("bigint").as("n"),
          sum(col("l1") * col("l2")).cast("bigint").as("s12"),
          sum(col("l1") * col("l3")).cast("bigint").as("s13"),
          sum(col("l2") * col("l3")).cast("bigint").as("s23"),
          sum(when(col("l1") === 1, 1L).otherwise(0L)).cast("bigint").as("p1"),
          sum(when(col("l2") === 1, 1L).otherwise(0L)).cast("bigint").as("p2"),
          sum(when(col("l3") === 1, 1L).otherwise(0L)).cast("bigint").as("p3"),
          sum(when(col("l1") + col("l2") + col("l3") > 0, 1L).otherwise(0L))
            .cast("bigint").as("maj_pos"))
        def accExpr(sij: String, sik: String, sjk: String): String =
          s"""CASE WHEN $sjk = 0 OR ($sij * $sik) * sign($sjk) <= 0 THEN -1
              ELSE CAST(floor((1.0 + sqrt(
                (CAST($sij AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST($sik AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST($sjk AS DOUBLE) / CAST(n AS DOUBLE))))
                / 2.0 * 1000) AS BIGINT) END"""
        val accs = c.selectExpr("n", "maj_pos", "p1", "p2", "p3",
          accExpr("s12", "s13", "s23") + " AS a1",
          accExpr("s12", "s23", "s13") + " AS a2",
          accExpr("s13", "s23", "s12") + " AS a3")
        accs.selectExpr("CAST(1 AS BIGINT) AS lf", "p1 AS pos_votes",
            "a1 AS est_acc_milli", "n", "maj_pos")
          .union(accs.selectExpr("CAST(2 AS BIGINT)", "p2", "a2", "n",
            "maj_pos"))
          .union(accs.selectExpr("CAST(3 AS BIGINT)", "p3", "a3", "n",
            "maj_pos"))
          .orderBy("lf")
      },
      Some(s"""
        WITH med AS (
          SELECT min(n_chars) AS med FROM (
            SELECT n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM documents)
          WHERE rn * 2 = n + (n % 2)),
        votes AS (
          SELECT doc_id,
                 CASE WHEN n_chars > med THEN 1 ELSE -1 END AS l1,
                 CASE WHEN len(list_filter(${TextFunctions.wordsSql("text")},
                   x -> x = 'the')) > 0 THEN 1 ELSE -1 END AS l2,
                 CASE WHEN regexp_matches(text, '[0-9]') THEN -1 ELSE 1 END
                   AS l3
          FROM documents, med),
        c AS (
          SELECT count(*) AS n,
                 sum(l1 * l2) AS s12, sum(l1 * l3) AS s13,
                 sum(l2 * l3) AS s23,
                 sum(CASE WHEN l1 = 1 THEN 1 ELSE 0 END) AS p1,
                 sum(CASE WHEN l2 = 1 THEN 1 ELSE 0 END) AS p2,
                 sum(CASE WHEN l3 = 1 THEN 1 ELSE 0 END) AS p3,
                 sum(CASE WHEN l1 + l2 + l3 > 0 THEN 1 ELSE 0 END) AS maj_pos
          FROM votes),
        accs AS (
          SELECT n, maj_pos, p1, p2, p3,
                 CASE WHEN s23 = 0 OR (s12 * s13) * sign(s23) <= 0 THEN -1
                 ELSE CAST(floor((1.0 + sqrt(
                   (CAST(s12 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s13 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(s23 AS DOUBLE) / CAST(n AS DOUBLE))))
                   / 2.0 * 1000) AS BIGINT) END AS a1,
                 CASE WHEN s13 = 0 OR (s12 * s23) * sign(s13) <= 0 THEN -1
                 ELSE CAST(floor((1.0 + sqrt(
                   (CAST(s12 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s23 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(s13 AS DOUBLE) / CAST(n AS DOUBLE))))
                   / 2.0 * 1000) AS BIGINT) END AS a2,
                 CASE WHEN s12 = 0 OR (s13 * s23) * sign(s12) <= 0 THEN -1
                 ELSE CAST(floor((1.0 + sqrt(
                   (CAST(s13 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s23 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(s12 AS DOUBLE) / CAST(n AS DOUBLE))))
                   / 2.0 * 1000) AS BIGINT) END AS a3
          FROM c)
        SELECT CAST(1 AS BIGINT) AS lf, CAST(p1 AS BIGINT) AS pos_votes,
               CAST(a1 AS BIGINT) AS est_acc_milli, CAST(n AS BIGINT) AS n,
               CAST(maj_pos AS BIGINT) AS maj_pos
        FROM accs
        UNION ALL SELECT 2, CAST(p2 AS BIGINT), CAST(a2 AS BIGINT),
               CAST(n AS BIGINT), CAST(maj_pos AS BIGINT) FROM accs
        UNION ALL SELECT 3, CAST(p3 AS BIGINT), CAST(a3 AS BIGINT),
               CAST(n AS BIGINT), CAST(maj_pos AS BIGINT) FROM accs
        ORDER BY lf""")),

    // --------------------------------------------------------------- q476
    QDef("q476_label_noise",
      (s, dir) => {
        // marker census instead of 10 array-filter passes (r11): the
        // prediction depends only on the per-doc counts of 10 fixed
        // stopwords, so explode+isin keeps one codegen'd comparison chain
        // per token where size(filter(...)) ran 10 interpreted
        // higher-order traversals of the word array per doc. Docs with no
        // marker hit rejoin with zero counts; NULL text keeps the
        // original NULL-count semantics (every >= is NULL → ELSE 'it').
        val marks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.words(col("text"))).as("x"))
          .where(col("x").isin("the", "and", "der", "und", "le", "et",
            "el", "y", "il", "di"))
          .groupBy("doc_id")
          .agg(
            sum(when(col("x") === "the" || col("x") === "and", 1L)
              .otherwise(0L)).as("m_en"),
            sum(when(col("x") === "der" || col("x") === "und", 1L)
              .otherwise(0L)).as("m_de"),
            sum(when(col("x") === "le" || col("x") === "et", 1L)
              .otherwise(0L)).as("m_fr"),
            sum(when(col("x") === "el" || col("x") === "y", 1L)
              .otherwise(0L)).as("m_es"),
            sum(when(col("x") === "il" || col("x") === "di", 1L)
              .otherwise(0L)).as("m_it"))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            col("text").isNull.as("null_text"))
          .join(marks, Seq("doc_id"), "left")
          .selectExpr("doc_id", "lang",
            "CASE WHEN null_text THEN CAST(NULL AS BIGINT) ELSE coalesce(m_en, CAST(0 AS BIGINT)) END AS m_en",
            "CASE WHEN null_text THEN CAST(NULL AS BIGINT) ELSE coalesce(m_de, CAST(0 AS BIGINT)) END AS m_de",
            "CASE WHEN null_text THEN CAST(NULL AS BIGINT) ELSE coalesce(m_fr, CAST(0 AS BIGINT)) END AS m_fr",
            "CASE WHEN null_text THEN CAST(NULL AS BIGINT) ELSE coalesce(m_es, CAST(0 AS BIGINT)) END AS m_es",
            "CASE WHEN null_text THEN CAST(NULL AS BIGINT) ELSE coalesce(m_it, CAST(0 AS BIGINT)) END AS m_it")
          .selectExpr("doc_id", "lang",
            """CASE WHEN m_en >= m_de AND m_en >= m_fr AND m_en >= m_es
                     AND m_en >= m_it THEN 'en'
                WHEN m_de >= m_fr AND m_de >= m_es AND m_de >= m_it THEN 'de'
                WHEN m_fr >= m_es AND m_fr >= m_it THEN 'fr'
                WHEN m_es >= m_it THEN 'es' ELSE 'it' END AS pred""")
        val joint = docs.groupBy("lang", "pred")
          .agg(count(lit(1)).cast("bigint").as("c"))
        val diag = joint.where(col("lang") === col("pred"))
          .select(col("lang"), col("c").as("correct"))
        val tot = joint.groupBy("lang").agg(sum("c").cast("bigint").as("n"))
        val offTop = joint.where(col("lang") =!= col("pred"))
          .withColumn("rk", row_number().over(Window.partitionBy("lang")
            .orderBy(col("c").desc, col("pred"))))
          .where(col("rk") === 1)
          .select(col("lang"), col("pred").as("top_confusion"),
            col("c").as("conf_c"))
        tot.join(diag, Seq("lang"), "left").join(offTop, Seq("lang"), "left")
          .selectExpr("lang", "n", "coalesce(correct, 0) AS correct",
            "(n - coalesce(correct, 0)) * 10000 DIV n AS noise_bp",
            "coalesce(top_confusion, '-') AS top_confusion",
            "coalesce(conf_c, 0) AS conf_c")
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang, ${TextFunctions.wordsSql("text")} AS w
          FROM documents),
        m AS (
          SELECT doc_id, lang,
                 len(list_filter(w, x -> x = 'the'))
                   + len(list_filter(w, x -> x = 'and')) AS m_en,
                 len(list_filter(w, x -> x = 'der'))
                   + len(list_filter(w, x -> x = 'und')) AS m_de,
                 len(list_filter(w, x -> x = 'le'))
                   + len(list_filter(w, x -> x = 'et')) AS m_fr,
                 len(list_filter(w, x -> x = 'el'))
                   + len(list_filter(w, x -> x = 'y')) AS m_es,
                 len(list_filter(w, x -> x = 'il'))
                   + len(list_filter(w, x -> x = 'di')) AS m_it
          FROM d),
        p AS (
          SELECT doc_id, lang,
                 CASE WHEN m_en >= m_de AND m_en >= m_fr AND m_en >= m_es
                       AND m_en >= m_it THEN 'en'
                  WHEN m_de >= m_fr AND m_de >= m_es AND m_de >= m_it THEN 'de'
                  WHEN m_fr >= m_es AND m_fr >= m_it THEN 'fr'
                  WHEN m_es >= m_it THEN 'es' ELSE 'it' END AS pred
          FROM m),
        joint AS (SELECT lang, pred, count(*) AS c FROM p GROUP BY 1, 2),
        tot AS (SELECT lang, sum(c) AS n FROM joint GROUP BY 1),
        diag AS (SELECT lang, c AS correct FROM joint WHERE lang = pred),
        offtop AS (
          SELECT lang, pred AS top_confusion, c AS conf_c FROM (
            SELECT lang, pred, c,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY c DESC, pred) AS rk
            FROM joint WHERE lang <> pred)
          WHERE rk = 1)
        SELECT tot.lang AS lang, CAST(n AS BIGINT) AS n,
               CAST(coalesce(correct, 0) AS BIGINT) AS correct,
               CAST((n - coalesce(correct, 0)) * 10000 // n AS BIGINT)
                 AS noise_bp,
               coalesce(top_confusion, '-') AS top_confusion,
               CAST(coalesce(conf_c, 0) AS BIGINT) AS conf_c
        FROM tot
        LEFT JOIN diag ON tot.lang = diag.lang
        LEFT JOIN offtop ON tot.lang = offtop.lang
        ORDER BY tot.lang""")),

    // --------------------------------------------------------------- q477
    QDef("q477_reweight_ess",
      (s, dir) => {
        val mix = t(s, dir, "documents").groupBy("lang")
          .agg(count(lit(1)).cast("bigint").as("c"))
        val tot = mix.agg(sum("c").cast("bigint").as("n"),
          count(lit(1)).cast("bigint").as("k"))
        val weighted = mix.crossJoin(broadcast(tot))
          .selectExpr("lang", "c", "n", "k",
            // target uniform share 1/k; source share c/n; w = n/(k*c)
            "n * 1000 DIV (k * c) AS w_milli")
        val ess = weighted
          .selectExpr("lang", "c", "w_milli", "c * w_milli AS sw",
            "c * w_milli * w_milli AS sww")
          .agg(sum("sw").cast("bigint").as("sum_w"),
            sum("sww").cast("bigint").as("sum_w2"),
            sum("c").cast("bigint").as("n"))
          .selectExpr("n", "sum_w",
            "(sum_w * sum_w) DIV sum_w2 AS ess",
            "((sum_w * sum_w) DIV sum_w2) * 10000 DIV n AS ess_bp")
        weighted.crossJoin(broadcast(ess.selectExpr("ess", "ess_bp")))
          .selectExpr("lang", "c", "w_milli", "ess", "ess_bp")
          .orderBy("lang")
      },
      Some("""
        WITH mix AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
        tot AS (SELECT sum(c) AS n, count(*) AS k FROM mix),
        weighted AS (
          SELECT lang, c, n, k, n * 1000 // (k * c) AS w_milli
          FROM mix, tot),
        ess AS (
          SELECT sum(c) AS n, sum(c * w_milli) AS sum_w,
                 (sum(c * w_milli) * sum(c * w_milli))
                   // sum(c * w_milli * w_milli) AS ess
          FROM weighted)
        SELECT lang, CAST(c AS BIGINT) AS c,
               CAST(w_milli AS BIGINT) AS w_milli,
               CAST(ess.ess AS BIGINT) AS ess,
               CAST(ess.ess * 10000 // ess.n AS BIGINT) AS ess_bp
        FROM weighted, ess
        ORDER BY lang""")),

    // --------------------------------------------------------------- q478
    QDef("q478_membership_inference",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          // single-file scan = ONE partition; fan out before tokenize
          .repartition(col("doc_id"))
          .withColumn("h", pmod(PortableHash.md5Long(col("doc_id"),
            salt = "split~"), lit(100L)))
        // The bigram MODEL tables are vocabulary-bounded (≤ |vocab|² ×
        // langs rows), so aggregate the train pass straight to c2 and
        // derive c1 and the vocab size from c2 itself — one tokenize
        // pass for all three tables, each small enough to BROADCAST into
        // the scoring pass (r8 re-tokenized three times + a docs re-join
        // for h; r9's first cut cached the raw exploded bigrams, which
        // benched SLOWER at sf0.1 — the cache write of the per-bigram
        // frame beats the pass it saves only at sf1).
        // MEASURED NEGATIVE RESULT (r11, isolated Bench min): collapsing
        // to ONE tokenize pass via the native per-doc bigram HISTOGRAM
        // (WordNgramCounts, cached compact array<struct<g,c>> per doc,
        // nll weighted by count) benched 3.0 s vs 2.8 s at sf0.1 and
        // 5.9 s vs 4.8 s at sf1 and was reverted: the corpus has almost
        // no within-doc bigram repetition, so the histogram saves no
        // volume and its per-row TreeMap + struct allocation replaces a
        // codegen'd explode.
        def bigrams(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("w", TextFunctions.words(col("text")))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"), col("lang"), col("h"),
            explode(expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")).as("bg"))
          .select(col("doc_id"), col("lang"), col("h"),
            col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val c2 = bigrams(docs.where(col("h") < 80))
          .groupBy("lang", "w1", "w2")
          .agg(count(lit(1)).cast("bigint").as("c2"))
        c2.cache(); c2.count() // tiny; c1/vocab/scoring all read it
        val c1 = c2.groupBy("lang", "w1").agg(sum("c2").cast("bigint").as("c1"))
        val vocab = c2.select(col("lang"), col("w2")).distinct()
          .groupBy("lang").agg(count(lit(1)).cast("bigint").as("v"))
        // no broadcast hints: the model tables are tiny on THIS corpus
        // (AQE broadcasts them), but c2 is |vocab|²-bounded — on a real
        // web vocabulary AQE must be free to keep the shuffle join
        val perDoc = bigrams(docs.where(col("h") < 80 || col("h") >= 90))
          .join(c2, Seq("lang", "w1", "w2"), "left")
          .join(c1, Seq("lang", "w1"), "left")
          .join(vocab, "lang")
          .selectExpr("doc_id", "lang", "h",
            "CAST(floor(-ln((CAST(coalesce(c2, 0) + 1 AS DOUBLE)) / (CAST(coalesce(c1, 0) + v AS DOUBLE))) * 1e6) AS BIGINT) AS nll")
          .groupBy("doc_id", "lang", "h")
          .agg(expr("sum(nll) DIV count(*)").cast("long").as("avg_nll"))
        // cached: the tau broadcast subtree and the final rollup otherwise
        // each recompute the three-way join
        perDoc.cache(); perDoc.count()
        val tau = graft.operators.ScaleRank.quantileDisc(
          perDoc, col("avg_nll"), 1, 2, "tau")
        perDoc.crossJoin(broadcast(tau))
          .withColumn("member_guess", col("avg_nll") < col("tau"))
          .groupBy("lang").agg(
            sum(when(col("h") < 80, 1L).otherwise(0L))
              .cast("bigint").as("n_train"),
            sum(when(col("h") >= 90, 1L).otherwise(0L))
              .cast("bigint").as("n_out"),
            sum(when(col("h") < 80 && col("member_guess"), 1L).otherwise(0L))
              .cast("bigint").as("tp"),
            sum(when(col("h") >= 90 && col("member_guess"), 1L).otherwise(0L))
              .cast("bigint").as("fp"))
          .where(col("n_train") > 0 && col("n_out") > 0)
          .selectExpr("lang", "n_train", "n_out", "tp", "fp",
            "tp * 10000 DIV n_train AS tpr_bp",
            "fp * 10000 DIV n_out AS fpr_bp",
            "tp * 10000 DIV n_train - fp * 10000 DIV n_out AS advantage_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, lang, text,
                 ${PortableHash.md5LongSql("doc_id", "split~")} % 100 AS h
          FROM documents),
        dw AS (SELECT doc_id, lang, h, ${TextFunctions.wordsSql("text")} AS w
               FROM docs),
        train AS (
          SELECT lang, w[i] AS w1, w[i + 1] AS w2
          FROM dw, unnest(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2 AND h < 80),
        c2 AS (SELECT lang, w1, w2, count(*) AS c2 FROM train GROUP BY 1, 2, 3),
        c1 AS (SELECT lang, w1, sum(c2) AS c1 FROM c2 GROUP BY 1, 2),
        vocab AS (SELECT lang, count(DISTINCT w2) AS v FROM train GROUP BY 1),
        scorable AS (
          SELECT doc_id, lang, h, w[i] AS w1, w[i + 1] AS w2
          FROM dw, unnest(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2 AND (h < 80 OR h >= 90)),
        perdoc AS (
          SELECT s.doc_id, s.lang, s.h,
                 CAST(sum(CAST(floor(-ln((CAST(coalesce(c2.c2, 0) + 1
                   AS DOUBLE)) / (CAST(coalesce(c1.c1, 0) + v AS DOUBLE)))
                   * 1e6) AS BIGINT)) // count(*) AS BIGINT) AS avg_nll
          FROM scorable s
          LEFT JOIN c2 ON s.lang = c2.lang AND s.w1 = c2.w1 AND s.w2 = c2.w2
          LEFT JOIN c1 ON s.lang = c1.lang AND s.w1 = c1.w1
          JOIN vocab ON s.lang = vocab.lang
          GROUP BY 1, 2, 3),
        tau AS (
          SELECT min(avg_nll) AS tau FROM (
            SELECT avg_nll,
                   row_number() OVER (ORDER BY avg_nll, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM perdoc)
          WHERE rn * 2 = n + (n % 2))
        SELECT lang,
               CAST(sum(CASE WHEN h < 80 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_train,
               CAST(sum(CASE WHEN h >= 90 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_out,
               CAST(sum(CASE WHEN h < 80 AND avg_nll < tau THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(sum(CASE WHEN h >= 90 AND avg_nll < tau THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(sum(CASE WHEN h < 80 AND avg_nll < tau THEN 1 ELSE 0 END)
                 * 10000 // sum(CASE WHEN h < 80 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tpr_bp,
               CAST(sum(CASE WHEN h >= 90 AND avg_nll < tau THEN 1 ELSE 0 END)
                 * 10000 // sum(CASE WHEN h >= 90 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fpr_bp,
               CAST(sum(CASE WHEN h < 80 AND avg_nll < tau THEN 1 ELSE 0 END)
                 * 10000 // sum(CASE WHEN h < 80 THEN 1 ELSE 0 END)
                 - sum(CASE WHEN h >= 90 AND avg_nll < tau THEN 1 ELSE 0 END)
                 * 10000 // sum(CASE WHEN h >= 90 THEN 1 ELSE 0 END)
                 AS BIGINT) AS advantage_bp
        FROM perdoc, tau GROUP BY 1
        HAVING sum(CASE WHEN h < 80 THEN 1 ELSE 0 END) > 0
           AND sum(CASE WHEN h >= 90 THEN 1 ELSE 0 END) > 0
        ORDER BY 1"""))
  )
}
