package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 140 — corpus-statistics and fuzzy
  * vocabulary dedup for the text-pipeline family:
  *
  *  - q578: FastSS edit-distance-1 vocabulary pairs: each word's
  *    deletion neighborhood (delete one char, plus the word itself)
  *    becomes join keys — every edit-1 pair shares a variant, so the
  *    candidate search is a hash equi-join on variants (NEVER a
  *    pairwise scan); candidates verified with exact levenshtein ≤ 1.
  *    The fuzzy sibling of exact vocab dedup (q54).
  *  - q579: Zipf rank-frequency slope of the top-100 words: ln(rank)/
  *    ln(cnt) floor-micro per row (exact integer sums — parallel
  *    double summation is order-dependent, quantized terms are not),
  *    OLS slope in mirrored doubles from the integer component sums.
  *  - q580: lexical richness per source: type-token ratio, hapax
  *    ratio, Guiraud index — exact integer ratios, sqrt floor-milli.
  *  - q581: Jensen–Shannon divergence of each source's unigram
  *    distribution vs the corpus (top-50 vocab + rest bucket):
  *    probabilities as exact ppm integers, per-term 0.5·p·ln(2p/(p+q))
  *    floor-micro then exactly summed.
  *
  * Scale shapes: q578 joins on deletion variants (bounded word length
  * ⇒ ≤15 variants per word); q579/q581 reduce to bounded vocab
  * domains before any window; q580 is two hash aggregations.
  */
object QueriesEQ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q578
    QDef("q578_fastss_edit1",
      (s, dir) => {
        val vocab = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(explode(TextFunctions.words(col("text"))).as("w"))
          .where(expr("length(w) BETWEEN 6 AND 14"))
          .distinct()
        val vars = vocab.select(col("w"), explode(expr(
            """transform(sequence(0, length(w)), i ->
                 CASE WHEN i = 0 THEN w
                   ELSE substring(w, 1, i - 1) || substring(w, i + 1, 14) END)"""))
            .as("v"))
          .distinct()
        val cand = vars.selectExpr("w AS w1", "v")
          .join(vars.selectExpr("w AS w2", "v"), Seq("v"))
          .where(expr("w1 < w2"))
          .select("w1", "w2").distinct()
        val nv = vocab.agg(count(lit(1)).as("n_vocab"))
        cand
          .withColumn("e1",
            when(levenshtein(col("w1"), col("w2")) <= 1, 1L).otherwise(0L))
          .agg(count(lit(1)).as("n_candidates"),
            sum("e1").cast("long").as("n_edit1_pairs"))
          .crossJoin(broadcast(nv))
          .selectExpr("n_vocab", "n_candidates", "n_edit1_pairs")
      },
      Some(s"""
        WITH vocab AS (
          SELECT DISTINCT unnest(${TextFunctions.wordsSql("text")}) AS w
          FROM documents WHERE text IS NOT NULL),
        fv AS (SELECT w FROM vocab WHERE length(w) BETWEEN 6 AND 14),
        vars AS (
          SELECT DISTINCT w,
                 unnest(list_transform(range(0, length(w) + 1), i ->
                   CASE WHEN i = 0 THEN w
                     ELSE substr(w, 1, CAST(i - 1 AS INT))
                       || substr(w, CAST(i + 1 AS INT), 14) END)) AS v
          FROM fv),
        cand AS (
          SELECT DISTINCT a.w AS w1, b.w AS w2
          FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n_candidates,
                 CAST(sum(CASE WHEN levenshtein(w1, w2) <= 1 THEN 1 ELSE 0
                   END) AS BIGINT) AS n_edit1_pairs
          FROM cand)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM fv) AS n_vocab,
               n_candidates, n_edit1_pairs
        FROM c""")),

    // --------------------------------------------------------------- q579
    QDef("q579_zipf_slope",
      (s, dir) => {
        val top = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(explode(TextFunctions.words(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(100)
        val pts = top
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cnt").desc, col("w"))))
          .selectExpr(
            "CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS lx",
            "CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS ly")
        pts.agg(count(lit(1)).as("n"),
            sum("lx").cast("long").as("sx"), sum("ly").cast("long").as("sy"),
            sum(expr("lx * ly")).cast("long").as("sxy"),
            sum(expr("lx * lx")).cast("long").as("sxx"))
          .where(expr("n > 1 AND n * sxx > sx * sx"))
          .selectExpr("n AS n_points",
            """CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT)
               AS slope_milli""")
      },
      Some(s"""
        WITH wc AS (
          SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(${TextFunctions.wordsSql("text")}) AS w
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1),
        top AS (SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 100),
        pts AS (
          SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY cnt DESC, w)
                   AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
                 CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS ly
          FROM top),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
                 CAST(sum(lx * ly) AS BIGINT) AS sxy,
                 CAST(sum(lx * lx) AS BIGINT) AS sxx
          FROM pts)
        SELECT n AS n_points,
               CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT)
                 AS slope_milli
        FROM c WHERE n > 1 AND n * sxx > sx * sx""")),

    // --------------------------------------------------------------- q580
    QDef("q580_lexical_richness",
      (s, dir) => {
        val wc = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("source"),
            explode(TextFunctions.words(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        wc.groupBy("source").agg(
            sum("c").cast("long").as("tokens"),
            count(lit(1)).as("types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long")
              .as("hapax"))
          .where(expr("tokens > 0 AND types > 0"))
          .selectExpr("source", "tokens", "types", "hapax",
            "types * 1000000 DIV tokens AS ttr_ppm",
            "hapax * 1000000 DIV types AS hapax_ppm",
            """CAST(floor(CAST(types AS DOUBLE)
                 / sqrt(CAST(tokens AS DOUBLE)) * 1000) AS BIGINT)
               AS guiraud_milli""")
          .orderBy("source")
      },
      Some(s"""
        WITH wc AS (
          SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT source, unnest(${TextFunctions.wordsSql("text")}) AS w
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1, 2),
        agg AS (
          SELECT source, CAST(sum(c) AS BIGINT) AS tokens,
                 CAST(count(*) AS BIGINT) AS types,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax
          FROM wc GROUP BY 1)
        SELECT source, tokens, types, hapax,
               types * 1000000 // tokens AS ttr_ppm,
               hapax * 1000000 // types AS hapax_ppm,
               CAST(floor(CAST(types AS DOUBLE)
                 / sqrt(CAST(tokens AS DOUBLE)) * 1000) AS BIGINT)
                 AS guiraud_milli
        FROM agg WHERE tokens > 0 AND types > 0 ORDER BY source""")),

    // --------------------------------------------------------------- q581
    QDef("q581_js_divergence",
      (s, dir) => {
        val dw = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("source"),
            explode(TextFunctions.words(col("text"))).as("w"))
        val vocab = dw.groupBy("w").agg(count(lit(1)).as("gc"))
          .orderBy(col("gc").desc, col("w")).limit(50)
          .select("w")
        vocab.cache(); vocab.count()
        // per-source buckets: top-50 vocab counts + one rest bucket
        val st = dw.groupBy("source").agg(count(lit(1)).as("stok"))
        val sv = dw.join(broadcast(vocab), "w")
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val sgrid = st.crossJoin(broadcast(vocab))
          .join(sv, Seq("source", "w"), "left_outer")
          .selectExpr("source", "w", "stok", "coalesce(c, 0L) AS c")
        val srest = sgrid.groupBy("source", "stok")
          .agg((max("stok") - sum("c")).cast("long").as("c"))
          .selectExpr("source", "'∅rest' AS w", "stok", "c")
        val sb = sgrid.select("source", "w", "stok", "c").unionByName(srest)
        // global buckets
        val gt = dw.agg(count(lit(1)).as("gtok"))
        val gv = dw.join(broadcast(vocab), "w")
          .groupBy("w").agg(count(lit(1)).as("gc"))
        val ggrid = gt.crossJoin(broadcast(vocab))
          .join(gv, Seq("w"), "left_outer")
          .selectExpr("w", "gtok", "coalesce(gc, 0L) AS gc")
        val grest = ggrid.groupBy("gtok")
          .agg((max("gtok") - sum("gc")).cast("long").as("gc"))
          .selectExpr("'∅rest' AS w", "gtok", "gc")
        val gb = ggrid.select("w", "gtok", "gc").unionByName(grest)
        sb.join(broadcast(gb), Seq("w"))
          .selectExpr("source",
            "c * 1000000 DIV stok AS p",
            "gc * 1000000 DIV gtok AS q")
          .where(expr("p + q > 0"))
          .selectExpr("source",
            """CASE WHEN p > 0 THEN CAST(floor(0.5 * p *
                 ln(2.0 * p / (p + q))) AS BIGINT) ELSE 0L END AS tp""",
            """CASE WHEN q > 0 THEN CAST(floor(0.5 * q *
                 ln(2.0 * q / (p + q))) AS BIGINT) ELSE 0L END AS tq""")
          .groupBy("source")
          .agg(sum(expr("tp + tq")).cast("long").as("js_micro"))
          .orderBy("source")
      },
      Some(s"""
        WITH dw AS (
          SELECT source, unnest(${TextFunctions.wordsSql("text")}) AS w
          FROM documents WHERE text IS NOT NULL),
        vocab AS (
          SELECT w FROM (SELECT w, count(*) AS gc FROM dw GROUP BY 1)
          ORDER BY gc DESC, w LIMIT 50),
        st AS (SELECT source, CAST(count(*) AS BIGINT) AS stok
               FROM dw GROUP BY 1),
        sv AS (
          SELECT d.source, d.w, CAST(count(*) AS BIGINT) AS c
          FROM dw d JOIN vocab v ON d.w = v.w GROUP BY 1, 2),
        sgrid AS (
          SELECT st.source, v.w, st.stok, coalesce(sv.c, 0) AS c
          FROM st CROSS JOIN vocab v
          LEFT JOIN sv ON sv.source = st.source AND sv.w = v.w),
        sb AS (
          SELECT source, w, stok, c FROM sgrid
          UNION ALL
          SELECT source, '∅rest' AS w, stok,
                 CAST(max(stok) - sum(c) AS BIGINT) AS c
          FROM sgrid GROUP BY source, stok),
        gt AS (SELECT CAST(count(*) AS BIGINT) AS gtok FROM dw),
        gv AS (
          SELECT d.w, CAST(count(*) AS BIGINT) AS gc
          FROM dw d JOIN vocab v ON d.w = v.w GROUP BY 1),
        ggrid AS (
          SELECT v.w, gt.gtok, coalesce(gv.gc, 0) AS gc
          FROM gt CROSS JOIN vocab v LEFT JOIN gv ON gv.w = v.w),
        gb AS (
          SELECT w, gtok, gc FROM ggrid
          UNION ALL
          SELECT '∅rest' AS w, gtok,
                 CAST(max(gtok) - sum(gc) AS BIGINT) AS gc
          FROM ggrid GROUP BY gtok),
        pq AS (
          SELECT sb.source,
                 sb.c * 1000000 // sb.stok AS p,
                 gb.gc * 1000000 // gb.gtok AS q
          FROM sb JOIN gb ON sb.w = gb.w
          WHERE sb.c * 1000000 // sb.stok + gb.gc * 1000000 // gb.gtok > 0)
        SELECT source,
               CAST(sum(
                 (CASE WHEN p > 0 THEN CAST(floor(0.5 * p *
                    ln(2.0 * p / (p + q))) AS BIGINT) ELSE 0 END)
                 + (CASE WHEN q > 0 THEN CAST(floor(0.5 * q *
                    ln(2.0 * q / (p + q))) AS BIGINT) ELSE 0 END))
                 AS BIGINT) AS js_micro
        FROM pq GROUP BY 1 ORDER BY 1"""))
  )
}
