package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 139 — classical-statistics and
  * shallow-ML training primitives, all on bounded aggregate domains:
  *
  *  - q574: decision stump by information gain — label return-rate,
  *    feature p_size (bounded 1..50): prefix sums over the size census
  *    give every threshold's split counts in one window pass; entropy
  *    terms in DOUBLE with the formula text mirrored byte-for-byte in
  *    the oracle, final gain floor-micro; argmax threshold with
  *    deterministic ties.
  *  - q575: Nelson–Aalen cumulative hazard of fulfillment survival —
  *    PURE-INTEGER hazard increments d·1e6 DIV r on the bounded
  *    duration domain (suffix-sum risk sets as q559), reported at
  *    30-day grid points. The hazard-space companion to q152/q404 KM.
  *  - q576: G-test (likelihood-ratio χ²) for mktsegment × orderstatus:
  *    exact contingency counts, expected values in DOUBLE, per-cell
  *    2·O·ln(O/E) floor-micro then exactly summed; df from the
  *    realized table dimensions.
  *  - q577: multinomial naive Bayes predicting document lang: top-200
  *    vocabulary (deterministic tie order), add-1 smoothed per-class
  *    word log-likelihoods floor-micro on the bounded (lang × vocab)
  *    table, per-doc argmax with prior; per-lang accuracy. The
  *    lang-id heuristic (q51) upgraded to a trained classifier.
  *
  * Scale shapes: q574/q576 aggregate facts to ≤50/≤15 cells before
  * windows; q575's domain is bounded durations; q577 touches raw text
  * once (explode → vocab broadcast join), scores via a docs×langs
  * (constant ≤ 5) fan-out.
  */
object QueriesEP extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q574
    QDef("q574_info_gain_stump",
      (s, dir) => {
        val census = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_size"))),
            expr("l_partkey = p_partkey"))
          .groupBy(col("p_size").cast("long").as("sz"))
          .agg(count(lit(1)).as("ns"), sum("y").cast("long").as("ps"))
        val w = Window.orderBy("sz")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = census.agg(sum("ns").cast("long").as("n"),
          sum("ps").cast("long").as("p"))
        census
          .withColumn("nl", sum("ns").over(w).cast("long"))
          .withColumn("pl", sum("ps").over(w).cast("long"))
          .crossJoin(broadcast(tot))
          .where(expr("nl < n"))
          .selectExpr("sz AS threshold", "nl", "n - nl AS nr",
            """CAST(floor((
                 (CASE WHEN p = 0 OR p = n THEN 0.0 ELSE
                   -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n)
                   - (CAST(n - p AS DOUBLE) / n) * ln(CAST(n - p AS DOUBLE) / n) END)
                 - (CAST(nl AS DOUBLE) / n) *
                   (CASE WHEN pl = 0 OR pl = nl THEN 0.0 ELSE
                     -(CAST(pl AS DOUBLE) / nl) * ln(CAST(pl AS DOUBLE) / nl)
                     - (CAST(nl - pl AS DOUBLE) / nl) * ln(CAST(nl - pl AS DOUBLE) / nl) END)
                 - (CAST(n - nl AS DOUBLE) / n) *
                   (CASE WHEN p - pl = 0 OR p - pl = n - nl THEN 0.0 ELSE
                     -(CAST(p - pl AS DOUBLE) / (n - nl)) * ln(CAST(p - pl AS DOUBLE) / (n - nl))
                     - (CAST(n - nl - p + pl AS DOUBLE) / (n - nl)) * ln(CAST(n - nl - p + pl AS DOUBLE) / (n - nl)) END)
               ) * 1000000) AS BIGINT) AS gain_micro""")
          .orderBy(col("gain_micro").desc, col("threshold"))
          .limit(1)
      },
      Some("""
        WITH census AS (
          SELECT CAST(p.p_size AS BIGINT) AS sz,
                 CAST(count(*) AS BIGINT) AS ns,
                 CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ps
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1),
        pre AS (
          SELECT sz,
                 CAST(sum(ns) OVER (ORDER BY sz ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS nl,
                 CAST(sum(ps) OVER (ORDER BY sz ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS pl
          FROM census),
        tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n,
                       CAST(sum(ps) AS BIGINT) AS p FROM census)
        SELECT sz AS threshold, nl, n - nl AS nr,
               CAST(floor((
                 (CASE WHEN p = 0 OR p = n THEN 0.0 ELSE
                   -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n)
                   - (CAST(n - p AS DOUBLE) / n) * ln(CAST(n - p AS DOUBLE) / n) END)
                 - (CAST(nl AS DOUBLE) / n) *
                   (CASE WHEN pl = 0 OR pl = nl THEN 0.0 ELSE
                     -(CAST(pl AS DOUBLE) / nl) * ln(CAST(pl AS DOUBLE) / nl)
                     - (CAST(nl - pl AS DOUBLE) / nl) * ln(CAST(nl - pl AS DOUBLE) / nl) END)
                 - (CAST(n - nl AS DOUBLE) / n) *
                   (CASE WHEN p - pl = 0 OR p - pl = n - nl THEN 0.0 ELSE
                     -(CAST(p - pl AS DOUBLE) / (n - nl)) * ln(CAST(p - pl AS DOUBLE) / (n - nl))
                     - (CAST(n - nl - p + pl AS DOUBLE) / (n - nl)) * ln(CAST(n - nl - p + pl AS DOUBLE) / (n - nl)) END)
               ) * 1000000) AS BIGINT) AS gain_micro
        FROM pre, tot WHERE nl < n
        ORDER BY gain_micro DESC, threshold LIMIT 1""")),

    // --------------------------------------------------------------- q575
    QDef("q575_nelson_aalen",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), expr("o_orderkey = l_orderkey"))
          .groupBy("o_orderkey", "o_orderstatus", "o_orderdate")
          .agg(max(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))"))
            .as("last_ship"))
          .selectExpr(
            """(last_ship - unix_millis(CAST(o_orderdate AS TIMESTAMP)))
               DIV 86400000 AS tt""",
            "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS ev")
          .where(expr("tt >= 0"))
        val cells = base.groupBy("tt").agg(
          sum("ev").cast("long").as("d"), count(lit(1)).as("c"))
        val nTot = base.agg(count(lit(1)).as("n"))
        val wc = Window.orderBy("tt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.crossJoin(broadcast(nTot))
          .withColumn("cum", sum("c").over(wc).cast("long"))
          // risk set entering tt; hazard increment is PURE integer
          .selectExpr("tt", "d", "n - cum + c AS r")
          .selectExpr("tt",
            "CASE WHEN d > 0 AND r > 0 THEN d * 1000000 DIV r ELSE 0L END AS inc")
          .withColumn("h_micro", sum("inc").over(wc).cast("long"))
          .groupBy(expr("tt DIV 30").as("bucket"))
          .agg(max(struct(col("tt"), col("h_micro"))).as("m"))
          .selectExpr("bucket", "m.tt AS t_end", "m.h_micro AS h_micro")
          .orderBy("bucket")
      },
      Some("""
        WITH base AS (
          SELECT (max(epoch_ms(l.l_shipdate)) - epoch_ms(o.o_orderdate))
                   // 86400000 AS tt,
                 CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, o.o_orderstatus, o.o_orderdate
          HAVING (max(epoch_ms(l.l_shipdate)) - epoch_ms(o.o_orderdate))
                   // 86400000 >= 0),
        cells AS (
          SELECT tt, CAST(sum(ev) AS BIGINT) AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        r AS (
          SELECT tt, d,
                 n - CAST(sum(c) OVER (ORDER BY tt ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) + c AS r
          FROM cells, tot),
        h AS (
          SELECT tt,
                 CAST(sum(CASE WHEN d > 0 AND r > 0
                   THEN d * 1000000 // r ELSE 0 END)
                   OVER (ORDER BY tt ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS h_micro
          FROM r)
        SELECT tt // 30 AS bucket, tt AS t_end, h_micro
        FROM h
        QUALIFY row_number() OVER (PARTITION BY tt // 30 ORDER BY tt DESC) = 1
        ORDER BY bucket""")),

    // --------------------------------------------------------------- q576
    QDef("q576_gtest",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .select("o_custkey", "o_orderstatus")
          .join(t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
            expr("o_custkey = c_custkey"))
          .groupBy("c_mktsegment", "o_orderstatus")
          .agg(count(lit(1)).as("o"))
        val wr = Window.partitionBy("c_mktsegment")
        val wc = Window.partitionBy("o_orderstatus")
        val wa = Window.partitionBy()
        cells
          .withColumn("rt", sum("o").over(wr).cast("long"))
          .withColumn("ct", sum("o").over(wc).cast("long"))
          .withColumn("n", sum("o").over(wa).cast("long"))
          .withColumn("nr", size(collect_set("c_mktsegment").over(wa)))
          .withColumn("nc", size(collect_set("o_orderstatus").over(wa)))
          .selectExpr("o", "n", "nr", "nc",
            """CAST(floor(2000000.0 * o *
                 ln(CAST(o AS DOUBLE) * n / (CAST(rt AS DOUBLE) * ct)))
               AS BIGINT) AS term""")
          .groupBy("n", "nr", "nc")
          .agg(sum("term").cast("long").as("g_micro"))
          .selectExpr("n", "CAST((nr - 1) * (nc - 1) AS BIGINT) AS df",
            "g_micro")
      },
      Some("""
        WITH cells AS (
          SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st,
                 CAST(count(*) AS BIGINT) AS o
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        m AS (
          SELECT o,
                 CAST(sum(o) OVER (PARTITION BY seg) AS BIGINT) AS rt,
                 CAST(sum(o) OVER (PARTITION BY st) AS BIGINT) AS ct,
                 CAST(sum(o) OVER () AS BIGINT) AS n
          FROM cells),
        d AS (
          SELECT CAST(count(DISTINCT seg) AS BIGINT) AS nr,
                 CAST(count(DISTINCT st) AS BIGINT) AS nc
          FROM cells)
        SELECT max(m.n) AS n, max((d.nr - 1) * (d.nc - 1)) AS df,
               CAST(sum(CAST(floor(2000000.0 * m.o *
                 ln(CAST(m.o AS DOUBLE) * m.n
                   / (CAST(m.rt AS DOUBLE) * m.ct))) AS BIGINT)) AS BIGINT)
                 AS g_micro
        FROM m, d""")),

    // --------------------------------------------------------------- q577
    QDef("q577_naive_bayes",
      (s, dir) => {
        // DRIVER COMPACTION over the vocabulary-bounded censuses (r10):
        // the (lang x word) count table and the per-lang doc counts are
        // tiny by construction, so vocabulary, smoothed log-likelihoods
        // and priors are Scala arithmetic (Math.log == Spark ln); the
        // cluster does exactly two tokenize passes — the census and the
        // per-doc scoring sum against a broadcast word -> llw-vector
        // table — and one groupBy(doc_id). The r9 form ran the grid
        // window, vocab top-k, prior and x|langs| explode as separate
        // jobs (5.7s at sf1, the documented exemption).
        val sc3 = s
        import sc3.implicits._
        val docs = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("doc_id"), col("lang"),
            TextFunctions.words(col("text")).as("w"))
        val dw = docs.select(col("doc_id"), col("lang"),
          explode(col("w")).as("word"))
        val wcRows = dw.groupBy("lang", "word").agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // deterministic top-200 vocabulary (cnt desc, word asc)
        val vocab = wcRows.groupBy(_._2).view
          .mapValues(_.map(_._3).sum).toSeq
          .sortBy { case (w, c) => (-c, w) }.take(200).map(_._1)
        val vset = vocab.toSet
        val ndRows = docs.groupBy("lang").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // null lang is a legitimate group (NullInputSpec): sort it first
        // (Spark's asc nulls-first); at most one null key exists, so the
        // String ordering never sees null
        val langs = ndRows.map(_._1).sortBy(l => (l != null, l))
        val ndt = ndRows.map(_._2).sum
        val prior = ndRows.map { case (l, n) =>
          l -> math.floor(math.log(n.toDouble / ndt) * 1000000).toLong
        }.toMap
        val wcMap = wcRows.filter(r => vset(r._2))
          .map(r => (r._1, r._2) -> r._3).toMap
        val tot = langs.map(l =>
          l -> vocab.map(w => wcMap.getOrElse((l, w), 0L)).sum).toMap
        // add-1 smoothed log-likelihood on the bounded (lang x vocab) grid
        def llw(l: String, w: String): Long =
          math.floor(math.log((wcMap.getOrElse((l, w), 0L) + 1).toDouble
            / (tot(l) + 200)) * 1000000).toLong
        if (langs.isEmpty) {
          // empty corpus: no langs, empty board (the agg/argmax column
          // builders below need >=1 lang)
          Seq.empty[(String, Long, Long, Long)]
            .toDF("lang", "n_docs", "n_correct", "acc_bp")
        } else {
          val pivot = vocab.map(w => (w, langs.map(l => llw(l, w))))
            .toDF("word", "ll")
          val swCols = langs.indices.map(j =>
            sum(element_at(col("ll"), j + 1)).as(s"sw$j"))
          val sums = dw.join(broadcast(pivot), "word")
            .groupBy("doc_id").agg(swCols.head, swCols.tail: _*)
          // argmax with smallest-clang tie-break (exactly the oracle's
          // ORDER BY score DESC, clang). DuckDB's ORDER BY is NULLS LAST
          // while Spark's struct-min compares a null field FIRST, so the
          // comparison key maps the null-lang class to a U+FFFF sentinel
          // (sorts after every real lang code) and the true — possibly
          // null — lang rides along as payload, only read back after the
          // min. The payload field never participates in the comparison:
          // the sort key is unique per candidate.
          def langLit(l: String) =
            if (l == null) lit(null).cast("string") else lit(l)
          val cand = array(langs.indices.map(j => struct(
            (-(lit(prior(langs(j))) + coalesce(col(s"sw$j"), lit(0L)))).as("n"),
            lit(if (langs(j) == null) "\uffff" else langs(j)).as("ck"),
            langLit(langs(j)).as("c"))): _*)
          val pred = docs.select("doc_id", "lang")
            .join(sums, Seq("doc_id"), "left_outer")
            .select(col("lang"), array_min(cand).getField("c").as("pred"))
          pred.groupBy("lang").agg(
              count(lit(1)).as("n_docs"),
              sum(when(col("lang") === col("pred"), 1L).otherwise(0L))
                .cast("long").as("n_correct"))
            .selectExpr("lang", "n_docs", "n_correct",
              "n_correct * 10000 DIV n_docs AS acc_bp")
            .orderBy("lang")
        }
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, lang, ${TextFunctions.wordsSql("text")} AS w
          FROM documents WHERE text IS NOT NULL),
        dw AS (
          SELECT doc_id, lang, unnest(w) AS word FROM docs),
        vocab AS (
          SELECT word FROM (
            SELECT word, count(*) AS cnt FROM dw GROUP BY 1)
          ORDER BY cnt DESC, word LIMIT 200),
        langs AS (SELECT DISTINCT lang FROM docs),
        wc AS (
          SELECT d.lang, d.word, CAST(count(*) AS BIGINT) AS c
          FROM dw d JOIN vocab v ON d.word = v.word GROUP BY 1, 2),
        grid AS (
          SELECT l.lang AS clang, v.word,
                 coalesce(wc.c, 0) AS c
          FROM langs l CROSS JOIN vocab v
          LEFT JOIN wc ON wc.lang = l.lang AND wc.word = v.word),
        ll AS (
          SELECT clang, word,
                 CAST(floor(ln(CAST(c + 1 AS DOUBLE) /
                   (CAST(sum(c) OVER (PARTITION BY clang) AS BIGINT) + 200))
                   * 1000000) AS BIGINT) AS llw_micro
          FROM grid),
        prior AS (
          SELECT lang AS clang,
                 CAST(floor(ln(CAST(count(*) AS DOUBLE) /
                   (SELECT count(*) FROM docs)) * 1000000) AS BIGINT)
                   AS prior_micro
          FROM docs GROUP BY 1),
        sums AS (
          SELECT d.doc_id, ll.clang, CAST(sum(ll.llw_micro) AS BIGINT) AS sw
          FROM dw d JOIN ll ON d.word = ll.word GROUP BY 1, 2),
        scores AS (
          SELECT d.doc_id, d.lang, p.clang,
                 p.prior_micro + coalesce(s.sw, 0) AS score
          FROM (SELECT DISTINCT doc_id, lang FROM docs) d
          CROSS JOIN prior p
          LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.clang = p.clang),
        pred AS (
          SELECT lang, clang AS pred FROM scores
          QUALIFY row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, clang) = 1)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang = pred THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_correct,
               CAST(sum(CASE WHEN lang = pred THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS acc_bp
        FROM pred GROUP BY 1 ORDER BY 1"""))
  )
}
