package graft.queries

import graft.Tables.t
import graft.dedup.{Components, Dedup}
import graft.functions.{TextFunctions, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 coverage additions across SURVEY §2 sections:
  *
  *  - §2A relational: CUBE hierarchy (q80), ntile decile stats (q81),
  *    INTERSECT/EXCEPT set reconciliation (q82) — admin-reporting shapes
  *    the reference serves from PostgreSQL.
  *  - §2C dedup: canonical-document selection per near-dup cluster (q36)
  *    — the "which copy do we keep" step after q35's clustering.
  *  - §2D similarity: ANN recall evaluation vs the brute-force baseline
  *    (q43) and per-label centroid/norm statistics (q44, the k-means
  *    E-step building block, dimension-parallel).
  *  - §2E text: TF-IDF top terms per document (q56).
  *  - §2G streaming: per-window duplicate accounting (q73), the batch
  *    equivalent of dropDuplicatesWithinWatermark state bounds.
  *
  * All aggregates follow the OUTPUT-TYPE RULE (SURVEY §4): BIGINT/DOUBLE/
  * STRING outputs only, decimal-exact internal sums, integer basis-point
  * ratios, round() only on irrational-input values.
  */
object QueriesH extends QueryPack {

  private val wSql = TextFunctions.wordsSql("text")

  /** q51's composite quality score (SURVEY §2E) as a standalone
    * projection — q36 ranks cluster members by it. */
  private def qualityProjected(df: DataFrame): DataFrame =
    df.withColumn("w", TextFunctions.words(col("text")))
      .withColumn("n_words", size(col("w")))
      .withColumn("n_distinct", size(array_distinct(col("w"))))
      .withColumn("sum_wlen", expr("aggregate(w, 0, (acc, x) -> acc + length(x))"))
      .withColumn("n_stop",
        TextFunctions.langScore(col("w"), TextFunctions.langMarkers.toMap.apply("en")))
      .select(col("doc_id"), col("n_chars"),
        expr("n_distinct * 5000 DIV n_words" +
          " + least(sum_wlen * 300 DIV n_words, 3000)" +
          " + (2000 - n_stop * 2000 DIV n_words)").as("quality_bp"))

  private val qualitySql: String =
    s"""SELECT doc_id, n_chars,
          CAST(n_distinct * 5000 // n_words
            + least(sum_wlen * 300 // n_words, 3000)
            + (2000 - n_stop * 2000 // n_words) AS BIGINT) AS quality_bp
        FROM (SELECT doc_id, n_chars, len(w) AS n_words,
                     len(list_distinct(w)) AS n_distinct,
                     list_sum(list_transform(w, x -> length(x))) AS sum_wlen,
                     ${TextFunctions.langScoreSql("w", TextFunctions.langMarkers.toMap.apply("en"))} AS n_stop
              FROM (SELECT doc_id, n_chars, $wSql AS w FROM documents))"""

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q80
    // CUBE over (status, priority): every subtotal combination plus a
    // grouping id, one pass. Spark expands CUBE into a single Expand +
    // hash aggregate — partial aggregation applies per grouping set, so
    // at 100 TB this is one shuffle, not 4 queries.
    QDef("q80_cube",
      (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
              .cast("bigint").as("gid"),
            count(lit(1)).as("n"),
            Q.dec38(sum(Q.dec(col("o_totalprice")))).as("sum_price"))
          .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
            col("gid"), col("n"), col("sum_price"))
          .orderBy("gid", "status", "priority")
      },
      Some(s"""
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS ${Q.decSql})) AS ${Q.dec38Sql}) AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY gid, status, priority""")),

    // ---------------------------------------------------------------- q81
    // Decile statistics per market segment: ntile(10) over a total order
    // (value, key) — the balance-distribution report. One shuffle on the
    // segment; ntile is rank math, deterministic under the total order.
    QDef("q81_ntile_deciles",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("decile", ntile(10).over(w).cast("bigint"))
          .groupBy(col("c_mktsegment").as("seg"), col("decile"))
          .agg(count(lit(1)).as("n"),
            min(col("c_acctbal")).as("lo"),
            max(col("c_acctbal")).as("hi"),
            Q.dec38(sum(Q.dec(col("c_acctbal")))).as("sum_bal"))
          .orderBy("seg", "decile")
      },
      Some(s"""
        WITH d AS (
          SELECT c_mktsegment AS seg, c_acctbal,
                 CAST(ntile(10) OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile
          FROM customer)
        SELECT seg, decile, count(*) AS n,
               min(c_acctbal) AS lo, max(c_acctbal) AS hi,
               CAST(sum(CAST(c_acctbal AS ${Q.decSql})) AS ${Q.dec38Sql}) AS sum_bal
        FROM d
        GROUP BY 1, 2
        ORDER BY seg, decile""")),

    // ---------------------------------------------------------------- q82
    // Set reconciliation between two collection periods: EXCEPT /
    // INTERSECT / UNION on distinct key sets (who churned, who stayed —
    // the reference's listing-population diff between scan epochs). Each
    // set op is one shuffle on the key; counts roll up map-side.
    QDef("q82_set_ops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def keys(loY: Int, hiY: Int): DataFrame =
          o.filter(year(col("o_orderdate")).between(loY, hiY))
            .select(col("o_custkey")).distinct()
        val a = keys(1995, 1996)
        val b = keys(1997, 1998)
        def cnt(op: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).cast("bigint").as("n")).select(lit(op).as("op"), col("n"))
        cnt("a_only", a.except(b))
          .union(cnt("b_only", b.except(a)))
          .union(cnt("both", a.intersect(b)))
          .union(cnt("either", a.union(b).distinct()))
          .orderBy("op")
      },
      Some("""
        WITH a AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) BETWEEN 1995 AND 1996),
             b AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) BETWEEN 1997 AND 1998)
        SELECT 'a_only' AS op, count(*) AS n FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        UNION ALL
        SELECT 'b_only', count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        UNION ALL
        SELECT 'both', count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        UNION ALL
        SELECT 'either', count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)
        ORDER BY op""")),

    // ---------------------------------------------------------------- q36
    // Canonical-document selection: near-dup clusters (q35's machinery)
    // ranked by the q51 quality score — keep the best copy, account the
    // chars dropped. The final step of the dedup pipeline: cluster →
    // choose representative → discard the rest.
    QDef("q36_dedup_keep_best",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val labels = Components.connectedComponents(pairs, "id_a", "id_b")
        val quality = qualityProjected(t(s, dir, "documents"))
        val member = labels.join(quality, labels("id") === quality("doc_id"))
          .select(col("lbl").as("cluster"), col("doc_id"), col("quality_bp"), col("n_chars"))
        // one aggregation instead of window + separate agg + join: the
        // keeper (quality desc, doc_id asc) is min of a (-quality, doc)
        // struct — lexicographic struct ordering, single shuffle
        member.groupBy("cluster").agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("bigint").as("total_chars"),
            min(struct((-col("quality_bp")).as("nq"), col("doc_id").as("d"),
              col("quality_bp").as("q"), col("n_chars").as("nc"))).as("k"))
          .select(col("cluster"), col("n_docs"), col("k.d").as("keep_doc"),
            col("k.q").as("keep_quality_bp"),
            (col("total_chars") - col("k.nc")).as("drop_chars"))
          .orderBy("cluster")
      },
      Some {
        val edgesSql =
          s"SELECT id_a, id_b FROM (${QueriesC.candidatePairsSql} SELECT id_a, id_b FROM pairs)"
        s"""
        WITH labels AS (SELECT * FROM (${Components.labelPropagationSql(edgesSql)})),
        q AS ($qualitySql),
        m AS (SELECT l.lbl AS cluster, q.doc_id, q.quality_bp, q.n_chars
              FROM labels l JOIN q ON q.doc_id = l.id),
        k AS (SELECT cluster, doc_id AS keep_doc, quality_bp AS keep_quality_bp,
                     n_chars AS keep_chars
              FROM (SELECT m.*, row_number() OVER (PARTITION BY cluster
                      ORDER BY quality_bp DESC, doc_id) AS rn FROM m)
              WHERE rn = 1),
        a AS (SELECT cluster, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM m GROUP BY 1)
        SELECT a.cluster AS cluster, n_docs, keep_doc, keep_quality_bp,
               CAST(total_chars - keep_chars AS BIGINT) AS drop_chars
        FROM a JOIN k ON a.cluster = k.cluster
        ORDER BY cluster"""
      }),

    // ---------------------------------------------------------------- q43
    // ANN quality evaluation: recall of the LSH-bucketed top-k (q41)
    // against the brute-force ground truth (q40), per query vector — the
    // accept/reject gate before an approximate index ships. Reuses both
    // §2D pipelines verbatim; the comparison itself is two tiny
    // aggregations.
    QDef("q43_ann_recall",
      (s, dir) => {
        val brute = QueriesD.queries("q40_knn_brute")(s, dir).select(col("q_id"), col("vec_id"))
        val lsh = QueriesD.queries("q41_knn_lsh")(s, dir).select(col("q_id"), col("vec_id"))
        val hits = brute.join(lsh, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).cast("bigint").as("n_hits"))
        brute.groupBy("q_id").agg(count(lit(1)).cast("bigint").as("k_total"))
          .join(hits, Seq("q_id"), "left_outer")
          .select(col("q_id"), col("k_total"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall_bp", expr("n_hits * 10000 DIV k_total"))
          .orderBy("q_id")
      },
      Some(s"""
        WITH brute AS (SELECT q_id, vec_id FROM (${QueriesD.oracleSql("q40_knn_brute")})),
             lsh AS (SELECT q_id, vec_id FROM (${QueriesD.oracleSql("q41_knn_lsh")})),
             hits AS (SELECT b.q_id, count(*) AS n_hits
                      FROM brute b JOIN lsh l ON b.q_id = l.q_id AND b.vec_id = l.vec_id
                      GROUP BY 1),
             tot AS (SELECT q_id, count(*) AS k_total FROM brute GROUP BY 1)
        SELECT t.q_id AS q_id, CAST(k_total AS BIGINT) AS k_total,
               CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
               CAST(coalesce(n_hits, 0) * 10000 // k_total AS BIGINT) AS recall_bp
        FROM tot t LEFT JOIN hits h ON t.q_id = h.q_id
        ORDER BY q_id""")),

    // ---------------------------------------------------------------- q44
    // Per-label embedding centroid statistics, dimension-parallel: explode
    // (label, dim, x) → decimal-exact per-dim sums (order-independent
    // across any partitioning) → centroid norm. The k-means E-step shape:
    // at 100 TB the per-dim partial sums combine map-side, one shuffle of
    // |labels|×dim rows, no vector ever collected to the driver.
    QDef("q44_centroid",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val nstats = e
          .select(col("label"), VectorOps.norm("embedding").as("nrm"))
          .groupBy("label").agg(
            count(lit(1)).cast("bigint").as("n_vecs"),
            sum(col("nrm").cast(DecimalType(28, 9))).cast("double").as("sum_norm"))
        val dims = e
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("label", "dim")
          .agg(sum(col("x").cast("double").cast(DecimalType(28, 9))).cast("double").as("sd"))
        val sq = dims.groupBy("label")
          .agg(sum((col("sd") * col("sd")).cast(DecimalType(30, 12))).cast("double").as("sumsq"))
        nstats.join(sq, "label")
          .select(col("label").cast("bigint").as("label"), col("n_vecs"),
            round(sqrt(col("sumsq")) / col("n_vecs"), 6).as("cnorm6"),
            col("sum_norm"))
          .orderBy("label")
      },
      Some(s"""
        WITH ex AS (
          SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        dims AS (SELECT label, dim, CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sd
                 FROM ex GROUP BY 1, 2),
        sq AS (SELECT label, CAST(sum(CAST(sd * sd AS DECIMAL(30,12))) AS DOUBLE) AS sumsq
               FROM dims GROUP BY 1),
        nst AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                       CAST(sum(CAST(${VectorOps.normSql("embedding")} AS DECIMAL(28,9))) AS DOUBLE) AS sum_norm
                FROM embeddings GROUP BY 1)
        SELECT CAST(n.label AS BIGINT) AS label, n_vecs,
               round(sqrt(sumsq) / n_vecs, 6) AS cnorm6,
               sum_norm
        FROM nst n JOIN sq s ON n.label = s.label
        ORDER BY label""")),

    // ---------------------------------------------------------------- q56
    // TF-IDF top terms per document: term frequency × inverse document
    // frequency, top 3 per doc (restricted output; df spans the FULL
    // corpus). Two hash aggregations over one exploded token stream —
    // the q54 vocabulary shuffle plus a broadcast of the corpus size.
    QDef("q56_tfidf",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("tok"))
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("bigint").as("df"))
        val n = t(s, dir, "documents").agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(col("tfidf6").desc, col("tok"))
        tf.join(dfreq, "tok").crossJoin(broadcast(n))
          .withColumn("tfidf6", round(col("tf") * log(col("n_docs") / col("df")), 6))
          .filter(col("doc_id") < 30)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"), col("tfidf6"))
          .orderBy("doc_id", "rn")
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, unnest($wSql) AS tok FROM documents),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.tok, t.tf, d.df,
                 round(t.tf * ln(n_docs / d.df), 6) AS tfidf6
          FROM tf t JOIN dfreq d ON t.tok = d.tok CROSS JOIN n
          WHERE t.doc_id < 30),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY tfidf6 DESC, tok) AS rn FROM scored)
        SELECT doc_id, rn, tok, tf, df, tfidf6 FROM ranked
        WHERE rn <= 3
        ORDER BY doc_id, rn""")),

    // ---------------------------------------------------------------- q73
    // Streaming-dedup accounting, batch-equivalent: per 10-minute window,
    // events vs distinct (user, type) keys — exactly the state a
    // dropDuplicatesWithinWatermark operator would hold (bounded by the
    // watermark horizon; see streaming/StreamOps for the streaming form).
    QDef("q73_stream_dedup",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr("ts DIV 1000000 DIV 600000 AS w", "user_id", "event_type")
          .groupBy("w")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id"), col("event_type")).as("n_keys"))
          .withColumn("dup_events", col("n_events") - col("n_keys"))
          .orderBy("w")
      },
      Some("""
        WITH e AS (SELECT epoch_ms(ts) // 600000 AS w, user_id, event_type FROM events)
        SELECT w, count(*) AS n_events,
               CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS n_keys,
               CAST(count(*) - count(DISTINCT (user_id, event_type)) AS BIGINT) AS dup_events
        FROM e
        GROUP BY w
        ORDER BY w""")),
  )
}
