package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 96 — queueing staffing, planner cost
  * enumeration, generative classification, monotone calibration:
  *
  *  - q407: Erlang-C staffing per hour-of-day — offered load a = λ·s
  *    (90 s service) from exact integer counts; Erlang-B recurrence
  *    B_k = a·B_{k-1}/(k + a·B_{k-1}) for k ≤ 24 (pure IEEE +,*,/ in one
  *    fixed op order → bit-identical across engines), converted to the
  *    Erlang-C wait probability; c_req = min agents with wait ≤ 20%.
  *    Spark runs the bounded k-loop inside one typed flatMap per hour
  *    row (24 rows total — the heavy lifting is the upstream count agg);
  *    oracle = recursive CTE over k.
  *  - q408: Selinger-lite join-order enumeration over
  *    {orders, lineitem, customer} — measured (not estimated) pairwise
  *    join cardinalities, three left-deep plans costed as
  *    first-intermediate + final, ranked. The planner-economics shape:
  *    the FK-first plan wins because the unjoinable pair degenerates to
  *    a cross product.
  *  - q409: Naive Bayes language classifier — add-one-smoothed token
  *    likelihoods trained on q55's 80% hash split, scored on the 10%
  *    test split. Every per-token log term is floor-pico-quantized
  *    BEFORE the per-(doc,lang) sum, so the distributed aggregation is
  *    order-independent and exact; argmax via struct-max. Output is the
  *    5×5 confusion matrix — the classic counting-ML shape that scales
  *    as two groupBys and one join.
  *  - q410: isotonic calibration via the minimax formula — hash-decile
  *    score bins vs purchase outcome; ŷ_i = max_{j≤i} min_{k≥i}
  *    avg(y[j..k]) over micro-quantized weighted bin averages (exact
  *    BIGINT from prefix sums; the j≤i≤k triple enumeration is over 10
  *    bins — 220 rows — regardless of data volume). Equals the PAVA
  *    fit by the standard minimax characterization.
  *
  * Reference analog: harvest-worker staffing per hour, scrape-join
  * planning, review-language routing, calibrating listing-activity
  * scores against observed booking rates.
  */
object QueriesCY extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class ErlHour(h: Long, cnt: Long, days: Long)
  case class ErlRow(h: Long, cnt: Long, days: Long, k: Long, b: Double)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q407
    QDef("q407_erlang_staffing",
      (s, dir) => {
        import s.implicits._
        val hours = t(s, dir, "events")
          .selectExpr(s"(($tsMs) DIV 3600000) % 24 AS h",
            s"($tsMs) DIV 86400000 AS d")
          .groupBy("h").agg(count(lit(1)).as("cnt"),
            countDistinct("d").as("days"))
          .as[ErlHour]
        // bounded k-loop per hour row: Erlang-B recurrence, 24 candidates
        val bTab = hours.flatMap { r =>
          val a = r.cnt.toDouble / (r.days * 40).toDouble
          var b = 1.0
          (1L to 24L).map { k =>
            b = a * b / (k.toDouble + a * b)
            ErlRow(r.h, r.cnt, r.days, k, b)
          }
        }.toDF()
        val scored = bTab.selectExpr("h", "cnt", "days", "k",
          "CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE) AS a", "b")
          .selectExpr("h", "cnt", "days", "k", "a",
            "CASE WHEN CAST(k AS DOUBLE) > a THEN (CAST(k AS DOUBLE) * b) / (CAST(k AS DOUBLE) - a * (1.0 - b)) ELSE 1.0 END AS c")
        val req = scored
          .withColumn("ok", expr("CAST(k AS DOUBLE) > a AND c <= 0.2"))
          .groupBy("h").agg(
            max("cnt").as("cnt"), max("days").as("days"),
            expr("CAST(floor(max(a) * 1e6) AS BIGINT)").as("offered_micro"),
            min(when(col("ok"), col("k"))).as("c_req"))
        req.join(scored.select(col("h").as("h2"), col("k"), col("c")),
            col("h") === col("h2") && col("c_req") === col("k"), "left")
          .selectExpr("h", "cnt", "days", "offered_micro",
            "coalesce(c_req, -1) AS c_req",
            "coalesce(CAST(floor(c * 1e6) AS BIGINT), -1) AS wait_micro")
          .orderBy("h")
      },
      Some(s"""
        WITH RECURSIVE hours AS (
          SELECT (epoch_ms(ts) // 3600000) % 24 AS h,
                 count(*) AS cnt,
                 count(DISTINCT epoch_ms(ts) // 86400000) AS days
          FROM events GROUP BY 1),
        erl AS (
          SELECT h, cnt, days, CAST(1 AS BIGINT) AS k,
                 (CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE)) * 1.0
                   / (1.0 + (CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE)) * 1.0)
                   AS b
          FROM hours
          UNION ALL
          SELECT e.h, e.cnt, e.days, e.k + 1,
                 (CAST(e.cnt AS DOUBLE) / CAST(e.days * 40 AS DOUBLE)) * e.b
                   / (CAST(e.k + 1 AS DOUBLE)
                      + (CAST(e.cnt AS DOUBLE) / CAST(e.days * 40 AS DOUBLE)) * e.b)
          FROM erl e WHERE e.k < 24),
        scored AS (
          SELECT h, cnt, days, k,
                 CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE) AS a,
                 CASE WHEN CAST(k AS DOUBLE)
                        > CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE)
                      THEN (CAST(k AS DOUBLE) * b)
                        / (CAST(k AS DOUBLE)
                           - (CAST(cnt AS DOUBLE) / CAST(days * 40 AS DOUBLE))
                             * (1.0 - b))
                      ELSE 1.0 END AS c
          FROM erl),
        req AS (
          SELECT h, max(cnt) AS cnt, max(days) AS days,
                 CAST(floor(max(a) * 1e6) AS BIGINT) AS offered_micro,
                 min(CASE WHEN CAST(k AS DOUBLE) > a AND c <= 0.2
                     THEN k END) AS c_req
          FROM scored GROUP BY 1)
        SELECT r.h, r.cnt, r.days, r.offered_micro,
               coalesce(r.c_req, -1) AS c_req,
               coalesce(CAST(floor(s.c * 1e6) AS BIGINT), -1) AS wait_micro
        FROM req r LEFT JOIN scored s ON s.h = r.h AND s.k = r.c_req
        ORDER BY r.h""")),

    // --------------------------------------------------------------- q408
    QDef("q408_join_order_dp",
      (s, dir) => {
        val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
        val c = t(s, dir, "customer")
        val stats = o.agg(count(lit(1)).as("no")).crossJoin(
            l.agg(count(lit(1)).as("nl")).crossJoin(
              c.agg(count(lit(1)).as("nc"))))
          .crossJoin(o.join(l, col("o_orderkey") === col("l_orderkey"))
            .agg(count(lit(1)).as("n_ol")))
          .crossJoin(o.join(c, col("o_custkey") === col("c_custkey"))
            .agg(count(lit(1)).as("n_oc")))
          .crossJoin(o.join(l, col("o_orderkey") === col("l_orderkey"))
            .join(c, col("o_custkey") === col("c_custkey"))
            .agg(count(lit(1)).as("n_final")))
        val plans = stats.selectExpr(
          """explode(array(
               struct('OL_then_C' AS plan, n_ol AS first_rows),
               struct('OC_then_L' AS plan, n_oc AS first_rows),
               struct('LxC_then_O' AS plan, nl * nc AS first_rows))) AS p""",
          "n_final")
          .selectExpr("p.plan AS plan", "p.first_rows AS first_rows",
            "p.first_rows + n_final AS total_cost", "n_final")
        plans
          .withColumn("rk", row_number().over(
            Window.orderBy("total_cost", "plan")))
          .selectExpr("plan", "first_rows", "n_final", "total_cost",
            "CAST(rk AS BIGINT) AS rk",
            "CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best")
          .orderBy("rk")
      },
      Some("""
        WITH s AS (
          SELECT (SELECT count(*) FROM orders) AS no,
                 (SELECT count(*) FROM lineitem) AS nl,
                 (SELECT count(*) FROM customer) AS nc,
                 (SELECT count(*) FROM orders o JOIN lineitem l
                    ON o.o_orderkey = l.l_orderkey) AS n_ol,
                 (SELECT count(*) FROM orders o JOIN customer c
                    ON o.o_custkey = c.c_custkey) AS n_oc,
                 (SELECT count(*) FROM orders o
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                    JOIN customer c ON o.o_custkey = c.c_custkey) AS n_final),
        plans AS (
          SELECT 'OL_then_C' AS plan, n_ol AS first_rows, n_final FROM s
          UNION ALL
          SELECT 'OC_then_L', n_oc, n_final FROM s
          UNION ALL
          SELECT 'LxC_then_O', nl * nc, n_final FROM s),
        ranked AS (
          SELECT plan, first_rows, n_final,
                 first_rows + n_final AS total_cost,
                 row_number() OVER (ORDER BY first_rows + n_final, plan) AS rk
          FROM plans)
        SELECT plan, first_rows, n_final, total_cost, CAST(rk AS BIGINT) AS rk,
               CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
        FROM ranked ORDER BY rk""")),

    // --------------------------------------------------------------- q409
    QDef("q409_naive_bayes",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("h",
            PortableHash.md5Long(col("doc_id"), salt = "split~") % 100)
        val trainTok = docs.where(col("h") < 80)
          .select(col("lang"), explode(TextFunctions.words(col("text"))).as("tok"))
        val counts = trainTok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        val langTot = counts.groupBy("lang")
          .agg(sum("c").cast("bigint").as("n_l"))
        val vocab = counts.select("tok").distinct().agg(count(lit(1)).as("v"))
        val priors = docs.where(col("h") < 80).groupBy("lang")
          .agg(count(lit(1)).as("p_docs"))
          .crossJoin(docs.where(col("h") < 80)
            .agg(count(lit(1)).as("t_docs")))
        val evalTok = docs.where(col("h") >= 90)
          .select(col("doc_id"), col("lang").as("true_lang"),
            explode(TextFunctions.words(col("text"))).as("tok"))
          .groupBy("doc_id", "true_lang", "tok")
          .agg(count(lit(1)).as("k"))
        val langs = langTot.select(col("lang").as("ml"), col("n_l"))
          .crossJoin(broadcast(vocab))
        val terms = evalTok.crossJoin(broadcast(langs))
          .join(counts.select(col("lang").as("ml"), col("tok"), col("c")),
            Seq("ml", "tok"), "left")
          .selectExpr("doc_id", "true_lang", "ml",
            """k * CAST(floor(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE)
                 / CAST(n_l + v AS DOUBLE)) * 1e12) AS BIGINT) AS term_pico""")
        val scores = terms.groupBy("doc_id", "true_lang", "ml")
          .agg(sum("term_pico").as("lik_pico"))
          .join(broadcast(priors.selectExpr("lang AS ml",
            """CAST(floor(ln(CAST(p_docs AS DOUBLE)
                 / CAST(t_docs AS DOUBLE)) * 1e12) AS BIGINT) AS prior_pico""")),
            "ml")
          .selectExpr("doc_id", "true_lang", "ml",
            "lik_pico + prior_pico AS score_pico")
        scores.groupBy("doc_id", "true_lang")
          .agg(max(struct(col("score_pico"), col("ml"))).as("m"))
          .selectExpr("true_lang", "m.ml AS pred_lang")
          .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
          .orderBy("true_lang", "pred_lang")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang, text,
                 ${PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)", salt = "split~")} % 100 AS h
          FROM documents),
        train_tok AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS tok
          FROM d WHERE h < 80),
        counts AS (
          SELECT lang, tok, count(*) AS c FROM train_tok GROUP BY 1, 2),
        lang_tot AS (
          SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM counts GROUP BY 1),
        vocab AS (SELECT count(DISTINCT tok) AS v FROM counts),
        priors AS (
          SELECT lang, count(*) AS p_docs,
                 (SELECT count(*) FROM d WHERE h < 80) AS t_docs
          FROM d WHERE h < 80 GROUP BY 1),
        eval_tok AS (
          SELECT doc_id, lang AS true_lang, tok, count(*) AS k
          FROM (SELECT doc_id, lang,
                  unnest(${TextFunctions.wordsSql("text")}) AS tok
                FROM d WHERE h >= 90)
          GROUP BY 1, 2, 3),
        terms AS (
          SELECT e.doc_id, e.true_lang, lt.lang AS ml,
                 e.k * CAST(floor(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                     / CAST(lt.n_l + (SELECT v FROM vocab) AS DOUBLE)) * 1e12)
                   AS BIGINT) AS term_pico
          FROM eval_tok e
          CROSS JOIN lang_tot lt
          LEFT JOIN counts c ON c.lang = lt.lang AND c.tok = e.tok),
        scores AS (
          SELECT t.doc_id, t.true_lang, t.ml,
                 sum(t.term_pico)
                   + max(CAST(floor(ln(CAST(p.p_docs AS DOUBLE)
                       / CAST(p.t_docs AS DOUBLE)) * 1e12) AS BIGINT))
                   AS score_pico
          FROM terms t JOIN priors p ON p.lang = t.ml
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT doc_id, true_lang, ml,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score_pico DESC, ml DESC) AS rk
          FROM scores)
        SELECT true_lang, ml AS pred_lang, count(*) AS n_docs
        FROM pred WHERE rk = 1
        GROUP BY 1, 2 ORDER BY true_lang, pred_lang""")),

    // --------------------------------------------------------------- q410
    QDef("q410_isotonic",
      (s, dir) => {
        val ev = t(s, dir, "events")
        // outcome: heavy buyer = purchase count ≥ the global lower median
        // (relative threshold → ~50% base rate at any scale factor)
        val pc = ev.groupBy("user_id").agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("bigint").as("p"))
        val med = graft.operators.ScaleRank.quantileDisc(
          pc, col("p"), 1, 2, "med")
        val bins = pc.crossJoin(broadcast(med))
          .withColumn("dec",
            PortableHash.md5Long(col("user_id"), salt = "iso~") % 10)
          .groupBy("dec").agg(count(lit(1)).as("n"),
            sum(when(col("p") >= col("med"), 1L).otherwise(0L))
              .cast("bigint").as("conv"))
        val wOrd = Window.orderBy("dec")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cums = bins
          .withColumn("cn", sum("n").over(wOrd))
          .withColumn("cc", sum("conv").over(wOrd))
        val jk = cums.selectExpr("dec AS j", "cn - n AS cn0", "cc - conv AS cc0")
          .join(cums.selectExpr("dec AS kk", "cn AS cnk", "cc AS cck"),
            expr("j <= kk"))
          .selectExpr("j", "kk",
            "(1000000 * (cck - cc0)) DIV (cnk - cn0) AS avg_micro")
        val iso = jk
          .join(cums.select(col("dec").as("i")), expr("j <= i AND kk >= i"))
          .groupBy("i", "j").agg(min("avg_micro").as("m_ij"))
          .groupBy("i").agg(max("m_ij").as("iso_micro"))
        bins.join(iso, col("dec") === col("i"))
          .selectExpr("dec", "n AS n_users", "conv AS n_conv",
            "(1000000 * conv) DIV n AS raw_micro", "iso_micro")
          .orderBy("dec")
      },
      Some(s"""
        WITH pc AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS p
          FROM events GROUP BY 1),
        med AS (
          SELECT p AS med FROM (
            SELECT p, row_number() OVER (ORDER BY p, user_id) AS rn,
                   count(*) OVER () AS nu
            FROM pc) WHERE rn = (nu + 1) // 2),
        bins AS (
          SELECT ${PortableHash.md5LongSql("CAST(user_id AS VARCHAR)", salt = "iso~")} % 10 AS dec,
                 count(*) AS n,
                 CAST(sum(CASE WHEN p >= (SELECT med FROM med)
                     THEN 1 ELSE 0 END) AS BIGINT) AS conv
          FROM pc
          GROUP BY 1),
        cums AS (
          SELECT dec, n, conv,
                 CAST(sum(n) OVER (ORDER BY dec ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cn,
                 CAST(sum(conv) OVER (ORDER BY dec ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cc
          FROM bins),
        jk AS (
          SELECT a.dec AS j, b.dec AS kk,
                 (1000000 * (b.cc - (a.cc - a.conv)))
                   // (b.cn - (a.cn - a.n)) AS avg_micro
          FROM cums a JOIN cums b ON a.dec <= b.dec),
        iso AS (
          SELECT i.dec AS i, jk.j, min(jk.avg_micro) AS m_ij
          FROM jk JOIN cums i ON jk.j <= i.dec AND jk.kk >= i.dec
          GROUP BY 1, 2),
        fit AS (
          SELECT i, max(m_ij) AS iso_micro FROM iso GROUP BY 1)
        SELECT b.dec, b.n AS n_users, b.conv AS n_conv,
               (1000000 * b.conv) // b.n AS raw_micro, f.iso_micro
        FROM bins b JOIN fit f ON b.dec = f.i
        ORDER BY b.dec"""))
  )
}
