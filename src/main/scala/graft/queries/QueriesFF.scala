package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.operators.ScaleRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 widening: streaming capacity planning (§2G), training-mix
  * economics (§2A/C/E) and an ANN index-health audit (§2D) — the
  * operational layer a continuously-harvesting pipeline (reference:
  * Celery beat cadences, `run-beat-job.py`; response volumes,
  * `models.py` UBDCTask bookkeeping) needs once the per-query operators
  * exist.
  *
  *  - q633: micro-batch trigger sizing from measured arrival rates —
  *    per event_type, exact rank-based p95 of the per-minute arrival
  *    census plus the `maxOffsetsPerTrigger`-style cap for a 10 s
  *    trigger at 2× headroom. The minute census is bounded by the
  *    calendar (44 640 minute cells/month × event types), so the
  *    per-type quantile window never sees unbounded input.
  *  - q634: stateful-operator state-footprint census — how many
  *    distinct keys a 2 h-horizon stateful op holds at every hour
  *    boundary. Each event contributes to exactly TWO hour-end
  *    snapshots (horizon/granularity = 2), so the explode is constant
  *    fan-out and the count-distinct shuffles once on (hour, user).
  *  - q635: tokenizer fertility per language — chars-per-100-tokens
  *    under three tokenizers (whitespace, fixed-stride BPE estimate,
  *    regex) and the ws/regex agreement ratio; the per-lang rollup is
  *    bounded by the language domain.
  *  - q636: sequence-packing boundary audit — GPT-style concat-and-
  *    split packing (context C=256) counts documents split across
  *    sequence boundaries. The per-source running token offset runs on
  *    ScaleRank.withGlobalRunningSum (range-partition two-phase, no
  *    single-reducer window) with per-source starts subtracted via a
  *    broadcast 20-row offset table.
  *  - q637: repetition-aware sampling weights — near-template groups
  *    (q30's canonical word-set signature) get weight 1/√multiplicity
  *    (data-constrained-LM downweighting), rolled up per multiplicity.
  *  - q638: token-budget mix planner with epoch caps — quality-weighted
  *    shares (vocabulary richness × tokens) of a 2×-corpus budget,
  *    capped at 4 epochs per source, one overflow-redistribution round
  *    to the uncapped sources; all products in DECIMAL(38,0)/HUGEINT
  *    (int64 overflows at sf1 volumes).
  *  - q639: IVF list-balance audit — q42's coarse-centroid assignment,
  *    then the per-cell occupancy table with basis-point shares (total
  *    via ScaleRank.withTotals broadcast, no `OVER ()` serialization);
  *    hot cells are where IVF probe latency hides.
  */
object QueriesFF extends QueryPack {

  import graft.queries.Q.tsMs

  private val wSql = TextFunctions.wordsSql("text")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q633
    QDef("q633_trigger_planner",
      (s, dir) => {
        val m = t(s, dir, "events")
          .withColumn("minute", expr(s"($tsMs) DIV 60000"))
          .groupBy("event_type", "minute")
          .agg(count(lit(1)).as("cnt"))
        val wRank = Window.partitionBy("event_type")
          .orderBy(col("cnt"), col("minute"))
        val wAll = Window.partitionBy("event_type")
        m.withColumn("rn", row_number().over(wRank).cast("bigint"))
          .withColumn("n_minutes", count(lit(1)).over(wAll).cast("bigint"))
          .withColumn("peak_pm", max(col("cnt")).over(wAll).cast("bigint"))
          .filter(col("rn") === expr("(95 * n_minutes + 99) DIV 100"))
          .select(col("event_type"), col("n_minutes"), col("peak_pm"),
            col("cnt").cast("bigint").as("p95_pm"),
            expr("((cnt + 5) DIV 6) * 2").cast("bigint").as("trigger_cap"))
          .orderBy("event_type")
      },
      Some("""
        WITH m AS (
          SELECT event_type, epoch_ms(ts) // 60000 AS minute,
                 count(*) AS cnt
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, cnt, minute,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cnt, minute) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n_minutes,
                 max(cnt) OVER (PARTITION BY event_type) AS peak_pm
          FROM m)
        SELECT event_type, CAST(n_minutes AS BIGINT) AS n_minutes,
               CAST(peak_pm AS BIGINT) AS peak_pm,
               CAST(cnt AS BIGINT) AS p95_pm,
               CAST(((cnt + 5) // 6) * 2 AS BIGINT) AS trigger_cap
        FROM r WHERE rn = (95 * n_minutes + 99) // 100
        ORDER BY event_type""")),

    // --------------------------------------------------------------- q634
    // Hour-end he (hour index) holds the event iff he*3600000 is in
    // (ts, ts + 7200000]; with a 2 h horizon on hourly snapshots that is
    // always exactly {floor(ts/3.6e6)+1, floor+2}.
    QDef("q634_state_footprint",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("h0", expr(s"($tsMs) DIV 3600000"))
          .select(col("user_id"),
            explode(array(expr("h0 + 1"), expr("h0 + 2"))).as("he"))
          .groupBy("he")
          .agg(countDistinct(col("user_id")).as("n_state_keys"))
          .select(expr("he * 3600000").as("hour_end_ms"),
            col("n_state_keys").cast("bigint").as("n_state_keys"),
            expr("n_state_keys * 64").cast("bigint").as("est_state_bytes"))
          .orderBy("hour_end_ms")
      },
      Some("""
        WITH c AS (
          SELECT user_id, unnest([epoch_ms(ts) // 3600000 + 1,
                                  epoch_ms(ts) // 3600000 + 2]) AS he
          FROM events)
        SELECT he * 3600000 AS hour_end_ms,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_state_keys,
               CAST(count(DISTINCT user_id) * 64 AS BIGINT) AS est_state_bytes
        FROM c GROUP BY he
        ORDER BY hour_end_ms""")),

    // --------------------------------------------------------------- q635
    QDef("q635_tokenizer_fertility",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .withColumn("ws_tok", size(col("w")).cast("bigint"))
          .withColumn("bpe_tok", expr("(n_chars + 3) DIV 4"))
          .withColumn("re_tok",
            expr("CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS BIGINT)"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("bigint").as("sum_chars"),
            sum("ws_tok").cast("bigint").as("sum_ws"),
            sum("bpe_tok").cast("bigint").as("sum_bpe"),
            sum("re_tok").cast("bigint").as("sum_re"))
          .select(col("lang"), col("n_docs"),
            // greatest(...,1): a lang whose surviving texts are all empty
            // has zero tokens; the fertility of nothing is 0, not a crash
            expr("sum_chars * 100 DIV greatest(sum_ws, 1)").as("cpt_ws_c"),
            expr("sum_chars * 100 DIV greatest(sum_bpe, 1)").as("cpt_bpe_c"),
            expr("sum_chars * 100 DIV greatest(sum_re, 1)").as("cpt_re_c"),
            expr("sum_ws * 10000 DIV greatest(sum_re, 1)").as("ws_re_bp"))
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT lang, n_chars, len($wSql) AS ws_tok,
                 (n_chars + 3) // 4 AS bpe_tok,
                 len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tok
          FROM documents),
        a AS (
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 CAST(sum(ws_tok) AS BIGINT) AS sum_ws,
                 CAST(sum(bpe_tok) AS BIGINT) AS sum_bpe,
                 CAST(sum(re_tok) AS BIGINT) AS sum_re
          FROM d GROUP BY lang)
        SELECT lang, n_docs,
               CAST(sum_chars * 100 // greatest(sum_ws, 1) AS BIGINT) AS cpt_ws_c,
               CAST(sum_chars * 100 // greatest(sum_bpe, 1) AS BIGINT) AS cpt_bpe_c,
               CAST(sum_chars * 100 // greatest(sum_re, 1) AS BIGINT) AS cpt_re_c,
               CAST(sum_ws * 10000 // greatest(sum_re, 1) AS BIGINT) AS ws_re_bp
        FROM a ORDER BY lang""")),

    // --------------------------------------------------------------- q636
    // Packing run: per source, docs concatenated in doc_id order into
    // C-token sequences. A doc is split iff its span [start, end) crosses
    // a multiple of C. Global running sum + broadcast per-source starts
    // replace the per-source single-reducer window.
    QDef("q636_packing_boundaries",
      (s, dir) => {
        val C = 256L
        val docs = t(s, dir, "documents")
          .withColumn("tok", size(TextFunctions.words(col("text"))).cast("bigint"))
          .select("source", "doc_id", "tok")
        val withEnd = ScaleRank.withGlobalRunningSum(
          docs, Seq(col("source"), col("doc_id")), col("tok"), "g_end")
        val starts = withEnd.groupBy("source")
          .agg(min(expr("g_end - tok")).as("src_off"))
        withEnd.join(broadcast(starts), "source")
          .withColumn("st", expr("g_end - tok - src_off"))
          .withColumn("en", expr("g_end - src_off"))
          .withColumn("split",
            when(col("tok") > 0 &&
              expr(s"st DIV $C") =!= expr(s"(en - 1) DIV $C"), 1L)
              .otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("tok").cast("bigint").as("total_tokens"),
            sum("split").cast("bigint").as("n_split_docs"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            expr(s"(total_tokens + ${C - 1}) DIV $C").as("n_seqs"),
            expr("n_split_docs"),
            expr("n_split_docs * 10000 DIV n_docs").as("split_share_bp"))
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT source, doc_id, CAST(len($wSql) AS BIGINT) AS tok
          FROM documents),
        e AS (
          SELECT source, tok,
                 sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS en
          FROM d),
        f AS (
          SELECT source, tok, en - tok AS st, en FROM e)
        SELECT source, count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS total_tokens,
               CAST((sum(tok) + 255) // 256 AS BIGINT) AS n_seqs,
               CAST(sum(CASE WHEN tok > 0 AND st // 256 != (en - 1) // 256
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
               CAST(sum(CASE WHEN tok > 0 AND st // 256 != (en - 1) // 256
                             THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
                 AS split_share_bp
        FROM f GROUP BY source ORDER BY source""")),

    // --------------------------------------------------------------- q637
    QDef("q637_dup_weighting",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .withColumn("sig", Dedup.canonicalKey(col("w")))
          .withColumn("tok", size(col("w")).cast("bigint"))
          .groupBy("sig")
          .agg(count(lit(1)).as("mult"),
            sum("tok").cast("bigint").as("g_tokens"))
          .groupBy("mult")
          .agg(count(lit(1)).as("n_groups"),
            sum("g_tokens").cast("bigint").as("sum_tokens"))
          .select(col("mult").cast("bigint").as("mult"),
            col("n_groups"),
            expr("mult * n_groups").cast("bigint").as("n_docs"),
            expr("CAST(floor(10000.0 / sqrt(CAST(mult AS DOUBLE))) AS BIGINT)")
              .as("weight_bp"),
            col("sum_tokens"))
          .orderBy("mult")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, ${Dedup.canonicalKeySql("w")} AS sig,
                 CAST(len(w) AS BIGINT) AS tok
          FROM (SELECT doc_id, $wSql AS w FROM documents)),
        g AS (
          SELECT sig, count(*) AS mult, CAST(sum(tok) AS BIGINT) AS g_tokens
          FROM d GROUP BY sig)
        SELECT CAST(mult AS BIGINT) AS mult, count(*) AS n_groups,
               CAST(mult * count(*) AS BIGINT) AS n_docs,
               CAST(floor(10000.0 / sqrt(CAST(mult AS DOUBLE))) AS BIGINT)
                 AS weight_bp,
               CAST(sum(g_tokens) AS BIGINT) AS sum_tokens
        FROM g GROUP BY mult ORDER BY mult""")),

    // --------------------------------------------------------------- q638
    // B = 2 × corpus tokens. weight_s = D_s (distinct words) so the
    // quality×volume product w_s·T_s needs DECIMAL(38,0)/HUGEINT at sf1.
    // Round 1: alloc = min(B·share, 4·T_s). Round 2: the overflow is
    // re-shared among sources round 1 left uncapped (min cap again);
    // a planner, not a conservation proof — floors are fine.
    QDef("q638_mix_epoch_planner",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .withColumn("tok", size(col("w")).cast("bigint"))
          .select("source", "w", "tok")
          .cache()
        docs.count() // eager: token sums and vocab census share one scan
        val toks = docs.groupBy("source")
          .agg(sum("tok").cast("bigint").as("t_tokens"))
        val dw = docs.select(col("source"), explode(col("w")).as("word"))
          .distinct()
          .groupBy("source").agg(count(lit(1)).as("d_words"))
        val p = toks.join(dw, "source")
          .withColumn("wt", expr("CAST(d_words AS DECIMAL(38,0)) * t_tokens"))
        val g = p.crossJoin(broadcast(p.agg(
            expr("CAST(sum(t_tokens) AS DECIMAL(38,0)) * 2").as("budget"),
            sum("wt").cast("decimal(38,0)").as("swt"))))
          .withColumn("cap", expr("t_tokens * 4"))
          .withColumn("raw1", expr("CAST(budget * wt DIV swt AS BIGINT)"))
          .withColumn("alloc1", least(col("raw1"), col("cap")))
        val r2 = g.crossJoin(broadcast(g.agg(
            expr("CAST(max(budget) - sum(alloc1) AS DECIMAL(38,0))").as("lft"),
            expr("""greatest(CAST(sum(CASE WHEN raw1 < cap THEN wt ELSE 0 END)
                    AS DECIMAL(38,0)), CAST(1 AS DECIMAL(38,0)))""").as("swtu"))))
          .withColumn("alloc2", expr(
            """alloc1 + CASE WHEN raw1 < cap
               THEN least(CAST(lft * wt DIV swtu AS BIGINT), cap - alloc1)
               ELSE 0 END"""))
        r2.select(col("source"), col("t_tokens"),
            col("d_words").cast("bigint").as("d_words"),
            col("alloc2").cast("bigint").as("alloc_tokens"),
            expr("alloc2 * 10000 DIV greatest(t_tokens, 1)").as("epochs_bp"))
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT source, $wSql AS w FROM documents),
        tk AS (
          SELECT source, CAST(sum(len(w)) AS BIGINT) AS t_tokens
          FROM d GROUP BY source),
        dw AS (
          SELECT source, count(DISTINCT word) AS d_words
          FROM (SELECT source, unnest(w) AS word FROM d) GROUP BY source),
        p AS (
          SELECT source, t_tokens, d_words,
                 CAST(d_words AS HUGEINT) * t_tokens AS wt
          FROM tk JOIN dw USING (source)),
        g AS (
          SELECT CAST(sum(t_tokens) AS HUGEINT) * 2 AS budget,
                 CAST(sum(wt) AS HUGEINT) AS swt
          FROM p),
        r1 AS (
          SELECT source, t_tokens, d_words, wt, t_tokens * 4 AS cap,
                 CAST((SELECT budget FROM g) * wt // (SELECT swt FROM g)
                   AS BIGINT) AS raw1
          FROM p),
        r1b AS (SELECT *, least(raw1, cap) AS alloc1 FROM r1),
        g2 AS (
          SELECT CAST((SELECT budget FROM g) - sum(alloc1) AS HUGEINT) AS lft,
                 greatest(CAST(sum(CASE WHEN raw1 < cap THEN wt ELSE 0 END)
                   AS HUGEINT), 1) AS swtu
          FROM r1b),
        r2 AS (
          SELECT source, t_tokens, d_words,
                 alloc1 + CASE WHEN raw1 < cap
                   THEN least(CAST((SELECT lft FROM g2) * wt
                                // (SELECT swtu FROM g2) AS BIGINT),
                              cap - alloc1)
                   ELSE 0 END AS alloc2
          FROM r1b)
        SELECT source, t_tokens, CAST(d_words AS BIGINT) AS d_words,
               CAST(alloc2 AS BIGINT) AS alloc_tokens,
               CAST(alloc2 * 10000 // greatest(t_tokens, 1) AS BIGINT) AS epochs_bp
        FROM r2 ORDER BY source""")),

    // --------------------------------------------------------------- q639
    QDef("q639_ivf_balance",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            graft.functions.VectorOps.norm("embedding").as("nrm"))
        val seeds = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("nrm").as("c_nrm"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("sim6").desc, col("c_id"))
        val assigned = e.crossJoin(broadcast(seeds))
          .withColumn("sim6", round(graft.functions.VectorOps
            .cosineFromNorms("embedding", "c_vec", "nrm", "c_nrm"), 6))
          .withColumn("arn", row_number().over(wAssign))
          .filter(col("arn") === 1)
          .select(col("vec_id"), col("c_id").as("cell"))
        val cells = assigned.groupBy("cell")
          .agg(count(lit(1)).as("sz"))
        ScaleRank.withTotals(cells,
            Seq(sum("sz").cast("bigint").as("n_total")))
          .select(col("cell"), col("sz").cast("bigint").as("sz"),
            expr("sz * 10000 DIV n_total").as("share_bp"))
          .orderBy(col("sz").desc, col("cell"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding,
                     ${graft.functions.VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        seeds AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
                  FROM e WHERE vec_id % 100 = 0),
        assigned AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, s.c_id AS cell,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     round(${graft.functions.VectorOps.cosineFromNormsSql(
                       "e.embedding", "s.c_vec", "e.nrm", "s.c_nrm")}, 6) DESC,
                     s.c_id) AS arn
            FROM e CROSS JOIN seeds s)
          WHERE arn = 1),
        cells AS (SELECT cell, count(*) AS sz FROM assigned GROUP BY cell)
        SELECT cell, CAST(sz AS BIGINT) AS sz,
               CAST(sz * 10000 // (SELECT sum(sz) FROM cells) AS BIGINT)
                 AS share_bp
        FROM cells ORDER BY sz DESC, cell""")),
  )
}
