package graft.queries

import graft.Tables.t
import graft.dedup.Components
import graft.functions.TextFunctions
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 47 — sequence mining, entity
  * resolution, rare-vocabulary coverage:
  *
  *  - q215: session 3-gram mining — within 30-min sessions (q07's
  *    sessionize), consecutive event-type trigrams counted corpus-wide,
  *    top-15 (count desc, gram asc). The sequential-pattern upgrade of
  *    q75's transition matrix: one sessionize window + two leads + one
  *    hash aggregate — no self-joins.
  *  - q216: entity-resolution pipeline — blocked Levenshtein≤2 edges
  *    (q214's blocking) fed through connected components
  *    (Components.labelPropagation, q35's kernel) → cluster-size
  *    histogram over multi-record clusters. The full link-then-cluster
  *    composition: blocking bounds candidates, pointer-jumping label
  *    propagation bounds rounds at O(log diameter); recursive-CTE
  *    transitive-closure oracle on the identical edge list.
  *  - q217: rare-vocabulary coverage — corpus-rare tokens (doc
  *    frequency ≤ 2) and the share each source covers (bp). The
  *    corpus-selection signal for dedup-aware mixing: a source that
  *    covers no rare vocabulary adds bulk, not diversity.
  *
  * Reference analog: session trigrams = scraper request-sequence
  * patterns (calendar→review→pricing chains); ER clusters = one listing
  * advertised under near-identical titles; rare coverage = which survey
  * area contributes unique listing vocabulary.
  */
object QueriesBB extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q215
    QDef("q215_session_3gram",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id", "event_type")
        val sess = Relational.sessionize(ev, col("user_id"), col("ts_ms"),
          col("event_id"), gapMs = 30L * 60L * 1000L)
        val w = Window.partitionBy(col("user_id"), col("session_id"))
          .orderBy("ts_ms", "event_id")
        sess
          .withColumn("e2", lead("event_type", 1).over(w))
          .withColumn("e3", lead("event_type", 2).over(w))
          .where(col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("gram")).limit(15)
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
          FROM events),
        g AS (
          SELECT *, CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000
                         THEN 1 ELSE 0 END AS new_sess
          FROM (SELECT *, lag(ts_ms, 1) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) AS prev_ts FROM ev)),
        se AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id
            ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g),
        tri AS (
          SELECT event_type || '>' || lead(event_type, 1) OVER w
                   || '>' || lead(event_type, 2) OVER w AS gram,
                 lead(event_type, 2) OVER w AS e3
          FROM se
          WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts_ms, event_id))
        SELECT gram, count(*) AS n FROM tri WHERE e3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, gram LIMIT 15""")),

    // --------------------------------------------------------------- q216
    QDef("q216_er_clusters",
      (s, dir) => {
        // GROUP CONTRACTION (r10): lev(n_a, n_b) is constant across every
        // part pair drawn from two (brand, size, name) groups, so the
        // pairwise lev≤2 relation either links ALL cross-group pairs or
        // none, and a group's own parts are pairwise lev=0 — components
        // of the contracted group graph (rep = min part id per group) are
        // EXACTLY the full graph's components. The r9 part×part form ran
        // 16M levenshteins and fed an O(Σ block²) edge list to CC
        // (21.7s at sf1); the name domain is tiny (64 distinct names,
        // 17.7k groups), so this runs ~125k levs and a 17.7k-node CC.
        val g = t(s, dir, "part")
          .groupBy(col("p_brand"), col("p_size"), col("p_name"))
          .agg(min(col("p_partkey")).as("rep"), count(lit(1)).as("cnt"))
          .cache()
        g.count() // eager: both group-join sides + the label join
        val ga = g.select(col("p_brand"), col("p_size"),
          col("rep").as("id_a"), col("p_name").as("na"))
        val gb = g.select(col("p_brand"), col("p_size"),
          col("rep").as("id_b"), col("p_name").as("nb"))
        val gedges = ga.join(gb, Seq("p_brand", "p_size"))
          .where(col("id_a") < col("id_b") &&
            levenshtein(col("na"), col("nb")) <= 2)
          .select("id_a", "id_b")
        // dual-path components (round-8): one-task union-find under the
        // bounded edge-census threshold, label propagation above it —
        // same (id, lbl=min id) contract, spec-asserted equal
        val comp = Components.connectedComponents(gedges, "id_a", "id_b")
        // a group with no cross edge is a cluster of its own parts, but
        // only its internal pairs put it in the ORIGINAL edge set: keep
        // isolated groups only when cnt >= 2 (a lone part has no edge)
        val labeled = g.join(comp, g("rep") === comp("id"), "left")
          .where(col("id").isNotNull || col("cnt") >= 2)
          .select(coalesce(col("lbl"), col("rep")).as("lbl"), col("cnt"))
        labeled.groupBy("lbl").agg(sum("cnt").cast("bigint").as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"), min("lbl").as("min_cluster"))
          .orderBy("cluster_size")
      },
      Some {
        val edgesSql = """
          SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
          FROM part a JOIN part b
            ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
           AND levenshtein(a.p_name, b.p_name) <= 2"""
        s"""
        WITH comp AS (${Components.labelPropagationSql(edgesSql)}),
        cl AS (SELECT lbl, count(*) AS sz FROM comp GROUP BY 1)
        SELECT sz AS cluster_size, count(*) AS n_clusters,
               min(lbl) AS min_cluster
        FROM cl GROUP BY 1 ORDER BY cluster_size"""
      }),

    // --------------------------------------------------------------- q217
    QDef("q217_rare_coverage",
      (s, dir) => {
        // rarity at word-TRIGRAM granularity: the synthetic vocab is tiny
        // (~31 words, every word is common) but trigram combinations are
        // sparse — the realistic shape for rare-content accounting
        // native per-doc distinct trigram set (r10): no per-position
        // slice+concat explode, no cross-corpus distinct shuffle — rows
        // are unique by construction (doc_id x set element). split(" ")
        // (not words()) matches the oracle's string_split exactly;
        // repartition fans out the single-file scan.
        val dw = t(s, dir, "documents")
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 3)
          .select(col("doc_id"), col("source"),
            explode(TextFunctions.wordNgramSet(col("ws"), 3)).as("sh"))
          .cache() // read by the rarity census AND the coverage join
        dw.count()
        // (doc_id, sh) is unique by construction (per-doc distinct set,
        // one row per doc), so plain counts replace the countDistincts
        val rare = dw.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") <= 2).select("sh")
        val tot = rare.agg(count(lit(1)).as("total_rare"))
        val nd = t(s, dir, "documents").groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        dw.join(rare, "sh")
          .groupBy("source").agg(countDistinct("sh").as("n_rare_covered"))
          .join(nd, "source")
          .crossJoin(broadcast(tot))
          .selectExpr("source", "n_docs", "n_rare_covered", "total_rare",
            "n_rare_covered * 10000 DIV total_rare AS coverage_bp")
          .orderBy("source")
      },
      Some("""
        WITH w AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents WHERE len(string_split(text, ' ')) >= 3),
        idx AS (
          SELECT doc_id, source, ws,
                 unnest(generate_series(1, CAST(len(ws) - 2 AS BIGINT))) AS i
          FROM w),
        dw AS (
          SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+2], ' ') AS sh
          FROM idx),
        rare AS (
          SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df
                          FROM dw GROUP BY 1) WHERE df <= 2),
        tot AS (SELECT count(*) AS total_rare FROM rare),
        nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs
               FROM documents GROUP BY 1),
        cov AS (
          SELECT dw.source, count(DISTINCT dw.sh) AS n_rare_covered
          FROM dw JOIN rare USING (sh) GROUP BY 1)
        SELECT cov.source, nd.n_docs, cov.n_rare_covered, tot.total_rare,
               cov.n_rare_covered * 10000 // tot.total_rare AS coverage_bp
        FROM cov JOIN nd USING (source) CROSS JOIN tot
        ORDER BY source"""))
  )
}
