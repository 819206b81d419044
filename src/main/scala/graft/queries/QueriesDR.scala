package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 115 — IR ranking metrics, deletable
  * sketches, econ decomposition, hashed embeddings:
  *
  *  - q479: retrieval quality metrics — MRR and nDCG@5 over the
  *    brute-force cosine top-5 (q40's ranking), same-label = relevant:
  *    reciprocal ranks as exact 10⁶ DIV r, DCG weights 10⁶/log2(r+1)
  *    inlined as shared integer literals, nDCG = DCG·10⁶ DIV IDCG.
  *    The evaluation layer q43's recall leaves out (position matters).
  *  - q480: counting Bloom filter with deletions — 128 counters × 3
  *    portable-hash rows; insert all part names, delete one brand's,
  *    then re-probe: retained items can NEVER read a zero cell (no
  *    false negatives — the property counting cells buy over q97's
  *    bitmap), while deleted items survive only by collision.
  *  - q481: shift-share decomposition — per nation, H1→H2 revenue
  *    growth split into national trend, segment-mix, and competitive
  *    components (exact cents, floor-per-term bp products, residual
  *    carried in-output). The regional-economics BI staple beside
  *    q253's volume/price bridge.
  *  - q482: hashing-trick text embeddings — 16-dim signed-hash word
  *    vectors per document summed into language centroids (exact
  *    integers end-to-end), pairwise language cosine (floor-micro).
  *    Embeddings with zero training and zero FP until the final
  *    cosine — the cheap similarity layer under q34/q44.
  *
  * Reference analog: listing-search ranking quality, revocable
  * membership sets for in-flight task tracking, area revenue-growth
  * attribution, language-similarity maps without a model.
  */
object QueriesDR extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q479
    QDef("q479_mrr_ndcg",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"),
            VectorOps.norm("embedding").as("nrm"))
        e.cache(); e.count()
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_label"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos6").desc, col("vec_id"))
        val top5 = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos6",
            VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .selectExpr("q_id", "rn",
            "CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel",
            """CASE rn WHEN 1 THEN 1000000 WHEN 2 THEN 630929
               WHEN 3 THEN 500000 WHEN 4 THEN 430676 ELSE 386852 END AS wg""")
        val perQ = top5.groupBy("q_id").agg(
          sum("rel").cast("bigint").as("n_rel"),
          min(when(col("rel") === 1, col("rn"))).cast("long").as("first_rel"),
          sum(expr("rel * wg")).cast("bigint").as("dcg"))
        perQ
          .selectExpr("q_id", "n_rel",
            "coalesce(first_rel, -1) AS first_rel",
            "CAST(CASE WHEN first_rel IS NULL THEN 0 ELSE 1000000 DIV first_rel END AS BIGINT) AS rr_micro",
            "dcg",
            """CAST(CASE n_rel WHEN 0 THEN 0 WHEN 1 THEN 1000000
               WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
               WHEN 4 THEN 2561605 ELSE 2948457 END AS BIGINT) AS idcg""")
          .selectExpr("q_id", "n_rel", "first_rel", "rr_micro", "dcg", "idcg",
            "CAST(CASE WHEN idcg > 0 THEN dcg * 1000000 DIV idcg ELSE 0 END AS BIGINT) AS ndcg_micro")
          .orderBy("q_id")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding, label,
                 ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label,
                     nrm AS q_nrm
              FROM e WHERE vec_id < 8),
        scored AS (
          SELECT q.q_id, e.vec_id, e.label, q.q_label,
                 ${VectorOps.cosine6OutSql("q.q_vec", "e.embedding",
                   "q.q_nrm", "e.nrm")} AS cos6
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        top5 AS (
          SELECT q_id, rn,
                 CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
                 CASE rn WHEN 1 THEN 1000000 WHEN 2 THEN 630929
                   WHEN 3 THEN 500000 WHEN 4 THEN 430676 ELSE 386852 END AS wg
          FROM (SELECT q_id, label, q_label,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos6 DESC, vec_id) AS rn
                FROM scored)
          WHERE rn <= 5),
        perq AS (
          SELECT q_id, sum(rel) AS n_rel,
                 min(CASE WHEN rel = 1 THEN rn END) AS first_rel,
                 sum(rel * wg) AS dcg
          FROM top5 GROUP BY 1)
        SELECT q_id, CAST(n_rel AS BIGINT) AS n_rel,
               CAST(coalesce(first_rel, -1) AS BIGINT) AS first_rel,
               CAST(CASE WHEN first_rel IS NULL THEN 0
                 ELSE 1000000 // first_rel END AS BIGINT) AS rr_micro,
               CAST(dcg AS BIGINT) AS dcg,
               CAST(CASE n_rel WHEN 0 THEN 0 WHEN 1 THEN 1000000
                 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
                 WHEN 4 THEN 2561605 ELSE 2948457 END AS BIGINT) AS idcg,
               CAST(CASE WHEN n_rel > 0 THEN dcg * 1000000
                 // (CASE n_rel WHEN 1 THEN 1000000 WHEN 2 THEN 1630929
                     WHEN 3 THEN 2130929 WHEN 4 THEN 2561605
                     ELSE 2948457 END)
                 ELSE 0 END AS BIGINT) AS ndcg_micro
        FROM perq ORDER BY q_id""")),

    // --------------------------------------------------------------- q480
    QDef("q480_counting_bloom",
      (s, dir) => {
        val items = t(s, dir, "part")
          .select(col("p_name"), col("p_brand")).distinct()
        items.cache(); items.count()
        def cells(df: org.apache.spark.sql.DataFrame, sgn: Int) =
          (0 until 3).map { r =>
            df.withColumn("r", lit(r.toLong))
              .withColumn("cell", pmod(PortableHash.md5Long(col("p_name"),
                salt = s"cb$r~"), lit(128L)))
              .selectExpr("r", "cell", s"CAST($sgn AS BIGINT) AS delta")
          }.reduce(_ union _)
        val deleted = items.where(col("p_brand") === "Brand#13")
        val counters = cells(items, 1).union(cells(deleted, -1))
          .groupBy("r", "cell").agg(sum("delta").cast("bigint").as("cnt"))
        def probe(df: org.apache.spark.sql.DataFrame) =
          (0 until 3).map { r =>
            df.withColumn("r", lit(r.toLong))
              .withColumn("cell", pmod(PortableHash.md5Long(col("p_name"),
                salt = s"cb$r~"), lit(128L)))
          }.reduce(_ union _)
            .join(counters, Seq("r", "cell"), "left")
            .groupBy("p_name")
            .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("mincnt"))
        val retained = items.join(deleted.select(col("p_name").as("dn")),
            col("p_name") === col("dn"), "left_anti")
        val pr = probe(retained)
          .agg(count(lit(1)).cast("long").as("n_retained"),
            sum(when(col("mincnt") <= 0, 1L).otherwise(0L))
              .cast("bigint").as("false_negatives"))
        val pd = probe(deleted.select("p_name"))
          .agg(count(lit(1)).cast("long").as("n_deleted"),
            sum(when(col("mincnt") > 0, 1L).otherwise(0L))
              .cast("bigint").as("ghost_present"))
        val occ = counters.agg(
          count(lit(1)).cast("long").as("live_cells"),
          max("cnt").cast("long").as("max_counter"))
        pr.crossJoin(pd).crossJoin(occ)
          .select("n_retained", "false_negatives", "n_deleted",
            "ghost_present", "live_cells", "max_counter")
      },
      Some {
        def cellSql(r: Int) =
          s"${PortableHash.md5LongSql("p_name", s"cb$r~")} % 128"
        s"""
        WITH items AS MATERIALIZED (
          SELECT DISTINCT p_name, p_brand FROM part),
        deleted AS (SELECT p_name FROM items WHERE p_brand = 'Brand#13'),
        ins AS (
          SELECT 0 AS r, ${cellSql(0)} AS cell, 1 AS delta FROM items
          UNION ALL SELECT 1, ${cellSql(1)}, 1 FROM items
          UNION ALL SELECT 2, ${cellSql(2)}, 1 FROM items
          UNION ALL SELECT 0, ${cellSql(0)}, -1 FROM deleted
          UNION ALL SELECT 1, ${cellSql(1)}, -1 FROM deleted
          UNION ALL SELECT 2, ${cellSql(2)}, -1 FROM deleted),
        counters AS MATERIALIZED (
          SELECT r, cell, sum(delta) AS cnt FROM ins GROUP BY 1, 2),
        retained AS (
          SELECT p_name FROM items
          WHERE p_name NOT IN (SELECT p_name FROM deleted)),
        pr AS (
          SELECT count(*) AS n_retained,
                 sum(CASE WHEN mincnt <= 0 THEN 1 ELSE 0 END)
                   AS false_negatives
          FROM (
            SELECT p_name, min(coalesce(cnt, 0)) AS mincnt FROM (
              SELECT p_name, 0 AS r, ${cellSql(0)} AS cell FROM retained
              UNION ALL SELECT p_name, 1, ${cellSql(1)} FROM retained
              UNION ALL SELECT p_name, 2, ${cellSql(2)} FROM retained) p
            LEFT JOIN counters USING (r, cell)
            GROUP BY 1)),
        pd AS (
          SELECT count(*) AS n_deleted,
                 sum(CASE WHEN mincnt > 0 THEN 1 ELSE 0 END) AS ghost_present
          FROM (
            SELECT p_name, min(coalesce(cnt, 0)) AS mincnt FROM (
              SELECT p_name, 0 AS r, ${cellSql(0)} AS cell FROM deleted
              UNION ALL SELECT p_name, 1, ${cellSql(1)} FROM deleted
              UNION ALL SELECT p_name, 2, ${cellSql(2)} FROM deleted) p
            LEFT JOIN counters USING (r, cell)
            GROUP BY 1)),
        occ AS (
          SELECT count(*) AS live_cells, max(cnt) AS max_counter
          FROM counters)
        SELECT CAST(n_retained AS BIGINT) AS n_retained,
               CAST(false_negatives AS BIGINT) AS false_negatives,
               CAST(n_deleted AS BIGINT) AS n_deleted,
               CAST(ghost_present AS BIGINT) AS ghost_present,
               CAST(live_cells AS BIGINT) AS live_cells,
               CAST(max_counter AS BIGINT) AS max_counter
        FROM pr, pd, occ"""
      }),

    // --------------------------------------------------------------- q481
    QDef("q481_shift_share",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nat",
              "c_mktsegment AS seg")),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("nat", "seg",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
        val mid = rev.agg(expr("(min(d) + max(d) + 1) DIV 2")
          .cast("long").as("mid"))
        val cells = rev.crossJoin(broadcast(mid))
          .groupBy("nat", "seg").agg(
            sum(when(col("d") < col("mid"), col("cents")).otherwise(0L))
              .cast("bigint").as("r1"),
            sum(when(col("d") >= col("mid"), col("cents")).otherwise(0L))
              .cast("bigint").as("r2"))
        cells.cache(); cells.count()
        val natG = cells.agg(sum("r1").cast("bigint").as("t1"),
          sum("r2").cast("bigint").as("t2"))
          .selectExpr("(t2 - t1) * 10000 DIV t1 AS g_nat_bp")
        val segG = cells.groupBy("seg").agg(
          sum("r1").cast("bigint").as("s1"), sum("r2").cast("bigint").as("s2"))
          .selectExpr("seg", "(s2 - s1) * 10000 DIV s1 AS g_seg_bp")
        cells.join(broadcast(segG), "seg").crossJoin(broadcast(natG))
          .selectExpr("nat", "r1", "r2", "g_nat_bp", "g_seg_bp",
            "(r1 * g_nat_bp) DIV 10000 AS nat_comp",
            "(r1 * (g_seg_bp - g_nat_bp)) DIV 10000 AS mix_comp",
            "r2 - r1 - (r1 * g_seg_bp) DIV 10000 AS comp_comp")
          .groupBy("nat").agg(
            sum("r1").cast("bigint").as("r1"),
            sum("r2").cast("bigint").as("r2"),
            sum("nat_comp").cast("bigint").as("national"),
            sum("mix_comp").cast("bigint").as("mix"),
            sum("comp_comp").cast("bigint").as("competitive"))
          .selectExpr("nat", "r1", "r2", "national", "mix", "competitive",
            "(r2 - r1) - national - mix - competitive AS residual")
          .orderBy("nat")
      },
      Some("""
        WITH rev AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
                 epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        mid AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM rev),
        cells AS MATERIALIZED (
          SELECT nat, seg,
                 sum(CASE WHEN d < (SELECT mid FROM mid) THEN cents
                     ELSE 0 END) AS r1,
                 sum(CASE WHEN d >= (SELECT mid FROM mid) THEN cents
                     ELSE 0 END) AS r2
          FROM rev GROUP BY 1, 2),
        natg AS (
          SELECT (sum(r2) - sum(r1)) * 10000 // sum(r1) AS g_nat_bp
          FROM cells),
        segg AS (
          SELECT seg, (sum(r2) - sum(r1)) * 10000 // sum(r1) AS g_seg_bp
          FROM cells GROUP BY 1),
        parts AS (
          SELECT nat, r1, r2,
                 (r1 * g_nat_bp) // 10000 AS nat_comp,
                 (r1 * (g_seg_bp - g_nat_bp)) // 10000 AS mix_comp,
                 r2 - r1 - (r1 * g_seg_bp) // 10000 AS comp_comp
          FROM cells JOIN segg USING (seg), natg)
        SELECT nat, CAST(sum(r1) AS BIGINT) AS r1,
               CAST(sum(r2) AS BIGINT) AS r2,
               CAST(sum(nat_comp) AS BIGINT) AS national,
               CAST(sum(mix_comp) AS BIGINT) AS mix,
               CAST(sum(comp_comp) AS BIGINT) AS competitive,
               CAST((sum(r2) - sum(r1)) - sum(nat_comp) - sum(mix_comp)
                 - sum(comp_comp) AS BIGINT) AS residual
        FROM parts GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q482
    QDef("q482_hash_embeddings",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("lang"),
            explode(TextFunctions.words(col("text"))).as("tok"))
        val feats = toks
          .withColumn("dim", pmod(PortableHash.md5Long(col("tok"),
            salt = "he~"), lit(16L)))
          .withColumn("sgn",
            pmod(PortableHash.md5Long(col("tok"), salt = "hs~"), lit(2L))
              * 2 - 1)
          .groupBy("lang", "dim").agg(sum("sgn").cast("bigint").as("v"))
        val norms = feats.groupBy("lang")
          .agg(sum(col("v") * col("v")).cast("bigint").as("nn"))
        val pairs = feats.as("a").join(feats.as("b"),
            col("a.dim") === col("b.dim") &&
              col("a.lang") < col("b.lang"))
          .groupBy(col("a.lang").as("la"), col("b.lang").as("lb"))
          .agg(sum(col("a.v") * col("b.v")).cast("bigint").as("dot"))
        pairs
          .join(norms.select(col("lang").as("la"), col("nn").as("na")), "la")
          .join(norms.select(col("lang").as("lb"), col("nn").as("nb")), "lb")
          .selectExpr("la", "lb", "dot",
            "CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1e6) AS BIGINT) AS cos_micro")
          .orderBy("la", "lb")
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS tok
          FROM documents),
        feats AS MATERIALIZED (
          SELECT lang,
                 ${PortableHash.md5LongSql("tok", "he~")} % 16 AS dim,
                 CAST(sum(${PortableHash.md5LongSql("tok", "hs~")} % 2 * 2 - 1)
                   AS BIGINT) AS v
          FROM toks GROUP BY 1, 2),
        norms AS (SELECT lang, sum(v * v) AS nn FROM feats GROUP BY 1),
        pairs AS (
          SELECT a.lang AS la, b.lang AS lb, sum(a.v * b.v) AS dot
          FROM feats a JOIN feats b
            ON a.dim = b.dim AND a.lang < b.lang
          GROUP BY 1, 2)
        SELECT la, lb, CAST(dot AS BIGINT) AS dot,
               CAST(floor(CAST(dot AS DOUBLE)
                 / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) * 1e6)
                 AS BIGINT) AS cos_micro
        FROM pairs
        JOIN norms na ON pairs.la = na.lang
        JOIN norms nb ON pairs.lb = nb.lang
        ORDER BY la, lb"""))
  )
}
