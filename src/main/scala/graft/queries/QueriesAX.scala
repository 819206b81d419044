package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 43 — asymmetric dedup, series
  * decomposition, lifecycle accounting, hierarchy rollup:
  *
  *  - q198: shingle CONTAINMENT (|A∩B| / |A|) — the asymmetric near-dup
  *    measure that catches a document embedded inside a larger one,
  *    which symmetric Jaccard (q33) under-scores. Candidates blocked by
  *    (lang, min shingle hash): one-permutation MinHash blocking, the
  *    bucket key every true superset pair shares with probability
  *    J(A,B); per-pair work is the sorted-merge |∩| on fixed-width
  *    longs, never all pairs.
  *  - q199: additive seasonal decomposition (STL-lite) — daily counts →
  *    centered 7-day moving-average trend (integer milli), detrended
  *    residual → day-of-week seasonal component. The decomposition
  *    counterpart of q139's ratio-style seasonal index; all BIGINT,
  *    full-window rows only.
  *  - q200: monthly customer lifecycle — per month: active, new (first
  *    month), retained (also active previous month), resurrected
  *    (returned after a gap), churned-out (active previous month, absent
  *    now). Conservation (active = new + retained + resurrected) holds
  *    in-output. The growth-accounting standard beside q94/q107.
  *  - q201: hierarchical containment rollup — parts form a synthetic
  *    decimal tree (parent = key DIV 10); per-node SUBTREE revenue via a
  *    7-level ancestor explode + one hash agg (flat fan-out, shuffle on
  *    ancestor key; never a recursive join). Top-30 heaviest subtrees
  *    with level. The BOM/category-rollup shape on the engine.
  *
  * Reference analog: containment = review/description embedded-copy
  * detection; decomposition = harvest-volume trend vs weekday pattern;
  * lifecycle = listing-population churn between scan epochs (q82's diff
  * as a monthly time series); rollup = AOI→grid→subgrid containment
  * accounting.
  */
object QueriesAX extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q198
    QDef("q198_containment",
      (s, dir) => {
        // native one-pass shingle-set build (the q33 r10 fix: O(len) walk,
        // gram→hash memo, no explode/collect_set shuffle)
        val docs = t(s, dir, "documents")
          .filter(length(col("text")) >= 3)
          .select(col("lang"), col("doc_id"),
            Dedup.shingleSetHash(col("text"), 3).as("g"))
          .withColumn("minh", element_at(col("g"), 1))
          .withColumn("sz", size(col("g")).cast("bigint"))
          // the map-only build inherits the parquet scan's ONE partition
          // (~20 MB file) — without this, AQE broadcasts one side and the
          // 23.8M-pair intersect runs single-threaded (75 s measured)
          .repartition(col("doc_id"))
          .cache()
        docs.count() // eager: both self-join sides read the cache
        // MEASURED NEGATIVE RESULT (r9, sf1 mirror, clearCache bench
        // protocol): a lossless df-ranked containment prefix filter
        // (PPJoin-style — one of a's n_a − ⌈0.8·n_a⌉ + 1 lowest-df
        // shingles must hit b's inverted index, plus the |g_b| ≥ 0.8|g_a|
        // size prune) was built and benched at 30.9 s vs 22.5 s for this
        // plain form, and REVERTED. Cause: the synthetic 31-word
        // vocabulary collapses the 3-gram df distribution, so the prefix
        // prunes almost nothing (23.8M candidates of ~31M sized
        // in-block pairs; 18.8M even at a t=19/20 ladder rung) while the
        // df-rank window + inverted-index explode add a full extra pass.
        // On a web-scale vocabulary the prefix is the standard win — the
        // machinery lives on in q33's ladder and q232/q244's rungs, where
        // it measured faster-or-equal.
        val a = docs.select(col("lang"), col("minh"), col("doc_id").as("id_a"), col("g").as("g_a"))
        val b = docs.select(col("lang"), col("minh"), col("doc_id").as("id_b"), col("g").as("g_b"))
        a.join(b, Seq("lang", "minh")).filter(col("id_a") =!= col("id_b"))
          .withColumn("inter", Dedup.sortedIntersectCount("g_a", "g_b"))
          .selectExpr("lang", "id_a", "id_b",
            "size(g_a) AS n_a", "size(g_b) AS n_b",
            "inter * 10000 DIV size(g_a) AS containment_bp")
          .where(col("containment_bp") >= 8000)
          .orderBy(col("containment_bp").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""
        WITH docs0 AS (
          SELECT lang, doc_id,
                 list_distinct(${TextFunctions.charNgramsSql("text", 3)}) AS g0
          FROM documents WHERE length(text) >= 3),
        d AS (SELECT lang, doc_id,
                     list_distinct(${Dedup.shingleHashesSql("g0")}) AS g
              FROM docs0 WHERE len(g0) > 0),
        m AS (SELECT lang, doc_id, g, list_min(g) AS minh FROM d)
        SELECT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(a.g) AS INT) AS n_a, CAST(len(b.g) AS INT) AS n_b,
               CAST(len(list_intersect(a.g, b.g)) * 10000 // len(a.g) AS BIGINT)
                 AS containment_bp
        FROM m a JOIN m b
          ON a.lang = b.lang AND a.minh = b.minh AND a.doc_id <> b.doc_id
        WHERE len(list_intersect(a.g, b.g)) * 10000 // len(a.g) >= 8000
        ORDER BY containment_bp DESC, id_a, id_b
        LIMIT 20""")),

    // --------------------------------------------------------------- q199
    QDef("q199_stl_decompose",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS d")
          .groupBy("d").agg(count(lit(1)).as("y"))
        val w7 = Window.orderBy("d").rowsBetween(-3, 3)
        val trended = daily
          .withColumn("nw", count(lit(1)).over(w7))
          .withColumn("t_milli", sum("y").over(w7) * 1000)
          .where(col("nw") === 7) // full centered windows only
          .selectExpr("d", "y", "t_milli DIV 7 AS trend_milli",
            "y * 1000 - t_milli DIV 7 AS resid_milli",
            "(d + 4) % 7 AS dow") // epoch day 0 = Thursday; dow 0 = Monday
        trended.groupBy("dow")
          .agg(count(lit(1)).as("n_days"),
            sum("resid_milli").cast("bigint").as("sum_resid"),
            sum("y").cast("bigint").as("sum_y"))
          .selectExpr("dow", "n_days",
            "sum_y * 1000 DIV n_days AS mean_y_milli",
            """CASE WHEN sum_resid >= 0 THEN sum_resid DIV n_days
               ELSE -((-sum_resid) DIV n_days) END AS seasonal_milli""")
          .orderBy("dow")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1),
        tr AS (
          SELECT d, y,
                 count(*) OVER w AS nw,
                 CAST(sum(y) OVER w * 1000 AS BIGINT) AS t_milli
          FROM daily
          WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        det AS (
          SELECT d, y, CAST(y * 1000 - t_milli // 7 AS BIGINT) AS resid_milli,
                 (d + 4) % 7 AS dow
          FROM tr WHERE nw = 7)
        SELECT dow, count(*) AS n_days,
               CAST(sum(y) AS BIGINT) * 1000 // count(*) AS mean_y_milli,
               CASE WHEN CAST(sum(resid_milli) AS BIGINT) >= 0
                 THEN CAST(sum(resid_milli) AS BIGINT) // count(*)
                 ELSE -((-CAST(sum(resid_milli) AS BIGINT)) // count(*)) END
                 AS seasonal_milli
        FROM det GROUP BY 1 ORDER BY dow""")),

    // --------------------------------------------------------------- q200
    QDef("q200_lifecycle",
      (s, dir) => {
        val am = t(s, dir, "orders")
          .selectExpr("o_custkey AS c",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 DIV 30 AS m")
          .distinct()
        val firstm = am.groupBy("c").agg(min("m").as("fm"))
        val lab = am.join(firstm, "c")
          .join(am.selectExpr("c", "m + 1 AS m").withColumn("prev", lit(1)).distinct(),
            Seq("c", "m"), "left")
          .selectExpr("c", "m",
            "CASE WHEN m = fm THEN 'new' WHEN prev = 1 THEN 'retained' ELSE 'resurrected' END AS st")
        val active = lab.groupBy("m")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("st") === "new", 1L).otherwise(0L)).cast("bigint").as("n_new"),
            sum(when(col("st") === "retained", 1L).otherwise(0L)).cast("bigint").as("n_retained"),
            sum(when(col("st") === "resurrected", 1L).otherwise(0L)).cast("bigint").as("n_resurrected"))
        // churned-out of month m: active in m-1, absent in m (only months that exist)
        val churn = am.selectExpr("c", "m + 1 AS m")
          .join(am.withColumn("hit", lit(1)), Seq("c", "m"), "left")
          .where(col("hit").isNull)
          .groupBy("m").agg(count(lit(1)).as("n_churned"))
        active.join(churn, Seq("m"), "left")
          .selectExpr("m", "n_active", "n_new", "n_retained", "n_resurrected",
            "coalesce(n_churned, 0) AS n_churned")
          .orderBy("m")
      },
      Some("""
        WITH am AS (
          SELECT DISTINCT o_custkey AS c, epoch_ms(o_orderdate) // 86400000 // 30 AS m
          FROM orders),
        fm AS (SELECT c, min(m) AS fm FROM am GROUP BY 1),
        lab AS (
          SELECT a.c, a.m,
                 CASE WHEN a.m = f.fm THEN 'new'
                      WHEN p.c IS NOT NULL THEN 'retained'
                      ELSE 'resurrected' END AS st
          FROM am a JOIN fm f ON a.c = f.c
          LEFT JOIN am p ON p.c = a.c AND p.m = a.m - 1),
        act AS (
          SELECT m, count(*) AS n_active,
                 CAST(sum(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                 CAST(sum(CASE WHEN st = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                 CAST(sum(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
          FROM lab GROUP BY 1),
        churn AS (
          SELECT a.m + 1 AS m, count(*) AS n_churned
          FROM am a LEFT JOIN am n ON n.c = a.c AND n.m = a.m + 1
          WHERE n.c IS NULL GROUP BY 1)
        SELECT a.m AS m, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
               CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned
        FROM act a LEFT JOIN churn c ON a.m = c.m
        ORDER BY m""")),

    // --------------------------------------------------------------- q201
    QDef("q201_tree_rollup",
      (s, dir) => {
        import s.implicits._
        val div = Seq((0, 1L), (1, 10L), (2, 100L), (3, 1000L), (4, 10000L),
          (5, 100000L), (6, 1000000L)).toDF("lvl", "dv")
        val rev = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("l_partkey").agg(sum("cents").cast("bigint").as("rev"))
        rev.crossJoin(broadcast(div))
          .selectExpr("l_partkey DIV dv AS node", "lvl", "rev")
          .where(col("node") > 0)
          .groupBy("node", "lvl")
          .agg(sum("rev").cast("bigint").as("subtree_cents"),
            count(lit(1)).as("n_parts"))
          .orderBy(col("subtree_cents").desc, col("node"))
          .limit(30)
      },
      Some("""
        WITH div(lvl, dv) AS (VALUES (0, 1), (1, 10), (2, 100), (3, 1000),
                                     (4, 10000), (5, 100000), (6, 1000000)),
        rev AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM lineitem GROUP BY 1),
        anc AS (
          SELECT l_partkey // dv AS node, lvl, rev
          FROM rev CROSS JOIN div
          WHERE l_partkey // dv > 0)
        SELECT CAST(node AS BIGINT) AS node, CAST(lvl AS INT) AS lvl,
               CAST(sum(rev) AS BIGINT) AS subtree_cents,
               count(*) AS n_parts
        FROM anc GROUP BY 1, 2
        ORDER BY subtree_cents DESC, node
        LIMIT 30"""))
  )
}
