package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.{TextFunctions, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 49 — dwell-time transitions, dedup
  * economics, embedding-space audits, link prediction:
  *
  *  - q222: transition dwell matrix — consecutive event pairs per user
  *    with elapsed-ms statistics per (from, to) edge, top-20 by volume.
  *    The time-weighted upgrade of q75's count-only transition matrix
  *    (one lead window, one hash agg).
  *  - q223: dedup savings accounting — q30's exact-dup clusters (same
  *    canonical word-set key), keeper = min doc_id; per source the
  *    dropped-doc count, dropped chars and savings bp. The "what does
  *    dedup buy us" report that justifies the pipeline stage.
  *  - q224: embedding label-separation audit — mean intra-label vs
  *    inter-label cosine (micro) over a deterministic 1/7 pair sample.
  *    THE SAMPLE IS AN EQUI-JOIN: pair (a,b) is kept iff
  *    (a+b) % 7 = 0, expressed as a.vec_id%7 join-key matching
  *    (7 - b.vec_id%7)%7 — sampled all-pairs WITHOUT a cartesian
  *    (n²/7 work split over 7 hash-joined buckets). Margin > 0 means
  *    labels are geometrically meaningful (q45/q44's sanity gate).
  *  - q225: link-prediction Jaccard — per existing co-occurrence edge,
  *    common-neighbor count vs degree-union (bp), top-20. Triangle-
  *    style two-hop equi-join enumeration (the q184/q188 family),
  *    never an all-pairs scan.
  *
  * Reference analog: dwell = inter-request latency profile per
  * transition of the scraper session; dedup savings = storage saved by
  * response dedup; label separation = listing-embedding cluster trust;
  * link Jaccard = "listings co-seen with both A and B" recommendation
  * strength.
  */
object QueriesBD extends QueryPack {
  import Q._

  /** support≥2 co-occurrence edges (a<b) over parts in the same order —
    * the q184/q195 graph (local copy; QueriesAW's is private). */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      // basket-array pair build (q140/q390 pattern): one collect_set
      // shuffle, pairs map-side from the <=7-part sorted basket
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
        .as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select("a", "b")
  }
  private val edgesSql = """
    lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
    e0 AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q222
    QDef("q222_dwell_matrix",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id", "event_type")
          .withColumn("to_type", lead("event_type", 1).over(w))
          .withColumn("next_ts", lead("ts_ms", 1).over(w))
          .where(col("to_type").isNotNull)
          .withColumn("dwell", col("next_ts") - col("ts_ms"))
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"),
            sum("dwell").cast("bigint").as("sum_dwell"),
            max("dwell").cast("bigint").as("max_dwell_ms"))
          .selectExpr("from_type", "to_type", "n",
            "sum_dwell DIV n AS mean_dwell_ms", "max_dwell_ms")
          .orderBy(col("n").desc, col("from_type"), col("to_type"))
          .limit(20)
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
                 lead(event_type, 1) OVER w AS to_type,
                 lead(epoch_ms(ts), 1) OVER w AS next_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
        SELECT event_type AS from_type, to_type, count(*) AS n,
               CAST(sum(next_ts - ts_ms) AS BIGINT) // count(*) AS mean_dwell_ms,
               CAST(max(next_ts - ts_ms) AS BIGINT) AS max_dwell_ms
        FROM ev WHERE to_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type LIMIT 20""")),

    // --------------------------------------------------------------- q223
    QDef("q223_dedup_savings",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("sig", Dedup.canonicalKey(TextFunctions.words(col("text"))))
          .select("doc_id", "source", "n_chars", "sig")
        val keep = d.groupBy("sig").agg(min("doc_id").as("keep_doc"))
        d.join(keep, "sig")
          .withColumn("dropped", when(col("doc_id") =!= col("keep_doc"), 1L).otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("dropped").cast("bigint").as("n_dropped"),
            sum(when(col("dropped") === 1L, col("n_chars")).otherwise(0L))
              .cast("bigint").as("chars_dropped"),
            sum("n_chars").cast("bigint").as("total_chars"))
          .withColumn("savings_bp", expr("chars_dropped * 10000 DIV total_chars"))
          .orderBy("source")
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        s"""
        WITH d AS (
          SELECT doc_id, source, n_chars, ${Dedup.canonicalKeySql("w")} AS sig
          FROM (SELECT doc_id, source, n_chars, $wSql AS w FROM documents)),
        keep AS (SELECT sig, min(doc_id) AS keep_doc FROM d GROUP BY 1),
        j AS (
          SELECT d.source, d.n_chars,
                 CASE WHEN d.doc_id <> k.keep_doc THEN 1 ELSE 0 END AS dropped
          FROM d JOIN keep k ON d.sig = k.sig)
        SELECT source, count(*) AS n_docs,
               CAST(sum(dropped) AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN dropped = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                 AS chars_dropped,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(CASE WHEN dropped = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                 * 10000 // CAST(sum(n_chars) AS BIGINT) AS savings_bp
        FROM j GROUP BY 1 ORDER BY source"""
      }),

    // --------------------------------------------------------------- q224
    QDef("q224_label_separation",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"),
            VectorOps.norm("embedding").as("nrm"))
          .cache()
        e.count() // eager: both join sides share one scan
        val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"),
          col("label").as("la"), col("nrm").as("na"),
          (col("vec_id") % 7).as("m"))
        val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"),
          col("label").as("lb"), col("nrm").as("nb"),
          ((lit(7) - col("vec_id") % 7) % 7).as("m"))
        a.join(b, "m")
          .where(col("ida") < col("idb"))
          .withColumn("cos6", VectorOps.cosine6Out("va", "vb", "na", "nb"))
          .groupBy(col("la").as("label"))
          .agg(
            sum(when(col("la") === col("lb"), 1L).otherwise(0L))
              .cast("bigint").as("n_intra"),
            sum(when(col("la") === col("lb"), col("cos6")).otherwise(0L))
              .cast("bigint").as("s_intra"),
            sum(when(col("la") =!= col("lb"), 1L).otherwise(0L))
              .cast("bigint").as("n_inter"),
            sum(when(col("la") =!= col("lb"), col("cos6")).otherwise(0L))
              .cast("bigint").as("s_inter"))
          .selectExpr("label",
            "n_intra", "CASE WHEN n_intra > 0 THEN s_intra DIV n_intra END AS intra_cos6",
            "n_inter", "CASE WHEN n_inter > 0 THEN s_inter DIV n_inter END AS inter_cos6")
          .orderBy("label")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding, label,
                 ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings),
        p AS (
          SELECT a.label AS la, b.label AS lb,
                 ${VectorOps.cosine6OutSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos6
          FROM e a JOIN e b
            ON a.vec_id % 7 = (7 - b.vec_id % 7) % 7
           AND a.vec_id < b.vec_id)
        SELECT la AS label,
               CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_intra,
               CASE WHEN sum(CASE WHEN la = lb THEN 1 ELSE 0 END) > 0
                    THEN CAST(sum(CASE WHEN la = lb THEN cos6 ELSE 0 END) AS BIGINT)
                         // CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               END AS intra_cos6,
               CAST(sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
               CASE WHEN sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) > 0
                    THEN CAST(sum(CASE WHEN la <> lb THEN cos6 ELSE 0 END) AS BIGINT)
                         // CAST(sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
               END AS inter_cos6
        FROM p GROUP BY 1 ORDER BY label""")),

    // --------------------------------------------------------------- q225
    QDef("q225_link_jaccard",
      (s, dir) => {
        val e = edges(s, dir).cache()
        val nEdges = e.count() // eager: four subtrees below
        if (nEdges <= 2000000L) {
          // dual-path (the q428/q457 recipe, round 11): the repeat-pair
          // census is tiny (3.6k edges sf0.1 / 36k sf1), so neighbor
          // sets, per-edge intersections and the top-20 all run driver-
          // side — one job instead of 3 shuffled self-joins + rollup.
          // The distributed wedge plan below stays as the scale path.
          val half = e.collect().map(r => (r.getLong(0), r.getLong(1)))
          val nbr = (half ++ half.map(_.swap)).groupMap(_._1)(_._2)
            .map { case (k, v) => k -> v.toSet }
          val out = half.map { case (a, b) =>
            val na = nbr(a); val nb = nbr(b)
            val (sm, lg) = if (na.size <= nb.size) (na, nb) else (nb, na)
            val common = sm.count(lg.contains).toLong
            val (da, db) = (na.size.toLong, nb.size.toLong)
            (a, b, common, da, db, common * 10000L / (da + db - common))
          }.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(20)
          val sc2 = s
          import sc2.implicits._
          out.toSeq
            .toDF("a", "b", "common", "deg_a", "deg_b", "jacc_bp")
        } else {
        val deg = e.select(col("a").as("src"))
          .union(e.select(col("b").as("src")))
          .groupBy("src").agg(count(lit(1)).as("deg"))
        // common neighbors of edge (a,b) = triangles through that edge.
        // Enumerate each triangle ONCE over the oriented (a<b) edge set —
        // wedge x<y<z closed by (x,z) — then credit all three edges; the
        // prior un-oriented und×und two-hop join pushed 4× the wedge
        // volume through the shuffle (r7 verdict #2, the q185 census
        // orientation).
        // (r8: broadcasting both wedge sides under a census gate was
        // measured 0.8 s SLOWER than the shuffled joins here — the cached
        // edge exchange is reused across the three subtrees, while two
        // broadcast builds of it are not)
        val tri = e.select(col("a").as("x"), col("b").as("y"))
          .join(e.select(col("a").as("y"), col("b").as("z")), "y")
          .join(e.select(col("a").as("x"), col("b").as("z")),
            Seq("x", "z"), "left_semi")
        val common = tri.select(col("x").as("a"), col("y").as("b"))
          .unionAll(tri.select(col("y").as("a"), col("z").as("b")))
          .unionAll(tri.select(col("x").as("a"), col("z").as("b")))
          .groupBy("a", "b").agg(count(lit(1)).as("common"))
        e.join(common, Seq("a", "b"), "left")
          .na.fill(0L, Seq("common"))
          .join(deg.select(col("src").as("a"), col("deg").as("deg_a")), "a")
          .join(deg.select(col("src").as("b"), col("deg").as("deg_b")), "b")
          .selectExpr("a", "b", "common", "deg_a", "deg_b",
            "common * 10000 DIV (deg_a + deg_b - common) AS jacc_bp")
          .orderBy(col("jacc_bp").desc, col("a"), col("b"))
          .limit(20)
        }
      },
      Some(s"""
        WITH $edgesSql,
        und AS (SELECT a AS src, b AS dst FROM e0
                UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
        common AS (
          SELECT e0.a, e0.b, count(*) AS common
          FROM e0
          JOIN und na ON na.src = e0.a
          JOIN und nb ON nb.src = e0.b AND nb.dst = na.dst
          GROUP BY 1, 2)
        SELECT e0.a, e0.b, COALESCE(c.common, 0) AS common,
               da.deg AS deg_a, db.deg AS deg_b,
               COALESCE(c.common, 0) * 10000
                 // (da.deg + db.deg - COALESCE(c.common, 0)) AS jacc_bp
        FROM e0
        LEFT JOIN common c ON c.a = e0.a AND c.b = e0.b
        JOIN deg da ON da.src = e0.a
        JOIN deg db ON db.src = e0.b
        ORDER BY jacc_bp DESC, e0.a, e0.b LIMIT 20"""))
  )
}
