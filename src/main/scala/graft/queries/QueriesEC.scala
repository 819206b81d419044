package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 126 — inventory policy simulation,
  * diversified retrieval, distribution-free trend testing, corpus
  * temperature mixing:
  *
  *  - q518: (s,S) inventory-policy replay per part group — sparse daily
  *    demand (aggregated distributedly first), then the sequential
  *    level/reorder/stockout recurrence on the secondary-sort
  *    mapPartitions path: level -= d; stockout if level<0; reorder up
  *    to S=300 when level<s=75. Recursive-CTE oracle carries
  *    (level, orders, stockouts).
  *  - q519: Maximal Marginal Relevance (MMR) diversified top-10 over
  *    embeddings: query = lowest vec_id, candidates = top-30 by
  *    relevance (distributed orderBy+limit), then the greedy
  *    score = 7·rel − 3·max(0, max sim to selected) runs over
  *    integer-micro cosines only — Spark in one bounded task, DuckDB
  *    as a recursive CTE whose state is (selected ks, per-candidate
  *    penalty LIST); list_position's first-match gives both engines
  *    the same smallest-vec_id tie-break. The diversity-aware
  *    retrieval / training-example selection primitive.
  *  - q520: Mann–Kendall trend test on daily revenue: S = Σ sign over
  *    all day pairs (self-join on the BOUNDED day-aggregate domain),
  *    exact tie-corrected 18·Var as int64, z floor-milli. The
  *    distribution-free complement of q177's Theil–Sen slope.
  *  - q521: temperature-scaled corpus mixture (T=2): per (lang,source)
  *    sampling weight ∝ √n via integer milli-sqrt quantization (exact
  *    integer sums → order-independent), share/weight ppm and boost bp
  *    vs natural frequency. The q320 mixture's temperature form
  *    (Gopher/PaLM-style data reweighting).
  *
  * Scale shapes: q518/q520/q521 aggregate facts to bounded domains
  * (group×day, day, lang×source) before any sequential or quadratic
  * work; q519's quadratic stage is 30×30 after a distributed top-k.
  */
object QueriesEC extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class SsDay(pk: Long, day: Long, d: Long)
  case class SsOut(pk: Long, n_days: Long, n_orders: Long,
      n_stockouts: Long, end_level: Long)
  case class MmrPair(i_id: Long, i_rel: Long, j_id: Long, sim: Long)
  case class MmrOut(pick: Long, vec_id: Long, rel_micro: Long,
      penalty_micro: Long, score10: Long)

  private val BigS = 300L
  private val LittleS = 75L

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q518
    QDef("q518_ss_inventory",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "lineitem")
          .where(col("l_quantity").isNotNull)
          .selectExpr("l_partkey % 30 AS pk",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
          .groupBy("pk", "day").agg(sum("qty").cast("long").as("d"))
          .as[SsDay]
        daily.repartition(col("pk"))
          .sortWithinPartitions("pk", "day")
          .mapPartitions { it =>
            new Iterator[SsOut] {
              private var pending: Option[SsOut] = None
              private var cur = Long.MinValue
              private var lvl = 0L; private var ord = 0L
              private var so = 0L; private var n = 0L
              private def step(d: Long): Unit = {
                val tl = lvl - d
                if (tl < 0) so += 1
                if (tl < LittleS) { ord += 1; lvl = BigS } else lvl = tl
                n += 1
              }
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val d = it.next()
                  if (d.pk != cur) {
                    if (cur != Long.MinValue)
                      pending = Some(SsOut(cur, n, ord, so, lvl))
                    cur = d.pk; lvl = BigS; ord = 0L; so = 0L; n = 0L
                  }
                  step(d.d)
                }
                if (pending.isEmpty && cur != Long.MinValue) {
                  pending = Some(SsOut(cur, n, ord, so, lvl))
                  cur = Long.MinValue
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): SsOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("pk")
      },
      Some(s"""
        WITH RECURSIVE daily AS (
          SELECT l_partkey % 30 AS pk,
                 epoch_ms(l_shipdate) // 86400000 AS day,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS d
          FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        r AS (
          SELECT pk, day, d,
                 row_number() OVER (PARTITION BY pk ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY pk) AS cnt
          FROM daily),
        b AS (
          SELECT pk, rn, cnt,
                 CASE WHEN $BigS - d < $LittleS THEN $BigS
                      ELSE $BigS - d END AS lvl,
                 CASE WHEN $BigS - d < $LittleS THEN 1 ELSE 0 END AS ord,
                 CASE WHEN $BigS - d < 0 THEN 1 ELSE 0 END AS so
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.pk, r.rn, r.cnt,
                 CASE WHEN b.lvl - r.d < $LittleS THEN $BigS
                      ELSE b.lvl - r.d END,
                 b.ord + CASE WHEN b.lvl - r.d < $LittleS THEN 1 ELSE 0 END,
                 b.so + CASE WHEN b.lvl - r.d < 0 THEN 1 ELSE 0 END
          FROM b JOIN r ON r.pk = b.pk AND r.rn = b.rn + 1)
        SELECT pk, CAST(cnt AS BIGINT) AS n_days,
               CAST(ord AS BIGINT) AS n_orders,
               CAST(so AS BIGINT) AS n_stockouts,
               CAST(lvl AS BIGINT) AS end_level
        FROM b WHERE rn = cnt ORDER BY pk""")),

    // --------------------------------------------------------------- q519
    QDef("q519_mmr_diversify",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
          .where(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm("embedding").as("nrm"))
        e.cache(); e.count()
        val q = e.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("nrm").as("q_nrm"))
        val cand = e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos6",
            VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm"))
          .selectExpr("vec_id", "embedding", "nrm",
            "CAST(floor(cos6 * 1e6 + 0.5) AS BIGINT) AS rel")
          .orderBy(col("rel").desc, col("vec_id")).limit(30)
        cand.cache(); cand.count()
        val a = cand.selectExpr("vec_id AS i_id", "rel AS i_rel",
          "embedding AS i_vec", "nrm AS i_nrm")
        val b = cand.selectExpr("vec_id AS j_id", "embedding AS j_vec",
          "nrm AS j_nrm")
        a.crossJoin(broadcast(b))
          .withColumn("cos6",
            VectorOps.cosine6Out("i_vec", "j_vec", "i_nrm", "j_nrm"))
          .selectExpr("i_id", "i_rel", "j_id",
            """CASE WHEN i_id = j_id THEN 1000000
               ELSE CAST(floor(cos6 * 1e6 + 0.5) AS BIGINT) END AS sim""")
          .as[MmrPair]
          .coalesce(1)
          .mapPartitions { it =>
            val rows = it.toArray
            if (rows.isEmpty) Iterator.empty
            else {
              val ids = rows.map(_.i_id).distinct.sorted
              val rel = rows.groupBy(_.i_id).map { case (k, v) => k -> v.head.i_rel }
              val sim = rows.map(r => (r.i_id, r.j_id) -> r.sim).toMap
              val sel = scala.collection.mutable.Set[Long]()
              val pen = scala.collection.mutable.Map[Long, Long](ids.map(_ -> 0L): _*)
              val out = scala.collection.mutable.ArrayBuffer[MmrOut]()
              val picks = math.min(10, ids.length)
              for (p <- 1 to picks) {
                var bestId = -1L; var bestScore = Long.MinValue
                // ascending id scan + strict > keeps the FIRST max:
                // the same smallest-vec_id tie-break as the oracle's
                // list_position first match
                ids.foreach { id =>
                  if (!sel(id)) {
                    val sc = 7L * rel(id) - 3L * pen(id)
                    if (sc > bestScore) { bestScore = sc; bestId = id }
                  }
                }
                out += MmrOut(p.toLong, bestId, rel(bestId), pen(bestId), bestScore)
                sel += bestId
                ids.foreach { id =>
                  pen(id) = math.max(pen(id), sim((bestId, id)))
                }
              }
              out.iterator
            }
          }
          .toDF()
          .orderBy("pick")
      },
      Some(s"""
        WITH RECURSIVE e AS MATERIALIZED (
          SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings WHERE embedding IS NOT NULL),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm
              FROM e ORDER BY vec_id LIMIT 1),
        cand AS MATERIALIZED (
          SELECT e.vec_id, e.embedding, e.nrm,
                 CAST(floor(${VectorOps.cosine6OutSql("q.q_vec",
                   "e.embedding", "q.q_nrm", "e.nrm")} * 1e6 + 0.5)
                   AS BIGINT) AS rel
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
          ORDER BY rel DESC, e.vec_id LIMIT 30),
        idx AS MATERIALIZED (
          SELECT vec_id, rel, embedding, nrm,
                 row_number() OVER (ORDER BY vec_id) AS k
          FROM cand),
        simrows AS (
          SELECT a.k AS i, b.k AS j,
                 CASE WHEN a.k = b.k THEN 1000000
                   ELSE CAST(floor(${VectorOps.cosine6OutSql("a.embedding",
                     "b.embedding", "a.nrm", "b.nrm")} * 1e6 + 0.5)
                     AS BIGINT) END AS sim
          FROM idx a CROSS JOIN idx b),
        simvecs AS (SELECT i, list(sim ORDER BY j) AS sv
                    FROM simrows GROUP BY i),
        simmat AS (SELECT list(sv ORDER BY i) AS mat FROM simvecs),
        lists AS (
          SELECT list(vec_id ORDER BY k) AS ids, list(rel ORDER BY k) AS rels,
                 CAST(count(*) AS BIGINT) AS m
          FROM idx),
        rec AS (
          SELECT 0 AS step, CAST([] AS BIGINT[]) AS sel,
                 CAST([] AS BIGINT[]) AS prel, CAST([] AS BIGINT[]) AS ppen,
                 list_transform(rels, x -> CAST(0 AS BIGINT)) AS pen
          FROM lists
          UNION ALL
          SELECT step + 1, list_append(sel, bi), list_append(prel, rels[bi]),
                 list_append(ppen, pen[bi]),
                 list_transform(range(1, m + 1),
                   k -> greatest(pen[k], mat[bi][k]))
          FROM (
            SELECT r.step, r.sel, r.prel, r.ppen, r.pen, l.rels, l.m, s.mat,
                   CAST(list_position(r.scores, list_max(r.scores))
                     AS BIGINT) AS bi
            FROM (
              SELECT r0.step, r0.sel, r0.prel, r0.ppen, r0.pen,
                     list_transform(range(1, l0.m + 1),
                       k -> CASE WHEN list_contains(r0.sel, k) THEN NULL
                            ELSE 7 * l0.rels[k] - 3 * r0.pen[k] END) AS scores
              FROM rec r0, lists l0) r, lists l, simmat s
            WHERE r.step < 10 AND
              list_position(r.scores, list_max(r.scores)) IS NOT NULL)),
        fin AS (SELECT sel, prel, ppen FROM rec WHERE step = 10)
        SELECT CAST(t.p AS BIGINT) AS pick, l.ids[f.sel[t.p]] AS vec_id,
               f.prel[t.p] AS rel_micro, f.ppen[t.p] AS penalty_micro,
               7 * f.prel[t.p] - 3 * f.ppen[t.p] AS score10
        FROM fin f, lists l, (SELECT unnest(range(1, 11)) AS p) t
        ORDER BY pick""")),

    // --------------------------------------------------------------- q520
    QDef("q520_mann_kendall",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("day").agg(sum("cents").cast("long").as("revc"))
          .selectExpr("day", "revc DIV 1000 AS rev")
        daily.cache(); daily.count()
        val a = daily.selectExpr("day AS d1", "rev AS r1")
        val b = daily.selectExpr("day AS d2", "rev AS r2")
        val sStat = a.join(b, expr("d1 < d2"))
          .agg(sum(expr(
            "CASE WHEN r2 > r1 THEN 1 WHEN r2 < r1 THEN -1 ELSE 0 END"))
            .cast("long").as("s_stat"))
        val ties = daily.groupBy("rev").agg(count(lit(1)).as("tc"))
          .agg(coalesce(sum(expr("tc*(tc-1)*(2*tc+5)")), lit(0L))
            .cast("long").as("tt"))
        val n = daily.agg(count(lit(1)).as("n_days"))
        sStat.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
          .selectExpr("n_days", "s_stat",
            "n_days*(n_days-1)*(2*n_days+5) - tt AS var18")
          .where(expr("var18 > 0"))
          .selectExpr("n_days", "s_stat", "var18",
            """CAST(floor(CASE WHEN s_stat > 0
                 THEN (s_stat - 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                 WHEN s_stat < 0
                 THEN (s_stat + 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                 ELSE 0.0 END * 1000) AS BIGINT) AS z_milli""",
            """CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1
               ELSE 0 END AS BIGINT) AS trend_sign""")
      },
      Some("""
        WITH daily AS (
          SELECT day, revc // 1000 AS rev FROM (
            SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS revc
            FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1)),
        sstat AS (
          SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                   WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b ON a.day < b.day),
        ties AS (
          SELECT CAST(coalesce(sum(tc*(tc-1)*(2*tc+5)), 0) AS BIGINT) AS tt
          FROM (SELECT CAST(count(*) AS BIGINT) AS tc
                FROM daily GROUP BY rev)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        v AS (
          SELECT n_days, s_stat,
                 n_days*(n_days-1)*(2*n_days+5) - tt AS var18
          FROM sstat, ties, nn)
        SELECT n_days, s_stat, var18,
               CAST(floor(CASE WHEN s_stat > 0
                 THEN (s_stat - 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                 WHEN s_stat < 0
                 THEN (s_stat + 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                 ELSE 0.0 END * 1000) AS BIGINT) AS z_milli,
               CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS trend_sign
        FROM v WHERE var18 > 0""")),

    // --------------------------------------------------------------- q521
    QDef("q521_temperature_mixture",
      (s, dir) => {
        val g = t(s, dir, "documents")
          .where(col("lang").isNotNull && col("source").isNotNull)
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
          .withColumn("sq",
            expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT)"))
        val tot = g.agg(sum("n").cast("long").as("nt"),
          sum("sq").cast("long").as("sqt"))
        g.crossJoin(broadcast(tot))
          .where(expr("nt > 0 AND sqt > 0"))
          .selectExpr("lang", "source", "n",
            "n * 1000000 DIV nt AS share_ppm",
            "sq * 1000000 DIV sqt AS w_ppm")
          .where(expr("share_ppm > 0"))
          .selectExpr("lang", "source", "n", "share_ppm", "w_ppm",
            "w_ppm * 10000 DIV share_ppm AS boost_bp")
          .orderBy("lang", "source")
      },
      Some("""
        WITH g AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                 CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT)
                   AS sq
          FROM documents
          WHERE lang IS NOT NULL AND source IS NOT NULL
          GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                       CAST(sum(sq) AS BIGINT) AS sqt FROM g),
        w AS (
          SELECT lang, source, n,
                 n * 1000000 // nt AS share_ppm,
                 sq * 1000000 // sqt AS w_ppm
          FROM g, tot WHERE nt > 0 AND sqt > 0)
        SELECT lang, source, n, share_ppm, w_ppm,
               w_ppm * 10000 // share_ppm AS boost_bp
        FROM w WHERE share_ppm > 0
        ORDER BY lang, source"""))
  )
}
