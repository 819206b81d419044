package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 42 — rate limiting, graph cores,
  * pruned similarity, quote pricing:
  *
  *  - q194: token-bucket rate limiter replay — per-user bucket (cap 500,
  *    cost 25/event, refill 1 token per elapsed second) replayed over the
  *    event stream. min/max-clamped recurrence ⇒ no window frame
  *    expresses it: secondary-sort mapPartitions scale path (q124/q179
  *    pattern, O(1) state per key), independent recursive-CTE oracle.
  *    The admission-control shape of the reference's scraper scheduler.
  *  - q195: bounded k-core peel (k=3, 3 rounds) over the support≥2
  *    co-occurrence graph — each round drops nodes with degree<3 and
  *    their edges; per-round node/edge survivor counts. Bounded unrolled
  *    iteration both sides (the distributed-peel shape; full fixpoint is
  *    the same loop run to stability).
  *  - q196: maximum-inner-product search with Cauchy–Schwarz pruning
  *    accounting — exact top-1 dot per query plus how many corpus
  *    vectors a norm-descending scan could have skipped (‖q‖·‖x‖ <
  *    best). The norm-bound is what makes exact MIPS tractable at scale:
  *    prune_bp measures that headroom on real data. Dots floor-quantized
  *    to micro on BOTH sides (one shared op order).
  *  - q197: booking-quote pricing breakdown (integer cents end-to-end):
  *    base from lineitems, flat cleaning fee, 12% service fee, 8% tax on
  *    the fee-inclusive subtotal — per-priority totals and effective
  *    markup bp. The reference's BQT quote computation as a set-based
  *    query.
  *
  * Reference analog: token bucket = scraper-side rate limiting
  * (airbnb_client throttling); k-core = dense-co-visibility region
  * extraction (beside q185/q188); MIPS = listing-embedding retrieval;
  * quote = `AirBnBResponse` BQT booking-quote payloads.
  */
object QueriesAW extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class TbEv(user_id: Long, ts_ms: Long, event_id: Long)
  case class TbOut(user_id: Long, n_events: Long, n_throttled: Long, final_tokens: Long)

  private val Cap = 500L
  private val Cost = 25L

  /** support≥2 co-occurrence edges (a<b) over parts in the same order —
    * the q184/q185 graph. */
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
    lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q194
    QDef("q194_token_bucket",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id")
          .as[TbEv]
        ev.repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts_ms", "event_id")
          .mapPartitions { it =>
            new Iterator[TbOut] {
              private var pending: Option[TbOut] = None
              private var cur = -1L
              private var tok = 0L
              private var prevTs = 0L
              private var n = 0L
              private var thr = 0L
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.user_id != cur) {
                    if (cur != -1L) pending = Some(TbOut(cur, n, thr, tok))
                    cur = e.user_id; tok = Cap; prevTs = e.ts_ms; n = 0L; thr = 0L
                  }
                  val refill = (e.ts_ms - prevTs) / 1000L
                  tok = math.min(Cap, tok + refill)
                  if (tok >= Cost) tok -= Cost else thr += 1L
                  prevTs = e.ts_ms
                  n += 1L
                }
                if (pending.isEmpty && cur != -1L) {
                  pending = Some(TbOut(cur, n, thr, tok)); cur = -1L
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): TbOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("user_id")
      },
      Some(s"""
        WITH RECURSIVE r AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt
          FROM events),
        b AS (
          SELECT user_id, rn, cnt, ts_ms AS prev_ts,
                 CASE WHEN $Cap >= $Cost THEN $Cap - $Cost ELSE $Cap END AS tok,
                 CAST(CASE WHEN $Cap >= $Cost THEN 0 ELSE 1 END AS BIGINT) AS thr
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.rn, r.cnt, r.ts_ms,
                 CASE WHEN least($Cap, b.tok + (r.ts_ms - b.prev_ts) // 1000) >= $Cost
                      THEN least($Cap, b.tok + (r.ts_ms - b.prev_ts) // 1000) - $Cost
                      ELSE least($Cap, b.tok + (r.ts_ms - b.prev_ts) // 1000) END,
                 b.thr + CASE WHEN least($Cap, b.tok + (r.ts_ms - b.prev_ts) // 1000) >= $Cost
                              THEN 0 ELSE 1 END
          FROM b JOIN r ON r.user_id = b.user_id AND r.rn = b.rn + 1)
        SELECT user_id, CAST(cnt AS BIGINT) AS n_events, thr AS n_throttled,
               tok AS final_tokens
        FROM b WHERE rn = cnt ORDER BY user_id""")),

    // --------------------------------------------------------------- q195
    QDef("q195_kcore",
      (s, dir) =>
        graft.operators.GraphCensus.kcoreCensus(edges(s, dir), "a", "b",
          k = 3, rounds = 3).orderBy("round"),
      Some(s"""
        WITH $edgesSql,
        d1 AS MATERIALIZED (SELECT v, count(*) AS deg FROM
                 (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        k1 AS MATERIALIZED (SELECT v FROM d1 WHERE deg >= 3),
        e1 AS MATERIALIZED (SELECT a, b FROM e0
               WHERE a IN (SELECT v FROM k1) AND b IN (SELECT v FROM k1)),
        d2 AS MATERIALIZED (SELECT v, count(*) AS deg FROM
                 (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
        k2 AS MATERIALIZED (SELECT v FROM d2 WHERE deg >= 3),
        e2 AS MATERIALIZED (SELECT a, b FROM e1
               WHERE a IN (SELECT v FROM k2) AND b IN (SELECT v FROM k2)),
        d3 AS MATERIALIZED (SELECT v, count(*) AS deg FROM
                 (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
        k3 AS MATERIALIZED (SELECT v FROM d3 WHERE deg >= 3),
        e3 AS MATERIALIZED (SELECT a, b FROM e2
               WHERE a IN (SELECT v FROM k3) AND b IN (SELECT v FROM k3))
        SELECT CAST(1 AS BIGINT) AS round,
               (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
                  (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
        UNION ALL
        SELECT CAST(2 AS BIGINT),
               (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
                  (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)),
               (SELECT CAST(count(*) AS BIGINT) FROM e2)
        UNION ALL
        SELECT CAST(3 AS BIGINT),
               (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
                  (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)),
               (SELECT CAST(count(*) AS BIGINT) FROM e3)
        ORDER BY round""")),

    // --------------------------------------------------------------- q196
    QDef("q196_mips_prune",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))
          .cache()
        e.count() // eager: corpus + query sides share one job
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("nrm").as("q_nrm"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            floor(VectorOps.dot("q_vec", "embedding") * 1e6).cast("bigint").as("dot6"),
            floor(col("q_nrm") * col("nrm") * 1e6).cast("bigint").as("bound6"))
          .cache()
        scored.count()
        val best = scored.groupBy("q_id")
          .agg(max(struct(col("dot6"), (lit(0L) - col("vec_id")).as("nv"))).as("m"))
          .selectExpr("q_id", "m.dot6 AS best_dot6", "-m.nv AS best_vec_id")
        scored.join(broadcast(best), "q_id")
          .groupBy("q_id")
          .agg(max("best_vec_id").as("best_vec_id"),
            max("best_dot6").as("best_dot6"),
            count(lit(1)).as("n_corpus"),
            sum(when(col("bound6") < col("best_dot6"), 1L).otherwise(0L))
              .cast("bigint").as("n_prunable"))
          .withColumn("prune_bp", expr("n_prunable * 10000 DIV n_corpus"))
          .orderBy("q_id")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM e
              WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id,
                 CAST(floor(${VectorOps.dotSql("q.q_vec", "e.embedding")} * 1e6) AS BIGINT) AS dot6,
                 CAST(floor(q.q_nrm * e.nrm * 1e6) AS BIGINT) AS bound6
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        best AS (
          SELECT q_id, vec_id AS best_vec_id, dot6 AS best_dot6
          FROM (SELECT q_id, vec_id, dot6,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY dot6 DESC, vec_id) AS rn
                FROM scored)
          WHERE rn = 1)
        SELECT s.q_id AS q_id,
               CAST(b.best_vec_id AS BIGINT) AS best_vec_id,
               CAST(b.best_dot6 AS BIGINT) AS best_dot6,
               count(*) AS n_corpus,
               CAST(sum(CASE WHEN s.bound6 < b.best_dot6 THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
               CAST(sum(CASE WHEN s.bound6 < b.best_dot6 THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS prune_bp
        FROM scored s JOIN best b ON s.q_id = b.q_id
        GROUP BY 1, 2, 3 ORDER BY q_id""")),

    // --------------------------------------------------------------- q197
    QDef("q197_booking_quote",
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .selectExpr("l_orderkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("l_orderkey").agg(sum("cents").cast("bigint").as("base"))
        val quote = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("prio"))
          .join(base, col("o_orderkey") === base("l_orderkey"))
          .selectExpr("prio", "base",
            "base * 1200 DIV 10000 AS service",
            "5000 AS cleaning")
          .selectExpr("prio", "base", "service", "cleaning",
            "(base + service + cleaning) * 800 DIV 10000 AS tax")
          .selectExpr("prio", "base", "base + service + cleaning + tax AS total")
        quote.groupBy("prio")
          .agg(count(lit(1)).as("n_orders"),
            sum("base").cast("bigint").as("sum_base_cents"),
            sum("total").cast("bigint").as("sum_total_cents"))
          .selectExpr("prio", "n_orders", "sum_base_cents", "sum_total_cents",
            "sum_total_cents DIV n_orders AS avg_total_cents",
            "(sum_total_cents - sum_base_cents) * 10000 DIV sum_base_cents AS markup_bp")
          .orderBy("prio")
      },
      Some("""
        WITH base AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS base
          FROM lineitem GROUP BY 1),
        quote AS (
          SELECT o.o_orderpriority AS prio, b.base,
                 b.base + (b.base * 1200 // 10000) + 5000
                   + ((b.base + (b.base * 1200 // 10000) + 5000) * 800 // 10000) AS total
          FROM orders o JOIN base b ON o.o_orderkey = b.l_orderkey)
        SELECT prio, count(*) AS n_orders,
               CAST(sum(base) AS BIGINT) AS sum_base_cents,
               CAST(sum(total) AS BIGINT) AS sum_total_cents,
               CAST(sum(total) AS BIGINT) // count(*) AS avg_total_cents,
               (CAST(sum(total) AS BIGINT) - CAST(sum(base) AS BIGINT)) * 10000
                 // CAST(sum(base) AS BIGINT) AS markup_bp
        FROM quote GROUP BY 1 ORDER BY prio"""))
  )
}
